"""Headline benchmark (driver-run, real TPU).

Metric (BASELINE.json): 2-D Poisson V-cycle solve to 1e-7 residual (rss,
the reference's convergence measure, common.hpp:17-27).

  * TPU path: structured multigrid (color-packed f32 V-cycles inside a
    double-float32 defect-correction loop, all device-resident) on a
    1023x1023 interior grid — 1,046,529 dofs.
  * Baseline: the same problem solved by the reference-class CPU AMG
    (native C++ replica of the reference's V-cycle + sequential symmetric
    Gauss-Seidel solver structure, single thread — see
    amg_tpu/native/amgcore.cpp) with the same 9-point/bilinear hierarchy
    and the same tolerance.

Prints exactly one JSON line on stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline = cpu_seconds / tpu_seconds (higher is better).
Details go to stderr.
"""

import json
import os
import sys
import threading
import time

# Watchdog: the TPU tunnel can wedge on device init (hangs forever in
# futex); abort with a message rather than hanging the driver.
_WATCHDOG_S = int(os.environ.get("BENCH_WATCHDOG_S", "560"))


# Deadline shared with budget_left(): the watchdog sleeps from HERE — module
# import, before jax/TPU-tunnel init — so remaining-budget math must use the
# same origin, or a slow device init (the exact scenario the watchdog
# defends against) makes budget_left() overestimate and the optional stages
# trip os._exit(3), losing the already-measured headline JSON.
_START = time.perf_counter()


# Best-known partial result: main() updates this as soon as the headline
# numbers exist so a stage that overruns the remaining budget (cold
# compile, wedged tunnel) degrades to a partial artifact instead of
# killing the JSON line entirely.
_PARTIAL = {}


def _watchdog():
    time.sleep(_WATCHDOG_S)
    if _PARTIAL:
        _PARTIAL.setdefault("extras", {})["watchdog"] = (
            f"aborted at {_WATCHDOG_S}s; partial extras")
        print(json.dumps(_PARTIAL), flush=True)
        print(f"bench watchdog: budget {_WATCHDOG_S}s exhausted mid-stage; "
              "emitted partial result", file=sys.stderr, flush=True)
        os._exit(0)
    print(f"bench watchdog: no result within {_WATCHDOG_S}s "
          "(wedged TPU tunnel?); aborting", file=sys.stderr, flush=True)
    os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

import jax

from amg_tpu.utils.cache import enable_persistent_cache

# Cross-process-STABLE cache keys (r5): without stable_keys the Mosaic
# kernel payloads embed the caller's filename/line numbers, so every
# driver variant recompiled everything (~45-90 s warmup per size) and the
# budget starved the late bench stages. See amg_tpu/utils/cache.py.
enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".jax_cache"))
# f64 for the iterative-refinement outer loop (reference tolerances are
# 1e-9-scale double; TPU f64 is emulated but only touched once per
# refinement step).
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

SIDE = 1023
TOL = 1e-7


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_stencil(side, dtype=jnp.float32):
    """Fine-level Poisson operator built ON DEVICE (no host plane push —
    bulk transfers through a degraded tunnel can hang indefinitely)."""
    from amg_tpu.ops.rap import poisson_const_w33, poisson_planes
    from amg_tpu.sparse.stencil import Stencil2D

    return Stencil2D(c=poisson_planes(side, dtype), side=side,
                     w33=poisson_const_w33(side, 1)[0])


def pallas_hardware_gate():
    """COMPILED-MODE parity check of the fused Pallas kernel on the real
    chip (round-1 lesson: interpret-only tests cannot catch DMA-ordering
    bugs). Runs every bench round; raises on mismatch."""
    from amg_tpu.models import poisson
    from amg_tpu.ops.pallas.rbgs import PaddedStencil, fused_gs4_sweep
    from amg_tpu.sparse.stencil import color_masks, gs4_sweep_masked

    side = 511
    S = _device_stencil(side)
    b2 = poisson.rhs_device(side, dtype=jnp.float32).reshape(side, side)
    uc = jax.random.normal(jax.random.PRNGKey(0), (side, side),
                           dtype=jnp.float32)
    ref = np.asarray(jax.jit(gs4_sweep_masked)(
        S, uc, b2, color_masks(side, jnp.float32)))
    import dataclasses as dc

    # Per-variant pass/fail: one variant's compile failure must not mask
    # the others' results (round-2 lesson — the all-in-one try/except left
    # "which variant recursed?" unanswerable from the artifact).
    stats, failed = {}, []
    for kind, S_ in (("const", S), ("var", dc.replace(S, w33=None))):
        for db in (False, True):
            name = f"{kind}_db{int(db)}"
            try:
                ps = PaddedStencil.prepare(S_, tr=64, dtype=jnp.float32,
                                           double_buffer=db)
                got = np.asarray(ps.unpad_field(fused_gs4_sweep(
                    ps, ps.pad_field(uc), ps.pad_field(b2),
                    double_buffer=db)))
                md = float(np.abs(got - ref).max())
                stats[name] = md
                if md >= 5e-5:
                    failed.append(f"{name}: WRONG maxdiff={md:.3e}")
            except Exception as e:  # noqa: BLE001 — per-variant report
                stats[name] = f"{type(e).__name__}: {str(e)[:200]}"
                failed.append(f"{name}: {type(e).__name__}")

    # packed-layout fused kernel (ops/pallas/packed_rbgs.py), the r4
    # production smoother: parity vs the XLA packed sweep at a MULTI-TILE
    # size (1023 -> M=512; single-tile compiles exercised implicitly on
    # coarse levels). Gate every pipeline variant separately.
    from amg_tpu.ops.pallas.packed_rbgs import fused_gs4_sweep_packed
    from amg_tpu.sparse.packed import gs4_sweep_packed, pack

    side_p = 1023
    m = (side_p - 1) // 2
    S_p = _device_stencil(side_p)
    bp2 = poisson.rhs_device(side_p, dtype=jnp.float32).reshape(side_p,
                                                                side_p)
    up2 = jax.random.normal(jax.random.PRNGKey(1), (side_p, side_p),
                            dtype=jnp.float32)
    u4, b4 = pack(up2, m), pack(bp2, m)
    pref = np.asarray(jax.jit(lambda u, b: gs4_sweep_packed(
        u, b, S_p.w33, m, 1.0, True))(u4, b4))
    pscale = float(np.abs(pref).max())
    for pipe in ("sb", "db", "db3"):
        name = f"packed_{pipe}"
        try:
            got = np.asarray(jax.jit(lambda u, b, pipe=pipe:
                                     fused_gs4_sweep_packed(
                                         u, b, S_p.w33, m, 1.0, True,
                                         pipeline=pipe))(u4, b4))
            md = float(np.abs(got - pref).max()) / pscale
            stats[name] = md
            if md >= 1e-5:
                failed.append(f"{name}: WRONG reldiff={md:.3e}")
        except Exception as e:  # noqa: BLE001 — per-variant report
            stats[name] = f"{type(e).__name__}: {str(e)[:200]}"
            failed.append(f"{name}: {type(e).__name__}")

    # fused V-cycle leg kernels (ops/pallas/packed_cycle.py)
    from amg_tpu.ops.pallas.packed_cycle import (fused_down_leg_packed,
                                                 fused_up_leg_packed)
    from amg_tpu.sparse.packed import (prolong_add_packed, residual_packed,
                                       restrict_packed)

    try:
        bc_ref = np.asarray(jax.jit(lambda u, b: restrict_packed(
            residual_packed(u, b, S_p.w33, m), m))(
                jnp.asarray(pref), b4))
        u_got, bc_pad = jax.jit(lambda u, b: fused_down_leg_packed(
            u, b, S_p.w33, m, 1.0, True))(u4, b4)
        md_u = float(np.abs(np.asarray(u_got) - pref).max()) / pscale
        md_c = (float(np.abs(np.asarray(bc_pad)[:m, :m] - bc_ref).max())
                / float(np.abs(bc_ref).max()))
        stats["packed_down"] = max(md_u, md_c)
        if stats["packed_down"] >= 1e-5:
            failed.append(f"packed_down: WRONG reldiff={md_u:.1e}/{md_c:.1e}")
    except Exception as e:  # noqa: BLE001
        stats["packed_down"] = f"{type(e).__name__}: {str(e)[:200]}"
        failed.append(f"packed_down: {type(e).__name__}")
    # fused residual+restrict (the M >= 4096 split-down-path kernel, r5)
    try:
        from amg_tpu.ops.pallas.packed_cycle import \
            fused_residual_restrict_packed

        rr_ref = np.asarray(jax.jit(lambda u, b: restrict_packed(
            residual_packed(u, b, S_p.w33, m), m))(jnp.asarray(pref), b4))
        rr_got = np.asarray(jax.jit(
            lambda u, b: fused_residual_restrict_packed(
                u, b, S_p.w33, m))(jnp.asarray(pref), b4))[:m, :m]
        md = (float(np.abs(rr_got - rr_ref).max())
              / float(np.abs(rr_ref).max()))
        stats["packed_rr"] = md
        if md >= 1e-5:
            failed.append(f"packed_rr: WRONG reldiff={md:.3e}")
    except Exception as e:  # noqa: BLE001
        stats["packed_rr"] = f"{type(e).__name__}: {str(e)[:200]}"
        failed.append(f"packed_rr: {type(e).__name__}")
    try:
        uc = jax.random.normal(jax.random.PRNGKey(3), (m, m),
                               dtype=jnp.float32)
        up_ref = np.asarray(jax.jit(lambda u, b, c: gs4_sweep_packed(
            prolong_add_packed(u, c, m), b, S_p.w33, m, 1.0, True))(
                u4, b4, uc))
        got = np.asarray(jax.jit(lambda u, b, c: fused_up_leg_packed(
            u, b, c, S_p.w33, m, 1.0, True))(
                u4, b4, jnp.pad(uc, ((0, 1), (0, 1)))))
        md = (float(np.abs(got - up_ref).max())
              / float(np.abs(up_ref).max()))
        stats["packed_up"] = md
        if md >= 1e-5:
            failed.append(f"packed_up: WRONG reldiff={md:.3e}")
    except Exception as e:  # noqa: BLE001
        stats["packed_up"] = f"{type(e).__name__}: {str(e)[:200]}"
        failed.append(f"packed_up: {type(e).__name__}")
    # fused df32 residual+rss kernel (ops/pallas/packed_df.py)
    try:
        from amg_tpu.ops.doublefloat import DF32, df_rss_fast
        from amg_tpu.ops.pallas.packed_df import fused_df_residual_rss
        from amg_tpu.sparse.packed import df_residual_const_packed

        u_df = DF32(hi=u4, lo=u4 * jnp.float32(1e-8))
        b_df = DF32(hi=b4, lo=b4 * jnp.float32(1e-8))
        r_ref = jax.jit(lambda b, u: df_residual_const_packed(
            S_p.w33, b, u, m))(b_df, u_df)
        rss_ref = float(jax.jit(df_rss_fast)(r_ref))
        rh, parts = jax.jit(lambda b, u: fused_df_residual_rss(
            S_p.w33, b, u, m))(b_df, u_df)
        sc = float(np.abs(np.asarray(r_ref.hi)).max())
        md_r = float(np.abs(np.asarray(rh) - np.asarray(r_ref.hi)).max()
                     ) / sc
        rss_k = float(np.asarray(parts)[:, 0, 0].sum())
        md_s = abs(rss_k - rss_ref) / rss_ref
        stats["packed_dfres"] = max(md_r, md_s)
        if stats["packed_dfres"] >= 1e-5:
            failed.append(f"packed_dfres: WRONG {md_r:.1e}/{md_s:.1e}")
    except Exception as e:  # noqa: BLE001
        stats["packed_dfres"] = f"{type(e).__name__}: {str(e)[:200]}"
        failed.append(f"packed_dfres: {type(e).__name__}")
    log(f"pallas hardware parity gate: {stats}")
    assert not failed, f"fused Pallas kernel gate FAILED: {failed}"
    return stats


def sweep_sol_stats():
    """Per-sweep nnz/s and %-of-HBM-speed-of-light for the production
    smoother at the headline sizes (BASELINE north star).

    Timing methodology (r3): the timed jitted program RETURNS A SCALAR and
    the fetch of that scalar is inside the timed region — through the
    remote-TPU tunnel jax.block_until_ready can return before execution
    finishes, which made the r2-recorded sweeps measure dispatch latency
    (one ~25 ms round trip per 50-sweep call ≈ the recorded 0.498 ms/sweep
    at 1023). Inner counts are sized so dispatch+fetch overhead is <5% of
    the timed region."""
    from functools import partial

    from amg_tpu.models import poisson
    from amg_tpu.sparse.stencil import color_masks, gs4_sweep_masked
    from amg_tpu.utils.profiling import Roofline

    roof = Roofline()  # v5e defaults
    out = {}
    for side in (1023, 2047):
        S = _device_stencil(side)
        b2 = poisson.rhs_device(side, dtype=jnp.float32).reshape(side, side)
        masks = color_masks(side, jnp.float32)
        u0 = jnp.zeros_like(b2)
        bytes_24pass = 24 * side * side * 4
        inner = max(100, int(0.25 * roof.hbm_gbps * 1e9 // bytes_24pass))

        @partial(jax.jit, static_argnums=(4,))
        def loop(u, S_, b_, m_, k):
            o = jax.lax.fori_loop(
                0, k, lambda _, uu: gs4_sweep_masked(S_, uu, b_, m_,
                                                     1.0, True), u)
            return jnp.sum(o)

        best = 1e9
        float(loop(u0, S, b2, masks, inner))  # compile + warm
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(u0, S, b2, masks, inner))  # scalar fetch = true sync
            best = min(best, (time.perf_counter() - t0) / inner)

        # production sweeps at the same size: the XLA color-packed sweep
        # and the fused packed Pallas kernel (r4 production path)
        from amg_tpu.ops.pallas.packed_rbgs import fused_gs4_sweep_packed
        from amg_tpu.sparse.packed import gs4_sweep_packed, pack

        m = (side - 1) // 2
        u4 = pack(u0, m)
        b4 = pack(b2, m)
        w33 = S.w33

        def time_sweep(fn):
            @partial(jax.jit, static_argnums=(2,))
            def ploop(u_, b_, k):
                o = jax.lax.fori_loop(0, k,
                                      lambda _, uu: fn(uu, b_), u_)
                return jnp.sum(o)

            t = 1e9
            float(ploop(u4, b4, inner))
            for _ in range(4):
                t0 = time.perf_counter()
                float(ploop(u4, b4, inner))
                t = min(t, (time.perf_counter() - t0) / inner)
            return t

        bestp = time_sweep(lambda u, b: gs4_sweep_packed(
            u, b, w33, m, 1.0, True))
        bestf = time_sweep(lambda u, b: fused_gs4_sweep_packed(
            u, b, w33, m, 1.0, True))

        # analytic 5-point count (S.nnz would pull all 9 planes to host)
        nnz = 5 * side * side - 4 * side
        # min3 is the unbeatable bound (read u, read b, write u once).
        min3_s = 3 * side * side * 4 / (roof.hbm_gbps * 1e9)
        # keys carry the smoother name (ADVICE r3 #3): masked_/packed_/
        # fused_packed_ — round-over-round artifacts stay comparable.
        # (The nominal-24-pass 'packed_sol_pct' key was dropped in r5 —
        # a >100% "percent of speed of light" read as an artifact
        # landmine, VERDICT r4 weak #4; min3 keys are the meaningful
        # bound.)
        out[side] = dict(masked_sweep_ms=round(best * 1e3, 4),
                         packed_sweep_ms=round(bestp * 1e3, 4),
                         fused_packed_sweep_ms=round(bestf * 1e3, 4),
                         packed_gnnz_s=round(2 * nnz / bestp / 1e9, 2),
                         fused_gnnz_s=round(2 * nnz / bestf / 1e9, 2),
                         packed_min3_sol_pct=round(100 * min3_s / bestp, 1),
                         fused_min3_sol_pct=round(100 * min3_s / bestf, 1))
        log(f"sweep@{side}: masked {best*1e3:.4f} ms, "
            f"packed {bestp*1e3:.4f} ms, "
            f"fused-packed {bestf*1e3:.4f} ms, "
            f"{2*nnz/bestf/1e9:.1f} Gnnz/s (sym fused), "
            f"{100*min3_s/bestf:.0f}% of min-traffic SoL")
    return out


def device_time(solver, b2, k1: int = 1, k2: int = 4, reps: int = 3):
    """Dispatch-amortized device seconds per solve (VERDICT r4 weak #1).

    Times two queued-batch sizes k1 < k2 — each batch fetches ONLY its
    last stats array, so queued programs execute back-to-back and every
    batch pays exactly one tunnel round trip: t_k = k*exec + RT, so
    exec = (t_k2 - t_k1)/(k2 - k1). The r4 single-pair estimator was
    poisoned by one noisy t_1 (recorded device_s > wall at 4095^2);
    median of ``reps`` slopes + the caller clamps to wall.
    """
    slopes = []
    for _ in range(reps):
        ts = []
        for k in (k1, k2):
            t0 = time.perf_counter()
            st = [solver.solve_ir_device(b2, tolerance=TOL)[1]
                  for _ in range(k)]
            np.asarray(st[-1])
            ts.append(time.perf_counter() - t0)
        slopes.append((ts[1] - ts[0]) / (k2 - k1))
    med = float(np.median(slopes))
    log(f"  device_time slopes: {[f'{s:.4f}' for s in slopes]} "
        f"-> median {med:.4f}")
    return max(0.0, med)


def tpu_solve_at(side, n_runs=3):
    """Device-resident solve timings at one size. Fully device-resident:
    RHS generation, setup, and the solve loop move no bulk data over the
    tunnel; stats fetch inside the timed region (true sync). Production
    smoother: 'auto'. Returns a dict with wall/device/prepared seconds
    plus the setup/warmup (compile) accounting VERDICT r4 #2 asked for."""
    from amg_tpu.models import poisson
    from amg_tpu.structured import StructuredSolver

    b2 = poisson.rhs_device(side, dtype=jnp.float64).reshape(side, side)
    t0 = time.perf_counter()
    solver = StructuredSolver(side)
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    solver.warmup()
    warmup_s = time.perf_counter() - t0
    log(f"{side}^2: setup {setup_s:.1f}s, warmup (trace+compile/cache-"
        f"load) {warmup_s:.1f}s")
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        u, stats = solver.solve_ir_device(b2, tolerance=TOL)
        err_v, it_v = np.asarray(stats)
        times.append(time.perf_counter() - t0)
    assert err_v <= TOL, f"{side}^2 solve did not converge (rss={err_v:.3e})"
    t = min(times)
    dev = device_time(solver, b2)
    if dev > t:
        log(f"  WARNING: device estimate {dev:.4f} > wall {t:.4f}; "
            "clamping (consistency invariant)")
        dev = t
    # repeated-solve production form: rhs prepared once (like the
    # hierarchy), iterate returned packed — the per-solve cost with the
    # f64<->df32 conversions amortized away. Skipped at the RT-bound
    # 1023 headline (prepared == wall there; its program load costs
    # ~15 s of budget for an info-free number).
    tprep = None
    if solver._solve_core_j is not None and side > SIDE:
        bp = solver.prepare_b(b2)
        np.asarray(solver.solve_ir_device_prepared(bp, tolerance=TOL)[1])
        tp = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            u4, stats = solver.solve_ir_device_prepared(bp, tolerance=TOL)
            np.asarray(stats)
            tp.append(time.perf_counter() - t0)
        tprep = min(tp)
    log(f"tpu {side}^2 solve best-of-{n_runs}: {t:.4f}s wall, "
        f"{dev:.4f}s device"
        + (f", {tprep:.4f}s prepared-rhs" if tprep else "")
        + f" ({int(it_v) * solver.cycles_per_refine} cycles, "
        f"rss={err_v:.3e}, smoother={solver.smoother}"
        f"+fused={solver.fused_packed})")
    out = dict(wall_s=round(t, 5), device_s=round(dev, 5),
               setup_s=round(setup_s, 2), warmup_s=round(warmup_s, 2),
               cycles=int(it_v) * solver.cycles_per_refine,
               rss=float(err_v))
    if tprep is not None:
        out["prepared_s"] = round(tprep, 5)
    return out


def var_solve_at(side, n_runs=3, a_in=100.0, tol=None):
    """End-to-end VARIABLE-coefficient solve (VERDICT r4 #3): jump
    diffusion coefficient (a = 100 in the centered square, harmonic-mean
    faces; models/varcoef.py), hierarchy Galerkin-coarsened ON DEVICE
    (structured.build_stencil_hierarchy_planes), solved with the
    auto-selected var path (packed-var below FUSED_MIN_SIDE, fused masked
    kernel above — the e2e-measured winners, r5). Anchor: the reference
    solves any assembled A (multigrid.hpp:151-244)."""
    from amg_tpu.models import poisson
    from amg_tpu.models.varcoef import jump_planes
    from amg_tpu.structured import StructuredSolver

    if tol is None:
        # non-pow2 coefficients floor the refinement at ~2^-44 * rss(b)
        # under the ~13-orders-of-cancellation residual at the 2^22
        # coefficient scale (measured r5: hard stall at 1.0e-6 at
        # 4095^2 on BOTH the emulated-f64 and df32 residual paths; the
        # const path's exact pow2 weights are immune). Record the var
        # rows at the size's achievable absolute tolerance.
        tol = TOL if side <= 2047 else 1e-5
    b2 = poisson.rhs_device(side, dtype=jnp.float64).reshape(side, side)
    t0 = time.perf_counter()
    solver = StructuredSolver(side, A_planes=jump_planes(side, a_in=a_in))
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    u, stats = solver.solve_ir_device(b2, tolerance=tol)
    err_v, it_v = np.asarray(stats)
    warmup_s = time.perf_counter() - t0
    assert err_v <= tol, f"var {side}^2 rss={err_v:.3e}"
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        u, stats = solver.solve_ir_device(b2, tolerance=tol)
        err_v, it_v = np.asarray(stats)
        times.append(time.perf_counter() - t0)
    t = min(times)
    # device split with the var tolerance (device_time times solves at
    # TOL by default — pass through the achievable tol)
    slopes = []
    for _ in range(2):
        ts = []
        for k in (1, 3):
            t0 = time.perf_counter()
            st = [solver.solve_ir_device(b2, tolerance=tol)[1]
                  for _ in range(k)]
            np.asarray(st[-1])
            ts.append(time.perf_counter() - t0)
        slopes.append((ts[1] - ts[0]) / 2)
    dev = min(t, max(0.0, float(np.median(slopes))))
    log(f"tpu VAR(jump a={a_in:g}) {side}^2 best-of-{n_runs}: {t:.4f}s "
        f"wall, {dev:.4f}s device ({int(it_v) * solver.cycles_per_refine} "
        f"cycles, rss={err_v:.3e}, tol={tol:g}, "
        f"smoother={solver.smoother})")
    return dict(wall_s=round(t, 5), device_s=round(dev, 5), tolerance=tol,
                setup_s=round(setup_s, 2), warmup_s=round(warmup_s, 2),
                cycles=int(it_v) * solver.cycles_per_refine,
                rss=float(err_v), smoother=solver.smoother)


def cpu_baseline(side=SIDE, n_runs=3):
    # (min of n_runs for a stable single-thread number)
    import scipy.sparse as sp

    from amg_tpu.models import poisson
    from amg_tpu.native import bindings
    from amg_tpu.ops.transfer import linear_interp_1d
    from amg_tpu.structured import max_levels_for_side

    if not bindings.available():
        log("native baseline unavailable; using stored constant")
        return None

    n_levels = max_levels_for_side(side)
    mats = [poisson.laplacian_scipy(side)]
    Ps, Rs = [], []
    s = side
    t0 = time.perf_counter()
    for _ in range(n_levels - 1):
        nc = (s - 1) // 2
        P1 = linear_interp_1d(s, nc)
        P2 = sp.kron(P1, P1).tocsr()
        Ps.append(P2)
        Rs.append(P2.T.tocsr())
        mats.append(bindings.galerkin_rap(Rs[-1], mats[-1], P2))
        s = nc
    log(f"cpu setup {time.perf_counter()-t0:.1f}s (side {side})")
    b = np.asarray(poisson.rhs(side, dtype=jnp.float64))
    runs = [bindings.cpu_vcycle_solve(mats, Ps, Rs, b, tol=TOL,
                                      check_every=1, max_iters=100)
            for _ in range(n_runs)]
    secs, iters, rss, u = min(runs, key=lambda r: r[0])
    log(f"cpu reference-class solve side={side} best-of-{n_runs}: "
        f"{secs:.3f}s ({iters} cycles, rss={rss:.3e})")
    if rss > TOL:
        log("WARNING: cpu baseline did not converge")
    return secs


def pcg_stats():
    """Device-resident AMG-preconditioned CG (krylov.solve_pcg_device) at
    2047^2/4095^2 — the 'standard production configuration' extension,
    timed on hardware (VERDICT r3 #7). f32-native, so the tolerance is
    the f32-attainable 1e-5 (the f32 residual's rounding floor scales
    with nnz; reference-grade 1e-7 at these sizes needs the df32 defect
    correction, which is the plain-IR headline path). The row documents
    the crossover: PCG cuts cycle counts but pays one extra fine-level
    matvec + two dot products per iteration."""
    from amg_tpu.krylov import solve_pcg_device
    from amg_tpu.models import poisson
    from amg_tpu.structured import build_stencil_hierarchy_device

    out = {}
    for side in (2047, 4095):
        hier = build_stencil_hierarchy_device(side, smoother="packed")
        b2 = poisson.rhs_device(side, dtype=jnp.float32).reshape(side,
                                                                 side)
        u, stats = solve_pcg_device(hier, b2, tolerance=1e-5,
                                    n_iters=50, fused=True)
        err_v, it_v = np.asarray(stats)  # warm + sync
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            u, stats = solve_pcg_device(hier, b2, tolerance=1e-5,
                                        n_iters=50, fused=True)
            err_v, it_v = np.asarray(stats)
            best = min(best, time.perf_counter() - t0)
        assert err_v <= 1e-5, f"PCG@{side} rss={err_v:.3e}"
        out[side] = dict(wall_s=round(best, 5), iters=int(it_v),
                         rss=float(err_v))
        log(f"pcg@{side}: {best:.4f}s wall, {int(it_v)} iters, "
            f"rss={err_v:.3e} (tol 1e-5, f32)")
    return out


def _stage(fn, name):
    """Auxiliary stages must not kill the headline metric: report their
    failure in extras instead (the driver needs the JSON line). One retry
    absorbs transient tunnel faults ('response body closed' class)."""
    last = None
    for attempt in range(2):
        try:
            return fn(), None
        except Exception as e:  # noqa: BLE001 — reported, not swallowed
            last = e
            log(f"stage {name} FAILED (attempt {attempt + 1}): "
                f"{type(e).__name__}: {e}")
    return None, f"{type(last).__name__}: {str(last)[:300]}"


def main():
    def budget_left():
        return _WATCHDOG_S - (time.perf_counter() - _START)

    stage_s = {}

    def run_stage(name, fn, need=0):
        """Budget-gated stage. Stage ORDER (r5, VERDICT r4 #2): cheap/
        high-value stages (PCG, var) run BEFORE the big 8191^2 compile so
        a tight budget starves the most expensive stage, not the newest
        ones; per-stage wall seconds are recorded in extras."""
        if need and budget_left() < need:
            log(f"stage {name}: skipped (budget {budget_left():.0f}s "
                f"< {need}s)")
            return None, f"skipped (budget {budget_left():.0f}s)"
        t0 = time.perf_counter()
        r, err = _stage(fn, name)
        stage_s[name] = round(time.perf_counter() - t0, 1)
        # keep the watchdog's partial artifact current (stage results in
        # raw form; the canonical extras shape is rebuilt at the end)
        if _PARTIAL:
            _PARTIAL["extras"][name] = r if r is not None else err
            _PARTIAL["extras"]["stage_seconds"] = dict(stage_s)
        return r, err

    gate, gate_err = run_stage("pallas_gate", pallas_hardware_gate)
    # the headline — failures here are fatal
    r1023 = tpu_solve_at(SIDE, n_runs=5)
    tpu_secs = r1023["wall_s"]
    # the headline's CPU baseline runs IMMEDIATELY after the headline
    # solve: it is cheap (~7 s), pure host, and vs_baseline must never
    # be starved by the optional stages below (r5: it previously ran
    # second-to-last, one overrun away from a NaN headline).
    cpu_secs, _ = run_stage("cpu_baseline", cpu_baseline, need=15)
    # arm the watchdog's partial artifact: from here on an overrunning
    # stage degrades to a partial extras dict, never a lost JSON line
    _PARTIAL.update({
        "metric": f"poisson2d_{SIDE}x{SIDE}_amg_solve_rss1e-7_wall",
        "value": round(tpu_secs, 5),
        "unit": "s",
        "vs_baseline": (round(cpu_secs / tpu_secs, 2) if cpu_secs
                        else float("nan")),
        "extras": {"solve_1023": dict(r1023),
                   "pallas_hw_parity": gate if gate else gate_err},
    })
    r2047, e2047 = run_stage("solve_2047", lambda: tpu_solve_at(2047),
                             need=45)
    pcg, pcg_err = run_stage("pcg", pcg_stats, need=55)
    r4095, e4095 = run_stage("solve_4095",
                             lambda: tpu_solve_at(4095), need=65)
    var2047, ev2047 = run_stage("var_2047", lambda: var_solve_at(2047),
                                need=75)
    r8191, e8191 = run_stage("solve_8191",
                             lambda: tpu_solve_at(8191, n_runs=2),
                             need=110)
    var4095, ev4095 = run_stage("var_4095",
                                lambda: var_solve_at(4095, n_runs=2),
                                need=60)
    sol, sol_err = run_stage("sweep_sol", sweep_sol_stats, need=50)
    # compute-dominated second metric row (VERDICT r4 #7): the 1023^2
    # wall is ~80% one tunnel round trip; the 4095^2 prepared-rhs row
    # reflects the chip. Its CPU baseline costs ~50 s (28 s native RAP
    # setup at 16.8M dofs); when budget-skipped, the r5 long-budget
    # measurement is carried in the row with provenance.
    cpu4095 = None
    if r4095 is not None:
        cpu4095, _ = run_stage("cpu_baseline_4095",
                               lambda: cpu_baseline(4095, n_runs=1),
                               need=70)
    vs = (cpu_secs / tpu_secs) if cpu_secs else float("nan")
    extras = {}
    extras["device_s"] = r1023["device_s"]
    extras["solve_1023"] = r1023
    for key, r, err in (("solve_2047", r2047, e2047),
                        ("solve_4095", r4095, e4095),
                        ("solve_8191", r8191, e8191)):
        if r is not None:
            extras[f"{key}_s"] = r["wall_s"]
            extras[f"{key}_device_s"] = r["device_s"]
            if "prepared_s" in r:
                extras[f"{key}_prepared_s"] = r["prepared_s"]
            extras[f"{key}_warmup_s"] = r["warmup_s"]
            extras[f"{key}_setup_s"] = r["setup_s"]
        else:
            extras[f"{key}_s"] = err
    if r4095 is not None:
        v4095 = r4095.get("prepared_s", r4095["wall_s"])
        extras["metric_4095"] = {
            "metric": "poisson2d_4095x4095_amg_solve_rss1e-7_prepared",
            "value": v4095,
            "unit": "s",
            "vs_baseline": (round(cpu4095 / v4095, 2) if cpu4095
                            else None),
            "cpu_baseline_s": (round(cpu4095, 3) if cpu4095 else None),
        }
        if not cpu4095:
            # budget-skipped this run; carry the r5 long-budget
            # measurement (BENCH_WATCHDOG_S=1400 run, 2026-08-21:
            # native single-thread AMG, best-of-1) with provenance
            extras["metric_4095"]["cpu_baseline_s_r5_measured"] = 21.225
            extras["metric_4095"]["vs_baseline_r5_measured"] = round(
                21.225 / v4095, 2)
    extras["var_solve"] = {
        "2047": var2047 if var2047 is not None else ev2047,
        "4095": var4095 if var4095 is not None else ev4095,
    }
    extras["sweep_sol"] = sol if sol is not None else sol_err
    extras["pcg"] = pcg if pcg is not None else pcg_err
    # full per-variant map (floats = maxdiff, strings = failure)
    extras["pallas_hw_parity"] = gate if gate else gate_err
    extras["stage_seconds"] = stage_s
    _PARTIAL.clear()  # disarm the watchdog's partial-print path
    print(json.dumps({
        "metric": f"poisson2d_{SIDE}x{SIDE}_amg_solve_rss1e-7_wall",
        "value": round(tpu_secs, 5),
        "unit": "s",
        "vs_baseline": round(vs, 2),
        "extras": extras,
    }), flush=True)


if __name__ == "__main__":
    main()
