"""Per-stage device-time breakdown of one defect-correction refine step.

VERDICT r3 #1: at 4095^2 one packed symmetric sweep is ~0.48 ms yet a
refine (df32 residual + 2 packed V-cycles) measures ~28 ms wall — the
cycle costs 3-5x the sum of its measured parts. This script attributes
that gap stage by stage on the real chip.

Methodology (docs/PERF.md r3 rules): every timed jitted program returns a
scalar whose host fetch sits inside the timed region (block_until_ready
lies through the tunnel); inner loop counts amortize dispatch to <5%;
each stage keeps a dependency on the loop carry so XLA cannot hoist it
(loop-invariant bodies get hoisted, inverse pairs get cancelled).

Stages are measured by INCREMENTAL COMPOSITION: variant k's body is
variant k-1's body plus one more op, all feeding the carry; successive
differences give per-op device time. Cross-checked against standalone
whole-body measurements (full V-cycle, full refine) and the end-to-end
solve.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_refine.py [side]
Writes a markdown table to stdout (redirect into PROFILE_r04.md).
"""

import sys
import time
from functools import partial

import jax

from amg_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(str(__import__("pathlib").Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 4095


def timed(fn, *args, target_s=0.4, max_inner=4000):
    """Best-of-4 per-iteration seconds of jitted fn(carry, *args, k) that
    runs its body k times and returns a scalar.

    TWO-POINT calibration (r4 lesson): a single short run bakes the
    ~25 ms tunnel round trip into the per-iteration estimate, making the
    chosen k far too small and every reported number dispatch-inflated
    (the r4 first-pass profile overstated the sweep 2x this way). Slope
    between k=8 and k=64 removes the constant term; the final k then
    amortizes dispatch below ~5%."""
    for k in (8, 64):
        float(fn(*args, k))  # compile both trip counts
    t8 = t64 = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(*args, 8))
        t8 = min(t8, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fn(*args, 64))
        t64 = min(t64, time.perf_counter() - t0)
    per = max((t64 - t8) / 56, 1e-7)
    k = int(min(max_inner, max(64, target_s / per)))
    float(fn(*args, k))  # compile at the real k
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(fn(*args, k))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    from amg_tpu.models import poisson
    from amg_tpu.ops.doublefloat import DF32, df_add_f32, df_rss
    from amg_tpu.sparse.packed import (df_residual_const_packed,
                                       gs4_sweep_packed, pack,
                                       prolong_add_packed, residual_packed,
                                       restrict_packed)
    from amg_tpu.structured import (StructuredSolver, fmg_stencil,
                                    vcycle_packed)

    side = SIDE
    m = (side - 1) // 2
    print(f"# Refine-step profile @ {side}^2 "
          f"({side * side / 1e6:.1f}M dofs), TPU v5e", flush=True)

    solver = StructuredSolver(side)
    hier = solver.hier
    w33 = hier.levels[0].w33
    b2 = poisson.rhs_device(side, dtype=jnp.float64).reshape(side, side)
    b4 = pack(b2.astype(jnp.float32), m)
    u4 = jnp.zeros_like(b4)
    b4_df = DF32(hi=b4, lo=jnp.zeros_like(b4))

    # --- incremental composition ladder ---------------------------------
    from amg_tpu.ops.pallas.packed_rbgs import (eligible,
                                                fused_gs4_sweep_packed)
    use_fz = solver.fused_packed and eligible(m)

    def body_sweep(u, b):
        if use_fz:
            return fused_gs4_sweep_packed(u, b, w33, m, 1.0, True)
        return gs4_sweep_packed(u, b, w33, m, 1.0, True)

    def body_resid(u, b):
        u = body_sweep(u, b)
        r = residual_packed(u, b, w33, m)
        return u + jnp.float32(1e-6) * r          # feed carry

    def body_restrict(u, b):
        u = body_sweep(u, b)
        r = residual_packed(u, b, w33, m)
        bc = restrict_packed(r, m)
        # cheap map back into the carry so restrict isn't dead code:
        # broadcast one coarse scalar is too cheap to hide the op? No —
        # the op itself still runs; only its RESULT must be live.
        return u + jnp.float32(1e-6) * r + jnp.float32(1e-9) * jnp.sum(bc)

    def body_prolong(u, b):
        u = body_sweep(u, b)
        r = residual_packed(u, b, w33, m)
        bc = restrict_packed(r, m)
        return prolong_add_packed(u, jnp.float32(1e-6) * bc, m)

    ladder = [("packed symmetric sweep", body_sweep),
              ("+ packed residual", body_resid),
              ("+ restriction", body_restrict),
              ("+ prolong-add", body_prolong)]

    results = []
    for name, body in ladder:
        @partial(jax.jit, static_argnums=(2,))
        def loop(u, b, k, body=body):
            o = jax.lax.fori_loop(0, k, lambda _, uu: body(uu, b), u)
            return jnp.sum(o)

        t = timed(loop, u4, b4)
        results.append((name, t))
        print(f"  {name}: {t * 1e3:.3f} ms", file=sys.stderr, flush=True)

    # --- whole-body stages ---------------------------------------------
    fz = solver.fused_packed

    def body_vcycle(u, b):
        return vcycle_packed(hier, u, b, 1, 1, 1.0, True,
                             _packed_in=True,
                             min_side=solver.packed_min_side, fused=fz)

    @partial(jax.jit, static_argnums=(2,))
    def loop_vcycle(u, b, k):
        o = jax.lax.fori_loop(0, k, lambda _, uu: body_vcycle(uu, b), u)
        return jnp.sum(o)

    t_vc = timed(loop_vcycle, u4, b4)
    print(f"  full packed V-cycle: {t_vc * 1e3:.3f} ms", file=sys.stderr,
          flush=True)

    # coarse subtree alone (levels 1+): cycle on the restricted field
    from amg_tpu.structured import cycle_stencil
    bc0 = restrict_packed(residual_packed(u4, b4, w33, m), m)

    @partial(jax.jit, static_argnums=(2,))
    def loop_coarse(u, b, k):
        def body(_, uu):
            o = vcycle_packed(hier, jnp.zeros_like(uu), b, 1, 1, 1.0,
                              True, _level=1,
                              min_side=solver.packed_min_side, fused=fz)
            return uu + jnp.float32(1e-6) * o
        o = jax.lax.fori_loop(0, k, body, u)
        return jnp.sum(o)

    t_coarse = timed(loop_coarse, jnp.zeros_like(bc0), bc0)
    print(f"  coarse subtree (levels 1+): {t_coarse * 1e3:.3f} ms",
          file=sys.stderr, flush=True)

    # df32 residual + rss on packed state
    @partial(jax.jit, static_argnums=(1,))
    def loop_df(u_df_hi, k):
        def body(_, carry):
            uhi = carry
            u_df = DF32(hi=uhi, lo=jnp.zeros_like(uhi))
            r = df_residual_const_packed(w33, b4_df, u_df, m)
            err = df_rss(r)
            return uhi + jnp.float32(1e-6) * r.hi \
                + (jnp.float32(1e-12) * err).astype(jnp.float32)
        o = jax.lax.fori_loop(0, k, body, u_df_hi)
        return jnp.sum(o)

    t_df = timed(loop_df, u4)
    print(f"  df32 residual + rss: {t_df * 1e3:.3f} ms", file=sys.stderr,
          flush=True)

    # full refine body exactly as the solve loop runs it
    def refine_body(u_df):
        r = df_residual_const_packed(w33, b4_df, u_df, m)
        err = df_rss(r)
        e = r.hi
        for _ in range(solver.cycles_per_refine):
            e = vcycle_packed(hier, jnp.zeros_like(e) if e is r.hi else e,
                              r.hi, 1, 1, 1.0, True, _packed_in=True,
                              min_side=solver.packed_min_side, fused=fz)
        u2 = df_add_f32(u_df, e)
        return DF32(hi=u2.hi + (jnp.float32(1e-12) * err
                                ).astype(jnp.float32), lo=u2.lo)

    @partial(jax.jit, static_argnums=(1,))
    def loop_refine(uhi, k):
        def body(_, carry):
            return refine_body(DF32(hi=carry, lo=jnp.zeros_like(carry))).hi
        o = jax.lax.fori_loop(0, k, body, uhi)
        return jnp.sum(o)

    t_refine = timed(loop_refine, u4)
    print(f"  full refine body (df resid + {solver.cycles_per_refine} "
          f"cycles): {t_refine * 1e3:.3f} ms", file=sys.stderr, flush=True)

    # FMG start (runs once per solve)
    @partial(jax.jit, static_argnums=(1,))
    def loop_fmg(uhi, k):
        def body(_, carry):
            bc = restrict_packed(carry, m)
            uc = fmg_stencil(hier, bc, 1, 1, 1, 1.0, True, start_level=1,
                             fused=fz)
            u0f = prolong_add_packed(jnp.zeros_like(carry), uc, m)
            u0f = vcycle_packed(hier, u0f, carry, 1, 1, 1.0, True,
                                _packed_in=True,
                                min_side=solver.packed_min_side, fused=fz)
            return carry + jnp.float32(1e-6) * u0f
        o = jax.lax.fori_loop(0, k, body, uhi)
        return jnp.sum(o)

    t_fmg = timed(loop_fmg, b4)
    print(f"  FMG start: {t_fmg * 1e3:.3f} ms", file=sys.stderr, flush=True)

    # end-to-end solve (dispatch included), plus back-to-back x3 for the
    # dispatch-amortized device figure
    solver.warmup()
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        u, stats = solver.solve_ir_device(b2, tolerance=1e-7)
        err_v, it_v = np.asarray(stats)
        times.append(time.perf_counter() - t0)
    t_solve = min(times)
    n_ref = int(it_v)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [solver.solve_ir_device(b2, tolerance=1e-7) for _ in range(3)]
        s = np.asarray(outs[-1][1])  # one fetch syncs the chain
        for uu, st in outs[:-1]:
            np.asarray(st)
        times.append(time.perf_counter() - t0)
    t_solve3 = min(times) / 3

    # --- report ---------------------------------------------------------
    d = dict(results)
    sweep = d["packed symmetric sweep"]
    resid = d["+ packed residual"] - sweep
    restr = d["+ restriction"] - d["+ packed residual"]
    prol = d["+ prolong-add"] - d["+ restriction"]
    fine_leg = 2 * sweep + resid + restr + prol
    print()
    print("| stage | ms | notes |")
    print("|---|---|---|")
    print(f"| packed symmetric sweep (fine) | {sweep*1e3:.3f} | "
          "2x per V-cycle (pre+post) |")
    print(f"| packed residual (fine) | {resid*1e3:.3f} | 1x per V-cycle |")
    print(f"| restriction (fine) | {restr*1e3:.3f} | 1x per V-cycle |")
    print(f"| prolong-add (fine) | {prol*1e3:.3f} | 1x per V-cycle |")
    print(f"| fine-level leg total | {fine_leg*1e3:.3f} | "
          "2 sweeps + resid + restrict + prolong |")
    print(f"| coarse subtree (levels 1+) | {t_coarse*1e3:.3f} | "
          "per V-cycle |")
    print(f"| **full packed V-cycle** | **{t_vc*1e3:.3f}** | "
          f"sum of parts = {(fine_leg + t_coarse)*1e3:.3f} ms |")
    print(f"| df32 residual + rss | {t_df*1e3:.3f} | 1x per refine |")
    print(f"| **full refine body** | **{t_refine*1e3:.3f}** | "
          f"sum = df + {solver.cycles_per_refine} cycles = "
          f"{(t_df + solver.cycles_per_refine * t_vc)*1e3:.3f} ms |")
    print(f"| FMG start | {t_fmg*1e3:.3f} | 1x per solve |")
    print(f"| solve wall (1 dispatch) | {t_solve*1e3:.3f} | "
          f"{n_ref} refines; refines x body + FMG = "
          f"{(n_ref * t_refine + t_fmg)*1e3:.3f} ms + dispatch |")
    print(f"| solve device (amortized /3) | {t_solve3*1e3:.3f} | "
          "3 back-to-back solves, one fetch |")
    print(f"\ndispatch estimate: {(t_solve - t_solve3)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
