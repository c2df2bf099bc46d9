"""TPU micro-benchmarks for the stencil kernels (run on the real chip).

Usage: python scripts/microbench.py [side]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from amg_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(str(__import__("pathlib").Path(__file__).resolve().parents[1] / ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from amg_tpu.models import poisson
from amg_tpu.sparse.stencil import (Stencil2D, color_masks, gs4_sweep,
                                    gs4_sweep_masked, jacobi_sweep)


INNER = 2000  # amortize dispatch+fetch (~26 ms RT through the tunnel;
# r4 lesson: 50 left every sub-ms kernel reading as the 0.5 ms floor)


def loopit(step):
    """step: (u, *ops) -> u. Returns jitted fn running INNER iterations
    and reducing to a SCALAR: through the remote-TPU tunnel only a host
    data fetch reliably synchronizes (block_until_ready can return before
    execution completes — see docs/PERF.md r3 methodology). Operands are
    jit ARGUMENTS — closure capture would embed them as HLO constants
    (huge compile times; see amg_tpu/structured.py)."""

    @jax.jit
    def run(u, *ops):
        out = jax.lax.fori_loop(0, INNER,
                                lambda _, uu: step(uu, *ops), u)
        return jnp.sum(out)

    return run


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        float(fn(*args))  # scalar fetch = the only true sync
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters / INNER


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 511
    dtype = jnp.float32
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side, dtype=dtype)
    b2 = poisson.rhs(side, dtype=dtype).reshape(side, side)
    u2 = jnp.zeros_like(b2)
    masks = color_masks(side, dtype)
    nnz = S.nnz

    t = timeit(loopit(lambda u, S_: S_.matvec2(u)), u2, S)
    print(f"matvec2       {t*1e3:8.3f} ms   {nnz/t/1e9:8.2f} Gnnz/s")

    if os.environ.get("BENCH_STRIDED"):
        # pathological on TPU (lane-strided); kept for documentation
        t = timeit(loopit(lambda u, S_, b_: gs4_sweep(S_, u, b_, 1.0, True)),
                   u2, S, b2)
        print(f"gs4 strided   {t*1e3:8.3f} ms   "
              f"{2*nnz/t/1e9:8.2f} Gnnz/s (sym)")

    t = timeit(loopit(lambda u, S_, b_, m_: gs4_sweep_masked(
        S_, u, b_, m_, 1.0, True)), u2, S, b2, masks)
    print(f"gs4 masked    {t*1e3:8.3f} ms   {2*nnz/t/1e9:8.2f} Gnnz/s (sym)")

    t = timeit(loopit(lambda u, S_, b_: jacobi_sweep(S_, u, b_)), u2, S, b2)
    print(f"jacobi        {t*1e3:8.3f} ms   {nnz/t/1e9:8.2f} Gnnz/s")

    # production color-packed sweep (sparse/packed.py)
    from amg_tpu.sparse.packed import gs4_sweep_packed, pack

    m = (side - 1) // 2
    w33 = S.w33
    t = timeit(loopit(lambda u, b_: gs4_sweep_packed(u, b_, w33, m,
                                                     1.0, True)),
               pack(u2, m), pack(b2, m))
    print(f"gs4 packed    {t*1e3:8.3f} ms   {2*nnz/t/1e9:8.2f} Gnnz/s (sym)")

    # fused Pallas symmetric sweep (single- and double-buffered).
    # COMPILED-MODE PARITY GATE: interpret-mode tests cannot catch
    # hardware DMA-ordering bugs (round-1 lesson), so every timed variant
    # is first checked against the masked XLA sweep ON THIS BACKEND.
    from amg_tpu.ops.pallas.rbgs import PaddedStencil, fused_gs4_sweep

    rng = np.random.default_rng(0)
    uc = jnp.asarray(rng.standard_normal((side, side)), dtype=dtype)
    ref_sweep = np.asarray(jax.jit(gs4_sweep_masked)(S, uc, b2, masks))

    import dataclasses as _dc

    S_var = _dc.replace(S, w33=None)  # force the variable-coefficient path
    combos = [("cst", S, None, False), ("cst", S, None, True),
              ("cst", S, 256, False), ("cst", S, 64, True),
              ("var", S_var, None, False), ("var", S_var, None, True)]
    for kind, S_, tr, db in combos:
        try:
            ps = PaddedStencil.prepare(S_, tr=tr, dtype=dtype,
                                       double_buffer=db)
            bp = ps.pad_field(b2)
            got = np.asarray(ps.unpad_field(fused_gs4_sweep(
                ps, ps.pad_field(uc), bp, double_buffer=db)))
            maxdiff = float(np.abs(got - ref_sweep).max())
            assert maxdiff < 5e-5, (
                f"fused {kind}(tr={ps.tr},db={db}) WRONG on this backend: "
                f"maxdiff={maxdiff:.3e}")
            t = timeit(loopit(lambda u, ps_, b_: fused_gs4_sweep(
                ps_, u, b_, double_buffer=db)), ps.pad_field(u2), ps, bp)
            tag = "db" if db else "sb"
            print(f"gs4 fused {kind}({ps.tr:3d},{tag}) {t*1e3:7.3f} ms   "
                  f"{2*nnz/t/1e9:8.2f} Gnnz/s (sym)  "
                  f"parity={maxdiff:.1e}")
        except Exception as e:
            print(f"gs4 fused {kind}({tr},db={db}) FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}")

    # fused PACKED kernels (r4 production path): parity-gated on this
    # backend, then timed
    from amg_tpu.ops.doublefloat import DF32, df_rss_fast
    from amg_tpu.ops.pallas.packed_cycle import (fused_down_leg_packed,
                                                 fused_up_leg_packed)
    from amg_tpu.ops.pallas.packed_df import fused_df_residual_rss
    from amg_tpu.ops.pallas.packed_rbgs import fused_gs4_sweep_packed
    from amg_tpu.sparse.packed import (df_residual_const_packed,
                                       prolong_add_packed, residual_packed,
                                       restrict_packed)

    u4p, b4p = pack(uc, m), pack(b2, m)
    pref = np.asarray(jax.jit(lambda u, b: gs4_sweep_packed(
        u, b, w33, m, 1.0, True))(u4p, b4p))
    psc = float(np.abs(pref).max())
    for pipe in ("sb", "db"):
        try:
            got = np.asarray(jax.jit(lambda u, b, pipe=pipe:
                                     fused_gs4_sweep_packed(
                                         u, b, w33, m, 1.0, True,
                                         pipeline=pipe))(u4p, b4p))
            rel = float(np.abs(got - pref).max()) / psc
            assert rel < 1e-5, f"packed fused {pipe} WRONG rel={rel:.2e}"
            t = timeit(loopit(lambda u, b_, pipe=pipe:
                              fused_gs4_sweep_packed(u, b_, w33, m, 1.0,
                                                     True, pipeline=pipe)),
                       pack(u2, m), b4p)
            print(f"gs4 fpacked {pipe}  {t*1e3:7.3f} ms   "
                  f"{2*nnz/t/1e9:8.2f} Gnnz/s (sym)  parity={rel:.1e}")
        except Exception as e:
            print(f"gs4 fpacked {pipe} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}")

    try:
        bc_ref = np.asarray(jax.jit(lambda u, b: restrict_packed(
            residual_packed(u, b, w33, m), m))(jnp.asarray(pref), b4p))
        u_got, bc_pad = jax.jit(lambda u, b: fused_down_leg_packed(
            u, b, w33, m, 1.0, True))(u4p, b4p)
        rel = max(float(np.abs(np.asarray(u_got) - pref).max()) / psc,
                  float(np.abs(np.asarray(bc_pad)[:m, :m] - bc_ref).max())
                  / float(np.abs(bc_ref).max()))
        assert rel < 1e-5, f"down leg WRONG rel={rel:.2e}"
        t = timeit(loopit(lambda u, b_: fused_down_leg_packed(
            u, b_, w33, m, 1.0, True)[0]), pack(u2, m), b4p)
        print(f"down leg       {t*1e3:7.3f} ms  (sweep+resid+restrict)  "
              f"parity={rel:.1e}")
        ucrs = jnp.zeros((m + 1, m + 1), dtype=dtype)
        up_ref = np.asarray(jax.jit(lambda u, b, c: gs4_sweep_packed(
            prolong_add_packed(u, c, m), b, w33, m, 1.0, True))(
                u4p, b4p, ucrs[:m, :m]))
        got = np.asarray(jax.jit(lambda u, b, c: fused_up_leg_packed(
            u, b, c, w33, m, 1.0, True))(u4p, b4p, ucrs))
        rel = float(np.abs(got - up_ref).max()) / psc
        assert rel < 1e-5, f"up leg WRONG rel={rel:.2e}"
        t = timeit(loopit(lambda u, b_, c_: fused_up_leg_packed(
            u, b_, c_, w33, m, 1.0, True)), pack(u2, m), b4p, ucrs)
        print(f"up leg         {t*1e3:7.3f} ms  (prolong+sweep)         "
              f"parity={rel:.1e}")
    except Exception as e:
        print(f"leg kernels FAILED: {type(e).__name__}: {str(e)[:160]}")

    try:
        u_df = DF32(hi=u4p, lo=u4p * jnp.float32(1e-8))
        b_df = DF32(hi=b4p, lo=b4p * jnp.float32(1e-8))
        r_ref = jax.jit(lambda b, u: df_residual_const_packed(
            w33, b, u, m))(b_df, u_df)
        rss_ref = float(jax.jit(df_rss_fast)(r_ref))
        rh, parts = jax.jit(lambda b, u: fused_df_residual_rss(
            w33, b, u, m))(b_df, u_df)
        rel = max(
            float(np.abs(np.asarray(rh) - np.asarray(r_ref.hi)).max())
            / float(np.abs(np.asarray(r_ref.hi)).max()),
            abs(float(np.asarray(parts)[:, 0, 0].sum()) - rss_ref)
            / rss_ref)
        assert rel < 1e-5, f"df residual WRONG rel={rel:.2e}"
        t = timeit(loopit(lambda uh, b_: fused_df_residual_rss(
            w33, b_, DF32(hi=uh, lo=uh * jnp.float32(1e-8)), m)[0]),
            pack(u2, m), b_df)
        print(f"df resid+rss   {t*1e3:7.3f} ms  (fused kernel)          "
              f"parity={rel:.1e}")
    except Exception as e:
        print(f"df residual kernel FAILED: {type(e).__name__}: "
              f"{str(e)[:160]}")

    # memory roofline reference: one full-field axpy
    t = timeit(loopit(lambda u: u + 1.0), u2)
    bw = 2 * side * side * u2.dtype.itemsize / t / 1e9
    print(f"axpy ref      {t*1e3:8.3f} ms   {bw:8.1f} GB/s")


if __name__ == "__main__":
    main()
