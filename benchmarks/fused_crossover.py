"""Fused-Pallas vs XLA-masked smoother crossover measurement (real TPU).

VERDICT r2 #2: replace the guessed FUSED_MIN_SIDE with a measured
crossover. Prints per-side sweep times for the masked XLA path and the
fused const-stencil kernel (single- and double-buffered), with inner-loop
counts large enough to amortize the remote-tunnel dispatch round trip
(~25 ms) to <5% of the timed region.
"""

import sys
import time

import jax

from amg_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(str(__import__("pathlib").Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from functools import partial


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(sides=(1023, 2047, 4095)):
    from amg_tpu.models import poisson
    from amg_tpu.ops.pallas.rbgs import PaddedStencil, fused_gs4_sweep
    from amg_tpu.ops.rap import poisson_const_w33, poisson_planes
    from amg_tpu.sparse.stencil import (Stencil2D, color_masks,
                                        gs4_sweep_masked)
    from amg_tpu.utils.profiling import Roofline

    roof = Roofline()
    results = {}
    for side in sides:
        S = Stencil2D(c=poisson_planes(side, jnp.float32), side=side,
                      w33=poisson_const_w33(side, 1)[0])
        b2 = poisson.rhs_device(side, dtype=jnp.float32).reshape(side, side)
        masks = color_masks(side, jnp.float32)
        u0 = jnp.zeros_like(b2)
        # inner count sized for >=0.25 s of compute at HBM speed-of-light
        bytes_per_sweep = 24 * side * side * 4
        inner = max(50, int(0.25 * roof.hbm_gbps * 1e9 // bytes_per_sweep))

        # timed jitted programs RETURN A SCALAR: through the remote-TPU
        # tunnel jax.block_until_ready does not reliably wait for execution
        # (measured: a 40-step 8192^2 matmul chain "blocked" in 0.1 ms and
        # then took 65 s to fetch) — only a host data fetch is a true sync.
        @partial(jax.jit, static_argnums=(4,))
        def mloop(u, S_, b_, m_, k):
            out = jax.lax.fori_loop(
                0, k, lambda _, uu: gs4_sweep_masked(S_, uu, b_, m_,
                                                     1.0, True), u)
            return jnp.sum(out)

        def time_it(fn, reps=4):
            best = 1e9
            float(fn())  # warm compile + execute
            for _ in range(reps):
                t0 = time.perf_counter()
                float(fn())  # scalar fetch = the only real sync
                best = min(best, time.perf_counter() - t0)
            return best

        t_masked = time_it(lambda: mloop(u0, S, b2, masks, inner)) / inner
        row = {"masked_ms": round(t_masked * 1e3, 4), "inner": inner}

        for db in (False, True):
            ps = PaddedStencil.prepare(S, dtype=jnp.float32,
                                       double_buffer=db)
            up = ps.pad_field(u0)
            bp = ps.pad_field(b2)

            @partial(jax.jit, static_argnums=(2, 3))
            def floop(u_, b_, k, db_):
                out = jax.lax.fori_loop(
                    0, k,
                    lambda _, uu: fused_gs4_sweep(ps, uu, b_, 1.0, True,
                                                  double_buffer=db_), u_)
                return jnp.sum(out)

            t_f = time_it(lambda: floop(up, bp, inner, db)) / inner
            row[f"fused_{'db' if db else 'sb'}_ms"] = round(t_f * 1e3, 4)
            row[f"fused_{'db' if db else 'sb'}_tr"] = ps.tr

        # color-packed sweep (sparse/packed.py): 4x fewer stencil evals
        from amg_tpu.sparse.packed import gs4_sweep_packed, pack

        m = (side - 1) // 2
        u4 = pack(u0, m)
        b4 = pack(b2, m)
        w33 = S.w33

        @partial(jax.jit, static_argnums=(2,))
        def ploop(u_, b_, k):
            out = jax.lax.fori_loop(
                0, k, lambda _, uu: gs4_sweep_packed(uu, b_, w33, m,
                                                     1.0, True), u_)
            return jnp.sum(out)

        t_p = time_it(lambda: ploop(u4, b4, inner)) / inner
        row["packed_ms"] = round(t_p * 1e3, 4)
        sol_s = bytes_per_sweep / (roof.hbm_gbps * 1e9)
        row["masked_sol_pct"] = round(100 * sol_s / t_masked, 1)
        results[side] = row
        log(f"side={side}: {row}")
    print(results)


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (1023, 2047, 4095))
