"""Diagnose the fused packed-sweep kernel's bandwidth gap at M >= 2048
(VERDICT r4 #1): separate DMA-streaming cost from color-step compute cost
with structurally identical probe kernels.

Probes (per M in {2048, 4096}, i.e. sides 4095/8191):
  * full      — the production fused_gs4_sweep_packed (db pipeline)
  * dma-only  — same 2-slot pipeline, same ghosted tile DMAs, NO color
                steps (one trivial VPU touch so the out-DMA reads a
                computed value and nothing elides)
  * compute-only — one ghosted tile DMA'd in, then the 8 color steps run
                REPEAT times on the VMEM-resident tile; slope gives the
                pure in-VMEM compute cost per symmetric sweep per tile
  * roll-free compute — same, with every pltpu.roll replaced by a direct
                (unshifted) read: numerically wrong, isolates roll cost

Usage: python scripts/kernel_probe.py [M ...]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from amg_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(str(__import__("pathlib").Path(__file__).resolve().parents[1] / ".jax_cache"))

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amg_tpu.ops.pallas.packed_rbgs import (G, _color_steps_packed, _dma_in,
                                            _dma_in_wait, pick_tile_rows)
from amg_tpu.ops.pallas.rbgs import _roll2
from amg_tpu.ops.rap import poisson_const_w33
from amg_tpu.sparse.packed import COLORS, _neighbors


def _dma_only_kernel_db(b_hbm, u_hbm, out_hbm, Bs, Us, in_sems, out_sems,
                        *, tg, n_tiles):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    Mp = u_hbm.shape[1]
    two = jnp.asarray(2, dtype=jnp.asarray(t).dtype)
    slot = jax.lax.rem(t, two)
    nxt = jax.lax.rem(t + 1, two)

    def start_in(tile, s):
        _dma_in(b_hbm, Bs.at[s], in_sems.at[s, np.int32(0)], tile,
                n_tiles, tg, Mp)
        _dma_in(u_hbm, Us.at[s], in_sems.at[s, np.int32(1)], tile,
                n_tiles, tg, Mp)

    def wait_in(tile, s):
        _dma_in_wait(b_hbm, Bs.at[s], in_sems.at[s, np.int32(0)], tile,
                     n_tiles, tg)
        _dma_in_wait(u_hbm, Us.at[s], in_sems.at[s, np.int32(1)], tile,
                     n_tiles, tg)

    def out_dma(tile, s):
        return pltpu.make_async_copy(
            Us.at[s, :, pl.ds(np.int32(G), tg), :],
            out_hbm.at[:, pl.ds(pl.multiple_of(tile * tg, G), tg), :],
            out_sems.at[s])

    @pl.when(t == 0)
    def _():
        start_in(t, slot)

    @pl.when((t >= 1) & (t + 1 < T))
    def _():
        out_dma(t - 1, nxt).wait()

    @pl.when(t + 1 < T)
    def _():
        start_in(t + 1, nxt)

    wait_in(t, slot)
    # one trivial VPU touch so the out DMA depends on computed data
    Uss = Us.at[slot]
    Bss = Bs.at[slot]
    Uss[np.int32(0)] = Uss[np.int32(0)] + Bss[np.int32(0)]
    out_dma(t, slot).start()

    @pl.when(t == T - 1)
    def _():
        out_dma(t, slot).wait()

    if n_tiles >= 2:
        @pl.when(t == T - 1)
        def _():
            out_dma(t - 1, nxt).wait()


def dma_only(u4, b4, m, tg):
    M = m + 1
    nt = M // tg
    W = tg + 2 * G
    dtype = u4.dtype
    kernel = partial(_dma_only_kernel_db, tg=tg, n_tiles=nt)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((4, M, M), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4, W, M), dtype),
            pltpu.VMEM((2, 4, W, M), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(b4, u4)


def _color_steps_norolls(Bs, Us, w33, m, omega, symmetric):
    """Structurally identical to _color_steps_packed but neighbor reads
    skip the roll (numerically WRONG — timing probe only)."""
    _, W, Wc = Us.shape
    inv_diag = 1.0 / w33[1][1]
    order = list(COLORS)
    if symmetric:
        order = order + order[::-1]
    for pj, pi in order:
        a = 2 * pj + pi
        acc = None
        for (wj, wi), src, (sJ, sI) in _neighbors(pj, pi):
            w = w33[wj][wi]
            if w == 0.0:
                continue
            t = w * Us[np.int32(src)]
            acc = t if acc is None else acc + t
        Ua = Us[np.int32(a)]
        delta = (Bs[np.int32(a)] - acc) * inv_diag - Ua
        Us[np.int32(a)] = Ua + omega * delta


def _compute_only_kernel(b_hbm, u_hbm, out_hbm, Bs, Us, sems, *, tg, m,
                         w33, repeat, rolls):
    Mp = u_hbm.shape[1]
    t = pl.program_id(0)
    # n_tiles == 1: _dma_in returns the live descriptor (never call
    # _dma_in_wait here — both its boundary branches would fire)
    d_b = _dma_in(b_hbm, Bs, sems.at[np.int32(0)], t, 1, tg, Mp)
    d_u = _dma_in(u_hbm, Us, sems.at[np.int32(1)], t, 1, tg, Mp)
    d_b.wait()
    d_u.wait()
    for _ in range(repeat):
        if rolls:
            _color_steps_packed(Bs, Us, w33, m, np.int32(0), 1.0, True)
        else:
            _color_steps_norolls(Bs, Us, w33, m, 1.0, True)
    cp = pltpu.make_async_copy(
        Us.at[:, pl.ds(np.int32(G), tg), :],
        out_hbm.at[:, pl.ds(np.int32(0), tg), :], sems.at[np.int32(2)])
    cp.start()
    cp.wait()


def compute_only(u4, b4, m, tg, w33, repeat, rolls=True):
    M = m + 1
    W = tg + 2 * G
    dtype = u4.dtype
    kernel = partial(_compute_only_kernel, tg=tg, m=m, w33=w33,
                     repeat=repeat, rolls=rolls)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((4, tg, M), dtype),
        scratch_shapes=[
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((4, W, M), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(b4, u4)


def timed(fn, inner_candidates=(8, 64)):
    """Two-point slope calibration (docs/PERF.md r4): per-call cost from
    the difference of two loop lengths — the tunnel RT cancels."""
    def run(k):
        @jax.jit
        def loop(u, b):
            def body(_, uu):
                return fn(uu, b)
            o = jax.lax.fori_loop(0, k, body, u)
            return jnp.sum(o)
        return loop

    return run


def main():
    Ms = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    for M in Ms:
        m = M - 1
        side = 2 * m + 1
        w33 = poisson_const_w33(side, 1)[0]
        key = jax.random.PRNGKey(0)
        u4 = jax.random.normal(key, (4, M, M), dtype=jnp.float32)
        b4 = jax.random.normal(jax.random.PRNGKey(1), (4, M, M),
                               dtype=jnp.float32)
        tg = pick_tile_rows(M, 4, pipeline="db")
        W = tg + 2 * G
        nt = M // tg
        field = 4 * M * M * 4
        ghosted_in = 2 * 4 * W * M * 4 * nt
        out_b = field
        print(f"\n== M={M} side={side} tg={tg} nt={nt} "
              f"field={field/2**20:.0f}MB in={ghosted_in/2**20:.0f}MB ==")

        from amg_tpu.ops.pallas.packed_rbgs import fused_gs4_sweep_packed

        # Rotate across enough DISTINCT (u, b) pairs that the working set
        # exceeds whatever is caching sub-67 MB arrays above HBM peak
        # (docs/PERF.md r4 artifact): one pair is 2*field bytes; target
        # >= 600 MB total.
        nbuf = max(1, int(np.ceil(600 * 2**20 / (2 * field))))
        us0 = tuple(jax.random.normal(jax.random.PRNGKey(10 + i),
                                      (4, M, M), dtype=jnp.float32)
                    for i in range(nbuf))
        bs0 = tuple(jax.random.normal(jax.random.PRNGKey(50 + i),
                                      (4, M, M), dtype=jnp.float32)
                    for i in range(nbuf))
        print(f"  (cache-defeating rotation: {nbuf} buffer pairs, "
              f"{nbuf*2*field/2**20:.0f} MB working set)")

        def bench_pair(name, fn, traffic):
            k1, k2 = 2, 8

            @partial(jax.jit, static_argnums=(2,))
            def run(us_, bs_, kk):
                def body(_, uu):
                    return tuple(fn(u_, b_)
                                 for u_, b_ in zip(uu, bs_))
                o = jax.lax.fori_loop(0, kk, body, us_)
                return sum(jnp.sum(x) for x in o)

            float(run(us0, bs0, k1)); float(run(us0, bs0, k2))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); float(run(us0, bs0, k1))
                ta = time.perf_counter() - t0
                t0 = time.perf_counter(); float(run(us0, bs0, k2))
                tb = time.perf_counter() - t0
                best = min(best, (tb - ta) / (k2 - k1) / nbuf)
            print(f"  {name:<28s} {best*1e3:8.4f} ms  "
                  f"{traffic/best/1e9:7.1f} GB/s-effective")
            return best

        t_full = bench_pair(
            "full fused sweep (db)",
            lambda u, b: fused_gs4_sweep_packed(u, b, w33, m, 1.0, True,
                                                pipeline="db", tg=tg),
            ghosted_in + out_b)
        t_dma = bench_pair("dma-only (db)",
                           lambda u, b: dma_only(u, b, m, tg),
                           ghosted_in + out_b)
        # compute-only per-tile cost: amortize the tunnel RT with an
        # OUTER fori_loop slope (k=4 vs 16 calls), then difference the
        # in-kernel repeat counts (16 vs 0) to cancel the per-call DMA.
        def per_call(rep, rolls):
            @partial(jax.jit, static_argnums=(2, 3, 4))
            def run(u, b, kk, rep_, rolls_):
                def body(_, uu):
                    o = compute_only(uu, b, m, tg, w33, rep_, rolls_)
                    return uu.at[:, :tg, :].set(o)
                o = jax.lax.fori_loop(0, kk, body, u)
                return jnp.sum(o)

            k1, k2 = 4, 16
            float(run(u4, b4, k1, rep, rolls))
            float(run(u4, b4, k2, rep, rolls))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(u4, b4, k1, rep, rolls))
                ta = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(run(u4, b4, k2, rep, rolls))
                tb = time.perf_counter() - t0
                best = min(best, (tb - ta) / (k2 - k1))
            return best

        for rolls in (True, False):
            t0c = per_call(0, rolls)
            t16 = per_call(16, rolls)
            per_sweep = (t16 - t0c) / 16
            name = "compute/tile " + ("(rolls)" if rolls else "(no rolls)")
            print(f"  {name:<28s} {per_sweep*1e6:8.2f} us/tile-sweep -> "
                  f"x{nt} tiles = {per_sweep*nt*1e3:8.4f} ms/sweep")


if __name__ == "__main__":
    main()
