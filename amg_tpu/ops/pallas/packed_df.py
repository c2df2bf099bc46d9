"""Fused double-float32 defect-correction residual + rss kernel.

The df32 residual (sparse/packed.df_residual_const_packed) reads u.hi/lo
and b.hi/lo and writes r.hi/lo, then df_rss_fast re-reads r — ~8 HBM
field passes and 2.0 ms per refine at 4095^2. In the solve loop r.lo is
consumed ONLY by the rss (the V-cycles smooth r.hi), so this kernel:

  * computes the pow2-exact TwoSum-cascade residual per tile in VMEM
    (same math as sparse/packed._df_residual_pow2_packed — weights are
    +/-2^j on 2^k-1 grids, so w * x is exact);
  * writes r.hi only;
  * folds lo into per-tile rss partial rows: rss = sum(hi^2 + 2 hi lo)
    (the lo^2 term is below 2^-48 relative — same accuracy class as
    ops/doublefloat.df_rss_fast);

for 4 reads + 1 field write + one tiny partial row per tile — ~5.5
passes. Single-step stencil: ghost rows are read-only (G = 8, the DMA
alignment minimum), no temporal blocking. Mosaic x64 rules as in
packed_rbgs.py; jaxpr guard in tests/test_packed_df.py, hardware gate in
bench.py (`packed_dfres`).

Reference anchor: the defect-correction residual replaces the f64 Eigen
residual of multigrid.hpp:272-274 at f32 VPU speed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amg_tpu.ops.doublefloat import is_pow2_weights
from amg_tpu.ops.pallas.packed_rbgs import (G, LANE, VMEM_EFF, _dma_in,
                                            _dma_in_wait)
from amg_tpu.ops.pallas.rbgs import _roll2
from amg_tpu.sparse.packed import COLORS, _neighbors


def pick_tile_rows_df(M: int, itemsize: int = 4,
                      pipeline: str = "sb") -> int | None:
    # sb: u.hi/lo ghosted slabs (8 blocks of (W, M)) + b.hi/lo unghosted
    # (8 of (tg, M)) + ~6 temporaries. db: 2 slots of (u slabs + b + Rh)
    # + temporaries.
    field = 4 * M * M * itemsize
    reserve = 3 * field if field <= 6 * 1024 * 1024 else 0
    budget = min(VMEM_EFF, int(15.5 * 1024 * 1024) - reserve)
    for tg in (256, 128, 64, 32, 16, 8):
        if M % tg:
            continue
        W = tg + 2 * G
        rows = ((16 * W + 30 * tg) if pipeline == "db"
                else (14 * W + 12 * tg))
        if rows * M * itemsize <= budget:
            return tg
    return None


def eligible(m: int, w33) -> bool:
    M = m + 1
    return (M % LANE == 0 and M >= 2 * G and is_pow2_weights(w33)
            and pick_tile_rows_df(M) is not None)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _df_kernel(bh_hbm, bl_hbm, uh_hbm, ul_hbm, rh_hbm, part_hbm,
               Uh, Ul, Bh, Bl, Rh, Part, sems, *, tg: int, m: int, w33,
               n_tiles: int):
    t = pl.program_id(0)
    Mp = uh_hbm.shape[1]
    M = Mp
    W = tg + 2 * G
    i32 = jnp.int32

    # ghosted u slabs; b needs no ghosts (the residual reads b at the
    # update point only)
    if n_tiles == 1:
        d_uh = _dma_in(uh_hbm, Uh, sems.at[np.int32(0)], t, 1, tg, Mp)
        d_ul = _dma_in(ul_hbm, Ul, sems.at[np.int32(1)], t, 1, tg, Mp)
    else:
        _dma_in(uh_hbm, Uh, sems.at[np.int32(0)], t, n_tiles, tg, Mp)
        _dma_in(ul_hbm, Ul, sems.at[np.int32(1)], t, n_tiles, tg, Mp)
    row0 = t * tg
    d_bh = pltpu.make_async_copy(
        bh_hbm.at[:, pl.ds(pl.multiple_of(row0, 8), tg), :], Bh,
        sems.at[np.int32(2)])
    d_bl = pltpu.make_async_copy(
        bl_hbm.at[:, pl.ds(pl.multiple_of(row0, 8), tg), :], Bl,
        sems.at[np.int32(3)])
    d_bh.start()
    d_bl.start()
    if n_tiles == 1:
        d_uh.wait()
        d_ul.wait()
    else:
        _dma_in_wait(uh_hbm, Uh, sems.at[np.int32(0)], t, n_tiles, tg)
        _dma_in_wait(ul_hbm, Ul, sems.at[np.int32(1)], t, n_tiles, tg)
    d_bh.wait()
    d_bl.wait()

    _df_compute(Uh, Ul, Bh, Bl, Rh, Part, tg=tg, m=m, w33=w33,
                row0=row0, M=M)

    cp_r = pltpu.make_async_copy(
        Rh, rh_hbm.at[:, pl.ds(pl.multiple_of(row0, 8), tg), :],
        sems.at[np.int32(0)])
    cp_p = pltpu.make_async_copy(
        Part, part_hbm.at[t], sems.at[np.int32(1)])
    cp_r.start()
    cp_p.start()
    cp_r.wait()
    cp_p.wait()


def _df_compute(Uh, Ul, Bh, Bl, Rh, Part, *, tg: int, m: int, w33, row0,
                M: int):
    """The TwoSum-cascade residual + rss partial on one slot's refs."""
    i32 = jnp.int32
    J_g = (jax.lax.broadcasted_iota(i32, (tg, M), 0)
           + jnp.asarray(row0, dtype=i32))
    I_l = jax.lax.broadcasted_iota(i32, (tg, M), 1)
    zero = jnp.zeros((), dtype=Uh.dtype)
    psum = None
    for pj, pi in COLORS:
        a = 2 * pj + pi
        Mj = M if pj == 0 else m
        Mi = M if pi == 0 else m
        # interior view of shifted u reads: local row l of the output
        # corresponds to slab row G + l
        s = Bh[np.int32(a)]
        c = Bl[np.int32(a)]
        terms = [((1, 1), a, (0, 0))] + _neighbors(pj, pi)
        for (wj, wi), src, (sJ, sI) in terms:
            w = w33[wj][wi]
            if w == 0.0:
                continue
            wf = jnp.float32(-w)
            xh = jax.lax.slice(_roll2(Uh[np.int32(src)], sJ, sI),
                               (G, 0), (G + tg, M))
            xl = jax.lax.slice(_roll2(Ul[np.int32(src)], sJ, sI),
                               (G, 0), (G + tg, M))
            tt = wf * xh          # exact: w is +/-2^j
            s, e = _two_sum(s, tt)
            c = c + e + wf * xl
        hi, lo = _two_sum(s, c)
        mask = (J_g < i32(Mj)) & (I_l < i32(Mi))
        hi = jnp.where(mask, hi, zero)
        lo = jnp.where(mask, lo, zero)
        # staged in a SEPARATE scratch: later quarters still read the
        # pristine u slabs for their neighbor terms
        Rh[np.int32(a)] = hi
        contrib = hi * hi + 2.0 * (hi * lo)
        psum = contrib if psum is None else psum + contrib
    # one scalar per tile, broadcast to a (8, 128) block (the partials
    # array keeps the tile index as an untiled leading dim so the DMA
    # needs no sublane-aligned dynamic offset); caller reads [:, 0, 0]
    Part[:] = jnp.full((8, LANE), jnp.sum(psum), dtype=psum.dtype)


def _df_kernel_db(bh_hbm, bl_hbm, uh_hbm, ul_hbm, rh_hbm, part_hbm,
                  Uh, Ul, Bh, Bl, Rh, Part, in_sems, out_sems, *,
                  tg: int, m: int, w33, n_tiles: int):
    """2-slot pipeline: tile t+1's four input streams prefetch while
    tile t computes; tile t's r.hi + partial stream out from its slot
    (drained before that slot's next prefetch, sweep-kernel pattern)."""
    t = pl.program_id(0)
    T = pl.num_programs(0)
    Mp = uh_hbm.shape[1]
    M = Mp
    two = jnp.asarray(2, dtype=jnp.asarray(t).dtype)
    slot = jax.lax.rem(t, two)
    nxt = jax.lax.rem(t + 1, two)

    def b_dma(hbm, scr, sem, tile):
        return pltpu.make_async_copy(
            hbm.at[:, pl.ds(pl.multiple_of(tile * tg, 8), tg), :], scr,
            sem)

    def start_in(tile, s):
        _dma_in(uh_hbm, Uh.at[s], in_sems.at[s, np.int32(0)], tile,
                n_tiles, tg, Mp)
        _dma_in(ul_hbm, Ul.at[s], in_sems.at[s, np.int32(1)], tile,
                n_tiles, tg, Mp)
        b_dma(bh_hbm, Bh.at[s], in_sems.at[s, np.int32(2)], tile).start()
        b_dma(bl_hbm, Bl.at[s], in_sems.at[s, np.int32(3)], tile).start()

    def wait_in(tile, s):
        _dma_in_wait(uh_hbm, Uh.at[s], in_sems.at[s, np.int32(0)], tile,
                     n_tiles, tg)
        _dma_in_wait(ul_hbm, Ul.at[s], in_sems.at[s, np.int32(1)], tile,
                     n_tiles, tg)
        b_dma(bh_hbm, Bh.at[s], in_sems.at[s, np.int32(2)], tile).wait()
        b_dma(bl_hbm, Bl.at[s], in_sems.at[s, np.int32(3)], tile).wait()

    def out_r(tile, s):
        return pltpu.make_async_copy(
            Rh.at[s],
            rh_hbm.at[:, pl.ds(pl.multiple_of(tile * tg, 8), tg), :],
            out_sems.at[s, np.int32(0)])

    def out_p(tile, s):
        return pltpu.make_async_copy(Part.at[s], part_hbm.at[tile],
                                     out_sems.at[s, np.int32(1)])

    @pl.when(t == 0)
    def _():
        start_in(t, slot)

    @pl.when((t >= 1) & (t + 1 < T))
    def _():
        out_r(t - 1, nxt).wait()
        out_p(t - 1, nxt).wait()

    @pl.when(t + 1 < T)
    def _():
        start_in(t + 1, nxt)

    wait_in(t, slot)

    _df_compute(Uh.at[slot], Ul.at[slot], Bh.at[slot], Bl.at[slot],
                Rh.at[slot], Part.at[slot], tg=tg, m=m, w33=w33,
                row0=t * tg, M=M)

    out_r(t, slot).start()
    out_p(t, slot).start()

    @pl.when(t == T - 1)
    def _():
        out_r(t, slot).wait()
        out_p(t, slot).wait()

    if True:
        @pl.when(t == T - 1)
        def _():
            out_r(t - 1, nxt).wait()
            out_p(t - 1, nxt).wait()


def auto_pipeline_df(M: int) -> str:
    """db overlaps the 4 input streams with the TwoSum-cascade compute
    (measured r5, cache-defeating rotation at M=2048: db tg=16 0.760 ms
    vs sb tg=32 1.111 — bitwise-identical) but its 2x scratch squeezes
    tiles; worth it only while tg >= 16 (below that the ghost-read
    overhead of the u slabs exceeds the overlap gain — at M = 4096 db
    fits only tg = 8, 9 HBM passes vs sb tg=16's 7)."""
    tg_db = pick_tile_rows_df(M, pipeline="db")
    return "db" if (tg_db is not None and tg_db >= 16) else "sb"


def fused_df_residual_rss(w33, b4_df, u4_df, m: int, tg: int | None = None,
                          pipeline: str | None = None,
                          interpret: bool = False):
    """r.hi and per-tile rss partial rows in one pass.

    Returns ``(r4_hi, partials)``: ``jnp.sum(partials)`` equals
    df_rss_fast of the full df32 residual (up to f32 reduction order).
    Requires pow2 weights (``eligible``).
    """
    M = m + 1
    if u4_df.hi.shape != (4, M, M):
        raise ValueError(f"expected (4, {M}, {M}) packed fields, "
                         f"got {u4_df.hi.shape}")
    if pipeline is None:
        pipeline = auto_pipeline_df(M)
    if tg is None:
        tg = pick_tile_rows_df(M, u4_df.hi.dtype.itemsize, pipeline)
    if tg is None or M % LANE or M % tg or not is_pow2_weights(w33):
        raise ValueError(f"side {2*m+1} not eligible for the fused df "
                         "residual")
    nt = M // tg
    W = tg + 2 * G
    dtype = u4_df.hi.dtype
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    if pipeline == "db" and nt >= 2:
        kernel = partial(_df_kernel_db, tg=tg, m=m, w33=w33, n_tiles=nt)
        scratch = [
            pltpu.VMEM((2, 4, W, M), dtype),
            pltpu.VMEM((2, 4, W, M), dtype),
            pltpu.VMEM((2, 4, tg, M), dtype),
            pltpu.VMEM((2, 4, tg, M), dtype),
            pltpu.VMEM((2, 4, tg, M), dtype),
            pltpu.VMEM((2, 8, LANE), dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    else:
        kernel = partial(_df_kernel, tg=tg, m=m, w33=w33, n_tiles=nt)
        scratch = [
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((4, tg, M), dtype),
            pltpu.VMEM((4, tg, M), dtype),
            pltpu.VMEM((4, tg, M), dtype),
            pltpu.VMEM((8, LANE), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=space)] * 4,
        out_specs=[pl.BlockSpec(memory_space=space)] * 2,
        out_shape=[jax.ShapeDtypeStruct((4, M, M), dtype),
                   jax.ShapeDtypeStruct((nt, 8, LANE), dtype)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(b4_df.hi, b4_df.lo, u4_df.hi, u4_df.lo)
