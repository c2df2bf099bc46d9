"""Fused V-cycle leg kernels on the color-packed layout.

PROFILE_r04.md headroom items 1-2: with the sweep already fused
(packed_rbgs.py), the remaining fine-level HBM passes are the residual
(0.59 ms @4095), restriction (0.16) and prolong-add (0.88) — each a
separate XLA pass over the fields. These kernels fuse each V-cycle LEG
into one VMEM-resident pass:

  * **down leg** (`fused_down_leg_packed`): pre-smooth (8 color steps) +
    residual + full-weighting restriction. Reads u, b once; writes the
    smoothed u and the PADDED (M, M) coarse rhs (caller slices [:m, :m]).
    Ghost margin G2 = 16: 8 rows consumed by the color steps, 1 by the
    residual, 1 by restriction, rest slack (and 16 keeps DMA offsets
    sublane-aligned).
  * **up leg** (`fused_up_leg_packed`): bilinear prolongation-correction
    + post-smooth. Reads u, b and the PADDED (M, M) coarse solution
    (zeros in the pad row/col — pad with jnp.pad(uc, ((0,1),(0,1)))),
    writes the corrected+smoothed u. The correction is a local function
    of uc, so it is exact on the whole ghosted tile; the color steps then
    consume the usual G = 8 margin.

Same contracts as the unfused path (sparse/packed.py): identical iterates
to prolong_add_packed/gs4_sweep_packed/residual_packed/restrict_packed up
to fp reassociation, pad cells stay exactly zero. Same Mosaic x64 rules
as packed_rbgs.py (int32 everywhere; jaxpr guard in
tests/test_packed_cycle.py, hardware gate in bench.py).

Reference anchors: V-cycle legs multigrid.hpp:263-305, smoother
smoother.hpp:86-216, transfer interpolator.hpp:52-68.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amg_tpu.ops.pallas.packed_rbgs import (G, LANE, _color_steps_packed,
                                            _dma_in, _dma_in_wait)
from amg_tpu.ops.pallas.rbgs import _roll2
from amg_tpu.sparse.packed import COLORS, _neighbors

G2 = 16   # down-leg ghost: 8 color steps + residual + restrict + slack
VMEM_EFF = int(11.5 * 1024 * 1024)


def pick_tile_rows_down(M: int, itemsize: int = 4) -> int | None:
    # Us + Bs scratch (8 blocks of (W, M)) + residual values + bc stage
    # + step temporaries. 15 calibrated r5: tg=64 at M=2048 compiles and
    # runs 27% faster than tg=32 (0.656 vs 0.891 ms); tg=128 fails.
    blocks = 15
    field = 4 * M * M * itemsize
    reserve = 3 * field if field <= 6 * 1024 * 1024 else 0
    budget = min(VMEM_EFF, int(15.5 * 1024 * 1024) - reserve)
    # tg < 2*G2 is never worth it: >= 3x ghost read overhead — the split
    # path (fused sweep + G=8 residual/restrict kernel) moves strictly
    # less there, so report ineligible instead
    for tg in (256, 128, 64, 32):
        if M % tg:
            continue
        if blocks * (tg + 2 * G2) * M * itemsize <= budget:
            return tg
    return None


def pick_tile_rows_up(M: int, itemsize: int = 4) -> int | None:
    # 16 calibrated r5: tg=64 at M=2048 compiles (11.5 MB exactly) and
    # runs 38% faster than tg=32 (0.446 vs 0.716 ms)
    blocks = 16  # Us + Bs + Uc slab + temporaries
    field = 4 * M * M * itemsize
    reserve = 3 * field if field <= 6 * 1024 * 1024 else 0
    budget = min(VMEM_EFF, int(15.5 * 1024 * 1024) - reserve)
    for tg in (256, 128, 64, 32, 16, 8):
        if M % tg:
            continue
        if blocks * (tg + 2 * G + 8) * M * itemsize <= budget:
            return tg
    return None


def eligible(m: int) -> bool:
    M = m + 1
    return (M % LANE == 0 and M >= 2 * G2
            and pick_tile_rows_down(M) is not None
            and pick_tile_rows_up(M) is not None)


# ---------------------------------------------------------------------------
# down leg: sweep + residual + restrict


def _residual_quarters(Bs, Us, w33, m: int, row0):
    """r_a = mask * (b - A u) per quarter on the scratch tile (values)."""
    _, W, M = Us.shape
    i32 = jnp.int32
    w_c = w33[1][1]
    J_g = (jax.lax.broadcasted_iota(i32, (W, M), 0)
           + jnp.asarray(row0, dtype=i32))
    I_l = jax.lax.broadcasted_iota(i32, (W, M), 1)
    zero = jnp.zeros((), dtype=Us.dtype)
    rs = []
    for pj, pi in COLORS:
        a = 2 * pj + pi
        Mj = M if pj == 0 else m
        Mi = M if pi == 0 else m
        acc = w_c * Us[np.int32(a)]
        for (wj, wi), src, (sJ, sI) in _neighbors(pj, pi):
            w = w33[wj][wi]
            if w == 0.0:
                continue
            acc = acc + w * _roll2(Us[np.int32(src)], sJ, sI)
        mask = (J_g >= i32(0)) & (J_g < i32(Mj)) & (I_l < i32(Mi))
        rs.append(jnp.where(mask, Bs[np.int32(a)] - acc, zero))
    return rs


def _down_kernel(b_hbm, u_hbm, uo_hbm, bc_hbm, Bs, Us, Bc, sems, *,
                 tg: int, m: int, w33, omega: float, symmetric: bool,
                 n_tiles: int):
    t = pl.program_id(0)
    Mp = u_hbm.shape[1]
    M = Mp
    i32 = jnp.int32

    if n_tiles == 1:
        d_b = _dma_in(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg, Mp,
                      g=G2)
        d_u = _dma_in(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg, Mp,
                      g=G2)
        d_b.wait()
        d_u.wait()
    else:
        _dma_in(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg, Mp, g=G2)
        _dma_in(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg, Mp, g=G2)
        _dma_in_wait(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg,
                     g=G2)
        _dma_in_wait(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg,
                     g=G2)

    row0 = t * tg - np.int32(G2)
    _color_steps_packed(Bs, Us, w33, m, row0, omega, symmetric)

    # residual on the final iterate (valid margin >= 2 rows around the
    # interior with G2 = 16), then full-weighting restriction straight to
    # the padded dense coarse tile (restrict_packed structure:
    # coarse (J, I) <- r11[J,I] + 0.5*(r01[J]+r01[J+1]+r10[I]+r10[I+1])
    # + 0.25*(r00 corners))
    r00, r01, r10, r11 = _residual_quarters(Bs, Us, w33, m, row0)

    def rows(x, off):
        return jax.lax.slice(x, (G2 + off, 0), (G2 + off + tg, M))

    def colp1(x):
        # out[:, I] = x[:, I+1]; wrap at I = M-1 lands on masked cols
        return _roll2(x, 0, 1)

    c = rows(r11, 0)
    c = c + 0.5 * (rows(r01, 0) + rows(r01, 1)
                   + rows(r10, 0) + rows(colp1(r10), 0))
    c = c + 0.25 * (rows(r00, 0) + rows(colp1(r00), 0)
                    + rows(r00, 1) + rows(colp1(r00), 1))
    # zero outside the real (m, m) coarse grid (incl. the wrap column)
    Jc = (jax.lax.broadcasted_iota(i32, (tg, M), 0)
          + jnp.asarray(t * tg, dtype=i32))
    Ic = jax.lax.broadcasted_iota(i32, (tg, M), 1)
    Bc[:] = jnp.where((Jc < i32(m)) & (Ic < i32(m)), c,
                      jnp.zeros((), dtype=c.dtype))

    cp_u = pltpu.make_async_copy(
        Us.at[:, pl.ds(np.int32(G2), tg), :],
        uo_hbm.at[:, pl.ds(pl.multiple_of(t * tg, 8), tg), :],
        sems.at[np.int32(2)])
    cp_c = pltpu.make_async_copy(
        Bc, bc_hbm.at[pl.ds(pl.multiple_of(t * tg, 8), tg), :],
        sems.at[np.int32(3)])
    cp_u.start()
    cp_c.start()
    cp_u.wait()
    cp_c.wait()


def fused_down_leg_packed(u4, b4, w33, m: int, omega: float = 1.0,
                          symmetric: bool = True, tg: int | None = None,
                          interpret: bool = False):
    """Pre-smooth + residual + restrict in ONE pass over the fields.

    Returns ``(u4_smoothed, bc_pad)`` where ``bc_pad`` is the (M, M)
    zero-padded coarse rhs — slice ``bc_pad[:m, :m]`` (or feed a packed
    coarse level directly). Equals gs4_sweep_packed + residual_packed +
    restrict_packed up to fp reassociation.
    """
    M = m + 1
    if u4.shape != (4, M, M):
        raise ValueError(f"expected (4, {M}, {M}) packed field, "
                         f"got {u4.shape}")
    if tg is None:
        tg = pick_tile_rows_down(M, u4.dtype.itemsize)
    if tg is None or M % LANE or M % tg:
        raise ValueError(f"side {2*m+1} not eligible for the fused "
                         "down leg")
    nt = M // tg
    W = tg + 2 * G2
    dtype = u4.dtype
    kernel = partial(_down_kernel, tg=tg, m=m, w33=w33, omega=omega,
                     symmetric=symmetric, n_tiles=nt)
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=space)] * 2,
        out_specs=[pl.BlockSpec(memory_space=space)] * 2,
        out_shape=[jax.ShapeDtypeStruct((4, M, M), dtype),
                   jax.ShapeDtypeStruct((M, M), dtype)],
        scratch_shapes=[
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((tg, M), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(b4, u4)


# ---------------------------------------------------------------------------
# residual + restrict (no fused sweep): the M >= 4096 down-leg fallback.
#
# At side 8191 the full down leg is VMEM-ineligible (G2 = 16 ghost rows x
# 21 live blocks exceed the ~11.5 MB envelope at every tile size), and the
# XLA packed ops COLLAPSE at that size (measured r5: residual_packed
# 176 GB/s, restrict+prolong 115, sweep 92 — vs ~550 achievable). With no
# color steps the ghost need is only 1 row (residual) + 1 (restriction),
# so G = 8 (the sublane-alignment minimum) suffices and the residual
# accumulates quarter-by-quarter straight into the coarse tile, keeping
# the live set small enough for tg = 32 row tiles.


def pick_tile_rows_rr(M: int, itemsize: int = 4) -> int | None:
    # Us + Bs scratch (8 blocks of (W, M)) + ~4 live temporaries + Bc
    blocks = 13
    field = 4 * M * M * itemsize
    reserve = 3 * field if field <= 6 * 1024 * 1024 else 0
    budget = min(VMEM_EFF, int(15.5 * 1024 * 1024) - reserve)
    for tg in (256, 128, 64, 32, 16, 8):
        if M % tg:
            continue
        if blocks * (tg + 2 * G) * M * itemsize <= budget:
            return tg
    return None


def _rr_kernel(b_hbm, u_hbm, bc_hbm, Bs, Us, Bc, sems, *, tg: int, m: int,
               w33, n_tiles: int):
    t = pl.program_id(0)
    Mp = u_hbm.shape[1]
    M = Mp
    i32 = jnp.int32

    if n_tiles == 1:
        d_b = _dma_in(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg, Mp)
        d_u = _dma_in(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg, Mp)
        d_b.wait()
        d_u.wait()
    else:
        _dma_in(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg, Mp)
        _dma_in(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg, Mp)
        _dma_in_wait(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg)
        _dma_in_wait(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg)

    row0 = t * tg - np.int32(G)
    r00, r01, r10, r11 = _residual_quarters(Bs, Us, w33, m, row0)

    def rows(x, off):
        return jax.lax.slice(x, (G + off, 0), (G + off + tg, M))

    def colp1(x):
        return _roll2(x, 0, 1)

    c = rows(r11, 0)
    c = c + 0.5 * (rows(r01, 0) + rows(r01, 1)
                   + rows(r10, 0) + rows(colp1(r10), 0))
    c = c + 0.25 * (rows(r00, 0) + rows(colp1(r00), 0)
                    + rows(r00, 1) + rows(colp1(r00), 1))
    Jc = (jax.lax.broadcasted_iota(i32, (tg, M), 0)
          + jnp.asarray(t * tg, dtype=i32))
    Ic = jax.lax.broadcasted_iota(i32, (tg, M), 1)
    Bc[:] = jnp.where((Jc < i32(m)) & (Ic < i32(m)), c,
                      jnp.zeros((), dtype=c.dtype))

    cp_c = pltpu.make_async_copy(
        Bc, bc_hbm.at[pl.ds(pl.multiple_of(t * tg, 8), tg), :],
        sems.at[np.int32(2)])
    cp_c.start()
    cp_c.wait()


def fused_residual_restrict_packed(u4, b4, w33, m: int,
                                   tg: int | None = None,
                                   interpret: bool = False):
    """Residual + full-weighting restriction in ONE pass over u, b.

    Returns the PADDED (M, M) coarse rhs (caller slices [:m, :m]) —
    equal to ``restrict_packed(residual_packed(u4, b4, w33, m), m)`` up
    to fp reassociation. Ghost need is 2 rows, so G = 8 leaves tg = 32
    tiles VMEM-feasible at M = 4096 where the full down leg is not.
    """
    M = m + 1
    if u4.shape != (4, M, M):
        raise ValueError(f"expected (4, {M}, {M}) packed field, "
                         f"got {u4.shape}")
    if tg is None:
        tg = pick_tile_rows_rr(M, u4.dtype.itemsize)
    if tg is None or M % LANE or M % tg:
        raise ValueError(f"side {2*m+1} not eligible for fused "
                         "residual+restrict")
    nt = M // tg
    W = tg + 2 * G
    dtype = u4.dtype
    kernel = partial(_rr_kernel, tg=tg, m=m, w33=w33, n_tiles=nt)
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=space)] * 2,
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((M, M), dtype),
        scratch_shapes=[
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((tg, M), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(b4, u4)


def eligible_split(m: int) -> bool:
    """Split down-path (separate sweep + fused residual/restrict) + up
    leg — the M >= 4096 configuration."""
    M = m + 1
    return (M % LANE == 0 and M >= 2 * G
            and pick_tile_rows_rr(M) is not None
            and pick_tile_rows_up(M) is not None)


# ---------------------------------------------------------------------------
# up leg: prolong-add + sweep


def _uc_dma(uc_hbm, slab, sem, t, n_tiles: int, tg: int, M: int):
    """Load coarse rows [t*tg - G - 8, t*tg + tg + G) of the padded
    (M, M) coarse field into the (tg + 2G + 8, M) slab; out-of-range rows
    zero. Started and waited in place (the slab is consumed immediately
    by the correction)."""
    W8 = tg + 2 * G + 8
    first = t == 0
    last = t == n_tiles - 1
    row0 = t * tg

    if n_tiles == 1:
        slab[:G + 8, :] = jnp.zeros_like(slab[:G + 8, :])
        slab[W8 - G:, :] = jnp.zeros_like(slab[W8 - G:, :])
        dma = pltpu.make_async_copy(
            uc_hbm.at[pl.ds(np.int32(0), tg), :],
            slab.at[pl.ds(np.int32(G + 8), tg), :], sem)
        dma.start()
        dma.wait()
        return

    @pl.when(first)
    def _():
        slab[:G + 8, :] = jnp.zeros_like(slab[:G + 8, :])

    @pl.when(last)
    def _():
        slab[W8 - G:, :] = jnp.zeros_like(slab[W8 - G:, :])

    @pl.when(first)
    def _():
        dma = pltpu.make_async_copy(
            uc_hbm.at[pl.ds(np.int32(0), tg + G), :],
            slab.at[pl.ds(np.int32(G + 8), tg + G), :], sem)
        dma.start()
        dma.wait()

    @pl.when(last)
    def _():
        dma = pltpu.make_async_copy(
            uc_hbm.at[pl.ds(pl.multiple_of(row0 - G - 8, 8), tg + G + 8),
                      :],
            slab.at[pl.ds(np.int32(0), tg + G + 8), :], sem)
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_not(first | last))
    def _():
        dma = pltpu.make_async_copy(
            uc_hbm.at[pl.ds(pl.multiple_of(row0 - G - 8, 8), W8), :],
            slab.at[pl.ds(np.int32(0), W8), :], sem)
        dma.start()
        dma.wait()


def _up_kernel(b_hbm, u_hbm, uc_hbm, out_hbm, Bs, Us, Uc, sems, *,
               tg: int, m: int, w33, omega: float, symmetric: bool,
               n_tiles: int):
    t = pl.program_id(0)
    Mp = u_hbm.shape[1]
    M = Mp
    W = tg + 2 * G
    i32 = jnp.int32

    if n_tiles == 1:
        d_b = _dma_in(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg, Mp)
        d_u = _dma_in(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg, Mp)
        _uc_dma(uc_hbm, Uc, sems.at[np.int32(2)], t, n_tiles, tg, M)
        d_b.wait()
        d_u.wait()
    else:
        _dma_in(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg, Mp)
        _dma_in(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg, Mp)
        _uc_dma(uc_hbm, Uc, sems.at[np.int32(2)], t, n_tiles, tg, M)
        _dma_in_wait(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg)
        _dma_in_wait(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg)

    # bilinear prolongation-correction on the whole ghosted tile (exact
    # everywhere — a local function of uc), then the color steps.
    # Slab row 8 + l corresponds to packed row row0 - G + l; the pad
    # column M-1 of the padded coarse field is zero, so lane wraps in the
    # column shifts read zeros (sparse/packed.prolong_add_packed math).
    row0 = t * tg - np.int32(G)
    U0 = jax.lax.slice(Uc[:], (8, 0), (8 + W, M))
    Um = jax.lax.slice(Uc[:], (7, 0), (7 + W, M))
    UL0 = _roll2(U0, 0, -1)
    ULm = _roll2(Um, 0, -1)
    c00 = 0.25 * (ULm + Um + UL0 + U0)
    c01 = 0.5 * (Um + U0)
    c10 = 0.5 * (UL0 + U0)
    c11 = U0
    J_g = (jax.lax.broadcasted_iota(i32, (W, M), 0)
           + jnp.asarray(row0, dtype=i32))
    I_l = jax.lax.broadcasted_iota(i32, (W, M), 1)
    zero = jnp.zeros((), dtype=Us.dtype)
    for a, corr, (pj, pi) in ((0, c00, (0, 0)), (1, c01, (0, 1)),
                              (2, c10, (1, 0)), (3, c11, (1, 1))):
        Mj = M if pj == 0 else m
        Mi = M if pi == 0 else m
        mask = (J_g >= i32(0)) & (J_g < i32(Mj)) & (I_l < i32(Mi))
        Us[np.int32(a)] = (Us[np.int32(a)]
                           + jnp.where(mask, corr, zero))

    _color_steps_packed(Bs, Us, w33, m, row0, omega, symmetric)

    cp_out = pltpu.make_async_copy(
        Us.at[:, pl.ds(np.int32(G), tg), :],
        out_hbm.at[:, pl.ds(pl.multiple_of(t * tg, 8), tg), :],
        sems.at[np.int32(3)])
    cp_out.start()
    cp_out.wait()


def fused_up_leg_packed(u4, b4, uc_pad, w33, m: int, omega: float = 1.0,
                        symmetric: bool = True, tg: int | None = None,
                        interpret: bool = False):
    """Prolongation-correction + post-smooth in ONE pass over the fields.

    ``uc_pad``: the (M, M) zero-padded coarse solution —
    ``jnp.pad(uc, ((0, 1), (0, 1)))`` of the (m, m) field (or the down
    leg's bc_pad layout). Equals prolong_add_packed + gs4_sweep_packed up
    to fp reassociation.
    """
    M = m + 1
    if u4.shape != (4, M, M) or uc_pad.shape != (M, M):
        raise ValueError(f"expected (4, {M}, {M}) packed + ({M}, {M}) "
                         f"padded coarse, got {u4.shape}, {uc_pad.shape}")
    if tg is None:
        tg = pick_tile_rows_up(M, u4.dtype.itemsize)
    if tg is None or M % LANE or M % tg:
        raise ValueError(f"side {2*m+1} not eligible for the fused up leg")
    nt = M // tg
    W = tg + 2 * G
    dtype = u4.dtype
    kernel = partial(_up_kernel, tg=tg, m=m, w33=w33, omega=omega,
                     symmetric=symmetric, n_tiles=nt)
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=space)] * 3,
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((4, M, M), dtype),
        scratch_shapes=[
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((W + 8, M), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(b4, u4, uc_pad)
