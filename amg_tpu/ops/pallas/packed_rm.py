"""Row-grouped (contiguous-DMA) variants of the packed kernels for
M >= 4096.

At side 8191 (M = 4096) the (4, M, M) packed layout's ghosted tile DMA
is 4 chunks with a 64 MB stride and sustains only ~464 GB/s, while the
same pipeline reading ONE contiguous chunk from a row-grouped (M, 4*M)
layout (quarter a at lanes [a*M, (a+1)*M)) sustains ~548 GB/s
(PROFILE_r05 §1). These kernels run the same color steps on the
row-grouped layout; the layouts interconvert with one XLA transpose
pass (to_rm/from_rm — once per solve, like pack/unpack).

Quarter q of the row-grouped field is the lane slice
``x[:, q*M:(q+1)*M]`` — M is a multiple of 128, so every slice is
vreg-aligned and costs nothing. All Mosaic x64 rules of packed_rbgs.py
apply (int32 everywhere; jaxpr guard in tests/test_packed_rm.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amg_tpu.ops.pallas.packed_rbgs import G, LANE, VMEM_EFF
from amg_tpu.ops.pallas.rbgs import _roll2
from amg_tpu.sparse.packed import COLORS, _neighbors


def to_rm(u4: jnp.ndarray) -> jnp.ndarray:
    """(4, M, M) -> (M, 4M): row j holds all four quarters' row j."""
    four, M, _ = u4.shape
    return u4.transpose(1, 0, 2).reshape(M, 4 * M)


def from_rm(u_rm: jnp.ndarray) -> jnp.ndarray:
    """(M, 4M) -> (4, M, M)."""
    M = u_rm.shape[0]
    return u_rm.reshape(M, 4, M).transpose(1, 0, 2)


def pick_tile_rows_rm(M: int, itemsize: int = 4,
                      pipeline: str = "db") -> int | None:
    # db: 2 slots x 2 fields of (W, 4M) + ~2 wide temporaries
    blocks = 6 if pipeline == "db" else 4
    C = 4 * M
    for tg in (128, 64, 32, 16, 8):
        if M % tg:
            continue
        if blocks * (tg + 2 * G) * C * itemsize <= VMEM_EFF:
            return tg
    return None


def eligible(m: int) -> bool:
    M = m + 1
    return M % LANE == 0 and pick_tile_rows_rm(M) is not None


def _dma_in_rm(hbm, scratch, sem, t, n_tiles: int, tg: int, start: bool,
               g: int = G):
    """Ghosted CONTIGUOUS tile DMA on the (M, C) layout with boundary
    zero-fill (start or wait)."""
    W = tg + 2 * g
    first = t == 0
    last = t == n_tiles - 1
    row0 = t * tg

    if start:
        if n_tiles == 1:
            scratch[:g, :] = jnp.zeros_like(scratch[:g, :])
            scratch[W - g:, :] = jnp.zeros_like(scratch[W - g:, :])
        else:
            @pl.when(first)
            def _():
                scratch[:g, :] = jnp.zeros_like(scratch[:g, :])

            @pl.when(last)
            def _():
                scratch[W - g:, :] = jnp.zeros_like(scratch[W - g:, :])

    if n_tiles == 1:
        d = pltpu.make_async_copy(
            hbm.at[pl.ds(np.int32(0), tg), :],
            scratch.at[pl.ds(np.int32(g), tg), :], sem)
        (d.start if start else d.wait)()
        return

    cases = [
        (first, np.int32(0), np.int32(g), tg + g),
        (last, pl.multiple_of(row0 - g, 8), np.int32(0), tg + g),
    ]
    if n_tiles >= 3:
        cases.append((jnp.logical_not(first | last),
                      pl.multiple_of(row0 - g, 8), np.int32(0), W))
    for pred, src, dst, nrow in cases:
        def go(src=src, dst=dst, nrow=nrow):
            d = pltpu.make_async_copy(
                hbm.at[pl.ds(src, nrow), :],
                scratch.at[pl.ds(dst, nrow), :], sem)
            (d.start if start else d.wait)()

        pl.when(pred)(go)


def _color_steps_rm(Bs, Us, w33, m: int, row0, omega: float,
                    symmetric: bool):
    """The unrolled color steps on a row-grouped (W, 4M) scratch pair.

    Identical math to packed_rbgs._color_steps_packed; quarter q lives
    at lanes [q*M, (q+1)*M)."""
    W, C = Us.shape
    M = C // 4
    i32 = jnp.int32
    inv_diag = 1.0 / w33[1][1]

    J_g = (jax.lax.broadcasted_iota(i32, (W, M), 0)
           + jnp.asarray(row0, dtype=i32))
    I_g = jax.lax.broadcasted_iota(i32, (W, M), 1)

    def q(ref, a):
        return ref[:, a * M:(a + 1) * M]

    order = list(COLORS)
    if symmetric:
        order = order + order[::-1]
    zero = jnp.zeros((), dtype=Us.dtype)
    for pj, pi in order:
        a = 2 * pj + pi
        Mj = M if pj == 0 else m
        Mi = M if pi == 0 else m
        acc = None
        for (wj, wi), src, (sJ, sI) in _neighbors(pj, pi):
            w = w33[wj][wi]
            if w == 0.0:
                continue
            t = w * _roll2(q(Us, src), sJ, sI)
            acc = t if acc is None else acc + t
        Ua = q(Us, a)
        delta = (q(Bs, a) - acc) * inv_diag - Ua
        mask = (J_g >= i32(0)) & (J_g < i32(Mj)) & (I_g < i32(Mi))
        Us[:, a * M:(a + 1) * M] = \
            Ua + jnp.where(mask, omega * delta, zero)


def _sweep_kernel_rm_db(b_hbm, u_hbm, out_hbm, Bs, Us, in_sems, out_sems,
                        *, tg: int, m: int, w33, omega: float,
                        symmetric: bool, n_tiles: int):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    two = jnp.asarray(2, dtype=jnp.asarray(t).dtype)
    slot = jax.lax.rem(t, two)
    nxt = jax.lax.rem(t + 1, two)

    def start_in(tile, s):
        _dma_in_rm(b_hbm, Bs.at[s], in_sems.at[s, np.int32(0)], tile,
                   n_tiles, tg, True)
        _dma_in_rm(u_hbm, Us.at[s], in_sems.at[s, np.int32(1)], tile,
                   n_tiles, tg, True)

    def wait_in(tile, s):
        _dma_in_rm(b_hbm, Bs.at[s], in_sems.at[s, np.int32(0)], tile,
                   n_tiles, tg, False)
        _dma_in_rm(u_hbm, Us.at[s], in_sems.at[s, np.int32(1)], tile,
                   n_tiles, tg, False)

    def out_dma(tile, s):
        return pltpu.make_async_copy(
            Us.at[s, pl.ds(np.int32(G), tg), :],
            out_hbm.at[pl.ds(pl.multiple_of(tile * tg, 8), tg), :],
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

    row0 = t * tg - np.int32(G)
    _color_steps_rm(Bs.at[slot], Us.at[slot], w33, m, row0, omega,
                    symmetric)

    out_dma(t, slot).start()

    @pl.when(t == T - 1)
    def _():
        out_dma(t, slot).wait()

    if True:
        @pl.when(t == T - 1)
        def _():
            out_dma(t - 1, nxt).wait()


def _sweep_kernel_rm_sb(b_hbm, u_hbm, out_hbm, Bs, Us, sems, *, tg: int,
                        m: int, w33, omega: float, symmetric: bool,
                        n_tiles: int):
    t = pl.program_id(0)
    _dma_in_rm(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg, True)
    _dma_in_rm(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg, True)
    _dma_in_rm(b_hbm, Bs, sems.at[np.int32(0)], t, n_tiles, tg, False)
    _dma_in_rm(u_hbm, Us, sems.at[np.int32(1)], t, n_tiles, tg, False)
    row0 = t * tg - np.int32(G)
    _color_steps_rm(Bs, Us, w33, m, row0, omega, symmetric)
    cp = pltpu.make_async_copy(
        Us.at[pl.ds(np.int32(G), tg), :],
        out_hbm.at[pl.ds(pl.multiple_of(t * tg, 8), tg), :],
        sems.at[np.int32(2)])
    cp.start()
    cp.wait()


def fused_gs4_sweep_rm(u_rm, b_rm, w33, m: int, omega: float = 1.0,
                       symmetric: bool = True, tg: int | None = None,
                       pipeline: str = "db", interpret: bool = False):
    """One fused symmetric four-color GS sweep on ROW-GROUPED fields.

    Same iterates as fused_gs4_sweep_packed/gs4_sweep_packed on the
    corresponding (4, M, M) field (tests assert parity through
    to_rm/from_rm)."""
    M = m + 1
    C = 4 * M
    if u_rm.shape != (M, C):
        raise ValueError(f"expected ({M}, {C}) row-grouped field, "
                         f"got {u_rm.shape}")
    if tg is None:
        tg = pick_tile_rows_rm(M, u_rm.dtype.itemsize, pipeline)
    if tg is None or M % LANE or M % tg:
        raise ValueError(f"side {2*m+1} not eligible for the row-grouped "
                         "fused sweep")
    nt = M // tg
    W = tg + 2 * G
    dtype = u_rm.dtype
    if pipeline == "db" and nt >= 2:
        kernel = partial(_sweep_kernel_rm_db, tg=tg, m=m, w33=w33,
                         omega=omega, symmetric=symmetric, n_tiles=nt)
        scratch = [
            pltpu.VMEM((2, W, C), dtype),
            pltpu.VMEM((2, W, C), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = partial(_sweep_kernel_rm_sb, tg=tg, m=m, w33=w33,
                         omega=omega, symmetric=symmetric, n_tiles=nt)
        scratch = [
            pltpu.VMEM((W, C), dtype),
            pltpu.VMEM((W, C), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ]
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=space)] * 2,
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((M, C), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(b_rm, u_rm)
