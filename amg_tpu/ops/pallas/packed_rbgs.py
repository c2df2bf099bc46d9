"""Pallas TPU kernel: fused symmetric four-color GS sweep on the
COLOR-PACKED layout — the minimum-traffic production smoother.

The XLA color-packed sweep (sparse/packed.py gs4_sweep_packed) is the
fastest unfused smoother but still round-trips the quarter fields through
HBM once per color step — ~55% of the unbeatable 3-pass bound (read u,
read b, write u) at 4095^2 (BENCH_r03). This kernel runs the *entire*
symmetric sweep (8 color steps) with a row-tile of all four quarters
resident in VMEM:

  * operands are the plain packed ``(4, M, M)`` fields (M = m+1) used by
    the whole packed pipeline — no padded frame, no relayout anywhere;
  * the kernel DMAs each TG-row tile plus a G = 8 ghost-row margin per
    side into VMEM scratch; boundary tiles zero-fill the out-of-range
    margin (zero padding IS the Dirichlet boundary, exactly as in
    sparse/packed.py);
  * each of the 8 color steps is statically unrolled (each color has a
    different static shift pattern); one in-VMEM step invalidates one
    ghost row per side, so with G = 8 the interior TG rows are exactly
    the sequential color-ordered iterate;
  * neighbor reads are ``pltpu.roll`` lane/sublane rotations. Wrapped
    values land only (a) in the ghost margin rows, which are discarded,
    or (b) at packed pad columns/rows, which the update masks never
    touch — verified against the XLA packed sweep on hardware
    (scripts/microbench.py, bench.py pallas gate).

HBM traffic per symmetric sweep: (read u + read b) * (TG+2G)/TG + write u
— ~3.5 field passes vs 24 color-step passes unfused. Replaces the
reference's sequential sweep hot loop (smoother.hpp:86-216) at
speed-of-light.

Mosaic x64 rules (docs/PERF.md r3): every shift/index is np.int32; no
Python-int fori bounds; any 64-bit value in the closed jaxpr breaks real-
TPU lowering (tests/test_pallas_rbgs.py guards the full trace).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amg_tpu.ops.pallas.rbgs import _roll2
from amg_tpu.sparse.packed import COLORS, _neighbors

G = 8                      # ghost rows per side (= 8 color steps)
LANE = 128


def eligible(m: int) -> bool:
    """The kernel requires lane-aligned quarters (M % 128 == 0) so rolls
    and DMAs stay on tile boundaries; true for every level of a 2^k - 1
    hierarchy (M = 2^(k-1))."""
    M = m + 1
    return M % LANE == 0 and M >= 2 * G and pick_tile_rows(M) is not None


def auto_pipeline(M: int) -> str:
    """Measured-best pipeline per quarter size (v5e, r4 scan): the serial
    variant wins while the whole working set is small (fewer grid steps,
    VMEM headroom buys bigger tiles); the 2-slot rotation wins at
    M >= 2048 where tiles are VMEM-squeezed and DMA must hide behind
    compute. db3 measured no better than db anywhere (the constraint is
    tile size, not pipeline depth)."""
    return "sb" if M <= 1024 else "db"


_PIPE_BLOCKS = {"sb": 10, "db": 12, "db3": 14}
# calibrated against observed Mosaic compile successes/failures (r4):
# scratch blocks (2 fields x slots) + ~8 live (W, M) temporaries in the
# unrolled color steps; totals up to ~11.5 MB compiled, above failed
VMEM_EFF = int(11.5 * 1024 * 1024)


def pick_tile_rows(M: int, itemsize: int = 4,
                   double_buffer: bool = False,
                   pipeline: str | None = None) -> int | None:
    """Largest TG dividing M whose scratch + live temporaries fit VMEM.

    When the whole (4, M, M) field is small enough that XLA may promote
    the kernel's operand/result buffers into VMEM (observed: S(1)
    placement inside larger jitted programs — the memory_space=HBM pin on
    the specs is not honored for outputs), reserve room for all three
    copies; otherwise only our scratch + temporaries count."""
    if pipeline is None:
        pipeline = "db" if double_buffer else "sb"
    blocks = _PIPE_BLOCKS[pipeline]
    field = 4 * M * M * itemsize
    reserve = 3 * field if field <= 6 * 1024 * 1024 else 0
    budget = min(VMEM_EFF, int(15.5 * 1024 * 1024) - reserve)
    for tg in (512, 256, 128, 64, 32, 16, 8):
        if M % tg:
            continue
        W = tg + 2 * G
        if blocks * W * M * itemsize <= budget:
            return tg
    return None


def _color_steps_packed(Bs, Us, w33, m: int, row0, omega: float,
                        symmetric: bool, col0=None, M_full: int | None = None):
    """The unrolled color steps on VMEM scratch quarters.

    Us/Bs: (4, W, Wc) refs. row0/col0: global packed coordinates of the
    tile origin (traced int32; col0 defaults to 0 — full-width tiles).
    Update masks combine the quarter validity bounds (J < Mj, I < Mi —
    the packed pad rows/cols stay exactly zero, sparse/packed.py
    semantics) with the tile's global position; ghost rows/cols update
    CORRECTLY (temporal blocking needs them exact until invalidated by
    wrap fronts).
    """
    _, W, Wc = Us.shape
    M = Wc if M_full is None else M_full
    i32 = jnp.int32
    inv_diag = 1.0 / w33[1][1]

    # global packed coords of each local cell (origin already includes -G)
    J_g = (jax.lax.broadcasted_iota(i32, (W, Wc), 0)
           + jnp.asarray(row0, dtype=i32))
    I_g = jax.lax.broadcasted_iota(i32, (W, Wc), 1)
    if col0 is not None:
        I_g = I_g + jnp.asarray(col0, dtype=i32)

    order = list(COLORS)
    if symmetric:
        order = order + order[::-1]
    zero = jnp.zeros((), dtype=Us.dtype)
    # quarters are (re)read from the VMEM scratch refs per color step and
    # written straight back: keeps the live value set to ~3 single-quarter
    # temporaries (vs 8 when all quarters are held as values), which is
    # what lets larger row tiles fit VMEM
    for pj, pi in order:
        a = 2 * pj + pi
        Mj = M if pj == 0 else m
        Mi = M if pi == 0 else m
        acc = None
        for (wj, wi), src, (sJ, sI) in _neighbors(pj, pi):
            w = w33[wj][wi]
            if w == 0.0:
                continue
            t = w * _roll2(Us[np.int32(src)], sJ, sI)
            acc = t if acc is None else acc + t
        Ua = Us[np.int32(a)]
        delta = (Bs[np.int32(a)] - acc) * inv_diag - Ua
        mask = (J_g >= i32(0)) & (J_g < i32(Mj)) & (I_g >= i32(0)) \
            & (I_g < i32(Mi))
        Us[np.int32(a)] = Ua + jnp.where(mask, omega * delta, zero)


def _axis_cases(t, n: int, tg: int, g: int, align: int = 8):
    """Static DMA-clipping cases along one tiled axis.

    Returns a list of (predicate-or-None, src_off, dst_off, size): the
    ghosted range [t*tg - g, t*tg + tg + g) clipped to [0, n*tg), one
    entry per static shape; exactly one predicate holds per tile
    (None = unconditional, used when the axis has a single tile).
    ``align`` is the divisibility Mosaic must prove for dynamic offsets
    (8 sublanes for the row axis, 128 lanes for the column axis)."""
    if n == 1:
        return [(None, np.int32(0), np.int32(g), tg)]
    first = t == 0
    last = t == n - 1
    out = [
        (first, np.int32(0), np.int32(g), tg + g),
        (last, pl.multiple_of(t * tg - g, align), np.int32(0), tg + g),
    ]
    if n >= 3:  # middle tiles exist (their slice must also fit the array)
        out.append((jnp.logical_not(first | last),
                    pl.multiple_of(t * tg - g, align), np.int32(0),
                    tg + 2 * g))
    return out


def _dma_2d(hbm, scratch, sem, tr, tc, ntr: int, ntc: int, tgr: int,
            tgc: int, gr: int, gc: int, start: bool):
    """2-D ghosted tile DMA with boundary zero-fill (start or wait).

    Loads packed rows [tr*tgr - gr, ...) x cols [tc*tgc - gc, ...) of a
    (4, Mr, Mc) field into the (4, Wr, Wc) scratch; out-of-range rows/
    cols become zeros. One row-case x col-case combination fires per
    tile; all signal the same semaphore."""
    Wr = tgr + 2 * gr
    Wc = tgc + 2 * gc

    if start:
        # zero-fill the margins the DMA won't cover (corners get zeroed
        # by both passes — harmless)
        if ntr > 1:
            @pl.when(tr == 0)
            def _():
                scratch[:, :gr, :] = jnp.zeros_like(scratch[:, :gr, :])

            @pl.when(tr == ntr - 1)
            def _():
                scratch[:, Wr - gr:, :] = jnp.zeros_like(
                    scratch[:, Wr - gr:, :])
        else:
            scratch[:, :gr, :] = jnp.zeros_like(scratch[:, :gr, :])
            scratch[:, Wr - gr:, :] = jnp.zeros_like(
                scratch[:, Wr - gr:, :])
        if gc > 0 and ntc > 1:
            @pl.when(tc == 0)
            def _():
                scratch[:, :, :gc] = jnp.zeros_like(scratch[:, :, :gc])

            @pl.when(tc == ntc - 1)
            def _():
                scratch[:, :, Wc - gc:] = jnp.zeros_like(
                    scratch[:, :, Wc - gc:])
        elif gc > 0:
            scratch[:, :, :gc] = jnp.zeros_like(scratch[:, :, :gc])
            scratch[:, :, Wc - gc:] = jnp.zeros_like(
                scratch[:, :, Wc - gc:])

    for rp, rs, rd, rn in _axis_cases(tr, ntr, tgr, gr, align=8):
        for cp, cs, cd, cn in _axis_cases(tc, ntc, tgc, gc, align=LANE):
            def go(rs=rs, rd=rd, rn=rn, cs=cs, cd=cd, cn=cn):
                dma = pltpu.make_async_copy(
                    hbm.at[:, pl.ds(rs, rn), pl.ds(cs, cn)],
                    scratch.at[:, pl.ds(rd, rn), pl.ds(cd, cn)], sem)
                (dma.start if start else dma.wait)()

            if rp is None and cp is None:
                go()
            else:
                pred = (cp if rp is None
                        else rp if cp is None else rp & cp)
                pl.when(pred)(go)


def _dma_in(hbm, scratch, sem, t, n_tiles: int, tg: int, Mp: int,
            g: int = G):
    """Tile t's ghosted input DMA with boundary zero-fill.

    Loads global packed rows [t*tg - g, t*tg + tg + g) of a (4, Mp, M)
    field into the (4, W, M) scratch; rows outside [0, Mp) become zeros
    (the Dirichlet/pad boundary). Distinct static shapes per boundary
    case — Pallas DMAs need static sizes. ``g`` must be a multiple of 8
    (sublane-aligned DMA offsets)."""
    W = tg + 2 * g
    first = t == 0
    last = t == n_tiles - 1

    if n_tiles == 1:
        scratch[:, :g, :] = jnp.zeros_like(scratch[:, :g, :])
        scratch[:, W - g:, :] = jnp.zeros_like(scratch[:, W - g:, :])
        dma = pltpu.make_async_copy(hbm.at[:, pl.ds(np.int32(0), tg), :],
                                    scratch.at[:, pl.ds(np.int32(g), tg),
                                               :], sem)
        dma.start()
        return dma

    row0 = t * tg

    @pl.when(first)
    def _():
        scratch[:, :g, :] = jnp.zeros_like(scratch[:, :g, :])

    @pl.when(last)
    def _():
        scratch[:, W - g:, :] = jnp.zeros_like(scratch[:, W - g:, :])

    # Three static-shape cases; exactly one starts per tile, all signal
    # the same semaphore, and the matching wait below re-derives the case
    # from t.
    @pl.when(first)
    def _():
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(np.int32(0), tg + g), :],
            scratch.at[:, pl.ds(np.int32(g), tg + g), :], sem).start()

    @pl.when(last)
    def _():
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(pl.multiple_of(row0 - g, 8), tg + g), :],
            scratch.at[:, pl.ds(np.int32(0), tg + g), :], sem).start()

    @pl.when(jnp.logical_not(first | last))
    def _():
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(pl.multiple_of(row0 - g, 8), W), :],
            scratch.at[:, pl.ds(np.int32(0), W), :], sem).start()

    return None


def _dma_in_wait(hbm, scratch, sem, t, n_tiles: int, tg: int,
                 g: int = G):
    """Wait for whichever _dma_in case tile t started (same descriptor)."""
    W = tg + 2 * g
    first = t == 0
    last = t == n_tiles - 1
    row0 = t * tg

    @pl.when(first)
    def _():
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(np.int32(0), tg + g), :],
            scratch.at[:, pl.ds(np.int32(g), tg + g), :], sem).wait()

    @pl.when(last)
    def _():
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(pl.multiple_of(row0 - g, 8), tg + g), :],
            scratch.at[:, pl.ds(np.int32(0), tg + g), :], sem).wait()

    @pl.when(jnp.logical_not(first | last))
    def _():
        pltpu.make_async_copy(
            hbm.at[:, pl.ds(pl.multiple_of(row0 - g, 8), W), :],
            scratch.at[:, pl.ds(np.int32(0), W), :], sem).wait()


def _packed_sweep_kernel(b_hbm, u_hbm, out_hbm, Bs, Us, sems, *, tg: int,
                         m: int, w33, omega: float, symmetric: bool,
                         n_tiles: int):
    """Single-buffered: DMA u+b tile in, 8 color steps in VMEM, DMA the
    interior TG rows out."""
    t = pl.program_id(0)
    Mp = u_hbm.shape[1]
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
    _color_steps_packed(Bs, Us, w33, m, row0, omega, symmetric)

    cp_out = pltpu.make_async_copy(
        Us.at[:, pl.ds(np.int32(G), tg), :],
        out_hbm.at[:, pl.ds(pl.multiple_of(t * tg, G), tg), :],
        sems.at[np.int32(2)])
    cp_out.start()
    cp_out.wait()


def _packed_sweep_kernel_db(b_hbm, u_hbm, out_hbm, Bs, Us, in_sems,
                            out_sems, *, tg: int, m: int, w33,
                            omega: float, symmetric: bool, n_tiles: int):
    """Double-buffered: tile t+1's u+b stream in while tile t's color
    steps run; tile t's interior streams out DIRECTLY from its compute
    slot (no staging copy — the slot is not overwritten until tile t+2's
    input DMA, which waits on the out DMA first). Scratch persists across
    the sequential TPU grid (rbgs.py pattern)."""
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

    # tile t-1's out DMA reads Us[nxt]; it must drain before tile t+1's
    # input DMA overwrites that slot (by now it has typically already
    # overlapped tile t-1's --> t's transition)
    @pl.when((t >= 1) & (t + 1 < T))
    def _():
        out_dma(t - 1, nxt).wait()

    @pl.when(t + 1 < T)
    def _():
        start_in(t + 1, nxt)

    wait_in(t, slot)

    row0 = t * tg - np.int32(G)
    _color_steps_packed(Bs.at[slot], Us.at[slot], w33, m, row0, omega,
                        symmetric)

    out_dma(t, slot).start()

    @pl.when(t == T - 1)
    def _():
        out_dma(t, slot).wait()

    if T >= 2:
        @pl.when(t == T - 1)
        def _():
            out_dma(t - 1, nxt).wait()


def _packed_sweep_kernel_db3(b_hbm, u_hbm, out_hbm, Bs, Us, in_sems,
                             out_sems, *, tg: int, m: int, w33,
                             omega: float, symmetric: bool, n_tiles: int):
    """Triple-buffered rotation: slot t%3 computes while slot (t+1)%3
    streams in and slot (t-1)%3 streams out — input DMA, compute, and
    output DMA fully concurrent (the 2-slot variant must drain the out
    DMA before each prefetch, serializing ~1/3 of the traffic). Slot k is
    reused at tile k+3; its out DMA is drained before tile k+3's input
    starts."""
    t = pl.program_id(0)
    T = pl.num_programs(0)
    Mp = u_hbm.shape[1]
    three = jnp.asarray(3, dtype=jnp.asarray(t).dtype)
    slot = jax.lax.rem(t, three)
    nxt = jax.lax.rem(t + 1, three)

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

    # slot (t+1)%3 was last used by tile t-2; drain its out DMA before
    # overwriting (it overlapped the whole of tile t-1's compute)
    @pl.when((t >= 2) & (t + 1 < T))
    def _():
        out_dma(t - 2, nxt).wait()

    @pl.when(t + 1 < T)
    def _():
        start_in(t + 1, nxt)

    wait_in(t, slot)

    row0 = t * tg - np.int32(G)
    _color_steps_packed(Bs.at[slot], Us.at[slot], w33, m, row0, omega,
                        symmetric)

    out_dma(t, slot).start()

    # tail: drain every out DMA not covered by a later prefetch
    @pl.when(t == T - 1)
    def _():
        out_dma(t, slot).wait()

    if T >= 2:
        @pl.when(t == T - 1)
        def _():
            out_dma(t - 1, jax.lax.rem(t - 1 + three, three)).wait()

    if T >= 3:
        @pl.when(t == T - 1)
        def _():
            out_dma(t - 2, jax.lax.rem(t - 2 + three, three)).wait()


GC = 128   # column ghost (lane-aligned; invalid front is only 8)


def pick_tile_2d(M: int, itemsize: int = 4,
                 pipeline: str = "db") -> tuple[int, int] | None:
    """(tgr, tgc) maximizing read efficiency tgr/(tgr+2G) x tgc/(tgc+2GC)
    under the VMEM envelope. Only sensible when a full-width row tile is
    VMEM-squeezed (M >= 4096): the 256 ghost columns then cost less than
    the tiny row tiles they replace."""
    blocks = _PIPE_BLOCKS[pipeline]
    best = None
    best_eff = 0.0
    for tgc in (4096, 2048, 1024, 512):
        if M % tgc or tgc < GC:  # middle-tile clipping needs tgc >= gc
            continue
        Wc = tgc + (2 * GC if M > tgc else 0)
        for tgr in (512, 256, 128, 64, 32, 16):
            if M % tgr:
                continue
            Wr = tgr + 2 * G
            if blocks * Wr * Wc * itemsize > VMEM_EFF:
                continue
            eff = (tgr / Wr) * (tgc / Wc)
            if eff > best_eff:
                best_eff, best = eff, (tgr, tgc)
            break  # largest feasible tgr for this tgc
    return best


def _packed_sweep_kernel_2d(b_hbm, u_hbm, out_hbm, Bs, Us, sems, *,
                            tgr: int, tgc: int, ntr: int, ntc: int,
                            m: int, w33, omega: float, symmetric: bool,
                            gc: int):
    """Single-buffered 2-D tiled variant (rows x columns)."""
    t = pl.program_id(0)
    ntc_ = jnp.asarray(ntc, dtype=jnp.asarray(t).dtype)
    tr = t // ntc_
    tc = jax.lax.rem(t, ntc_)
    M = u_hbm.shape[1]

    _dma_2d(b_hbm, Bs, sems.at[np.int32(0)], tr, tc, ntr, ntc, tgr, tgc,
            G, gc, start=True)
    _dma_2d(u_hbm, Us, sems.at[np.int32(1)], tr, tc, ntr, ntc, tgr, tgc,
            G, gc, start=True)
    _dma_2d(b_hbm, Bs, sems.at[np.int32(0)], tr, tc, ntr, ntc, tgr, tgc,
            G, gc, start=False)
    _dma_2d(u_hbm, Us, sems.at[np.int32(1)], tr, tc, ntr, ntc, tgr, tgc,
            G, gc, start=False)

    row0 = tr * tgr - np.int32(G)
    col0 = tc * tgc - np.int32(gc)
    _color_steps_packed(Bs, Us, w33, m, row0, omega, symmetric,
                        col0=col0, M_full=M)

    cp_out = pltpu.make_async_copy(
        Us.at[:, pl.ds(np.int32(G), tgr), pl.ds(np.int32(gc), tgc)],
        out_hbm.at[:, pl.ds(pl.multiple_of(tr * tgr, 8), tgr),
                   pl.ds(pl.multiple_of(tc * tgc, LANE), tgc)],
        sems.at[np.int32(2)])
    cp_out.start()
    cp_out.wait()


def _packed_sweep_kernel_2d_db(b_hbm, u_hbm, out_hbm, Bs, Us, in_sems,
                               out_sems, *, tgr: int, tgc: int, ntr: int,
                               ntc: int, m: int, w33, omega: float,
                               symmetric: bool, gc: int):
    """2-slot 2-D tiled variant (flattened row-major tile order)."""
    t = pl.program_id(0)
    T = pl.num_programs(0)
    dt = jnp.asarray(t).dtype
    ntc_ = jnp.asarray(ntc, dtype=dt)
    two = jnp.asarray(2, dtype=dt)
    slot = jax.lax.rem(t, two)
    nxt = jax.lax.rem(t + 1, two)
    M = u_hbm.shape[1]

    def rc(tile):
        return tile // ntc_, jax.lax.rem(tile, ntc_)

    def io_2d(hbm, scr, sem, tile, start):
        tr, tc = rc(tile)
        _dma_2d(hbm, scr, sem, tr, tc, ntr, ntc, tgr, tgc, G, gc,
                start=start)

    def start_in(tile, s):
        io_2d(b_hbm, Bs.at[s], in_sems.at[s, np.int32(0)], tile, True)
        io_2d(u_hbm, Us.at[s], in_sems.at[s, np.int32(1)], tile, True)

    def wait_in(tile, s):
        io_2d(b_hbm, Bs.at[s], in_sems.at[s, np.int32(0)], tile, False)
        io_2d(u_hbm, Us.at[s], in_sems.at[s, np.int32(1)], tile, False)

    def out_dma(tile, s):
        tr, tc = rc(tile)
        return pltpu.make_async_copy(
            Us.at[s, :, pl.ds(np.int32(G), tgr), pl.ds(np.int32(gc), tgc)],
            out_hbm.at[:, pl.ds(pl.multiple_of(tr * tgr, 8), tgr),
                       pl.ds(pl.multiple_of(tc * tgc, LANE), tgc)],
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

    tr, tc = rc(t)
    _color_steps_packed(Bs.at[slot], Us.at[slot], w33, m,
                        tr * tgr - np.int32(G), omega, symmetric,
                        col0=tc * tgc - np.int32(gc), M_full=M)

    out_dma(t, slot).start()

    @pl.when(t == T - 1)
    def _():
        out_dma(t, slot).wait()

    if T >= 2:
        @pl.when(t == T - 1)
        def _():
            out_dma(t - 1, nxt).wait()


def fused_gs4_sweep_packed_2d(u4, b4, w33, m: int, omega: float = 1.0,
                              symmetric: bool = True,
                              tiles: tuple[int, int] | None = None,
                              pipeline: str = "db",
                              interpret: bool = False):
    """2-D tiled fused sweep for quarter sizes where full-width row tiles
    are VMEM-squeezed (M >= 4096): 256 ghost columns (the lane-alignment
    minimum; the temporal invalid front is only 8) buy row tiles 4x
    taller, cutting total ghost traffic ~1.6x at M = 4096."""
    M = m + 1
    if u4.shape != (4, M, M):
        raise ValueError(f"expected (4, {M}, {M}) packed field, "
                         f"got {u4.shape}")
    if tiles is None:
        tiles = pick_tile_2d(M, u4.dtype.itemsize, pipeline)
    if tiles is None or M % LANE:
        raise ValueError(f"side {2*m+1} not eligible for the 2-D fused "
                         "packed sweep")
    tgr, tgc = tiles
    ntr, ntc = M // tgr, M // tgc
    gc = GC if ntc > 1 else 0
    Wr = tgr + 2 * G
    Wc = tgc + 2 * gc
    dtype = u4.dtype
    nt = ntr * ntc

    if pipeline == "db" and nt >= 2:
        kernel = partial(_packed_sweep_kernel_2d_db, tgr=tgr, tgc=tgc,
                         ntr=ntr, ntc=ntc, m=m, w33=w33, omega=omega,
                         symmetric=symmetric, gc=gc)
        scratch = [
            pltpu.VMEM((2, 4, Wr, Wc), dtype),
            pltpu.VMEM((2, 4, Wr, Wc), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = partial(_packed_sweep_kernel_2d, tgr=tgr, tgc=tgc,
                         ntr=ntr, ntc=ntc, m=m, w33=w33, omega=omega,
                         symmetric=symmetric, gc=gc)
        scratch = [
            pltpu.VMEM((4, Wr, Wc), dtype),
            pltpu.VMEM((4, Wr, Wc), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ]
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=space)] * 2,
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((4, M, M), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(b4, u4)


def fused_gs4_sweep_packed(u4: jnp.ndarray, b4: jnp.ndarray, w33, m: int,
                           omega: float = 1.0, symmetric: bool = True,
                           double_buffer: bool = True,
                           interpret: bool = False,
                           tg: int | None = None,
                           pipeline: str | None = None) -> jnp.ndarray:
    """One fused (symmetric) four-color GS sweep on plain packed fields.

    Drop-in replacement for sparse/packed.gs4_sweep_packed — same
    (4, M, M) operands, same iterates (sequential color order) — at
    ~3 HBM field passes instead of 24. Requires ``eligible(m)``.

    pipeline: 'sb' (DMA-compute-DMA serial), 'db' (2-slot rotation), or
    'db3' (3-slot — in/compute/out fully concurrent); default 'db' when
    double_buffer else 'sb'.
    """
    M = m + 1
    if u4.shape != (4, M, M):
        raise ValueError(f"expected (4, {M}, {M}) packed field, "
                         f"got {u4.shape}")
    if pipeline is None:
        pipeline = auto_pipeline(M) if double_buffer else "sb"
    if tg is None and pipeline == "db" and M >= 4096:
        # VMEM squeezes full-width tiles to tg<=32 here; 2-D tiling buys
        # 4x taller rows for 256 ghost columns (~5% measured — the
        # binding constraint at this size is DMA bandwidth, which tops
        # out at ~430 GB/s vs 630 at M=2048; see docs/PERF.md r4)
        tiles = pick_tile_2d(M, u4.dtype.itemsize, pipeline)
        if tiles is not None:
            return fused_gs4_sweep_packed_2d(u4, b4, w33, m, omega,
                                             symmetric, tiles=tiles,
                                             pipeline=pipeline,
                                             interpret=interpret)
    if tg is None:
        tg = pick_tile_rows(M, u4.dtype.itemsize, pipeline=pipeline)
    if tg is None or M % LANE or M % tg:
        raise ValueError(f"side {2*m+1} not eligible for the fused "
                         "packed sweep")
    nt = M // tg
    W = tg + 2 * G
    dtype = u4.dtype

    if pipeline == "db3" and nt >= 2:
        kernel = partial(_packed_sweep_kernel_db3, tg=tg, m=m, w33=w33,
                         omega=omega, symmetric=symmetric, n_tiles=nt)
        scratch = [
            pltpu.VMEM((3, 4, W, M), dtype),
            pltpu.VMEM((3, 4, W, M), dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.SemaphoreType.DMA((3,)),
        ]
    elif pipeline == "db" and nt >= 2:
        kernel = partial(_packed_sweep_kernel_db, tg=tg, m=m, w33=w33,
                         omega=omega, symmetric=symmetric, n_tiles=nt)
        scratch = [
            pltpu.VMEM((2, 4, W, M), dtype),
            pltpu.VMEM((2, 4, W, M), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = partial(_packed_sweep_kernel, tg=tg, m=m, w33=w33,
                         omega=omega, symmetric=symmetric, n_tiles=nt)
        scratch = [
            pltpu.VMEM((4, W, M), dtype),
            pltpu.VMEM((4, W, M), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ]
    # no input_output_aliases: every tile's ghost rows must read the
    # PRISTINE pre-sweep input (rbgs.py round-1 lesson — aliasing made
    # tile t's lower ghosts observe tile t-1's post-sweep writes).
    # Operands/result are pinned to HBM: with pl.ANY, XLA may place a
    # small field's buffers in VMEM (S(1)) when the kernel sits inside a
    # larger program, and those 3 extra field copies + our scratch blow
    # the 16 MB scoped-vmem limit (observed at M=512 inside refine_step).
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=space)] * 2,
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((4, M, M), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(b4, u4)
