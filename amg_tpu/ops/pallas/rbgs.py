"""Pallas TPU kernel: fused symmetric four-color Gauss-Seidel sweep.

The XLA masked sweep (sparse/stencil.py gs4_sweep_masked) round-trips u
through HBM once per color step — 8 full-field read/write passes per
symmetric sweep, and measures memory-bound at exactly that traffic. This
kernel performs the *entire* symmetric sweep (8 color steps) with the tile
resident in VMEM, using ghost-zone temporal blocking:

  * operands live in HBM (`pl.ANY`); the kernel DMAs each row tile plus a
    GHOST-row margin into VMEM scratch (pltpu.make_async_copy);
  * each color step is a full-width masked update (VPU-aligned — no strided
    lane access) over the tile + ghost region;
  * one in-VMEM color step invalidates one ghost row per side, so with
    GHOST > 8 the interior TR rows are exact after all 8 steps — identical
    results to the sequential color-ordered sweep;
  * neighbor reads use ``pltpu.roll`` (cheap lane/sublane rotation);
    wrap-around values land only on padding whose coefficients are zero and
    whose diagonal is one, so they contribute nothing.

HBM traffic per symmetric sweep: ~(9 coeff planes + b + u) reads + u write,
times a (TR + 2*G1)/TR ghost overhead — ~6x less than the unfused path.

Padded-frame layout (built by ``PaddedStencil.prepare``): rows =
[G1 zeros | N real | pad to multiple of TR | G1 zeros], cols =
[2 zeros | N real | pad to lane multiple]. G1 and TR are even so local
parity equals real-grid parity (masks become compile-time constants), and
padding rows/cols carry identity diagonal so updates keep them at zero.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G1 = 16            # ghost+margin rows per side (even, > 8 color steps)
LANE = 128
COL_PAD_LEFT = 2   # keeps column parity aligned with the real grid
VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16 MB/core

# color order must match sparse/stencil.py FOUR_COLORS (+ reverse)
_COLORS = ((0, 0), (0, 1), (1, 0), (1, 1))

_OFFSETS = [(dj, di) for dj in (-1, 0, 1) for di in (-1, 0, 1)
            if not (dj == 0 and di == 0)]


def _roll2(x, dj: int, di: int):
    """x shifted so that out[j, i] = x[j + dj, i + di].

    Shifts are pinned to np.int32: a Python-int shift becomes an i64[]
    jaxpr literal under jax_enable_x64, and ANY 64-bit value inside a
    Mosaic kernel makes the lowering's _convert_helper fallback recurse
    infinitely (convert-from-64-bit re-emits itself)."""
    if dj:
        x = pltpu.roll(x, np.int32(-dj % x.shape[0]), axis=0)
    if di:
        x = pltpu.roll(x, np.int32(-di % x.shape[1]), axis=1)
    return x


def _fori32(n_steps: int, body, init):
    """Static-trip-count fori loop with an int32 counter.

    lax.fori_loop with concrete bounds lowers to scan carrying
    ``int(lower)`` — a PYTHON int, canonicalized to int64 under
    jax_enable_x64 regardless of the dtype the bounds were pinned to
    (jax/_src/lax/control_flow/loops.py fori_loop: ``lower_ =
    int(lower)``). That i64 carry is what made every fused-kernel variant
    die in Mosaic's _convert_helper on real TPU under x64. This helper
    keeps the counter an explicit np.int32 scan carry."""
    def scan_body(carry, _):
        s, u = carry
        return (s + np.int32(1), body(s, u)), None

    (_, out), _ = jax.lax.scan(scan_body, (np.int32(0), init), None,
                               length=n_steps)
    return out


def _color_sweep_body_const(B, Us, omega: float, symmetric: bool,
                            row0, side: int, w33):
    """Constant-stencil color steps: weights are Python floats (immediate
    constants — zero coefficient traffic), and a validity mask supplies the
    zero-padding boundary semantics that the variable path encodes via
    identity-diagonal padding planes. Zero weights (e.g. the 5-point fine
    level's corners) drop their rolls at trace time."""
    W, M = B.shape
    inv_diag = 1.0 / w33[1][1]

    # all index arithmetic pinned to int32: under jax_enable_x64 a weak
    # Python literal can promote to int64, which Pallas TPU lowering
    # rejects (and jnp's astype fallback recurses infinitely)
    i32 = jnp.int32
    row_g = (jax.lax.broadcasted_iota(i32, (W, M), 0)
             + jnp.asarray(row0, dtype=i32))
    col_g = jax.lax.broadcasted_iota(i32, (W, M), 1)
    # real row = row_g - G1, real col = col_g - COL_PAD_LEFT; both offsets
    # even, so local parity == real parity.
    valid = ((row_g >= i32(G1)) & (row_g < i32(G1 + side))
             & (col_g >= i32(COL_PAD_LEFT))
             & (col_g < i32(COL_PAD_LEFT + side)))
    row_par = row_g % i32(2)
    col_par = col_g % i32(2)

    n_steps = 8 if symmetric else 4

    # One color step per fori_loop iteration (color from index arithmetic;
    # measured faster than static unrolling on v5e). Zero weights — e.g.
    # the 5-point fine level's corners — drop their rolls at trace time.
    def step(s, U):
        idx = jnp.where(s < i32(4), s, i32(7) - s)
        pj = idx // i32(2)
        pi = idx % i32(2)
        acc = jnp.zeros_like(U)
        for di in (-1, 0, 1):
            if all(w33[dj + 1][di + 1] == 0.0
                   for dj in (-1, 0, 1) if (dj, di) != (0, 0)):
                continue
            Ui = _roll2(U, 0, di) if di else U  # one lane roll per column
            for dj in (-1, 0, 1):
                if dj == 0 and di == 0:
                    continue
                w = w33[dj + 1][di + 1]
                if w == 0.0:
                    continue
                acc = acc + w * (_roll2(Ui, dj, 0) if dj else Ui)
        delta = (B - acc) * inv_diag - U
        mask = (row_par == pj) & (col_par == pi) & valid
        # zero pinned to the compute dtype: a weak 0.0 literal becomes an
        # f64 scalar under jax_enable_x64, and Mosaic's f64->f32 convert
        # fallback recurses infinitely at lowering time
        zero = jnp.zeros((), dtype=U.dtype)
        return U + jnp.where(mask, omega * delta, zero)

    Us[:] = _fori32(n_steps, step, Us[:])


def _color_sweep_body(C, B, Us, omega: float, symmetric: bool):
    """Shared compute: run the color steps in place on the U scratch."""
    M = B.shape[1]
    W = B.shape[0]
    inv_diag = 1.0 / C[4]  # center plane (dj=0, di=0)

    # Static parity masks: real row parity of local row l is l % 2 (row0 and
    # G1 even); real col parity of local col c is c % 2 (COL_PAD_LEFT = 2).
    # int32-pinned arithmetic: see the x64-promotion note in the const body.
    i32 = jnp.int32
    row_par = jax.lax.broadcasted_iota(i32, (W, M), 0) % i32(2)
    col_par = jax.lax.broadcasted_iota(i32, (W, M), 1) % i32(2)

    n_steps = 8 if symmetric else 4

    # One color step per loop iteration (compiled once, not unrolled 8x).
    # Color sequence 00,01,10,11 then mirrored: index arithmetic on the
    # step counter avoids captured constant arrays.
    def step(s, U):
        idx = jnp.where(s < i32(4), s, i32(7) - s)
        pj = idx // i32(2)
        pi = idx % i32(2)
        acc = jnp.zeros_like(U)
        for k, (dj, di) in enumerate(_OFFSETS):
            plane = k if k < 4 else k + 1  # skip center plane
            acc = acc + C[plane] * _roll2(U, dj, di)
        delta = (B - acc) * inv_diag - U  # gs value minus current u
        mask = ((row_par == pj) & (col_par == pi)).astype(U.dtype)
        return U + (omega * mask) * delta

    Us[:] = _fori32(n_steps, step, Us[:])


def _copy_margins(u_hbm, out_hbm, sems, t, n_tiles: int, rows: int):
    """Pass the G1-row top/bottom frame margins through to the output.

    The output buffer no longer aliases the input (see fused_gs4_sweep), so
    the margin rows — which no tile's interior write covers — must be copied
    explicitly or they would be uninitialized. They are zeros in any
    well-formed padded field; copy them verbatim from the input.
    """
    @pl.when(t == 0)
    def _():
        dma = pltpu.make_async_copy(u_hbm.at[pl.ds(0, G1), :],
                                    out_hbm.at[pl.ds(0, G1), :],
                                    sems.at[np.int32(0)])
        dma.start()
        dma.wait()

    @pl.when(t == n_tiles - 1)
    def _():
        dma = pltpu.make_async_copy(u_hbm.at[pl.ds(rows - G1, G1), :],
                                    out_hbm.at[pl.ds(rows - G1, G1), :],
                                    sems.at[np.int32(1)])
        dma.start()
        dma.wait()


def _sweep_kernel(c_hbm, b_hbm, u_hbm, out_hbm, Cs, Bs, Us, sems,
                  margin_sems, *, tr: int, omega: float, symmetric: bool,
                  n_tiles: int, rows: int):
    """Single-buffered variant: DMA in, compute, DMA out, per tile.

    The u ghost rows are always read from the pristine INPUT buffer (the
    output is a distinct allocation), so tile t's lower ghost reads can
    never observe tile t-1's post-sweep writes — the ghost-zone-blocking
    precondition that made the round-1 aliased version wrong on hardware.
    """
    t = pl.program_id(0)
    row0 = t * tr
    W = tr + 2 * G1

    cp_c = pltpu.make_async_copy(c_hbm.at[:, pl.ds(row0, W), :], Cs,
                                 sems.at[np.int32(0)])
    cp_b = pltpu.make_async_copy(b_hbm.at[pl.ds(row0, W), :], Bs,
                                 sems.at[np.int32(1)])
    cp_u = pltpu.make_async_copy(u_hbm.at[pl.ds(row0, W), :], Us,
                                 sems.at[np.int32(2)])
    cp_c.start()
    cp_b.start()
    cp_u.start()
    _copy_margins(u_hbm, out_hbm, margin_sems, t, n_tiles, rows)
    cp_c.wait()
    cp_b.wait()
    cp_u.wait()

    _color_sweep_body(Cs[:], Bs[:], Us, omega, symmetric)

    cp_out = pltpu.make_async_copy(Us.at[G1:G1 + tr, :],
                                   out_hbm.at[pl.ds(row0 + G1, tr), :],
                                   sems.at[np.int32(3)])
    cp_out.start()
    cp_out.wait()


def _sweep_kernel_const(b_hbm, u_hbm, out_hbm, Bs, Us, sems, margin_sems, *,
                        tr: int, omega: float, symmetric: bool,
                        n_tiles: int, rows: int, side: int, w33):
    """Constant-stencil single-buffered tile loop: DMA in u+b (the only
    operand traffic — ~6x less than the variable path), run the 8 color
    steps in VMEM, DMA the interior out."""
    t = pl.program_id(0)
    row0 = t * tr
    W = tr + 2 * G1

    cp_b = pltpu.make_async_copy(b_hbm.at[pl.ds(row0, W), :], Bs,
                                 sems.at[np.int32(0)])
    cp_u = pltpu.make_async_copy(u_hbm.at[pl.ds(row0, W), :], Us,
                                 sems.at[np.int32(1)])
    cp_b.start()
    cp_u.start()
    _copy_margins(u_hbm, out_hbm, margin_sems, t, n_tiles, rows)
    cp_b.wait()
    cp_u.wait()

    _color_sweep_body_const(Bs[:], Us, omega, symmetric, row0, side, w33)

    cp_out = pltpu.make_async_copy(Us.at[G1:G1 + tr, :],
                                   out_hbm.at[pl.ds(row0 + G1, tr), :],
                                   sems.at[np.int32(2)])
    cp_out.start()
    cp_out.wait()


def _sweep_kernel_const_db(b_hbm, u_hbm, out_hbm, Bs, Us, Os, in_sems,
                           out_sems, margin_sems, *, tr: int, omega: float,
                           symmetric: bool, n_tiles: int, rows: int,
                           side: int, w33):
    """Constant-stencil double-buffered variant: tile t+1's u+b stream in
    while tile t's color steps run; tile t's interior streams out of its
    own slot. Scratch persists across the sequential TPU grid."""
    t = pl.program_id(0)
    T = pl.num_programs(0)
    W = tr + 2 * G1
    two = jnp.asarray(2, dtype=jnp.asarray(t).dtype)
    slot = jax.lax.rem(t, two)
    nxt = jax.lax.rem(t + 1, two)

    def in_dmas(tile, s):
        row0 = tile * tr
        return (pltpu.make_async_copy(b_hbm.at[pl.ds(row0, W), :],
                                      Bs.at[s], in_sems.at[s, np.int32(0)]),
                pltpu.make_async_copy(u_hbm.at[pl.ds(row0, W), :],
                                      Us.at[s], in_sems.at[s, np.int32(1)]))

    def out_dma(tile, s):
        row0 = tile * tr
        return pltpu.make_async_copy(
            Os.at[s], out_hbm.at[pl.ds(row0 + G1, tr), :], out_sems.at[s])

    @pl.when(t == 0)
    def _():
        for dma in in_dmas(t, slot):
            dma.start()

    @pl.when(t + 1 < T)
    def _():
        for dma in in_dmas(t + 1, nxt):
            dma.start()

    _copy_margins(u_hbm, out_hbm, margin_sems, t, n_tiles, rows)

    for dma in in_dmas(t, slot):
        dma.wait()

    _color_sweep_body_const(Bs[slot], Us.at[slot], omega, symmetric,
                            t * tr, side, w33)

    @pl.when(t >= 2)
    def _():
        out_dma(t - 2, slot).wait()

    Os[slot] = Us[slot, G1:G1 + tr, :]
    out_dma(t, slot).start()

    @pl.when(t == T - 1)
    def _():
        out_dma(t, slot).wait()

    if T >= 2:
        @pl.when(t == T - 1)
        def _():
            out_dma(t - 1, nxt).wait()


def _sweep_kernel_db(c_hbm, b_hbm, u_hbm, out_hbm, Cs, Bs, Us, Os,
                     in_sems, out_sems, margin_sems, *, tr: int,
                     omega: float, symmetric: bool, n_tiles: int,
                     rows: int):
    """Double-buffered variant: while tile t computes from slot t%2, the
    tile t+1 operand DMAs stream into slot (t+1)%2, and tile t's result
    streams out of its own output slot — DMA latency hides behind the 8
    color steps. Scratch persists across the (sequential) TPU grid.

    Safe without aliasing: input DMAs read u_hbm (pristine), output DMAs
    write out_hbm (a distinct buffer), so overlapping tile t+1's input
    stream with tile t's output stream cannot race."""
    t = pl.program_id(0)
    T = pl.num_programs(0)
    W = tr + 2 * G1
    two = jnp.asarray(2, dtype=jnp.asarray(t).dtype)
    slot = jax.lax.rem(t, two)
    nxt = jax.lax.rem(t + 1, two)

    def start_in(tile, s):
        row0 = tile * tr
        pltpu.make_async_copy(c_hbm.at[:, pl.ds(row0, W), :], Cs.at[s],
                              in_sems.at[s, np.int32(0)]).start()
        pltpu.make_async_copy(b_hbm.at[pl.ds(row0, W), :], Bs.at[s],
                              in_sems.at[s, np.int32(1)]).start()
        pltpu.make_async_copy(u_hbm.at[pl.ds(row0, W), :], Us.at[s],
                              in_sems.at[s, np.int32(2)]).start()

    def wait_in(tile, s):
        row0 = tile * tr
        pltpu.make_async_copy(c_hbm.at[:, pl.ds(row0, W), :], Cs.at[s],
                              in_sems.at[s, np.int32(0)]).wait()
        pltpu.make_async_copy(b_hbm.at[pl.ds(row0, W), :], Bs.at[s],
                              in_sems.at[s, np.int32(1)]).wait()
        pltpu.make_async_copy(u_hbm.at[pl.ds(row0, W), :], Us.at[s],
                              in_sems.at[s, np.int32(2)]).wait()

    def out_dma(tile, s):
        row0 = tile * tr
        return pltpu.make_async_copy(
            Os.at[s], out_hbm.at[pl.ds(row0 + G1, tr), :], out_sems.at[s])

    @pl.when(t == 0)
    def _():
        start_in(t, slot)

    @pl.when(t + 1 < T)
    def _():
        start_in(t + 1, nxt)

    _copy_margins(u_hbm, out_hbm, margin_sems, t, n_tiles, rows)

    wait_in(t, slot)

    _color_sweep_body(Cs[slot], Bs[slot], Us.at[slot], omega, symmetric)

    # the previous tile's out DMA used the other slot; ensure it drained
    # before we reuse that slot next iteration — and before overwriting
    # nothing now: our own slot's previous out (tile t-2) must be done.
    @pl.when(t >= 2)
    def _():
        out_dma(t - 2, slot).wait()

    Os[slot] = Us[slot, G1:G1 + tr, :]
    out_dma(t, slot).start()

    @pl.when(t == T - 1)
    def _():
        out_dma(t, slot).wait()

    if T >= 2:  # static grid size
        @pl.when(t == T - 1)
        def _():
            out_dma(t - 1, nxt).wait()


def pick_tile_rows(cols: int, itemsize: int = 4,
                   double_buffer: bool = False,
                   const: bool = False) -> int:
    """Largest even TR fitting VMEM: scratch row-blocks (9 coeff planes
    + b + u, or just b + u for the constant-stencil path; x2 when
    double-buffered) plus ~8 compiler temporaries of one (W, cols) block
    each, plus the output staging slots."""
    operands = 2 if const else 11
    scratch_blocks = (2 * operands if double_buffer else operands) + 8
    for tr in (512, 256, 128, 64, 32, 16, 8):
        total = scratch_blocks * (tr + 2 * G1) * cols * itemsize
        if double_buffer:
            total += 2 * tr * cols * itemsize
        if total <= VMEM_BUDGET:
            return tr
    return 8


@partial(jax.tree_util.register_dataclass,
         data_fields=["c_pad"],
         meta_fields=["side", "tr", "n_tiles", "rows", "cols", "w33",
                      "np_dtype"])
@dataclasses.dataclass(frozen=True)
class PaddedStencil:
    """Per-level padded operands + static geometry for the fused sweep.

    Constant-stencil levels (Stencil2D.w33 set) carry only the 3x3 weight
    tuple as static metadata — no padded coefficient planes at all
    (c_pad is None) — and dispatch to the const kernels."""

    c_pad: jnp.ndarray | None   # (9, Np, Mp), or None when w33 is set
    side: int            # real grid side n
    tr: int              # rows per tile
    n_tiles: int
    rows: int            # padded frame rows
    cols: int            # padded frame cols
    w33: tuple | None = None
    np_dtype: str = "float32"

    @property
    def padded_shape(self):
        return (self.rows, self.cols)

    @property
    def dtype(self):
        return jnp.dtype(self.np_dtype)

    @staticmethod
    def prepare(S, tr: int | None = None, dtype=None,
                double_buffer: bool = False) -> "PaddedStencil":
        """Pad a Stencil2D's coefficient planes into the kernel frame."""
        n = S.side
        if dtype is None:
            dtype = np.asarray(S.c[:1, :1, :1, :1]).dtype
        dtype = np.dtype(dtype)
        const = S.w33 is not None
        cols = COL_PAD_LEFT + n
        cols = -(-cols // LANE) * LANE
        if tr is None:
            tr = pick_tile_rows(cols, dtype.itemsize, double_buffer,
                                const=const)
        n_tiles = -(-n // tr)
        rows = G1 + n_tiles * tr + G1
        if const:
            return PaddedStencil(c_pad=None, side=n, tr=tr,
                                 n_tiles=n_tiles, rows=rows, cols=cols,
                                 w33=S.w33, np_dtype=dtype.name)
        c = np.asarray(S.c)  # (3, 3, n, n)
        cp = np.zeros((9, rows, cols), dtype=dtype)
        cp[:, G1:G1 + n, COL_PAD_LEFT:COL_PAD_LEFT + n] = c.reshape(9, n, n)
        # identity diagonal everywhere outside the real grid
        mask = np.ones((rows, cols), dtype=bool)
        mask[G1:G1 + n, COL_PAD_LEFT:COL_PAD_LEFT + n] = False
        cp[4][mask] = 1.0
        return PaddedStencil(c_pad=jnp.asarray(cp), side=n, tr=tr,
                             n_tiles=n_tiles, rows=rows, cols=cols,
                             np_dtype=dtype.name)

    def pad_field(self, f2: jnp.ndarray) -> jnp.ndarray:
        rows, cols = self.padded_shape
        n = self.side
        out = jnp.zeros((rows, cols), dtype=self.dtype)
        return out.at[G1:G1 + n, COL_PAD_LEFT:COL_PAD_LEFT + n].set(f2)

    def unpad_field(self, fp: jnp.ndarray) -> jnp.ndarray:
        n = self.side
        return fp[G1:G1 + n, COL_PAD_LEFT:COL_PAD_LEFT + n]


def fused_gs4_sweep(ps: PaddedStencil, u_pad: jnp.ndarray,
                    b_pad: jnp.ndarray, omega: float = 1.0,
                    symmetric: bool = True, interpret: bool = False,
                    double_buffer: bool = False) -> jnp.ndarray:
    """One fused symmetric four-color GS sweep on padded operands.

    Equivalent to gs4_sweep / gs4_sweep_masked on the real interior
    (sparse/stencil.py), but one kernel launch and ~one HBM round-trip.
    Rows outside [G1, G1 + n_tiles*tr) of the returned frame are copied
    through unchanged (they are zeros in a well-formed padded field).
    ``double_buffer=True`` prefetches the next tile's operands during
    compute (2x scratch; use a smaller tr).
    """
    tr = ps.tr
    rows, cols = ps.padded_shape
    nt = ps.n_tiles
    W = tr + 2 * G1
    dtype = u_pad.dtype

    if ps.w33 is not None:
        # Constant-stencil path: u + b are the only operands; weights are
        # immediate constants baked into the kernel.
        if double_buffer:
            kernel = partial(_sweep_kernel_const_db, tr=tr, omega=omega,
                             symmetric=symmetric, n_tiles=nt, rows=rows,
                             side=ps.side, w33=ps.w33)
            scratch = [
                pltpu.VMEM((2, W, cols), dtype),
                pltpu.VMEM((2, W, cols), dtype),
                pltpu.VMEM((2, tr, cols), dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kernel = partial(_sweep_kernel_const, tr=tr, omega=omega,
                             symmetric=symmetric, n_tiles=nt, rows=rows,
                             side=ps.side, w33=ps.w33)
            scratch = [
                pltpu.VMEM((W, cols), dtype),
                pltpu.VMEM((W, cols), dtype),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        # Operands/result pinned to HBM on real TPU: with pl.ANY, XLA
        # may place the buffers in VMEM (S(1)) inside larger programs
        # and blow the scoped-vmem limit (observed: the var kernel at
        # 4095^2 inside solve_loop_df32, 17.74 M > 16 M — the same
        # promotion the packed kernels guard against).
        space = pl.ANY if interpret else pltpu.MemorySpace.HBM
        return pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[pl.BlockSpec(memory_space=space)] * 2,
            out_specs=pl.BlockSpec(memory_space=space),
            out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(b_pad, u_pad)

    if double_buffer:
        kernel = partial(_sweep_kernel_db, tr=tr, omega=omega,
                         symmetric=symmetric, n_tiles=nt, rows=rows)
        scratch = [
            pltpu.VMEM((2, 9, W, cols), dtype),
            pltpu.VMEM((2, W, cols), dtype),
            pltpu.VMEM((2, W, cols), dtype),
            pltpu.VMEM((2, tr, cols), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = partial(_sweep_kernel, tr=tr, omega=omega,
                         symmetric=symmetric, n_tiles=nt, rows=rows)
        scratch = [
            pltpu.VMEM((9, W, cols), dtype),
            pltpu.VMEM((W, cols), dtype),
            pltpu.VMEM((W, cols), dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    # NO input_output_aliases: the output must be a distinct buffer so each
    # tile's ghost rows are read from the PRISTINE pre-sweep input. Round 1
    # donated u to the output, and tile t's lower-ghost DMA then observed
    # tile t-1's post-sweep writes — wrong results on real TPU (fine in
    # interpret mode, whose grid steps see snapshotted buffers).
    # HBM pin on real TPU (see the const branch above): the 9-plane
    # operand is ~600 MB at 4095^2 and must never be VMEM-promoted.
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    out = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=space)] * 3,
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(ps.c_pad, b_pad, u_pad)
    return out
