"""Pallas TPU kernel: fused symmetric four-color Gauss-Seidel sweep.

The XLA masked sweep (sparse/stencil.py gs4_sweep_masked) round-trips u
through HBM once per color step — 8 full-field read/write passes per
symmetric sweep. This kernel performs the *entire* symmetric sweep (8 color
steps) with the tile resident in VMEM, using ghost-zone temporal blocking:

  * the grid tiles rows; each tile also receives its neighbor row-blocks
    (three BlockSpec views of the same arrays), giving a ghost margin;
  * each color step is a full-width masked update (VPU-aligned — no strided
    lane access) over the tile + ghost region;
  * one in-VMEM color step invalidates one ghost row per side, so with
    GHOST >= 8 the interior TR rows are exact after all 8 steps — identical
    results to the sequential color-ordered sweep;
  * neighbor reads use ``pltpu.roll`` (cheap lane/sublane rotation);
    wrap-around values land only on padding whose coefficients are zero and
    whose diagonal is one, so they contribute nothing.

HBM traffic per symmetric sweep: ~3x(9 coeff planes + b + u) reads + 1x u
write, vs ~8x12 passes for the unfused XLA path.

Padded-frame layout (built by ``PaddedStencil.prepare``): rows =
[GHOST zeros | N real | pad to multiple of TR | GHOST zeros], cols =
[2 zeros | N real | pad to lane multiple]. Padding rows/cols carry identity
diagonal so masked GS updates keep them at exactly zero.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GHOST = 8          # one row per color step, symmetric sweep = 8 steps
LANE = 128
COL_PAD_LEFT = 2   # keeps column parity aligned with the real grid

# color order must match sparse/stencil.py FOUR_COLORS (+ reverse)
_COLORS = ((0, 0), (0, 1), (1, 0), (1, 1))

_OFFSETS = [(dj, di) for dj in (-1, 0, 1) for di in (-1, 0, 1)
            if not (dj == 0 and di == 0)]


def _roll2(x, dj: int, di: int):
    """x shifted so that out[j, i] = x[j + dj, i + di]."""
    if dj:
        x = pltpu.roll(x, -dj % x.shape[0], axis=0)
    if di:
        x = pltpu.roll(x, -di % x.shape[1], axis=1)
    return x


def _sweep_kernel(cp_ref, cc_ref, cn_ref, bp_ref, bc_ref, bn_ref,
                  up_ref, uc_ref, un_ref, out_ref, *, tr: int,
                  omega: float, symmetric: bool):
    g1 = GHOST + 1
    R = tr + 2 * g1  # compute region rows (tile + ghost + 1 read margin)

    # Assemble the compute window from the three row-blocks.
    def window(pref, cref, nref, planes: bool):
        if planes:
            return jnp.concatenate(
                [pref[:, tr - g1:, :], cref[:], nref[:, :g1, :]], axis=1)
        return jnp.concatenate(
            [pref[tr - g1:, :], cref[:], nref[:g1, :]], axis=0)

    C = window(cp_ref, cc_ref, cn_ref, True)    # (9, R, M)
    B = window(bp_ref, bc_ref, bn_ref, False)   # (R, M)
    U = window(up_ref, uc_ref, un_ref, False)   # (R, M)
    M = U.shape[1]

    inv_diag = 1.0 / C[4]  # center plane (dj=0, di=0) at index 4

    # Static parity masks: real row parity of local row l is (l + 1) % 2
    # (tr, GHOST even); real col parity of local col c is c % 2
    # (COL_PAD_LEFT = 2).
    row_par = jax.lax.broadcasted_iota(jnp.int32, (R, M), 0) % 2
    col_par = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1) % 2
    masks = {}
    for pj, pi in _COLORS:
        m = (row_par == (pj + 1) % 2) & (col_par == pi)
        masks[(pj, pi)] = m.astype(U.dtype)

    order = list(_COLORS)
    if symmetric:
        order = order + order[::-1]

    for pj, pi in order:
        acc = jnp.zeros_like(U)
        for k, (dj, di) in enumerate(_OFFSETS):
            plane = k if k < 4 else k + 1  # skip center plane
            acc = acc + C[plane] * _roll2(U, dj, di)
        delta = (B - acc) * inv_diag - U  # gs value minus current u
        U = U + (omega * masks[(pj, pi)]) * delta

    out_ref[:] = U[g1:g1 + tr, :]


@dataclasses.dataclass(frozen=True)
class PaddedStencil:
    """Per-level padded operands + static geometry for the fused sweep."""

    c_pad: jnp.ndarray   # (9, Np, Mp)
    side: int            # real grid side n
    tr: int              # rows per tile
    n_tiles: int

    @property
    def padded_shape(self):
        return self.c_pad.shape[1:]

    @staticmethod
    def prepare(S, tr: int = 64, dtype=None) -> "PaddedStencil":
        """Pad a Stencil2D's coefficient planes into the kernel frame."""
        c = np.asarray(S.c)  # (3, 3, n, n)
        n = S.side
        if dtype is None:
            dtype = c.dtype
        n_tiles = -(-n // tr)
        rows = GHOST + n_tiles * tr + GHOST
        cols = COL_PAD_LEFT + n
        cols = -(-cols // LANE) * LANE
        cp = np.zeros((9, rows, cols), dtype=dtype)
        cp[:, GHOST:GHOST + n, COL_PAD_LEFT:COL_PAD_LEFT + n] = (
            c.reshape(9, n, n))
        # identity diagonal everywhere outside the real grid
        mask = np.ones((rows, cols), dtype=bool)
        mask[GHOST:GHOST + n, COL_PAD_LEFT:COL_PAD_LEFT + n] = False
        cp[4][mask] = 1.0
        return PaddedStencil(c_pad=jnp.asarray(cp), side=n, tr=tr,
                             n_tiles=n_tiles)

    def pad_field(self, f2: jnp.ndarray) -> jnp.ndarray:
        rows, cols = self.padded_shape
        n = self.side
        out = jnp.zeros((rows, cols), dtype=self.c_pad.dtype)
        return out.at[GHOST:GHOST + n,
                      COL_PAD_LEFT:COL_PAD_LEFT + n].set(f2)

    def unpad_field(self, fp: jnp.ndarray) -> jnp.ndarray:
        n = self.side
        return fp[GHOST:GHOST + n, COL_PAD_LEFT:COL_PAD_LEFT + n]


def fused_gs4_sweep(ps: PaddedStencil, u_pad: jnp.ndarray,
                    b_pad: jnp.ndarray, omega: float = 1.0,
                    symmetric: bool = True,
                    interpret: bool = False) -> jnp.ndarray:
    """One fused symmetric four-color GS sweep on padded operands.

    Equivalent to gs4_sweep / gs4_sweep_masked on the real interior
    (sparse/stencil.py), but one kernel launch and one HBM round-trip.
    """
    tr = ps.tr
    rows, cols = ps.padded_shape
    nt = ps.n_tiles
    # tile t's interior rows: [GHOST + t*tr, GHOST + (t+1)*tr).
    # The three row-block views: block indices t-1, t, t+1 over a frame
    # offset so that block t covers rows [GHOST + t*tr - tr, ...). We instead
    # address raw blocks of the padded array: block k covers rows
    # [k*tr, (k+1)*tr). Interior block of tile t is block at row offset
    # GHOST + t*tr, which is NOT tr-aligned (GHOST=8 < tr), so we realign by
    # extending the frame: shift everything so block boundaries land on
    # GHOST + m*tr via an extra leading pad of (tr - GHOST).
    lead = tr - GHOST
    grid = (nt,)

    def pad_lead(x, axis):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (lead, 0)
        return jnp.pad(x, pads)

    c_al = pad_lead(ps.c_pad, 1)
    u_al = pad_lead(u_pad, 0)
    b_al = pad_lead(b_pad, 0)
    nrows_al = rows + lead
    # ensure a full block exists below the last tile
    tail = (nt + 2) * tr - nrows_al
    if tail > 0:
        c_al = jnp.pad(c_al, ((0, 0), (0, tail), (0, 0)))
        c_al = c_al.at[4, nrows_al:, :].set(1.0)
        u_al = jnp.pad(u_al, ((0, tail), (0, 0)))
        b_al = jnp.pad(b_al, ((0, tail), (0, 0)))
    # now tile t's interior = aligned block t+1; neighbors t and t+2.
    cspec = lambda k: pl.BlockSpec((9, tr, cols), lambda t, k=k: (0, t + k, 0),
                                   memory_space=pltpu.VMEM)
    fspec = lambda k: pl.BlockSpec((tr, cols), lambda t, k=k: (t + k, 0),
                                   memory_space=pltpu.VMEM)

    kernel = partial(_sweep_kernel, tr=tr, omega=omega, symmetric=symmetric)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec(0), cspec(1), cspec(2),
                  fspec(0), fspec(1), fspec(2),
                  fspec(0), fspec(1), fspec(2)],
        out_specs=pl.BlockSpec((tr, cols), lambda t: (t + 1, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u_al.shape, u_al.dtype),
        interpret=interpret,
    )(c_al, c_al, c_al, b_al, b_al, b_al, u_al, u_al, u_al)
    # restore original padded frame (out rows [lead, lead+rows))
    return jax.lax.slice(out, (lead, 0), (lead + rows, cols))
