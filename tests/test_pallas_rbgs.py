"""Fused Pallas sweep kernel vs the reference color-ordered sweep
(interpret mode on CPU; the compiled path is exercised on real TPU by
bench.py / scripts/microbench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from amg_tpu.models import poisson
from amg_tpu.ops.pallas.rbgs import G1, PaddedStencil, fused_gs4_sweep
from amg_tpu.ops.transfer import linear_interp_1d
from amg_tpu.sparse.stencil import Stencil2D, color_masks, gs4_sweep, \
    gs4_sweep_masked


def _check(S, side, dtype=jnp.float64, omega=1.0, symmetric=True, tr=16):
    rng = np.random.default_rng(side)
    u0 = jnp.asarray(rng.standard_normal((side, side)), dtype=dtype)
    b2 = jnp.asarray(rng.standard_normal((side, side)), dtype=dtype)

    ref = gs4_sweep(S, u0, b2, omega=omega, symmetric=symmetric)

    ps = PaddedStencil.prepare(S, tr=tr, dtype=dtype)
    up = ps.pad_field(u0)
    bp = ps.pad_field(b2)
    out = fused_gs4_sweep(ps, up, bp, omega=omega, symmetric=symmetric,
                          interpret=True)
    got = ps.unpad_field(out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_fused_sweep_matches_reference_5pt():
    side = 33
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float64)
    _check(S, side)


def test_fused_sweep_matches_reference_9pt_galerkin():
    side_f, side_c = 63, 31
    A = poisson.laplacian_scipy(side_f)
    P1 = linear_interp_1d(side_f, side_c)
    P = sp.kron(P1, P1).tocsr()
    A_H = (P.T @ (A @ P)).tocsr()
    S = Stencil2D.from_scipy(A_H, side_c, dtype=jnp.float64)
    _check(S, side_c)


def test_fused_sweep_omega_and_forward_only():
    side = 31
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float64)
    _check(S, side, omega=1.4, symmetric=False)


def test_fused_sweep_multiple_tile_sizes():
    side = 33
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float64)
    for tr in (16, 32, 64):
        _check(S, side, tr=tr)


def test_masked_sweep_matches_strided():
    """gs4_sweep_masked (the XLA full-width variant) equals gs4_sweep."""
    side = 31
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal((side, side)))
    b2 = jnp.asarray(rng.standard_normal((side, side)))
    masks = color_masks(side, jnp.float64)
    a = gs4_sweep(S, u0, b2)
    b = gs4_sweep_masked(S, u0, b2, masks)
    # identical updates up to fp reassociation of the 9-point accumulation
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12,
                               atol=1e-14)


def test_fused_sweep_double_buffered_matches():
    side = 33
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float64)
    rng = np.random.default_rng(5)
    u0 = jnp.asarray(rng.standard_normal((side, side)))
    b2 = jnp.asarray(rng.standard_normal((side, side)))
    ref = gs4_sweep(S, u0, b2)
    for tr in (8, 16):
        ps = PaddedStencil.prepare(S, tr=tr, dtype=jnp.float64)
        out = fused_gs4_sweep(ps, ps.pad_field(u0), ps.pad_field(b2),
                              interpret=True, double_buffer=True)
        np.testing.assert_allclose(np.asarray(ps.unpad_field(out)),
                                   np.asarray(ref), rtol=1e-12, atol=1e-12)
