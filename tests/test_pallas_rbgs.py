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


def _check(S, side, dtype=jnp.float64, omega=1.0, symmetric=True, tr=16,
           const=True):
    import dataclasses

    if not const:
        S = dataclasses.replace(S, w33=None)  # force the variable path
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


@pytest.mark.parametrize("const", [True, False],
                         ids=["const-w33", "variable-planes"])
def test_fused_sweep_matches_reference_5pt(const):
    side = 33
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float64)
    assert S.w33 is not None  # detection must fire for Poisson
    _check(S, side, const=const)


@pytest.mark.parametrize("const", [True, False],
                         ids=["const-w33", "variable-planes"])
def test_fused_sweep_matches_reference_9pt_galerkin(const):
    side_f, side_c = 63, 31
    A = poisson.laplacian_scipy(side_f)
    P1 = linear_interp_1d(side_f, side_c)
    P = sp.kron(P1, P1).tocsr()
    A_H = (P.T @ (A @ P)).tocsr()
    S = Stencil2D.from_scipy(A_H, side_c, dtype=jnp.float64)
    _check(S, side_c, const=const)


def test_fused_sweep_truly_variable_coefficients():
    """A non-constant operator (randomly perturbed symmetric 9-point) must
    route to the variable-coefficient kernel and still match."""
    side = 31
    A = poisson.laplacian_scipy(side)
    rng = np.random.default_rng(7)
    D = sp.diags(1.0 + 0.2 * rng.standard_normal(side * side))
    A_var = (D @ A @ D).tocsr()  # symmetric, same 9-point pattern
    S = Stencil2D.from_scipy(A_var, side, dtype=jnp.float64)
    assert S.w33 is None
    _check(S, side)


@pytest.mark.parametrize("const", [True, False],
                         ids=["const-w33", "variable-planes"])
def test_fused_sweep_omega_and_forward_only(const):
    side = 31
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float64)
    _check(S, side, omega=1.4, symmetric=False, const=const)


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


@pytest.mark.parametrize("const", [True, False],
                         ids=["const-w33", "variable-planes"])
def test_fused_sweep_double_buffered_matches(const):
    import dataclasses

    side = 33
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float64)
    if not const:
        S = dataclasses.replace(S, w33=None)
    rng = np.random.default_rng(5)
    u0 = jnp.asarray(rng.standard_normal((side, side)))
    b2 = jnp.asarray(rng.standard_normal((side, side)))
    ref = gs4_sweep(S, u0, b2)
    for tr in (8, 16):
        ps = PaddedStencil.prepare(S, tr=tr, dtype=jnp.float64,
                                   double_buffer=True)
        out = fused_gs4_sweep(ps, ps.pad_field(u0), ps.pad_field(b2),
                              interpret=True, double_buffer=True)
        np.testing.assert_allclose(np.asarray(ps.unpad_field(out)),
                                   np.asarray(ref), rtol=1e-12, atol=1e-12)


def test_kernel_jaxpr_is_x64_clean():
    """Regression (round-2/3 hardware bug): any 64-bit value inside a
    Mosaic kernel breaks TPU lowering under jax_enable_x64 — a 64-bit
    convert makes ``_convert_helper`` recurse infinitely, and a 64-bit
    semaphore/memref index fails MLIR verification. Neither is catchable in
    interpret mode. Three distinct leaks have shipped: a weak 0.0 literal
    (f64 scalar), lax.fori_loop's Python-int scan carry (the static-bounds
    path does ``int(lower)`` — i64 regardless of bound dtype), and
    Python-int pltpu.roll shifts / semaphore indices (i64 literals).

    Defense: render the ENTIRE closed jaxpr of every kernel variant — all
    nested jaxprs and literal operands included — and assert no 64-bit
    dtype token appears anywhere. The previous version of this test walked
    only pallas_call eqn params looking for ``:f64`` and passed while the
    hardware failed; full-text over the whole trace is the check that
    actually corresponds to what Mosaic lowers."""
    import dataclasses
    import re

    import jax

    assert jax.config.jax_enable_x64, "test must run under x64"
    side = 63
    S = Stencil2D.from_scipy(poisson.laplacian_scipy(side), side,
                             dtype=jnp.float32)
    b2 = poisson.rhs(side, dtype=jnp.float32).reshape(side, side)
    for S_ in (S, dataclasses.replace(S, w33=None)):
        for db in (False, True):
            ps = PaddedStencil.prepare(S_, tr=16, dtype=jnp.float32,
                                       double_buffer=db)
            u = ps.pad_field(jnp.zeros_like(b2))
            jaxpr = jax.make_jaxpr(
                lambda u_, b_: fused_gs4_sweep(ps, u_, b_,
                                               double_buffer=db)
            )(u, ps.pad_field(b2))
            txt = str(jaxpr)
            bad = [ln.strip()[:120] for ln in txt.splitlines()
                   if re.search(r"\b[iuf]64\[", ln)]
            assert not bad, (
                f"64-bit values traced into the Pallas kernel "
                f"(const={S_.w33 is not None}, db={db}):\n"
                + "\n".join(bad[:8]))
