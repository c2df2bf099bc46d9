"""Fused V-cycle leg kernels (ops/pallas/packed_cycle.py).

Interpret-mode parity against the unfused packed ops + the x64-jaxpr
guard; compiled-mode oracle is bench.py's hardware gate (packed_down /
packed_up variants).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amg_tpu.models import poisson
from amg_tpu.ops.pallas.packed_cycle import (eligible,
                                             fused_down_leg_packed,
                                             fused_up_leg_packed)
from amg_tpu.ops.rap import poisson_const_w33
from amg_tpu.sparse.packed import (gs4_sweep_packed, pack,
                                   prolong_add_packed, residual_packed,
                                   restrict_packed)

SIDE = 255


def _fields(seed=0):
    m = (SIDE - 1) // 2
    rng = np.random.default_rng(seed)
    u4 = pack(jnp.asarray(rng.standard_normal((SIDE, SIDE)),
                          dtype=jnp.float32), m)
    b4 = pack(jnp.asarray(rng.standard_normal((SIDE, SIDE)),
                          dtype=jnp.float32), m)
    return m, u4, b4


@pytest.mark.parametrize("tg", [32, 128], ids=["multi-tile", "one-tile"])
def test_down_leg_interpret_parity(tg):
    m, u4, b4 = _fields()
    w33 = poisson_const_w33(SIDE, 1)[0]
    u_ref = gs4_sweep_packed(u4, b4, w33, m, 0.9, True)
    bc_ref = restrict_packed(residual_packed(u_ref, b4, w33, m), m)
    u_got, bc_pad = fused_down_leg_packed(u4, b4, w33, m, 0.9, True,
                                          tg=tg, interpret=True)
    # residual/coarse values scale with 1/h^2 — compare relatively
    sc = float(jnp.abs(bc_ref).max())
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=2e-6, atol=2e-6)
    assert float(jnp.abs(bc_pad[:m, :m] - bc_ref).max()) / sc < 1e-5
    # padded row/col must be exactly zero (pack() of bc relies on it)
    assert float(jnp.abs(bc_pad[m:, :]).max()) == 0.0
    assert float(jnp.abs(bc_pad[:, m:]).max()) == 0.0


@pytest.mark.parametrize("tg", [32, 128], ids=["multi-tile", "one-tile"])
def test_up_leg_interpret_parity(tg):
    m, u4, b4 = _fields(seed=1)
    w33 = poisson_const_w33(SIDE, 1)[0]
    rng = np.random.default_rng(2)
    uc = jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.float32)
    u_ref = gs4_sweep_packed(prolong_add_packed(u4, uc, m), b4, w33, m,
                             0.9, True)
    got = fused_up_leg_packed(u4, b4, jnp.pad(uc, ((0, 1), (0, 1))),
                              w33, m, 0.9, True, tg=tg, interpret=True)
    sc = float(jnp.abs(u_ref).max())
    assert float(jnp.abs(got - u_ref).max()) / sc < 1e-5


def test_eligibility():
    assert eligible((1023 - 1) // 2)
    assert not eligible((253 - 1) // 2)


def test_leg_jaxprs_are_x64_clean():
    import re

    assert jax.config.jax_enable_x64
    m, u4, b4 = _fields()
    w33 = poisson_const_w33(SIDE, 1)[0]
    ucp = jnp.zeros((m + 1, m + 1), dtype=jnp.float32)
    for name, fn in (
        ("down", lambda u_, b_: fused_down_leg_packed(u_, b_, w33, m,
                                                      1.0, True, tg=32)),
        ("up", lambda u_, b_: fused_up_leg_packed(u_, b_, ucp, w33, m,
                                                  1.0, True, tg=32)),
    ):
        txt = str(jax.make_jaxpr(fn)(u4, b4))
        bad = [ln.strip()[:120] for ln in txt.splitlines()
               if re.search(r"\b[iuf]64\[", ln)]
        assert not bad, (f"64-bit values in the {name}-leg kernel:\n"
                         + "\n".join(bad[:8]))


def test_vcycle_with_legs_matches_unfused():
    """vcycle_packed with fused legs (interpret) must match the plain
    packed cycle."""
    from unittest import mock

    from amg_tpu import structured
    from amg_tpu.ops.pallas import packed_cycle, packed_rbgs
    from amg_tpu.structured import build_stencil_hierarchy_device

    hier = build_stencil_hierarchy_device(SIDE, smoother="packed")
    b2 = poisson.rhs(SIDE, dtype=jnp.float32).reshape(SIDE, SIDE)
    u0 = jnp.zeros_like(b2)
    ref = structured.vcycle_packed(hier, u0, b2, min_side=100)
    orig_sweep = packed_rbgs.fused_gs4_sweep_packed
    with mock.patch.object(structured, "FUSED_PACKED_MIN_SIDE", 200), \
            mock.patch.object(structured, "_mosaic_ok", lambda: True), \
            mock.patch(
                "amg_tpu.ops.pallas.packed_rbgs.fused_gs4_sweep_packed",
                new=lambda *a, **k: orig_sweep(
                    *a, **{**k, "interpret": True})), \
            mock.patch(
                "amg_tpu.ops.pallas.packed_cycle.fused_down_leg_packed",
                new=lambda *a, **k: fused_down_leg_packed(
                    *a, **{**k, "interpret": True})), \
            mock.patch(
                "amg_tpu.ops.pallas.packed_cycle.fused_up_leg_packed",
                new=lambda *a, **k: fused_up_leg_packed(
                    *a, **{**k, "interpret": True})):
        got = structured.vcycle_packed(hier, u0, b2, min_side=100,
                                       fused=True)
    sc = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / sc < 1e-5


@pytest.mark.parametrize("tg", [32, 128], ids=["multi-tile", "one-tile"])
def test_residual_restrict_interpret_parity(tg):
    from amg_tpu.ops.pallas.packed_cycle import \
        fused_residual_restrict_packed

    m, u4, b4 = _fields(seed=3)
    w33 = poisson_const_w33(SIDE, 1)[0]
    bc_ref = restrict_packed(residual_packed(u4, b4, w33, m), m)
    bc_pad = fused_residual_restrict_packed(u4, b4, w33, m, tg=tg,
                                            interpret=True)
    sc = float(jnp.abs(bc_ref).max())
    assert float(jnp.abs(bc_pad[:m, :m] - bc_ref).max()) / sc < 1e-5
    assert float(jnp.abs(bc_pad[m:, :]).max()) == 0.0
    assert float(jnp.abs(bc_pad[:, m:]).max()) == 0.0


def test_residual_restrict_jaxpr_x64_clean():
    import re

    from amg_tpu.ops.pallas.packed_cycle import \
        fused_residual_restrict_packed

    assert jax.config.jax_enable_x64
    m, u4, b4 = _fields()
    w33 = poisson_const_w33(SIDE, 1)[0]
    txt = str(jax.make_jaxpr(
        lambda u_, b_: fused_residual_restrict_packed(u_, b_, w33, m,
                                                      tg=32))(u4, b4))
    bad = [ln.strip()[:120] for ln in txt.splitlines()
           if re.search(r"\b[iuf]64\[", ln)]
    assert not bad, ("64-bit values in the residual+restrict kernel:\n"
                     + "\n".join(bad[:8]))


def test_vcycle_split_path_matches_unfused():
    """vcycle_packed with the SPLIT down path (fused sweep + fused
    residual/restrict + up leg — the M >= 4096 configuration) must match
    the plain packed cycle. Forced by making the full down leg
    ineligible."""
    from unittest import mock

    from amg_tpu import structured
    from amg_tpu.ops.pallas import packed_cycle, packed_rbgs
    from amg_tpu.ops.pallas.packed_cycle import \
        fused_residual_restrict_packed
    from amg_tpu.structured import build_stencil_hierarchy_device

    hier = build_stencil_hierarchy_device(SIDE, smoother="packed")
    b2 = poisson.rhs(SIDE, dtype=jnp.float32).reshape(SIDE, SIDE)
    u0 = jnp.zeros_like(b2)
    ref = structured.vcycle_packed(hier, u0, b2, min_side=100)
    orig_sweep = packed_rbgs.fused_gs4_sweep_packed
    with mock.patch.object(structured, "FUSED_PACKED_MIN_SIDE", 200), \
            mock.patch.object(structured, "_mosaic_ok", lambda: True), \
            mock.patch.object(packed_cycle, "eligible",
                              lambda m_: False), \
            mock.patch(
                "amg_tpu.ops.pallas.packed_rbgs.fused_gs4_sweep_packed",
                new=lambda *a, **k: orig_sweep(
                    *a, **{**k, "interpret": True})), \
            mock.patch(
                "amg_tpu.ops.pallas.packed_cycle."
                "fused_residual_restrict_packed",
                new=lambda *a, **k: fused_residual_restrict_packed(
                    *a, **{**k, "interpret": True})), \
            mock.patch(
                "amg_tpu.ops.pallas.packed_cycle.fused_up_leg_packed",
                new=lambda *a, **k: fused_up_leg_packed(
                    *a, **{**k, "interpret": True})):
        got = structured.vcycle_packed(hier, u0, b2, min_side=100,
                                       fused=True)
    sc = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / sc < 1e-5
