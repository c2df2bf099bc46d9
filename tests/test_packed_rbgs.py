"""Packed-layout fused Pallas sweep (ops/pallas/packed_rbgs.py).

Interpret-mode parity against the XLA color-packed sweep plus the full-
text x64-jaxpr guard. Interpret mode CANNOT catch Mosaic lowering or DMA-
ordering bugs (r1-r3 lessons) — the compiled-mode oracle is the hardware
gate in bench.py (`pallas_hw_parity`, packed variants) and
scripts/microbench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amg_tpu.models import poisson
from amg_tpu.ops.pallas.packed_rbgs import (auto_pipeline, eligible,
                                            fused_gs4_sweep_packed,
                                            pick_tile_rows)
from amg_tpu.ops.rap import poisson_const_w33
from amg_tpu.sparse.packed import gs4_sweep_packed, pack, unpack


def _fields(side, seed=0):
    m = (side - 1) // 2
    rng = np.random.default_rng(seed)
    u2 = jnp.asarray(rng.standard_normal((side, side)), dtype=jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((side, side)), dtype=jnp.float32)
    return m, pack(u2, m), pack(b2, m)


@pytest.mark.parametrize("pipeline", ["sb", "db", "db3"])
@pytest.mark.parametrize("symmetric", [True, False])
def test_interpret_parity(pipeline, symmetric):
    side = 255  # M = 128: lane-aligned, multi-tile with tg=32
    m, u4, b4 = _fields(side)
    w33 = poisson_const_w33(side, 1)[0]
    ref = gs4_sweep_packed(u4, b4, w33, m, 0.9, symmetric)
    got = fused_gs4_sweep_packed(u4, b4, w33, m, 0.9, symmetric,
                                 interpret=True, tg=32, pipeline=pipeline)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_single_tile_parity():
    side = 255
    m, u4, b4 = _fields(side, seed=3)
    w33 = poisson_const_w33(side, 1)[0]
    ref = gs4_sweep_packed(u4, b4, w33, m, 1.0, True)
    got = fused_gs4_sweep_packed(u4, b4, w33, m, 1.0, True,
                                 interpret=True, tg=128)  # nt = 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_pad_cells_stay_zero():
    """The packed pipeline relies on pad rows/cols staying exactly zero
    (they double as the Dirichlet boundary for neighbor reads)."""
    side = 255
    m, u4, b4 = _fields(side, seed=1)
    w33 = poisson_const_w33(side, 1)[0]
    got = np.asarray(fused_gs4_sweep_packed(u4, b4, w33, m, 1.0, True,
                                            interpret=True, tg=32))
    M = m + 1
    assert np.all(got[1][:, M - 1] == 0)   # q01 pad col
    assert np.all(got[2][M - 1, :] == 0)   # q10 pad row
    assert np.all(got[3][M - 1, :] == 0)
    assert np.all(got[3][:, M - 1] == 0)


def test_eligibility():
    assert eligible((1023 - 1) // 2)       # M = 512
    assert eligible((255 - 1) // 2)        # M = 128
    assert not eligible((253 - 1) // 2)    # M = 127: not lane-aligned
    with pytest.raises(ValueError):
        m, u4, b4 = _fields(253)
        fused_gs4_sweep_packed(u4, b4, poisson_const_w33(253, 1)[0],
                               (253 - 1) // 2, interpret=True)
    assert auto_pipeline(512) == "sb"
    assert auto_pipeline(2048) == "db"
    # tile choice fits the observed VMEM envelope at every prod size
    for M in (128, 256, 512, 1024, 2048, 4096):
        for p in ("sb", "db"):
            tg = pick_tile_rows(M, pipeline=p)
            assert tg is not None and M % tg == 0


def test_kernel_jaxpr_is_x64_clean():
    """Same defense as tests/test_pallas_rbgs.py: full-text scan of the
    closed jaxpr for any 64-bit dtype token — the leaks that break Mosaic
    lowering on real TPU are invisible to interpret mode."""
    import re

    assert jax.config.jax_enable_x64, "test must run under x64"
    side = 255
    m, u4, b4 = _fields(side)
    w33 = poisson_const_w33(side, 1)[0]
    for pipeline in ("sb", "db", "db3"):
        jaxpr = jax.make_jaxpr(
            lambda u_, b_: fused_gs4_sweep_packed(
                u_, b_, w33, m, 1.0, True, tg=32, pipeline=pipeline)
        )(u4, b4)
        txt = str(jaxpr)
        bad = [ln.strip()[:120] for ln in txt.splitlines()
               if re.search(r"\b[iuf]64\[", ln)]
        assert not bad, (f"64-bit values traced into the packed Pallas "
                         f"kernel ({pipeline}):\n" + "\n".join(bad[:8]))


def test_vcycle_packed_fused_matches_unfused():
    """vcycle_packed(fused=True) must produce the same iterates as the
    XLA packed cycle (interpret-mode kernel) — the auto smoother swaps
    kernels, not math. Uses a side where a fused-eligible level exists
    only if we lower the threshold, so patch it to exercise the path."""
    from unittest import mock

    from amg_tpu import structured
    from amg_tpu.structured import build_stencil_hierarchy_device

    side = 255
    hier = build_stencil_hierarchy_device(side, smoother="packed")
    b2 = poisson.rhs(side, dtype=jnp.float32).reshape(side, side)
    u0 = jnp.zeros_like(b2)
    ref = structured.vcycle_packed(hier, u0, b2, min_side=100)
    with mock.patch.object(structured, "FUSED_PACKED_MIN_SIDE", 200), \
            mock.patch.object(structured, "_mosaic_ok", lambda: True), \
            mock.patch("amg_tpu.ops.pallas.packed_cycle.eligible",
                       lambda mm: False), \
            mock.patch("amg_tpu.ops.pallas.packed_cycle.eligible_split",
                       lambda mm: False), \
            mock.patch(
                "amg_tpu.ops.pallas.packed_rbgs.fused_gs4_sweep_packed",
                lambda *a, **k: fused_gs4_sweep_packed(
                    *a, **{**k, "interpret": True})):
        got = structured.vcycle_packed(hier, u0, b2, min_side=100,
                                       fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("tiles", [(64, 128), (32, 256)],
                         ids=["r64c128", "r32c256"])
@pytest.mark.parametrize("pipeline", ["sb", "db"])
def test_2d_interpret_parity(tiles, pipeline):
    """2-D (row x column) tiled variant: identical iterates; column
    ghost = 128 lanes dwarfs the 8-step invalid front."""
    from amg_tpu.ops.pallas.packed_rbgs import fused_gs4_sweep_packed_2d

    side = 511  # M = 256: genuine column tiling with these tile picks
    m, u4, b4 = _fields(side)
    w33 = poisson_const_w33(side, 1)[0]
    ref = gs4_sweep_packed(u4, b4, w33, m, 0.9, True)
    got = fused_gs4_sweep_packed_2d(u4, b4, w33, m, 0.9, True,
                                    tiles=tiles, pipeline=pipeline,
                                    interpret=True)
    sc = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / sc < 1e-5


def test_2d_jaxpr_is_x64_clean():
    import re

    from amg_tpu.ops.pallas.packed_rbgs import fused_gs4_sweep_packed_2d

    assert jax.config.jax_enable_x64
    side = 511
    m, u4, b4 = _fields(side)
    w33 = poisson_const_w33(side, 1)[0]
    txt = str(jax.make_jaxpr(
        lambda u_, b_: fused_gs4_sweep_packed_2d(
            u_, b_, w33, m, 1.0, True, tiles=(64, 128)))(u4, b4))
    bad = [ln.strip()[:120] for ln in txt.splitlines()
           if re.search(r"\b[iuf]64\[", ln)]
    assert not bad, ("64-bit values in the 2-D packed kernel:\n"
                     + "\n".join(bad[:8]))
