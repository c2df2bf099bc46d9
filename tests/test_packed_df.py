"""Fused df32 residual+rss kernel (ops/pallas/packed_df.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amg_tpu.ops.doublefloat import DF32, df_rss_fast
from amg_tpu.ops.pallas.packed_df import eligible, fused_df_residual_rss
from amg_tpu.ops.rap import poisson_const_w33
from amg_tpu.sparse.packed import df_residual_const_packed, pack

SIDE = 255


def _fields(seed=0):
    m = (SIDE - 1) // 2
    rng = np.random.default_rng(seed)

    def f(scale=1.0):
        return pack(jnp.asarray(rng.standard_normal((SIDE, SIDE)) * scale,
                                dtype=jnp.float32), m)

    return m, DF32(hi=f(), lo=f(1e-8)), DF32(hi=f(), lo=f(1e-8))


@pytest.mark.parametrize("tg", [32, 128], ids=["multi-tile", "one-tile"])
def test_interpret_parity(tg):
    m, u_df, b_df = _fields()
    w33 = poisson_const_w33(SIDE, 1)[0]
    r_ref = df_residual_const_packed(w33, b_df, u_df, m)
    rss_ref = float(df_rss_fast(r_ref))
    rh, parts = fused_df_residual_rss(w33, b_df, u_df, m, tg=tg,
                                      interpret=True)
    sc = float(jnp.abs(r_ref.hi).max())
    assert float(jnp.abs(rh - r_ref.hi).max()) / sc < 1e-6
    rss_k = float(jnp.sum(parts[:, 0, 0]))
    assert abs(rss_k - rss_ref) / rss_ref < 1e-5


def test_eligibility():
    w33 = poisson_const_w33(SIDE, 1)[0]
    assert eligible((SIDE - 1) // 2, w33)
    # non-pow2 weights: must refuse (the TwoSum cascade requires exact
    # products)
    w_bad = tuple(tuple(w * 1.1 for w in row) for row in w33)
    assert not eligible((SIDE - 1) // 2, w_bad)
    with pytest.raises(ValueError):
        m, u_df, b_df = _fields()
        fused_df_residual_rss(w_bad, b_df, u_df, m, interpret=True)


def test_jaxpr_is_x64_clean():
    import re

    assert jax.config.jax_enable_x64
    m, u_df, b_df = _fields()
    w33 = poisson_const_w33(SIDE, 1)[0]
    txt = str(jax.make_jaxpr(
        lambda uh, ul, bh, bl: fused_df_residual_rss(
            w33, DF32(hi=bh, lo=bl), DF32(hi=uh, lo=ul), m, tg=32))(
                u_df.hi, u_df.lo, b_df.hi, b_df.lo))
    bad = [ln.strip()[:120] for ln in txt.splitlines()
           if re.search(r"\b[iuf]64\[", ln)]
    assert not bad, ("64-bit values in the df residual kernel:\n"
                     + "\n".join(bad[:8]))


@pytest.mark.parametrize("pipe,tg", [("db", 16), ("db", 32)])
def test_df_kernel_db_interpret_parity(pipe, tg):
    """2-slot pipeline variant matches the unfused df32 residual + rss
    (and the sb kernel) in interpret mode."""
    m, u_df, b_df = _fields()
    w33 = poisson_const_w33(SIDE, 1)[0]
    r_ref = df_residual_const_packed(w33, b_df, u_df, m)
    rss_ref = float(df_rss_fast(r_ref))
    rh, parts = fused_df_residual_rss(w33, b_df, u_df, m, tg=tg,
                                      pipeline=pipe, interpret=True)
    sc = float(jnp.abs(r_ref.hi).max())
    assert float(jnp.abs(rh - r_ref.hi).max()) / sc < 1e-6
    rss_k = float(np.asarray(parts)[:, 0, 0].sum())
    assert abs(rss_k - rss_ref) / rss_ref < 1e-5
