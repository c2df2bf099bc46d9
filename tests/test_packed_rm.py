"""Row-grouped (contiguous-DMA) sweep kernel (ops/pallas/packed_rm.py).

Interpret-mode parity + layout round-trip + the x64-jaxpr guard.
Compiled-mode verdict (real chip, PROFILE_r05 addendum): bitwise-equal
to the packed sweep at every tile size; the contiguous DMA sustains
~642 GB/s effective at M=4096 (vs ~464 strided) but the 4x-wider VMEM
slabs force tg=16 tiles whose ghost traffic eats most of it — net +6%
on the sweep, not worth the per-solve layout conversions. Kept as the
measured evaluation of the layout alternative.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amg_tpu.ops.pallas.packed_rm import (eligible, from_rm,
                                          fused_gs4_sweep_rm, to_rm)
from amg_tpu.ops.rap import poisson_const_w33
from amg_tpu.sparse.packed import gs4_sweep_packed, pack

SIDE = 255


def _fields(seed=0):
    m = (SIDE - 1) // 2
    rng = np.random.default_rng(seed)
    u4 = pack(jnp.asarray(rng.standard_normal((SIDE, SIDE)),
                          dtype=jnp.float32), m)
    b4 = pack(jnp.asarray(rng.standard_normal((SIDE, SIDE)),
                          dtype=jnp.float32), m)
    return m, u4, b4


def test_layout_roundtrip():
    _, u4, _ = _fields()
    assert float(jnp.abs(from_rm(to_rm(u4)) - u4).max()) == 0.0


@pytest.mark.parametrize("pipe,tg", [("sb", 32), ("db", 16)])
def test_rm_sweep_interpret_parity(pipe, tg):
    m, u4, b4 = _fields()
    w33 = poisson_const_w33(SIDE, 1)[0]
    ref = gs4_sweep_packed(u4, b4, w33, m, 0.9, True)
    got = from_rm(fused_gs4_sweep_rm(to_rm(u4), to_rm(b4), w33, m, 0.9,
                                     True, tg=tg, pipeline=pipe,
                                     interpret=True))
    sc = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / sc < 1e-5


def test_rm_jaxpr_is_x64_clean():
    import re

    assert jax.config.jax_enable_x64
    m, u4, b4 = _fields()
    w33 = poisson_const_w33(SIDE, 1)[0]
    txt = str(jax.make_jaxpr(
        lambda u_, b_: fused_gs4_sweep_rm(to_rm(u_), to_rm(b_), w33, m,
                                          1.0, True, tg=16,
                                          pipeline="db"))(u4, b4))
    bad = [ln.strip()[:120] for ln in txt.splitlines()
           if re.search(r"\b[iuf]64\[", ln)]
    assert not bad, ("64-bit values in the row-grouped kernel:\n"
                     + "\n".join(bad[:8]))


def test_eligibility():
    assert eligible((255 - 1) // 2)
