"""Pallas RDMA halo exchange (ops/pallas/halo.py) in TPU interpret mode on
the 8-virtual-device CPU mesh — remote DMAs and semaphores are simulated,
WITH race detection enabled (the sanitizer-style check SURVEY.md §5 calls
for): a mis-sequenced semaphore protocol fails the test, not just wrong
values."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from amg_tpu.ops.pallas.halo import rdma_halo_exchange

AXIS = "x"


def _ppermute_reference(u_loc, G, D):
    top = lax.ppermute(u_loc[-G:], AXIS, [(i, i + 1) for i in range(D - 1)])
    bot = lax.ppermute(u_loc[:G], AXIS, [(i + 1, i) for i in range(D - 1)])
    return jnp.concatenate([top, bot], axis=0)


@pytest.mark.parametrize("G", [2, 8])
def test_rdma_halo_matches_ppermute(G):
    D = 8
    B, n = 16, 32
    mesh = jax.make_mesh((D,), (AXIS,), devices=jax.devices()[:D])
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((D * B, n)), dtype=jnp.float32)

    interp = pltpu.InterpretParams(detect_races=True)

    def body(u_loc):
        got = rdma_halo_exchange(u_loc, G, AXIS, interpret=interp)
        want = _ppermute_reference(u_loc, G, D)
        return got, want

    # check_vma=False: the interpret-mode remote-DMA primitives don't
    # propagate varying-manual-axis metadata yet
    got, want = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(AXIS, None),
        out_specs=(P(AXIS, None), P(AXIS, None)), check_vma=False))(u)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_halo_kernel_jaxpr_is_x64_clean():
    """Same regression class as test_pallas_rbgs: any 64-bit value inside
    a Mosaic kernel breaks real-TPU lowering under jax_enable_x64
    (i64 semaphore indices fail MLIR verification), which interpret mode
    cannot catch. Full-text scan of the traced program."""
    import re

    assert jax.config.jax_enable_x64
    D = 8
    B, n = 16, 32
    mesh = jax.make_mesh((D,), (AXIS,), devices=jax.devices()[:D])
    u = jnp.zeros((D * B, n), jnp.float32)
    jaxpr = jax.make_jaxpr(jax.shard_map(
        lambda ul: rdma_halo_exchange(ul, 4, AXIS),
        mesh=mesh, in_specs=P(AXIS, None), out_specs=P(AXIS, None),
        check_vma=False))(u)
    bad = [ln.strip()[:120] for ln in str(jaxpr).splitlines()
           if re.search(r"\b[iuf]64\[", ln)]
    assert not bad, ("64-bit values traced into the RDMA halo kernel:\n"
                     + "\n".join(bad[:8]))
