"""Pallas RDMA halo exchange — inter-chip ghost strips over ICI.

The distributed smoother (parallel/structured_dist.py) exchanges one
G-row ghost strip per sweep via ``lax.ppermute``. This module is the
Pallas-native equivalent named in SURVEY.md §2/§5 (the NCCL-p2p analog):
``pltpu.make_async_remote_copy`` RDMA pushes the boundary strips directly
into the neighbor's receive buffer, so a fused kernel can overlap the
transfer with interior compute under explicit semaphore control rather
than relying on XLA's collective scheduler.

The exchange is over a LINE of devices (row slabs), not a ring: edge
devices send/receive on one side only and the missing strips read zero
(Dirichlet-consistent, matching ``_exchange_strips``).

Validated in TPU *interpret mode* (which simulates remote DMAs and
semaphores on the CPU mesh, with optional race detection) against the
ppermute implementation — see tests/test_pallas_halo.py. On a real
multi-chip slice the same kernel runs over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(u_ref, out_ref, send_sem, recv_sem, *, G: int,
                 axis: str):
    my = jax.lax.axis_index(axis)
    D = jax.lax.axis_size(axis)
    B = u_ref.shape[0]

    # Zero the strips no neighbor will write (line edges). Done before the
    # barrier so it cannot race with a neighbor's incoming RDMA.
    @pl.when(my == 0)
    def _():
        out_ref[pl.ds(0, G), :] = jnp.zeros_like(out_ref[pl.ds(0, G), :])

    @pl.when(my == D - 1)
    def _():
        out_ref[pl.ds(G, G), :] = jnp.zeros_like(out_ref[pl.ds(G, G), :])

    # Barrier with both neighbors: their receive buffers must be live
    # before we RDMA into them.
    barrier = pltpu.get_barrier_semaphore()
    Dc = jnp.asarray(D, dtype=jnp.int32)
    left = jax.lax.rem(my - 1 + Dc, Dc)
    right = jax.lax.rem(my + 1, Dc)
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    # my bottom strip -> right neighbor's TOP slot [0, G)
    rdma_down = pltpu.make_async_remote_copy(
        src_ref=u_ref.at[pl.ds(B - G, G), :],
        dst_ref=out_ref.at[pl.ds(0, G), :],
        send_sem=send_sem.at[np.int32(0)],
        recv_sem=recv_sem.at[np.int32(0)],
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    # my top strip -> left neighbor's BOTTOM slot [G, 2G)
    rdma_up = pltpu.make_async_remote_copy(
        src_ref=u_ref.at[pl.ds(0, G), :],
        dst_ref=out_ref.at[pl.ds(G, G), :],
        send_sem=send_sem.at[np.int32(1)],
        recv_sem=recv_sem.at[np.int32(1)],
        device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )

    @pl.when(my < D - 1)
    def _():
        rdma_down.start()

    @pl.when(my > 0)
    def _():
        rdma_up.start()

    # (interior compute can overlap the strips in flight here; the
    # production integration — DistStructuredSolver(halo="rdma") — runs
    # this exchange per ghost-strip sweep and leaves the overlap
    # scheduling to XLA, cf. structured_dist._gs4_sweep_rdma_const)

    @pl.when(my < D - 1)
    def _():
        rdma_down.wait_send()
        rdma_up.wait_recv()      # bottom strip arrives from the right

    @pl.when(my > 0)
    def _():
        rdma_up.wait_send()
        rdma_down.wait_recv()    # top strip arrives from the left


def rdma_halo_exchange(u_loc: jnp.ndarray, G: int, axis: str = "x",
                       interpret=False) -> jnp.ndarray:
    """Exchange G-row boundary strips with line neighbors via RDMA.

    Call inside ``shard_map`` over a 1-D mesh axis ``axis`` with the slab
    row-partitioned. Returns a (2G, n) array: rows [0, G) = the upper
    neighbor's bottom strip (zeros on device 0), rows [G, 2G) = the lower
    neighbor's top strip (zeros on the last device).
    """
    B, n = u_loc.shape
    return pl.pallas_call(
        partial(_halo_kernel, G=G, axis=axis),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * G, n), u_loc.dtype,
                                       vma=frozenset({axis})),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
        interpret=interpret,
    )(u_loc)
