"""Distributed structured multigrid: row-partitioned V-cycles over a device
mesh with halo exchange and coarse-level agglomeration.

This supplies the parallelism layer the reference lacks entirely (SURVEY.md
§2/§5): the 2-D grid is partitioned into contiguous row slabs (the j / x
direction — contiguous dof blocks under the reference's lexicographic
ordering, grid.hpp:88-98) across a 1-D ``jax.sharding.Mesh`` axis. Every
level op (four-color GS sweep, residual, restriction, prolongation) runs
inside one ``shard_map`` program and communicates only single-row halos with
ring neighbors via ``lax.ppermute`` — the TPU-native equivalent of NCCL
point-to-point halo exchange, riding ICI.

As levels shrink, rows-per-device halves; once a level's slab would drop
below 2 rows the hierarchy switches to *agglomerated* (replicated) levels:
the coarse rhs is ``all_gather``-ed and the remaining sub-hierarchy
(including the dense coarsest LU solve, multigrid.hpp:240-243) is computed
redundantly on every device — the AMG analog of gathering shards onto one
host (SURVEY.md §2 "coarse-level agglomeration").

Layout invariants (set up by ``build_dist_hierarchy``):
  * sharded level l has padded row count ``n_pad_l = D * B_l`` with ``B_l``
    even, so local row parity equals global parity and the four-color
    sub-lattices align across devices without index arithmetic;
  * ``B_{l+1} = B_l / 2`` so a device's coarse slab depends only on its own
    fine slab plus one halo row (restriction) / one coarse halo row
    (prolongation);
  * padded rows carry identity diagonal and zero rhs, so they stay zero
    through every sweep.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from amg_tpu.models import poisson
from amg_tpu.multigrid import SolveResult
from amg_tpu.ops.transfer import linear_interp_1d
from amg_tpu.sparse.stencil import Stencil2D, W2D
from amg_tpu.structured import StencilHierarchy, max_levels_for_side

AXIS = "x"


# ---------------------------------------------------------------------------
# Local (per-shard) kernels. All take the device's (B, n) slab.


def _halo(u_loc, D: int):
    """Exchange boundary rows with ring neighbors: returns (top, bot) halo
    rows — zeros at the outer edges (Dirichlet-consistent)."""
    if D == 1:
        z = jnp.zeros_like(u_loc[:1])
        return z, z
    top = lax.ppermute(u_loc[-1:], AXIS, [(i, i + 1) for i in range(D - 1)])
    bot = lax.ppermute(u_loc[:1], AXIS, [(i + 1, i) for i in range(D - 1)])
    return top, bot


def _padded(u_loc, D: int):
    """(B, n) slab -> (B+2, n+2) with neighbor halos and zero LR columns."""
    top, bot = _halo(u_loc, D)
    return jnp.pad(jnp.concatenate([top, u_loc, bot], axis=0),
                   ((0, 0), (1, 1)))


def _matvec_local(c_loc, u_loc, D: int):
    """9-point SpMV on the slab (c_loc: (3,3,B,n))."""
    B, n = u_loc.shape
    up = _padded(u_loc, D)
    out = jnp.zeros_like(u_loc)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            out = out + c_loc[dj + 1, di + 1] * lax.slice(
                up, (1 + dj, 1 + di), (1 + dj + B, 1 + di + n))
    return out


_COLORS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _gs4_sweep_local(c_loc, u_loc, b_loc, omega: float, symmetric: bool,
                     D: int):
    """Sharded four-color GS sweep as full-width masked updates (the
    lane-aligned TPU form; see sparse/stencil.py gs4_sweep_masked). Local
    parity equals global parity because block sizes are even, so the color
    masks are compile-time iota patterns. One halo exchange per color step
    keeps neighbor slabs current."""
    B, n = u_loc.shape
    row_par = jax.lax.broadcasted_iota(jnp.int32, (B, n), 0) % 2
    col_par = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1) % 2
    inv_diag = 1.0 / c_loc[1, 1]
    order = list(_COLORS)
    if symmetric:
        order = order + order[::-1]
    for pj, pi in order:
        r = b_loc - _matvec_local(c_loc, u_loc, D)
        mask = ((row_par == pj) & (col_par == pi)).astype(u_loc.dtype)
        u_loc = u_loc + (omega * mask) * (r * inv_diag)
    return u_loc


def _restrict_local(r_loc, Bc: int, nc: int, nc_real: int, D: int):
    """Full-weighting restriction of the slab: coarse slab (Bc, nc_real)
    padded-masked to rows beyond the real coarse grid."""
    B, n = r_loc.shape
    _, bot = _halo(r_loc, D)
    rext = jnp.concatenate([r_loc, bot], axis=0)  # (B+1, n)
    w = jnp.asarray(W2D, dtype=r_loc.dtype)
    out = jnp.zeros((Bc, nc), dtype=r_loc.dtype)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            out = out + w[dj + 1, di + 1] * lax.slice(
                rext, (1 + dj, 1 + di),
                (1 + dj + 2 * Bc - 1, 1 + di + 2 * nc - 1), (2, 2))
    # zero the padded coarse rows (global row >= nc_real)
    dev = lax.axis_index(AXIS)
    grow = dev * Bc + jnp.arange(Bc)
    return jnp.where((grow < nc_real)[:, None], out, 0)


def _prolong_local(uc_loc, B: int, n: int, D: int):
    """Bilinear prolongation onto the fine slab from the coarse slab +
    top coarse halo row."""
    Bc, nc = uc_loc.shape
    topc, _ = _halo(uc_loc, D)
    z = jnp.zeros((B + 2, n + 2), dtype=uc_loc.dtype)
    z = z.at[0, 2:2 * nc + 1:2].set(topc[0])
    z = z.at[2:2 * Bc + 1:2, 2:2 * nc + 1:2].set(uc_loc)
    return _prolong_from_z(z, B, n, uc_loc.dtype)


def _prolong_from_z(z, B: int, n: int, dtype):
    w = jnp.asarray(W2D, dtype=dtype)
    out = jnp.zeros((B, n), dtype=dtype)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            out = out + w[dj + 1, di + 1] * lax.slice(
                z, (1 + dj, 1 + di), (1 + dj + B, 1 + di + n))
    return out


def _prolong_from_replicated(uc_full, B: int, n: int, Bc: int, D: int):
    """Prolongate a replicated coarse field onto this device's fine slab:
    slice the local coarse block plus its top halo row out of the full
    field, then apply the bilinear kernel."""
    nc = uc_full.shape[1]
    n_pad_c = D * Bc
    dev = lax.axis_index(AXIS)
    # pad: 1 zero row on top (halo of device 0), zeros to n_pad_c below
    ucp = jnp.pad(uc_full, ((1, n_pad_c - uc_full.shape[0]), (0, 0)))
    # rows [dev*Bc - 1, dev*Bc + Bc) of the coarse grid == ucp rows
    # [dev*Bc, dev*Bc + Bc + 1)
    start = (dev * Bc).astype(jnp.int32)
    block = lax.dynamic_slice(ucp, (start, jnp.int32(0)), (Bc + 1, nc))
    z = jnp.zeros((B + 2, n + 2), dtype=uc_full.dtype)
    z = z.at[0, 2:2 * nc + 1:2].set(block[0])
    z = z.at[2:2 * Bc + 1:2, 2:2 * nc + 1:2].set(block[1:])
    return _prolong_from_z(z, B, n, uc_full.dtype)


# ---------------------------------------------------------------------------
# Hierarchy construction


@dataclasses.dataclass(frozen=True)
class DistConfig:
    n_devices: int
    sides: tuple            # grid side per level (all levels)
    blocks: tuple           # B_l rows/device for sharded levels
    n_sharded: int          # number of sharded levels
    pre_sweeps: int = 1
    post_sweeps: int = 1
    omega: float = 1.0
    symmetric: bool = True


def plan_distribution(side: int, n_levels: int, n_devices: int,
                      min_rows: int = 2):
    """Choose how many levels stay sharded and the (even, halving) per-device
    block sizes. Returns (sides, blocks, n_sharded)."""
    sides = [side]
    for _ in range(n_levels - 1):
        sides.append((sides[-1] - 1) // 2)
    # Most sharded levels possible: B_l = B_0/2^l must stay >= min_rows and
    # at least the coarsest level must be replicated.
    best = None
    for Ls in range(n_levels - 1, 0, -1):
        B0 = -(-side // n_devices)  # ceil
        mult = 1 << Ls
        B0 = -(-B0 // mult) * mult  # round up to multiple of 2^Ls
        if B0 // (1 << (Ls - 1)) >= min_rows:
            best = (Ls, B0)
            break
    if best is None:
        return tuple(sides), (), 0
    Ls, B0 = best
    blocks = tuple(B0 >> l for l in range(Ls))
    return tuple(sides), blocks, Ls


def build_dist_hierarchy(side: int, n_levels: int | None = None,
                         n_devices: int | None = None, dtype=jnp.float32,
                         A_fine=None):
    """Host-side setup: padded sharded coefficient planes + replicated
    coarse sub-hierarchy (Galerkin RAP chain as in multigrid.hpp:211-243)."""
    import scipy.sparse as sp
    import jax.scipy.linalg as jsl

    if n_devices is None:
        n_devices = len(jax.devices())
    if n_levels is None:
        n_levels = max_levels_for_side(side)
    sides, blocks, Ls = plan_distribution(side, n_levels, n_devices)
    if A_fine is None:
        A_fine = poisson.laplacian_scipy(side)

    mats = [A_fine.tocsr()]
    for l in range(n_levels - 1):
        n = sides[l]
        nc = sides[l + 1]
        P1 = linear_interp_1d(n, nc)
        P2 = sp.kron(P1, P1).tocsr()
        mats.append((P2.T @ (mats[-1] @ P2)).tocsr())

    # Sharded levels: pad rows to D*B_l, identity diagonal on padding.
    sharded_coeffs = []
    for l in range(Ls):
        n = sides[l]
        S = Stencil2D.from_scipy(mats[l], n, dtype=dtype)
        c = np.asarray(S.c)
        n_pad = n_devices * blocks[l]
        cp = np.zeros((3, 3, n_pad, n), dtype=c.dtype)
        cp[:, :, :n, :] = c
        cp[1, 1, n:, :] = 1.0  # identity rows on padding
        sharded_coeffs.append(jnp.asarray(cp))

    # Replicated coarse sub-hierarchy (levels Ls..n_levels-1).
    from amg_tpu.ops.transfer import linear_interp_1d as _li1
    from amg_tpu.sparse.stencil import color_masks as _cm

    repl_levels = tuple(Stencil2D.from_scipy(mats[l], sides[l], dtype=dtype)
                        for l in range(Ls, n_levels))
    coarse_dense = jnp.asarray(mats[-1].toarray(), dtype=dtype)
    lu, piv = jsl.lu_factor(coarse_dense)
    sub_sides = tuple(sides[Ls:])
    sub_P1s = tuple(jnp.asarray(_li1(sub_sides[i], sub_sides[i + 1]
                                     ).toarray(), dtype=dtype)
                    for i in range(len(sub_sides) - 1))
    sub_masks = tuple(_cm(s, dtype) for s in sub_sides)
    sub_hier = StencilHierarchy(levels=repl_levels, coarse_lu=lu,
                                coarse_piv=piv, P1s=sub_P1s,
                                masks=sub_masks,
                                padded=(None,) * len(repl_levels),
                                sides=sub_sides, smoother="masked")
    cfg = DistConfig(n_devices=n_devices, sides=tuple(sides),
                     blocks=tuple(blocks), n_sharded=Ls)
    return cfg, tuple(sharded_coeffs), sub_hier


# ---------------------------------------------------------------------------
# The shard_map V-cycle


def _vcycle_local(cfg: DistConfig, sharded_coeffs, sub_hier: StencilHierarchy,
                  u_loc, b_loc):
    """Per-device body of one V-cycle. u_loc/b_loc: (B_0, n_0) slabs."""
    from amg_tpu.structured import vcycle_stencil

    D = cfg.n_devices
    Ls = cfg.n_sharded
    us = [None] * Ls
    bs = [None] * Ls
    us[0], bs[0] = u_loc, b_loc
    # sharded down-leg (multigrid.hpp:265-284 leg order)
    for l in range(Ls):
        c = sharded_coeffs[l]
        for _ in range(cfg.pre_sweeps):
            us[l] = _gs4_sweep_local(c, us[l], bs[l], cfg.omega,
                                     cfg.symmetric, D)
        r = bs[l] - _matvec_local(c, us[l], D)
        nc_real = cfg.sides[l + 1]
        if l < Ls - 1:
            Bc = cfg.blocks[l + 1]
            bs_next = _restrict_local(r, Bc, nc_real, nc_real, D)
            bs[l + 1] = bs_next
            us[l + 1] = jnp.zeros_like(bs_next)
        else:
            Bc = cfg.blocks[l] // 2
            coarse_loc = _restrict_local(r, Bc, nc_real, nc_real, D)
            full = lax.all_gather(coarse_loc, AXIS, tiled=True)
            b_repl = full[:nc_real]
    # replicated (agglomerated) sub-hierarchy: one V-cycle pass from zero
    u_repl = vcycle_stencil(sub_hier, jnp.zeros_like(b_repl), b_repl,
                            cfg.pre_sweeps, cfg.post_sweeps, cfg.omega,
                            cfg.symmetric)
    # sharded up-leg (multigrid.hpp:291-302)
    for l in range(Ls - 1, -1, -1):
        B = cfg.blocks[l]
        n = cfg.sides[l]
        if l == Ls - 1:
            us[l] = us[l] + _prolong_from_replicated(u_repl, B, n, B // 2, D)
        else:
            us[l] = us[l] + _prolong_local(us[l + 1], B, n, D)
        c = sharded_coeffs[l]
        for _ in range(cfg.post_sweeps):
            us[l] = _gs4_sweep_local(c, us[l], bs[l], cfg.omega,
                                     cfg.symmetric, D)
    return us[0]


class DistStructuredSolver:
    """Multi-device structured Poisson solver: the flagship scaling path.

    Builds the mesh, shards the finest fields as (n_pad, n) row slabs, and
    jits one shard_map program for the full V-cycle; ``solve`` runs the
    reference's outer stopping loop (multigrid.hpp:311-337) with a psum'd
    rss (the cross-shard reduction named in SURVEY.md §3.2).
    """

    def __init__(self, side: int, n_levels: int | None = None,
                 n_devices: int | None = None, dtype=jnp.float32,
                 pre_sweeps: int = 1, post_sweeps: int = 1,
                 omega: float = 1.0, symmetric: bool = True, A_fine=None):
        cfg, coeffs, sub_hier = build_dist_hierarchy(
            side, n_levels, n_devices, dtype, A_fine)
        cfg = dataclasses.replace(cfg, pre_sweeps=pre_sweeps,
                                  post_sweeps=post_sweeps, omega=omega,
                                  symmetric=symmetric)
        self.cfg = cfg
        self.dtype = dtype
        self.side = side
        D = cfg.n_devices
        self.mesh = jax.make_mesh((D,), (AXIS,),
                                  devices=jax.devices()[:D])
        self.coeffs = coeffs
        self.sub_hier = sub_hier
        self.n_pad = D * cfg.blocks[0] if cfg.n_sharded else side

        spec_field = P(AXIS, None)
        spec_coeff = P(None, None, AXIS, None)

        def vc(coeffs_, sub_hier_, u, b):
            return _vcycle_local(cfg, coeffs_, sub_hier_, u, b)

        self._vcycle = jax.jit(jax.shard_map(
            vc, mesh=self.mesh,
            in_specs=(tuple(spec_coeff for _ in coeffs), P(), spec_field,
                      spec_field),
            out_specs=spec_field))

        def rss_fn(c0, u, b):
            r = b - _matvec_local(c0, u, cfg.n_devices)
            return lax.psum(jnp.sum(r * r), AXIS)

        self._rss = jax.jit(jax.shard_map(
            rss_fn, mesh=self.mesh,
            in_specs=(spec_coeff, spec_field, spec_field), out_specs=P()))

    def pad_field(self, f2: jnp.ndarray) -> jnp.ndarray:
        """(side, side) -> sharded (n_pad, side)."""
        out = jnp.zeros((self.n_pad, self.side), dtype=self.dtype)
        out = out.at[:self.side].set(f2.astype(self.dtype))
        return jax.device_put(
            out, jax.sharding.NamedSharding(self.mesh, P(AXIS, None)))

    def unpad(self, f2: jnp.ndarray) -> jnp.ndarray:
        # Replicate before slicing: a non-slab-aligned slice of a sharded
        # array would otherwise need an ambiguous-sharding gather.
        full = jax.device_put(
            f2, jax.sharding.NamedSharding(self.mesh, P()))
        return full[:self.side]

    def vcycle(self, u_pad, b_pad):
        return self._vcycle(self.coeffs, self.sub_hier, u_pad, b_pad)

    def rss(self, u_pad, b_pad) -> float:
        return float(self._rss(self.coeffs[0], u_pad, b_pad))

    def solve(self, b2, tolerance=1e-7, compute_error_every_n_iters=5,
              n_iters=100) -> SolveResult:
        b_pad = self.pad_field(b2)
        u = jnp.zeros_like(b_pad)
        every = compute_error_every_n_iters
        it, error = 0, 100.0
        history = []
        while it < n_iters and error > tolerance:
            k = (min(every - (it % every), n_iters - it) if every
                 else n_iters - it)
            for _ in range(k):
                u = self.vcycle(u, b_pad)
            it += k
            if every and it % every == 0:
                error = self.rss(u, b_pad)
                history.append((it, error))
        return SolveResult(u=self.unpad(u), iterations=it, error=error,
                           converged=error <= tolerance, history=history)
