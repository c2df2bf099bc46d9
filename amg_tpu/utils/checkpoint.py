"""Hierarchy serialization (checkpoint/resume).

ABSENT in the reference (SURVEY.md §5) — its solver state lives in in-memory
Eigen vectors. Here the expensive setup product (level matrices, transfer
operators, colorings, coarse factorization) can be saved once and reloaded,
skipping host-side SpGEMM on restart. Plain .npz keeps it dependency-free;
solution-vector snapshots ride along for resumable outer iterations.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_stencil_hierarchy(path: str, hier) -> None:
    from amg_tpu.structured import StencilHierarchy

    assert isinstance(hier, StencilHierarchy)
    arrs = {"sides": np.asarray(hier.sides),
            "coarse_lu": np.asarray(hier.coarse_lu),
            "coarse_piv": np.asarray(hier.coarse_piv),
            "smoother": np.asarray(hier.smoother)}
    for i, lev in enumerate(hier.levels):
        arrs[f"c{i}"] = np.asarray(lev.c)
    np.savez_compressed(path, **arrs)


def load_stencil_hierarchy(path: str, dtype=None):
    from amg_tpu.ops.transfer import linear_interp_1d
    from amg_tpu.sparse.stencil import Stencil2D, color_masks
    from amg_tpu.structured import FUSED_MIN_SIDE, StencilHierarchy

    z = np.load(path)
    sides = tuple(int(s) for s in z["sides"])
    levels = []
    for i, side in enumerate(sides):
        c = z[f"c{i}"]
        if dtype is not None:
            c = c.astype(dtype)
        levels.append(Stencil2D.from_planes(jnp.asarray(c), side))
    dt = levels[0].c.dtype
    smoother = str(z["smoother"]) if "smoother" in z else "masked"
    P1s = tuple(jnp.asarray(linear_interp_1d(sides[l], sides[l + 1]
                                             ).toarray(), dtype=dt)
                for l in range(len(sides) - 1))
    masks = tuple(color_masks(s, dt) for s in sides)
    padded = [None] * len(sides)
    if smoother == "fused":
        from amg_tpu.ops.pallas.rbgs import PaddedStencil

        padded = [PaddedStencil.prepare(lev, dtype=dt)
                  if lev.side >= FUSED_MIN_SIDE else None
                  for lev in levels]
    return StencilHierarchy(levels=tuple(levels),
                            coarse_lu=jnp.asarray(z["coarse_lu"]),
                            coarse_piv=jnp.asarray(z["coarse_piv"]),
                            P1s=P1s, masks=masks, padded=tuple(padded),
                            sides=sides, smoother=smoother)


def save_solution(path: str, u, iteration: int, error: float) -> None:
    np.savez_compressed(path, u=np.asarray(u), iteration=iteration,
                        error=error)


def load_solution(path: str):
    z = np.load(path)
    return jnp.asarray(z["u"]), int(z["iteration"]), float(z["error"])
