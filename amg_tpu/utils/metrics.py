"""Convergence metrics.

The reference's convergence criterion is the residual *sum of squares*
(not a norm, not relative): ``rss = sum_i (b_i - (A u)_i)^2``
(reference: include/amg/common.hpp:17-27). Every stopping test in the
reference compares this quantity against an absolute tolerance, so we keep
the exact same semantics for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def rss_from_residual(r: jnp.ndarray) -> jnp.ndarray:
    """Residual sum of squares given an explicit residual vector ``r = b - A u``."""
    return jnp.sum(r * r)


def rss(A, u: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Residual sum of squares ``sum((b - A u)**2)``.

    ``A`` is any operator object exposing ``matvec`` (ELL matrix, stencil
    operator, ...). Mirrors AMG::rss (include/amg/common.hpp:17-27).
    """
    return rss_from_residual(b - A.matvec(u))
