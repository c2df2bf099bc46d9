"""Persistent-compilation-cache setup that actually HITS across processes.

Root cause of the cross-process cache misses (found r5, closing VERDICT
r4 #2 "find why the persistent compilation cache misses"): JAX cache keys
hash the canonicalized StableHLO module with all location/debug metadata
stripped — but a Pallas kernel lowers to a Mosaic custom call whose
backend payload is an OPAQUE serialized MLIR module. That inner module
carries its own location table, and with JAX's default
``jax_include_full_tracebacks_in_locations=True`` every location holds
the FULL user call stack — including the entry script's filename and
line numbers. The outer canonicalization cannot see into the payload, so
any change to the call path (running from a differently named script, a
``python -c`` one-liner, or merely editing an unrelated line above the
call site) produces different payload bytes and therefore a different
cache key. Measured: byte-identical solver programs launched from
``a.py`` vs ``b.py`` (same contents) differ only inside the Mosaic
payload and never share a cache entry; with full tracebacks disabled the
canonical bytes and key are identical across entry scripts.

``enable_persistent_cache`` therefore pins
``jax_include_full_tracebacks_in_locations=False`` (locations keep the
primary frame — the kernel's own source line — which only changes when
the library source itself changes, exactly the invalidation one wants)
alongside the standard cache knobs. Call it before building any solver
program; it is idempotent.
"""

from __future__ import annotations

import jax

DEFAULT_MIN_COMPILE_SECS = 1.0


def enable_persistent_cache(cache_dir: str,
                            min_compile_secs: float = DEFAULT_MIN_COMPILE_SECS,
                            stable_keys: bool = True) -> None:
    """Enable the on-disk compilation cache with cross-process-stable keys.

    Args:
      cache_dir: directory for the cache (created on first write).
      min_compile_secs: only persist programs that took at least this long
        to compile.
      stable_keys: disable full call-stack tracebacks in MLIR locations so
        Pallas/Mosaic payload bytes — and hence cache keys — do not depend
        on the caller's filename/line numbers (see module docstring). Set
        False to keep JAX's default rich locations (better error
        tracebacks, but the cache will effectively never hit across
        different entry points).
    """
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    if stable_keys:
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
