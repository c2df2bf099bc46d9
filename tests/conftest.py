"""Test configuration: CPU backend with 8 virtual devices, f64 numerics.

The reference's tolerances are all 1e-9-scale in double (SURVEY.md §7), so
tests run in f64. Multi-chip sharding tests use the virtual-device CPU mesh
(the multi-host testing pattern the reference lacks; SURVEY.md §4).
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS to the real TPU
# tunnel; tests must run on the virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
# The ambient sitecustomize registers the TPU-tunnel ("axon") PJRT plugin in
# every interpreter and pins jax_platforms to it; the env var alone is not
# enough once that registration ran, so force the config too.
jax.config.update("jax_platforms", "cpu")
