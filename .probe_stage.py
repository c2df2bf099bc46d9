import time, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
t0=time.perf_counter(); jax.block_until_ready(jnp.ones((8,128))*2)
print(f"tiny op {time.perf_counter()-t0:.1f}s", flush=True)
from amg_tpu.models import poisson
t0=time.perf_counter()
b = poisson.rhs(4095, dtype=jnp.float64); jax.block_until_ready(b)
print(f"rhs(4095) f64 on device {time.perf_counter()-t0:.1f}s dev={b.devices()}", flush=True)
t0=time.perf_counter()
h = np.asarray(b[:1024*1024])
print(f"pull 8MB f64 {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
h = np.asarray(b)
print(f"pull full 134MB f64 {time.perf_counter()-t0:.1f}s", flush=True)
