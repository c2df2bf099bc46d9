import time, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from amg_tpu.models import poisson
from amg_tpu.structured import StructuredSolver

side = 4095
t0=time.perf_counter()
b2 = jnp.asarray(np.asarray(poisson.rhs(side, dtype=jnp.float64)).reshape(side, side))
print(f"rhs {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
solver = StructuredSolver(side)
print(f"setup {time.perf_counter()-t0:.1f}s levels={list(solver.hier.sides)}", flush=True)
t0=time.perf_counter()
solver.warmup()
print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)
res = solver.solve_ir_fused(b2, tolerance=1e-7)
print(f"first solve: iters={res.iterations} rss={res.error:.3e} conv={res.converged}", flush=True)
times=[]
for _ in range(3):
    t0=time.perf_counter()
    u, stats = solver.solve_ir_device(b2, tolerance=1e-7)
    jax.block_until_ready(u)
    times.append(time.perf_counter()-t0)
err_v, it_v = np.asarray(stats)
print(f"4095^2 solve best-of-3: {min(times):.4f}s ({int(it_v)*solver.cycles_per_refine} cycles, rss={err_v:.3e})", flush=True)
