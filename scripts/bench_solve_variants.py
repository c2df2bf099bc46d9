"""TPU microbench of StructuredSolver variants (precision / FMG / cycles
per refine) at the headline size. Times the device-only solve (one
dispatch + block), which excludes tunnel scalar-fetch round trips."""
import sys, os, time, threading
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _wd():
    time.sleep(540); print("watchdog: wedged", file=sys.stderr); os._exit(3)
threading.Thread(target=_wd, daemon=True).start()

import jax
from amg_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(str(__import__("pathlib").Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from amg_tpu.models import poisson
from amg_tpu.structured import StructuredSolver

SIDE = int(os.environ.get("SIDE", "1023"))
TOL = 1e-7
b2 = jnp.asarray(np.asarray(poisson.rhs(SIDE, dtype=jnp.float64)
                            ).reshape(SIDE, SIDE))
for prec, fmg, cpr in (("df32", True, 1), ("df32", True, 2),
                       ("f64", True, 2), ("df32", False, 2)):
    t0 = time.perf_counter()
    s = StructuredSolver(SIDE, precision=prec, fmg=fmg,
                         cycles_per_refine=cpr)
    s.warmup()
    print(f"{prec} fmg={fmg} cpr={cpr}: setup+compile "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        u, stats = s.solve_ir_device(b2, tolerance=TOL)
        jax.block_until_ready(u)
        ts.append(time.perf_counter() - t0)
    err_v, it_v = np.asarray(stats)
    print(f"  device-solve best-of-7 {min(ts)*1000:.2f} ms, "
          f"refines={int(it_v)}, rss={err_v:.3e}", flush=True)
