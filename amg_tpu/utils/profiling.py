"""Profiling utilities: nnz/s counters, roofline estimates, trace capture.

The reference's profiling workflow is external (valgrind callgrind +
KCachegrind, README.md:52-78, with the committed
callgrind.out.slow_smoother artifact). The TPU-native equivalents
(SURVEY.md §5): ``jax.profiler`` traces plus per-kernel throughput counters
compared against a per-chip speed-of-light estimate.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


# Conservative per-chip peaks (f32) used for roofline context. Values for
# TPU v5e; override via Roofline(...) for other chips.
@dataclasses.dataclass(frozen=True)
class Roofline:
    hbm_gbps: float = 819.0      # HBM bandwidth
    f32_tflops: float = 98.0     # peak dense f32 (MXU)
    vpu_tflops: float = 4.0      # rough elementwise f32 throughput

    def stencil_sweep_sol_s(self, n_points: int, n_planes: int = 9,
                            bytes_per: int = 4, passes: float = 12.0):
        """Speed-of-light seconds for one fused stencil sweep: `passes`
        full-field HBM transfers (9 coeff planes + b + u read, u write)."""
        return passes * n_points * bytes_per / (self.hbm_gbps * 1e9)


@dataclasses.dataclass
class KernelStats:
    name: str
    seconds: float
    nnz: int
    sweeps: int = 1

    @property
    def nnz_per_s(self) -> float:
        return self.nnz * self.sweeps / self.seconds

    def summary(self, roofline: Roofline | None = None,
                n_points: int | None = None) -> str:
        s = (f"{self.name}: {self.seconds*1e3:.3f} ms, "
             f"{self.nnz_per_s/1e9:.2f} Gnnz/s")
        if roofline and n_points:
            sol = roofline.stencil_sweep_sol_s(n_points)
            s += f" ({100*sol/ (self.seconds/self.sweeps):.0f}% of SoL)"
        return s


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Wall-clock a jitted callable (blocks on the result)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/amg_tpu_trace"):
    """Capture a jax.profiler trace around a block (open with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
