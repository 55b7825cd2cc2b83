"""Profiling / timing harness.

The reference has no tracing or profiling (SURVEY.md §5). TPU equivalents:

  * ``step_timer`` — wall-clock per-step timing with honest device sync
    (device transfer, not just block_until_ready — some PJRT transports
    complete block_until_ready before remote execution finishes).
  * ``trace`` — context manager around ``jax.profiler`` emitting an xplane
    trace directory viewable in TensorBoard/XProf.
  * ``speed_of_light`` — roofline estimate for the RBF phi step so measured
    throughput can be judged against hardware limits.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax
import numpy as np


def sync(tree):
    """Force completion of a device computation (transfer EVERY leaf).

    Transferring a single leaf is not enough: a passthrough leaf (e.g. a
    constant carried through the state pytree) can already be resolved while
    the leaf produced by the final dispatch is still executing remotely.
    One device_get over the whole pytree starts the copies together — one
    round-trip wave, not a blocking trip per leaf (the tunnel's latency
    would otherwise bias step_timer upward).
    """
    jax.device_get(jax.tree.leaves(tree))
    return tree


@dataclasses.dataclass
class StepTiming:
    mean_s: float
    p50_s: float
    p90_s: float
    steps: int

    @property
    def steps_per_s(self) -> float:
        return 1.0 / self.mean_s if self.mean_s else float("inf")


def step_timer(step_fn: Callable, state, *, steps: int = 20, warmup: int = 2,
               chunk: int = 5) -> StepTiming:
    """Time a state->state step function with chunked sync.

    Runs ``chunk`` dependent steps per measurement to amortize the host
    round-trip, syncing via device transfer after each chunk.
    """
    for _ in range(warmup):
        state = step_fn(state)
    sync(state)
    times = []
    done = 0
    while done < steps:
        t0 = time.perf_counter()
        for _ in range(chunk):
            state = step_fn(state)
        sync(state)
        times.append((time.perf_counter() - t0) / chunk)
        done += chunk
    arr = np.asarray(times)
    return StepTiming(float(arr.mean()), float(np.percentile(arr, 50)),
                      float(np.percentile(arr, 90)), done)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/svgd-trace"):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def speed_of_light(n: int, m: int, *, peak_matmul_flops: float = 9.8e13,
                   peak_vpu_ops: float = 4e11, hbm_gbps: float = 820.0):
    """Roofline estimate (seconds) for one RBF phi step at (n, m), f32.

    Defaults approximate a TPU v5e: ~98 f32 TFLOP/s MXU, ~0.8 TB/s HBM.
    The step's dominant terms: the n^2 quad/exp generation (VPU) and the
    n^2 x (2m+1) contraction (MXU); I/O is O(n m) and negligible.
    """
    matmul_flops = 2.0 * n * n * (2 * m + 1) + 2.0 * n * n * m  # K@B + gram
    vpu_ops = n * n * 6.0  # quad assembly + exp (amortized transcendental)
    t_mxu = matmul_flops / peak_matmul_flops
    t_vpu = vpu_ops / peak_vpu_ops
    t_mem = (n * m * 4.0 * 6.0) / (hbm_gbps * 1e9)
    return max(t_mxu + t_vpu, t_mem)
