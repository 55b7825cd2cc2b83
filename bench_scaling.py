"""Weak-scaling efficiency harness for the sharded SVGD step.

BASELINE.md scaling target: >=80% efficiency in particle-updates/s from 1
to N workers. Real multi-chip hardware is not available in this image, so
this harness runs on the simulated host-platform device mesh
(xla_force_host_platform_device_count): collectives execute for real
(as memcpys), giving an upper bound on orchestration overhead and a
regression guard on the collective schedule. On a real pod slice the same
script runs unchanged with JAX_PLATFORMS unset.

Weak scaling: per-device particle count is fixed, so each device's local
work O((n/D) * n) grows linearly with D. The scale-invariant metric is
pair-interactions/s; the printed vs_baseline is
pair_rate(D) / (D * pair_rate(1)) — i.e. pair-interactions/s PER DEVICE
relative to one device.

Prints one JSON line per device count.
"""

import json
import os
import sys
import time
from pathlib import Path

N_PER_DEVICE = int(os.environ.get("BENCH_SCALING_N_PER_DEVICE", 1024))
ITERS = int(os.environ.get("BENCH_SCALING_ITERS", 10))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402

# Platform must be chosen BEFORE any device query — the first query pins the
# backend list for the process. Default to the simulated CPU mesh; set
# BENCH_SCALING_REAL=1 on an actual multi-chip slice.
if os.environ.get("BENCH_SCALING_REAL") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import svgdcpp_tpu as sv  # noqa: E402
from svgdcpp_tpu.parallel import (  # noqa: E402
    ShardedSVGD,
    ShardedSVGDConfig,
    make_particle_mesh,
)


def measure(n_devices: int, phi_mode: str = "gather",
            n_global=None) -> float:
    """updates/s on an n_devices mesh. ``n_global=None`` = weak scaling
    (N_PER_DEVICE rows per device); a fixed value = strong scaling."""
    devices = jax.devices()[:n_devices]
    mesh = make_particle_mesh(devices)
    from svgdcpp_tpu.utils.workloads import flagship_mvn

    n = N_PER_DEVICE * n_devices if n_global is None else int(n_global)
    dim = 2
    mean, cov, x0 = flagship_mvn(n, dtype=np.float32)
    model = sv.MultivariateNormal(mean, cov)
    kernel = None
    if phi_mode == "fused":
        config = ShardedSVGDConfig(
            scale_method=sv.ScaleMethod.MEDIAN, fused_phi=True, row_tile=256,
        )
    elif phi_mode == "terms":
        # Composed-kernel weak scaling on the algebraic closed-form path
        # (RBF(median) + RBF(const) — the hier-bench kernel shape).
        kernel = sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.MEDIAN, model
        ) + sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.CONSTANT,
            constant_scale=0.1 * np.eye(dim, dtype=np.float32),
        )
        config = ShardedSVGDConfig(
            median_bins=16, median_passes=3, row_tile=256,
            kernel_phi="rbf_terms",
        )
    else:
        config = ShardedSVGDConfig(
            scale_method=sv.ScaleMethod.MEDIAN, phi_mode=phi_mode,
            median_bins=16, median_passes=3, row_tile=256,
        )
    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh,
        config=config,
        kernel=kernel,
    )
    state = sharded.init_state(x0)
    out, _ = sharded.run_fn(state, ITERS)
    np.asarray(out["coords"])  # sync
    best = float("inf")
    for _ in range(3):  # best-of-3 against host scheduling noise
        t0 = time.perf_counter()
        out, _ = sharded.run_fn(state, ITERS)
        np.asarray(out["coords"])
        best = min(best, time.perf_counter() - t0)
    return n * ITERS / best  # updates/s


def main():
    args = [a for a in sys.argv[1:] if a != "--strong"]
    strong = "--strong" in sys.argv
    phi_mode = args[0] if args else "gather"
    max_d = len(jax.devices())
    if strong:
        # Strong scaling: FIXED global n split over D devices — the
        # latency axis for real slices (per-device work shrinks as n/D * n,
        # so ideal rate is D x the 1-device rate).
        n_fixed = N_PER_DEVICE * max_d
        rates = {}
        for d in [1, 2, 4, 8]:
            if d > max_d:
                break
            rates[d] = measure(d, phi_mode, n_global=n_fixed)
        base = rates[1]
        for d, rate in rates.items():
            print(json.dumps({
                "metric": f"strong-scaling updates/s ({phi_mode}, {d} devices, n={n_fixed})",
                "value": round(rate, 1),
                "unit": "updates/s",
                "vs_baseline": round(rate / (d * base), 3),
            }))
        return
    rates = {}
    for d in [1, 2, 4, 8]:
        if d > max_d:
            break
        rates[d] = measure(d, phi_mode)
    # In weak scaling the per-device work grows with the GLOBAL particle
    # count (each local row interacts with all n columns), so the
    # scale-invariant rate is pair-interactions/s: updates/s * n_global.
    # Efficiency = pairrate(D) / (D * pairrate(1)) — on real hardware;
    # on the simulated mesh all "devices" share the host's physical cores,
    # so treat these numbers as collective-overhead regression data only.
    pair_1 = rates[1] * (N_PER_DEVICE * 1)
    cores = os.cpu_count() or 1
    simulated = os.environ.get("BENCH_SCALING_REAL") != "1"
    for d, rate in rates.items():
        pair_rate = rate * (N_PER_DEVICE * d)
        eff = pair_rate / (d * pair_1)
        line = {
            "metric": f"weak-scaling pair-interactions/s ({phi_mode}, {d} devices, {N_PER_DEVICE}/dev)",
            "value": round(pair_rate, 1),
            "unit": "pair-interactions/s",
            "vs_baseline": round(eff, 3),
        }
        if simulated:
            # On the simulated mesh D "devices" time-slice the host's
            # physical cores, so perfect collective scaling still caps
            # per-device efficiency at min(1, cores/D): report efficiency
            # against that ceiling (the ICI-overhead proxy) too.
            ceiling = min(1.0, cores / d)
            line["vs_host_ceiling"] = round(eff / ceiling, 3)
        print(json.dumps(line))


if __name__ == "__main__":
    main()
