"""Measure bf16 MXU operands vs f32 in the Mosaic phi sweeps (real TPU).

VERDICT r1 asked for a bf16-inputs / f32-accumulation experiment. The fused
sweep at m=2 is VPU-bound on the per-pair exp, so bf16 should be ~neutral
there; at m=50 (the BLR shape) the cross and k.B contractions carry real MXU
work and bf16 halves operand width. This script times the production kernels
(ops/pallas_phi.py) in both modes and prints one JSON line per (shape, mode),
plus the bf16-vs-f32 max relative phi error.

Run on the real chip:  timeout 900 python scripts/bench_bf16.py

STATUS (round 3): outcome recorded in docs/perf.md — with the diff-form
sq the bf16 opt-in only changes the contraction dots and measured no win
at m=2; kept for large-m exploration.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas, phi_rbf_pallas


def bench_fused(n, m, dot_dtype, iters=50):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gamma = jnp.float32(np.log(n) / (2.0 * m))
    thr = jnp.asarray(np.linspace(0.5, 4.0 * m, 4), jnp.float32)

    phi, counts = phi_rbf_fused_pallas(coords, scores, gamma, thr,
                                       dot_dtype=dot_dtype)
    np.asarray(phi)  # host sync (block_until_ready lies on this transport)
    t0 = time.perf_counter()
    for _ in range(iters):
        phi, counts = phi_rbf_fused_pallas(coords, scores, gamma, thr,
                                           dot_dtype=dot_dtype)
    np.asarray(phi), np.asarray(counts)
    dt = (time.perf_counter() - t0) / iters
    return np.asarray(phi), dt


def bench_plain(n, m, dot_dtype, iters=50):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    p = jnp.asarray(np.log(n) / (2.0 * m) * np.eye(m), jnp.float32)

    phi = phi_rbf_pallas(coords, scores, p, dot_dtype=dot_dtype)
    np.asarray(phi)
    t0 = time.perf_counter()
    for _ in range(iters):
        phi = phi_rbf_pallas(coords, scores, p, dot_dtype=dot_dtype)
    np.asarray(phi)
    dt = (time.perf_counter() - t0) / iters
    return np.asarray(phi), dt


def main():
    for label, fn, n, m in (
        ("fused_mvn", bench_fused, 10240, 2),
        ("fused_d50", bench_fused, 10240, 50),
        ("phi_d50", bench_plain, 10240, 50),
    ):
        outs = {}
        for dd in ("float32", "bfloat16"):
            phi, dt = fn(n, m, dd)
            outs[dd] = phi
            print(json.dumps({
                "shape": label, "n": n, "m": m, "dot_dtype": dd,
                "ms_per_sweep": round(1e3 * dt, 4),
                "pairs_per_s_G": round(n * n / dt / 1e9, 2),
            }), flush=True)
        rel = np.abs(outs["bfloat16"] - outs["float32"]).max() / (
            np.abs(outs["float32"]).max() + 1e-30
        )
        print(json.dumps({"shape": label, "bf16_max_rel_err": float(rel)}),
              flush=True)


if __name__ == "__main__":
    main()
