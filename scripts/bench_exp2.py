"""Measure exp vs exp2 in the fused Mosaic sweep (real TPU).

The fused phi+median kernel is VPU-bound on the per-pair exp (docs/perf.md);
if Mosaic lowers jnp.exp to a precise polynomial but jnp.exp2 to the
hardware pow2 unit (the flash-attention exp2 trick), rewriting
exp(-gamma*sq) as exp2(-gamma*log2(e)*sq) buys the difference for one
scalar pre-multiply. This script times both flavors of the φ̂ contraction
tile body at the flagship shape and prints a JSON line per variant.

Run on the real chip:  timeout 600 python scripts/bench_exp2.py [n]

STATUS (round 3): exp2 (log2e folded into gamma) is now the DEFAULT
inside every fused Mosaic kernel (docs/perf.md); this script remains the
standalone measurement harness.
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = float(np.log2(np.e))


def _kernel(use_exp2, gamma_ref, x_ref, qi_ref, xj_ref, qj_ref, b_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    gamma = gamma_ref[0, 0]
    cross = jnp.dot(x_ref[:], xj_ref[:].T, preferred_element_type=jnp.float32)
    sq = jnp.maximum(qi_ref[:] + qj_ref[:].T - 2.0 * cross, 0.0)
    if use_exp2:
        k = jnp.exp2(sq * (-LOG2E * gamma))
    else:
        k = jnp.exp(-gamma * sq)
    out_ref[:] += jnp.dot(k, b_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("use_exp2", "tile_i", "tile_j"))
def phi_sweep(coords, b, gamma, use_exp2, tile_i=512, tile_j=1024):
    n, m = coords.shape
    q = jnp.sum(coords * coords, axis=1)
    bw = b.shape[1]
    grid = (n // tile_i, n // tile_j)
    return pl.pallas_call(
        functools.partial(_kernel, use_exp2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_i, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, bw), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, bw), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, bw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * (m + bw),
            bytes_accessed=4 * n * (2 * m + 1 + 2 * bw),
            transcendentals=n * n,
        ),
    )(jnp.reshape(gamma, (1, 1)), coords, q[:, None], coords, q[:, None], b)


def main(n=10240, m=2, iters=50):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n, 2 * m + 1)), jnp.float32)
    gamma = jnp.float32(0.8)

    outs = {}
    for name, flag in (("exp", False), ("exp2", True)):
        out = phi_sweep(coords, b, gamma, flag)
        outs[name] = np.asarray(out)  # host sync (block_until_ready lies here)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = phi_sweep(coords, b, gamma, flag)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "variant": name, "n": n, "ms_per_sweep": round(1e3 * dt, 4),
            "pairs_per_s": round(n * n / dt / 1e9, 2),
        }))
    rel = np.abs(outs["exp2"] - outs["exp"]).max() / (
        np.abs(outs["exp"]).max() + 1e-30
    )
    print(json.dumps({"max_rel_diff_exp2_vs_exp": float(rel)}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10240)
