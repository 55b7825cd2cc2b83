"""Compare sq-tile strategies for the fused Mosaic sweep (real TPU).

Default-precision f32 MXU dots on TPU execute as ONE bf16 pass (measured:
bit-identical to explicit bf16 operands), so the Gram-identity sq in the
Mosaic kernels carries ~2^-8 relative rounding — 2.6e-2 max rel phi error
vs the f64 oracle, where the XLA fused path (difference form at m<=4)
sits at ~3e-4. This script times and scores three kernel variants:

  gram          — current production kernel (default-precision dot)
  gram_highest  — same, cross dot at Precision.HIGHEST (multi-pass bf16)
  diff          — per-dimension broadcast differences (no MXU for sq)

Run:  timeout 900 python scripts/bench_sq_accuracy.py
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

from svgdcpp_tpu.ops.pallas_phi import _pad_rows, _tile_counts


def _kernel(variant, gamma_ref, thr_ref, x_ref, qi_ref, xj_ref, qj_ref,
            b_ref, acc_ref, cnt_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    gamma = gamma_ref[0, 0]
    if variant == "diff":
        m = x_ref.shape[1]
        sq = None
        for a in range(m):
            d = x_ref[:, a : a + 1] - xj_ref[:, a : a + 1].T
            sq = d * d if sq is None else sq + d * d
    else:
        prec = (jax.lax.Precision.HIGHEST if variant == "gram_highest"
                else jax.lax.Precision.DEFAULT)
        cross = jnp.dot(x_ref[:], xj_ref[:].T,
                        preferred_element_type=jnp.float32, precision=prec)
        sq = jnp.maximum(qi_ref[:] + qj_ref[:].T - 2.0 * cross, 0.0)
    k_tile = jnp.exp(-gamma * sq).astype(b_ref.dtype)
    acc_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)
    cnt_ref[:] += _tile_counts(sq, thr_ref, cnt_ref.shape[1])


@functools.partial(jax.jit, static_argnames=("variant", "tile_i", "tile_j"))
def fused_variant(coords, scores, gamma, thr, variant, tile_i=512,
                  tile_j=1024):
    n, m = coords.shape
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    x32 = coords.astype(jnp.float32) - center
    gamma32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q = jnp.sum(x32 * x32, axis=1)
    b = jnp.concatenate(
        [scores.astype(jnp.float32), x32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    pad_t = 1e15 if variant == "diff" else 0.0
    pad_s = -1e15 if variant == "diff" else 0.0
    x_p = _pad_rows(x32, tile_i, value=pad_t)
    qi_p = _pad_rows(q[:, None], tile_i, value=big)
    xj_p = _pad_rows(x32, tile_j, value=pad_s)
    qj_p = _pad_rows(q[:, None], tile_j, value=big)
    b_p = _pad_rows(b, tile_j)
    n_i, n_j = x_p.shape[0], xj_p.shape[0]
    bw = 2 * m + 1
    nt = thr.shape[0]
    thr2 = jnp.reshape(thr.astype(jnp.float32), (1, nt))

    acc, counts = pl.pallas_call(
        functools.partial(_kernel, variant),
        grid=(n_i // tile_i, n_j // tile_j),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nt), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, bw), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_i, bw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_i, bw), jnp.float32),
            jax.ShapeDtypeStruct((1, nt), jnp.float32),
        ),
    )(gamma32, thr2, x_p, qi_p, xj_p, qj_p, b_p)

    a = acc[:n]
    ks = a[:, :m]
    kx = a[:, m : 2 * m]
    rowsum = a[:, 2 * m]
    gf = jnp.asarray(gamma, jnp.float32)
    phi = (ks - 2.0 * gf * (kx - rowsum[:, None] * x32)) / n
    return phi, counts[0]


def oracle(x, s, gamma):
    x = x.astype(np.float64)
    s = s.astype(np.float64)
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = np.exp(-gamma * sq)
    return (K @ s + 2.0 * gamma * (K.sum(1)[:, None] * x - K @ x)) / x.shape[0]


def main():
    rng = np.random.default_rng(1)
    for n, m in ((10240, 2), (10240, 8)):
        xh = (rng.normal(size=(n, m)) * 0.5 + 3.0).astype(np.float32)
        sh = rng.normal(size=(n, m)).astype(np.float32)
        x64 = xh.astype(np.float64)
        sq = ((x64[:, None, :] - x64[None, :, :]) ** 2).sum(-1)
        med = np.median(np.sqrt(sq.ravel()))
        gamma = np.log(n) / med**2
        ref = oracle(xh, sh, gamma)
        rs = np.abs(ref).max()
        thr = jnp.asarray(np.quantile(sq.ravel(), [0.3, 0.5, 0.7, 0.9]),
                          jnp.float32)
        cnt64 = np.array([(sq.ravel() <= t).sum() for t in np.asarray(thr)],
                         np.float64)
        xj, sj = jnp.asarray(xh), jnp.asarray(sh)
        variants = ["gram", "gram_highest"] + (["diff"] if m <= 4 else [])
        for v in variants:
            phi, cnt = fused_variant(xj, sj, jnp.float32(gamma), thr, v)
            np.asarray(phi)  # warm + sync
            t0 = time.perf_counter()
            iters = 50
            for _ in range(iters):
                phi, cnt = fused_variant(xj, sj, jnp.float32(gamma), thr, v)
            np.asarray(phi), np.asarray(cnt)
            dt = (time.perf_counter() - t0) / iters
            err = np.abs(np.asarray(phi).astype(np.float64) - ref).max() / rs
            cerr = np.abs(np.asarray(cnt) - cnt64).max()
            print(json.dumps({
                "n": n, "m": m, "variant": v,
                "ms_per_sweep": round(1e3 * dt, 4),
                "phi_max_rel_err": float(f"{err:.3e}"),
                "count_max_abs_err": float(cerr),
            }), flush=True)


if __name__ == "__main__":
    main()
