"""Micro-bench for the fused Mosaic sweep variants (real TPU).

Times the raw pallas kernel (phi + median counts, N=10240, m=2, 4 selection
edges — the primary-metric shape) across implementation variants so kernel
tuning iterates in seconds instead of full bench runs. Results feed
docs/perf.md; the winner is what ops/pallas_phi.py ships.

Run:  timeout 600 python scripts/tune_fused_kernel.py
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, M, T = 10240, 2, 4
TILE_I, TILE_J = 512, 1024
LOG2E = float(np.log2(np.e))


def _counts(sq, thr_ref, num_t):
    return jnp.stack(
        [jnp.sum((sq <= thr_ref[0, t]).astype(jnp.float32)) for t in range(num_t)]
    ).reshape(1, num_t)


# --- variant kernels ---------------------------------------------------


def k_diff_transpose(g_ref, thr_ref, x_ref, xj_ref, b_ref, acc_ref, cnt_ref):
    """Current shipping shape: per-dim slice with in-kernel transpose."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    sq = None
    for k in range(M):
        d = x_ref[:, k : k + 1] - xj_ref[:, k : k + 1].T
        sq = d * d if sq is None else sq + d * d
    k_tile = jnp.exp(-g_ref[0, 0] * sq)
    acc_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)
    cnt_ref[:] += _counts(sq, thr_ref, T)


def k_diff_pretransposed(g_ref, thr_ref, x_ref, xjt_ref, b_ref, acc_ref, cnt_ref):
    """Sources arrive transposed (m, TJ): no in-kernel relayout."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    sq = None
    for k in range(M):
        d = x_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]
        sq = d * d if sq is None else sq + d * d
    k_tile = jnp.exp(-g_ref[0, 0] * sq)
    acc_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)
    cnt_ref[:] += _counts(sq, thr_ref, T)


def k_diff_pret_exp2(g_ref, thr_ref, x_ref, xjt_ref, b_ref, acc_ref, cnt_ref):
    """Pre-transposed + exp2 with log2(e) folded into gamma."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    sq = None
    for k in range(M):
        d = x_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]
        sq = d * d if sq is None else sq + d * d
    k_tile = jnp.exp2(-g_ref[0, 0] * sq)  # gamma pre-scaled by log2(e)
    acc_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)
    cnt_ref[:] += _counts(sq, thr_ref, T)


def k_gram_highest(g_ref, thr_ref, x_ref, qi_ref, xj_ref, qj_ref, b_ref,
                   acc_ref, cnt_ref):
    """Gram identity with HIGHEST-precision cross dot."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    cross = jnp.dot(x_ref[:], xj_ref[:].T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    sq = jnp.maximum(qi_ref[:] + qj_ref[:].T - 2.0 * cross, 0.0)
    k_tile = jnp.exp(-g_ref[0, 0] * sq)
    acc_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)
    cnt_ref[:] += _counts(sq, thr_ref, T)


# --- harness -----------------------------------------------------------


def build(variant):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0)
    thr = jnp.asarray(np.linspace(0.5, 30.0, T), jnp.float32).reshape(1, T)
    b = jnp.concatenate([scores, coords, jnp.ones((N, 1), jnp.float32)], 1)
    bw = 2 * M + 1
    grid = (N // TILE_I, N // TILE_J)
    vm = pltpu.VMEM
    g = gamma.reshape(1, 1)
    common_out = (
        pl.BlockSpec((TILE_I, bw), lambda i, j: (i, 0), memory_space=vm),
        pl.BlockSpec((1, T), lambda i, j: (0, 0), memory_space=vm),
    )
    out_shape = (
        jax.ShapeDtypeStruct((N, bw), jnp.float32),
        jax.ShapeDtypeStruct((1, T), jnp.float32),
    )
    smem = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    thr_spec = pl.BlockSpec((1, T), lambda i, j: (0, 0), memory_space=vm)
    xi = pl.BlockSpec((TILE_I, M), lambda i, j: (i, 0), memory_space=vm)
    xj = pl.BlockSpec((TILE_J, M), lambda i, j: (j, 0), memory_space=vm)
    bj = pl.BlockSpec((TILE_J, bw), lambda i, j: (j, 0), memory_space=vm)
    q1i = pl.BlockSpec((TILE_I, 1), lambda i, j: (i, 0), memory_space=vm)
    q1j = pl.BlockSpec((TILE_J, 1), lambda i, j: (j, 0), memory_space=vm)

    if variant == "diff_transpose":
        fn = pl.pallas_call(
            k_diff_transpose, grid=grid,
            in_specs=[smem, thr_spec, xi, xj, bj],
            out_specs=common_out, out_shape=out_shape,
        )
        args = (g, thr, coords, coords, b)
    elif variant in ("diff_pretransposed", "diff_pret_exp2"):
        xjt = coords.T  # (M, N)
        xjt_spec = pl.BlockSpec((M, TILE_J), lambda i, j: (0, j), memory_space=vm)
        kern = (
            k_diff_pretransposed
            if variant == "diff_pretransposed"
            else k_diff_pret_exp2
        )
        gg = g * LOG2E if variant == "diff_pret_exp2" else g
        fn = pl.pallas_call(
            kern, grid=grid,
            in_specs=[smem, thr_spec, xi, xjt_spec, bj],
            out_specs=common_out, out_shape=out_shape,
        )
        args = (gg, thr, coords, xjt, b)
    elif variant == "gram_highest":
        q = jnp.sum(coords * coords, axis=1)[:, None]
        fn = pl.pallas_call(
            k_gram_highest, grid=grid,
            in_specs=[smem, thr_spec, xi, q1i, xj, q1j, bj],
            out_specs=common_out, out_shape=out_shape,
        )
        args = (g, thr, coords, q, coords, q, b)
    else:
        raise ValueError(variant)
    return jax.jit(lambda *a: fn(*a)), args


def time_variant(variant, iters=60):
    fn, args = build(variant)
    out = fn(*args)
    np.asarray(out[0])  # sync (block_until_ready lies through the tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    acc = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / iters
    return dt, acc


def main():
    assert jax.default_backend() == "tpu"
    base_acc = None
    for v in ["diff_transpose", "diff_pretransposed", "diff_pret_exp2",
              "gram_highest"]:
        dt, acc = time_variant(v)
        if base_acc is None:
            base_acc = acc
        rel = np.abs(acc - base_acc).max() / (np.abs(base_acc).max() + 1e-30)
        print(f"{v:20s} {dt * 1e3:7.3f} ms/sweep  "
              f"rate={N / dt / 1e6:6.2f}M rows/s  rel_vs_first={rel:.2e}",
              flush=True)




# --- second round: cost-split probes (run with --probe) -----------------


def k_pret_exp2_param(num_t, g_ref, thr_ref, x_ref, xjt_ref, b_ref, acc_ref,
                      cnt_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    sq = None
    for k in range(M):
        d = x_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]
        sq = d * d if sq is None else sq + d * d
    k_tile = jnp.exp2(-g_ref[0, 0] * sq)
    acc_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)
    if num_t:
        cnt_ref[:] += _counts(sq, thr_ref, num_t)
    else:
        cnt_ref[:] += jnp.zeros_like(cnt_ref)


def build_probe(num_t, tile_i, tile_j):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0 * LOG2E)
    nt = max(num_t, 1)
    thr = jnp.asarray(np.linspace(0.5, 30.0, nt), jnp.float32).reshape(1, nt)
    b = jnp.concatenate([scores, coords, jnp.ones((N, 1), jnp.float32)], 1)
    bw = 2 * M + 1
    grid = (N // tile_i, N // tile_j)
    vm = pltpu.VMEM
    fn = pl.pallas_call(
        functools.partial(k_pret_exp2_param, num_t), grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nt), lambda i, j: (0, 0), memory_space=vm),
            pl.BlockSpec((tile_i, M), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((M, tile_j), lambda i, j: (0, j), memory_space=vm),
            pl.BlockSpec((tile_j, bw), lambda i, j: (j, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((tile_i, bw), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((1, nt), lambda i, j: (0, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, bw), jnp.float32),
            jax.ShapeDtypeStruct((1, nt), jnp.float32),
        ),
    )
    args = (gamma.reshape(1, 1), thr, coords, coords.T, b)
    return jax.jit(lambda *a: fn(*a)), args


def probe():
    for num_t, ti, tj in [
        (4, 512, 1024), (3, 512, 1024), (0, 512, 1024),
        (4, 256, 1024), (4, 1024, 1024), (4, 512, 2048), (4, 256, 2048),
        (4, 1024, 2048), (3, 512, 2048),
    ]:
        fn, args = build_probe(num_t, ti, tj)
        out = fn(*args)
        np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(60):
            out = fn(*args)
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / 60
        print(f"edges={num_t} tile=({ti},{tj})  {dt * 1e3:7.3f} ms/sweep  "
              f"rate={N / dt / 1e6:6.2f}M rows/s", flush=True)




# --- third round: lane-resident count accumulators (--probe2) -----------


def k_lanecount(num_t, g_ref, thr_ref, x_ref, xjt_ref, b_ref, acc_ref,
                cnt_ref):
    """Counts kept as (T, TJ) lane vectors: per threshold a SUBLANE-direction
    reduce (cheap) accumulates into the lane-resident row; the final lane
    reduction happens once in the XLA epilogue instead of T full-tile
    scalar reductions per grid step."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    sq = None
    for k in range(M):
        d = x_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]
        sq = d * d if sq is None else sq + d * d
    k_tile = jnp.exp2(-g_ref[0, 0] * sq)
    acc_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)
    for t in range(num_t):
        ind = (sq <= thr_ref[0, t]).astype(jnp.float32)
        cnt_ref[t, :] += jnp.sum(ind, axis=0)


def build_lane(num_t, tile_i, tile_j):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0 * LOG2E)
    thr = jnp.asarray(np.linspace(0.5, 30.0, num_t), jnp.float32).reshape(1, num_t)
    b = jnp.concatenate([scores, coords, jnp.ones((N, 1), jnp.float32)], 1)
    bw = 2 * M + 1
    grid = (N // tile_i, N // tile_j)
    vm = pltpu.VMEM
    fn = pl.pallas_call(
        functools.partial(k_lanecount, num_t), grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_t), lambda i, j: (0, 0), memory_space=vm),
            pl.BlockSpec((tile_i, M), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((M, tile_j), lambda i, j: (0, j), memory_space=vm),
            pl.BlockSpec((tile_j, bw), lambda i, j: (j, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((tile_i, bw), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((num_t, tile_j), lambda i, j: (0, j), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, bw), jnp.float32),
            jax.ShapeDtypeStruct((num_t, N), jnp.float32),
        ),
    )
    args = (gamma.reshape(1, 1), thr, coords, coords.T, b)

    def run(*a):
        acc, lanes = fn(*a)
        return acc, jnp.sum(lanes, axis=1)  # XLA epilogue lane reduce

    return jax.jit(run), args


def probe2():
    # reference counts from brute force
    rng = np.random.default_rng(0)
    c = np.asarray(rng.normal(size=(N, M)) * 2, np.float32)
    sqb = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    for num_t, ti, tj in [(4, 512, 1024), (3, 512, 1024), (4, 512, 2048),
                          (3, 512, 2048), (4, 1024, 2048), (8, 512, 2048)]:
        fn, args = build_lane(num_t, ti, tj)
        out = fn(*args)
        np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(60):
            out = fn(*args)
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / 60
        thr = np.linspace(0.5, 30.0, num_t)
        brute = np.array([(sqb <= t).sum() for t in thr], np.float64)
        cdiff = np.abs(np.asarray(out[1]) - brute).max()
        print(f"lane edges={num_t} tile=({ti},{tj})  {dt * 1e3:7.3f} ms "
              f"rate={N / dt / 1e6:6.2f}M rows/s  cnt_err={cdiff}", flush=True)

if __name__ == "__main__":
    import sys as _s
    (probe2() if "--probe2" in _s.argv else probe() if "--probe" in _s.argv else main())
