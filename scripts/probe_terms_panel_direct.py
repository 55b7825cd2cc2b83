"""Chip envelope probe: DIRECT panel-rotated multi-term triangle sweep.

Round-4 left composed m <= 4 kernels without the triangle at large n: the
legacy DUAL-window panel terms kernel crashes the TPU compiler at every
wide-window plan the m <= 4 diff branch selects, and its Gram branch only
compiles at W = 4096 (docs/perf.md). The round-5 direct per-term form
needs only ONE rotating window — (T * band, 2W), band = ceil8(2m+1) — the
same single-window structure as the SINGLE-term panel kernel, which
compiles all the way to W = 65536 with 5-row windows. This probes the
(W, nb, m-branch) envelope of that form on chip and checks accuracy and
speed vs the square cross sweep.

    timeout 3000 python scripts/probe_terms_panel_direct.py
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

from svgdcpp_tpu.ops.pallas_phi import (
    _LOG2E,
    _PAD_C,
    _bf16x3_cross,
    _ceil_mult,
    _lane_counts,
    _pad_cols,
    _pad_rows,
    _sq_tile,
    phi_rbf_terms_fused_pallas,
)

NUM_T = 3


def _panel_terms_direct_kernel(num_terms, diff_m, num_t, ri, cj, w, big,
                               n_real, band, i_arr_ref, j_arr_ref, gl_ref,
                               thr_ref, x_ref, qi_ref, xjt_ref, qjt_ref,
                               btj_ref, bti_ref, acc_ref, cnt_ref, cnt_sc):
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    bi = i_arr_ref[p]
    bj = j_arr_ref[p]

    @pl.when((p == 0) & (i == 0) & (j == 0))
    def _():
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    li = i * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    lj = j * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
    is_diag = bi == bj
    if diff_m is not None:
        sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)
        sq = jnp.where(is_diag & (lj < li), big, sq)
        sq = jnp.where(bi > bj, big, sq)
    else:
        cross2 = _bf16x3_cross(x_ref[:], xjt_ref[:])
        sq = qi_ref[:] + qjt_ref[:] + cross2
        gi = bi * w + li
        keep = (~is_diag | (lj > li)) & (bi <= bj)
        sq = jnp.where(
            keep, sq,
            jnp.where(is_diag & (lj == li) & (gi < n_real), 0.0, big),
        )

    bw = btj_ref.shape[0]
    for t_i in range(num_terms):
        k_t = jnp.exp2(gl_ref[0, t_i] * sq)
        acc_ref[t_i * band : t_i * band + bw, pl.ds(i * ri, ri)] += (
            jax.lax.dot_general(
                btj_ref[:], k_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        acc_ref[t_i * band : t_i * band + bw,
                pl.ds(w + j * cj, cj)] += jnp.dot(
            bti_ref[:], k_t, preferred_element_type=jnp.float32
        )
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when((p == pl.num_programs(0) - 1) & (i == pl.num_programs(1) - 1)
             & (j == pl.num_programs(2) - 1))
    def _():
        cnt_ref[:] = cnt_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=("signs", "tile_i", "tile_j", "panel_blocks"),
)
def run_panel_direct(coords, scores, gammas, signs, thresholds_sq, tile_i,
                     tile_j, panel_blocks):
    n, m = coords.shape
    num_terms = len(signs)
    nb = panel_blocks
    w = _ceil_mult(-(-n // nb), tile_j)
    n_pad = nb * w
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas])
    gl = jnp.reshape(-(gammas32 * _LOG2E), (1, num_terms))
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate([coords32, jnp.ones((n, 1), jnp.float32)], axis=1)
    b = jnp.concatenate([scores32, xs1], axis=1)

    diff_m = m if m <= 4 else None
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(coords32, n_pad, value=pad_t)
    qi_p = _pad_rows(q[:, None], n_pad, value=big)
    xjt_src = coords32.T if diff_m is not None else (-2.0 * coords32.T)
    xjt_p = _pad_cols(xjt_src, n_pad, value=pad_s)
    qjt_p = _pad_cols(q[None, :], n_pad, value=big)
    bt_p = _pad_cols(b.T, n_pad)
    bw = 2 * m + 1
    band = _ceil_mult(bw, 8)
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, NUM_T))

    pairs = [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]
    i_arr = jnp.asarray([pp_[0] for pp_ in pairs], jnp.int32)
    j_arr = jnp.asarray([pp_[1] for pp_ in pairs], jnp.int32)
    num_p = len(pairs)
    ni, nj = w // tile_i, w // tile_j

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_p, ni, nj),
        in_specs=[
            pl.BlockSpec((1, num_terms), lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NUM_T), lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_i, m),
                lambda p, i, j, bi, bj, _ni=ni: (bi[p] * _ni + i, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_i, 1),
                lambda p, i, j, bi, bj, _ni=ni: (bi[p] * _ni + i, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (m, tile_j),
                lambda p, i, j, bi, bj, _nj=nj: (0, bj[p] * _nj + j),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_j),
                lambda p, i, j, bi, bj, _nj=nj: (0, bj[p] * _nj + j),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bw, tile_j),
                lambda p, i, j, bi, bj, _nj=nj: (0, bj[p] * _nj + j),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bw, tile_i),
                lambda p, i, j, bi, bj, _ni=ni: (0, bi[p] * _ni + i),
                memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((num_terms * band, 2 * w),
                         lambda p, i, j, bi, bj: (0, p)),
            pl.BlockSpec((NUM_T, tile_j), lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((NUM_T, tile_j), jnp.float32),
        ],
    )
    panels, count_lanes = pl.pallas_call(
        functools.partial(_panel_terms_direct_kernel, num_terms, diff_m,
                          NUM_T, tile_i, tile_j, w, big, n, band),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(
                (num_terms * band, num_p * 2 * w), jnp.float32
            ),
            jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
        ),
    )(i_arr, j_arr, gl, thr, x_p, qi_p, xjt_p, qjt_p, bt_p, bt_p)

    rows = num_terms * band
    halves = panels.reshape(rows, num_p, 2, w)
    blocks = jnp.zeros((rows, nb, w), jnp.float32)
    blocks = blocks.at[:, i_arr, :].add(halves[:, :, 0, :])
    blocks = blocks.at[:, j_arr, :].add(halves[:, :, 1, :])
    acc_t = blocks.reshape(rows, n_pad)

    phi = None
    for t_i, s in enumerate(signs):
        a = acc_t[t_i * band : t_i * band + bw, :n].T - b
        ks = a[:, :m]
        kx = a[:, m : 2 * m]
        rowsum = a[:, 2 * m]
        phi_t = ks - 2.0 * gammas32[t_i] * (kx - rowsum[:, None] * coords32)
        phi_t = float(s) * phi_t
        phi = phi_t if phi is None else phi + phi_t
    phi = phi / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi, counts


def scan_time(run_fn, coords, iters=50):
    def body(x, _):
        phi, cnt = run_fn(x)
        return x + 1e-30 * phi, cnt[0]

    @jax.jit
    def prog(x):
        return jax.lax.scan(body, x, None, length=iters)

    np.asarray(prog(coords)[0])
    t0 = time.perf_counter()
    out = prog(coords)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters * 1e3


def case(n, m, gammas, tile_i, tile_j, nb, iters=50):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, m)) * 2, jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)
    signs = tuple(1.0 for _ in gammas)
    gs = tuple(jnp.float32(g) for g in gammas)
    w = _ceil_mult(-(-n // nb), tile_j)
    label = (f"n={n} m={m} T={len(gammas)} W={w} nb={nb} "
             f"{tile_i}x{tile_j}")
    try:
        run = lambda xx: run_panel_direct(xx, s, gs, signs, thr, tile_i,
                                          tile_j, nb)
        phi, counts = run(x)
        # accuracy vs the shipped square cross sweep (same Mosaic class)
        phi_ref, counts_ref = phi_rbf_terms_fused_pallas(
            x, s, gs, signs, thr, sym=False
        )
        rel = float(
            np.abs(np.asarray(phi) - np.asarray(phi_ref)).max()
            / (np.abs(np.asarray(phi_ref)).max() + 1e-30)
        )
        cerr = float(
            np.abs(np.asarray(counts) - np.asarray(counts_ref)).max()
        )
        ms = scan_time(run, x, iters)
        ms_ref = scan_time(
            lambda xx: phi_rbf_terms_fused_pallas(
                xx, s, gs, signs, thr, sym=False),
            x, iters,
        )
        print(f"{label}: panel {ms:8.3f} ms vs square {ms_ref:8.3f} "
              f"({ms_ref / ms:4.2f}x)  rel={rel:.2e} cnt_err={cerr:.0f}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def main():
    assert jax.default_backend() == "tpu"
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "m2"):
        # composed m=2 (the round-4 gap: square cross at 569 ms/step at
        # n=300k): diff branch, window (16, 2W)
        case(262144, 2, (0.8, 0.2), 512, 2048, 8)    # W=32768
        case(262144, 2, (0.8, 0.2), 512, 2048, 16)   # W=16384
        case(262144, 2, (0.8, 0.2), 512, 2048, 4)    # W=65536
        case(300000, 2, (0.8, 0.2), 512, 2048, 8, iters=20)
    if which in ("all", "m11"):
        # composed m=11 Gram branch: window (48, 2W) — vs the legacy dual
        # 4096-W ceiling
        case(100000, 11, (0.3, 0.08), 512, 2048, 8, iters=20)   # W=14336
        case(100000, 11, (0.3, 0.08), 512, 2048, 16, iters=20)  # W=8192
        case(100000, 11, (0.3, 0.08), 512, 2048, 25, iters=20)  # W=4096
    if which == "envelope2":
        # W=16384 window at larger n (panel count grows), plus the W=8192
        # margin point
        case(500000, 2, (0.8, 0.2), 512, 2048, 31, iters=10)   # W=16384
        case(1000000, 2, (0.8, 0.2), 512, 2048, 62, iters=5)   # W=16384
        case(262144, 2, (0.8, 0.2), 512, 2048, 32)             # W=8192
        # T=3 terms at m=2: 24-row window
        case(262144, 2, (0.8, 0.3, 0.1), 512, 2048, 16)        # W=16384
        # m=4 (32-row window) and m=3 (16-row)
        case(262144, 4, (0.6, 0.2), 512, 2048, 16, iters=20)   # W=16384
        case(262144, 4, (0.6, 0.2), 512, 2048, 32, iters=20)   # W=8192
        case(262144, 3, (0.6, 0.2), 512, 2048, 16, iters=20)   # W=16384
    if which == "envelope3":
        # small-nb / large-nb corners of each region to be gated eligible
        case(131072, 2, (0.8, 0.2), 512, 2048, 8)              # (16,T2) W=16384 nb=8
        case(131072, 2, (0.8, 0.3, 0.1), 512, 2048, 8)         # (24,T3) W=16384 nb=8
        case(499712, 2, (0.8, 0.3, 0.1), 512, 2048, 31, iters=10)  # (24,T3) nb=31
        case(65536, 4, (0.6, 0.2), 512, 2048, 8, iters=20)     # (32,T2) W=8192 nb=8
        case(131072, 11, (0.3, 0.08), 512, 2048, 32, iters=10) # (48,T2) W=4096 nb=32
        case(32768, 11, (0.3, 0.08), 512, 2048, 8, iters=20)   # (48,T2) W=4096 nb=8


if __name__ == "__main__":
    main()
