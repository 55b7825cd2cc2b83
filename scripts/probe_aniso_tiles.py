"""Aniso fused sweep: can dropping the concat temporaries lift the
512x512 tile bound?

The shipped _sym_aniso_terms_kernel batches all gradient-direction
accumulations into ONE concatenated dot pair because round 4 measured a
third accumulation-dot pair crashing the Mosaic compiler; the concat
temporaries then bound tiles to 512x512 (docs/perf.md). Round 5's direct
kernels showed 2T+1 separate accumulation dots into ONE packed scratch
compile fine — so this probes the aniso kernel with per-term SEPARATE
dots (no concat temporaries) at larger tiles, on the benchmark config
(n=10240, m=11, iso + 1 aniso term).

    timeout 1800 python scripts/probe_aniso_tiles.py
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
    _bf16x3_cross,
    _ceil_mult,
    _lane_counts,
    _pad_cols,
    _pad_rows,
    phi_rbf_aniso_terms_fused_pallas,
)

N, M, NUM_T = 10240, 11, 3


def _kernel(num_t, ri, cj, big, n_real, band, separate, bi_ref, bj_ref,
            g_ref, thr_ref, x_ref, qi_ref, xjt_ref, qjt_ref, bst_ref,
            xs1t_ref, bsti_ref, xs1ti_ref, ypt_ref, qti_ref, qtjt_ref,
            acck_ref, accw_ref, cnt_ref, acck_sc, accw_sc, cnt_sc):
    """iso(median gamma) + 1 aniso term; accw_sc holds two 8-aligned
    (m+1)-row bands (iso W, aniso W). ``separate``: per-band separate dot
    pairs instead of the shipped concat batching."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acck_sc[:] = jnp.zeros_like(acck_sc)
        accw_sc[:] = jnp.zeros_like(accw_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
    upper = gj >= gi
    diag = (gj == gi) & (gi < n_real)

    def masked(sq_raw, pin):
        s = jnp.where(upper, sq_raw, big)
        return jnp.where(diag, 0.0, s) if pin else s

    cross_e = _bf16x3_cross(x_ref[:], xjt_ref[:])
    sq_e = masked(
        jnp.maximum(qi_ref[:] + qjt_ref[:] - 2.0 * cross_e, 0.0), True
    )
    g = g_ref[0, 0]
    k_iso = jnp.exp2(-(g * _LOG2E) * sq_e)
    cross_a = _bf16x3_cross(x_ref[:], ypt_ref[:])
    sq_a = masked(
        jnp.maximum(qti_ref[:] + qtjt_ref[:] - 2.0 * cross_a, 0.0), True
    )
    k_a = jnp.exp2(-_LOG2E * sq_a)
    k_c = k_iso + k_a
    w_iso = g * k_iso

    mw = x_ref.shape[1] + 1

    def accum(sc, row0, w_tile):
        sc[row0 : row0 + mw, pl.ds(bi * ri, ri)] += jax.lax.dot_general(
            xs1t_ref[:], w_tile, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc[row0 : row0 + mw, pl.ds(bj * cj, cj)] += jnp.dot(
            xs1ti_ref[:], w_tile, preferred_element_type=jnp.float32
        )

    acck_sc[:, pl.ds(bi * ri, ri)] += jax.lax.dot_general(
        bst_ref[:], k_c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acck_sc[:, pl.ds(bj * cj, cj)] += jnp.dot(
        bsti_ref[:], k_c, preferred_element_type=jnp.float32
    )
    if separate:
        accum(accw_sc, 0, w_iso)
        accum(accw_sc, band, k_a)
    else:
        cat_r = jnp.concatenate([w_iso, k_a], axis=0)  # (2ri, cj)
        r1 = jax.lax.dot_general(
            xs1t_ref[:], cat_r, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cat_c = jnp.concatenate([w_iso, k_a], axis=1)  # (ri, 2cj)
        r2 = jnp.dot(xs1ti_ref[:], cat_c, preferred_element_type=jnp.float32)
        for a, (r1s, r2s) in enumerate((
            (r1[:, 0:ri], r2[:, 0:cj]),
            (r1[:, ri : 2 * ri], r2[:, cj : 2 * cj]),
        )):
            accw_sc[a * band : a * band + mw, pl.ds(bi * ri, ri)] += r1s
            accw_sc[a * band : a * band + mw, pl.ds(bj * cj, cj)] += r2s
    _lane_counts(cnt_sc, sq_e, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acck_ref[:] = acck_sc[:]
        accw_ref[:] = accw_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(
    jax.jit, static_argnames=("tile_i", "tile_j", "separate")
)
def run_variant(coords, scores, gamma, p_aniso, thresholds_sq, tile_i,
                tile_j, separate):
    n, m = coords.shape
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    g32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate([coords32, jnp.ones((n, 1), jnp.float32)], axis=1)

    big = float(jnp.finfo(jnp.float32).max / 4)
    x_p = _pad_rows(coords32, tile_j)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_p = _pad_cols(coords32.T, tile_j)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    bst_p = _pad_cols(scores32.T, tile_j)
    xs1t_p = _pad_cols(xs1.T, tile_j)

    p32 = jnp.asarray(p_aniso, jnp.float32)
    p_sym = p32 + p32.T
    q_t = jnp.sum(
        jnp.dot(coords32, p32, precision=jax.lax.Precision.HIGHEST)
        * coords32, axis=1,
    )
    ypt = jnp.dot(coords32, 0.5 * p_sym,
                  precision=jax.lax.Precision.HIGHEST).T
    ypt_p = _pad_cols(ypt, tile_j)
    qti_p = _pad_rows(q_t[:, None], tile_j, value=big)
    qtjt_p = _pad_cols(q_t[None, :], tile_j, value=big)
    n_pad = x_p.shape[0]
    band = _ceil_mult(m + 1, 8)
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, NUM_T))

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    pairs = [(i, j) for i in range(nbi) for j in range(i // r, nbj)]
    bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((1, 1), lambda t, bi, bj: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, NUM_T), lambda t, bi, bj: (0, 0), memory_space=vm),
        pl.BlockSpec((tile_i, m), lambda t, bi, bj: (bi[t], 0),
                     memory_space=vm),
        pl.BlockSpec((tile_i, 1), lambda t, bi, bj: (bi[t], 0),
                     memory_space=vm),
        pl.BlockSpec((m, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=vm),
        pl.BlockSpec((1, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=vm),
        pl.BlockSpec((m, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=vm),
        pl.BlockSpec((m + 1, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=vm),
        pl.BlockSpec((m, tile_i), lambda t, bi, bj: (0, bi[t]),
                     memory_space=vm),
        pl.BlockSpec((m + 1, tile_i), lambda t, bi, bj: (0, bi[t]),
                     memory_space=vm),
        pl.BlockSpec((m, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=vm),
        pl.BlockSpec((tile_i, 1), lambda t, bi, bj: (bi[t], 0),
                     memory_space=vm),
        pl.BlockSpec((1, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=vm),
    ]
    out_specs = (
        pl.BlockSpec((m, n_pad), lambda t, bi, bj: (0, 0), memory_space=vm),
        pl.BlockSpec((2 * band, n_pad), lambda t, bi, bj: (0, 0),
                     memory_space=vm),
        pl.BlockSpec((NUM_T, tile_j), lambda t, bi, bj: (0, 0),
                     memory_space=vm),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((m, n_pad), jnp.float32),
            pltpu.VMEM((2 * band, n_pad), jnp.float32),
            pltpu.VMEM((NUM_T, tile_j), jnp.float32),
        ],
    )
    acck_t, accw_t, count_lanes = pl.pallas_call(
        functools.partial(_kernel, NUM_T, tile_i, tile_j, big, n, band,
                          separate),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((2 * band, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
        ),
    )(bi_arr, bj_arr, g32, thr, x_p, qi_p, xjt_p, qjt_p, bst_p, xs1t_p,
      bst_p, xs1t_p, ypt_p, qti_p, qtjt_p)

    ks = acck_t[:, :n].T - 2.0 * scores32
    g_f = jnp.asarray(gamma, jnp.float32)
    aw = accw_t[: m + 1, :n].T - g_f * xs1
    phi = ks - 2.0 * (aw[:, :m] - aw[:, m][:, None] * coords32)
    aw2 = accw_t[band : band + m + 1, :n].T - xs1
    phi = phi - jnp.dot(
        aw2[:, :m] - aw2[:, m][:, None] * coords32, p_sym,
        precision=jax.lax.Precision.HIGHEST,
    )
    phi = phi / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi, counts


def scan_time(run_fn, coords, iters=200):
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


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    s = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    thr = jnp.asarray([2.0, 15.0, 80.0], jnp.float32)
    g = jnp.float32(0.12)
    b = rng.normal(size=(M, M)) * 0.1
    p_aniso = (0.05 * np.eye(M) + b @ b.T).astype(np.float32)

    # shipped package path (concat batching, auto tiles 512x512)
    run_ship = lambda xx: phi_rbf_aniso_terms_fused_pallas(
        xx, s, [g], [1.0], [jnp.asarray(p_aniso)], [1.0], thr
    )
    phi_ref, counts_ref = run_ship(x)
    phi_ref = np.asarray(phi_ref)
    scale = np.abs(phi_ref).max()
    ms = scan_time(run_ship, x)
    print(f"ship concat 512x512  : {ms:7.4f} ms/sweep", flush=True)

    for name, ti, tj, sep in (
        ("concat  512x512     ", 512, 512, False),
        ("separate 512x512    ", 512, 512, True),
        ("separate 512x1024   ", 512, 1024, True),
        ("separate 512x2048   ", 512, 2048, True),
        ("separate 1024x1024  ", 1024, 1024, True),
        ("concat  512x1024    ", 512, 1024, False),
    ):
        try:
            run = lambda xx, a=ti, b_=tj, c=sep: run_variant(
                xx, s, g, p_aniso, thr, a, b_, c)
            phi, counts = run(x)
            rel = np.abs(np.asarray(phi) - phi_ref).max() / scale
            ms = scan_time(run, x)
            print(f"{name}: {ms:7.4f} ms/sweep  rel_vs_ship={rel:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
