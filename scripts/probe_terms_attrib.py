"""Attribution: where does the multi-term (m=11, T=2) sweep's time go?

probe_terms_batched.py showed the kernel is NOT dot-count bound (batching
7 dots down to 4 moves <3%). This probe nulls one piece at a time in the
shipping 4-dot structure (timing-only variants — outputs are wrong where a
piece is nulled) to attribute the 0.70 ms/sweep at n=10240:

    full          everything (matches the shipping kernel)
    no_counts     _lane_counts skipped
    no_exp        k_t = g * sq (no transcendental)
    no_mask       triangle mask + diagonal pin skipped
    one_term      T=1 (drops one exp + k_c/w assembly)
    sq_onepass    one-pass bf16 sq dot (drops 2 of 3 sq dots + splits)
    no_sq         k tile = x broadcast (no sq at all; keeps exps)
    no_dots       contraction dots skipped (keeps sq, exps, counts)

    timeout 1200 python scripts/probe_terms_attrib.py
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
    _lane_counts,
    _pad_cols,
    _pad_rows,
)

N, M, NUM_T = 10240, 11, 3
GAMMAS = (0.3, 0.08)
SIGNS = (1.0, 1.0)
# --blr switches to the single-term d=50 family (bound rows for perf.md)
if "--blr" in sys.argv:
    N, M = 4096, 50
    GAMMAS = (0.05,)
    SIGNS = (1.0,)


def _split(v):
    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return hi_f.astype(jnp.bfloat16), (v - hi_f).astype(jnp.bfloat16)


def _kernel(flags, signs, num_t, ri, cj, big, n_real, bi_ref, bj_ref,
            gammas_ref, thr_ref, x_ref, qi_ref, xjt_ref, qjt_ref, bst_ref,
            xs1t_ref, bsti_ref, xs1ti_ref, acck_ref, accw_ref, cnt_ref,
            acck_sc, accw_sc, cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acck_sc[:] = jnp.zeros_like(acck_sc)
        accw_sc[:] = jnp.zeros_like(accw_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    if flags.get("no_sq"):
        sq = jnp.broadcast_to(x_ref[:, 0:1], (ri, cj)) + qjt_ref[:]
    elif flags.get("sq_packed"):
        x_hi, x_lo = _split(x_ref[:])
        y_hi, y_lo = _split(xjt_ref[:])
        cat_x = jnp.concatenate([x_hi, x_hi, x_lo], axis=1)
        cat_y = jnp.concatenate([y_hi, y_lo, y_hi], axis=0)
        cross = jnp.dot(cat_x, cat_y, preferred_element_type=jnp.float32)
        sq = jnp.maximum(qi_ref[:] + qjt_ref[:] - 2.0 * cross, 0.0)
    elif flags.get("sq_onepass"):
        cross = jnp.dot(x_ref[:].astype(jnp.bfloat16),
                        xjt_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        sq = jnp.maximum(qi_ref[:] + qjt_ref[:] - 2.0 * cross, 0.0)
    else:
        x_hi, x_lo = _split(x_ref[:])
        y_hi, y_lo = _split(xjt_ref[:])
        cross = (
            jnp.dot(x_hi, y_hi, preferred_element_type=jnp.float32)
            + jnp.dot(x_hi, y_lo, preferred_element_type=jnp.float32)
            + jnp.dot(x_lo, y_hi, preferred_element_type=jnp.float32)
        )
        sq = jnp.maximum(qi_ref[:] + qjt_ref[:] - 2.0 * cross, 0.0)

    if not flags.get("no_mask"):
        gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
        gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
        sq = jnp.where(gj >= gi, sq, big)
        sq = jnp.where((gj == gi) & (gi < n_real), 0.0, sq)

    k_c = None
    w = None
    terms = signs[:1] if flags.get("one_term") else signs
    for t_i, s in enumerate(terms):
        g = gammas_ref[0, t_i]
        if flags.get("no_exp"):
            k_t = g * sq
        else:
            k_t = jnp.exp2(-(g * _LOG2E) * sq)
        k_c = s * k_t if k_c is None else k_c + s * k_t
        w_term = (s * g) * k_t
        w = w_term if w is None else w + w_term

    if not flags.get("no_dots"):
        acck_sc[:, pl.ds(bi * ri, ri)] += jax.lax.dot_general(
            bst_ref[:], k_c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acck_sc[:, pl.ds(bj * cj, cj)] += jnp.dot(
            bsti_ref[:], k_c, preferred_element_type=jnp.float32
        )
        accw_sc[:, pl.ds(bi * ri, ri)] += jax.lax.dot_general(
            xs1t_ref[:], w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        accw_sc[:, pl.ds(bj * cj, cj)] += jnp.dot(
            xs1ti_ref[:], w, preferred_element_type=jnp.float32
        )
    else:
        acck_sc[:, pl.ds(bi * ri, ri)] += jnp.sum(
            k_c, axis=1, keepdims=True
        )[0:1, :].T * jnp.ones((acck_sc.shape[0], ri), jnp.float32)
        accw_sc[0:1, pl.ds(bj * cj, cj)] += jnp.sum(
            w, axis=0, keepdims=True
        )

    if not flags.get("no_counts"):
        _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acck_ref[:] = acck_sc[:]
        accw_ref[:] = accw_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(jax.jit, static_argnames=("flags", "tile_i", "tile_j"))
def run_variant(coords, scores, thresholds_sq, flags, tile_i, tile_j):
    flags = dict(flags)
    n, m = coords.shape
    num_terms = len(SIGNS)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.reshape(
        jnp.stack([jnp.float32(g) for g in GAMMAS]), (1, num_terms)
    )
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
    n_pad = x_p.shape[0]
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, NUM_T))

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    pairs = [(i, j) for i in range(nbi) for j in range(i // r, nbj)]
    bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)

    in_specs = [
        pl.BlockSpec((1, num_terms), lambda t, bi, bj: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, NUM_T), lambda t, bi, bj: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_i, m), lambda t, bi, bj: (bi[t], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_i, 1), lambda t, bi, bj: (bi[t], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m + 1, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, tile_i), lambda t, bi, bj: (0, bi[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m + 1, tile_i), lambda t, bi, bj: (0, bi[t]),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((m, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m + 1, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_T, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, n_pad), jnp.float32),
            pltpu.VMEM((m + 1, n_pad), jnp.float32),
            pltpu.VMEM((NUM_T, tile_j), jnp.float32),
        ],
    )
    acck_t, accw_t, count_lanes = pl.pallas_call(
        functools.partial(_kernel, flags, SIGNS, NUM_T, tile_i, tile_j, big,
                          n),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((m + 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
        ),
    )(bi_arr, bj_arr, gammas32, thr, x_p, qi_p, xjt_p, qjt_p, bst_p,
      xs1t_p, bst_p, xs1t_p)
    return acck_t[:, :n].T, jnp.sum(count_lanes, axis=1)


def scan_time(run_fn, coords, iters=400):
    def body(x, _):
        phi, cnt = run_fn(x)
        return x + 1e-30 * phi[:, 0:1], cnt[0]

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
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)

    cases = [
        ("full       ", ()),
        ("no_counts  ", (("no_counts", 1),)),
        ("no_exp     ", (("no_exp", 1),)),
        ("no_mask    ", (("no_mask", 1),)),
        ("one_term   ", (("one_term", 1),)),
        ("sq_onepass ", (("sq_onepass", 1),)),
        ("sq_packed  ", (("sq_packed", 1),)),
        ("no_sq      ", (("no_sq", 1),)),
        ("no_dots    ", (("no_dots", 1),)),
    ]
    base = None
    for name, flags in cases:
        try:
            run = lambda xx, f=flags: run_variant(xx, s, thr, f, 512, 2048)
            ms = scan_time(run, x)
            note = "" if base is None else f"  delta={base - ms:+.4f}"
            if base is None:
                base = ms
            print(f"{name}: {ms:7.4f} ms/sweep{note}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)




# ---------------------------------------------------------------------------
# Pipelined-halves variant: split each (ri, cj) tile into H j-halves and emit
# per-half chains sequentially — consecutive halves' MXU (sq dots, contract)
# and VPU (assemble/exp/counts) ops are independent, so the Mosaic scheduler
# can overlap them instead of serializing the per-tile MXU->VPU->MXU chain.
# ---------------------------------------------------------------------------


def _kernel_pipe(halves, signs, num_t, ri, cj, big, n_real, bi_ref, bj_ref,
                 gammas_ref, thr_ref, x_ref, qi_ref, xjt_ref, qjt_ref,
                 bst_ref, xs1t_ref, bsti_ref, xs1ti_ref, acck_ref, accw_ref,
                 cnt_ref, acck_sc, accw_sc, cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acck_sc[:] = jnp.zeros_like(acck_sc)
        accw_sc[:] = jnp.zeros_like(accw_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    cjh = cj // halves
    x_hi, x_lo = _split(x_ref[:])
    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cjh), 0)

    r1k_parts = []
    r1w_parts = []
    for h in range(halves):
        y = xjt_ref[:, h * cjh : (h + 1) * cjh]
        y_hi, y_lo = _split(y)
        cross = (
            jnp.dot(x_hi, y_hi, preferred_element_type=jnp.float32)
            + jnp.dot(x_hi, y_lo, preferred_element_type=jnp.float32)
            + jnp.dot(x_lo, y_hi, preferred_element_type=jnp.float32)
        )
        sq = jnp.maximum(
            qi_ref[:] + qjt_ref[:, h * cjh : (h + 1) * cjh] - 2.0 * cross,
            0.0,
        )
        gj = (bj * cj + h * cjh) + jax.lax.broadcasted_iota(
            jnp.int32, (ri, cjh), 1
        )
        sq = jnp.where(gj >= gi, sq, big)
        sq = jnp.where((gj == gi) & (gi < n_real), 0.0, sq)

        k_c = None
        w = None
        for t_i, s in enumerate(signs):
            g = gammas_ref[0, t_i]
            k_t = jnp.exp2(-(g * _LOG2E) * sq)
            k_c = s * k_t if k_c is None else k_c + s * k_t
            w_term = (s * g) * k_t
            w = w_term if w is None else w + w_term

        # row-direction partials (contract over this half's columns)
        r1k_parts.append(jax.lax.dot_general(
            bst_ref[:, h * cjh : (h + 1) * cjh], k_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        r1w_parts.append(jax.lax.dot_general(
            xs1t_ref[:, h * cjh : (h + 1) * cjh], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        # column-direction goes straight to the half's columns
        acck_sc[:, pl.ds(bj * cj + h * cjh, cjh)] += jnp.dot(
            bsti_ref[:], k_c, preferred_element_type=jnp.float32
        )
        accw_sc[:, pl.ds(bj * cj + h * cjh, cjh)] += jnp.dot(
            xs1ti_ref[:], w, preferred_element_type=jnp.float32
        )
        for e in range(num_t):
            cnt_sc[e, h * cjh : (h + 1) * cjh] += jnp.sum(
                (sq <= thr_ref[0, e]).astype(jnp.float32), axis=0
            )

    r1k = r1k_parts[0]
    r1w = r1w_parts[0]
    for h in range(1, halves):
        r1k = r1k + r1k_parts[h]
        r1w = r1w + r1w_parts[h]
    acck_sc[:, pl.ds(bi * ri, ri)] += r1k
    accw_sc[:, pl.ds(bi * ri, ri)] += r1w

    @pl.when(t == nt - 1)
    def _():
        acck_ref[:] = acck_sc[:]
        accw_ref[:] = accw_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(jax.jit, static_argnames=("halves", "tile_i", "tile_j"))
def run_pipe(coords, scores, thresholds_sq, halves, tile_i, tile_j):
    n, m = coords.shape
    num_terms = len(SIGNS)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.reshape(
        jnp.stack([jnp.float32(g) for g in GAMMAS]), (1, num_terms)
    )
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
    n_pad = x_p.shape[0]
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, NUM_T))

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    pairs = [(i, j) for i in range(nbi) for j in range(i // r, nbj)]
    bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)

    in_specs = [
        pl.BlockSpec((1, num_terms), lambda t, bi, bj: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, NUM_T), lambda t, bi, bj: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_i, m), lambda t, bi, bj: (bi[t], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_i, 1), lambda t, bi, bj: (bi[t], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m + 1, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, tile_i), lambda t, bi, bj: (0, bi[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m + 1, tile_i), lambda t, bi, bj: (0, bi[t]),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((m, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m + 1, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_T, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, n_pad), jnp.float32),
            pltpu.VMEM((m + 1, n_pad), jnp.float32),
            pltpu.VMEM((NUM_T, tile_j), jnp.float32),
        ],
    )
    acck_t, accw_t, count_lanes = pl.pallas_call(
        functools.partial(_kernel_pipe, halves, SIGNS, NUM_T, tile_i,
                          tile_j, big, n),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((m + 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
        ),
    )(bi_arr, bj_arr, gammas32, thr, x_p, qi_p, xjt_p, qjt_p, bst_p,
      xs1t_p, bst_p, xs1t_p)

    s_sum = float(sum(SIGNS))
    sg_sum = jnp.sum(gammas32[0] * jnp.asarray(list(SIGNS), jnp.float32))
    ks = acck_t[:, :n].T - s_sum * scores32
    aw = accw_t[:, :n].T - sg_sum * xs1
    wx = aw[:, :m]
    w_rowsum = aw[:, m]
    phi = (ks - 2.0 * (wx - w_rowsum[:, None] * coords32)) / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi, counts


def main_pipe():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    s = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)

    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    phi_ref, counts_ref = phi_rbf_terms_fused_counts(
        x, s, tuple(jnp.float32(g) for g in GAMMAS), SIGNS, thr
    )
    phi_ref = np.asarray(phi_ref)
    counts_ref = np.asarray(counts_ref)
    scale = np.abs(phi_ref).max()

    for halves, ti, tj in ((1, 512, 2048), (2, 512, 2048), (4, 512, 2048),
                           (8, 512, 2048), (2, 512, 1024), (4, 1024, 2048)):
        try:
            run = lambda xx, h=halves, a=ti, b=tj: run_pipe(
                xx, s, thr, h, a, b)
            phi, counts = run(x)
            rel = np.abs(np.asarray(phi) - phi_ref).max() / scale
            cerr = np.abs(np.asarray(counts) - counts_ref).max()
            ms = scan_time(lambda xx, h=halves, a=ti, b=tj: run_pipe(
                xx, s, thr, h, a, b), x)
            print(f"pipe H={halves} {ti}x{tj}: {ms:7.4f} ms/sweep "
                  f"rel={rel:.2e} counts_err={cerr:.0f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pipe H={halves} {ti}x{tj}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    if "--pipe" in sys.argv:
        main_pipe()
    else:
        main()
