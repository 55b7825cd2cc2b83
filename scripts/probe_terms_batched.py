"""Probe: batched small-operand dots for the multi-term triangle sweep.

Round-4 verdict: the hier-shape (m=11, T=2) multi-term Mosaic sweep sits at
~33% of its VPU bound because each visited tile issues SEVEN small-operand
MXU dots — 3 bf16x3 squared-distance passes (contraction depth 11/128) and
4 contraction dots with 11/12-row outputs (vs the 128-row output tile).
The aniso kernel already packs its n_w gradient accumulators into ONE
8-aligned band buffer fed by ONE concatenated dot pair; this probe applies
the same trick to the iso multi-term sweep:

  * batch_dots: pack S^T (band 0) and [X|1]^T (band 1) into one
    (2*band, tile) left operand, concatenate the two K-like tiles
    (k_c = sum s_t k_t, w = sum s_t g_t k_t) along the non-contraction
    axis, and replace the 4 contraction dots with ONE dot pair whose
    8-aligned output quadrants hold exactly the wanted products (the
    off-quadrants S^T w / X1^T k_c are padded-row-style waste that stays
    inside the same 128-row MXU output tile).
  * batch_sq: fold the bf16x3 split's three cross dots into two by
    concatenating the hi/lo halves of the transposed source operand along
    the LANE axis (hi.y_hi | hi.y_lo in one dot) — NOT along the
    contraction axis, which is the round-4 mis-lowering minefield
    (docs/perf.md "packed hi|lo depth-2m bf16 dot").

Accuracy is checked against the XLA fused sweep (Precision.HIGH sq) and
the shipping Mosaic sym kernel on chip. Run:

    timeout 1200 python scripts/probe_terms_batched.py
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
    phi_rbf_terms_fused_pallas,
)
from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

N, M, NUM_T = 10240, 11, 3
GAMMAS = (0.3, 0.08)
SIGNS = (1.0, 1.0)


def _split(v):
    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return hi_f.astype(jnp.bfloat16), (v - hi_f).astype(jnp.bfloat16)


def _sq_gram_mode(mode, x_ref, qi_ref, xjt_ref, qjt_ref):
    """mode: '3dot' (shipping bf16x3), '2dot_packed' (hi.hi + one
    depth-2m dot for hi.lo + lo.hi), '1dot_packed' (one depth-3m dot for
    all three products). Packed modes concatenate along the CONTRACTION
    axis — the round-4 minefield — so their accuracy MUST be verified on
    chip (a mis-lowering shows up as ~1e-1 rel phi error)."""
    x_hi, x_lo = _split(x_ref[:])
    y_hi, y_lo = _split(xjt_ref[:])
    if mode == "1dot_packed":
        cat_x = jnp.concatenate([x_hi, x_hi, x_lo], axis=1)  # (ri, 3m)
        cat_y = jnp.concatenate([y_hi, y_lo, y_hi], axis=0)  # (3m, cj)
        cross = jnp.dot(cat_x, cat_y, preferred_element_type=jnp.float32)
    elif mode == "2dot_packed":
        cat_x = jnp.concatenate([x_hi, x_lo], axis=1)  # (ri, 2m)
        cat_y = jnp.concatenate([y_lo, y_hi], axis=0)  # (2m, cj)
        cross = (
            jnp.dot(x_hi, y_hi, preferred_element_type=jnp.float32)
            + jnp.dot(cat_x, cat_y, preferred_element_type=jnp.float32)
        )
    else:
        cross = (
            jnp.dot(x_hi, y_hi, preferred_element_type=jnp.float32)
            + jnp.dot(x_hi, y_lo, preferred_element_type=jnp.float32)
            + jnp.dot(x_lo, y_hi, preferred_element_type=jnp.float32)
        )
    return jnp.maximum(qi_ref[:] + qjt_ref[:] - 2.0 * cross, 0.0)


def _sq_gram(batch_sq, x_ref, qi_ref, xjt_ref, qjt_ref):
    x_hi, x_lo = _split(x_ref[:])
    y_hi, y_lo = _split(xjt_ref[:])
    if batch_sq:
        cj = xjt_ref.shape[1]
        caty = jnp.concatenate([y_hi, y_lo], axis=1)  # (m, 2cj) bf16
        d1 = jnp.dot(x_hi, caty, preferred_element_type=jnp.float32)
        cross = (
            d1[:, 0:cj] + d1[:, cj : 2 * cj]
            + jnp.dot(x_lo, y_hi, preferred_element_type=jnp.float32)
        )
    else:
        cross = (
            jnp.dot(x_hi, y_hi, preferred_element_type=jnp.float32)
            + jnp.dot(x_hi, y_lo, preferred_element_type=jnp.float32)
            + jnp.dot(x_lo, y_hi, preferred_element_type=jnp.float32)
        )
    return jnp.maximum(qi_ref[:] + qjt_ref[:] - 2.0 * cross, 0.0)


def _kernel_batched(signs, num_t, ri, cj, big, n_real, band, batch_sq,
                    bi_ref, bj_ref, gammas_ref, thr_ref, x_ref, qi_ref,
                    xjt_ref, qjt_ref, pkj_ref, pki_ref, acc_ref, cnt_ref,
                    acc_sc, cnt_sc):
    """Triangle multi-term sweep with ONE contraction dot pair: pkj/pki are
    the band-packed [S^T ; X|1^T] operands ((2*band, tile)); the K tiles
    concatenate along the non-contraction axis and the 8-aligned output
    quadrants land in the packed (2*band, n_pad) accumulator."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = _sq_gram(batch_sq, x_ref, qi_ref, xjt_ref, qjt_ref)
    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
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

    # Row direction: one dot over the cat of both K tiles along rows.
    cat_r = jnp.concatenate([k_c, w], axis=0)  # (2ri, cj)
    r1 = jax.lax.dot_general(
        pkj_ref[:], cat_r, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2band, 2ri): quadrant [0:band, 0:ri] = S^T k_c^T,
    #                 [band:2band, ri:2ri] = X1^T w^T
    acc_sc[0:band, pl.ds(bi * ri, ri)] += r1[0:band, 0:ri]
    acc_sc[band : 2 * band, pl.ds(bi * ri, ri)] += r1[
        band : 2 * band, ri : 2 * ri
    ]

    # Column direction: cat along the lane axis.
    cat_c = jnp.concatenate([k_c, w], axis=1)  # (ri, 2cj)
    r2 = jnp.dot(pki_ref[:], cat_c, preferred_element_type=jnp.float32)
    # (2band, 2cj): [0:band, 0:cj] = S^T k_c, [band:2band, cj:2cj] = X1^T w
    acc_sc[0:band, pl.ds(bj * cj, cj)] += r2[0:band, 0:cj]
    acc_sc[band : 2 * band, pl.ds(bj * cj, cj)] += r2[
        band : 2 * band, cj : 2 * cj
    ]
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acc_ref[:] = acc_sc[:]
        cnt_ref[:] = cnt_sc[:]


def _kernel_fourdot(signs, num_t, ri, cj, big, n_real, batch_sq, bi_ref,
                    bj_ref, gammas_ref, thr_ref, x_ref, qi_ref, xjt_ref,
                    qjt_ref, bst_ref, xs1t_ref, bsti_ref, xs1ti_ref,
                    acck_ref, accw_ref, cnt_ref, acck_sc, accw_sc, cnt_sc):
    """Shipping 4-contraction-dot structure with optionally batched sq —
    isolates the sq-batching lever from the contraction batching."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acck_sc[:] = jnp.zeros_like(acck_sc)
        accw_sc[:] = jnp.zeros_like(accw_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = _sq_gram(batch_sq, x_ref, qi_ref, xjt_ref, qjt_ref)
    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
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
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acck_ref[:] = acck_sc[:]
        accw_ref[:] = accw_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=("variant", "tile_i", "tile_j", "batch_sq"),
)
def run_variant(coords, scores, thresholds_sq, variant, tile_i, tile_j,
                batch_sq):
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

    common_specs = [
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
    ]

    if variant == "batched":
        band = _ceil_mult(m + 1, 8)
        packed = jnp.zeros((2 * band, n_pad), jnp.float32)
        packed = packed.at[0:m, :].set(bst_p)
        packed = packed.at[band : band + m + 1, :].set(xs1t_p)
        in_specs = common_specs + [
            pl.BlockSpec((2 * band, tile_j), lambda t, bi, bj: (0, bj[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * band, tile_i), lambda t, bi, bj: (0, bi[t]),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(len(pairs),),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((2 * band, n_pad), lambda t, bi, bj: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NUM_T, tile_j), lambda t, bi, bj: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * band, n_pad), jnp.float32),
                pltpu.VMEM((NUM_T, tile_j), jnp.float32),
            ],
        )
        acc_t, count_lanes = pl.pallas_call(
            functools.partial(_kernel_batched, SIGNS, NUM_T, tile_i, tile_j,
                              big, n, band, batch_sq),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((2 * band, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
            ),
        )(bi_arr, bj_arr, gammas32, thr, x_p, qi_p, xjt_p, qjt_p, packed,
          packed)
        acck_t = acc_t[0:m]
        accw_t = acc_t[band : band + m + 1]
    else:
        in_specs = common_specs + [
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
            functools.partial(_kernel_fourdot, SIGNS, NUM_T, tile_i, tile_j,
                              big, n, batch_sq),
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


def scan_time(run_fn, coords, iters=400):
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
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)

    phi_ref, counts_ref = phi_rbf_terms_fused_counts(
        x, s, tuple(jnp.float32(g) for g in GAMMAS), SIGNS, thr
    )
    phi_ref = np.asarray(phi_ref)
    counts_ref = np.asarray(counts_ref)
    scale = np.abs(phi_ref).max()

    def check(phi, counts):
        err = np.abs(np.asarray(phi) - phi_ref)
        rel = err.max() / scale
        rms = np.sqrt((err**2).mean()) / scale
        cerr = np.abs(np.asarray(counts) - counts_ref).max()
        return rel, rms, cerr

    # shipping kernel baseline
    run_ship = lambda xx: phi_rbf_terms_fused_pallas(
        xx, s, tuple(jnp.float32(g) for g in GAMMAS), SIGNS, thr, sym=True
    )
    rel, rms, cerr = check(*run_ship(x))
    ms = scan_time(run_ship, x)
    print(f"ship 7-dot           : {ms:7.4f} ms/sweep  rel={rel:.2e} "
          f"rms={rms:.2e} counts_err={cerr:.0f}", flush=True)

    cases = [
        ("4dot  batch_sq      ", "fourdot", 512, 2048, True),
        ("2dot  cat-contract  ", "batched", 512, 2048, False),
        ("2dot  + batch_sq    ", "batched", 512, 2048, True),
        ("2dot  bs 512x1024   ", "batched", 512, 1024, True),
        ("2dot  bs 1024x2048  ", "batched", 1024, 2048, True),
        ("2dot  bs 256x2048   ", "batched", 256, 2048, True),
    ]
    for name, variant, ti, tj, bsq in cases:
        try:
            run = lambda xx, v=variant, a=ti, b=tj, q=bsq: run_variant(
                xx, s, thr, v, a, b, q
            )
            rel, rms, cerr = check(*run(x))
            ms = scan_time(run, x)
            print(f"{name}: {ms:7.4f} ms/sweep  rel={rel:.2e} "
                  f"rms={rms:.2e} counts_err={cerr:.0f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


# ---------------------------------------------------------------------------
# "direct" variant: no k_c/w assembly at all. Each term's k_t contracts
# directly against the full B = [S | X | 1] into its own 8-aligned band of
# ONE packed (T*band, n_pad) accumulator pair; the XLA epilogue combines
# per-term accumulators with the gammas. Swaps ~4 VPU ops/pair/term of
# k_c/w assembly for doubled (tiny) MXU output rows.
# ---------------------------------------------------------------------------


def _kernel_direct(signs, num_t, ri, cj, big, n_real, band, cat_dots,
                   sq_mode, bi_ref, bj_ref, gl_ref, thr_ref, x_ref, qi_ref,
                   xjt_ref, qjt_ref, btj_ref, bti_ref, acc_ref, cnt_ref,
                   acc_sc, cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]
    num_terms = len(signs)

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    if sq_mode == "lean":
        # packed 1-dot cross of PRE-SCALED sources (y2 = -2x host-side):
        # sq = qi + qjt + x.y2 — drops the -2 multiply; scaling by -2 is
        # exact in both bf16 halves (power of two)
        x_hi, x_lo = _split(x_ref[:])
        y_hi, y_lo = _split(xjt_ref[:])
        cat_x = jnp.concatenate([x_hi, x_hi, x_lo], axis=1)
        cat_y = jnp.concatenate([y_hi, y_lo, y_hi], axis=0)
        cross2 = jnp.dot(cat_x, cat_y, preferred_element_type=jnp.float32)
        sq = qi_ref[:] + qjt_ref[:] + cross2
        gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
        gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
        # single select tree, no separate clamp (diag pinned exactly;
        # off-diag negatives are rounding-level and harmless under exp2)
        sq = jnp.where(
            gj > gi, sq,
            jnp.where((gj == gi) & (gi < n_real), 0.0, big),
        )
    else:
        sq = _sq_gram_mode(sq_mode, x_ref, qi_ref, xjt_ref, qjt_ref)
        gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
        gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
        sq = jnp.where(gj >= gi, sq, big)
        sq = jnp.where((gj == gi) & (gi < n_real), 0.0, sq)

    # gl_ref holds -(g_t * log2(e)) host-folded: k_t = exp2(gl * sq)
    k_tiles = [jnp.exp2(gl_ref[0, t_i] * sq) for t_i in range(num_terms)]

    if cat_dots:
        cat_r = jnp.concatenate(k_tiles, axis=0)  # (T*ri, cj)
        r1 = jax.lax.dot_general(
            btj_ref[:], cat_r, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bw, T*ri)
        cat_c = jnp.concatenate(k_tiles, axis=1)  # (ri, T*cj)
        r2 = jnp.dot(bti_ref[:], cat_c, preferred_element_type=jnp.float32)
        for t_i in range(num_terms):
            acc_sc[t_i * band : t_i * band + btj_ref.shape[0],
                   pl.ds(bi * ri, ri)] += r1[:, t_i * ri : (t_i + 1) * ri]
            acc_sc[t_i * band : t_i * band + btj_ref.shape[0],
                   pl.ds(bj * cj, cj)] += r2[:, t_i * cj : (t_i + 1) * cj]
    else:
        for t_i, k_t in enumerate(k_tiles):
            acc_sc[t_i * band : t_i * band + btj_ref.shape[0],
                   pl.ds(bi * ri, ri)] += jax.lax.dot_general(
                btj_ref[:], k_t, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_sc[t_i * band : t_i * band + btj_ref.shape[0],
                   pl.ds(bj * cj, cj)] += jnp.dot(
                bti_ref[:], k_t, preferred_element_type=jnp.float32
            )
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acc_ref[:] = acc_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(
    jax.jit, static_argnames=("tile_i", "tile_j", "cat_dots", "sq_mode")
)
def run_direct(coords, scores, thresholds_sq, tile_i, tile_j, cat_dots,
               sq_mode="3dot"):
    n, m = coords.shape
    num_terms = len(SIGNS)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gl = jnp.reshape(
        jnp.stack([jnp.float32(-g * _LOG2E) for g in GAMMAS]),
        (1, num_terms),
    )
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)

    big = float(jnp.finfo(jnp.float32).max / 4)
    x_p = _pad_rows(coords32, tile_j)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_src = (-2.0 * coords32.T) if sq_mode == "lean" else coords32.T
    xjt_p = _pad_cols(xjt_src, tile_j)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    b = jnp.concatenate(
        [scores32, coords32, jnp.ones((n, 1), jnp.float32)], axis=1
    )
    bt_p = _pad_cols(b.T, tile_j)  # (bw, n_pad)
    n_pad = x_p.shape[0]
    bw = 2 * m + 1
    band = _ceil_mult(bw, 8)
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
        pl.BlockSpec((bw, tile_j), lambda t, bi, bj: (0, bj[t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bw, tile_i), lambda t, bi, bj: (0, bi[t]),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((num_terms * band, n_pad),
                         lambda t, bi, bj: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_T, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_terms * band, n_pad), jnp.float32),
            pltpu.VMEM((NUM_T, tile_j), jnp.float32),
        ],
    )
    acc_t, count_lanes = pl.pallas_call(
        functools.partial(_kernel_direct, SIGNS, NUM_T, tile_i, tile_j,
                          big, n, band, cat_dots, sq_mode),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_terms * band, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
        ),
    )(bi_arr, bj_arr, gl, thr, x_p, qi_p, xjt_p, qjt_p, bt_p, bt_p)

    xs1 = jnp.concatenate([coords32, jnp.ones((n, 1), jnp.float32)], axis=1)
    phi = None
    for t_i, s in enumerate(SIGNS):
        a = acc_t[t_i * band : t_i * band + bw, :n].T
        # diagonal double count: k_t(i,i) = 1 entered both directions
        ks = a[:, :m] - s * 0 - scores32  # K_t S minus the diag B once
        kx = a[:, m : 2 * m] - coords32
        rowsum = a[:, 2 * m] - 1.0
        g = jnp.float32(GAMMAS[t_i])
        phi_t = s * (ks - 2.0 * g * (kx - rowsum[:, None] * coords32))
        phi = phi_t if phi is None else phi + phi_t
    phi = phi / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi, counts


def main_direct():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    s = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)

    phi_ref, counts_ref = phi_rbf_terms_fused_counts(
        x, s, tuple(jnp.float32(g) for g in GAMMAS), SIGNS, thr
    )
    phi_ref = np.asarray(phi_ref)
    counts_ref = np.asarray(counts_ref)
    scale = np.abs(phi_ref).max()

    run_ship = lambda xx: phi_rbf_terms_fused_pallas(
        xx, s, tuple(jnp.float32(g) for g in GAMMAS), SIGNS, thr, sym=True
    )
    ms = scan_time(run_ship, x)
    print(f"ship 7-dot          : {ms:7.4f} ms/sweep", flush=True)

    for name, ti, tj, cat, sqm in (
        ("direct 4dot 512x2048 ", 512, 2048, False, "3dot"),
        ("direct 4dot 1024x1024", 1024, 1024, False, "3dot"),
        ("direct sq2p 1024x1024", 1024, 1024, False, "2dot_packed"),
        ("direct sq1p 1024x1024", 1024, 1024, False, "1dot_packed"),
        ("direct sq2p 512x1024 ", 512, 1024, False, "2dot_packed"),
        ("direct sq1p 512x1024 ", 512, 1024, False, "1dot_packed"),
        ("direct sq1p 512x2048 ", 512, 2048, False, "1dot_packed"),
        ("direct lean 1024x1024", 1024, 1024, False, "lean"),
        ("direct lean 512x1024 ", 512, 1024, False, "lean"),
        ("direct lean 512x2048 ", 512, 2048, False, "lean"),
        ("direct lean 1024x2048", 1024, 2048, False, "lean"),
    ):
        try:
            run = lambda xx, a=ti, b=tj, c=cat, q=sqm: run_direct(
                xx, s, thr, a, b, c, q)
            phi, counts = run(x)
            rel = np.abs(np.asarray(phi) - phi_ref).max() / scale
            cerr = np.abs(np.asarray(counts) - counts_ref).max()
            ms = scan_time(run, x)
            print(f"{name}: {ms:7.4f} ms/sweep rel={rel:.2e} "
                  f"counts_err={cerr:.0f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


# ---------------------------------------------------------------------------
# Two-call mask-split probe: pure-upper super-tiles (no mask work at all) in
# one pallas call, diagonal-straddling tiles (masked) in a second; host-side
# accumulator add. Candidate to recover the ~0.09 ms mask attribution on the
# ~2/3 of tiles that never straddle the diagonal.
# ---------------------------------------------------------------------------


def _kernel_direct_nomask(signs, num_t, ri, cj, big, n_real, band, masked,
                          bi_ref, bj_ref, gl_ref, thr_ref, x_ref, qi_ref,
                          xjt_ref, qjt_ref, btj_ref, bti_ref, acc_ref,
                          cnt_ref, acc_sc, cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]
    num_terms = len(signs)

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    cross2 = _bf16x3_cross(x_ref[:], xjt_ref[:])
    sq = qi_ref[:] + qjt_ref[:] + cross2
    if masked:
        gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
        gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
        sq = jnp.where(
            gj > gi, sq,
            jnp.where((gj == gi) & (gi < n_real), 0.0, big),
        )

    bw = btj_ref.shape[0]
    for t_i in range(num_terms):
        k_t = jnp.exp2(gl_ref[0, t_i] * sq)
        acc_sc[t_i * band : t_i * band + bw, pl.ds(bi * ri, ri)] += (
            jax.lax.dot_general(
                btj_ref[:], k_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        acc_sc[t_i * band : t_i * band + bw, pl.ds(bj * cj, cj)] += jnp.dot(
            bti_ref[:], k_t, preferred_element_type=jnp.float32
        )
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acc_ref[:] = acc_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j"))
def run_split(coords, scores, thresholds_sq, tile_i, tile_j):
    """Two-call split (timing + accuracy)."""
    n, m = coords.shape
    num_terms = len(SIGNS)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.stack([jnp.float32(g) for g in GAMMAS])
    gl = jnp.reshape(-(gammas32 * _LOG2E), (1, num_terms))
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate([coords32, jnp.ones((n, 1), jnp.float32)], axis=1)
    b = jnp.concatenate([scores32, xs1], axis=1)

    big = float(jnp.finfo(jnp.float32).max / 4)
    x_p = _pad_rows(coords32, tile_j)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_p = _pad_cols(-2.0 * coords32.T, tile_j)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    bt_p = _pad_cols(b.T, tile_j)
    n_pad = x_p.shape[0]
    bw = 2 * m + 1
    band = _ceil_mult(bw, 8)
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, NUM_T))

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    pure = [(i, j) for i in range(nbi) for j in range(i // r, nbj)
            if j * r > i]  # column super-block strictly right of row block
    mixed = [(i, j) for i in range(nbi) for j in range(i // r, nbj)
             if j * r <= i]

    def call(pairs, masked):
        bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
        bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(len(pairs),),
            in_specs=[
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
                pl.BlockSpec((bw, tile_j), lambda t, bi, bj: (0, bj[t]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, tile_i), lambda t, bi, bj: (0, bi[t]),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((num_terms * band, n_pad),
                             lambda t, bi, bj: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NUM_T, tile_j), lambda t, bi, bj: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_terms * band, n_pad), jnp.float32),
                pltpu.VMEM((NUM_T, tile_j), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_direct_nomask, SIGNS, NUM_T, tile_i,
                              tile_j, big, n, band, masked),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((num_terms * band, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
            ),
        )(bi_arr, bj_arr, gl, thr, x_p, qi_p, xjt_p, qjt_p, bt_p, bt_p)

    a1, l1 = call(pure, False)
    a2, l2 = call(mixed, True)
    acc_t = a1 + a2
    count_lanes = l1 + l2

    phi = None
    for t_i, s in enumerate(SIGNS):
        a = acc_t[t_i * band : t_i * band + bw, :n].T - b
        ks = a[:, :m]
        kx = a[:, m : 2 * m]
        rowsum = a[:, 2 * m]
        phi_t = s * (ks - 2.0 * gammas32[t_i]
                     * (kx - rowsum[:, None] * coords32))
        phi = phi_t if phi is None else phi + phi_t
    phi = phi / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi, counts


def main_split():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    s = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)

    phi_ref, counts_ref = phi_rbf_terms_fused_counts(
        x, s, tuple(jnp.float32(g) for g in GAMMAS), SIGNS, thr
    )
    phi_ref = np.asarray(phi_ref)
    scale = np.abs(phi_ref).max()

    for name, ti, tj in (("split 512x1024", 512, 1024),
                         ("split 512x2048", 512, 2048)):
        try:
            run = lambda xx, a=ti, b_=tj: run_split(xx, s, thr, a, b_)
            phi, counts = run(x)
            rel = np.abs(np.asarray(phi) - phi_ref).max() / scale
            cerr = np.abs(np.asarray(counts) - np.asarray(counts_ref)).max()
            ms = scan_time(run, x)
            print(f"{name}: {ms:7.4f} ms/sweep rel={rel:.2e} "
                  f"cnt_err={cerr:.0f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    # reference point: the shipped one-call direct-lean kernel
    for name, ti, tj in (("lean  512x1024", 512, 1024),):
        run = lambda xx, a=ti, b_=tj: run_direct(xx, s, thr, a, b_, False,
                                                 "lean")
        ms = scan_time(run, x)
        print(f"{name}: {ms:7.4f} ms/sweep", flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    if "--direct" in sys.argv:
        main_direct()
    elif "--split" in sys.argv:
        main_split()
    else:
        main()
