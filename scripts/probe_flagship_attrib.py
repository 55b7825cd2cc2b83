"""Attribution for the FLAGSHIP single-term triangle sweep (m=2, diff-form).

Round-4 verdict item: the n=10240 sym sweep holds only 52-66% of its VPU
bound with the missing third attributed by hand-waving. Same methodology
as probe_terms_attrib.py — null one piece at a time (timing-only) in a
mirror of the shipping _sym_kernel, plus candidate lean variants:

    full        mirror of the shipping kernel
    no_counts   selection counts skipped (3 edges)
    no_exp      k = g * sq
    no_mask     triangle mask skipped
    no_sq       k tile = broadcast (keeps exp, mask, counts, dots)
    lean        single-select mask tree (no diag branch needed on the
                diff form) — candidate to ship
    gram        packed bf16x3 Gram sq (1 MXU pass + diag pin) instead of
                the 3m-op VPU diff form — trades VPU ops for an MXU pass

    timeout 1800 python scripts/probe_flagship_attrib.py
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
    _lane_counts,
    _pad_cols,
    _pad_rows,
    phi_rbf_fused_pallas,
)
from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

M, NUM_T = 2, 3


def _kernel(flags, num_t, ri, cj, big, n_real, bi_ref, bj_ref, g_ref,
            thr_ref, x_ref, qi_ref, xjt_ref, qjt_ref, btj_ref, bti_ref,
            acc_ref, cnt_ref, acc_sc, cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)

    if flags.get("no_sq"):
        sq = jnp.broadcast_to(x_ref[:, 0:1], (ri, cj)) + qjt_ref[:]
    elif flags.get("gram"):
        # xjt carries -2x (prescaled); diag pinned in the select tree
        cross2 = _bf16x3_cross(x_ref[:], xjt_ref[:])
        sq = qi_ref[:] + qjt_ref[:] + cross2
    else:
        sq = None
        for k in range(M):
            d = x_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]
            sq = d * d if sq is None else sq + d * d

    if flags.get("gram"):
        sq = jnp.where(
            gj > gi, sq,
            jnp.where((gj == gi) & (gi < n_real), 0.0, big),
        )
    elif flags.get("lean"):
        sq = jnp.where(gj >= gi, sq, big)
    elif not flags.get("no_mask"):
        sq = jnp.where(gj >= gi, sq, big)

    gamma2 = g_ref[0, 0] * _LOG2E
    if flags.get("no_exp"):
        k_tile = gamma2 * sq
    else:
        k_tile = jnp.exp2(-gamma2 * sq)
    if flags.get("bf16k"):
        k_tile = k_tile.astype(jnp.bfloat16)

    acc_sc[:, pl.ds(bi * ri, ri)] += jax.lax.dot_general(
        btj_ref[:], k_tile.astype(btj_ref.dtype)
        if btj_ref.dtype != k_tile.dtype else k_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_sc[:, pl.ds(bj * cj, cj)] += jnp.dot(
        bti_ref[:], k_tile.astype(bti_ref.dtype)
        if bti_ref.dtype != k_tile.dtype else k_tile,
        preferred_element_type=jnp.float32,
    )
    if not flags.get("no_counts"):
        _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acc_ref[:] = acc_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(jax.jit, static_argnames=("flags", "tile_i", "tile_j"))
def run_variant(coords, scores, gamma, thresholds_sq, flags, tile_i,
                tile_j):
    flags = dict(flags)
    n, m = coords.shape
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gamma32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q = jnp.sum(coords32 * coords32, axis=1)
    b = jnp.concatenate(
        [scores.astype(jnp.float32), coords32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )

    gram = bool(flags.get("gram"))
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = 0.0 if gram else _PAD_C
    pad_s = 0.0 if gram else -_PAD_C
    x_p = _pad_rows(coords32, tile_j, value=pad_t)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_src = (-2.0 * coords32.T) if gram else coords32.T
    xjt_p = _pad_cols(xjt_src, tile_j, value=pad_s)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    bt_p = _pad_cols(b.T, tile_j)
    if flags.get("bf16k"):
        bt_p = bt_p.astype(jnp.bfloat16)
    n_pad = x_p.shape[0]
    bw = 2 * m + 1
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, NUM_T))

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    pairs = [(i, j) for i in range(nbi) for j in range(i // r, nbj)]
    bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, bi, bj: (0, 0),
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
            pl.BlockSpec((bw, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_T, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bw, n_pad), jnp.float32),
            pltpu.VMEM((NUM_T, tile_j), jnp.float32),
        ],
    )
    acc_t, count_lanes = pl.pallas_call(
        functools.partial(_kernel, flags, NUM_T, tile_i, tile_j, big, n),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bw, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
        ),
    )(bi_arr, bj_arr, gamma32, thr, x_p, qi_p, xjt_p, qjt_p, bt_p, bt_p)

    a = acc_t[:, :n].T - b
    ks = a[:, :m]
    kx = a[:, m : 2 * m]
    rowsum = a[:, 2 * m]
    gamma_f = jnp.asarray(gamma, jnp.float32)
    phi = (ks - 2.0 * gamma_f * (kx - rowsum[:, None] * coords32)) / n
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
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)

    for n in (2048, 4096, 10240):
        x = jnp.asarray(rng.normal(size=(n, M)) * 2, jnp.float32)
        s = jnp.asarray(rng.normal(size=(n, M)), jnp.float32)
        g = jnp.float32(np.log(n) / 4.0)

        phi_ref, counts_ref = phi_rbf_fused_counts(x, s, g, thr)
        phi_ref = np.asarray(phi_ref)
        counts_ref = np.asarray(counts_ref)
        scale = np.abs(phi_ref).max()

        run_ship = lambda xx: phi_rbf_fused_pallas(xx, s, g, thr, sym=True)
        ms = scan_time(run_ship, x)
        print(f"n={n:6d} ship       : {ms:7.4f} ms/sweep", flush=True)

        cases = [
            ("full       ", ()),
            ("no_counts  ", (("no_counts", 1),)),
            ("no_exp     ", (("no_exp", 1),)),
            ("no_mask    ", (("no_mask", 1),)),
            ("no_sq      ", (("no_sq", 1),)),
            ("gram packed", (("gram", 1),)),
            ("bf16 contr ", (("bf16k", 1),)),
        ]
        base = None
        for name, flags in cases:
            try:
                run = lambda xx, f=flags: run_variant(
                    xx, s, g, thr, f, 512, 2048)
                check = ("full" in name or "gram" in name
                         or "bf16" in name)
                if check:
                    phi, counts = run(x)
                    rel = np.abs(np.asarray(phi) - phi_ref).max() / scale
                    cerr = np.abs(np.asarray(counts) - counts_ref).max()
                    acc = f"  rel={rel:.2e} cnt_err={cerr:.0f}"
                else:
                    acc = ""
                ms = scan_time(run, x)
                note = "" if base is None else f"  delta={base - ms:+.4f}"
                if base is None:
                    base = ms
                print(f"n={n:6d} {name}: {ms:7.4f} ms/sweep{note}{acc}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:6d} {name}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)


# Two-call mask split for the SINGLE-term sym kernel (flagship family).
def _kernel_nomask(flags, num_t, ri, cj, big, n_real, masked, bi_ref,
                   bj_ref, g_ref, thr_ref, x_ref, qi_ref, xjt_ref, qjt_ref,
                   btj_ref, bti_ref, acc_ref, cnt_ref, acc_sc, cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = None
    for k in range(M):
        d = x_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]
        sq = d * d if sq is None else sq + d * d
    if masked:
        gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
        gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
        sq = jnp.where(gj >= gi, sq, big)

    gamma2 = g_ref[0, 0] * _LOG2E
    k_tile = jnp.exp2(-gamma2 * sq)
    acc_sc[:, pl.ds(bi * ri, ri)] += jax.lax.dot_general(
        btj_ref[:], k_tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_sc[:, pl.ds(bj * cj, cj)] += jnp.dot(
        bti_ref[:], k_tile, preferred_element_type=jnp.float32
    )
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acc_ref[:] = acc_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j"))
def run_split_single(coords, scores, gamma, thresholds_sq, tile_i, tile_j):
    n, m = coords.shape
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gamma32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q = jnp.sum(coords32 * coords32, axis=1)
    b = jnp.concatenate(
        [scores.astype(jnp.float32), coords32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )
    big = float(jnp.finfo(jnp.float32).max / 4)
    x_p = _pad_rows(coords32, tile_j, value=_PAD_C)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_p = _pad_cols(coords32.T, tile_j, value=-_PAD_C)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    bt_p = _pad_cols(b.T, tile_j)
    n_pad = x_p.shape[0]
    bw = 2 * m + 1
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, NUM_T))

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    pure = [(i, j) for i in range(nbi) for j in range(i // r, nbj)
            if j * r > i]
    mixed = [(i, j) for i in range(nbi) for j in range(i // r, nbj)
             if j * r <= i]

    def call(pairs, masked):
        bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
        bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(len(pairs),),
            in_specs=[
                pl.BlockSpec((1, 1), lambda t, bi, bj: (0, 0),
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
                pl.BlockSpec((bw, n_pad), lambda t, bi, bj: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NUM_T, tile_j), lambda t, bi, bj: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((bw, n_pad), jnp.float32),
                pltpu.VMEM((NUM_T, tile_j), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_nomask, None, NUM_T, tile_i, tile_j,
                              big, n, masked),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((bw, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((NUM_T, tile_j), jnp.float32),
            ),
        )(bi_arr, bj_arr, gamma32, thr, x_p, qi_p, xjt_p, qjt_p, bt_p,
          bt_p)

    a1, l1 = call(mixed, True)
    if pure:
        a2, l2 = call(pure, False)
        a1 = a1 + a2
        l1 = l1 + l2

    a = a1[:, :n].T - b
    ks = a[:, :m]
    kx = a[:, m : 2 * m]
    rowsum = a[:, 2 * m]
    gamma_f = jnp.asarray(gamma, jnp.float32)
    phi = (ks - 2.0 * gamma_f * (kx - rowsum[:, None] * coords32)) / n
    counts = 2.0 * jnp.sum(l1, axis=1) - jnp.float32(n)
    return phi, counts


def main_split_single():
    rng = np.random.default_rng(0)
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)
    for n in (10240, 20480):
        x = jnp.asarray(rng.normal(size=(n, M)) * 2, jnp.float32)
        s = jnp.asarray(rng.normal(size=(n, M)), jnp.float32)
        g = jnp.float32(np.log(n) / 4.0)
        phi_ref, counts_ref = phi_rbf_fused_counts(x, s, g, thr)
        phi_ref = np.asarray(phi_ref)
        scale = np.abs(phi_ref).max()

        ms_ship = scan_time(
            lambda xx: phi_rbf_fused_pallas(xx, s, g, thr, sym=True), x)
        run = lambda xx: run_split_single(xx, s, g, thr, 512, 2048)
        phi, counts = run(x)
        rel = np.abs(np.asarray(phi) - phi_ref).max() / scale
        cerr = np.abs(np.asarray(counts) - np.asarray(counts_ref)).max()
        ms = scan_time(run, x)
        print(f"n={n}: ship {ms_ship:7.4f} vs split {ms:7.4f} ms "
              f"({ms_ship / ms:4.2f}x)  rel={rel:.2e} cnt_err={cerr:.0f}",
              flush=True)


if __name__ == "__main__":
    if "--split" in sys.argv:
        main_split_single()
    else:
        main()
