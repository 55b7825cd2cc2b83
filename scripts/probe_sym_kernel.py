"""Probe: symmetric (upper-triangle) fused Mosaic sweep.

The shipping fused sweep (ops/pallas_phi.py) visits all n^2 tile pairs, but
the squared-distance matrix is symmetric: tile (bi, bj) with bi < bj holds
the same sq values as (bj, bi) transposed. A triangle sweep therefore halves
the VPU-bound work (sq diff-form, exp2, selection counts) at unchanged MXU
flops by accumulating BOTH directions per visited tile:

    acc[rows bi] += K       @ B[bj]
    acc[rows bj] += K^T     @ B[bi]      (skipped on the diagonal)
    counts       += w * colsum(sq <= thr),  w = 2 off-diagonal, 1 on it

The accumulator lives in a VMEM scratch across the sequential 1-D triangle
grid (enumerated via scalar-prefetched block-index arrays) and is flushed
once at the last step. Variants probe the accumulator layout (a (N, bw)
scratch lane-pads bw=5 to 128 — 25x wasted accumulate traffic; the
transposed (bw, nblk, tile) layout keeps it dense) and how the second
(transposed) contraction is formed. Run on the real chip:

    timeout 900 python scripts/probe_sym_kernel.py
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

N, M, T_EDGES = 10240, 2, 3
LOG2E = float(np.log2(np.e))


def _sq_diff(xi_ref, xjt_ref):
    sq = None
    for k in range(M):
        d = xi_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]
        sq = d * d if sq is None else sq + d * d
    return sq


def _wcounts(cnt_sc, sq, thr_ref, num_t, w):
    for e in range(num_t):
        cnt_sc[e, :] += w * jnp.sum(
            (sq <= thr_ref[0, e]).astype(jnp.float32), axis=0
        )


# --- variant A: row-major (N, bw) scratch (lane-padded accumulate) -------


def k_sym_rowmajor(num_t, tile, bi_ref, bj_ref, g_ref, thr_ref, xi_ref,
                   xjt_ref, bjb_ref, bib_ref, acc_out, cnt_out, acc_sc,
                   cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = _sq_diff(xi_ref, xjt_ref)
    k_tile = jnp.exp2(-g_ref[0, 0] * sq)
    r1 = jnp.dot(k_tile, bjb_ref[:], preferred_element_type=jnp.float32)
    acc_sc[pl.ds(bi * tile, tile), :] += r1

    @pl.when(bi != bj)
    def _():
        r2 = jnp.dot(k_tile.T, bib_ref[:], preferred_element_type=jnp.float32)
        acc_sc[pl.ds(bj * tile, tile), :] += r2

    w = jnp.where(bi == bj, 1.0, 2.0).astype(jnp.float32)
    _wcounts(cnt_sc, sq, thr_ref, num_t, w)

    @pl.when(t == nt - 1)
    def _():
        acc_out[:] = acc_sc[:]
        cnt_out[:] = cnt_sc[:]


# --- variant B: transposed (bw, nblk, tile) scratch -----------------------


def k_sym_tsc(num_t, tile, form, bi_ref, bj_ref, g_ref, thr_ref, xi_ref,
              xjt_ref, b1_ref, bti_ref, acc_out, cnt_out, acc_sc, cnt_sc):
    """form='kt': transpose K once, both dots in (bw, .) orientation
       (b1_ref = btj (bw, tile)).
       form='rt': normal K dot then transpose the small (tile, bw) result
       (b1_ref = bjb (tile, bw))."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = _sq_diff(xi_ref, xjt_ref)
    k_tile = jnp.exp2(-g_ref[0, 0] * sq)

    if form == "kt":
        kt = k_tile.T
        r1t = jnp.dot(b1_ref[:], kt, preferred_element_type=jnp.float32)
    elif form == "nt":
        # B_j^T @ K^T as an NT matmul: contract both operands' dim 1 —
        # no materialized transpose.
        r1t = jax.lax.dot_general(
            b1_ref[:], k_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        r1 = jnp.dot(k_tile, b1_ref[:], preferred_element_type=jnp.float32)
        r1t = r1.T
    acc_sc[:, bi, :] += r1t

    @pl.when(bi != bj)
    def _():
        r2t = jnp.dot(bti_ref[:], k_tile, preferred_element_type=jnp.float32)
        acc_sc[:, bj, :] += r2t

    w = jnp.where(bi == bj, 1.0, 2.0).astype(jnp.float32)
    _wcounts(cnt_sc, sq, thr_ref, num_t, w)

    @pl.when(t == nt - 1)
    def _():
        acc_out[:] = acc_sc[:]
        cnt_out[:] = cnt_sc[:]


# --- variant C: rect-triangle (RI x CJ tiles, masked mixed tiles) ---------
#
# Keep the shipping kernel's efficient wide tiles (512 rows x 2048 cols)
# and visit only the (bi, BJ) super-tiles that intersect the upper
# triangle: BJ >= bi // r with r = CJ // RI. Pure-upper tiles accumulate
# both directions unmasked (weight 2 counts); the one diagonal-straddling
# ("mixed") tile per row-block masks K elementwise (j >= i for the row
# direction, j > i for the mirror) and weights counts w = [j>i]*2 + [j==i].


def k_sym_rect(num_t, ri, cj, form, bi_ref, bj_ref, g_ref, thr_ref, xi_ref,
               xjt_ref, b1_ref, bti_ref, acc_out, cnt_out, acc_sc, cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    r = cj // ri
    bi = bi_ref[t]
    bj = bj_ref[t]
    mixed = (bi // r) == bj

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = _sq_diff(xi_ref, xjt_ref)
    k_tile = jnp.exp2(-g_ref[0, 0] * sq)

    def accumulate(k_up, k_strict):
        if form == "nt":
            r1t = jax.lax.dot_general(
                b1_ref[:], k_up,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            r1t = jnp.dot(k_up, b1_ref[:],
                          preferred_element_type=jnp.float32).T
        acc_sc[:, pl.ds(bi * ri, ri)] += r1t
        r2t = jnp.dot(bti_ref[:], k_strict,
                      preferred_element_type=jnp.float32)
        acc_sc[:, pl.ds(bj * cj, cj)] += r2t

    @pl.when(mixed)
    def _():
        gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
        gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
        up = (gj >= gi).astype(jnp.float32)
        strict = (gj > gi).astype(jnp.float32)
        accumulate(k_tile * up, k_tile * strict)
        w = up + strict
        for e in range(num_t):
            cnt_sc[e, :] += jnp.sum(
                (sq <= thr_ref[0, e]).astype(jnp.float32) * w, axis=0
            )

    @pl.when(jnp.logical_not(mixed))
    def _():
        accumulate(k_tile, k_tile)
        for e in range(num_t):
            cnt_sc[e, :] += 2.0 * jnp.sum(
                (sq <= thr_ref[0, e]).astype(jnp.float32), axis=0
            )

    @pl.when(t == nt - 1)
    def _():
        acc_out[:] = acc_sc[:]
        cnt_out[:] = cnt_sc[:]


def k_sym_rect_uniform(num_t, ri, cj, big, bi_ref, bj_ref, g_ref, thr_ref,
                       xi_ref, xjt_ref, btj_ref, bti_ref, acc_out, cnt_out,
                       acc_sc, cnt_sc):
    """Branch-free rect-triangle sweep. The upper mask is applied ONCE by
    routing sq through +big on the lower triangle: K and the counts both
    die there with no per-edge or per-dot masking. Diagonal self-pairs are
    deliberately double-counted (both dots see them; counts include them
    once) and corrected exactly in the XLA epilogue:
        acc -= B^T          (K(i,i) = 1 enters both accumulation directions)
        counts = 2*sum - n  (upper-inclusive -> full ordered count)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = _sq_diff(xi_ref, xjt_ref)
    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
    sq_m = jnp.where(gj >= gi, sq, big)
    k_tile = jnp.exp2(-g_ref[0, 0] * sq_m)

    r1t = jax.lax.dot_general(
        btj_ref[:], k_tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_sc[:, pl.ds(bi * ri, ri)] += r1t
    r2t = jnp.dot(bti_ref[:], k_tile, preferred_element_type=jnp.float32)
    acc_sc[:, pl.ds(bj * cj, cj)] += r2t

    for e in range(num_t):
        cnt_sc[e, :] += jnp.sum(
            (sq_m <= thr_ref[0, e]).astype(jnp.float32), axis=0)

    @pl.when(t == nt - 1)
    def _():
        acc_out[:] = acc_sc[:]
        cnt_out[:] = cnt_sc[:]


def k_sym_rect_uniform2(num_t, ri, cj, big, bi_ref, bj_ref, g_ref, thr_ref,
                        xi_ref, xjt_ref, btj_ref, bti_ref, acc_out, cnt_out,
                        acc_sc, cnt_sc, d_sc):
    """Like k_sym_rect_uniform, but the iota difference (gj - gi without the
    block offsets) is computed ONCE into a VMEM scratch at t == 0; per tile
    the upper mask is a single compare against the scalar block offset
    (bi*ri - bj*cj) instead of two fresh iota materializations."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)
        d_sc[:] = (
            jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
            - jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
        ).astype(jnp.float32)

    sq = _sq_diff(xi_ref, xjt_ref)
    off = (bi * ri - bj * cj).astype(jnp.float32)
    sq_m = jnp.where(d_sc[:] >= off, sq, big)
    k_tile = jnp.exp2(-g_ref[0, 0] * sq_m)

    r1t = jax.lax.dot_general(
        btj_ref[:], k_tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_sc[:, pl.ds(bi * ri, ri)] += r1t
    r2t = jnp.dot(bti_ref[:], k_tile, preferred_element_type=jnp.float32)
    acc_sc[:, pl.ds(bj * cj, cj)] += r2t

    for e in range(num_t):
        cnt_sc[e, :] += jnp.sum(
            (sq_m <= thr_ref[0, e]).astype(jnp.float32), axis=0)

    @pl.when(t == nt - 1)
    def _():
        acc_out[:] = acc_sc[:]
        cnt_out[:] = cnt_sc[:]


def build_rect_uniform(num_t, ri, cj, interpret=False, variant2=False):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0)
    thr = jnp.asarray(np.linspace(0.5, 30.0, num_t), jnp.float32).reshape(1, num_t)
    b = jnp.concatenate([scores, coords, jnp.ones((N, 1), jnp.float32)], 1)
    bw = 2 * M + 1
    r = cj // ri
    nbi, nbj = N // ri, N // cj
    pairs = [(i, J) for i in range(nbi) for J in range(i // r, nbj)]
    bi = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    vm = pltpu.VMEM
    big = float(np.finfo(np.float32).max / 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_t), lambda t, bi, bj: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((ri, M), lambda t, bi, bj: (bi[t], 0),
                         memory_space=vm),
            pl.BlockSpec((M, cj), lambda t, bi, bj: (0, bj[t]),
                         memory_space=vm),
            pl.BlockSpec((bw, cj), lambda t, bi, bj: (0, bj[t]),
                         memory_space=vm),
            pl.BlockSpec((bw, ri), lambda t, bi, bj: (0, bi[t]),
                         memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((bw, N), lambda t, bi, bj: (0, 0), memory_space=vm),
            pl.BlockSpec((num_t, cj), lambda t, bi, bj: (0, 0),
                         memory_space=vm),
        ),
        scratch_shapes=[pltpu.VMEM((bw, N), jnp.float32),
                        pltpu.VMEM((num_t, cj), jnp.float32)]
        + ([pltpu.VMEM((ri, cj), jnp.float32)] if variant2 else []),
    )
    kern = (k_sym_rect_uniform2 if variant2 else k_sym_rect_uniform)
    fn = pl.pallas_call(
        functools.partial(kern, num_t, ri, cj, big),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bw, N), jnp.float32),
            jax.ShapeDtypeStruct((num_t, cj), jnp.float32),
        ),
        interpret=interpret,
    )
    g = (gamma * LOG2E).reshape(1, 1)

    def run(bi, bj, g, thr, x, xt, bt):
        acc, lanes = fn(bi, bj, g, thr, x, xt, bt, bt)
        acc = (acc - bt).T           # remove the double-counted diagonal
        cnt = 2.0 * jnp.sum(lanes, axis=1) - N
        return acc, cnt

    args = (bi, bj, g, thr, coords, coords.T, b.T)
    return jax.jit(run), args, coords, scores


def build_rect(num_t, ri, cj, form, interpret=False):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0)
    thr = jnp.asarray(np.linspace(0.5, 30.0, num_t), jnp.float32).reshape(1, num_t)
    b = jnp.concatenate([scores, coords, jnp.ones((N, 1), jnp.float32)], 1)
    bw = 2 * M + 1
    r = cj // ri
    nbi, nbj = N // ri, N // cj
    pairs = [(i, J) for i in range(nbi) for J in range(i // r, nbj)]
    bi = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    vm = pltpu.VMEM
    bt = b.T

    if form == "nt":
        b1_spec = pl.BlockSpec((bw, cj), lambda t, bi, bj: (0, bj[t]),
                               memory_space=vm)
        b1_arg = bt
    else:
        b1_spec = pl.BlockSpec((cj, bw), lambda t, bi, bj: (bj[t], 0),
                               memory_space=vm)
        b1_arg = b
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_t), lambda t, bi, bj: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((ri, M), lambda t, bi, bj: (bi[t], 0),
                         memory_space=vm),
            pl.BlockSpec((M, cj), lambda t, bi, bj: (0, bj[t]),
                         memory_space=vm),
            b1_spec,
            pl.BlockSpec((bw, ri), lambda t, bi, bj: (0, bi[t]),
                         memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((bw, N), lambda t, bi, bj: (0, 0), memory_space=vm),
            pl.BlockSpec((num_t, cj), lambda t, bi, bj: (0, 0),
                         memory_space=vm),
        ),
        scratch_shapes=[pltpu.VMEM((bw, N), jnp.float32),
                        pltpu.VMEM((num_t, cj), jnp.float32)],
    )
    fn = pl.pallas_call(
        functools.partial(k_sym_rect, num_t, ri, cj, form),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bw, N), jnp.float32),
            jax.ShapeDtypeStruct((num_t, cj), jnp.float32),
        ),
        interpret=interpret,
    )
    g = (gamma * LOG2E).reshape(1, 1)

    def run(bi, bj, g, thr, x, xt, e1, e2):
        acc, lanes = fn(bi, bj, g, thr, x, xt, e1, e2)
        return acc.T, jnp.sum(lanes, axis=1)

    args = (bi, bj, g, thr, coords, coords.T, b1_arg, bt)
    return jax.jit(run), args, coords, scores


def build_sym(num_t, tile, variant, interpret=False):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0)
    thr = jnp.asarray(np.linspace(0.5, 30.0, num_t), jnp.float32).reshape(1, num_t)
    b = jnp.concatenate([scores, coords, jnp.ones((N, 1), jnp.float32)], 1)
    bw = 2 * M + 1
    nblk = N // tile
    pairs = [(i, j) for i in range(nblk) for j in range(i, nblk)]
    bi = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    vm = pltpu.VMEM

    base_in = [
        pl.BlockSpec((1, 1), lambda t, bi, bj: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, num_t), lambda t, bi, bj: (0, 0), memory_space=vm),
        pl.BlockSpec((tile, M), lambda t, bi, bj: (bi[t], 0), memory_space=vm),
        pl.BlockSpec((M, tile), lambda t, bi, bj: (0, bj[t]), memory_space=vm),
    ]
    cnt_out_spec = pl.BlockSpec(
        (num_t, tile), lambda t, bi, bj: (0, 0), memory_space=vm
    )
    cnt_shape = jax.ShapeDtypeStruct((num_t, tile), jnp.float32)

    if variant == "rowmajor":
        kern = functools.partial(k_sym_rowmajor, num_t, tile)
        in_specs = base_in + [
            pl.BlockSpec((tile, bw), lambda t, bi, bj: (bj[t], 0),
                         memory_space=vm),
            pl.BlockSpec((tile, bw), lambda t, bi, bj: (bi[t], 0),
                         memory_space=vm),
        ]
        out_specs = (
            pl.BlockSpec((N, bw), lambda t, bi, bj: (0, 0), memory_space=vm),
            cnt_out_spec,
        )
        out_shape = (jax.ShapeDtypeStruct((N, bw), jnp.float32), cnt_shape)
        scratch = [pltpu.VMEM((N, bw), jnp.float32),
                   pltpu.VMEM((num_t, tile), jnp.float32)]
        extra_args = (b, b)
        post = lambda acc: acc  # (N, bw)
    else:
        form = variant.split("_", 1)[1]  # kt | rt | nt
        kern = functools.partial(k_sym_tsc, num_t, tile, form)
        bt = b.T  # (bw, N)
        if form in ("kt", "nt"):
            b1_spec = pl.BlockSpec((bw, tile), lambda t, bi, bj: (0, bj[t]),
                                   memory_space=vm)
            b1_arg = bt
        else:
            b1_spec = pl.BlockSpec((tile, bw), lambda t, bi, bj: (bj[t], 0),
                                   memory_space=vm)
            b1_arg = b
        in_specs = base_in + [
            b1_spec,
            pl.BlockSpec((bw, tile), lambda t, bi, bj: (0, bi[t]),
                         memory_space=vm),
        ]
        out_specs = (
            pl.BlockSpec((bw, nblk, tile), lambda t, bi, bj: (0, 0, 0),
                         memory_space=vm),
            cnt_out_spec,
        )
        out_shape = (
            jax.ShapeDtypeStruct((bw, nblk, tile), jnp.float32),
            cnt_shape,
        )
        scratch = [pltpu.VMEM((bw, nblk, tile), jnp.float32),
                   pltpu.VMEM((num_t, tile), jnp.float32)]
        extra_args = (b1_arg, bt)
        post = lambda acc: acc.reshape(bw, N).T  # back to (N, bw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    fn = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )
    g = (gamma * LOG2E).reshape(1, 1)

    def run(bi, bj, g, thr, x, xt, e1, e2):
        acc, lanes = fn(bi, bj, g, thr, x, xt, e1, e2)
        return post(acc), jnp.sum(lanes, axis=1)

    args = (bi, bj, g, thr, coords, coords.T) + extra_args
    return jax.jit(run), args, coords, scores


# --- baseline: the shipping fused kernel at its tuned tiles --------------


def build_ship():
    from svgdcpp_tpu.ops.pallas_phi import _phi_rbf_fused_pallas_cross_impl

    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0)
    thr = jnp.asarray(np.linspace(0.5, 30.0, T_EDGES), jnp.float32)

    def run(x, s, g, t):
        return _phi_rbf_fused_pallas_cross_impl(
            x, x, s, g, t, T_EDGES, 512, 2048, False
        )

    return jax.jit(run), (coords, scores, gamma, thr)


def timeit(fn, args, iters=100):
    out = fn(*args)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    interpret = jax.default_backend() != "tpu"
    if interpret:
        print("no TPU: correctness-only (interpret mode)", flush=True)
        ref_cnt = None
        ship_ms = float("nan")
    else:
        fn, args = build_ship()
        dt, out = timeit(fn, args)
        ship_ms = dt * 1e3
        ref_cnt = np.asarray(out[1], np.float64)
        print(f"shipping fused (512x2048, {T_EDGES} edges): {ship_ms:7.3f} "
              f"ms/sweep", flush=True)

    # f64 oracle for acc (phi contraction) from the f32 inputs
    rng = np.random.default_rng(0)
    c32 = np.asarray(rng.normal(size=(N, M)) * 2, np.float32)
    s32 = np.asarray(rng.normal(size=(N, M)), np.float32)
    c = c32.astype(np.float64)
    sqb = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    gamma = np.log(N) / 4.0
    kmat = np.exp(-gamma * sqb)
    b64 = np.concatenate([s32.astype(np.float64), c, np.ones((N, 1))], 1)
    acc_ref = kmat @ b64

    for tile in (256, 512, 1024):
        for variant in ("rowmajor", "tsc_kt", "tsc_rt", "tsc_nt"):
            try:
                fn, args, _, _ = build_sym(T_EDGES, tile, variant,
                                           interpret=interpret)
                if interpret:
                    out = fn(*args)
                    dt = float("nan")
                else:
                    dt, out = timeit(fn, args)
            except Exception as e:  # noqa: BLE001
                print(f"sym tile={tile} {variant}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                continue
            acc = np.asarray(out[0], np.float64)
            cnt = np.asarray(out[1], np.float64)
            acc_err = np.abs(acc - acc_ref).max() / np.abs(acc_ref).max()
            cnt_err = (np.abs(cnt - ref_cnt).max()
                       if ref_cnt is not None else float("nan"))
            print(
                f"sym tile={tile} {variant:9s} {dt * 1e3:7.3f} ms/sweep "
                f"({dt * 1e3 / ship_ms if ship_ms == ship_ms else 0:4.2f}x "
                f"ship) acc_rel={acc_err:.2e} cnt_err_vs_ship={cnt_err}",
                flush=True,
            )


# --- on-device timing: scan-chained sweeps (one dispatch, K iterations) ---


def scan_time(run_fn, coords, extra_builder, iters=80):
    """Chain `iters` sweeps inside one jitted lax.scan; a tiny data
    dependency through acc defeats loop hoisting. Returns per-sweep ms."""

    def body(x, _):
        acc, cnt = run_fn(x)
        x2 = x + 1e-30 * acc[:, :M]
        return x2, cnt[0]

    @jax.jit
    def prog(x):
        xf, cs = jax.lax.scan(body, x, None, length=iters)
        return xf, cs

    out = prog(coords)
    np.asarray(out[0])  # compile+warm
    t0 = time.perf_counter()
    out = prog(coords)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main_scan():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0)
    thr = jnp.asarray(np.linspace(0.5, 30.0, T_EDGES), jnp.float32)

    from svgdcpp_tpu.ops.pallas_phi import _phi_rbf_fused_pallas_cross_impl

    def ship_run(x):
        return _phi_rbf_fused_pallas_cross_impl(
            x, x, scores, gamma, thr, T_EDGES, 512, 2048, False
        )

    ms = scan_time(ship_run, coords, None)
    print(f"on-device shipping fused: {ms:7.3f} ms/sweep", flush=True)

    for tile in (256, 512, 1024):
        for variant in ("tsc_kt", "tsc_rt", "tsc_nt"):
            fn, args, _, _ = build_sym(T_EDGES, tile, variant)
            bi, bj, g, thrr, _, _, e1, e2 = args
            b_builder = args

            def sym_run(x, fn=fn, bi=bi, bj=bj, g=g, thrr=thrr,
                        variant=variant):
                b = jnp.concatenate(
                    [scores, x, jnp.ones((N, 1), jnp.float32)], 1
                )
                e1v = b.T if variant in ("tsc_kt", "tsc_nt") else b
                return fn(bi, bj, g, thrr, x, x.T, e1v, b.T)

            try:
                ms = scan_time(sym_run, coords, None)
                print(f"on-device sym tile={tile} {variant:7s}: {ms:7.3f} "
                      f"ms/sweep", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"on-device sym tile={tile} {variant}: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)




def main_rect():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    c32 = np.asarray(rng.normal(size=(N, M)) * 2, np.float32)
    s32 = np.asarray(rng.normal(size=(N, M)), np.float32)
    c = c32.astype(np.float64)
    sqb = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    gamma = np.log(N) / 4.0
    kmat = np.exp(-gamma * sqb)
    b64 = np.concatenate([s32.astype(np.float64), c, np.ones((N, 1))], 1)
    acc_ref = kmat @ b64

    ref_cnt = None
    if not interpret:
        fn, args = build_ship()
        dt, out = timeit(fn, args)
        ref_cnt = np.asarray(out[1], np.float64)
        print(f"micro shipping: {dt * 1e3:7.3f} ms/sweep", flush=True)

        from svgdcpp_tpu.ops.pallas_phi import _phi_rbf_fused_pallas_cross_impl
        rngj = np.random.default_rng(0)
        coords = jnp.asarray(rngj.normal(size=(N, M)) * 2, jnp.float32)
        scores = jnp.asarray(rngj.normal(size=(N, M)), jnp.float32)
        gammaj = jnp.float32(np.log(N) / 4.0)
        thrj = jnp.asarray(np.linspace(0.5, 30.0, T_EDGES), jnp.float32)

        def ship_run(x):
            return _phi_rbf_fused_pallas_cross_impl(
                x, x, scores, gammaj, thrj, T_EDGES, 512, 2048, False)

        ms = scan_time(ship_run, coords, None)
        print(f"on-device shipping: {ms:7.3f} ms/sweep", flush=True)

    for ri, cj in ((512, 2048), (256, 2048), (512, 1024), (1024, 2048),
                   (256, 1024)):
        for form in ("rt", "nt"):
            try:
                fn, args, coords, scoresj = build_rect(
                    T_EDGES, ri, cj, form, interpret=interpret)
                out = fn(*args)
                acc = np.asarray(out[0], np.float64)
                cnt = np.asarray(out[1], np.float64)
                acc_err = np.abs(acc - acc_ref).max() / np.abs(acc_ref).max()
                cnt_err = (np.abs(cnt - ref_cnt).max()
                           if ref_cnt is not None else float("nan"))
                if interpret:
                    print(f"rect ({ri}x{cj}) {form}: acc_rel={acc_err:.2e} "
                          f"cnt_err={cnt_err}", flush=True)
                    continue
                bi, bj, g, thrr = args[:4]
                scores2 = scoresj

                def rect_run(x, fn=fn, bi=bi, bj=bj, g=g, thrr=thrr,
                             form=form):
                    b = jnp.concatenate(
                        [scores2, x, jnp.ones((N, 1), jnp.float32)], 1)
                    e1 = b.T if form == "nt" else b
                    return fn(bi, bj, g, thrr, x, x.T, e1, b.T)

                ms = scan_time(rect_run, coords, None)
                print(f"on-device rect ({ri}x{cj}) {form}: {ms:7.3f} ms/sweep"
                      f"  acc_rel={acc_err:.2e} cnt_err_vs_ship={cnt_err}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"rect ({ri}x{cj}) {form}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


def main_uniform():
    """Branch-free rect-triangle variant (diagonal double-count + XLA
    correction epilogue) — correctness + on-device rate."""
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    c32 = np.asarray(rng.normal(size=(N, M)) * 2, np.float32)
    s32 = np.asarray(rng.normal(size=(N, M)), np.float32)
    c = c32.astype(np.float64)
    sqb = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    gamma = np.log(N) / 4.0
    kmat = np.exp(-gamma * sqb)
    b64 = np.concatenate([s32.astype(np.float64), c, np.ones((N, 1))], 1)
    acc_ref = kmat @ b64

    ref_cnt = None
    if not interpret:
        fn, args = build_ship()
        dt, out = timeit(fn, args)
        ref_cnt = np.asarray(out[1], np.float64)
        print(f"micro shipping: {dt * 1e3:7.3f} ms/sweep", flush=True)

    for ri, cj, v2 in ((512, 2048, False), (256, 2048, False),
                       (512, 1024, False), (512, 2048, True),
                       (256, 2048, True), (512, 1024, True)):
        try:
            fn, args, coords, scoresj = build_rect_uniform(
                T_EDGES, ri, cj, interpret=interpret, variant2=v2)
            out = fn(*args)
            acc = np.asarray(out[0], np.float64)
            cnt = np.asarray(out[1], np.float64)
            acc_err = np.abs(acc - acc_ref).max() / np.abs(acc_ref).max()
            cnt_err = (np.abs(cnt - ref_cnt).max()
                       if ref_cnt is not None else float("nan"))
            if interpret:
                print(f"rect_uniform ({ri}x{cj} v2={v2}): acc_rel={acc_err:.2e} "
                      f"cnt_err={cnt_err}", flush=True)
                continue
            bi, bj, g, thrr = args[:4]
            scores2 = scoresj

            def uni_run(x, fn=fn, bi=bi, bj=bj, g=g, thrr=thrr):
                b = jnp.concatenate(
                    [scores2, x, jnp.ones((N, 1), jnp.float32)], 1)
                return fn(bi, bj, g, thrr, x, x.T, b.T)

            ms = scan_time(uni_run, coords, None)
            print(f"on-device rect_uniform ({ri}x{cj} v2={v2}): {ms:7.3f} ms/sweep"
                  f"  acc_rel={acc_err:.2e} cnt_err_vs_ship={cnt_err}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"rect_uniform ({ri}x{cj} v2={v2}): FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    if "--scan" in sys.argv:
        main_scan()
    elif "--rect" in sys.argv:
        main_rect()
    elif "--uniform" in sys.argv:
        main_uniform()
    else:
        main()
