"""Fused Pallas TPU kernels for the O(n^2) hot ops.

Two kernels, both tiled over the n x n pair space so nothing O(n^2) ever
touches HBM (the ring-attention-shaped requirement, SURVEY.md §5):

  * ``phi_rbf_pallas``  — the phi contraction: per (i, j) tile, build the
    quadratic-form tile from Gram pieces (MXU), exponentiate in VMEM (VPU),
    and immediately contract against B = [S | X | 1] (MXU). This is the
    fused replacement for the reference's n^2 CppAD kernel evaluations +
    (m n) x n gradient stack + indexer matmul (reference SVGD.hpp:407-454).

  * ``count_le_pallas`` — the median-selection count pass: per tile, build
    the squared-distance tile and accumulate, for each of T thresholds, how
    many entries are <= it. EXPERIMENTAL: not wired into the median paths —
    on v5e the XLA compare/reduce (ops/median.count_le_cross) measured
    faster (XLA's fusion keeps the tile in VMEM already); kept as the
    starting point for multi-generation tuning.

Both kernels accept pre-padded inputs from their wrappers; padded rows carry
q = +inf so they contribute exp(-inf) = 0 / count 0 with no masks in the
inner loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_rows(arr, multiple, value=0.0):
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    width = ((0, pad),) + ((0, 0),) * (arr.ndim - 1)
    return jnp.pad(arr, width, constant_values=value)


def _pad_cols(arr, multiple, value=0.0):
    n = arr.shape[1]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    return jnp.pad(arr, ((0, 0), (0, pad)), constant_values=value)


#: log2(e): the fused kernels evaluate exp(-g*sq) as exp2(-(g*log2e)*sq) —
#: the VPU exp lowers to exp2 + multiply anyway, so folding the constant
#: into gamma (one scalar op per tile) saves a per-pair multiply.
_LOG2E = 1.4426950408889634


def _tile_counts(sq, thr_ref, num_t):
    """Selection counts for one VMEM-resident squared-distance tile.

    T sequential compare+reduce passes (a (TI, TJ, T) broadcast would blow
    VMEM; scalars stack instead). Shared by every counting kernel in this
    file so the count semantics cannot drift between them.
    """
    return jnp.stack(
        [
            jnp.sum((sq <= thr_ref[0, t]).astype(jnp.float32))
            for t in range(num_t)
        ]
    ).reshape(1, num_t)


# ----------------------------------------------------------------------
# phi kernel
# ----------------------------------------------------------------------


def _dot_precision(operand_dtype):
    """MXU precision for the f32 squared-distance (Gram cross) dots.

    On TPU the DEFAULT matmul precision feeds the MXU bf16 operands (one
    pass); for the squared-distance Gram dot that ~2^-8 rounding is
    amplified through exp(-gamma*sq) into percent-level phi error (measured
    2.9% RMS / 7.4% max vs the VPU-exact XLA sweep on v5e). f32 operands
    therefore use HIGHEST (multi-pass, f32-exact — Mosaic supports only
    DEFAULT and HIGHEST) on the CROSS dot. The big K-contraction dots
    (inner dimension = tile_j) stay DEFAULT: K's bf16 rounding enters phi
    linearly and averages out over sources (measured 4e-4 RMS end-to-end,
    vs a 2x step cost for HIGHEST there). The fused sweeps avoid even the
    cross-dot cost at small m by computing sq in the difference form on
    the VPU (_DIFF_FORM_MAX_M). Explicitly bf16 operands
    (dot_dtype='bfloat16') keep DEFAULT everywhere — the rounding is then
    the caller's documented opt-in.
    """
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(operand_dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


#: Up to this dimension the fused kernels build the squared-distance tile
#: with the cancellation-free difference form on the VPU (3m ops/pair,
#: f32-exact) instead of the Gram-identity MXU dot, which would need
#: HIGHEST precision for accuracy (6 passes — measured 0.6x the DEFAULT
#: rate at N=10k, while the diff form keeps the full rate). Mirrors the
#: XLA fused sweep's small-m rule (ops/phi.py).
_DIFF_FORM_MAX_M = 4

#: Row-padding coordinate for the diff-form tiles: targets pad at +_PAD_C,
#: sources at -_PAD_C, so every padded pair (target, source or both) gets
#: sq >= _PAD_C^2 ~ 1e38 -> exp -> 0 and no count, with no masks in the
#: inner loop (the diff-form twin of the q = +big trick).
_PAD_C = 1e19


def _phi_kernel(psd, x_ref, qi_ref, xps_ref, qj_ref, b_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    prec = _dot_precision(x_ref.dtype)
    cross = jnp.dot(x_ref[:], xps_ref[:].T, preferred_element_type=jnp.float32,
                    precision=prec)
    quad = qi_ref[:] + qj_ref[:].T - cross  # (TI, TJ)
    if psd:
        quad = jnp.maximum(quad, 0.0)
    k_tile = jnp.exp(-quad).astype(b_ref.dtype)
    out_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)


def _default_interpret() -> bool:
    # Compiled Mosaic kernels need real TPU hardware; anywhere else (the
    # 8-device CPU test mesh, debugging) fall back to the interpreter.
    return jax.default_backend() != "tpu"


def _pvary(x, axis):
    """pcast to varying iff not already varying over ``axis`` (pallas_call
    under shard_map check_vma requires every operand and output to share
    one vma type; pcast on an already-varying value is an error)."""
    if axis is None:
        return x
    vma = getattr(jax.typeof(x), "vma", frozenset())
    if axis in vma:
        return x
    return jax.lax.pcast(x, (axis,), to="varying")


def _out_struct(shape, dtype, vma_axis):
    if vma_axis is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset({vma_axis}))


@functools.partial(
    jax.jit,
    static_argnames=("tile_i", "tile_j", "interpret", "psd", "dot_dtype"),
)
def _phi_rbf_pallas_impl(
    coords: jnp.ndarray,
    scores: jnp.ndarray,
    p_matrix: jnp.ndarray,
    tile_i: int,
    tile_j: int,
    interpret: bool,
    psd: bool,
    dot_dtype: str = "float32",
) -> jnp.ndarray:
    """Fused RBF phi: phi = (K S - (K X - rowsum(K) X) (P+P^T)) / n.

    K = exp(-quad) is produced tile-wise in VMEM and contracted on the spot;
    the (n, n) matrix never exists. f32 with f32 MXU accumulation by
    default; ``dot_dtype='bfloat16'`` feeds the two MXU contractions bf16
    operands (f32 accumulation, q/exp stay f32) — ~2x MXU throughput at
    ~0.4% per-pair relative error, worthwhile only when m is large enough
    for the dots to dominate the exp (see docs/perf.md).
    """
    n, m = coords.shape
    ddt = jnp.dtype(dot_dtype)
    p_sym = (p_matrix + p_matrix.T).astype(jnp.float32)
    coords32 = coords.astype(jnp.float32)
    # phi is translation-invariant; centering protects the Gram-identity
    # quadratic form from f32 cancellation for off-origin clusters (same as
    # phi_rbf_cross). The final phi formula below is invariant under the
    # shift because K (1 c^T) = rowsum(K) c^T.
    coords32 = coords32 - jnp.mean(coords32, axis=0)
    q = jnp.sum((coords32 @ p_matrix.astype(jnp.float32)) * coords32, axis=1)
    xps = coords32 @ p_sym
    b = jnp.concatenate(
        [scores.astype(jnp.float32), coords32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )

    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    x_p = _pad_rows(coords32, tile_i).astype(ddt)
    qi_p = _pad_rows(q[:, None], tile_i, value=big)  # padded targets: junk rows
    xps_p = _pad_rows(xps, tile_j).astype(ddt)
    qj_p = _pad_rows(q[:, None], tile_j, value=big)  # padded sources: K -> 0
    b_p = _pad_rows(b, tile_j).astype(ddt)
    n_i = x_p.shape[0]
    n_j = xps_p.shape[0]
    bw = 2 * m + 1

    grid = (n_i // tile_i, n_j // tile_j)
    out = pl.pallas_call(
        functools.partial(_phi_kernel, psd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, bw), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, bw), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_i, bw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_i * n_j * (m + bw),
            bytes_accessed=4 * (n_i * (2 * m + 1 + bw) + n_j * (2 * m + 1 + bw)),
            transcendentals=n_i * n_j,
        ),
        interpret=interpret,
    )(x_p, qi_p, xps_p, qj_p, b_p)

    a = out[:n]
    ks = a[:, :m]
    kx = a[:, m : 2 * m]
    rowsum = a[:, 2 * m]
    phi = (ks - (kx - rowsum[:, None] * coords32) @ p_sym) / n
    return phi.astype(coords.dtype)


def phi_rbf_pallas(coords, scores, p_matrix, tile_i: int = 512,
                   tile_j: int = 1024, interpret=None, psd: bool = True,
                   dot_dtype: str = "float32"):
    """``psd=False`` skips the quadratic-form clamp (indefinite P — Hessian
    scale on a non-log-concave model); padded rows stay safe either way
    because their +big squared norms dominate the form."""
    if interpret is None:
        interpret = _default_interpret()
    return _phi_rbf_pallas_impl(coords, scores, p_matrix, tile_i, tile_j,
                                bool(interpret), bool(psd), str(dot_dtype))


# ----------------------------------------------------------------------
# fused phi + median-count kernel
# ----------------------------------------------------------------------


def _bf16x3_split(v):
    """bf16 hi/lo split via mantissa-mask bitcast (see _sq_tile notes on
    why NOT x - convert(convert(x), f32))."""
    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    hi = hi_f.astype(jnp.bfloat16)  # exact: mantissa already fits
    lo = (v - hi_f).astype(jnp.bfloat16)
    return hi, lo


def _bf16x3_cross(x, yt):
    """Packed bf16x3 cross product x @ yt (f32 operands, ~2^-16 relative
    error): the hi.hi + hi.lo + lo.hi partial products as one MXU dot of
    contraction depth 3m — see the _sq_tile docstring for why this packing
    is safe while the round-4 hi|lo packing was not."""
    x_hi, x_lo = _bf16x3_split(x)
    y_hi, y_lo = _bf16x3_split(yt)
    cat_x = jnp.concatenate([x_hi, x_hi, x_lo], axis=1)  # (TI, 3m)
    cat_y = jnp.concatenate([y_hi, y_lo, y_hi], axis=0)  # (3m, TJ)
    return jnp.dot(cat_x, cat_y, preferred_element_type=jnp.float32)


def _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref):
    """Squared-distance tile (TI, TJ), shared by the fused kernels.

    Sources arrive PRE-TRANSPOSED (``xjt_ref`` is (m, TJ), ``qjt_ref`` is
    (1, TJ)) so neither branch relayouts inside the kernel (the in-kernel
    transpose measured ~14% of the sweep at the N=10k shape).
    ``diff_m`` static non-None: the f32-exact VPU difference form over that
    many dimensions (q refs unused; padded rows carry +/-_PAD_C coordinates
    so their sq explodes). None: the Gram identity with q = +big padding —
    the f32 cross dot uses the manual bf16x3 hi/lo split below (~2^-16
    relative sq error), NOT HIGHEST (and not _dot_precision, which serves
    the non-fused _phi_kernel/_count_kernel).
    """
    if diff_m is not None:
        sq = None
        for k in range(diff_m):
            d = x_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]  # (TI, TJ)
            sq = d * d if sq is None else sq + d * d
        return sq
    if x_ref.dtype == jnp.float32:
        # Manual bf16x3 cross dot ("Precision.HIGH", which Mosaic does not
        # expose): hi/lo bf16 split, drop the lo*lo term — ~2^-16 relative
        # sq error (invisible through exp). Round 5: the THREE partial
        # products are packed into ONE dot by concatenating the pre-split
        # bf16 halves along the contraction axis ([x_hi|x_hi|x_lo] .
        # [y_hi;y_lo;y_hi], depth 3m — one MXU pass up to m = 42), which
        # measured at ~one-pass cost with unchanged bf16x3 accuracy
        # (scripts/probe_terms_batched.py: hier-shape sweep 0.79 -> 0.58
        # ms; accuracy re-verified on chip vs the f64 oracle,
        # KERNELS_r05.json). This is NOT the round-4 minefield packing
        # (docs/perf.md): that one concatenated hi|lo of the SAME operand
        # pair, relying on the compiler to reconstruct the f32 product
        # across the boundary; here each wanted product appears as its own
        # explicit depth segment and nothing must combine across segments.
        # The hi part is mantissa-masked via bitcast (not
        # x - convert(convert(x), f32), which the compiler may fold to
        # zero under excess-precision rules — optimization_barrier does
        # not lower in Mosaic); the masked hi is exactly representable in
        # bf16 and the f32 subtraction is exact.
        cross = _bf16x3_cross(x_ref[:], xjt_ref[:])
    else:
        # bf16 operands are the caller's documented opt-in rounding.
        cross = jnp.dot(x_ref[:], xjt_ref[:],
                        preferred_element_type=jnp.float32)
    return jnp.maximum(qi_ref[:] + qjt_ref[:] - 2.0 * cross, 0.0)


def _lane_counts(scratch_ref, sq, thr_ref, num_t):
    """Accumulate selection counts as (num_t, TJ) LANE vectors in a VMEM
    scratch: per threshold one sublane-direction reduce (cheap on the VPU)
    instead of a full-tile scalar reduction — cut the marginal cost per
    selection edge ~3x at the N=10k shape (scripts/tune_fused_kernel.py).
    Column identity is irrelevant (only the lane SUM is consumed), so every
    (i, j) tile adds its per-column partials at the same scratch offsets;
    the wrapper's XLA epilogue does the one lane reduction at the end.

    Count-noise bound: the accumulators are f32, exact up to 2^24 per
    lane. A lane receives ~n^2 / (2 * tile_j) pair contributions (sym
    sweeps halve the pairs), so per-lane totals stay exactly-integer up to
    n ~ 2.6e5 at tile_j = 2048 and carry ~2^-24 RELATIVE rounding beyond
    (n = 1M: per-lane ~2.4e8, absolute noise ~tens of counts out of
    10^12 — ~1e-7 relative). The warm-median machinery tolerates this by
    construction: counts feed a BRACKET check against rank bounds whose
    slack is O(n) counts, and the bisection fallback re-counts with the
    same kernel, so both sides carry identical noise (panel sweeps at
    n = 1M are posterior-verified on chip, docs/perf.md).
    """
    for t in range(num_t):
        scratch_ref[t, :] += jnp.sum(
            (sq <= thr_ref[0, t]).astype(jnp.float32), axis=0
        )


def _count_epilogue(i, j, cnt_ref, scratch_ref):
    """Zero the count scratch on the first grid step and flush it to the
    single (constant-index-map) output window on the last — the output is
    written exactly once, which keeps the kernel inside Pallas TPU's
    output-revisit contract (a (0, j) accumulator output would be revisited
    non-consecutively across i, which the official interpreter rejects)."""
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)

    @pl.when((i == ni - 1) & (j == nj - 1))
    def _():
        cnt_ref[:] = scratch_ref[:]


def _fused_kernel(diff_m, num_t, gamma_ref, thr_ref, x_ref, qi_ref, xjt_ref,
                  qjt_ref, b_ref, acc_ref, cnt_ref, cnt_scratch):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_scratch[:] = jnp.zeros_like(cnt_scratch)

    gamma2 = gamma_ref[0, 0] * _LOG2E  # scalar, once per tile
    sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)  # (TI, TJ)
    k_tile = jnp.exp2(-gamma2 * sq).astype(b_ref.dtype)
    acc_ref[:] += jnp.dot(k_tile, b_ref[:], preferred_element_type=jnp.float32)
    _lane_counts(cnt_scratch, sq, thr_ref, num_t)
    _count_epilogue(i, j, cnt_ref, cnt_scratch)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_thresholds", "tile_i", "tile_j", "interpret", "dot_dtype",
        "vma_axis",
    ),
)
def _phi_rbf_fused_pallas_cross_impl(
    targets, sources, source_scores, gamma, thresholds_sq, num_thresholds,
    tile_i, tile_j, interpret, dot_dtype: str = "float32", vma_axis=None,
):
    """Cross (sharded) form: ``targets`` is a local row shard, ``sources``
    the (all-gathered) global set. The self-pair entry point passes the
    same array for both. phi is normalized by the SOURCE count; counts
    cover this shard's disjoint row-band (psum over the mesh axis for
    global ranks). ``vma_axis`` types the pallas outputs (and pcasts every
    operand) as device-varying over that shard_map axis — required under
    check_vma."""
    n_t, m = targets.shape
    n_s = sources.shape[0]
    ddt = jnp.dtype(dot_dtype)
    # phi is translation-invariant; the GLOBAL (source-set) mean protects
    # the Gram-identity quadratic form from f32 cancellation off-origin.
    center = jnp.mean(sources.astype(jnp.float32), axis=0)
    targets32 = targets.astype(jnp.float32) - center
    sources32 = sources.astype(jnp.float32) - center
    gamma32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q_t = jnp.sum(targets32 * targets32, axis=1)
    q_s = jnp.sum(sources32 * sources32, axis=1)
    b = jnp.concatenate(
        [
            source_scores.astype(jnp.float32), sources32,
            jnp.ones((n_s, 1), jnp.float32),
        ],
        axis=1,
    )

    # Small m + f32: the kernel builds sq with the VPU difference form —
    # pad coordinates at +/-_PAD_C so padded pairs explode (see _sq_tile).
    diff_m = m if (m <= _DIFF_FORM_MAX_M and ddt == jnp.float32) else None
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(targets32, tile_i, value=pad_t).astype(ddt)
    qi_p = _pad_rows(q_t[:, None], tile_i, value=big)  # padded targets: junk
    xjt_p = _pad_cols(sources32.T, tile_j, value=pad_s).astype(ddt)
    qjt_p = _pad_cols(q_s[None, :], tile_j, value=big)  # K -> 0, counts skip
    b_p = _pad_rows(b, tile_j).astype(ddt)
    n_i = x_p.shape[0]
    n_j = xjt_p.shape[1]
    bw = 2 * m + 1
    thr = jnp.reshape(
        thresholds_sq.astype(jnp.float32), (1, num_thresholds)
    )

    grid = (n_i // tile_i, n_j // tile_j)
    operands = [
        _pvary(v, vma_axis)
        for v in (gamma32, thr, x_p, qi_p, xjt_p, qjt_p, b_p)
    ]
    acc, count_lanes = pl.pallas_call(
        functools.partial(_fused_kernel, diff_m, num_thresholds),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, num_thresholds), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile_i, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, bw), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_i, bw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_thresholds, tile_j), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            _out_struct((n_i, bw), jnp.float32, vma_axis),
            _out_struct((num_thresholds, tile_j), jnp.float32, vma_axis),
        ),
        scratch_shapes=[pltpu.VMEM((num_thresholds, tile_j), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_i * n_j * (m + bw + num_thresholds),
            bytes_accessed=4 * (n_i + n_j) * (2 * m + 2 + bw),
            transcendentals=n_i * n_j,
        ),
        interpret=interpret,
    )(*operands)

    a = acc[:n_t]
    ks = a[:, :m]
    kx = a[:, m : 2 * m]
    rowsum = a[:, 2 * m]
    gamma_f = jnp.asarray(gamma, jnp.float32)
    phi = (ks - 2.0 * gamma_f * (kx - rowsum[:, None] * targets32)) / n_s
    # padded source lanes carry zero counts, so the full-width reduce is safe
    return phi.astype(targets.dtype), jnp.sum(count_lanes, axis=1)


# ----------------------------------------------------------------------
# symmetric (upper-triangle) fused phi + median-count kernel
# ----------------------------------------------------------------------

#: Use the triangle sweep from this many particles up. Below it the
#: tile_j-padding overhead and the per-tile double accumulation beat the
#: halved pair count. Measured (v5e, 400-sweep scans, ms/sweep sym vs
#: square, scripts/bench_sym_ship.py): n=1024 0.083 vs 0.077 (sym loses),
#: n=2048 0.079 vs 0.088, n=4096 0.124 vs 0.130, n=10240 0.341 vs 0.425,
#: n=20480 1.040 vs 1.465; hier-family (m=11, 2 terms) n=10240 0.735 vs
#: 1.131.
_SYM_MIN_N = 2048

#: VMEM budget for the triangle sweep's full-width accumulator pair
#: (scratch + output, each (2m+1, n_pad) f32). Above it the accumulator
#: would crowd out the double-buffered operand windows; fall back to the
#: square sweep, whose outputs are row-blocked.
_SYM_ACC_VMEM_BYTES = 8 * 2**20


def _sym_eligible(n: int, m: int, tile_j: int) -> bool:
    n_pad = ((n + tile_j - 1) // tile_j) * tile_j
    return n >= _SYM_MIN_N and 2 * (2 * m + 1) * n_pad * 4 <= _SYM_ACC_VMEM_BYTES


def _resolve_sym(sym, n, m, tile_i, tile_j, panel_eligible):
    """Resolve a ``sym`` request to False | True | 'panel'.

    ``None`` (auto): triangle whenever eligible — full-width within the
    accumulator budget, panel-rotated past it, else the cross sweep. The
    triangle enumeration requires tile_j % tile_i == 0; explicit tiles
    that break it keep the cross sweep instead of raising (round-5 ADVICE
    fix — the cross sweep accepts any tile pair). ``True`` (force):
    advisory — picks the widest eligible triangle form ignoring the
    _SYM_MIN_N crossover, falling back to the cross sweep only when no
    triangle form can run the shape. Explicit False/'panel' pass through.
    """
    if sym is not None and sym is not True:
        return sym
    if tile_j % tile_i:
        return False
    if sym is True:
        fits = (
            2 * (2 * m + 1) * _ceil_mult(n, tile_j) * 4
            <= _SYM_ACC_VMEM_BYTES
        )
        return True if fits else (
            "panel" if panel_eligible(n, m, tile_j) else False
        )
    if n < _SYM_MIN_N:
        return False
    if _sym_eligible(n, m, tile_j):
        return True
    return "panel" if panel_eligible(n, m, tile_j) else False


def _sym_kernel(diff_m, num_t, ri, cj, big, n_real, bi_ref, bj_ref, gamma_ref,
                thr_ref, x_ref, qi_ref, xjt_ref, qjt_ref, btj_ref, bti_ref,
                acc_ref, cnt_ref, acc_sc, cnt_sc):
    """One upper-triangle super-tile (ri x cj) per grid step, enumerated by
    the scalar-prefetched (bi, bj) block arrays. sq(i,j) = sq(j,i), so each
    visited tile accumulates BOTH contraction directions into the
    transposed (bw, n_pad) VMEM accumulator:

        acc[:, rows bi] += B_j^T K^T     (an NT dot_general - no transpose)
        acc[:, cols bj] += B_i^T K

    The lower triangle is masked branch-free by routing sq through +big
    (K and the counts both die there); diagonal self-pairs are double
    counted by the two dots and corrected exactly in the XLA epilogue
    (K(i,i) = 1 => acc -= B^T; counts = 2*upper_sum - n). Net: the
    VPU-bound per-pair work (sq, exp2, selection compares) halves at
    unchanged MXU flops vs the square sweep (reference visits all n^2
    pairs, SVGD.hpp:445-449; measured 1.33x the sweep rate at N=10k)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)  # (ri, cj)
    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
    sq = jnp.where(gj >= gi, sq, big)
    # Pin the diagonal to EXACT zeros (only real rows: pads sit at n..n_pad
    # where the row and transposed-column pad coordinates differ): the
    # epilogue's K(i,i) = 1 correction and the 2*sum - n count fold then
    # hold exactly even on the bf16x3 Gram branch, whose ~2^-16 sq residue
    # would otherwise leak g*residue into every diagonal term.
    if diff_m is None:
        sq = jnp.where((gj == gi) & (gi < n_real), 0.0, sq)
    gamma2 = gamma_ref[0, 0] * _LOG2E
    k_tile = jnp.exp2(-gamma2 * sq).astype(btj_ref.dtype)

    r1t = jax.lax.dot_general(
        btj_ref[:], k_tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_sc[:, pl.ds(bi * ri, ri)] += r1t
    r2t = jnp.dot(bti_ref[:], k_tile, preferred_element_type=jnp.float32)
    acc_sc[:, pl.ds(bj * cj, cj)] += r2t
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acc_ref[:] = acc_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_thresholds", "tile_i", "tile_j", "interpret", "dot_dtype",
    ),
)
def _phi_rbf_fused_pallas_sym_impl(
    coords, scores, gamma, thresholds_sq, num_thresholds, tile_i, tile_j,
    interpret, dot_dtype: str = "float32",
):
    """Self-pair-only triangle form of _phi_rbf_fused_pallas_cross_impl
    (the sharded cross form stays a square sweep: a local row band of a
    global set has no exploitable symmetry). Same phi/counts contract."""
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    ddt = jnp.dtype(dot_dtype)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gamma32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q = jnp.sum(coords32 * coords32, axis=1)
    b = jnp.concatenate(
        [scores.astype(jnp.float32), coords32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )

    diff_m = m if (m <= _DIFF_FORM_MAX_M and ddt == jnp.float32) else None
    # Python float: the kernel closes over it as a static constant.
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    # Rows and the transposed column copy pad at OPPOSITE diff-form
    # coordinates so pad x pad pairs explode like pad x real ones.
    x_p = _pad_rows(coords32, tile_j, value=pad_t).astype(ddt)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_p = _pad_cols(coords32.T, tile_j, value=pad_s).astype(ddt)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    bt_p = _pad_cols(b.T, tile_j).astype(ddt)  # (bw, n_pad)
    n_pad = x_p.shape[0]
    bw = 2 * m + 1
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))

    # Upper-triangle super-tile enumeration: row block bi meets column
    # super-block bj iff bj's last column can reach bi's first row.
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
            pl.BlockSpec((1, num_thresholds), lambda t, bi, bj: (0, 0),
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
            pl.BlockSpec((num_thresholds, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bw, n_pad), jnp.float32),
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    acc_t, count_lanes = pl.pallas_call(
        functools.partial(_sym_kernel, diff_m, num_thresholds, tile_i,
                          tile_j, big, n),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bw, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_thresholds, tile_j), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(pairs) * tile_i * tile_j * (m + 2 * bw),
            bytes_accessed=4 * n_pad * (2 * m + 2 + 2 * bw),
            transcendentals=len(pairs) * tile_i * tile_j,
        ),
        interpret=interpret,
    )(bi_arr, bj_arr, gamma32, thr, x_p, qi_p, xjt_p, qjt_p, bt_p, bt_p)

    # Diagonal correction: K(i,i) = 1 entered both accumulation directions.
    a = acc_t[:, :n].T - b
    ks = a[:, :m]
    kx = a[:, m : 2 * m]
    rowsum = a[:, 2 * m]
    gamma_f = jnp.asarray(gamma, jnp.float32)
    phi = (ks - 2.0 * gamma_f * (kx - rowsum[:, None] * coords32)) / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi.astype(coords.dtype), counts


def phi_rbf_fused_pallas(coords, scores, gamma, thresholds_sq,
                         tile_i: int = 512, tile_j: int = 2048, interpret=None,
                         dot_dtype: str = "float32", sym=None):
    """Pallas twin of ops/phi.phi_rbf_fused_counts (isotropic RBF):
    one on-chip pass produces the phi contraction and the median-selection
    counts. Counts use the same sq tile as K: at m <= _DIFF_FORM_MAX_M
    (f32) that is the cancellation-free VPU difference form with EXACT
    self-pair zeros; at larger m the bf16x3-split Gram identity leaves
    ~2^-16 residue — rank noise far below what the verified selection can
    feel. ``dot_dtype='bfloat16'`` (experimental, opt-in) disables the
    diff form and runs one-pass bf16 Gram dots throughout (~2^-8 sq
    rounding); the selection stays count-verified, just noisier.

    ``sym`` selects the upper-triangle sweep (half the VPU-bound per-pair
    work; measured 1.33x the sweep rate at N=10k on v5e): None (default)
    auto-selects it when n and the accumulator VMEM footprint allow."""
    if interpret is None:
        interpret = _default_interpret()
    n, m = coords.shape
    if (tile_i == 512 and tile_j == 2048 and m > _DIFF_FORM_MAX_M
            and n <= 12288):
        # Chip A/B (round 5, docs/perf.md): the Gram branch prefers
        # 512x1024 tiles up to n ~ 12k (m=50: 7%/3%/48% at n=2048/4096/
        # 8192 — the 2048-wide tile hits a VMEM-pressure cliff at 8192;
        # m=11: 14%/4% at 4096/10240; 2048-wide wins again by 16384).
        # The m <= 4 diff branch measured fastest at 2048 throughout.
        tile_j = 1024
    # Full-width sym within the accumulator budget; past it the
    # panel-rotated form keeps the triangle (O(1)-in-n VMEM) up to
    # its own HBM/window ceilings; 'panel' forces it for testing.
    sym = _resolve_sym(sym, n, m, tile_i, tile_j, _sym_panel_eligible)
    if sym == "panel":
        return _phi_rbf_fused_pallas_sympanel_impl(
            coords, scores, gamma, thresholds_sq,
            int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
            str(dot_dtype),
        )
    if sym:
        return _phi_rbf_fused_pallas_sym_impl(
            coords, scores, gamma, thresholds_sq,
            int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
            str(dot_dtype),
        )
    return _phi_rbf_fused_pallas_cross_impl(
        coords, coords, scores, gamma, thresholds_sq,
        int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
        str(dot_dtype),
    )


#: Panel count floor for the panel-rotated triangle sweep: waste from the
#: rectangular diagonal panels is ~1/(2*nb) of the pair work, so nb = 8
#: caps it at ~6% while keeping the super-pair count (nb*(nb+1)/2 = 36)
#: and the per-panel VMEM window small.
_SYM_PANEL_MIN_BLOCKS = 8

#: Super-block width ceilings (chip-bisected round 4): for the
#: single-window kernel W = 126976 (the n=1M nb=8 plan, 5.1 MB window at
#: m=2) crashes the TPU compiler subprocess while W = 63488 (nb=16)
#: compiles and sweeps n=1M at 1.85 s vs the square sweep's 2.72 s. The
#: DUAL-window terms kernel is far tighter at m > 4: W = 6144 crashes,
#: W = 4096 compiles (82.7 vs the square's 110 ms at n=100k, m=11, T=2);
#: 8-aligning the window rows does not help.
_SYM_PANEL_MAX_W = 65536
_SYM_PANEL_MAX_W_DUAL_GRAM = 4096

#: Panel-count ceiling: with W pinned small (dual Gram case) the panel
#: count nb*(nb+1)/2 — and with it the HBM panel buffer and write-back
#: traffic — grows quadratically in n, so past this the square sweep wins.
_SYM_PANEL_MAX_BLOCKS = 32

#: HBM ceiling for the (bw, P*2W) panel output buffer: at fixed W the
#: buffer grows ~ (n/W)^2, so very large single-term sweeps (n ~ 4M+ at
#: m=2) would out-allocate the chip for particle data that is itself tiny
#: — those shapes keep the O(n)-memory square sweep.
_SYM_PANEL_MAX_HBM_BYTES = 2 * 2**30


def _ceil_mult(x: int, mult: int) -> int:
    """Round x up to a multiple of mult."""
    return -(-x // mult) * mult


def _sym_panel_plan(n: int, m: int, tile_j: int, dual: bool = False):
    """(nb, W, n_pad) super-block decomposition for the panel sweep.

    W (the super-block width) is a tile_j multiple; the rotating output
    window(s) — (2m+1, 2W) f32 combined — must fit the full-sym
    accumulator budget. Unlike the full-width sym accumulator this is
    independent of n, so the triangle form extends to ANY particle count
    (up to the eligibility ceilings; see _sym_panel_eligible /
    _sym_panel_terms_eligible). ``dual`` marks the two-rotating-window
    terms kernel, whose Gram-branch W ceiling is much lower."""
    bw = 2 * m + 1
    w_cap = (_SYM_PANEL_MAX_W_DUAL_GRAM
             if dual and m > _DIFF_FORM_MAX_M else _SYM_PANEL_MAX_W)
    w_max = min(_SYM_ACC_VMEM_BYTES // (bw * 4 * 2), w_cap)
    w_max = max(tile_j, (w_max // tile_j) * tile_j)
    nb = max(_SYM_PANEL_MIN_BLOCKS, -(-n // w_max))
    w = _ceil_mult(-(-n // nb), tile_j)
    return nb, w, nb * w


def _sym_panel_eligible(n: int, m: int, tile_j: int) -> bool:
    """Past-the-budget triangle eligibility for the SINGLE-term sweep:
    the window must genuinely fit the accumulator budget (very high m
    would need a sub-tile_j W — the plan's tile_j floor must not override
    the budget), and the quadratically-growing (bw, P*2W) HBM panel
    buffer must stay under _SYM_PANEL_MAX_HBM_BYTES (n ~ 4M+ at m=2
    would out-allocate the chip). Ineligible shapes keep the O(n)-memory
    square sweep."""
    bw = 2 * m + 1
    if _SYM_ACC_VMEM_BYTES // (bw * 4 * 2) < tile_j:
        return False
    nb, w, _ = _sym_panel_plan(n, m, tile_j)
    num_p = nb * (nb + 1) // 2
    return num_p * bw * 2 * w * 4 <= _SYM_PANEL_MAX_HBM_BYTES


def _sym_panel_terms_eligible(n: int, m: int, tile_j: int,
                              num_terms: int | None = None) -> bool:
    """Past-the-budget triangle eligibility for the MULTI-TERM sweep.

    Round 5: the DIRECT single-window panel kernel's chip-validated
    regions (see _sym_panel_terms_direct_plan) now cover the m <= 4 diff
    branch — the round-4 gap where the legacy dual-window kernel crashed
    at every wide-window plan — plus T=2 Gram shapes at band 24. Shapes
    outside the direct envelope fall back to the LEGACY region: Gram
    branch (m > 4) only, W = 4096, <= 32 super-blocks (~n <= 131k at
    m > 4); everything else keeps the square sweep. ``num_terms=None``
    (callers that do not know T yet) probes the common T=2 direct plan
    before the legacy rule."""
    for t in ((num_terms,) if num_terms is not None else (2,)):
        if _sym_panel_terms_direct_plan(n, m, t, 512, tile_j) is not None:
            return True
    if m <= _DIFF_FORM_MAX_M:
        return False
    # Legacy dual-window m ceiling (round-5 chip bisection at n=16384:
    # m = 11..24 compile, m >= 32 crashes the TPU compiler subprocess;
    # 25..31 share the crashed 32-row window class and are gated out).
    # Before this gate a composed m=50 kernel at n ~ 16k CRASHED at
    # runtime instead of falling back to the square sweep.
    if m > 24:
        return False
    nb, _, _ = _sym_panel_plan(n, m, tile_j, dual=True)
    return nb <= _SYM_PANEL_MAX_BLOCKS


def _sym_panel_kernel(diff_m, num_t, ri, cj, w, big, n_real, i_arr_ref,
                      j_arr_ref, gamma_ref, thr_ref, x_ref, qi_ref, xjt_ref,
                      qjt_ref, btj_ref, bti_ref, acc_ref, cnt_ref, cnt_sc):
    """Panel-rotated triangle sweep: grid (P, W/ri, W/cj) walks the
    upper-triangle SUPER-BLOCK pairs (I <= J, prefetched i_arr/j_arr); the
    (bw, 2W) output window holds one panel's two accumulation directions
    ([0, W) -> super-block I rows, [W, 2W) -> super-block J columns) and
    rotates per panel — VMEM use is independent of n, unlike _sym_kernel's
    full-width accumulator, so the halved per-pair VPU work extends past
    the _SYM_ACC_VMEM_BYTES ceiling (N=1M class). Diagonal panels (I == J)
    mask their lower triangle branch-free exactly as _sym_kernel; the XLA
    epilogue scatters panel halves onto the global accumulator and applies
    the same diagonal/count corrections."""
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    num_i = pl.num_programs(1)
    num_j = pl.num_programs(2)
    bi = i_arr_ref[p]
    bj = j_arr_ref[p]

    @pl.when((p == 0) & (i == 0) & (j == 0))
    def _():
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)  # (ri, cj)
    li = i * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    lj = j * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
    is_diag = bi == bj
    sq = jnp.where(is_diag & (lj < li), big, sq)
    # SENTINEL panels (bi > bj — only emitted by the sharded chunked
    # plan's padding) contribute nothing: every element masks to +big,
    # so K, the counts and the zeroed output window all stay zero.
    sq = jnp.where(bi > bj, big, sq)
    if diff_m is None:
        # Exact-zero diagonal pin, real rows only (see _sym_kernel).
        gi = bi * w + li
        sq = jnp.where(is_diag & (lj == li) & (gi < n_real), 0.0, sq)
    gamma2 = gamma_ref[0, 0] * _LOG2E
    k_tile = jnp.exp2(-gamma2 * sq).astype(btj_ref.dtype)

    r1t = jax.lax.dot_general(
        btj_ref[:], k_tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:, pl.ds(i * ri, ri)] += r1t
    r2t = jnp.dot(bti_ref[:], k_tile, preferred_element_type=jnp.float32)
    acc_ref[:, pl.ds(w + j * cj, cj)] += r2t
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when((p == pl.num_programs(0) - 1) & (i == num_i - 1)
             & (j == num_j - 1))
    def _():
        cnt_ref[:] = cnt_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_thresholds", "tile_i", "tile_j", "interpret", "dot_dtype",
        "panel_blocks",
    ),
)
def _phi_rbf_fused_pallas_sympanel_impl(
    coords, scores, gamma, thresholds_sq, num_thresholds, tile_i, tile_j,
    interpret, dot_dtype: str = "float32", panel_blocks: int | None = None,
):
    """Triangle sweep for n past the full-width accumulator budget: same
    phi/counts contract as _phi_rbf_fused_pallas_sym_impl, O(1)-in-n VMEM
    via the rotating (bw, 2W) panel window."""
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    ddt = jnp.dtype(dot_dtype)
    nb, w, n_pad = _sym_panel_plan(n, m, tile_j)
    if panel_blocks is not None:
        nb = panel_blocks
        w = _ceil_mult(-(-n // nb), tile_j)
        n_pad = nb * w
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gamma32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q = jnp.sum(coords32 * coords32, axis=1)
    b = jnp.concatenate(
        [scores.astype(jnp.float32), coords32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )

    diff_m = m if (m <= _DIFF_FORM_MAX_M and ddt == jnp.float32) else None
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(coords32, n_pad, value=pad_t).astype(ddt)
    qi_p = _pad_rows(q[:, None], n_pad, value=big)
    xjt_p = _pad_cols(coords32.T, n_pad, value=pad_s).astype(ddt)
    qjt_p = _pad_cols(q[None, :], n_pad, value=big)
    bt_p = _pad_cols(b.T, n_pad).astype(ddt)
    bw = 2 * m + 1
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))

    pairs = [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]
    i_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
    j_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)
    num_p = len(pairs)
    ni, nj = w // tile_i, w // tile_j

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_p, ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1), lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_thresholds),
                         lambda p, i, j, bi, bj: (0, 0),
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
            pl.BlockSpec((bw, 2 * w), lambda p, i, j, bi, bj: (0, p)),
            pl.BlockSpec((num_thresholds, tile_j),
                         lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    panels, count_lanes = pl.pallas_call(
        functools.partial(_sym_panel_kernel, diff_m, num_thresholds, tile_i,
                          tile_j, w, big, n),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bw, num_p * 2 * w), jnp.float32),
            jax.ShapeDtypeStruct((num_thresholds, tile_j), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_p * ni * nj * tile_i * tile_j * (m + 2 * bw),
            bytes_accessed=4 * n_pad * (2 * m + 2 + 2 * bw)
            + 4 * num_p * bw * 2 * w,
            transcendentals=num_p * ni * nj * tile_i * tile_j,
        ),
        interpret=interpret,
    )(i_arr, j_arr, gamma32, thr, x_p, qi_p, xjt_p, qjt_p, bt_p, bt_p)

    # Scatter panel halves onto the global (bw, n_pad) accumulator: half 0
    # is super-block I's row direction, half 1 super-block J's column
    # direction (block-granular adds — no element scatter).
    halves = panels.reshape(bw, num_p, 2, w)
    acc_blocks = jnp.zeros((bw, nb, w), jnp.float32)
    acc_blocks = acc_blocks.at[:, i_arr, :].add(halves[:, :, 0, :])
    acc_blocks = acc_blocks.at[:, j_arr, :].add(halves[:, :, 1, :])
    acc_t = acc_blocks.reshape(bw, n_pad)

    # Identical epilogue to the full-width sym form.
    a = acc_t[:, :n].T - b
    ks = a[:, :m]
    kx = a[:, m : 2 * m]
    rowsum = a[:, 2 * m]
    gamma_f = jnp.asarray(gamma, jnp.float32)
    phi = (ks - 2.0 * gamma_f * (kx - rowsum[:, None] * coords32)) / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi.astype(coords.dtype), counts


def sym_pairs_plan(n: int, num_chunks: int, tile_i: int = 512,
                   tile_j: int = 2048):
    """Static distribution plan for the SHARDED symmetric sweep.

    Splits the global upper-triangle super-tile list across ``num_chunks``
    devices (each unordered pair visited by exactly ONE device — the
    multi-chip extension of the single-chip triangle win: per-pair VPU
    work halves at unchanged MXU flops, traded against one (bw, n_pad)
    psum). Returns (pair_i, pair_j, n_pad, per_chunk) with the pair
    arrays padded to num_chunks * per_chunk using a SENTINEL pair that
    points at fully-padded row/column blocks (its contributions and
    counts are exactly zero), so every device runs an identical-shape
    grid.
    """
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    import numpy as _np

    r = tile_j // tile_i

    def build(npad):
        nbi, nbj = npad // tile_i, npad // tile_j
        return [(i, j) for i in range(nbi) for j in range(i // r, nbj)]

    n_pad = _ceil_mult(n, tile_j)
    pairs = build(n_pad)
    per = -(-len(pairs) // num_chunks)
    short = num_chunks * per - len(pairs)
    if short:
        # Sentinel = a STRICTLY lower-triangle tile: every element masks
        # to +big, so its phi contributions and counts are exactly zero
        # at no extra padding. Exists once the last row block starts past
        # the first column block; extend the padding in the (tiny-n)
        # corner where it does not.
        if (n_pad // tile_i - 1) * tile_i < tile_j:
            n_pad += tile_j
            pairs = build(n_pad)
            per = -(-len(pairs) // num_chunks)
            short = num_chunks * per - len(pairs)
        sentinel = (n_pad // tile_i - 1, 0)
        assert sentinel[0] * tile_i >= tile_j
        pairs = pairs + [sentinel] * short
    return (
        _np.asarray([p[0] for p in pairs], _np.int32),
        _np.asarray([p[1] for p in pairs], _np.int32),
        n_pad,
        per,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_pad", "num_thresholds", "tile_i", "tile_j",
                     "interpret", "vma_axis"),
)
def phi_rbf_fused_pallas_sym_sharded(
    coords, scores, gamma, thresholds_sq, pair_i, pair_j, *, n_pad,
    num_thresholds, tile_i: int = 512, tile_j: int = 2048, interpret=None,
    vma_axis=None,
):
    """One device's chunk of the GLOBAL symmetric fused sweep.

    ``coords``/``scores`` are the gathered GLOBAL set (identical on every
    device); ``pair_i``/``pair_j`` are this device's super-tile chunk from
    :func:`sym_pairs_plan` (dynamic values — slice them by
    ``lax.axis_index`` inside shard_map). Returns the RAW transposed
    accumulator (2m+1, n_pad) and count lanes — psum BOTH over the mesh
    axis, fold counts as 2*sum - n once globally, and finish each row
    band with :func:`phi_rbf_fused_sym_finish`."""
    if interpret is None:
        interpret = _default_interpret()
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gamma32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q = jnp.sum(coords32 * coords32, axis=1)
    b = jnp.concatenate(
        [scores.astype(jnp.float32), coords32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(coords32, n_pad, value=pad_t)
    qi_p = _pad_rows(q[:, None], n_pad, value=big)
    xjt_p = _pad_cols(coords32.T, n_pad, value=pad_s)
    qjt_p = _pad_cols(q[None, :], n_pad, value=big)
    bt_p = _pad_cols(b.T, n_pad)
    bw = 2 * m + 1
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))
    per = pair_i.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(per,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_thresholds), lambda t, bi, bj: (0, 0),
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
            pl.BlockSpec((num_thresholds, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bw, n_pad), jnp.float32),
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    operands = [
        _pvary(v, vma_axis)
        for v in (pair_i, pair_j, gamma32, thr, x_p, qi_p, xjt_p, qjt_p,
                  bt_p, bt_p)
    ]
    acc_t, count_lanes = pl.pallas_call(
        functools.partial(_sym_kernel, diff_m, num_thresholds, tile_i,
                          tile_j, big, n),
        grid_spec=grid_spec,
        out_shape=(
            _out_struct((bw, n_pad), jnp.float32, vma_axis),
            _out_struct((num_thresholds, tile_j), jnp.float32, vma_axis),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * per * tile_i * tile_j * (m + 2 * bw),
            bytes_accessed=4 * n_pad * (2 * m + 2 + 2 * bw),
            transcendentals=per * tile_i * tile_j,
        ),
        interpret=interpret,
    )(*operands)
    return acc_t, count_lanes


def phi_rbf_terms_fused_pallas_sym_sharded(
    coords, scores, gammas, signs, thresholds_sq, pair_i, pair_j, *, n_pad,
    num_thresholds, tile_i: int = 512, tile_j: int = 2048, interpret=None,
    vma_axis=None,
):
    """Multi-term twin of :func:`phi_rbf_fused_pallas_sym_sharded`: one
    device's chunk of the GLOBAL composed-kernel triangle sweep
    (_sym_terms_kernel with an externally supplied pair chunk). Returns
    the RAW (m, n_pad) k_c and (m+1, n_pad) W accumulators plus count
    lanes — psum all three, fold counts 2*sum - n once globally, finish
    bands with :func:`phi_rbf_terms_fused_sym_finish`."""
    # Normalize like every sibling wrapper: a list-typed static arg only
    # happens to work when this call is inlined under an outer trace.
    return _phi_rbf_terms_fused_pallas_sym_sharded_impl(
        coords, scores, list(gammas), tuple(float(s) for s in signs),
        thresholds_sq, pair_i, pair_j, n_pad=n_pad,
        num_thresholds=num_thresholds, tile_i=tile_i, tile_j=tile_j,
        interpret=interpret, vma_axis=vma_axis,
    )


@functools.partial(
    jax.jit,
    static_argnames=("signs", "n_pad", "num_thresholds", "tile_i", "tile_j",
                     "interpret", "vma_axis"),
)
def _phi_rbf_terms_fused_pallas_sym_sharded_impl(
    coords, scores, gammas, signs, thresholds_sq, pair_i, pair_j, *, n_pad,
    num_thresholds, tile_i: int = 512, tile_j: int = 2048, interpret=None,
    vma_axis=None,
):
    if interpret is None:
        interpret = _default_interpret()
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    num_terms = len(signs)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.reshape(
        jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas]),
        (1, num_terms),
    )
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate(
        [coords32, jnp.ones((n, 1), jnp.float32)], axis=1
    )

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(coords32, n_pad, value=pad_t)
    qi_p = _pad_rows(q[:, None], n_pad, value=big)
    xjt_p = _pad_cols(coords32.T, n_pad, value=pad_s)
    qjt_p = _pad_cols(q[None, :], n_pad, value=big)
    bst_p = _pad_cols(scores32.T, n_pad)
    xs1t_p = _pad_cols(xs1.T, n_pad)
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))
    per = pair_i.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(per,),
        in_specs=[
            pl.BlockSpec((1, num_terms), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_thresholds), lambda t, bi, bj: (0, 0),
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
        ],
        out_specs=(
            pl.BlockSpec((m, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m + 1, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_thresholds, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, n_pad), jnp.float32),
            pltpu.VMEM((m + 1, n_pad), jnp.float32),
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    operands = [
        _pvary(v, vma_axis)
        for v in (pair_i, pair_j, gammas32, thr, x_p, qi_p, xjt_p, qjt_p,
                  bst_p, xs1t_p, bst_p, xs1t_p)
    ]
    acck_t, accw_t, count_lanes = pl.pallas_call(
        functools.partial(
            _sym_terms_kernel, tuple(float(s) for s in signs), diff_m,
            num_thresholds, tile_i, tile_j, big, n,
        ),
        grid_spec=grid_spec,
        out_shape=(
            _out_struct((m, n_pad), jnp.float32, vma_axis),
            _out_struct((m + 1, n_pad), jnp.float32, vma_axis),
            _out_struct((num_thresholds, tile_j), jnp.float32, vma_axis),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * per * tile_i * tile_j
            * (m + 2 * (2 * m + 1) + 2 * num_terms),
            bytes_accessed=4 * n_pad * (4 * m + 4),
            transcendentals=num_terms * per * tile_i * tile_j,
        ),
        interpret=interpret,
    )(*operands)
    return acck_t, accw_t, count_lanes


@functools.partial(
    jax.jit,
    static_argnames=("signs", "n_pad", "num_thresholds", "tile_i", "tile_j",
                     "interpret", "vma_axis"),
)
def phi_rbf_terms_fused_pallas_sym_sharded_direct(
    coords, scores, gammas, signs, thresholds_sq, pair_i, pair_j, *, n_pad,
    num_thresholds, tile_i: int = 512, tile_j: int = 2048, interpret=None,
    vma_axis=None,
):
    """DIRECT-kernel sharded variant of
    :func:`phi_rbf_terms_fused_pallas_sym_sharded` (round 5): one device's
    chunk of the global triangle through _sym_terms_direct_kernel. Returns
    the RAW packed (num_terms * band, n_pad) accumulator (band =
    ceil8(2m+1); per-term bands) plus count lanes — psum both, fold counts
    2*sum - n once globally, finish bands with
    :func:`phi_rbf_terms_fused_sym_direct_finish`."""
    if interpret is None:
        interpret = _default_interpret()
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    signs = tuple(float(s) for s in signs)
    num_terms = len(signs)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas])
    gl = jnp.reshape(-(gammas32 * _LOG2E), (1, num_terms))
    q = jnp.sum(coords32 * coords32, axis=1)
    b = jnp.concatenate(
        [scores.astype(jnp.float32), coords32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
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
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))
    per = pair_i.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(per,),
        in_specs=[
            pl.BlockSpec((1, num_terms), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_thresholds), lambda t, bi, bj: (0, 0),
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
                         lambda t, bi, bj: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_thresholds, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_terms * band, n_pad), jnp.float32),
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    operands = [
        _pvary(v, vma_axis)
        for v in (pair_i, pair_j, gl, thr, x_p, qi_p, xjt_p, qjt_p, bt_p,
                  bt_p)
    ]
    acc_t, count_lanes = pl.pallas_call(
        functools.partial(
            _sym_terms_direct_kernel, num_terms, diff_m, num_thresholds,
            tile_i, tile_j, big, n, band,
        ),
        grid_spec=grid_spec,
        out_shape=(
            _out_struct((num_terms * band, n_pad), jnp.float32, vma_axis),
            _out_struct((num_thresholds, tile_j), jnp.float32, vma_axis),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * per * tile_i * tile_j * (3 * m + 2 * num_terms * bw),
            bytes_accessed=4 * n_pad * (3 * m + 3 + num_terms * band),
            transcendentals=num_terms * per * tile_i * tile_j,
        ),
        interpret=interpret,
    )(*operands)
    return acc_t, count_lanes


def phi_rbf_terms_fused_sym_direct_finish(acc_band_t, scores_band,
                                          coords_band, center, gammas32,
                                          signs, n):
    """Per-band epilogue of the DIRECT sharded multi-term symmetric sweep:
    ``acc_band_t`` is this device's (num_terms * band, n_local) column
    band of the PSUMMED packed accumulator; each term's k_t(i, i) = 1
    entered both accumulation directions, so subtract B once per term
    before combining with the signs/gammas."""
    m = coords_band.shape[1]
    bw = 2 * m + 1
    band = _ceil_mult(bw, 8)
    coords32 = coords_band.astype(jnp.float32) - center
    b = jnp.concatenate(
        [scores_band.astype(jnp.float32), coords32,
         jnp.ones((coords_band.shape[0], 1), jnp.float32)],
        axis=1,
    )
    g_arr = jnp.reshape(jnp.asarray(gammas32, jnp.float32), (-1,))
    phi = None
    for t_i, s in enumerate(signs):
        a = acc_band_t[t_i * band : t_i * band + bw].T - b
        ks = a[:, :m]
        kx = a[:, m : 2 * m]
        rowsum = a[:, 2 * m]
        phi_t = ks - 2.0 * g_arr[t_i] * (kx - rowsum[:, None] * coords32)
        phi_t = float(s) * phi_t
        phi = phi_t if phi is None else phi + phi_t
    phi = phi / n
    return phi.astype(coords_band.dtype)


def phi_rbf_terms_fused_sym_finish(acck_band_t, accw_band_t, scores_band,
                                   coords_band, center, gammas32, signs, n):
    """Per-band epilogue of the sharded multi-term symmetric sweep:
    psummed (m, n_local) k_c and (m+1, n_local) W column bands -> phi,
    with the diagonal double-count corrections of the single-chip terms
    sym form."""
    m = coords_band.shape[1]
    coords32 = coords_band.astype(jnp.float32) - center
    scores32 = scores_band.astype(jnp.float32)
    xs1 = jnp.concatenate(
        [coords32, jnp.ones((coords_band.shape[0], 1), jnp.float32)],
        axis=1,
    )
    s_sum = float(sum(float(s) for s in signs))
    sg_sum = jnp.sum(
        jnp.reshape(gammas32, (-1,))
        * jnp.asarray([float(s) for s in signs], jnp.float32)
    )
    ks = acck_band_t.T - s_sum * scores32
    aw = accw_band_t.T - sg_sum * xs1
    wx = aw[:, :m]
    w_rowsum = aw[:, m]
    phi = (ks - 2.0 * (wx - w_rowsum[:, None] * coords32)) / n
    return phi.astype(coords_band.dtype)


def sym_sharded_plan(n: int, m: int, num_chunks: int, tile_i: int = 512,
                     tile_j: int = 2048):
    """Gated distribution plan for the symmetric sharded sweep: None when
    the shape is outside the triangle regime or the (2m+1, n_pad)
    accumulator pair — budgeted against the plan's ACTUAL
    sentinel-extended n_pad — exceeds the VMEM budget; else
    (pair_i, pair_j, n_pad, per_chunk) as numpy arrays."""
    if not _sym_eligible(n, m, tile_j):
        return None
    plan = sym_pairs_plan(n, num_chunks, tile_i, tile_j)
    if 2 * (2 * m + 1) * plan[2] * 4 > _SYM_ACC_VMEM_BYTES:
        return None
    return plan


def sym_panel_sharded_plan(n: int, m: int, num_chunks: int,
                           tile_i: int = 512, tile_j: int = 2048):
    """Chunked distribution plan for the PANEL-ROTATED symmetric sweep —
    the round-5 extension that carries the triangle past the full-width
    accumulator budget on a mesh (round-4 gap: both multi-chip engines
    fell back to the ordered cross sweep at n ~ 200k+, m=2, exactly
    where multi-chip matters most).

    The single-chip super-block decomposition (_sym_panel_plan) yields
    nb*(nb+1)/2 upper-triangle PANELS; this splits that panel list across
    ``num_chunks`` devices (each unordered pair visited by exactly one
    device), padded to equal chunks with SENTINEL panels (bi > bj) that
    the kernel masks to zero contribution. Per-device memory: the
    rotating (2m+1, 2W) VMEM window (independent of n) plus a
    (2m+1, per*2W) HBM panel buffer that SHRINKS with the device count.

    Returns (pair_i, pair_j, nb, w, n_pad, per_chunk) or None when the
    shape is outside the panel regime (use sym_sharded_plan's full-width
    form below the budget — it is cheaper than panels when it fits).
    Reference mechanism being halved and distributed: the n^2 ordered
    phi loop, SVGD.hpp:445-449 (SURVEY §5's ring-attention analog)."""
    if tile_j % tile_i:
        return None
    if n < _SYM_MIN_N or not _sym_panel_eligible(n, m, tile_j):
        return None
    import numpy as _np

    nb, w, n_pad = _sym_panel_plan(n, m, tile_j)
    pairs = [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]
    per = -(-len(pairs) // num_chunks)
    short = num_chunks * per - len(pairs)
    pairs = pairs + [(nb - 1, 0)] * short  # sentinels: bi > bj
    return (
        _np.asarray([p[0] for p in pairs], _np.int32),
        _np.asarray([p[1] for p in pairs], _np.int32),
        nb,
        w,
        n_pad,
        per,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nb", "w", "num_thresholds", "tile_i", "tile_j",
                     "interpret", "vma_axis"),
)
def phi_rbf_fused_pallas_sympanel_sharded(
    coords, scores, gamma, thresholds_sq, pair_i, pair_j, *, nb, w,
    num_thresholds, tile_i: int = 512, tile_j: int = 2048, interpret=None,
    vma_axis=None,
):
    """One device's panel chunk of the GLOBAL symmetric panel sweep.

    ``coords``/``scores`` are the gathered GLOBAL set; ``pair_i``/
    ``pair_j`` this device's super-block pairs from
    :func:`sym_panel_sharded_plan` (slice by ``lax.axis_index`` inside
    shard_map). Runs the same rotating-window kernel as the single-chip
    panel sweep (_sym_panel_kernel — sentinel pairs mask to zero) over
    the chunk, then block-scatter-adds the panel halves onto this
    device's (2m+1, n_pad) accumulator. Returns (acc_t, count_lanes) —
    psum BOTH over the mesh axis, fold counts 2*sum - n once globally,
    and finish each row band with :func:`phi_rbf_fused_sym_finish`."""
    if interpret is None:
        interpret = _default_interpret()
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    n_pad = nb * w
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gamma32 = jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1))
    q = jnp.sum(coords32 * coords32, axis=1)
    b = jnp.concatenate(
        [scores.astype(jnp.float32), coords32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(coords32, n_pad, value=pad_t)
    qi_p = _pad_rows(q[:, None], n_pad, value=big)
    xjt_p = _pad_cols(coords32.T, n_pad, value=pad_s)
    qjt_p = _pad_cols(q[None, :], n_pad, value=big)
    bt_p = _pad_cols(b.T, n_pad)
    bw = 2 * m + 1
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))

    per = pair_i.shape[0]
    ni, nj = w // tile_i, w // tile_j

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(per, ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1), lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_thresholds),
                         lambda p, i, j, bi, bj: (0, 0),
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
            pl.BlockSpec((bw, 2 * w), lambda p, i, j, bi, bj: (0, p)),
            pl.BlockSpec((num_thresholds, tile_j),
                         lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    operands = [
        _pvary(v, vma_axis)
        for v in (pair_i, pair_j, gamma32, thr, x_p, qi_p, xjt_p, qjt_p,
                  bt_p, bt_p)
    ]
    panels, count_lanes = pl.pallas_call(
        functools.partial(_sym_panel_kernel, diff_m, num_thresholds, tile_i,
                          tile_j, w, big, n),
        grid_spec=grid_spec,
        out_shape=(
            _out_struct((bw, per * 2 * w), jnp.float32, vma_axis),
            _out_struct((num_thresholds, tile_j), jnp.float32, vma_axis),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * per * ni * nj * tile_i * tile_j * (m + 2 * bw),
            bytes_accessed=4 * n_pad * (2 * m + 2 + 2 * bw)
            + 4 * per * bw * 2 * w,
            transcendentals=per * ni * nj * tile_i * tile_j,
        ),
        interpret=interpret,
    )(*operands)

    # Block-granular scatter of this chunk's panel halves onto the local
    # (bw, n_pad) accumulator (sentinel halves are exact zeros).
    halves = panels.reshape(bw, per, 2, w)
    acc_blocks = _pvary(jnp.zeros((bw, nb, w), jnp.float32), vma_axis)
    acc_blocks = acc_blocks.at[:, pair_i, :].add(halves[:, :, 0, :])
    acc_blocks = acc_blocks.at[:, pair_j, :].add(halves[:, :, 1, :])
    return acc_blocks.reshape(bw, n_pad), count_lanes


def sym_panel_sharded_phi(coords_local, scores_local, sources,
                          scores_global, axis, sym_pi, sym_pj, sym_per,
                          sym_nb, sym_w, thresholds, *, gamma):
    """shard_map-side schedule of the PANEL symmetric distributed sweep
    (single-term RBF; the past-the-budget sibling of sym_sharded_phi,
    shared by ShardedSVGD and the driver's SVGDOptions.mesh wrapper).
    Returns (phi_local, counts_global)."""
    d_idx = jax.lax.axis_index(axis)
    pi = jax.lax.dynamic_slice(sym_pi, (d_idx * sym_per,), (sym_per,))
    pj = jax.lax.dynamic_slice(sym_pj, (d_idx * sym_per,), (sym_per,))
    n_glob = sources.shape[0]
    num_thr = int(thresholds.shape[0])
    center = jnp.mean(sources.astype(jnp.float32), axis=0)
    nl = coords_local.shape[0]
    zero = jnp.zeros((), d_idx.dtype)

    acc_raw, lanes = phi_rbf_fused_pallas_sympanel_sharded(
        sources, scores_global, gamma, thresholds, pi, pj, nb=sym_nb,
        w=sym_w, num_thresholds=num_thr, vma_axis=axis,
    )
    acc = jax.lax.psum(acc_raw, axis)
    band = jax.lax.dynamic_slice(
        acc, (zero, d_idx * nl), (acc.shape[0], nl)
    )
    phi_local = phi_rbf_fused_sym_finish(
        band, scores_local, coords_local, center, gamma, n_glob
    )
    counts = 2.0 * jnp.sum(
        jax.lax.psum(lanes, axis), axis=1
    ) - jnp.float32(n_glob)
    return phi_local, counts


def sym_sharded_phi(coords_local, scores_local, sources, scores_global,
                    axis, sym_pi, sym_pj, sym_per, sym_n_pad, thresholds,
                    *, gamma=None, gammas=None, signs=None):
    """The shard_map-side schedule of the symmetric distributed sweep,
    shared by ShardedSVGD.fused_sym and the driver's SVGDOptions.mesh
    wrapper (single definition — the chunk slicing, psums, count fold and
    band epilogue must not drift between engines).

    Pass ``gamma`` for the built-in single RBF or ``gammas``+``signs``
    for the fused-terms composed family. ``sym_pi``/``sym_pj``/``sym_per``
    come from :func:`sym_sharded_plan` chunked by the size of mesh axis
    ``axis`` (axis 0 — the only axis that consumes chunks). Returns
    (phi_local, counts_global)."""
    d_idx = jax.lax.axis_index(axis)
    pi = jax.lax.dynamic_slice(sym_pi, (d_idx * sym_per,), (sym_per,))
    pj = jax.lax.dynamic_slice(sym_pj, (d_idx * sym_per,), (sym_per,))
    n_glob = sources.shape[0]
    num_thr = int(thresholds.shape[0])
    center = jnp.mean(sources.astype(jnp.float32), axis=0)
    nl = coords_local.shape[0]
    zero = jnp.zeros((), d_idx.dtype)

    def band_of(a):
        return jax.lax.dynamic_slice(
            a, (zero, d_idx * nl), (a.shape[0], nl)
        )

    if gammas is None:
        acc_raw, lanes = phi_rbf_fused_pallas_sym_sharded(
            sources, scores_global, gamma, thresholds, pi, pj,
            n_pad=sym_n_pad, num_thresholds=num_thr, vma_axis=axis,
        )
        acc = jax.lax.psum(acc_raw, axis)
        phi_local = phi_rbf_fused_sym_finish(
            band_of(acc), scores_local, coords_local, center, gamma, n_glob
        )
    elif _terms_direct_fits_npad(len(signs), coords_local.shape[1],
                                 sym_n_pad):
        # Round 5: the DIRECT per-term kernel where its packed
        # accumulator fits (same crossover as the single-chip wrapper).
        acc_r, lanes = phi_rbf_terms_fused_pallas_sym_sharded_direct(
            sources, scores_global, list(gammas), signs, thresholds, pi,
            pj, n_pad=sym_n_pad, num_thresholds=num_thr, vma_axis=axis,
        )
        acc = jax.lax.psum(acc_r, axis)
        phi_local = phi_rbf_terms_fused_sym_direct_finish(
            band_of(acc), scores_local, coords_local, center,
            jnp.stack(list(gammas)), signs, n_glob,
        )
    else:
        acck_r, accw_r, lanes = phi_rbf_terms_fused_pallas_sym_sharded(
            sources, scores_global, list(gammas), signs, thresholds, pi, pj,
            n_pad=sym_n_pad, num_thresholds=num_thr, vma_axis=axis,
        )
        acck = jax.lax.psum(acck_r, axis)
        accw = jax.lax.psum(accw_r, axis)
        phi_local = phi_rbf_terms_fused_sym_finish(
            band_of(acck), band_of(accw), scores_local, coords_local,
            center, jnp.stack(list(gammas)), signs, n_glob,
        )
    counts = 2.0 * jnp.sum(
        jax.lax.psum(lanes, axis), axis=1
    ) - jnp.float32(n_glob)
    return phi_local, counts


def phi_rbf_fused_sym_finish(acc_band_t, scores_band, coords_band, center,
                             gamma, n):
    """Per-band epilogue of the sharded symmetric sweep: ``acc_band_t`` is
    this device's (2m+1, n_local) column band of the PSUMMED global
    accumulator; applies the same diagonal double-count correction and phi
    assembly as the single-chip sym form."""
    m = coords_band.shape[1]
    coords32 = coords_band.astype(jnp.float32) - center
    b = jnp.concatenate(
        [scores_band.astype(jnp.float32), coords32,
         jnp.ones((coords_band.shape[0], 1), jnp.float32)],
        axis=1,
    )
    a = acc_band_t.T - b
    ks = a[:, :m]
    kx = a[:, m : 2 * m]
    rowsum = a[:, 2 * m]
    gamma_f = jnp.asarray(gamma, jnp.float32)
    phi = (ks - 2.0 * gamma_f * (kx - rowsum[:, None] * coords32)) / n
    return phi.astype(coords_band.dtype)


def phi_rbf_fused_pallas_cross(targets, sources, source_scores, gamma,
                               thresholds_sq, tile_i: int = 512,
                               tile_j: int = 2048, interpret=None,
                               dot_dtype: str = "float32", axis_name=None):
    """Mosaic twin of ops/phi.phi_rbf_cross_fused_counts for the SHARDED
    fused sweep: each device runs the VMEM-resident kernel over its local
    row shard x the gathered global set. Pass ``axis_name`` when called
    inside shard_map (types the pallas outputs device-varying under
    check_vma); counts are this shard's row-band — psum them."""
    if interpret is None:
        interpret = _default_interpret()
    if (tile_i == 512 and tile_j == 2048
            and targets.shape[1] > _DIFF_FORM_MAX_M
            and sources.shape[0] <= 12288):
        tile_j = 1024  # Gram-branch small-n tile rule (see the self-pair
        # wrapper); applied on the gathered-source count
    return _phi_rbf_fused_pallas_cross_impl(
        targets, sources, source_scores, gamma, thresholds_sq,
        int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
        str(dot_dtype), vma_axis=axis_name,
    )


# ----------------------------------------------------------------------
# count kernel (median selection)
# ----------------------------------------------------------------------


def _count_kernel(thr_ref, x_ref, qi_ref, xj_ref, qj_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cross = jnp.dot(x_ref[:], xj_ref[:].T, preferred_element_type=jnp.float32,
                    precision=_dot_precision(x_ref.dtype))
    sq = jnp.maximum(qi_ref[:] + qj_ref[:].T - 2.0 * cross, 0.0)  # (TI, TJ)
    out_ref[:] += _tile_counts(sq, thr_ref, out_ref.shape[1])


def count_le_pallas(
    rows_coords: jnp.ndarray,
    cols_coords: jnp.ndarray,
    thresholds: jnp.ndarray,
    *,
    num_thresholds: int,
    tile_i: int = 512,
    tile_j: int = 1024,
    interpret=None,
) -> jnp.ndarray:
    """Counts of ||r_i - c_j||^2 <= t for each threshold, fused on-chip.

    ``num_thresholds`` must be static (the kernel unrolls over it). Padded
    rows get q = +inf so sq = +inf and never counts. Inputs are shifted by
    the column mean like the XLA counterpart count_le_cross (f32
    Gram-identity cancellation guard; exact for the distances).
    """
    if interpret is None:
        interpret = _default_interpret()
    rows32 = rows_coords.astype(jnp.float32)
    cols32 = cols_coords.astype(jnp.float32)
    center = jnp.mean(cols32, axis=0)
    rows32 = rows32 - center
    cols32 = cols32 - center
    q_r = jnp.sum(rows32 * rows32, axis=1)
    q_c = jnp.sum(cols32 * cols32, axis=1)

    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    x_p = _pad_rows(rows32, tile_i)
    qi_p = _pad_rows(q_r[:, None], tile_i, value=big)
    xj_p = _pad_rows(cols32, tile_j)
    qj_p = _pad_rows(q_c[:, None], tile_j, value=big)
    m = rows32.shape[1]
    n_i = x_p.shape[0]
    n_j = xj_p.shape[0]
    thr = jnp.reshape(thresholds.astype(jnp.float32), (1, num_thresholds))

    grid = (n_i // tile_i, n_j // tile_j)
    out = pl.pallas_call(
        _count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, num_thresholds), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile_i, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, num_thresholds), lambda i, j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, num_thresholds), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_i * n_j * (m + num_thresholds),
            bytes_accessed=4 * (n_i + n_j) * (m + 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(thr, x_p, qi_p, xj_p, qj_p)
    return out[0]


# ----------------------------------------------------------------------
# fused multi-term phi + median-count kernel (composed isotropic RBFs)
# ----------------------------------------------------------------------


def _fused_terms_kernel(signs, diff_m, num_t, gammas_ref, thr_ref, x_ref,
                        qi_ref, xjt_ref, qjt_ref, bs_ref, xs1_ref, acc_ref,
                        cnt_ref, cnt_scratch):
    """Per (i, j) tile: shared sq block -> T exps combined into k_c / w
    (see ops/phi.phi_rbf_terms_cross_fused_counts) -> two MXU contractions
    + lane-resident selection counts, all in VMEM. ``signs`` is a static
    tuple closed over by the wrapper; gammas arrive in SMEM (all provably
    positive, so padded rows' huge sq still decays to zero)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_scratch[:] = jnp.zeros_like(cnt_scratch)

    sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)  # (TI, TJ)
    k_c = None
    w = None
    for t, s in enumerate(signs):
        g = gammas_ref[0, t]
        k_t = jnp.exp2(-(g * _LOG2E) * sq)
        k_term = s * k_t
        w_term = (s * g) * k_t
        k_c = k_term if k_c is None else k_c + k_term
        w = w_term if w is None else w + w_term
    a_tile = jnp.concatenate(
        [
            jnp.dot(k_c, bs_ref[:], preferred_element_type=jnp.float32),
            jnp.dot(w, xs1_ref[:], preferred_element_type=jnp.float32),
        ],
        axis=1,
    )
    acc_ref[:] += a_tile
    _lane_counts(cnt_scratch, sq, thr_ref, num_t)
    _count_epilogue(i, j, cnt_ref, cnt_scratch)


def _terms_cross_impl_for(m: int):
    """Cross-form impl selection (round-5 A/B on chip): the DIRECT kernel
    wins on the diff branch (m=2: 0.92 -> 0.77 ms at n=10240, 1.19x; n=131k
    1.07x — the dropped k_c/w assembly dominates) but LOSES at m=11
    (1.44 -> 1.50 ms: T*bw output lanes double the accumulate traffic
    while the Gram sq is already shared), so the Gram branch keeps the
    legacy k_c/w form."""
    return (
        _phi_rbf_terms_fused_pallas_cross_direct_impl
        if m <= _DIFF_FORM_MAX_M
        else _phi_rbf_terms_fused_pallas_cross_impl
    )


def _fused_terms_direct_kernel(num_terms, diff_m, num_t, bw, gl_ref,
                               thr_ref, x_ref, qi_ref, xjt_ref, qjt_ref,
                               bt_ref, acc_ref, cnt_ref, cnt_scratch):
    """DIRECT cross form (round 5): each term's k_t contracts straight
    against B = [S | X | 1]; per-term results concatenate along the lane
    axis into ONE (TI, T*bw) row-blocked accumulator and the signs/gammas
    combine in the XLA epilogue — no per-pair k_c/w assembly (see
    _sym_terms_direct_kernel for the measurement story). Gram branch
    rides pre-scaled sources (xjt = -2x)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        cnt_scratch[:] = jnp.zeros_like(cnt_scratch)

    if diff_m is not None:
        sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)
    else:
        cross2 = _bf16x3_cross(x_ref[:], xjt_ref[:])
        sq = jnp.maximum(qi_ref[:] + qjt_ref[:] + cross2, 0.0)
    a_tile = jnp.concatenate(
        [
            jnp.dot(
                jnp.exp2(gl_ref[0, t] * sq), bt_ref[:],
                preferred_element_type=jnp.float32,
            )
            for t in range(num_terms)
        ],
        axis=1,
    )
    acc_ref[:] += a_tile
    _lane_counts(cnt_scratch, sq, thr_ref, num_t)
    _count_epilogue(i, j, cnt_ref, cnt_scratch)


@functools.partial(
    jax.jit,
    static_argnames=(
        "signs", "num_thresholds", "tile_i", "tile_j", "interpret",
        "vma_axis",
    ),
)
def _phi_rbf_terms_fused_pallas_cross_direct_impl(
    targets, sources, source_scores, gammas, signs, thresholds_sq,
    num_thresholds, tile_i, tile_j, interpret, vma_axis=None,
):
    """Direct-kernel cross form — same contract as
    _phi_rbf_terms_fused_pallas_cross_impl."""
    n_t, m = targets.shape
    n_s = sources.shape[0]
    num_terms = len(signs)
    center = jnp.mean(sources.astype(jnp.float32), axis=0)
    targets32 = targets.astype(jnp.float32) - center
    sources32 = sources.astype(jnp.float32) - center
    gammas32 = jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas])
    gl = jnp.reshape(-(gammas32 * _LOG2E), (1, num_terms))
    q_t = jnp.sum(targets32 * targets32, axis=1)
    q_s = jnp.sum(sources32 * sources32, axis=1)
    b = jnp.concatenate(
        [
            source_scores.astype(jnp.float32), sources32,
            jnp.ones((n_s, 1), jnp.float32),
        ],
        axis=1,
    )

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
    # Same conservative scoped-VMEM clamp as the legacy cross impl (the
    # direct kernel holds fewer live temporaries, but the envelope was
    # bisected on the legacy shape — keep the proven gate).
    if diff_m is not None and n_s > 65536:
        tile_j = min(tile_j, 1024)
    elif n_s > 524288:
        tile_j = min(tile_j, 1024)
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(targets32, tile_i, value=pad_t)
    qi_p = _pad_rows(q_t[:, None], tile_i, value=big)
    xjt_src = sources32.T if diff_m is not None else (-2.0 * sources32.T)
    xjt_p = _pad_cols(xjt_src, tile_j, value=pad_s)
    qjt_p = _pad_cols(q_s[None, :], tile_j, value=big)
    bt_p = _pad_rows(b, tile_j)
    n_i = x_p.shape[0]
    n_j = xjt_p.shape[1]
    bw = 2 * m + 1
    thr = jnp.reshape(
        thresholds_sq.astype(jnp.float32), (1, num_thresholds)
    )

    grid = (n_i // tile_i, n_j // tile_j)
    operands = [
        _pvary(v, vma_axis)
        for v in (gl, thr, x_p, qi_p, xjt_p, qjt_p, bt_p)
    ]
    acc, count_lanes = pl.pallas_call(
        functools.partial(
            _fused_terms_direct_kernel, num_terms, diff_m, num_thresholds,
            bw,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, num_terms), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, num_thresholds), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tile_i, m), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, bw), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_i, num_terms * bw), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_thresholds, tile_j), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            _out_struct((n_i, num_terms * bw), jnp.float32, vma_axis),
            _out_struct((num_thresholds, tile_j), jnp.float32, vma_axis),
        ),
        scratch_shapes=[pltpu.VMEM((num_thresholds, tile_j), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_i * n_j
            * (3 * m + num_terms * bw + num_thresholds),
            bytes_accessed=4 * (n_i + n_j) * (2 * m + 2 + num_terms * bw),
            transcendentals=num_terms * n_i * n_j,
        ),
        interpret=interpret,
    )(*operands)

    a = acc[:n_t]
    phi = None
    for t_i, s in enumerate(signs):
        at = a[:, t_i * bw : (t_i + 1) * bw]
        ks = at[:, :m]
        kx = at[:, m : 2 * m]
        rowsum = at[:, 2 * m]
        phi_t = ks - 2.0 * gammas32[t_i] * (
            kx - rowsum[:, None] * targets32
        )
        phi_t = float(s) * phi_t
        phi = phi_t if phi is None else phi + phi_t
    phi = phi / n_s
    return phi.astype(targets.dtype), jnp.sum(count_lanes, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "signs", "num_thresholds", "tile_i", "tile_j", "interpret",
        "vma_axis",
    ),
)
def _phi_rbf_terms_fused_pallas_cross_impl(
    targets, sources, source_scores, gammas, signs, thresholds_sq,
    num_thresholds, tile_i, tile_j, interpret, vma_axis=None,
):
    """Cross (sharded) form of the multi-term fused Mosaic sweep — see
    _phi_rbf_fused_pallas_cross_impl for the targets/sources/vma contract."""
    n_t, m = targets.shape
    n_s = sources.shape[0]
    num_terms = len(signs)
    center = jnp.mean(sources.astype(jnp.float32), axis=0)
    targets32 = targets.astype(jnp.float32) - center
    sources32 = sources.astype(jnp.float32) - center
    gammas32 = jnp.reshape(
        jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas]),
        (1, num_terms),
    )
    q_t = jnp.sum(targets32 * targets32, axis=1)
    q_s = jnp.sum(sources32 * sources32, axis=1)
    xs1 = jnp.concatenate(
        [sources32, jnp.ones((n_s, 1), jnp.float32)], axis=1
    )

    # Small m: VPU difference-form sq with +/-_PAD_C padding (see _sq_tile).
    diff_m = m if m <= _DIFF_FORM_MAX_M else None
    # Large source sets push the multi-term kernel's temporaries (sq +
    # per-term k + k_c + w tiles) over the 16 MB scoped-VMEM stack at
    # 512x2048 tiles — NON-monotonically in n (m=2: n=131k/250k/300k OOM
    # while 200k compiles; chip-probed round 4). Clamp tile_j on the
    # diff branch past the largest chip-verified always-safe size; the
    # Gram branch compiled everywhere probed (up to n=500k) but gets the
    # same guard at very large n. 512x1024 measured ~equal speed.
    if diff_m is not None and n_s > 65536:
        tile_j = min(tile_j, 1024)
    elif n_s > 524288:
        tile_j = min(tile_j, 1024)
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(targets32, tile_i, value=pad_t)
    qi_p = _pad_rows(q_t[:, None], tile_i, value=big)  # padded targets: junk
    xjt_p = _pad_cols(sources32.T, tile_j, value=pad_s)
    qjt_p = _pad_cols(q_s[None, :], tile_j, value=big)  # K -> 0, counts skip
    bs_p = _pad_rows(source_scores.astype(jnp.float32), tile_j)
    xs1_p = _pad_rows(xs1, tile_j)
    n_i = x_p.shape[0]
    n_j = xjt_p.shape[1]
    bw = 2 * m + 1
    thr = jnp.reshape(
        thresholds_sq.astype(jnp.float32), (1, num_thresholds)
    )

    grid = (n_i // tile_i, n_j // tile_j)
    operands = [
        _pvary(v, vma_axis)
        for v in (gammas32, thr, x_p, qi_p, xjt_p, qjt_p, bs_p, xs1_p)
    ]
    acc, count_lanes = pl.pallas_call(
        functools.partial(
            _fused_terms_kernel, tuple(float(s) for s in signs), diff_m,
            num_thresholds,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, num_terms), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, num_thresholds), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile_i, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_j, m + 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((tile_i, bw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_thresholds, tile_j), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            _out_struct((n_i, bw), jnp.float32, vma_axis),
            _out_struct((num_thresholds, tile_j), jnp.float32, vma_axis),
        ),
        scratch_shapes=[pltpu.VMEM((num_thresholds, tile_j), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_i * n_j * (m + bw + num_thresholds + 2 * num_terms),
            bytes_accessed=4 * (n_i + n_j) * (2 * m + 2 + bw),
            transcendentals=num_terms * n_i * n_j,
        ),
        interpret=interpret,
    )(*operands)

    a = acc[:n_t]
    ks = a[:, :m]
    wx = a[:, m : 2 * m]
    w_rowsum = a[:, 2 * m]
    phi = (ks - 2.0 * (wx - w_rowsum[:, None] * targets32)) / n_s
    # padded source lanes carry zero counts, so the full-width reduce is safe
    return phi.astype(targets.dtype), jnp.sum(count_lanes, axis=1)


def _sym_terms_kernel(signs, diff_m, num_t, ri, cj, big, n_real, bi_ref,
                      bj_ref, gammas_ref, thr_ref, x_ref, qi_ref, xjt_ref,
                      qjt_ref, bst_ref, xs1t_ref, bsti_ref, xs1ti_ref,
                      acck_ref, accw_ref, cnt_ref, acck_sc, accw_sc, cnt_sc):
    """Triangle form of _fused_terms_kernel (see _sym_kernel for the
    enumeration/masking/diagonal contract): the shared sq tile feeds the
    per-term exps ONCE per unordered pair, then k_c and w each contract in
    both directions into their transposed full-width accumulators."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acck_sc[:] = jnp.zeros_like(acck_sc)
        accw_sc[:] = jnp.zeros_like(accw_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)  # (ri, cj)
    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
    sq = jnp.where(gj >= gi, sq, big)
    if diff_m is None:
        sq = jnp.where((gj == gi) & (gi < n_real), 0.0, sq)

    k_c = None
    w = None
    for t_i, s in enumerate(signs):
        g = gammas_ref[0, t_i]
        k_t = jnp.exp2(-(g * _LOG2E) * sq)
        k_term = s * k_t
        w_term = (s * g) * k_t
        k_c = k_term if k_c is None else k_c + k_term
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


def _sym_terms_direct_kernel(num_terms, diff_m, num_t, ri, cj, big, n_real,
                             band, bi_ref, bj_ref, gl_ref, thr_ref, x_ref,
                             qi_ref, xjt_ref, qjt_ref, btj_ref, bti_ref,
                             acc_ref, cnt_ref, acc_sc, cnt_sc,
                             masked: bool = True):
    """DIRECT per-term triangle sweep (round 5): each term's k_t tile
    contracts straight against the full B = [S | X | 1] into its own
    8-aligned (2m+1)-row band of ONE packed accumulator; the XLA epilogue
    combines bands with the signs/gammas (reference: the composed-kernel
    per-pair forward+gradient evaluations, Kernel.hpp:55-223, and the
    n^2 phi loop, SVGD.hpp:445-449). vs _sym_terms_kernel this drops
    the per-pair k_c/w assembly (~4 VPU ops/pair/term) and the separate
    scores/[X|1] operand windows, and the Gram branch additionally rides
    PRE-SCALED sources (xjt carries -2x, exact: power-of-two scale in both
    bf16 halves) with a single-select mask tree and no redundant clamp.
    Measured (scripts/probe_terms_batched.py, n=10240, m=11, T=2, v5e):
    0.44 vs the round-4 kernel's 0.74 ms/sweep at unchanged accuracy
    class. Round-4's small-operand-MXU-bound diagnosis was wrong in an
    instructive way: dot-count batching and software pipelining both
    measured ~0 (MXU streaming and VPU work share issue bandwidth, so
    attribution is additive) — the wins are eliminating VPU ops and MXU
    passes outright, not reorganizing them."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    # ``masked=False`` is the round-5 two-call split: tiles whose column
    # super-block lies strictly right of their row block never straddle
    # the diagonal, so the wrapper sweeps them with NO mask work at all
    # (mask attribution ~0.09 ms at the hier shape on ~2/3 of tiles;
    # split measured 0.39 vs 0.42 ms one-call, counts exact —
    # scripts/probe_terms_batched.py --split).
    if diff_m is not None:
        sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)
        if masked:
            gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
            gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
            sq = jnp.where(gj >= gi, sq, big)
    else:
        # xjt carries -2x: sq = q_i + q_j + x.(-2y); diagonal pinned to
        # exact zero in the same select tree (bf16x3 residue would leak
        # through the epilogue's K(i,i) = 1 correction otherwise); padded
        # rows carry q = +big so they land in the gj > gi branch with
        # sq ~ big and decay to zero under every (positive) gamma.
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
        # gl = -(gamma_t * log2 e) folded outside the kernel
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


def _terms_direct_fits_npad(num_terms: int, m: int, n_pad: int) -> bool:
    band = _ceil_mult(2 * m + 1, 8)
    return 2 * num_terms * band * n_pad * 4 <= _SYM_ACC_VMEM_BYTES


def _terms_direct_fits(n: int, m: int, num_terms: int, tile_j: int) -> bool:
    """VMEM gate for the direct kernel's packed accumulator pair
    (num_terms 8-aligned (2m+1)-row bands, scratch + output): heavier
    than the legacy k_c/w pair (T*24 vs 23 rows at m=11, T=2), so shapes
    past it keep the legacy kernel up to ITS budget before the panel
    form takes over."""
    return _terms_direct_fits_npad(num_terms, m, _ceil_mult(n, tile_j))


@functools.partial(
    jax.jit,
    static_argnames=("signs", "num_thresholds", "tile_i", "tile_j",
                     "interpret"),
)
def _phi_rbf_terms_fused_pallas_sym_direct_impl(
    coords, scores, gammas, signs, thresholds_sq, num_thresholds, tile_i,
    tile_j, interpret,
):
    """Wrapper for _sym_terms_direct_kernel — same (phi, counts) contract
    as _phi_rbf_terms_fused_pallas_sym_impl."""
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    num_terms = len(signs)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas])
    gl = jnp.reshape(-(gammas32 * _LOG2E), (1, num_terms))
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate(
        [coords32, jnp.ones((n, 1), jnp.float32)], axis=1
    )
    b = jnp.concatenate([scores32, xs1], axis=1)  # (n, 2m+1)

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(coords32, tile_j, value=pad_t)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_src = coords32.T if diff_m is not None else (-2.0 * coords32.T)
    xjt_p = _pad_cols(xjt_src, tile_j, value=pad_s)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    bt_p = _pad_cols(b.T, tile_j)  # (bw, n_pad)
    n_pad = x_p.shape[0]
    bw = 2 * m + 1
    band = _ceil_mult(bw, 8)
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    # Two-call mask split (round 5): tiles whose column super-block lies
    # strictly right of their row block contain only gj > gi pairs —
    # sweep them with a mask-free kernel; only diagonal-straddling tiles
    # pay the select tree (~7% at the hier shape, counts exact).
    pure = [(i, j) for i in range(nbi) for j in range(i // r, nbj)
            if j * r > i]
    mixed = [(i, j) for i in range(nbi) for j in range(i // r, nbj)
             if j * r <= i]

    def sweep(pairs, masked):
        bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
        bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(len(pairs),),
            in_specs=[
                pl.BlockSpec((1, num_terms), lambda t, bi, bj: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, num_thresholds), lambda t, bi, bj: (0, 0),
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
                pl.BlockSpec((num_thresholds, tile_j),
                             lambda t, bi, bj: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_terms * band, n_pad), jnp.float32),
                pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _sym_terms_direct_kernel, num_terms, diff_m,
                num_thresholds, tile_i, tile_j, big, n, band,
                masked=masked,
            ),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(
                    (num_terms * band, n_pad), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (num_thresholds, tile_j), jnp.float32
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * len(pairs) * tile_i * tile_j
                * (3 * m + 2 * num_terms * bw),
                bytes_accessed=4 * n_pad * (3 * m + 3 + num_terms * band),
                transcendentals=num_terms * len(pairs) * tile_i * tile_j,
            ),
            interpret=interpret,
        )(bi_arr, bj_arr, gl, thr, x_p, qi_p, xjt_p, qjt_p, bt_p, bt_p)

    acc_t, count_lanes = sweep(mixed, True)
    if pure:
        acc_p, lanes_p = sweep(pure, False)
        acc_t = acc_t + acc_p
        count_lanes = count_lanes + lanes_p

    # Per-term epilogue: k_t(i, i) = 1 entered both accumulation
    # directions, so subtract each term's B once before combining.
    phi = None
    for t_i, s in enumerate(signs):
        a = acc_t[t_i * band : t_i * band + bw, :n].T - b
        ks = a[:, :m]
        kx = a[:, m : 2 * m]
        rowsum = a[:, 2 * m]
        phi_t = ks - 2.0 * gammas32[t_i] * (
            kx - rowsum[:, None] * coords32
        )
        phi_t = float(s) * phi_t
        phi = phi_t if phi is None else phi + phi_t
    phi = phi / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi.astype(coords.dtype), counts


@functools.partial(
    jax.jit,
    static_argnames=("signs", "num_thresholds", "tile_i", "tile_j",
                     "interpret"),
)
def _phi_rbf_terms_fused_pallas_sym_impl(
    coords, scores, gammas, signs, thresholds_sq, num_thresholds, tile_i,
    tile_j, interpret,
):
    """Self-pair triangle form of _phi_rbf_terms_fused_pallas_cross_impl.
    Per visited tile the MXU work doubles (four dots instead of two) but
    tiles halve, so MXU flops are unchanged while the VPU-bound per-pair
    work — the shared sq tile plus num_terms exps, which dominate the
    multi-term sweep — halves. Round 5: shapes whose packed per-term
    accumulator fits VMEM route to the ~1.7x-faster direct kernel
    (_sym_terms_direct_kernel); this legacy k_c/w form covers the band
    between the direct budget and the full-width budget (e.g. m=11, T=2:
    n ~ 21k-45k) and the sharded schedule."""
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    num_terms = len(signs)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.reshape(
        jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas]),
        (1, num_terms),
    )
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate(
        [coords32, jnp.ones((n, 1), jnp.float32)], axis=1
    )

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(coords32, tile_j, value=pad_t)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_p = _pad_cols(coords32.T, tile_j, value=pad_s)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    bst_p = _pad_cols(scores32.T, tile_j)  # (m, n_pad)
    xs1t_p = _pad_cols(xs1.T, tile_j)      # (m+1, n_pad)
    n_pad = x_p.shape[0]
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    pairs = [(i, j) for i in range(nbi) for j in range(i // r, nbj)]
    bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=[
            pl.BlockSpec((1, num_terms), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_thresholds), lambda t, bi, bj: (0, 0),
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
        ],
        out_specs=(
            pl.BlockSpec((m, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m + 1, n_pad), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_thresholds, tile_j), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, n_pad), jnp.float32),
            pltpu.VMEM((m + 1, n_pad), jnp.float32),
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    acck_t, accw_t, count_lanes = pl.pallas_call(
        functools.partial(
            _sym_terms_kernel, tuple(float(s) for s in signs), diff_m,
            num_thresholds, tile_i, tile_j, big, n,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((m + 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_thresholds, tile_j), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(pairs) * tile_i * tile_j
            * (m + 2 * (2 * m + 1) + 2 * num_terms),
            bytes_accessed=4 * n_pad * (4 * m + 4),
            transcendentals=num_terms * len(pairs) * tile_i * tile_j,
        ),
        interpret=interpret,
    )(bi_arr, bj_arr, gammas32, thr, x_p, qi_p, xjt_p, qjt_p, bst_p, xs1t_p,
      bst_p, xs1t_p)

    # Diagonal correction: K_c(i,i) = sum(s_t), W(i,i) = sum(s_t * g_t)
    # entered both accumulation directions once too many.
    s_sum = float(sum(float(s) for s in signs))
    sg_sum = jnp.sum(gammas32[0] * jnp.asarray(list(signs), jnp.float32))
    ks = acck_t[:, :n].T - s_sum * scores32
    aw = accw_t[:, :n].T - sg_sum * xs1
    wx = aw[:, :m]
    w_rowsum = aw[:, m]
    phi = (ks - 2.0 * (wx - w_rowsum[:, None] * coords32)) / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi.astype(coords.dtype), counts


#: HBM ceiling for the DIRECT panel terms kernel's (rows, P*2W) panel
#: buffer — the n=1M m=2 T=2 plan (3.81 GiB) is chip-validated.
_SYM_PANEL_DIRECT_MAX_HBM = 4 * 2**30


def _sym_panel_terms_direct_plan(n: int, m: int, num_terms: int,
                                 tile_i: int = 512, tile_j: int = 2048):
    """(nb, w) plan for the DIRECT panel-rotated multi-term sweep, or None
    outside its chip-validated envelope.

    The round-5 direct form needs ONE rotating (T * band, 2W) window
    (band = ceil8(2m+1)) instead of the legacy kernel's two, which moves
    the compile envelope far past the legacy W = 4096 ceiling and — the
    round-4 gap — admits the m <= 4 diff branch at all. Regions below
    were chip-bisected at 512x2048 tiles
    (scripts/probe_terms_panel_direct.py; small- and large-nb corners
    compiled and measured): every (window rows, dot count, W, nb,
    sq-branch) combination OUTSIDE them stays on the legacy panel /
    square forms — rotating-window envelopes are erratic (CLAUDE.md) and
    nothing ships without a chip compile of its exact region.

    | branch | terms | band | W cap | nb cap | measured vs square |
    |---|---|---|---|---|---|
    | diff (m<=3) | 2 | 8 | 16384 | 64 | 2.0-2.2x (131k..1M) |
    | diff (m<=3) | 3 | 8 | 16384 | 32 | 2.0-2.1x (131k..500k) |
    | diff (m=4)  | 2 | 16 | 8192 | 32 | 1.6-1.9x (65k..262k) |
    | gram (m 8..11) | 2 | 24 | 4096 | 32 | 1.2-1.3x (33k..131k) |
    """
    if (tile_i, tile_j) != (512, 2048):
        return None  # envelope validated at the default tiles only
    band = _ceil_mult(2 * m + 1, 8)
    if m <= _DIFF_FORM_MAX_M:
        if num_terms == 2 and band == 8:
            w_cap, nb_cap = 16384, 64
        elif num_terms == 3 and band == 8:
            w_cap, nb_cap = 16384, 32
        elif num_terms == 2 and band == 16:
            w_cap, nb_cap = 8192, 32
        else:
            return None
    else:
        if num_terms == 2 and band == 24:
            w_cap, nb_cap = 4096, 32
        else:
            return None
    rows = num_terms * band
    w_cap = min(w_cap, _SYM_ACC_VMEM_BYTES // (rows * 4 * 2))
    w_cap = (w_cap // tile_j) * tile_j
    if w_cap < tile_j:
        return None
    nb = max(_SYM_PANEL_MIN_BLOCKS, -(-n // w_cap))
    if nb > nb_cap:
        return None
    w = _ceil_mult(-(-n // nb), tile_j)
    num_p = nb * (nb + 1) // 2
    if num_p * rows * 2 * w * 4 > _SYM_PANEL_DIRECT_MAX_HBM:
        return None
    return nb, w


def _sym_panel_terms_direct_kernel(num_terms, diff_m, num_t, ri, cj, w, big,
                                   n_real, band, i_arr_ref, j_arr_ref,
                                   gl_ref, thr_ref, x_ref, qi_ref, xjt_ref,
                                   qjt_ref, btj_ref, bti_ref, acc_ref,
                                   cnt_ref, cnt_sc):
    """Panel-rotated DIRECT per-term sweep: _sym_terms_direct_kernel's
    structure (per-term k_t straight against B = [S|X|1], packed 8-aligned
    bands, lean Gram branch) with _sym_panel_kernel's rotating window and
    sentinel handling. See _sym_panel_terms_direct_plan for the validated
    envelope."""
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
        sq = jnp.where(bi > bj, big, sq)  # sentinel panels (sharded plans)
    else:
        # xjt carries -2x (see _sym_terms_direct_kernel); diagonal pinned
        # exactly; sentinels land in the masked branch.
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
    static_argnames=("signs", "num_thresholds", "tile_i", "tile_j",
                     "interpret", "panel_blocks"),
)
def _phi_rbf_terms_fused_pallas_sympanel_direct_impl(
    coords, scores, gammas, signs, thresholds_sq, num_thresholds, tile_i,
    tile_j, interpret, panel_blocks: int | None = None,
):
    """Wrapper for the direct panel terms kernel — same (phi, counts)
    contract as _phi_rbf_terms_fused_pallas_sympanel_impl."""
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    num_terms = len(signs)
    if panel_blocks is None:
        plan = _sym_panel_terms_direct_plan(n, m, num_terms, tile_i, tile_j)
        if plan is None:
            raise ValueError(
                "shape outside the direct panel terms envelope "
                "(_sym_panel_terms_direct_plan)"
            )
        nb, w = plan
    else:
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

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
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
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))

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
            pl.BlockSpec((1, num_thresholds),
                         lambda p, i, j, bi, bj: (0, 0),
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
            pl.BlockSpec((num_thresholds, tile_j),
                         lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    panels, count_lanes = pl.pallas_call(
        functools.partial(_sym_panel_terms_direct_kernel, num_terms, diff_m,
                          num_thresholds, tile_i, tile_j, w, big, n, band),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(
                (num_terms * band, num_p * 2 * w), jnp.float32
            ),
            jax.ShapeDtypeStruct((num_thresholds, tile_j), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_p * ni * nj * tile_i * tile_j
            * (3 * m + 2 * num_terms * bw),
            bytes_accessed=4 * n_pad * (3 * m + 3)
            + 4 * num_p * num_terms * band * 2 * w,
            transcendentals=num_terms * num_p * ni * nj * tile_i * tile_j,
        ),
        interpret=interpret,
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
    return phi.astype(coords.dtype), counts


def _sym_panel_terms_kernel(signs, diff_m, num_t, ri, cj, w, big, n_real,
                            i_arr_ref, j_arr_ref, gammas_ref, thr_ref, x_ref,
                            qi_ref, xjt_ref, qjt_ref, bst_ref, xs1t_ref,
                            bsti_ref, xs1ti_ref, acck_ref, accw_ref, cnt_ref,
                            cnt_sc):
    """Panel-rotated variant of _sym_terms_kernel (see _sym_panel_kernel
    for the panel scheme): the two accumulation windows (k_c against
    scores, W against [X | 1]) rotate per super-block pair, so composed
    median kernels keep the triangle past the full-width accumulator
    budget (~n > 45k at m=11)."""
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
        acck_ref[:] = jnp.zeros_like(acck_ref)
        accw_ref[:] = jnp.zeros_like(accw_ref)

    sq = _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref)  # (ri, cj)
    li = i * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    lj = j * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
    is_diag = bi == bj
    sq = jnp.where(is_diag & (lj < li), big, sq)
    if diff_m is None:
        gi = bi * w + li
        sq = jnp.where(is_diag & (lj == li) & (gi < n_real), 0.0, sq)

    k_c = None
    w_t = None
    for t_i, s in enumerate(signs):
        g = gammas_ref[0, t_i]
        k_t = jnp.exp2(-(g * _LOG2E) * sq)
        k_c = s * k_t if k_c is None else k_c + s * k_t
        w_term = (s * g) * k_t
        w_t = w_term if w_t is None else w_t + w_term

    # The rotating windows' row counts are 8-padded (m -> mk rows etc.):
    # 11/12-row dual rotating windows crash the TPU compiler subprocess at
    # W >= 8192 (chip-bisected round 4; 8-aligned rows compile), echoing
    # the aniso kernel's band-alignment workaround.
    mk = bst_ref.shape[0]
    mw = xs1t_ref.shape[0]
    acck_ref[:mk, pl.ds(i * ri, ri)] += jax.lax.dot_general(
        bst_ref[:], k_c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acck_ref[:mk, pl.ds(w + j * cj, cj)] += jnp.dot(
        bsti_ref[:], k_c, preferred_element_type=jnp.float32
    )
    accw_ref[:mw, pl.ds(i * ri, ri)] += jax.lax.dot_general(
        xs1t_ref[:], w_t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    accw_ref[:mw, pl.ds(w + j * cj, cj)] += jnp.dot(
        xs1ti_ref[:], w_t, preferred_element_type=jnp.float32
    )
    _lane_counts(cnt_sc, sq, thr_ref, num_t)

    @pl.when((p == pl.num_programs(0) - 1) & (i == pl.num_programs(1) - 1)
             & (j == pl.num_programs(2) - 1))
    def _():
        cnt_ref[:] = cnt_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=("signs", "num_thresholds", "tile_i", "tile_j",
                     "interpret", "panel_blocks"),
)
def _phi_rbf_terms_fused_pallas_sympanel_impl(
    coords, scores, gammas, signs, thresholds_sq, num_thresholds, tile_i,
    tile_j, interpret, panel_blocks: int | None = None,
):
    """Panel-rotated triangle form of the multi-term fused sweep — same
    phi/counts contract as _phi_rbf_terms_fused_pallas_sym_impl, O(1)-in-n
    VMEM (see _phi_rbf_fused_pallas_sympanel_impl)."""
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    num_terms = len(signs)
    nb, w, n_pad = _sym_panel_plan(n, m, tile_j, dual=True)
    if panel_blocks is not None:
        nb = panel_blocks
        w = _ceil_mult(-(-n // nb), tile_j)
        n_pad = nb * w
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.reshape(
        jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas]),
        (1, num_terms),
    )
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate(
        [coords32, jnp.ones((n, 1), jnp.float32)], axis=1
    )

    diff_m = m if m <= _DIFF_FORM_MAX_M else None
    big = float(jnp.finfo(jnp.float32).max / 4)
    pad_t = _PAD_C if diff_m is not None else 0.0
    pad_s = -_PAD_C if diff_m is not None else 0.0
    x_p = _pad_rows(coords32, n_pad, value=pad_t)
    qi_p = _pad_rows(q[:, None], n_pad, value=big)
    xjt_p = _pad_cols(coords32.T, n_pad, value=pad_s)
    qjt_p = _pad_cols(q[None, :], n_pad, value=big)
    bst_p = _pad_cols(scores32.T, n_pad)   # (m, n_pad)
    xs1t_p = _pad_cols(xs1.T, n_pad)       # (m+1, n_pad)
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))

    pairs = [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]
    i_arr = jnp.asarray([pp[0] for pp in pairs], jnp.int32)
    j_arr = jnp.asarray([pp[1] for pp in pairs], jnp.int32)
    num_p = len(pairs)
    ni, nj = w // tile_i, w // tile_j
    mk_pad = -(-m // 8) * 8        # 8-aligned rotating-window rows (see
    mw_pad = -(-(m + 1) // 8) * 8  # kernel comment)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_p, ni, nj),
        in_specs=[
            pl.BlockSpec((1, num_terms), lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, num_thresholds),
                         lambda p, i, j, bi, bj: (0, 0),
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
                (m, tile_j),
                lambda p, i, j, bi, bj, _nj=nj: (0, bj[p] * _nj + j),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (m + 1, tile_j),
                lambda p, i, j, bi, bj, _nj=nj: (0, bj[p] * _nj + j),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (m, tile_i),
                lambda p, i, j, bi, bj, _ni=ni: (0, bi[p] * _ni + i),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (m + 1, tile_i),
                lambda p, i, j, bi, bj, _ni=ni: (0, bi[p] * _ni + i),
                memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((mk_pad, 2 * w), lambda p, i, j, bi, bj: (0, p)),
            pl.BlockSpec((mw_pad, 2 * w), lambda p, i, j, bi, bj: (0, p)),
            pl.BlockSpec((num_thresholds, tile_j),
                         lambda p, i, j, bi, bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
        ],
    )
    acck_t, accw_t, count_lanes = pl.pallas_call(
        functools.partial(
            _sym_panel_terms_kernel, tuple(float(s) for s in signs), diff_m,
            num_thresholds, tile_i, tile_j, w, big, n,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((mk_pad, num_p * 2 * w), jnp.float32),
            jax.ShapeDtypeStruct((mw_pad, num_p * 2 * w), jnp.float32),
            jax.ShapeDtypeStruct((num_thresholds, tile_j), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_p * ni * nj * tile_i * tile_j
            * (m + 2 * (2 * m + 1) + 2 * num_terms),
            bytes_accessed=4 * n_pad * (4 * m + 4)
            + 4 * num_p * (2 * m + 1) * 2 * w,
            transcendentals=num_terms * num_p * ni * nj * tile_i * tile_j,
        ),
        interpret=interpret,
    )(i_arr, j_arr, gammas32, thr, x_p, qi_p, xjt_p, qjt_p, bst_p, xs1t_p,
      bst_p, xs1t_p)

    def _gather_panels(panels, rows_pad, rows):
        halves = panels.reshape(rows_pad, num_p, 2, w)[:rows]
        blocks = jnp.zeros((rows, nb, w), jnp.float32)
        blocks = blocks.at[:, i_arr, :].add(halves[:, :, 0, :])
        blocks = blocks.at[:, j_arr, :].add(halves[:, :, 1, :])
        return blocks.reshape(rows, n_pad)

    acck_g = _gather_panels(acck_t, mk_pad, m)
    accw_g = _gather_panels(accw_t, mw_pad, m + 1)

    s_sum = float(sum(float(s) for s in signs))
    sg_sum = jnp.sum(gammas32[0] * jnp.asarray(list(signs), jnp.float32))
    ks = acck_g[:, :n].T - s_sum * scores32
    aw = accw_g[:, :n].T - sg_sum * xs1
    wx = aw[:, :m]
    w_rowsum = aw[:, m]
    phi = (ks - 2.0 * (wx - w_rowsum[:, None] * coords32)) / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi.astype(coords.dtype), counts


# ----------------------------------------------------------------------
# anisotropic composed-RBF fused sweep (triangle form)
# ----------------------------------------------------------------------


#: Byte budget for EACH batched-concat dot temporary (n_w tiles of
#: (tile_i, tile_j) f32 concatenated along one axis). Measured envelope on
#: v5e: n_w * ti * tj * 4 = 4 MB compiles (1024x1024 @ n_w=1, 512x1024 @
#: n_w=2), 8 MB OOMs the 16 MB scoped-vmem stack (512x2048 @ n_w=2,
#: 1024x2048 @ n_w=1 — the rest of the stack is sq/k tiles and operand
#: windows).
_ANISO_CAT_VMEM_BYTES = 4 * 2**20

#: Auto-selection cap on gradient-direction accumulators (iso shared W +
#: one per aniso term): verified compiling and beating 'rbf_terms' on
#: chip up to 8 (see docs/perf.md); beyond that unmeasured — fall back.
_ANISO_MAX_W = 8


def _aniso_default_tiles(n_w: int, m: int | None = None):
    """Largest measured-safe tile shape for the accumulator count.

    Measured on v5e (n=10240, m=11, round 4): a single gradient
    accumulator sweeps fastest at 1024x1024 (1.43 ms vs 1.62 at
    512x2048); with >=2 the concat temporaries bound the shape and
    512x512 wins (iso+aniso 1.53 ms, 2-aniso 1.80 ms vs 512x1024's
    1.54/2.24; 512x2048 OOMs). Beyond n_w=4 the shapes shrink along the
    same _ANISO_CAT_VMEM_BYTES envelope."""
    if n_w == 2 and (m is None or m <= 32):
        # Separate-dot accumulation (no concat temporaries) at n_w = 2:
        # 1024x1024 measured fastest (round 5, probe_aniso_tiles.py).
        # Chip-validated m <= 32 only: m >= 40 crashes the compiler at
        # 1024x1024 while 512x512 compiles (round-5 route audit) — large
        # m falls through to the conservative ladder.
        return 1024, 1024
    for ti, tj in ((1024, 1024), (512, 512), (256, 512), (256, 256),
                   (128, 256), (128, 128)):
        if max(n_w, 1) * ti * tj * 4 <= _ANISO_CAT_VMEM_BYTES:
            return ti, tj
    return 128, 128


def aniso_sym_eligible(n: int, m: int, n_aniso: int, has_iso: bool,
                       tile_j: int | None = None) -> bool:
    """Auto-selection gate for the anisotropic terms triangle sweep: the
    accumulator set is (m) + n_w * (m+1) full-width rows (scratch+output
    pairs), n_w = aniso terms + one shared isotropic W. Beyond
    _ANISO_MAX_W accumulators the default tiles shrink past the measured
    envelope — the per-term 'rbf_terms' sweeps take over."""
    n_w = (1 if has_iso else 0) + n_aniso
    if n_w > _ANISO_MAX_W:
        return False
    if tile_j is None:
        tile_j = _aniso_default_tiles(n_w, m)[1]
    n_pad = ((n + tile_j - 1) // tile_j) * tile_j
    band = -(-(m + 1) // 8) * 8
    rows = m + n_w * band
    return n >= _SYM_MIN_N and 2 * rows * n_pad * 4 <= _SYM_ACC_VMEM_BYTES


def _sym_aniso_terms_kernel(n_iso, n_aniso, iso_signs, aniso_signs, diff_m,
                            num_t, ri, cj, big, n_real, bi_ref, bj_ref,
                            gammas_ref, thr_ref, *refs):
    """Triangle fused sweep for composed RBF kernels with ANISOTROPIC
    terms (reference: arbitrary P in composed kernels,
    GaussianRBFKernel.hpp:75-81).

    Isotropic terms share the Euclidean sq tile (which also feeds the
    median-selection counts); each anisotropic term builds its own
    P-space quadratic-form tile from per-term Gram pieces. The kernel-sum
    contraction k_c @ S is shared; the GRADIENT direction differs per
    anisotropic term (grad_y k_t = k_t P_sym_t (x - y)), so each
    anisotropic term accumulates its own W_t = s_t k_t contraction against
    [X | 1] (the P_sym_t factor applies in the XLA epilogue), while the
    isotropic terms share one w_iso = sum(s_t g_t k_t) accumulator.
    Triangle masking / diagonal pinning / double-count epilogue exactly as
    _sym_kernel."""
    # refs layout: euclid x, qi, xjt, qjt, bst, xs1t, bsti, xs1ti,
    #              then per aniso term (ypt, qti, qtjt),
    #              then outputs (acck, accw_packed, cnt),
    #              then scratches (same order as outputs).
    # All n_w gradient-direction accumulators live in ONE full-width
    # buffer in 8-aligned (m+1)-row bands: a third separate full-width
    # VMEM output crashes the TPU compiler subprocess (two are fine —
    # found by bisection; packing sidesteps it and keeps sublane slices
    # aligned).
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    x_ref, qi_ref, xjt_ref, qjt_ref = refs[0:4]
    bst_ref, xs1t_ref, bsti_ref, xs1ti_ref = refs[4:8]
    base = 8
    aniso_in = refs[base : base + 3 * n_aniso]
    acck_ref, accw_ref, cnt_ref, acck_sc, accw_sc, cnt_sc = refs[
        base + 3 * n_aniso :
    ]

    @pl.when(t == 0)
    def _():
        acck_sc[:] = jnp.zeros_like(acck_sc)
        accw_sc[:] = jnp.zeros_like(accw_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    gi = bi * ri + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 0)
    gj = bj * cj + jax.lax.broadcasted_iota(jnp.int32, (ri, cj), 1)
    upper = gj >= gi
    diag = (gj == gi) & (gi < n_real)

    def masked(sq_raw, pin_diag):
        sq_m = jnp.where(upper, sq_raw, big)
        if pin_diag:
            sq_m = jnp.where(diag, 0.0, sq_m)
        return sq_m

    sq_e = masked(
        _sq_tile(diff_m, x_ref, qi_ref, xjt_ref, qjt_ref),
        diff_m is None,
    )

    mw = x_ref.shape[1] + 1  # m + 1 rows per W band
    band = -(-mw // 8) * 8   # 8-aligned band stride in the packed buffer

    def accum_rows(sc, row0, nrows, w_tile, bt_j, bt_i):
        sc[row0 : row0 + nrows, pl.ds(bi * ri, ri)] += jax.lax.dot_general(
            bt_j[:], w_tile, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc[row0 : row0 + nrows, pl.ds(bj * cj, cj)] += jnp.dot(
            bt_i[:], w_tile, preferred_element_type=jnp.float32
        )

    k_c = None
    w_iso = None
    w_tiles = []  # gradient-direction tiles, in packed-band order
    for t_i, s in enumerate(iso_signs):
        g = gammas_ref[0, t_i]
        k_t = jnp.exp2(-(g * _LOG2E) * sq_e)
        k_c = s * k_t if k_c is None else k_c + s * k_t
        w_term = (s * g) * k_t
        w_iso = w_term if w_iso is None else w_iso + w_term
    if n_iso:
        w_tiles.append(w_iso)
    for a in range(n_aniso):
        ypt_ref, qti_ref, qtjt_ref = aniso_in[3 * a : 3 * a + 3]
        # P-space Gram form; always pin the diagonal (the split residue
        # has no diff-form alternative here).
        sq_t = masked(_sq_tile(None, x_ref, qti_ref, ypt_ref, qtjt_ref), True)
        k_t = jnp.exp2(-_LOG2E * sq_t)
        s = aniso_signs[a]
        k_c = s * k_t if k_c is None else k_c + s * k_t
        w_tiles.append(s * k_t)

    accum_rows(acck_sc, 0, x_ref.shape[1], k_c, bst_ref, bsti_ref)
    if len(w_tiles) == 1:
        accum_rows(accw_sc, 0, mw, w_tiles[0], xs1t_ref, xs1ti_ref)
    elif len(w_tiles) == 2:
        # Round 5: per-band SEPARATE dot pairs — the round-4 "third
        # accumulation-dot pair crashes" no longer binds (bisected via
        # scripts/probe_aniso_tiles.py), and dropping the concat
        # temporaries lets the wrapper run 1024x1024 tiles (0.77 vs
        # 0.81 ms/sweep at the n=10240 benchmark shape). Validated at
        # n_w = 2 only; larger accumulator counts keep the proven
        # concat batching.
        accum_rows(accw_sc, 0, mw, w_tiles[0], xs1t_ref, xs1ti_ref)
        accum_rows(accw_sc, band, mw, w_tiles[1], xs1t_ref, xs1ti_ref)
    else:
        # A third accumulation-dot pair per grid step crashes the TPU
        # compiler subprocess (bisected round 4); batching every W tile
        # into ONE concatenated dot pair keeps the per-step dot count at
        # the level the working kernels use, with per-band slice writes.
        n_w = len(w_tiles)
        cat_r = jnp.concatenate(w_tiles, axis=0)  # (n_w*ri, cj)
        r1t = jax.lax.dot_general(
            xs1t_ref[:], cat_r, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (mw, n_w*ri)
        cat_c = jnp.concatenate(w_tiles, axis=1)  # (ri, n_w*cj)
        r2t = jnp.dot(
            xs1ti_ref[:], cat_c, preferred_element_type=jnp.float32
        )  # (mw, n_w*cj)
        for a in range(n_w):
            accw_sc[a * band : a * band + mw, pl.ds(bi * ri, ri)] += (
                r1t[:, a * ri : (a + 1) * ri]
            )
            accw_sc[a * band : a * band + mw, pl.ds(bj * cj, cj)] += (
                r2t[:, a * cj : (a + 1) * cj]
            )
    _lane_counts(cnt_sc, sq_e, thr_ref, num_t)

    @pl.when(t == nt - 1)
    def _():
        acck_ref[:] = acck_sc[:]
        accw_ref[:] = accw_sc[:]
        cnt_ref[:] = cnt_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=("iso_signs", "aniso_signs", "num_thresholds", "tile_i",
                     "tile_j", "interpret"),
)
def _phi_rbf_aniso_terms_fused_pallas_sym_impl(
    coords, scores, iso_gammas, iso_signs, aniso_ps, aniso_signs,
    thresholds_sq, num_thresholds, tile_i, tile_j, interpret,
):
    """Triangle fused sweep for composed kernels whose constant slots are
    anisotropic (every term's effective P must still be positive definite
    — the padded-row decay and the clamp both rely on it; validated by
    kernels/algebra.fused_aniso_terms_supported). Returns (phi, counts)
    with counts on the EUCLIDEAN pair distances (the adaptive median
    slots are isotropic by construction)."""
    n, m = coords.shape
    if tile_j % tile_i:
        raise ValueError("sym sweep needs tile_j % tile_i == 0")
    n_iso = len(iso_signs)
    n_aniso = len(aniso_signs)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    coords32 = coords.astype(jnp.float32) - center
    gammas32 = jnp.reshape(
        jnp.stack(
            [jnp.asarray(g, jnp.float32) for g in iso_gammas]
        ) if n_iso else jnp.zeros((1,), jnp.float32),
        (1, max(n_iso, 1)),
    )
    q = jnp.sum(coords32 * coords32, axis=1)
    scores32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate([coords32, jnp.ones((n, 1), jnp.float32)], axis=1)

    # The diff form's +/-_PAD_C row padding would feed the ANISO terms'
    # Gram cross with ~1e19 coordinates (clamped to sq_t = 0 -> K = 1 for
    # padded pairs); with aniso terms present every tile uses the Gram
    # identity with zero-padded coords and q = +big.
    diff_m = None
    big = float(jnp.finfo(jnp.float32).max / 4)
    x_p = _pad_rows(coords32, tile_j)
    qi_p = _pad_rows(q[:, None], tile_j, value=big)
    xjt_p = _pad_cols(coords32.T, tile_j)
    qjt_p = _pad_cols(q[None, :], tile_j, value=big)
    bst_p = _pad_cols(scores32.T, tile_j)
    xs1t_p = _pad_cols(xs1.T, tile_j)
    n_pad = x_p.shape[0]
    thr = jnp.reshape(thresholds_sq.astype(jnp.float32), (1, num_thresholds))

    # Per anisotropic term: P-space Gram pieces (q_t, (P+P^T) X^T).
    aniso_ops = []
    p_syms = []
    for p_t in aniso_ps:
        p32 = jnp.asarray(p_t, jnp.float32)
        p_sym = p32 + p32.T
        p_syms.append(p_sym)
        # HIGHEST: these feed the Gram cancellation q_i + q_j - 2*cross,
        # where TPU-default bf16 dot error (~2^-8 of |q|) survives into
        # small sq_t values (measured 2.3e-2 rel phi error vs 1e-3 fixed).
        q_t = jnp.sum(
            jnp.dot(coords32, p32, precision=jax.lax.Precision.HIGHEST)
            * coords32,
            axis=1,
        )
        # _sq_tile's Gram form computes q_i + q_j - 2*cross, so the
        # transposed operand carries P_sym/2: 2*(x . (P_sym/2) y) = x P_sym y.
        ypt = jnp.dot(coords32, 0.5 * p_sym,
                      precision=jax.lax.Precision.HIGHEST).T  # (m, n)
        aniso_ops.extend([
            _pad_cols(ypt, tile_j),
            _pad_rows(q_t[:, None], tile_j, value=big),
            _pad_cols(q_t[None, :], tile_j, value=big),
        ])

    r = tile_j // tile_i
    nbi, nbj = n_pad // tile_i, n_pad // tile_j
    pairs = [(i, j) for i in range(nbi) for j in range(i // r, nbj)]
    bi_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((1, max(n_iso, 1)), lambda t, bi, bj: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, num_thresholds), lambda t, bi, bj: (0, 0),
                     memory_space=vm),
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
    ]
    for _ in range(n_aniso):
        in_specs.extend([
            pl.BlockSpec((m, tile_j), lambda t, bi, bj: (0, bj[t]),
                         memory_space=vm),
            pl.BlockSpec((tile_i, 1), lambda t, bi, bj: (bi[t], 0),
                         memory_space=vm),
            pl.BlockSpec((1, tile_j), lambda t, bi, bj: (0, bj[t]),
                         memory_space=vm),
        ])
    n_w = (1 if n_iso else 0) + n_aniso
    band = -(-(m + 1) // 8) * 8  # packed W row stride (see kernel)
    out_specs = [
        pl.BlockSpec((m, n_pad), lambda t, bi, bj: (0, 0), memory_space=vm),
        pl.BlockSpec((n_w * band, n_pad), lambda t, bi, bj: (0, 0),
                     memory_space=vm),
        pl.BlockSpec((num_thresholds, tile_j), lambda t, bi, bj: (0, 0),
                     memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((n_w * band, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((num_thresholds, tile_j), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((m, n_pad), jnp.float32),
        pltpu.VMEM((n_w * band, n_pad), jnp.float32),
        pltpu.VMEM((num_thresholds, tile_j), jnp.float32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        functools.partial(
            _sym_aniso_terms_kernel, n_iso, n_aniso,
            tuple(float(s) for s in iso_signs),
            tuple(float(s) for s in aniso_signs),
            diff_m, num_thresholds, tile_i, tile_j, big, n,
        ),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            # per visited tile: (1 + n_aniso) bf16x3 sq assemblies (3 dots
            # of depth m each), the shared k_c contraction pair (m rows)
            # and the batched W contraction pair (n_w * (m + 1) rows)
            flops=2 * len(pairs) * tile_i * tile_j
            * (3 * m * (1 + n_aniso) + 2 * m + 2 * n_w * (m + 1)),
            bytes_accessed=4 * n_pad * (4 * m + 4 + n_aniso * (m + 2)),
            transcendentals=(n_iso + n_aniso) * len(pairs) * tile_i * tile_j,
        ),
        interpret=interpret,
    )(bi_arr, bj_arr, gammas32, thr, x_p, qi_p, xjt_p, qjt_p, bst_p, xs1t_p,
      bst_p, xs1t_p, *aniso_ops)

    acck_t, accw_t, count_lanes = outs

    # Diagonal corrections: every pinned k_t(i,i) = 1.
    s_total = float(sum(float(s) for s in iso_signs)
                    + sum(float(s) for s in aniso_signs))
    ks = acck_t[:, :n].T - s_total * scores32
    phi = ks
    idx = 0
    if n_iso:
        sg_iso = jnp.sum(
            gammas32[0, :n_iso]
            * jnp.asarray(list(iso_signs), jnp.float32)
        )
        aw = accw_t[: m + 1, :n].T - sg_iso * xs1
        phi = phi - 2.0 * (aw[:, :m] - aw[:, m][:, None] * coords32)
        idx = 1
    for a in range(n_aniso):
        s = float(aniso_signs[a])
        row0 = (idx + a) * band
        aw = accw_t[row0 : row0 + m + 1, :n].T - s * xs1
        phi = phi - jnp.dot(
            aw[:, :m] - aw[:, m][:, None] * coords32, p_syms[a],
            precision=jax.lax.Precision.HIGHEST,
        )
    phi = phi / n
    counts = 2.0 * jnp.sum(count_lanes, axis=1) - jnp.float32(n)
    return phi.astype(coords.dtype), counts


def phi_rbf_aniso_terms_fused_pallas(coords, scores, iso_gammas, iso_signs,
                                     aniso_ps, aniso_signs, thresholds_sq,
                                     tile_i: int | None = None,
                                     tile_j: int | None = None,
                                     interpret=None):
    """Composed-RBF fused Mosaic sweep with ANISOTROPIC constant terms:
    isotropic (adaptive-median / isotropic-constant) terms pass as
    ``iso_gammas``/``iso_signs``, anisotropic terms as full precision
    matrices ``aniso_ps``/``aniso_signs``. Triangle form only (the
    auto-selection gates on n >= _SYM_MIN_N; smaller problems keep the
    exact per-term 'rbf_terms' path)."""
    if interpret is None:
        interpret = _default_interpret()
    if tile_i is None or tile_j is None:
        n_w = (1 if iso_gammas else 0) + len(aniso_ps)
        d_i, d_j = _aniso_default_tiles(n_w, int(coords.shape[1]))
        tile_i = d_i if tile_i is None else tile_i
        tile_j = d_j if tile_j is None else tile_j
    return _phi_rbf_aniso_terms_fused_pallas_sym_impl(
        coords, scores, tuple(iso_gammas),
        tuple(float(s) for s in iso_signs), tuple(aniso_ps),
        tuple(float(s) for s in aniso_signs), thresholds_sq,
        int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
    )


def phi_rbf_terms_fused_pallas(coords, scores, gammas, signs, thresholds_sq,
                               tile_i: int = 512, tile_j: int = 2048,
                               interpret=None, sym=None):
    """Pallas twin of ops/phi.phi_rbf_terms_fused_counts: the composed
    isotropic-RBF single sweep as ONE Mosaic kernel. Only valid when every
    effective gamma is positive (kernels/algebra.fused_terms_statically_
    positive) — the padded-row decay trick requires it. ``sym`` as in
    phi_rbf_fused_pallas (upper-triangle sweep; auto when None)."""
    if interpret is None:
        interpret = _default_interpret()
    n, m = coords.shape
    num_terms = len(signs)
    if tile_i == 512 and tile_j == 2048 and n <= 12288:
        # Chip A/B on the round-5 split kernel (/tmp-probe recorded in
        # docs/perf.md): the terms family prefers 512x1024 tiles up to
        # n ~ 10k (3-16% across 2048..10240; 2048-wide wins again by
        # 20480) — narrower source windows ease the multi-tile VMEM
        # pressure the per-term exp tiles create.
        tile_j = 1024
    sym = _resolve_sym(
        sym, n, m, tile_i, tile_j,
        lambda nn, mm, tj: _sym_panel_terms_eligible(nn, mm, tj, num_terms),
    )
    if sym == "panel":
        if _sym_panel_terms_direct_plan(
            n, m, num_terms, tile_i, tile_j
        ) is not None:
            return _phi_rbf_terms_fused_pallas_sympanel_direct_impl(
                coords, scores, tuple(gammas),
                tuple(float(s) for s in signs), thresholds_sq,
                int(thresholds_sq.shape[0]), tile_i, tile_j,
                bool(interpret),
            )
        return _phi_rbf_terms_fused_pallas_sympanel_impl(
            coords, scores, tuple(gammas),
            tuple(float(s) for s in signs), thresholds_sq,
            int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
        )
    if sym:
        impl = (
            _phi_rbf_terms_fused_pallas_sym_direct_impl
            if _terms_direct_fits(n, m, len(signs), tile_j)
            else _phi_rbf_terms_fused_pallas_sym_impl
        )
        return impl(
            coords, scores, tuple(gammas),
            tuple(float(s) for s in signs), thresholds_sq,
            int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
        )
    return _terms_cross_impl_for(m)(
        coords, coords, scores, tuple(gammas),
        tuple(float(s) for s in signs), thresholds_sq,
        int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
    )


def phi_rbf_terms_fused_pallas_cross(targets, sources, source_scores, gammas,
                                     signs, thresholds_sq, tile_i: int = 512,
                                     tile_j: int = 2048, interpret=None,
                                     axis_name=None):
    """Mosaic twin of ops/phi.phi_rbf_terms_cross_fused_counts for the
    SHARDED multi-term fused sweep (see phi_rbf_fused_pallas_cross for the
    axis_name/counts contract)."""
    if interpret is None:
        interpret = _default_interpret()
    if (tile_i == 512 and tile_j == 2048
            and sources.shape[0] <= 12288):
        tile_j = 1024  # terms-family small-n tile rule (see the
        # self-pair wrapper); applied on the gathered-source count
    return _terms_cross_impl_for(targets.shape[1])(
        targets, sources, source_scores, tuple(gammas),
        tuple(float(s) for s in signs), thresholds_sq,
        int(thresholds_sq.shape[0]), tile_i, tile_j, bool(interpret),
        vma_axis=axis_name,
    )
