"""Median / order-statistic selection for the RBF bandwidth heuristic.

The reference computes the median of all n^2 pairwise distances (INCLUDING
the n zero self-distances — reference GaussianRBFKernel.hpp:66) with an
in-place ``std::nth_element`` partial sort, averaging the two middle values
for even counts (GaussianRBFKernel.hpp:222-254).

On TPU there are two regimes:

  * exact     — full device sort of the n^2 values. Bit-parity with the
                reference semantics; fine up to n of a few thousand.
  * histogram — deterministic multi-pass histogram refinement that never
                materializes the n^2 distance matrix (tile-streamed) and
                needs no data-dependent control flow, so it jits and shards
                (psum over the counts). This is the distributed-median design
                called out in SURVEY.md §5/§7: the analog of the reference's
                nth_element for 100k+ particles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pairwise import squared_pairwise_distances

# ----------------------------------------------------------------------
# Exact path
# ----------------------------------------------------------------------


def median_exact(values: jnp.ndarray) -> jnp.ndarray:
    """Median of a 1-D array with the reference's even/odd semantics.

    Even count: average of the two middle values
    (reference GaussianRBFKernel.hpp:224-245); odd: middle value (:246-253).
    """
    values = jnp.ravel(values)
    n = values.shape[0]
    s = jnp.sort(values)
    if n % 2 == 0:
        return 0.5 * (s[n // 2 - 1] + s[n // 2])
    return s[n // 2]


def pairwise_distance_median_exact(coords: jnp.ndarray) -> jnp.ndarray:
    """Exact median of all n^2 pairwise distances (self-zeros included)."""
    sq = squared_pairwise_distances(coords)
    return median_exact(jnp.sqrt(sq))


# ----------------------------------------------------------------------
# Histogram-refinement selection (scalable, jittable, shardable)
# ----------------------------------------------------------------------


def _count_dtype(total: int):
    """Histogram accumulator dtype.

    int64 under x64; otherwise int32 when n^2 ranks fit, else float32 (rank
    resolution ~600 out of 1e10 at n=100k — invisible to a bandwidth median,
    documented trade-off of the no-x64 TPU fast path).
    """
    if jax.config.jax_enable_x64:
        return jnp.int64
    if total < 2**31 - 1:
        return jnp.int32
    return jnp.float32


def kth_smallest_hist(hist_fn, k, lo, hi, *, bins: int = 1024, passes: int = 3,
                      count_dtype=None):
    """Approximate the k-th smallest value (1-indexed rank) by histogram
    refinement.

    ``hist_fn(lo, hi) -> (bins,) counts`` must count how many values fall in
    each of ``bins`` equal-width buckets of [lo, hi); values outside [lo, hi)
    must not be counted. For a sharded input, ``hist_fn`` psums its local
    counts — the refinement logic is then identical on every shard.

    After ``passes`` rounds the value is localized to a bucket of width
    (hi - lo) / bins**passes; the bucket midpoint is returned. With the
    defaults that is a ~1e-9 relative localization — far below what the
    bandwidth heuristic can feel.
    """
    if count_dtype is None:
        count_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    k = jnp.asarray(k, count_dtype)
    lo = jnp.asarray(lo, jnp.float32 if not jax.config.jax_enable_x64 else jnp.float64)
    hi = jnp.asarray(hi, lo.dtype)
    for _ in range(passes):
        counts = hist_fn(lo, hi)
        cum = jnp.cumsum(counts)
        # first bucket where cumulative count reaches rank k
        b = jnp.argmax(cum >= k)
        width = (hi - lo) / bins
        below = jnp.where(b > 0, cum[b - 1], 0)
        k = k - below
        lo = lo + b.astype(lo.dtype) * width
        hi = lo + width
    return 0.5 * (lo + hi)


def cross_sq_hist(rows_coords: jnp.ndarray, cols_coords: jnp.ndarray, lo, hi, *,
                  bins: int, row_tile: int, count_dtype=jnp.int32):
    """Histogram of ||r_i - c_j||^2 over all (rows x cols) pairs in [lo, hi).

    Tile-streamed over row blocks: memory O(row_tile * n_cols), never
    O(n^2) (the ring-attention-shaped requirement from SURVEY.md §5).
    Inputs are shifted by the column mean like count_le_cross (f32
    Gram-identity cancellation guard; exact for the distances).
    """
    from .pairwise import auto_row_tile

    center = jnp.mean(cols_coords, axis=0)
    rows_coords = rows_coords - center
    cols_coords = cols_coords - center
    n_r = rows_coords.shape[0]
    n_c = cols_coords.shape[0]
    row_tile = auto_row_tile(n_c, row_tile)
    num_tiles = -(-n_r // row_tile)
    pad = num_tiles * row_tile - n_r
    padded = jnp.pad(rows_coords, ((0, pad), (0, 0)))
    row_norms_all = jnp.pad(jnp.sum(rows_coords * rows_coords, axis=1), (0, pad))
    col_norms = jnp.sum(cols_coords * cols_coords, axis=1)
    width = (hi - lo) / bins

    def body(t, hist):
        rows = jax.lax.dynamic_slice_in_dim(padded, t * row_tile, row_tile, axis=0)
        row_norms = jax.lax.dynamic_slice_in_dim(row_norms_all, t * row_tile, row_tile)
        gram = rows @ cols_coords.T  # (row_tile, n_c) MXU matmul
        sq = jnp.maximum(row_norms[:, None] + col_norms[None, :] - 2.0 * gram, 0.0)
        v = sq.ravel()
        # mask out padded rows
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (row_tile, n_c), 0) + t * row_tile
        valid = (row_ids.ravel() < n_r) & (v >= lo) & (v < hi)
        idx = jnp.clip(jnp.floor((v - lo) / width), 0, bins - 1).astype(jnp.int32)
        return hist.at[idx].add(valid.astype(count_dtype))

    hist0 = jnp.zeros(bins, count_dtype)
    return jax.lax.fori_loop(0, num_tiles, body, hist0)


def _pairwise_sq_hist(coords: jnp.ndarray, lo, hi, *, bins: int, row_tile: int,
                      count_dtype=jnp.int32):
    """Histogram of all n^2 pairwise SQUARED distances in [lo, hi)."""
    return cross_sq_hist(
        coords, coords, lo, hi, bins=bins, row_tile=row_tile, count_dtype=count_dtype
    )


@partial(jax.jit, static_argnames=("bins", "passes", "row_tile"))
def pairwise_distance_median_histogram(
    coords: jnp.ndarray,
    *,
    bins: int = 1024,
    passes: int = 3,
    row_tile: int = 512,
) -> jnp.ndarray:
    """CPU/parity-only median of all n^2 pairwise distances.

    Uses a device scatter-add histogram — fine on CPU, but TPU scatters
    serialize (~100x slower than the arithmetic around them); every hot
    path uses the compare/reduce bisect or warm selection instead. Kept for
    cross-validation of the selection algorithms.

    Selection runs on squared distances (monotone in distance, so order
    statistics map 1:1); the two middle order statistics are sqrt'ed and
    averaged exactly like the reference's even-count rule
    (GaussianRBFKernel.hpp:224-245).
    """
    coords = jnp.asarray(coords)
    coords = coords - jnp.mean(coords, axis=0)  # translation-invariant
    n = coords.shape[0]
    total = n * n
    cdt = _count_dtype(total)
    sq_norms = jnp.sum(coords * coords, axis=1)
    hi0 = 4.0 * jnp.max(sq_norms) * (1.0 + 1e-6) + 1e-30

    hist_fn = lambda lo, hi: _pairwise_sq_hist(
        coords, lo, hi, bins=bins, row_tile=row_tile, count_dtype=cdt
    )
    if total % 2 == 0:
        # Two independent refinements (2*passes full sweeps); fine for this
        # parity-only cross-validation path — the hot paths batch both
        # middle ranks per pass (kth_smallest_bisect).
        a = kth_smallest_hist(hist_fn, total // 2, 0.0, hi0, bins=bins,
                              passes=passes, count_dtype=cdt)
        b = kth_smallest_hist(hist_fn, total // 2 + 1, 0.0, hi0, bins=bins,
                              passes=passes, count_dtype=cdt)
        return 0.5 * (jnp.sqrt(a) + jnp.sqrt(b))
    mid = kth_smallest_hist(hist_fn, (total + 1) // 2, 0.0, hi0, bins=bins,
                            passes=passes, count_dtype=cdt)
    return jnp.sqrt(mid)


# ----------------------------------------------------------------------
# Count-bisection selection (scatter-free — the TPU fast path)
# ----------------------------------------------------------------------
#
# TPU scatter-adds serialize, which makes the bincount histogram above ~100x
# slower than the arithmetic it wraps (measured: 0.9 s per sweep at n=10k on
# v5e). The selection below needs only compare+reduce — pure VPU work — by
# counting, for a vector of E thresholds, how many squared distances fall at
# or below each. The counts are GLOBAL cumulative ranks, so the target rank
# stays fixed across refinement passes (no per-interval rank rebasing).


def count_le_cross(rows_coords, cols_coords, thresholds, *, row_tile: int = 2048,
                   axis_name=None):
    """For each threshold t: count of ||r_i - c_j||^2 <= t over all pairs.

    Tile-streamed (memory O(row_tile * n_cols)); counts accumulate in f32 —
    at n=100k the ~2^-24 relative rounding is a rank slop of a few hundred
    out of 1e10, invisible to a bandwidth median.

    Both inputs are shifted by the COLUMN mean internally (distances are
    translation-invariant; the shared shift preserves them exactly): the
    Gram-identity squared distances lose ~eps * |x|^2 in f32, so an
    off-origin cluster at offset 1e4 would otherwise produce garbage counts.
    Under shard_map, pass the gathered GLOBAL set as ``cols_coords`` so the
    shift is identical on every shard.
    """
    from .pairwise import auto_row_tile

    center = jnp.mean(cols_coords, axis=0)
    rows_coords = rows_coords - center
    cols_coords = cols_coords - center
    n_r = rows_coords.shape[0]
    n_c = cols_coords.shape[0]
    row_tile = auto_row_tile(n_c, row_tile)
    num_tiles = -(-n_r // row_tile)
    pad = num_tiles * row_tile - n_r
    padded = jnp.pad(rows_coords, ((0, pad), (0, 0)))
    row_norms_all = jnp.pad(jnp.sum(rows_coords * rows_coords, axis=1), (0, pad))
    col_norms = jnp.sum(cols_coords * cols_coords, axis=1)
    n_thresh = thresholds.shape[0]

    def body(t, acc):
        rows = jax.lax.dynamic_slice_in_dim(padded, t * row_tile, row_tile, axis=0)
        row_norms = jax.lax.dynamic_slice_in_dim(row_norms_all, t * row_tile, row_tile)
        gram = rows @ cols_coords.T  # (row_tile, n_c) MXU
        sq = jnp.maximum(row_norms[:, None] + col_norms[None, :] - 2.0 * gram, 0.0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (row_tile, n_c), 0) + t * row_tile
        valid = row_ids < n_r
        c = jnp.sum(
            (sq[None, :, :] <= thresholds[:, None, None]) & valid[None, :, :],
            axis=(1, 2),
            dtype=jnp.float32,
        )
        return acc + c

    acc0 = jnp.zeros(n_thresh, jnp.float32)
    if axis_name is not None:
        acc0 = jax.lax.pcast(acc0, (axis_name,), to="varying")
    return jax.lax.fori_loop(0, num_tiles, body, acc0)


def kth_smallest_bisect(count_le_fn, ks, lo, hi, *, bins: int = 16,
                        passes: int = 6):
    """Localize the k-th smallest value(s) by threshold-count bisection.

    ``ks`` is a sequence of R (1-indexed) ranks selected JOINTLY: every
    refinement pass issues one flattened (R * bins,) threshold batch, so
    selecting both middle order statistics of an even count costs the same
    number of data passes as one rank.

    ``count_le_fn(thresholds (E,)) -> (E,) f32`` returns GLOBAL cumulative
    counts (values <= threshold over the whole data set; psum'ed when
    sharded) — the target rank therefore stays fixed across passes. After
    ``passes`` rounds each value sits in an interval of width
    (hi - lo) / bins**passes; midpoints are returned, shape (R,)
    (defaults: ~6e-8 relative).
    """
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ks = jnp.atleast_1d(jnp.asarray(ks, jnp.float32))
    r = ks.shape[0]
    lo = jnp.full((r,), lo, fdt)
    hi = jnp.full((r,), hi, fdt)
    edges = jnp.arange(1, bins + 1, dtype=fdt)
    for _ in range(passes):
        width = (hi - lo) / bins  # (R,)
        thresholds = lo[:, None] + width[:, None] * edges[None, :]  # (R, bins)
        cum = count_le_fn(thresholds.reshape(-1)).reshape(r, bins)
        b = jnp.argmax(cum >= ks[:, None], axis=1)  # first edge with rank >= k
        lo = lo + b.astype(fdt) * width
        hi = lo + width
    return 0.5 * (lo + hi)


@partial(jax.jit, static_argnames=("bins", "passes", "row_tile"))
def pairwise_distance_median_bisect(
    coords: jnp.ndarray,
    *,
    bins: int = 16,
    passes: int = 6,
    row_tile: int = 2048,
) -> jnp.ndarray:
    """Scalable near-exact median of all n^2 pairwise distances.

    Selection runs on squared distances (monotone, so order statistics map
    1:1); each selected order statistic is localized to bins**-passes of the
    value range (~6e-8 relative by default). Even counts select BOTH middle
    ranks jointly and average the sqrt'ed values — the reference's
    even-count rule (GaussianRBFKernel.hpp:224-245).
    """
    coords = jnp.asarray(coords)
    coords = coords - jnp.mean(coords, axis=0)  # translation-invariant; see count_le_cross
    n = coords.shape[0]
    total = n * n
    sq_norms = jnp.sum(coords * coords, axis=1)
    hi0 = 4.0 * jnp.max(sq_norms) * (1.0 + 1e-6) + 1e-30
    ks = (total // 2, total // 2 + 1) if total % 2 == 0 else ((total + 1) // 2,)

    count_fn = lambda thr: count_le_cross(coords, coords, thr, row_tile=row_tile)
    mids = kth_smallest_bisect(count_fn, ks, 0.0, hi0, bins=bins, passes=passes)
    return jnp.mean(jnp.sqrt(mids))


# ----------------------------------------------------------------------
# Hybrid sample-bracket + count-verify selection (fastest near-exact path)
# ----------------------------------------------------------------------
#
# Every full-data count pass costs ~milliseconds at n=10k (VPU-bound), so
# the cheapest near-exact strategy minimizes full passes: a deterministic
# low-discrepancy subsample of pairs brackets the median to ~1e-3 of the
# value range almost for free, then 1-2 full count passes localize the true
# global order statistics inside the bracket. Counts VERIFY the bracket: if
# sampling error ever exceeded the margin (probability ~1e-9 at the default
# margin), a lax.cond falls back to the full-range bisection, so the result
# is never silently wrong.


def _sampled_pair_sq_dists(coords: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Squared distances of a deterministic low-discrepancy pair subsample.

    Index pairs follow two odd golden-ratio strides mod n — cheap,
    reproducible, and shard-replicable (no RNG state). Indices are built
    host-side in uint64 at trace time (num_samples and n are static), so
    there is no 32-bit wraparound at large n.
    """
    import numpy as _np

    coords = jnp.asarray(coords)
    n = coords.shape[0]
    ks = _np.arange(num_samples, dtype=_np.uint64)
    stride_i = _np.uint64(int(n * 0.6180339887498949) | 1)
    stride_j = _np.uint64(int(n * 0.7548776662466927) | 1)
    i = jnp.asarray(((ks * stride_i) % _np.uint64(n)).astype(_np.int32))
    j = jnp.asarray(
        ((ks * stride_j + ks // _np.uint64(max(n, 1))) % _np.uint64(n)).astype(
            _np.int32
        )
    )
    diff = coords[i] - coords[j]
    return jnp.sum(diff * diff, axis=1)


def median_sq_bracket_from_sample(coords: jnp.ndarray, num_samples: int,
                                  margin_sigmas: float = 8.0):
    """[lo, hi] squared-distance bracket believed to contain the median.

    The global median's sample rank is Binomial(M, 1/2); bracketing at
    +/- margin_sigmas * sqrt(M)/2 sample ranks misses with probability
    ~erfc(margin_sigmas/sqrt(2)) (~1e-15 at 8 sigma).
    """
    sq = _sampled_pair_sq_dists(coords, num_samples)
    s = jnp.sort(sq)
    half_width = int(margin_sigmas * (num_samples ** 0.5) / 2.0) + 1
    r_lo = max(num_samples // 2 - half_width, 0)
    r_hi = min(num_samples // 2 + half_width, num_samples - 1)
    return s[r_lo], s[r_hi]


def _refine_pair_in_bracket(count_fn, k1, k2, lo, hi, *, bins: int, passes: int):
    """Localize ranks k1 <= k2 inside [lo, hi) with SHARED edge batches.

    Each pass issues bins+1 thresholds (the bracket edges); both ranks'
    buckets are read off the same cumulative counts and the interval shrinks
    to the hull of the two buckets (>= bins/2 shrink per pass; bins when the
    ranks share a bucket, the common case). Returns (value_k1, value_k2,
    bracket_valid, (final_lo, final_hi)) where bracket_valid confirms both
    ranks were inside the initial bracket and the final hull still contains
    both order statistics (seed for warm-started selection next step).
    """
    fdt = lo.dtype
    k1 = jnp.asarray(k1, jnp.float32)
    k2 = jnp.asarray(k2, jnp.float32)
    edges01 = jnp.arange(0, bins + 1, dtype=fdt)
    valid = hi > lo  # degenerate/uninitialized brackets are invalid
    v1 = v2 = None
    for p in range(passes):
        width = (hi - lo) / bins
        thresholds = lo + width * edges01  # (bins+1,) incl. both ends
        cum = count_fn(thresholds)
        if p == 0:
            # bracket verification: k-th values must lie inside (lo, hi]
            valid = valid & (cum[0] < k1) & (cum[-1] >= k2)
        b1 = jnp.argmax(cum[1:] >= k1)  # bucket of k1 among bins buckets
        b2 = jnp.argmax(cum[1:] >= k2)
        v1 = lo + (b1.astype(fdt) + 0.5) * width
        v2 = lo + (b2.astype(fdt) + 0.5) * width
        new_lo = lo + b1.astype(fdt) * width
        new_hi = lo + (b2.astype(fdt) + 1.0) * width
        lo, hi = new_lo, new_hi
    return v1, v2, valid, (lo, hi)


def pairwise_distance_median_hybrid(
    coords: jnp.ndarray,
    *,
    num_samples: int = 1 << 16,
    bins: int = 16,
    passes: int = 2,
    row_tile: int = 2048,
    fallback_bins: int = 16,
    fallback_passes: int = 6,
) -> jnp.ndarray:
    """Near-exact scalable median: sample-bracket + count-verified refine.

    Cost: one ~2^18 sort (cheap) + ``passes`` full count passes, vs.
    ``fallback_passes`` full passes for pure bisection. Falls back to the
    full-range bisection inside a lax.cond if the bracket check fails.
    """
    coords = jnp.asarray(coords)
    coords = coords - jnp.mean(coords, axis=0)  # translation-invariant
    n = coords.shape[0]
    total = n * n
    k1 = total // 2 if total % 2 == 0 else (total + 1) // 2
    k2 = total // 2 + 1 if total % 2 == 0 else k1

    count_fn = lambda thr: count_le_cross(coords, coords, thr, row_tile=row_tile)
    lo_s, hi_s = median_sq_bracket_from_sample(coords, min(num_samples, total))
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    lo_s = lo_s.astype(fdt)
    hi_s = jnp.maximum(hi_s.astype(fdt), lo_s * (1 + 1e-6) + 1e-30)

    v1, v2, valid, _ = _refine_pair_in_bracket(
        count_fn, k1, k2, lo_s, hi_s, bins=bins, passes=passes
    )
    fast = 0.5 * (jnp.sqrt(v1) + jnp.sqrt(v2))

    def fallback(_):
        sq_norms = jnp.sum(coords * coords, axis=1)
        hi0 = 4.0 * jnp.max(sq_norms) * (1.0 + 1e-6) + 1e-30
        ks = (k1, k2) if total % 2 == 0 else (k1,)
        mids = kth_smallest_bisect(
            count_fn, ks, 0.0, hi0, bins=fallback_bins, passes=fallback_passes
        )
        return jnp.mean(jnp.sqrt(mids))

    return jax.lax.cond(valid, lambda _: fast, fallback, operand=None)


# ----------------------------------------------------------------------
# Warm-started selection (temporal coherence across SVGD steps)
# ----------------------------------------------------------------------


def warm_median_select(
    count_fn,
    total: int,
    hi0,
    bracket_lo_d,
    bracket_hi_d,
    max_disp,
    *,
    sample_bracket_fn=None,
    bins: int = 16,
    passes: int = 2,
    warm_bins: int = 8,
    warm_passes: int = 1,
    fallback_bins: int = 16,
    fallback_passes: int = 6,
):
    """count_fn-generic warm-started median selection.

    Between consecutive steps every particle moves by at most ``max_disp``,
    so every pairwise DISTANCE — and hence every order statistic, including
    the median — changes by at most 2 * max_disp. Expanding the previous
    step's localization interval by that guaranteed bound gives a tight,
    deterministic bracket with no per-step pair sampling or sorting; the
    count pass itself verifies containment, chaining to the sample bracket
    (when ``sample_bracket_fn`` is given) and then the full [0, hi0]
    bisection on (rare) failure. ``count_fn`` may psum over a mesh axis —
    the selection is then replicated on every shard.

    Returns (median_distance, new_bracket_lo_d, new_bracket_hi_d); brackets
    live in DISTANCE space (the movement bound is additive there). Pass an
    empty bracket (hi < lo, e.g. (0, -1)) on the first step.
    """
    k1 = total // 2 if total % 2 == 0 else (total + 1) // 2
    k2 = total // 2 + 1 if total % 2 == 0 else k1
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # Sentinel check BEFORE any arithmetic: an uninitialized bracket is
    # hi < lo in DISTANCE space; squaring a negative hi would otherwise
    # manufacture a plausible-looking [0, ~1] squared bracket that the
    # count verification can wrongly accept when the median happens to lie
    # inside it.
    bracket_initialized = bracket_hi_d >= bracket_lo_d
    pad = 2.0 * max_disp + 1e-12
    lo_d = jnp.maximum(bracket_lo_d - pad, 0.0).astype(fdt)
    hi_d = jnp.maximum(bracket_hi_d + pad, 0.0).astype(fdt)
    # The warm bracket is only a few displacement-bounds wide, so a single
    # refinement pass already localizes to ~(bracket/bins); the cold branch
    # (sample bracket ~1e-3 of range) keeps the deeper refinement.
    v1, v2, warm_valid, (flo, fhi) = _refine_pair_in_bracket(
        count_fn, k1, k2, lo_d * lo_d, hi_d * hi_d, bins=warm_bins,
        passes=warm_passes,
    )
    warm_valid = warm_valid & bracket_initialized

    def full(_):
        mids = kth_smallest_bisect(
            count_fn, (k1, k2), 0.0, hi0, bins=fallback_bins,
            passes=fallback_passes,
        )
        med = jnp.mean(jnp.sqrt(mids))
        # mids are bucket MIDPOINTS; expand by the final bucket width so the
        # returned bracket genuinely contains the order statistics (else the
        # next warm containment check can fail forever once disp ~ 0).
        slack = hi0 / (float(fallback_bins) ** fallback_passes)
        lo_b = jnp.sqrt(jnp.maximum(mids[0] - slack, 0.0))
        hi_b = jnp.sqrt(mids[-1] + slack)
        return med, lo_b, hi_b

    if sample_bracket_fn is not None:

        def cold(_):
            lo_s, hi_s = sample_bracket_fn()
            lo_s = lo_s.astype(fdt)
            hi_s = jnp.maximum(hi_s.astype(fdt), lo_s * (1 + 1e-6) + 1e-30)
            c_v1, c_v2, c_valid, (c_lo, c_hi) = _refine_pair_in_bracket(
                count_fn, k1, k2, lo_s, hi_s, bins=bins, passes=passes
            )

            def ok(_):
                med = 0.5 * (jnp.sqrt(c_v1) + jnp.sqrt(c_v2))
                return med, jnp.sqrt(jnp.maximum(c_lo, 0.0)), jnp.sqrt(c_hi)

            return jax.lax.cond(c_valid, ok, full, operand=None)

    else:
        cold = full

    def warm(_):
        med = 0.5 * (jnp.sqrt(v1) + jnp.sqrt(v2))
        return med, jnp.sqrt(jnp.maximum(flo, 0.0)), jnp.sqrt(fhi)

    return jax.lax.cond(warm_valid, warm, cold, operand=None)


def pairwise_distance_median_warm(
    coords: jnp.ndarray,
    bracket_lo_d: jnp.ndarray,
    bracket_hi_d: jnp.ndarray,
    max_disp: jnp.ndarray,
    *,
    num_samples: int = 1 << 16,
    bins: int = 16,
    passes: int = 2,
    warm_passes: int = 1,
    warm_bins: int = 8,
    row_tile: int = 2048,
):
    """Single-device warm-started pairwise-distance median (see
    :func:`warm_median_select`)."""
    coords = jnp.asarray(coords)
    coords = coords - jnp.mean(coords, axis=0)  # translation-invariant
    n = coords.shape[0]
    total = n * n

    count_fn = lambda thr: count_le_cross(coords, coords, thr, row_tile=row_tile)
    sq_norms = jnp.sum(coords * coords, axis=1)
    hi0 = 4.0 * jnp.max(sq_norms) * (1.0 + 1e-6) + 1e-30
    sample_bracket_fn = lambda: median_sq_bracket_from_sample(
        coords, min(num_samples, total)
    )
    return warm_median_select(
        count_fn, total, hi0, bracket_lo_d, bracket_hi_d, max_disp,
        sample_bracket_fn=sample_bracket_fn,
        bins=bins, passes=passes, warm_bins=warm_bins, warm_passes=warm_passes,
    )


def fused_median_from_counts(
    counts,
    lo_sq,
    hi_sq,
    total: int,
    count_fn,
    hi0,
    *,
    bins: int,
    initialized,
    fallback_bins: int = 16,
    fallback_passes: int = 6,
):
    """Median update from the counts a fused phi sweep already produced.

    ``counts`` are cumulative pair counts at the ``bins + 1`` equal-width
    squared-distance edges of [lo_sq, hi_sq] — exactly what ONE warm
    refinement pass would have measured (see warm_median_select); this
    function is the post-processing half of that pass, split out so the
    count sweep can ride inside the phi tile loop. Verification is
    identical: if the bracket did not contain both middle order statistics,
    a full count-bisection on the current coordinates recovers exactly
    (``count_fn`` as in kth_smallest_bisect).

    Returns (median_distance, new_bracket_lo_d, new_bracket_hi_d).
    """
    k1 = total // 2 if total % 2 == 0 else (total + 1) // 2
    k2 = total // 2 + 1 if total % 2 == 0 else k1
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # Ranks as f32 like every other selector here (kth_smallest_bisect,
    # _refine_pair_in_bracket): a raw Python int rank overflows int32 weak
    # typing once n^2/2 > 2^31 (n > ~65k, hit by the fused auto path).
    k1f = jnp.asarray(k1, jnp.float32)
    k2f = jnp.asarray(k2, jnp.float32)
    lo_sq = jnp.asarray(lo_sq, fdt)
    hi_sq = jnp.asarray(hi_sq, fdt)
    cum = counts
    valid = (
        jnp.asarray(initialized)
        & (hi_sq > lo_sq)
        & (cum[0] < k1f)
        & (cum[-1] >= k2f)
    )
    width = (hi_sq - lo_sq) / bins
    b1 = jnp.argmax(cum[1:] >= k1f)
    b2 = jnp.argmax(cum[1:] >= k2f)
    v1 = lo_sq + (b1.astype(fdt) + 0.5) * width
    v2 = lo_sq + (b2.astype(fdt) + 0.5) * width

    def ok(_):
        med = 0.5 * (jnp.sqrt(v1) + jnp.sqrt(v2))
        lo_b = jnp.sqrt(jnp.maximum(lo_sq + b1.astype(fdt) * width, 0.0))
        hi_b = jnp.sqrt(lo_sq + (b2.astype(fdt) + 1.0) * width)
        return med, lo_b, hi_b

    def full(_):
        ks = (k1, k2) if total % 2 == 0 else (k1,)
        mids = kth_smallest_bisect(
            count_fn, ks, 0.0, hi0, bins=fallback_bins, passes=fallback_passes
        )
        med = jnp.mean(jnp.sqrt(mids))
        slack = hi0 / (float(fallback_bins) ** fallback_passes)
        lo_b = jnp.sqrt(jnp.maximum(mids[0] - slack, 0.0))
        hi_b = jnp.sqrt(mids[-1] + slack)
        return med, lo_b, hi_b

    return jax.lax.cond(valid, ok, full, operand=None)


# ----------------------------------------------------------------------
# Dispatch
# ----------------------------------------------------------------------

#: Above this particle count the exact full-sort median switches to the
#: scalable selection path: the n^2 device sort dominates whole SVGD steps
#: well before memory does (measured 3x total-step cost at n=1000 on v5e).
#: Force ``median_method='exact'`` for strict reference-parity at any n.
EXACT_MEDIAN_MAX_PARTICLES = 512


def pairwise_distance_median(coords: jnp.ndarray, method: str = "auto") -> jnp.ndarray:
    """Median pairwise distance with automatic exact/hybrid dispatch.

    'warm' is accepted for one-shot calls (kernel construction, manual
    ComputeScale) and behaves like 'auto' — the warm bracket only exists
    inside the driver loop, which calls compute_scale_with_aux directly.
    """
    if method == "warm":
        method = "auto"
    n = coords.shape[0]
    if method == "exact" or (method == "auto" and n <= EXACT_MEDIAN_MAX_PARTICLES):
        return pairwise_distance_median_exact(coords)
    if method in ("hybrid", "auto"):
        return pairwise_distance_median_hybrid(coords)
    if method == "bisect":
        return pairwise_distance_median_bisect(coords)
    if method == "histogram":
        return pairwise_distance_median_histogram(coords)
    raise ValueError(f"unknown median method: {method!r}")


def fused_median_seed(coords: jnp.ndarray, method: str = "auto") -> dict:
    """{med, lo, hi, disp} seed for the fused phi+median-count pipeline.

    The INITIAL positions' median (a one-time cost, honoring the owning
    kernel's ``median_method``) with a tight bracket that the per-step
    movement bound then expands. Single definition shared by
    GaussianRBFKernel.init_fused_aux, the driver's fused_terms seeding and
    ShardedSVGD._init_scale_aux so the lag-1 contract cannot drift.
    """
    med = pairwise_distance_median(coords, method)
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    med = jnp.asarray(med, fdt)
    return {
        "med": med,
        "lo": med * (1.0 - 1e-3),
        "hi": med * (1.0 + 1e-3),
        "disp": jnp.asarray(0.0, fdt),
    }


def fused_lag1_plan(med, lo, hi, disp, n_total, fused_bins, compute_dtype):
    """Lag-1 scale + selection thresholds for the fused phi+median sweep.

    Returns ``(gamma, lo_sq, hi_sq, thresholds)``: the PREVIOUS step's
    verified median as this step's bandwidth (gamma = log(n)/med^2), and
    the squared-distance bracket expanded by the movement bound (each
    particle moved at most ``disp``, so any pairwise distance changed by at
    most 2*disp) split into ``fused_bins`` selection edges. Single
    definition shared by the driver step and ShardedSVGD.local_step so the
    bracket/threshold numerics cannot drift between the two.
    """
    fdt = med.dtype
    gamma = (jnp.log(float(n_total)) / (med * med)).astype(compute_dtype)
    pad_d = 2.0 * disp + 1e-12
    lo_d = jnp.maximum(lo - pad_d, 0.0)
    hi_d = hi + pad_d
    lo_sq, hi_sq = lo_d * lo_d, hi_d * hi_d
    edges = jnp.arange(0, fused_bins + 1, dtype=fdt)
    thresholds = lo_sq + (hi_sq - lo_sq) * edges / fused_bins
    return gamma, lo_sq, hi_sq, thresholds
