"""Pallas kernel tests (interpreter mode on the CPU test platform).

Compiled-mode equivalence with the XLA paths is exercised on real TPU by
bench.py and the verify drive; here the interpreter validates the kernel
logic (tiling, padding, accumulation) against the XLA implementations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from svgdcpp_tpu.ops.median import count_le_cross
from svgdcpp_tpu.ops.pallas_phi import count_le_pallas, phi_rbf_pallas
from svgdcpp_tpu.ops.phi import phi_rbf


@pytest.mark.parametrize("n", [100, 517])
def test_phi_pallas_matches_xla(rng, n):
    m = 2
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    p_mat = jnp.asarray(np.array([[0.7, 0.1], [0.1, 0.5]]), jnp.float32)
    ref = np.asarray(phi_rbf(coords, scores, p_mat))
    out = np.asarray(
        phi_rbf_pallas(coords, scores, p_mat, tile_i=64, tile_j=128)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_count_pallas_matches_xla(rng):
    n, m = 300, 3
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thr = jnp.linspace(0.1, 10.0, 9)
    ref = np.asarray(count_le_cross(coords, coords, thr, row_tile=64))
    out = np.asarray(
        count_le_pallas(coords, coords, thr, num_thresholds=9, tile_i=64,
                        tile_j=128)
    )
    np.testing.assert_array_equal(out, ref)


def test_phi_pallas_ragged_padding(rng):
    """n not divisible by either tile: padded rows must not leak."""
    n, m = 73, 2
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    p_mat = jnp.eye(m, dtype=jnp.float32) * 0.4
    ref = np.asarray(phi_rbf(coords, scores, p_mat))
    out = np.asarray(phi_rbf_pallas(coords, scores, p_mat, tile_i=32, tile_j=32))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_phi_pallas_off_origin_centering(rng):
    """Advisor finding: the pallas path must mean-center before the Gram
    identity (translation-invariance of phi)."""
    n, m = 96, 2
    coords = jnp.asarray(rng.normal(size=(n, m)) + 200.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gamma = float(np.log(n) / 2.0)
    p_mat = gamma * jnp.eye(m, dtype=jnp.float32)
    ref = np.asarray(
        phi_rbf(
            jnp.asarray(np.asarray(coords), jnp.float64),
            jnp.asarray(np.asarray(scores), jnp.float64),
            jnp.asarray(np.asarray(p_mat), jnp.float64),
        )
    )
    out = np.asarray(phi_rbf_pallas(coords, scores, p_mat, tile_i=32, tile_j=32))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 2e-3, rel


def test_fused_pallas_matches_xla_fused(rng):
    """The fused pallas kernel (phi + counts in one pass) matches the XLA
    fused op; counts allow boundary-tie rank noise only."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    n, m = 200, 2
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gamma = 0.6
    thresholds = jnp.asarray(np.linspace(0.0, 20.0, 9), jnp.float32)

    phi_x, counts_x = phi_rbf_fused_counts(
        coords, scores, gamma, thresholds, row_tile=64
    )
    phi_p, counts_p = phi_rbf_fused_pallas(
        coords, scores, gamma, thresholds, tile_i=64, tile_j=64
    )
    np.testing.assert_allclose(
        np.asarray(phi_p), np.asarray(phi_x), rtol=2e-4, atol=2e-5
    )
    assert np.abs(np.asarray(counts_p) - np.asarray(counts_x)).max() <= n


def test_fused_pallas_through_driver(rng):
    """phi_impl='fused_pallas' (interpreter on CPU) behaves like 'fused'."""
    import svgdcpp_tpu as sv

    n, dim, iters = 600, 2, 3
    x0 = rng.normal(size=(n, dim)).astype(np.float32) * 2

    def run(impl):
        model = sv.MultivariateNormal(
            np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
        )
        kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model)
        svgd = sv.SVGD(
            sv.SVGDOptions(
                dimension=dim, num_iterations=iters,
                coordinate_matrix=x0.copy(), kernel=kernel, model=model,
                optimizer=sv.AdaGrad(dim, n, 0.1), phi_impl=impl,
            )
        )
        svgd.initialize()
        return np.asarray(svgd.run())

    np.testing.assert_allclose(
        run("fused_pallas"), run("fused"), rtol=2e-3, atol=2e-4
    )


def test_fused_terms_pallas_matches_xla(rng):
    """Multi-term Mosaic kernel (interpreter on CPU) == the XLA multi-term
    fused sweep: phi and counts."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_terms_fused_pallas
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    n, m = 700, 3
    coords = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32) + 2.0)
    scores = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
    gammas = [jnp.float32(0.6), jnp.float32(0.08)]
    signs = [1, -1]
    thresholds = jnp.asarray(np.linspace(0.5, 40.0, 4), jnp.float32)

    phi_p, cnt_p = phi_rbf_terms_fused_pallas(
        coords, scores, gammas, signs, thresholds
    )
    phi_x, cnt_x = phi_rbf_terms_fused_counts(
        coords, scores, gammas, signs, thresholds, row_tile=256
    )
    np.testing.assert_allclose(
        np.asarray(phi_p), np.asarray(phi_x), rtol=2e-4, atol=2e-6
    )
    # boundary-tie noise only (Gram rounding differs per implementation)
    assert np.abs(np.asarray(cnt_p) - np.asarray(cnt_x)).max() <= n


def test_fused_terms_pallas_through_driver(rng):
    """phi_impl='fused_terms_pallas' (interpreter on CPU) behaves like
    'fused_terms' on the hier-bench kernel shape; positivity validation
    rejects division compositions."""
    import pytest

    import svgdcpp_tpu as sv

    n, dim, iters = 1100, 2, 3
    x0 = rng.normal(size=(n, dim)).astype(np.float32) * 2

    def run(impl):
        model = sv.MultivariateNormal(
            np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
        )
        kernel = sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.MEDIAN, model
        ) + sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.CONSTANT,
            constant_scale=0.1 * np.eye(dim, dtype=np.float32),
        )
        svgd = sv.SVGD(
            sv.SVGDOptions(
                dimension=dim, num_iterations=iters,
                coordinate_matrix=x0.copy(), kernel=kernel, model=model,
                optimizer=sv.AdaGrad(dim, n, 0.1), phi_impl=impl,
            )
        )
        svgd.initialize()
        return np.asarray(svgd.run())

    np.testing.assert_allclose(
        run("fused_terms_pallas"), run("fused_terms"), rtol=2e-3, atol=2e-4
    )

    # division term -> negative effective gamma -> pallas variant rejected
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    kernel = sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model
    ) / sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT,
        constant_scale=0.05 * np.eye(dim, dtype=np.float32),
    )
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=1, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model, optimizer=sv.AdaGrad(dim, n, 0.1),
            phi_impl="fused_terms_pallas",
        )
    )
    with pytest.raises(ValueError, match="positive"):
        svgd.initialize()


def test_fused_terms_pallas_hot_swap_rejects_negative(rng):
    """Hot-swapping a NEGATIVE isotropic constant into a running
    fused_terms_pallas driver must be rejected (isotropy alone passed the
    old check, then exp(-gamma*big) inverted to inf -> NaN particles)."""
    import pytest

    import svgdcpp_tpu as sv

    n, dim = 1100, 2
    x0 = rng.normal(size=(n, dim)).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    kernel = sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model
    ) + sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT,
        constant_scale=0.1 * np.eye(dim, dtype=np.float32),
    )
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=1, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model, optimizer=sv.AdaGrad(dim, n, 0.1),
            phi_impl="fused_terms_pallas",
        )
    )
    svgd.initialize()
    bad = [np.asarray(p) for p in svgd.kernel.parameters]
    bad[1] = -0.1 * np.eye(dim, dtype=np.float32)
    with pytest.raises(ValueError, match="positive"):
        svgd.update_kernel_parameters(bad)


def test_phi_pallas_indefinite_p_not_clamped(rng):
    """phi_rbf_pallas(psd=False) matches the unclamped closed form on an
    indefinite (Hessian-style) P; the driver's 'pallas' impl threads its
    PSD classification through."""
    import svgdcpp_tpu as sv
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_pallas
    from svgdcpp_tpu.ops.phi import phi_rbf

    n, m = 64, 2
    coords = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
    scores = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
    p = jnp.asarray(np.array([[0.4, 0.0], [0.0, -0.3]], np.float32))

    got = phi_rbf_pallas(coords, scores, p, psd=False)
    expect = phi_rbf(coords, scores, p, psd=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=5e-4, atol=5e-6
    )

    # driver classification: HESSIAN scale on a GMM -> psd False on the
    # pallas impl too
    m1 = sv.MultivariateNormal(np.array([4.0, 0.0]), np.eye(2))
    m2 = sv.MultivariateNormal(np.array([-4.0, 0.0]), np.eye(2))
    gmm = m1 + m2
    x0 = rng.normal(size=(32, 2)) * 1.5
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=2, num_iterations=1, coordinate_matrix=x0.copy(),
            kernel=sv.GaussianRBFKernel(x0, sv.ScaleMethod.HESSIAN, gmm),
            model=gmm, optimizer=sv.AdaGrad(2, 32, 0.05), phi_impl="pallas",
        )
    )
    svgd.initialize()
    assert svgd._rbf_psd is False


def test_phi_pallas_bf16_dots(rng):
    """dot_dtype='bfloat16' (experimental): MXU operands in bf16, f32
    accumulation — phi within bf16 rounding of the f32 path."""
    n, m = 300, 4
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    p_mat = jnp.asarray(0.5 * np.eye(m) + 0.05, jnp.float32)
    ref = np.asarray(phi_rbf(coords, scores, p_mat))
    out = np.asarray(
        phi_rbf_pallas(coords, scores, p_mat, tile_i=64, tile_j=128,
                       dot_dtype="bfloat16")
    )
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 3e-2, rel  # bf16 has ~2^-8 relative rounding


def test_fused_pallas_bf16_dots(rng):
    """Fused phi+counts with bf16 MXU operands: phi within bf16 rounding;
    counts still verified-selection quality (small rank noise only)."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    n, m = 200, 2
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gamma = 0.6
    thresholds = jnp.asarray(np.linspace(0.0, 20.0, 9), jnp.float32)

    phi_x, counts_x = phi_rbf_fused_counts(
        coords, scores, gamma, thresholds, row_tile=64
    )
    phi_p, counts_p = phi_rbf_fused_pallas(
        coords, scores, gamma, thresholds, tile_i=64, tile_j=64,
        dot_dtype="bfloat16",
    )
    rel = (
        np.abs(np.asarray(phi_p) - np.asarray(phi_x)).max()
        / np.abs(np.asarray(phi_x)).max()
    )
    assert rel < 3e-2, rel
    # sq tiles are bf16-rounded -> bounded rank noise near each threshold
    assert np.abs(np.asarray(counts_p) - np.asarray(counts_x)).max() <= 4 * n


def test_fused_pallas_cross_matches_xla_cross(rng):
    """The sharded-form Mosaic fused sweep (local rows x global sources)
    matches the XLA cross fused op: phi rows and row-band counts."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas_cross
    from svgdcpp_tpu.ops.phi import phi_rbf_cross_fused_counts

    n, m = 192, 2
    coords = jnp.asarray(rng.normal(size=(n, m)) + 3.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gamma = 0.7
    thresholds = jnp.asarray(np.linspace(0.0, 30.0, 4), jnp.float32)

    # a 48-row shard against the full source set (off-origin cluster)
    rows = coords[32:80]
    phi_x, cnt_x = phi_rbf_cross_fused_counts(
        rows, coords, scores, gamma, thresholds, row_tile=64
    )
    phi_p, cnt_p = phi_rbf_fused_pallas_cross(
        rows, coords, scores, gamma, thresholds, tile_i=32, tile_j=64
    )
    np.testing.assert_allclose(
        np.asarray(phi_p), np.asarray(phi_x), rtol=2e-4, atol=2e-5
    )
    assert np.abs(np.asarray(cnt_p) - np.asarray(cnt_x)).max() <= n


def test_fused_terms_pallas_cross_matches_xla_cross(rng):
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_terms_fused_pallas_cross
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_cross_fused_counts

    n, m = 160, 3
    coords = jnp.asarray(rng.normal(size=(n, m)) - 2.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gammas = [jnp.float32(0.5), jnp.float32(0.05)]
    signs = [1, -1]
    thresholds = jnp.asarray(np.linspace(0.5, 40.0, 4), jnp.float32)

    rows = coords[:96]
    phi_x, cnt_x = phi_rbf_terms_cross_fused_counts(
        rows, coords, scores, gammas, signs, thresholds, row_tile=64
    )
    phi_p, cnt_p = phi_rbf_terms_fused_pallas_cross(
        rows, coords, scores, gammas, signs, thresholds, tile_i=32, tile_j=64
    )
    np.testing.assert_allclose(
        np.asarray(phi_p), np.asarray(phi_x), rtol=2e-4, atol=2e-5
    )
    assert np.abs(np.asarray(cnt_p) - np.asarray(cnt_x)).max() <= n


def test_driver_fused_pallas_bf16_dots(rng):
    """SVGDOptions.fused_dot_dtype='bfloat16' drives the bf16 Mosaic sweep
    end-to-end (interpreter on CPU) close to the f32 trajectory."""
    import svgdcpp_tpu as sv

    n, dim, iters = 600, 2, 3
    x0 = rng.normal(size=(n, dim)).astype(np.float32) * 2

    def run(dd):
        model = sv.MultivariateNormal(
            np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
        )
        kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model)
        svgd = sv.SVGD(
            sv.SVGDOptions(
                dimension=dim, num_iterations=iters,
                coordinate_matrix=x0.copy(), kernel=kernel, model=model,
                optimizer=sv.AdaGrad(dim, n, 0.1), phi_impl="fused_pallas",
                fused_dot_dtype=dd,
            )
        )
        svgd.initialize()
        return np.asarray(svgd.run())

    f32, bf16 = run("float32"), run("bfloat16")
    assert np.isfinite(bf16).all()
    rel = np.abs(bf16 - f32).max() / np.abs(f32).max()
    assert rel < 5e-2, rel


@pytest.mark.parametrize("n_dev", [4, 8])
def test_fused_pallas_shard_decomposition(rng, n_dev):
    """D>1 proof for the sharded Mosaic fused sweep (parallel/sharded.py
    local_step, fused_pallas branch): emulate the exact shard schedule by
    hand — slice the particle rows into D disjoint shards, run
    phi_rbf_fused_pallas_cross per shard (interpret mode, OUTSIDE
    shard_map), host-sum the per-shard row-band counts (the psum) — and
    assert the assembled result equals (a) a single global Mosaic sweep and
    (b) the global XLA fused sweep, INCLUDING the downstream
    fused_median_from_counts selection. This validates the cross-shard
    math the compiled shard_map+Mosaic+psum program runs at D>1, which no
    simulated mesh can execute (the pallas interpreter's grid loop is
    VMA-untyped inside shard_map — see CLAUDE.md)."""
    from svgdcpp_tpu.ops.median import (
        centered_count_env,
        fused_lag1_plan,
        fused_median_from_counts,
        fused_median_seed,
        pairwise_distance_median_exact,
    )
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas_cross
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    n, m = 256, 2
    shard = n // n_dev
    coords = jnp.asarray(rng.normal(size=(n, m)) * 2 + 1.5, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)

    # The exact per-step plan the sharded fused branch executes: lag-1
    # bandwidth + selection edges from the seeded aux.
    aux = fused_median_seed(coords, "auto")
    gamma, sel = fused_lag1_plan(aux, n, 3, jnp.float32)
    thresholds = sel["edges"]

    # --- per-shard Mosaic sweeps (the per-device halves of the psum) ---
    phi_shards, count_shards = [], []
    for d in range(n_dev):
        rows = coords[d * shard : (d + 1) * shard]
        phi_d, cnt_d = phi_rbf_fused_pallas_cross(
            rows, coords, scores, gamma, thresholds, tile_i=32, tile_j=64
        )
        phi_shards.append(np.asarray(phi_d))
        count_shards.append(np.asarray(cnt_d))
    phi_assembled = np.concatenate(phi_shards, axis=0)
    counts_summed = np.sum(count_shards, axis=0)  # host psum

    # (a) decomposition is exact against ONE global Mosaic sweep: same
    # centering (source-set mean), same per-row tile accumulation order.
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas

    phi_global_p, counts_global_p = phi_rbf_fused_pallas(
        coords, scores, gamma, thresholds, tile_i=32, tile_j=64
    )
    np.testing.assert_allclose(
        phi_assembled, np.asarray(phi_global_p), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(counts_summed, np.asarray(counts_global_p))

    # (b) matches the global XLA fused sweep within implementation rounding
    phi_x, counts_x = phi_rbf_fused_counts(
        coords, scores, gamma, thresholds, row_tile=64
    )
    np.testing.assert_allclose(
        phi_assembled, np.asarray(phi_x), rtol=2e-4, atol=2e-5
    )
    assert np.abs(counts_summed - np.asarray(counts_x)).max() <= n

    # (c) the summed counts drive the SAME median selection the compiled
    # sharded program would verify: the recovered median equals the exact
    # n^2 median of the current coordinates within the bracket width.
    count_fn, hi0 = centered_count_env(coords, row_tile=64)
    med, lo1, hi1, lo2, hi2 = fused_median_from_counts(
        jnp.asarray(counts_summed), sel, n * n, count_fn, hi0,
        initialized=jnp.asarray(True),
    )
    med_exact = float(pairwise_distance_median_exact(coords))
    assert float(lo1) <= med_exact * (1 + 1e-5)
    assert float(hi2) >= med_exact * (1 - 1e-5)
    np.testing.assert_allclose(float(med), med_exact, rtol=5e-3)


def test_fused_terms_pallas_shard_decomposition(rng):
    """Multi-term twin of the shard-decomposition proof (the
    fused_terms_pallas branch of parallel/sharded.py local_step)."""
    from svgdcpp_tpu.ops.median import fused_lag1_plan, fused_median_seed
    from svgdcpp_tpu.ops.pallas_phi import (
        phi_rbf_terms_fused_pallas,
        phi_rbf_terms_fused_pallas_cross,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    n, m, n_dev = 192, 3, 4
    shard = n // n_dev
    coords = jnp.asarray(rng.normal(size=(n, m)) - 2.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    signs = [1, 1]

    aux = fused_median_seed(coords, "auto")
    gamma, sel = fused_lag1_plan(aux, n, 3, jnp.float32)
    gammas = [gamma, jnp.float32(0.05)]
    thresholds = sel["edges"]

    phi_shards, count_shards = [], []
    for d in range(n_dev):
        rows = coords[d * shard : (d + 1) * shard]
        phi_d, cnt_d = phi_rbf_terms_fused_pallas_cross(
            rows, coords, scores, gammas, signs, thresholds,
            tile_i=16, tile_j=64,
        )
        phi_shards.append(np.asarray(phi_d))
        count_shards.append(np.asarray(cnt_d))
    phi_assembled = np.concatenate(phi_shards, axis=0)
    counts_summed = np.sum(count_shards, axis=0)

    phi_global_p, counts_global_p = phi_rbf_terms_fused_pallas(
        coords, scores, gammas, signs, thresholds, tile_i=16, tile_j=64
    )
    np.testing.assert_allclose(
        phi_assembled, np.asarray(phi_global_p), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(
        counts_summed, np.asarray(counts_global_p)
    )

    phi_x, counts_x = phi_rbf_terms_fused_counts(
        coords, scores, gammas, signs, thresholds, row_tile=64
    )
    np.testing.assert_allclose(
        phi_assembled, np.asarray(phi_x), rtol=2e-4, atol=2e-5
    )
    assert np.abs(counts_summed - np.asarray(counts_x)).max() <= n


def test_fused_pallas_gram_branch_large_m(rng):
    """m > _DIFF_FORM_MAX_M exercises the Gram branch with the manual
    bf16x3 split cross dot (Mosaic exposes no Precision.HIGH): phi and
    counts must still match the XLA fused sweep within the split's ~2^-16
    sq rounding."""
    from svgdcpp_tpu.ops.pallas_phi import _DIFF_FORM_MAX_M, phi_rbf_fused_pallas
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    n, m = 192, 7
    assert m > _DIFF_FORM_MAX_M
    coords = jnp.asarray(rng.normal(size=(n, m)) + 2.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gamma = 0.3
    thresholds = jnp.asarray(np.linspace(1.0, 60.0, 3), jnp.float32)

    phi_p, cnt_p = phi_rbf_fused_pallas(
        coords, scores, gamma, thresholds, tile_i=64, tile_j=64
    )
    phi_x, cnt_x = phi_rbf_fused_counts(
        coords, scores, gamma, thresholds, row_tile=64
    )
    np.testing.assert_allclose(
        np.asarray(phi_p), np.asarray(phi_x), rtol=5e-4, atol=5e-5
    )
    assert np.abs(np.asarray(cnt_p) - np.asarray(cnt_x)).max() <= n


def test_fused_terms_pallas_gram_branch_large_m(rng):
    """Multi-term twin of the large-m Gram-branch check."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_terms_fused_pallas
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    n, m = 160, 11
    coords = jnp.asarray(rng.normal(size=(n, m)) - 1.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gammas = [jnp.float32(0.2), jnp.float32(0.02)]
    signs = [1, 1]
    thresholds = jnp.asarray(np.linspace(5.0, 120.0, 3), jnp.float32)

    phi_p, cnt_p = phi_rbf_terms_fused_pallas(
        coords, scores, gammas, signs, thresholds, tile_i=32, tile_j=64
    )
    phi_x, cnt_x = phi_rbf_terms_fused_counts(
        coords, scores, gammas, signs, thresholds, row_tile=64
    )
    np.testing.assert_allclose(
        np.asarray(phi_p), np.asarray(phi_x), rtol=5e-4, atol=5e-5
    )
    assert np.abs(np.asarray(cnt_p) - np.asarray(cnt_x)).max() <= n


def _phi_counts_oracle(coords, scores, gamma, thresholds):
    """f64 dense oracle for the isotropic fused sweep (phi + counts)."""
    c = np.asarray(coords, np.float64)
    s = np.asarray(scores, np.float64)
    n = c.shape[0]
    sq = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    k = np.exp(-float(gamma) * sq)
    rowsum = k.sum(1)
    phi = (k @ s - 2.0 * float(gamma) * (k @ c - rowsum[:, None] * c)) / n
    cnt = np.stack([(sq <= t).sum() for t in np.asarray(thresholds, np.float64)])
    return phi, cnt


def test_fused_pallas_sym_matches_oracle(rng):
    """The upper-triangle (sym) sweep: branch-free triangle enumeration,
    double-direction accumulation, diagonal/count epilogue corrections —
    against the f64 dense oracle and the square sweep, at a ragged n
    (padding must not leak through the triangle mask) off-origin."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas

    n, m = 300, 2
    coords = jnp.asarray(rng.normal(size=(n, m)) + 50.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gamma = 0.6
    thresholds = jnp.asarray(np.linspace(0.0, 20.0, 5), jnp.float32)

    phi_ref, cnt_ref = _phi_counts_oracle(coords, scores, gamma, thresholds)
    phi_s, cnt_s = phi_rbf_fused_pallas(
        coords, scores, gamma, thresholds, tile_i=64, tile_j=128, sym=True
    )
    phi_q, cnt_q = phi_rbf_fused_pallas(
        coords, scores, gamma, thresholds, tile_i=64, tile_j=128, sym=False
    )
    rel = np.abs(np.asarray(phi_s) - phi_ref).max() / np.abs(phi_ref).max()
    assert rel < 2e-4, rel
    # diff-form sq is exact: counts match the oracle exactly at this scale
    np.testing.assert_array_equal(np.asarray(cnt_s), cnt_ref)
    np.testing.assert_array_equal(np.asarray(cnt_q), cnt_ref)


def test_fused_pallas_sym_gram_branch(rng):
    """Gram-branch (m > _DIFF_FORM_MAX_M) sym sweep: the in-kernel diagonal
    pin keeps self-pairs exact (counts at threshold 0 = n) and the
    K(i,i)=1 epilogue correction exact despite the bf16x3 sq residue."""
    from svgdcpp_tpu.ops.pallas_phi import _DIFF_FORM_MAX_M, phi_rbf_fused_pallas

    n, m = 200, 11
    assert m > _DIFF_FORM_MAX_M
    coords = jnp.asarray(rng.normal(size=(n, m)) + 2.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gamma = 0.3
    thresholds = jnp.asarray([0.0, 30.0, 90.0], jnp.float32)

    phi_ref, cnt_ref = _phi_counts_oracle(coords, scores, gamma, thresholds)
    phi_s, cnt_s = phi_rbf_fused_pallas(
        coords, scores, gamma, thresholds, tile_i=64, tile_j=64, sym=True
    )
    rel = np.abs(np.asarray(phi_s) - phi_ref).max() / np.abs(phi_ref).max()
    assert rel < 5e-4, rel
    assert np.asarray(cnt_s)[0] == n  # exact self-pairs at thr = 0
    # bf16x3 sq residue may flip near-boundary pairs only
    assert np.abs(np.asarray(cnt_s) - cnt_ref).max() <= n


def test_fused_terms_pallas_sym_matches_oracle(rng):
    """Multi-term triangle sweep incl. a negative term, vs f64 oracle and
    the square terms sweep."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_terms_fused_pallas

    n, m = 300, 3
    coords = jnp.asarray(rng.normal(size=(n, m)) - 4.0, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    gammas = [jnp.float32(0.5), jnp.float32(1.7)]
    signs = [1.0, -0.25]
    thresholds = jnp.asarray([0.0, 8.0, 40.0], jnp.float32)

    c = np.asarray(coords, np.float64)
    s = np.asarray(scores, np.float64)
    sq = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    kc = sum(si * np.exp(-float(g) * sq) for si, g in zip(signs, gammas))
    w = sum(si * float(g) * np.exp(-float(g) * sq)
            for si, g in zip(signs, gammas))
    phi_ref = (kc @ s - 2.0 * ((w @ c) - w.sum(1)[:, None] * c)) / n
    cnt_ref = np.stack(
        [(sq <= t).sum() for t in np.asarray(thresholds, np.float64)]
    )

    phi_s, cnt_s = phi_rbf_terms_fused_pallas(
        coords, scores, gammas, signs, thresholds, tile_i=64, tile_j=128,
        sym=True,
    )
    phi_q, cnt_q = phi_rbf_terms_fused_pallas(
        coords, scores, gammas, signs, thresholds, tile_i=64, tile_j=128,
        sym=False,
    )
    rel = np.abs(np.asarray(phi_s) - phi_ref).max() / np.abs(phi_ref).max()
    assert rel < 2e-4, rel
    np.testing.assert_array_equal(np.asarray(cnt_s), cnt_ref)
    np.testing.assert_allclose(
        np.asarray(phi_s), np.asarray(phi_q), rtol=5e-4, atol=5e-5
    )


def test_sym_auto_selection_bounds():
    """sym auto-selects only above _SYM_MIN_N and under the accumulator
    VMEM budget (full-width (2m+1, n_pad) scratch + output pair)."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _SYM_ACC_VMEM_BYTES,
        _SYM_MIN_N,
        _sym_eligible,
    )

    assert not _sym_eligible(_SYM_MIN_N - 1, 2, 2048)
    assert _sym_eligible(_SYM_MIN_N, 2, 2048)
    # large n x large m blows the accumulator budget -> square sweep
    big_n = _SYM_ACC_VMEM_BYTES // (2 * 5 * 4) + 2048
    assert not _sym_eligible(big_n, 2, 2048)


def test_sym_panel_matches_fused_counts(rng):
    """Panel-rotated triangle sweep (the past-the-VMEM-budget sym form) vs
    the XLA fused oracle: phi and counts must match across diff-form and
    Gram branches, including panel padding (n far from nb*W)."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _phi_rbf_fused_pallas_sympanel_impl,
        _sym_panel_plan,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    for n, m, ti, tj in [(1000, 2, 128, 128), (2500, 3, 128, 256),
                         (700, 6, 64, 128)]:
        x = jnp.asarray(rng.normal(size=(n, m)) * 2 + 1.5, jnp.float32)
        s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
        thr = jnp.asarray([1.0, 5.0, 25.0], jnp.float32)
        g = jnp.float32(0.6)
        nb, w, n_pad = _sym_panel_plan(n, m, tj)
        assert n_pad >= n and w % tj == 0
        ref_phi, ref_cnt = phi_rbf_fused_counts(x, s, g, thr)
        phi, cnt = _phi_rbf_fused_pallas_sympanel_impl(
            x, s, g, thr, 3, ti, tj, True)
        rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
            np.abs(np.asarray(ref_phi)).max()
        )
        assert rel < (5e-6 if m <= 4 else 5e-4), (n, m, rel)
        # f32 threshold ties can shift a handful of counts; the verified
        # selection absorbs far more (same tolerance as the sym suite)
        assert np.abs(np.asarray(cnt) - np.asarray(ref_cnt)).max() <= n


def test_sym_panel_terms_matches_fused_counts(rng):
    """Dual-window panel-rotated triangle sweep for composed kernels vs
    the XLA fused multi-term oracle (diff-form and Gram branches)."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _phi_rbf_terms_fused_pallas_sympanel_impl,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    for n, m, ti, tj in [(900, 2, 128, 128), (1500, 11, 64, 128)]:
        x = jnp.asarray(rng.normal(size=(n, m)) * 2 + 1.0, jnp.float32)
        s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
        thr = jnp.asarray([1.0, 9.0], jnp.float32)
        gs = (jnp.float32(0.6), jnp.float32(0.15))
        sg = (1.0, 1.0)
        ref_phi, ref_cnt = phi_rbf_terms_fused_counts(
            x, s, list(gs), list(sg), thr
        )
        phi, cnt = _phi_rbf_terms_fused_pallas_sympanel_impl(
            x, s, gs, sg, thr, 2, ti, tj, True)
        rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
            np.abs(np.asarray(ref_phi)).max()
        )
        assert rel < (5e-6 if m <= 4 else 5e-4), (n, m, rel)
        assert np.abs(np.asarray(cnt) - np.asarray(ref_cnt)).max() <= n


def test_sym_panel_terms_eligibility():
    """The dual-window Gram plan caps at _SYM_PANEL_MAX_BLOCKS and is
    Gram-branch-only: composed sweeps beyond either keep the square
    form (the m<=4 dual windows crash the TPU compiler, chip-bisected)."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _SYM_PANEL_MAX_BLOCKS,
        _SYM_PANEL_MAX_W_DUAL_GRAM,
        _sym_panel_plan,
        _sym_panel_terms_eligible,
    )

    assert _sym_panel_terms_eligible(100_000, 11, 2048)
    assert not _sym_panel_terms_eligible(500_000, 11, 2048)
    # round 5: the DIRECT single-window kernel admits the m<=4 diff
    # branch (chip-validated regions, _sym_panel_terms_direct_plan) —
    # previously these crashed the dual-window kernel and stayed square
    assert _sym_panel_terms_eligible(300_000, 2, 2048)
    # round-5 audit: the legacy dual-window kernel crashes the TPU
    # compiler past m = 24 (chip-bisected) — such shapes must fall back
    # to the square sweep instead of crashing at runtime
    assert not _sym_panel_terms_eligible(16384, 50, 2048, num_terms=2)
    assert not _sym_panel_terms_eligible(16384, 32, 2048, num_terms=2)
    assert _sym_panel_terms_eligible(16384, 24, 2048, num_terms=2)
    assert _sym_panel_terms_eligible(300_000, 2, 2048, num_terms=2)
    # outside every validated region: stays square
    assert not _sym_panel_terms_eligible(2_500_000, 2, 2048, num_terms=2)
    nb, w, n_pad = _sym_panel_plan(100_000, 11, 2048, dual=True)
    assert w <= _SYM_PANEL_MAX_W_DUAL_GRAM and nb <= _SYM_PANEL_MAX_BLOCKS


def test_sym_panel_single_eligibility():
    """Single-term panel gates: the HBM panel buffer must stay bounded
    (quadratic in n at the W cap) and the window budget must genuinely
    fit (very high m keeps the square sweep)."""
    from svgdcpp_tpu.ops.pallas_phi import _sym_panel_eligible

    assert _sym_panel_eligible(1_000_000, 2, 2048)
    assert _sym_panel_eligible(262_144, 2, 2048)
    assert not _sym_panel_eligible(8_000_000, 2, 2048)  # HBM buffer
    assert not _sym_panel_eligible(4096, 300, 2048)     # window > budget


def test_sym_pairs_plan_covers_triangle():
    """The distributed pair plan visits every upper-triangle super-tile
    exactly once; sentinel pairs are strictly-lower tiles (contributing
    nothing) and every chunk has identical length."""
    from svgdcpp_tpu.ops.pallas_phi import sym_pairs_plan

    for n, d in [(10240, 1), (10240, 8), (10000, 4), (2048, 8), (4096, 3)]:
        pi, pj, n_pad, per = sym_pairs_plan(n, d)
        assert len(pi) == d * per and n_pad >= n
        ti, tj = 512, 2048
        r = tj // ti
        nbi, nbj = n_pad // ti, n_pad // tj
        expected = {(i, j) for i in range(nbi) for j in range(i // r, nbj)}
        seen = list(zip(pi.tolist(), pj.tolist()))
        real = [p for p in seen if p in expected]
        sentinels = [p for p in seen if p not in expected]
        assert sorted(set(real)) == sorted(expected)
        assert len(real) == len(expected)  # each pair exactly once
        for bi, bj in sentinels:  # strictly lower: masked to nothing
            assert bi * ti >= (bj + 1) * tj - 1 and bi * ti >= tj


def test_sym_sharded_decomposition_matches_oracle(rng):
    """Chunked global triangle sweep (the fused_sym multi-chip mode):
    summing every chunk's raw accumulator + count lanes must reproduce
    the XLA fused oracle exactly (each unordered pair on one chunk)."""
    from svgdcpp_tpu.ops.pallas_phi import (
        phi_rbf_fused_pallas_sym_sharded,
        phi_rbf_fused_sym_finish,
        sym_pairs_plan,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    n, m, d = 1000, 2, 4
    x = jnp.asarray(rng.normal(size=(n, m)) * 2 + 1.0, jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray([1.0, 5.0], jnp.float32)
    g = jnp.float32(0.6)
    ti, tj = 64, 128
    pi, pj, n_pad, per = sym_pairs_plan(n, d, ti, tj)
    acc = None
    lanes = None
    for c in range(d):
        a, l = phi_rbf_fused_pallas_sym_sharded(
            x, s, g, thr, jnp.asarray(pi[c * per:(c + 1) * per]),
            jnp.asarray(pj[c * per:(c + 1) * per]), n_pad=n_pad,
            num_thresholds=2, tile_i=ti, tile_j=tj, interpret=True,
        )
        acc = a if acc is None else acc + a
        lanes = l if lanes is None else lanes + l
    counts = 2.0 * jnp.sum(lanes, axis=1) - jnp.float32(n)
    center = jnp.mean(x, axis=0)
    nl = n // 2
    phi = jnp.concatenate([
        phi_rbf_fused_sym_finish(
            acc[:, c * nl:(c + 1) * nl], s[c * nl:(c + 1) * nl],
            x[c * nl:(c + 1) * nl], center, g, n,
        )
        for c in range(2)
    ], axis=0)
    ref_phi, ref_cnt = phi_rbf_fused_counts(x, s, g, thr)
    rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
        np.abs(np.asarray(ref_phi)).max()
    )
    assert rel < 5e-6, rel
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_cnt))


def test_sym_sharded_plan_gating():
    """The shared distribution-plan gate: None outside the triangle
    regime or past the (sentinel-extended) accumulator budget; a valid
    plan covers n and chunks evenly."""
    from svgdcpp_tpu.ops.pallas_phi import sym_sharded_plan

    plan = sym_sharded_plan(10240, 2, 8)
    assert plan is not None
    pi, pj, n_pad, per = plan
    assert n_pad >= 10240 and len(pi) == 8 * per
    assert sym_sharded_plan(1024, 2, 8) is None       # below _SYM_MIN_N
    assert sym_sharded_plan(500_000, 2, 8) is None    # past the budget
    # high m: budget shrinks the admissible n accordingly
    assert sym_sharded_plan(100_000, 40, 8) is None


def test_terms_sym_sharded_decomposition_matches_oracle(rng):
    """Multi-term chunked global triangle sweep (the composed-kernel
    fused_sym mode): summed chunk accumulators + band epilogue must
    reproduce the XLA fused multi-term oracle."""
    from svgdcpp_tpu.ops.pallas_phi import (
        phi_rbf_terms_fused_pallas_sym_sharded,
        phi_rbf_terms_fused_sym_finish,
        sym_pairs_plan,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    n, m, d = 900, 2, 4
    x = jnp.asarray(rng.normal(size=(n, m)) * 2 + 1.0, jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray([1.0, 5.0], jnp.float32)
    gs = (jnp.float32(0.6), jnp.float32(0.15))
    sg = (1.0, 1.0)
    ti, tj = 64, 128
    pi, pj, n_pad, per = sym_pairs_plan(n, d, ti, tj)
    acck = accw = lanes = None
    for c in range(d):
        a, w, l = phi_rbf_terms_fused_pallas_sym_sharded(
            x, s, list(gs), sg, thr, jnp.asarray(pi[c * per:(c + 1) * per]),
            jnp.asarray(pj[c * per:(c + 1) * per]), n_pad=n_pad,
            num_thresholds=2, tile_i=ti, tile_j=tj, interpret=True,
        )
        acck = a if acck is None else acck + a
        accw = w if accw is None else accw + w
        lanes = l if lanes is None else lanes + l
    counts = 2.0 * jnp.sum(lanes, axis=1) - jnp.float32(n)
    center = jnp.mean(x, axis=0)
    nl = n // 3
    phi = jnp.concatenate([
        phi_rbf_terms_fused_sym_finish(
            acck[:, c * nl:(c + 1) * nl], accw[:, c * nl:(c + 1) * nl],
            s[c * nl:(c + 1) * nl], x[c * nl:(c + 1) * nl], center,
            jnp.stack(gs), sg, n,
        )
        for c in range(3)
    ], axis=0)
    ref_phi, ref_cnt = phi_rbf_terms_fused_counts(
        x, s, list(gs), list(sg), thr
    )
    rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
        np.abs(np.asarray(ref_phi)).max()
    )
    assert rel < 5e-6, rel
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_cnt))


def _xla_sym_sharded_stub(coords, scores, gamma, thresholds_sq, pair_i,
                          pair_j, *, n_pad, num_thresholds, tile_i=512,
                          tile_j=2048, interpret=None, vma_axis=None):
    """Pure-XLA mirror of phi_rbf_fused_pallas_sym_sharded's contract
    (masking, diagonal double-count, lane counts) — lets the D>1
    shard_map wiring (axis_index chunk slicing, accumulator psum, band
    epilogue) run on the simulated CPU mesh, where Mosaic cannot."""
    import jax

    n, m = coords.shape
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    c32 = coords.astype(jnp.float32) - center
    b = jnp.concatenate(
        [scores.astype(jnp.float32), c32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )
    c_pad = jnp.zeros((n_pad, m), jnp.float32).at[:n].set(c32)
    b_pad = jnp.zeros((n_pad, 2 * m + 1), jnp.float32).at[:n].set(b)
    thr = thresholds_sq.astype(jnp.float32)
    g32 = jnp.asarray(gamma, jnp.float32)

    def body(t, carry):
        acc, lanes = carry
        bi = pair_i[t].astype(jnp.int32)
        bj = pair_j[t].astype(jnp.int32)
        zero = jnp.int32(0)
        xi = jax.lax.dynamic_slice(c_pad, (bi * tile_i, zero), (tile_i, m))
        xj = jax.lax.dynamic_slice(c_pad, (bj * tile_j, zero), (tile_j, m))
        bt_i = jax.lax.dynamic_slice(
            b_pad, (bi * tile_i, zero), (tile_i, 2 * m + 1)
        )
        bt_j = jax.lax.dynamic_slice(
            b_pad, (bj * tile_j, zero), (tile_j, 2 * m + 1)
        )
        d = xi[:, None, :] - xj[None, :, :]
        sq = jnp.sum(d * d, axis=-1)
        gi = bi * tile_i + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, tile_j), 0
        )
        gj = bj * tile_j + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, tile_j), 1
        )
        valid = (gj >= gi) & (gi < n) & (gj < n)
        k = jnp.where(valid, jnp.exp(-g32 * sq), 0.0)
        r1 = bt_j.T @ k.T  # (bw, tile_i) -> rows bi
        r2 = bt_i.T @ k    # (bw, tile_j) -> cols bj
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(
                acc, (zero, bi * tile_i), (2 * m + 1, tile_i)
            ) + r1,
            (zero, bi * tile_i),
        )
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(
                acc, (zero, bj * tile_j), (2 * m + 1, tile_j)
            ) + r2,
            (zero, bj * tile_j),
        )
        hits = (sq[None] <= thr[:, None, None]) & valid[None]
        lanes = lanes + jnp.sum(hits.astype(jnp.float32), axis=1)
        return acc, lanes

    acc0 = jnp.zeros((2 * m + 1, n_pad), jnp.float32)
    lanes0 = jnp.zeros((num_thresholds, tile_j), jnp.float32)
    if vma_axis is not None:
        # shard_map VMA typing: the loop body makes the carries
        # device-varying (the pair chunk differs per device), so the
        # initial carries must be pcast to varying (CLAUDE.md rule).
        acc0 = jax.lax.pcast(acc0, (vma_axis,), to="varying")
        lanes0 = jax.lax.pcast(lanes0, (vma_axis,), to="varying")
    return jax.lax.fori_loop(0, pair_i.shape[0], body, (acc0, lanes0))


def _xla_terms_sym_sharded_stub(coords, scores, gammas, signs,
                                thresholds_sq, pair_i, pair_j, *, n_pad,
                                num_thresholds, tile_i=512, tile_j=2048,
                                interpret=None, vma_axis=None):
    """Multi-term twin of _xla_sym_sharded_stub mirroring
    phi_rbf_terms_fused_pallas_sym_sharded's contract (separate k_c and W
    accumulators) for D>1 CPU-mesh wiring tests."""
    import jax

    n, m = coords.shape
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    c32 = coords.astype(jnp.float32) - center
    s32 = scores.astype(jnp.float32)
    xs1 = jnp.concatenate(
        [c32, jnp.ones((n, 1), jnp.float32)], axis=1
    )
    c_pad = jnp.zeros((n_pad, m), jnp.float32).at[:n].set(c32)
    s_pad = jnp.zeros((n_pad, m), jnp.float32).at[:n].set(s32)
    xs1_pad = jnp.zeros((n_pad, m + 1), jnp.float32).at[:n].set(xs1)
    thr = thresholds_sq.astype(jnp.float32)
    g_arr = jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas])
    s_arr = jnp.asarray([float(s) for s in signs], jnp.float32)

    def body(t, carry):
        acck, accw, lanes = carry
        bi = pair_i[t].astype(jnp.int32)
        bj = pair_j[t].astype(jnp.int32)
        zero = jnp.int32(0)
        xi = jax.lax.dynamic_slice(c_pad, (bi * tile_i, zero), (tile_i, m))
        xj = jax.lax.dynamic_slice(c_pad, (bj * tile_j, zero), (tile_j, m))
        si = jax.lax.dynamic_slice(s_pad, (bi * tile_i, zero), (tile_i, m))
        sj = jax.lax.dynamic_slice(s_pad, (bj * tile_j, zero), (tile_j, m))
        x1i = jax.lax.dynamic_slice(
            xs1_pad, (bi * tile_i, zero), (tile_i, m + 1)
        )
        x1j = jax.lax.dynamic_slice(
            xs1_pad, (bj * tile_j, zero), (tile_j, m + 1)
        )
        d = xi[:, None, :] - xj[None, :, :]
        sq = jnp.sum(d * d, axis=-1)
        gi = bi * tile_i + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, tile_j), 0
        )
        gj = bj * tile_j + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, tile_j), 1
        )
        valid = (gj >= gi) & (gi < n) & (gj < n)
        k_terms = jnp.exp(-g_arr[:, None, None] * sq[None])
        k_c = jnp.where(valid, jnp.einsum("t,tij->ij", s_arr, k_terms), 0.0)
        w_t = jnp.where(
            valid, jnp.einsum("t,tij->ij", s_arr * g_arr, k_terms), 0.0
        )

        def upd(acc, tile, left_j, left_i):
            r1 = left_j.T @ tile.T
            r2 = left_i.T @ tile
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(
                    acc, (zero, bi * tile_i), (acc.shape[0], tile_i)
                ) + r1,
                (zero, bi * tile_i),
            )
            return jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(
                    acc, (zero, bj * tile_j), (acc.shape[0], tile_j)
                ) + r2,
                (zero, bj * tile_j),
            )

        acck = upd(acck, k_c, sj, si)
        accw = upd(accw, w_t, x1j, x1i)
        hits = (sq[None] <= thr[:, None, None]) & valid[None]
        lanes = lanes + jnp.sum(hits.astype(jnp.float32), axis=1)
        return acck, accw, lanes

    acck0 = jnp.zeros((m, n_pad), jnp.float32)
    accw0 = jnp.zeros((m + 1, n_pad), jnp.float32)
    lanes0 = jnp.zeros((num_thresholds, tile_j), jnp.float32)
    if vma_axis is not None:
        acck0 = jax.lax.pcast(acck0, (vma_axis,), to="varying")
        accw0 = jax.lax.pcast(accw0, (vma_axis,), to="varying")
        lanes0 = jax.lax.pcast(lanes0, (vma_axis,), to="varying")
    return jax.lax.fori_loop(
        0, pair_i.shape[0], body, (acck0, accw0, lanes0)
    )


def test_fused_sym_multidevice_wiring(rng, monkeypatch):
    """The D>1 fused_sym wiring — axis_index pair-chunk slicing, the
    accumulator/lane psums, and the per-band epilogue inside shard_map —
    runs on the 8-device CPU mesh with XLA stand-ins for the Mosaic
    kernels (single-term AND composed) and must match the cross-sweep
    engine."""
    import svgdcpp_tpu as sv
    import svgdcpp_tpu.ops.pallas_phi as pp
    import svgdcpp_tpu.parallel.sharded as shmod

    monkeypatch.setattr(
        pp, "phi_rbf_fused_pallas_sym_sharded", _xla_sym_sharded_stub
    )
    monkeypatch.setattr(
        pp, "phi_rbf_terms_fused_pallas_sym_sharded",
        _xla_terms_sym_sharded_stub,
    )
    monkeypatch.setattr(
        pp, "phi_rbf_terms_fused_pallas_sym_sharded_direct",
        _xla_terms_direct_sym_sharded_stub,
    )
    n, dim = 2048, 2
    x0 = (rng.normal(size=(n, dim)) * 2).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )

    def mk_kernel():
        return sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.MEDIAN, model
        ) + sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.CONSTANT,
            constant_scale=0.1 * np.eye(dim, dtype=np.float32),
        )

    for composed in (False, True):
        outs = {}
        for sym in (True, False):
            monkeypatch.setattr(
                shmod.ShardedSVGD, "_resolve_fused_sym",
                (lambda self: True) if sym else (lambda self: False),
            )
            sh = shmod.ShardedSVGD(
                model, sv.AdaGrad(dim, n, 0.1), n, dim,
                kernel=mk_kernel() if composed else None,
                config=shmod.ShardedSVGDConfig(fused_phi=True),
            )
            assert sh._fused_sym is sym
            st = sh.init_state(x0.copy())
            st = sh.run_state(st, 10)
            outs[sym] = np.asarray(st["coords"])
            assert np.isfinite(outs[sym]).all()
        # identical semantics, different summation order: f32-slack only
        d = np.abs(outs[True] - outs[False]).max()
        assert d < 5e-3, (composed, d)


def test_fused_sym_config_resolution():
    """fused_sym resolves off on CPU (no Mosaic under shard_map) and an
    explicit True raises with guidance; True without fused_phi is a
    config error."""
    import pytest

    import svgdcpp_tpu as sv
    from svgdcpp_tpu.parallel.sharded import ShardedSVGD, ShardedSVGDConfig

    n, dim = 4096, 2
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    sh = ShardedSVGD(model, sv.AdaGrad(dim, n, 0.1), n, dim,
                     config=ShardedSVGDConfig(fused_phi=True))
    assert sh._fused_sym is False  # CPU: fused_pallas resolves False
    with pytest.raises(ValueError, match="fused_sym"):
        ShardedSVGD(model, sv.AdaGrad(dim, n, 0.1), n, dim,
                    config=ShardedSVGDConfig(fused_phi=True, fused_sym=True))
    with pytest.raises(ValueError, match="fused_sym=True requires"):
        ShardedSVGDConfig(fused_sym=True)


def test_sym_panel_auto_route(rng, monkeypatch):
    """sym=None on a past-the-budget shape must take the panel impl (not
    silently fall back to square): route proven by instrumenting the
    impls, output proven against the XLA oracle."""
    import svgdcpp_tpu.ops.pallas_phi as pp
    from svgdcpp_tpu.ops.phi import (
        phi_rbf_fused_counts,
        phi_rbf_terms_fused_counts,
    )

    monkeypatch.setattr(pp, "_sym_eligible", lambda *a: False)
    hits = []
    real_panel = pp._phi_rbf_fused_pallas_sympanel_impl
    monkeypatch.setattr(
        pp, "_phi_rbf_fused_pallas_sympanel_impl",
        lambda *a, **k: (hits.append("single"), real_panel(*a, **k))[1],
    )
    real_tpanel = pp._phi_rbf_terms_fused_pallas_sympanel_impl
    monkeypatch.setattr(
        pp, "_phi_rbf_terms_fused_pallas_sympanel_impl",
        lambda *a, **k: (hits.append("terms"), real_tpanel(*a, **k))[1],
    )

    n = 2048
    thr = jnp.asarray([0.5, 2.0], jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    s2 = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    phi, _ = pp.phi_rbf_fused_pallas(
        x2, s2, jnp.float32(0.8), thr, tile_i=128, tile_j=256,
        interpret=True,
    )
    ref, _ = phi_rbf_fused_counts(x2, s2, jnp.float32(0.8), thr)
    assert hits == ["single"]
    assert np.abs(np.asarray(phi) - np.asarray(ref)).max() < 1e-4

    x11 = jnp.asarray(rng.normal(size=(n, 11)), jnp.float32)
    s11 = jnp.asarray(rng.normal(size=(n, 11)), jnp.float32)
    gs = (jnp.float32(0.3), jnp.float32(0.08))
    sg = (1.0, 1.0)
    phi_t, _ = pp.phi_rbf_terms_fused_pallas(
        x11, s11, gs, sg, thr, tile_i=128, tile_j=256, interpret=True,
    )
    ref_t, _ = phi_rbf_terms_fused_counts(x11, s11, list(gs), list(sg), thr)
    assert hits == ["single", "terms"]
    rel = np.abs(np.asarray(phi_t) - np.asarray(ref_t)).max() / (
        np.abs(np.asarray(ref_t)).max()
    )
    assert rel < 5e-4, rel


def test_sym_panel_auto_dispatch(rng):
    """phi_rbf_fused_pallas routes past-the-budget shapes to the panel
    form and within-budget shapes to the full-width sym form."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _SYM_ACC_VMEM_BYTES,
        _sym_eligible,
    )

    # n beyond the full-width accumulator budget at m=2
    big_n = _SYM_ACC_VMEM_BYTES // (2 * 5 * 4) + 4096
    assert not _sym_eligible(big_n, 2, 2048)
    # the panel plan covers it (no upper n limit)
    from svgdcpp_tpu.ops.pallas_phi import _sym_panel_plan

    nb, w, n_pad = _sym_panel_plan(big_n, 2, 2048)
    assert n_pad >= big_n
    assert 2 * (2 * 2 + 1) * 2 * w * 4 <= _SYM_ACC_VMEM_BYTES

    # functional check on a forced-panel small shape: sym='panel'
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    n, m = 600, 2
    x = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray([0.5, 2.0], jnp.float32)
    phi, cnt = phi_rbf_fused_pallas(
        x, s, jnp.float32(0.8), thr, tile_i=64, tile_j=64, sym="panel",
        interpret=True,
    )
    ref_phi, _ = phi_rbf_fused_counts(x, s, jnp.float32(0.8), thr)
    rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
        np.abs(np.asarray(ref_phi)).max()
    )
    assert rel < 5e-6, rel


def _aniso_p(m, rng, scale=0.3, ridge=0.4):
    a = rng.normal(size=(m, m)) * scale
    return jnp.asarray(a @ a.T + ridge * np.eye(m), jnp.float32)


def test_fused_aniso_terms_pallas_matches_oracle(rng):
    """Anisotropic composed-RBF triangle sweep vs an f64 dense oracle:
    isotropic terms share the Euclidean sq tile (which feeds the counts),
    each anisotropic term gets its own P-space quadratic-form tile and its
    own gradient-direction contraction."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_aniso_terms_fused_pallas

    n, m = 500, 3
    x = jnp.asarray(rng.normal(size=(n, m)) * 2 + 4.0, jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    iso_gammas = (jnp.float32(0.7),)
    iso_signs = (1.0,)
    p_aniso = _aniso_p(m, rng)
    thr = jnp.asarray([0.0, 4.0, 30.0], jnp.float32)

    phi_p, cnt_p = phi_rbf_aniso_terms_fused_pallas(
        x, s, iso_gammas, iso_signs, (p_aniso,), (0.8,), thr,
        tile_i=64, tile_j=128,
    )

    c = np.asarray(x, np.float64)
    sc = np.asarray(s, np.float64)
    d = c[:, None, :] - c[None, :, :]
    sq = (d**2).sum(-1)
    k_iso = np.exp(-0.7 * sq)
    P = np.asarray(p_aniso, np.float64)
    qf = np.einsum("ija,ab,ijb->ij", d, P, d)
    k_an = np.exp(-qf)
    kc = 1.0 * k_iso + 0.8 * k_an
    w_iso = 0.7 * k_iso
    phi_ref = (
        kc @ sc
        - 2.0 * ((w_iso @ c) - w_iso.sum(1)[:, None] * c)
        - ((0.8 * k_an @ c) - (0.8 * k_an).sum(1)[:, None] * c) @ (P + P.T)
    ) / n
    cnt_ref = np.stack([(sq <= t).sum() for t in np.asarray(thr, np.float64)])

    rel = np.abs(np.asarray(phi_p) - phi_ref).max() / np.abs(phi_ref).max()
    assert rel < 5e-4, rel
    assert np.abs(np.asarray(cnt_p) - cnt_ref).max() <= n


def test_fused_aniso_driver_first_step_matches_rbf_terms(rng):
    """One driver step: the aniso fused sweep's lag-1 seed is the exact
    median of x0, identical to rbf_terms' same-step median — the first
    steps must agree to numerical tolerance."""
    import svgdcpp_tpu as sv

    n, dim = 300, 2
    x0 = rng.normal(size=(n, dim)).astype(np.float32) * 2
    p_aniso = np.asarray(_aniso_p(dim, rng, scale=0.2, ridge=0.15))

    def run(impl, iters=1):
        model = sv.MultivariateNormal(
            np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
        )
        kernel = sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.MEDIAN, model
        ) + sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.CONSTANT, constant_scale=p_aniso
        )
        svgd = sv.SVGD(
            sv.SVGDOptions(
                dimension=dim, num_iterations=iters,
                coordinate_matrix=x0.copy(), kernel=kernel, model=model,
                optimizer=sv.AdaGrad(dim, n, 0.1), phi_impl=impl,
            )
        )
        svgd.initialize()
        return np.asarray(svgd.run())

    np.testing.assert_allclose(
        run("fused_aniso_terms_pallas"), run("rbf_terms"),
        rtol=2e-3, atol=2e-4,
    )
    # multi-step: lag-1 median semantics diverge slightly from same-step;
    # the runs must stay close over a few iterations
    out_f = run("fused_aniso_terms_pallas", iters=4)
    out_r = run("rbf_terms", iters=4)
    assert np.abs(out_f - out_r).max() < 0.05


def test_fused_aniso_validation_and_hot_swap(rng):
    """Explicit-request validation (PD terms, no division) and hot-swap
    re-validation (non-PD swap rejected; isotropy flip rebuilds)."""
    import pytest

    import svgdcpp_tpu as sv

    n, dim = 200, 2
    x0 = rng.normal(size=(n, dim)).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    p_aniso = np.asarray(_aniso_p(dim, rng, scale=0.2, ridge=0.15))
    kernel = sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model
    ) + sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT, constant_scale=p_aniso
    )
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=1, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model, optimizer=sv.AdaGrad(dim, n, 0.1),
            phi_impl="fused_aniso_terms_pallas",
        )
    )
    svgd.initialize()
    out1 = np.asarray(svgd.run())
    assert np.isfinite(out1).all()

    # non-PD constant swap -> rejected AND the running driver's parameters
    # stay untouched (guarded swap: validate before mutating)
    params = [np.asarray(p) for p in svgd.kernel.parameters]
    bad = list(svgd.kernel.parameters)
    bad[-1] = jnp.asarray(-np.eye(dim), jnp.float32)
    with pytest.raises(ValueError, match="positive definite"):
        svgd.update_kernel_parameters(tuple(bad))
    for before, after in zip(params, svgd.kernel.parameters):
        np.testing.assert_array_equal(before, np.asarray(after))
    assert np.isfinite(np.asarray(svgd.run())).all()

    # isotropy flip (aniso -> iso constant): accepted, rebuilds, still runs
    good = list(svgd.kernel.parameters)
    good[-1] = jnp.asarray(0.2 * np.eye(dim), jnp.float32)
    svgd.update_kernel_parameters(tuple(good))
    out2 = np.asarray(svgd.run())
    assert np.isfinite(out2).all()

    # division composition -> validation rejects
    kernel_div = sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model
    ) / sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT,
        constant_scale=0.05 * np.eye(dim, dtype=np.float32),
    )
    svgd_div = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=1, coordinate_matrix=x0.copy(),
            kernel=kernel_div, model=model,
            optimizer=sv.AdaGrad(dim, n, 0.1),
            phi_impl="fused_aniso_terms_pallas",
        )
    )
    with pytest.raises(ValueError, match="positive definite|division"):
        svgd_div.initialize()


def test_split_iso_aniso_terms(rng):
    """Static term routing: terms touching an anisotropic constant slot
    classify aniso; pure-median and isotropic-constant terms stay iso."""
    import svgdcpp_tpu as sv
    from svgdcpp_tpu.kernels.algebra import (
        flatten_rbf_terms,
        fused_aniso_terms_supported,
        split_iso_aniso_terms,
    )

    dim = 2
    x0 = rng.normal(size=(16, dim)).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    p_aniso = np.asarray(_aniso_p(dim, rng, scale=0.2, ridge=0.15))
    kernel = sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model
    ) + sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT, constant_scale=p_aniso
    ) + sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT,
        constant_scale=0.3 * np.eye(dim, dtype=np.float32),
    )
    terms = flatten_rbf_terms(kernel)
    slots = kernel.adaptive_slots()
    iso_idx, aniso_idx = split_iso_aniso_terms(
        terms, slots, kernel.parameters
    )
    assert len(iso_idx) == 2 and len(aniso_idx) == 1
    assert fused_aniso_terms_supported(terms, slots, kernel.parameters)


def test_fused_aniso_gate_is_static_in_adaptive_gamma(rng):
    """The PD gate must hold for EVERY adaptive gamma > 0, not just the
    current value: a product term median * const with an INDEFINITE
    constant part is PD only while gamma stays large — as the per-step
    median drifts, gamma*I + P goes indefinite mid-run. Such compositions
    must be rejected statically; a PSD constant part passes."""
    import svgdcpp_tpu as sv
    from svgdcpp_tpu.kernels.algebra import (
        flatten_rbf_terms,
        fused_aniso_terms_supported,
    )

    dim = 2
    x0 = rng.normal(size=(16, dim)).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )

    def prod_kernel(const_scale):
        return sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.MEDIAN, model
        ) * sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.CONSTANT,
            constant_scale=np.asarray(const_scale, np.float32),
        )

    # indefinite constant part: PD at large gamma, indefinite at small —
    # statically unsupported regardless of the current median value
    k_bad = prod_kernel(np.diag([1.0, -0.3]))
    assert not fused_aniso_terms_supported(
        flatten_rbf_terms(k_bad), k_bad.adaptive_slots(), k_bad.parameters
    )

    # PSD (even singular) constant part: gamma*I + P is PD for any
    # gamma > 0 — supported
    k_ok = prod_kernel(np.diag([1.0, 0.0]))
    assert fused_aniso_terms_supported(
        flatten_rbf_terms(k_ok), k_ok.adaptive_slots(), k_ok.parameters
    )

    # a PD constant-only term needs no adaptive slot; a singular
    # constant-only term is rejected (no gamma*I to lift it)
    k_mix = sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model
    ) + sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT,
        constant_scale=np.asarray(np.diag([0.5, 0.0]), np.float32),
    )
    assert not fused_aniso_terms_supported(
        flatten_rbf_terms(k_mix), k_mix.adaptive_slots(), k_mix.parameters
    )


def test_resolve_sym_tile_fallback():
    """Round-5 ADVICE fix: sym auto-selection must fall back to the cross
    sweep (not raise) for explicit tiles with tile_j % tile_i != 0, and
    fused_sym=True is advisory (widest eligible triangle form)."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _resolve_sym,
        _sym_panel_eligible,
    )

    # auto at an eligible n but triangle-incompatible tiles: cross sweep
    assert _resolve_sym(None, 4096, 2, 512, 1280, _sym_panel_eligible) is False
    # compatible tiles keep the triangle
    assert _resolve_sym(None, 4096, 2, 512, 2048, _sym_panel_eligible) is True
    # explicit False / 'panel' pass through untouched
    assert _resolve_sym(False, 4096, 2, 512, 2048, _sym_panel_eligible) is False
    assert (
        _resolve_sym("panel", 4096, 2, 512, 2048, _sym_panel_eligible)
        == "panel"
    )
    # forced True below the crossover: full-width still fits
    assert _resolve_sym(True, 1024, 2, 512, 2048, _sym_panel_eligible) is True
    # forced True past the full-width budget: panel form
    assert (
        _resolve_sym(True, 1_000_000, 2, 512, 2048, _sym_panel_eligible)
        == "panel"
    )
    # forced True with incompatible tiles: still the cross sweep
    assert _resolve_sym(True, 4096, 2, 512, 1280, _sym_panel_eligible) is False


def test_fused_pallas_auto_sym_bad_tiles_runs_cross(rng):
    """Integration for the same fix: n past the sym crossover with
    incompatible explicit tiles runs (cross sweep) and matches the
    default-tile result."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas

    n, m = 2048, 2
    coords = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thresholds = jnp.asarray(np.linspace(0.0, 20.0, 3), jnp.float32)
    phi_bad, counts_bad = phi_rbf_fused_pallas(
        coords, scores, 0.6, thresholds, tile_i=512, tile_j=1280
    )
    phi_ref, counts_ref = phi_rbf_fused_pallas(
        coords, scores, 0.6, thresholds, tile_i=512, tile_j=2048, sym=False
    )
    np.testing.assert_allclose(
        np.asarray(phi_bad), np.asarray(phi_ref), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(counts_bad), np.asarray(counts_ref)
    )


def test_sym_panel_sharded_plan_gating():
    """Round-5 chunked panel plan: None below the triangle regime or on
    incompatible tiles; a valid plan covers the panel list with sentinel
    (bi > bj) padding to equal chunks."""
    from svgdcpp_tpu.ops.pallas_phi import sym_panel_sharded_plan

    plan = sym_panel_sharded_plan(262_144, 2, 8)
    assert plan is not None
    pi, pj, nb, w, n_pad, per = plan
    assert nb * w == n_pad and n_pad >= 262_144
    assert len(pi) == 8 * per
    n_real_pairs = nb * (nb + 1) // 2
    assert (pi[:n_real_pairs] <= pj[:n_real_pairs]).all()
    assert (pi[n_real_pairs:] > pj[n_real_pairs:]).all()  # sentinels
    assert sym_panel_sharded_plan(1024, 2, 8) is None  # below _SYM_MIN_N
    assert sym_panel_sharded_plan(262_144, 2, 8, 512, 1280) is None


def test_panel_sharded_decomposition_matches_oracle(rng):
    """Chunked panel sweeps (the round-5 distributed panel schedule)
    hand-run per chunk and host-summed must reproduce the XLA fused
    oracle — including sentinel panels contributing exactly zero."""
    from svgdcpp_tpu.ops.pallas_phi import (
        phi_rbf_fused_pallas_sympanel_sharded,
        phi_rbf_fused_sym_finish,
        sym_panel_sharded_plan,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    n, m, d = 2100, 2, 8  # >= _SYM_MIN_N, ragged vs the block width
    x = jnp.asarray(rng.normal(size=(n, m)) * 2 + 1.0, jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray([1.0, 5.0], jnp.float32)
    g = jnp.float32(0.7)
    ti, tj = 64, 128
    plan = sym_panel_sharded_plan(n, m, d, ti, tj)
    assert plan is not None
    pi, pj, nb, w, n_pad, per = plan
    assert per * d > nb * (nb + 1) // 2  # sentinels present

    acc = lanes = None
    for c in range(d):
        a, l = phi_rbf_fused_pallas_sympanel_sharded(
            x, s, g, thr, jnp.asarray(pi[c * per:(c + 1) * per]),
            jnp.asarray(pj[c * per:(c + 1) * per]), nb=nb, w=w,
            num_thresholds=2, tile_i=ti, tile_j=tj, interpret=True,
        )
        acc = a if acc is None else acc + a
        lanes = l if lanes is None else lanes + l
    counts = 2.0 * jnp.sum(lanes, axis=1) - jnp.float32(n)
    center = jnp.mean(x, axis=0)
    nl = n // 4
    phi = jnp.concatenate([
        phi_rbf_fused_sym_finish(
            acc[:, c * nl:(c + 1) * nl], s[c * nl:(c + 1) * nl],
            x[c * nl:(c + 1) * nl], center, g, n,
        )
        for c in range(4)
    ], axis=0)
    ref_phi, ref_cnt = phi_rbf_fused_counts(x, s, g, thr)
    rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
        np.abs(np.asarray(ref_phi)).max()
    )
    assert rel < 5e-6, rel
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_cnt))


def _xla_panel_sharded_stub(coords, scores, gamma, thresholds_sq, pair_i,
                            pair_j, *, nb, w, num_thresholds, tile_i=512,
                            tile_j=2048, interpret=None, vma_axis=None):
    """Pure-XLA mirror of phi_rbf_fused_pallas_sympanel_sharded's
    contract (per-panel block masking, sentinel zeroing, block scatter)
    for D>1 CPU-mesh wiring tests."""
    import jax

    n, m = coords.shape
    n_pad = nb * w
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    c32 = coords.astype(jnp.float32) - center
    b = jnp.concatenate(
        [scores.astype(jnp.float32), c32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )
    c_pad = jnp.zeros((n_pad, m), jnp.float32).at[:n].set(c32)
    b_pad = jnp.zeros((n_pad, 2 * m + 1), jnp.float32).at[:n].set(b)
    thr = thresholds_sq.astype(jnp.float32)
    g32 = jnp.asarray(gamma, jnp.float32)

    def body(t, carry):
        acc, lanes = carry
        bi = pair_i[t].astype(jnp.int32)
        bj = pair_j[t].astype(jnp.int32)
        zero = jnp.int32(0)
        xi = jax.lax.dynamic_slice(c_pad, (bi * w, zero), (w, m))
        xj = jax.lax.dynamic_slice(c_pad, (bj * w, zero), (w, m))
        bt_i = jax.lax.dynamic_slice(b_pad, (bi * w, zero), (w, 2 * m + 1))
        bt_j = jax.lax.dynamic_slice(b_pad, (bj * w, zero), (w, 2 * m + 1))
        dd = xi[:, None, :] - xj[None, :, :]
        sq = jnp.sum(dd * dd, axis=-1)
        gi = bi * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        gj = bj * w + jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        valid = (
            (gi < n) & (gj < n) & (bi <= bj)
            & ((bi != bj) | (gj >= gi))
        )
        k = jnp.where(valid, jnp.exp(-g32 * sq), 0.0)
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (zero, bi * w), (2 * m + 1, w))
            + bt_j.T @ k.T,
            (zero, bi * w),
        )
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (zero, bj * w), (2 * m + 1, w))
            + bt_i.T @ k,
            (zero, bj * w),
        )
        hits = (sq[None] <= thr[:, None, None]) & valid[None]
        lanes = lanes.at[:, 0].add(
            jnp.sum(hits.astype(jnp.float32), axis=(1, 2))
        )
        return acc, lanes

    acc0 = jnp.zeros((2 * m + 1, n_pad), jnp.float32)
    lanes0 = jnp.zeros((num_thresholds, tile_j), jnp.float32)
    if vma_axis is not None:
        acc0 = jax.lax.pcast(acc0, (vma_axis,), to="varying")
        lanes0 = jax.lax.pcast(lanes0, (vma_axis,), to="varying")
    return jax.lax.fori_loop(0, pair_i.shape[0], body, (acc0, lanes0))


def test_panel_sharded_multidevice_wiring(rng, monkeypatch):
    """The D>1 panel-sharded wiring — axis_index panel-chunk slicing,
    the accumulator/lane psums, and the per-band epilogue inside
    shard_map — runs on the 8-device CPU mesh with an XLA stand-in for
    the Mosaic panel kernel and must match the cross-sweep engine."""
    import svgdcpp_tpu as sv
    import svgdcpp_tpu.ops.pallas_phi as pp
    import svgdcpp_tpu.parallel.sharded as shmod

    monkeypatch.setattr(
        pp, "phi_rbf_fused_pallas_sympanel_sharded", _xla_panel_sharded_stub
    )
    n, dim = 2048, 2
    x0 = (rng.normal(size=(n, dim)) * 2).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )

    outs = {}
    for mode in ("panel", False):
        monkeypatch.setattr(
            shmod.ShardedSVGD, "_resolve_fused_sym",
            (lambda self, _m=mode: _m),
        )
        sh = shmod.ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), n, dim,
            config=shmod.ShardedSVGDConfig(fused_phi=True),
        )
        assert sh._fused_sym == mode
        st = sh.init_state(x0.copy())
        st = sh.run_state(st, 10)
        outs[mode] = np.asarray(st["coords"])
        assert np.isfinite(outs[mode]).all()
    d = np.abs(outs["panel"] - outs[False]).max()
    assert d < 5e-3, d


def test_terms_panel_direct_plan_gating():
    """Round-5 direct panel terms plan: chip-validated regions only."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _sym_panel_terms_direct_plan,
        _sym_panel_terms_eligible,
    )

    # m=2 T=2 diff branch: W=16384, up to nb=64 (n ~ 1M)
    plan = _sym_panel_terms_direct_plan(262144, 2, 2)
    assert plan is not None and plan[1] <= 16384
    assert _sym_panel_terms_direct_plan(1_000_000, 2, 2) is not None
    assert _sym_panel_terms_direct_plan(2_000_000, 2, 2) is None  # nb cap
    # m=4: W cap halves
    plan4 = _sym_panel_terms_direct_plan(262144, 4, 2)
    assert plan4 is not None and plan4[1] <= 8192
    # m=11 T=2 gram: W=4096
    plan11 = _sym_panel_terms_direct_plan(131072, 11, 2)
    assert plan11 is not None and plan11[1] <= 4096
    # outside the validated regions: T=3 at m=4 (48-row diff window),
    # T=3 at m=11, non-default tiles
    assert _sym_panel_terms_direct_plan(262144, 4, 3) is None
    assert _sym_panel_terms_direct_plan(131072, 11, 3) is None
    assert _sym_panel_terms_direct_plan(262144, 2, 2, 256, 1024) is None
    # the eligibility predicate now admits the m<=4 composed family
    # (the round-4 gap) through the direct plan
    assert _sym_panel_terms_eligible(262144, 2, 2048, 2)


@pytest.mark.parametrize("m,gammas", [(2, (0.7, 0.2)), (11, (0.3, 0.08))])
def test_terms_panel_direct_matches_oracle(rng, m, gammas):
    """Direct panel terms kernel (interpret mode, forced panel_blocks)
    matches the XLA fused multi-term oracle on both sq branches."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _phi_rbf_terms_fused_pallas_sympanel_direct_impl,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    n = 900
    x = jnp.asarray(rng.normal(size=(n, m)) * 2 + 1.0, jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray([1.0, 5.0], jnp.float32)
    gs = tuple(jnp.float32(g) for g in gammas)
    sg = (1.0, 1.0)
    phi, counts = _phi_rbf_terms_fused_pallas_sympanel_direct_impl(
        x, s, gs, sg, thr, 2, 64, 128, True, panel_blocks=4
    )
    ref_phi, ref_cnt = phi_rbf_terms_fused_counts(x, s, list(gs), sg, thr)
    rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
        np.abs(np.asarray(ref_phi)).max()
    )
    assert rel < (5e-6 if m <= 4 else 5e-4), rel
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_cnt))


def _xla_terms_direct_sym_sharded_stub(coords, scores, gammas, signs,
                                       thresholds_sq, pair_i, pair_j, *,
                                       n_pad, num_thresholds, tile_i=512,
                                       tile_j=2048, interpret=None,
                                       vma_axis=None):
    """Pure-XLA mirror of phi_rbf_terms_fused_pallas_sym_sharded_direct's
    contract (packed per-term bands) for D>1 CPU-mesh wiring tests."""
    import jax

    from svgdcpp_tpu.ops.pallas_phi import _ceil_mult

    n, m = coords.shape
    bw = 2 * m + 1
    band = _ceil_mult(bw, 8)
    num_terms = len(signs)
    center = jnp.mean(coords.astype(jnp.float32), axis=0)
    c32 = coords.astype(jnp.float32) - center
    b = jnp.concatenate(
        [scores.astype(jnp.float32), c32, jnp.ones((n, 1), jnp.float32)],
        axis=1,
    )
    c_pad = jnp.zeros((n_pad, m), jnp.float32).at[:n].set(c32)
    b_pad = jnp.zeros((n_pad, bw), jnp.float32).at[:n].set(b)
    thr = thresholds_sq.astype(jnp.float32)
    g_arr = jnp.stack([jnp.asarray(g, jnp.float32) for g in gammas])

    def body(t, carry):
        acc, lanes = carry
        bi = pair_i[t].astype(jnp.int32)
        bj = pair_j[t].astype(jnp.int32)
        zero = jnp.int32(0)
        xi = jax.lax.dynamic_slice(c_pad, (bi * tile_i, zero), (tile_i, m))
        xj = jax.lax.dynamic_slice(c_pad, (bj * tile_j, zero), (tile_j, m))
        bt_i = jax.lax.dynamic_slice(
            b_pad, (bi * tile_i, zero), (tile_i, bw)
        )
        bt_j = jax.lax.dynamic_slice(
            b_pad, (bj * tile_j, zero), (tile_j, bw)
        )
        d = xi[:, None, :] - xj[None, :, :]
        sq = jnp.sum(d * d, axis=-1)
        gi = bi * tile_i + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, tile_j), 0
        )
        gj = bj * tile_j + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, tile_j), 1
        )
        valid = (gj >= gi) & (gi < n) & (gj < n)
        for t_i in range(num_terms):
            k_t = jnp.where(valid, jnp.exp(-g_arr[t_i] * sq), 0.0)
            r1 = bt_j.T @ k_t.T  # (bw, tile_i) -> rows bi
            r2 = bt_i.T @ k_t    # (bw, tile_j) -> cols bj
            row0 = jnp.int32(t_i * band)
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(
                    acc, (row0, bi * tile_i), (bw, tile_i)
                ) + r1,
                (row0, bi * tile_i),
            )
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(
                    acc, (row0, bj * tile_j), (bw, tile_j)
                ) + r2,
                (row0, bj * tile_j),
            )
        hits = (sq[None] <= thr[:, None, None]) & valid[None]
        lanes = lanes + jnp.sum(hits.astype(jnp.float32), axis=1)
        return acc, lanes

    acc0 = jnp.zeros((num_terms * band, n_pad), jnp.float32)
    lanes0 = jnp.zeros((num_thresholds, tile_j), jnp.float32)
    if vma_axis is not None:
        acc0 = jax.lax.pcast(acc0, (vma_axis,), to="varying")
        lanes0 = jax.lax.pcast(lanes0, (vma_axis,), to="varying")
    return jax.lax.fori_loop(0, pair_i.shape[0], body, (acc0, lanes0))


def test_terms_direct_sym_sharded_decomposition_matches_oracle(rng):
    """Round-5 DIRECT sharded multi-term sweep: summed chunk accumulators
    + the packed-band epilogue must reproduce the XLA fused multi-term
    oracle."""
    from svgdcpp_tpu.ops.pallas_phi import (
        phi_rbf_terms_fused_pallas_sym_sharded_direct,
        phi_rbf_terms_fused_sym_direct_finish,
        sym_pairs_plan,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    n, m, d = 900, 2, 4
    x = jnp.asarray(rng.normal(size=(n, m)) * 2 + 1.0, jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray([1.0, 5.0], jnp.float32)
    gs = (jnp.float32(0.6), jnp.float32(0.15))
    sg = (1.0, 1.0)
    ti, tj = 64, 128
    pi, pj, n_pad, per = sym_pairs_plan(n, d, ti, tj)
    acc = lanes = None
    for c in range(d):
        a, l = phi_rbf_terms_fused_pallas_sym_sharded_direct(
            x, s, list(gs), sg, thr, jnp.asarray(pi[c * per:(c + 1) * per]),
            jnp.asarray(pj[c * per:(c + 1) * per]), n_pad=n_pad,
            num_thresholds=2, tile_i=ti, tile_j=tj, interpret=True,
        )
        acc = a if acc is None else acc + a
        lanes = l if lanes is None else lanes + l
    counts = 2.0 * jnp.sum(lanes, axis=1) - jnp.float32(n)
    center = jnp.mean(x, axis=0)
    nl = n // 3
    phi = jnp.concatenate([
        phi_rbf_terms_fused_sym_direct_finish(
            acc[:, c * nl:(c + 1) * nl], s[c * nl:(c + 1) * nl],
            x[c * nl:(c + 1) * nl], center, jnp.stack(gs), sg, n,
        )
        for c in range(3)
    ], axis=0)
    ref_phi, ref_cnt = phi_rbf_terms_fused_counts(
        x, s, list(gs), list(sg), thr
    )
    rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
        np.abs(np.asarray(ref_phi)).max()
    )
    assert rel < 5e-6, rel
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_cnt))


@pytest.mark.parametrize("seed", range(6))
def test_terms_routes_fuzz_vs_oracle(seed):
    """Property test over random composed configs: whatever impl the
    round-5 routing picks (direct/legacy cross, direct/legacy sym) must
    match the XLA fused oracle within the bf16x3 class and keep counts
    exact (interpret mode is f32-exact)."""
    from svgdcpp_tpu.ops.pallas_phi import phi_rbf_terms_fused_pallas
    from svgdcpp_tpu.ops.phi import phi_rbf_terms_fused_counts

    r = np.random.default_rng(1234 + seed)
    n = int(r.integers(60, 700))
    m = int(r.choice([1, 2, 3, 4, 7, 11]))
    num_terms = int(r.integers(1, 4))
    gammas = tuple(jnp.float32(g) for g in r.uniform(0.05, 1.2, num_terms))
    signs = tuple(float(s) for s in np.ones(num_terms))
    x = jnp.asarray(r.normal(size=(n, m)) * r.uniform(0.5, 3.0)
                    + r.normal(size=m), jnp.float32)
    s = jnp.asarray(r.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray(np.sort(r.uniform(0.1, 30.0, 3)), jnp.float32)
    ti = int(r.choice([32, 64]))
    tj = ti * int(r.choice([1, 2, 4]))
    sym = r.choice([None, False, True])
    sym = None if sym is None else bool(sym)

    phi, counts = phi_rbf_terms_fused_pallas(
        x, s, gammas, signs, thr, tile_i=ti, tile_j=tj, interpret=True,
        sym=sym,
    )
    ref_phi, ref_cnt = phi_rbf_terms_fused_counts(
        x, s, list(gammas), list(signs), thr
    )
    rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / (
        np.abs(np.asarray(ref_phi)).max() + 1e-30
    )
    # m <= 4 rides the f32-exact diff form; m > 4 the bf16x3 Gram split
    # (documented class ~1e-3..1e-2 max even in interpret mode — the
    # split itself rounds), and its sq residue can flip count ties
    tol = 1e-4 if m <= 4 else 2e-2
    assert rel < tol, (n, m, num_terms, ti, tj, sym, rel)
    cerr = np.abs(np.asarray(counts) - np.asarray(ref_cnt)).max()
    assert cerr <= (0 if m <= 4 else n), (n, m, num_terms, ti, tj, sym)


@pytest.mark.parametrize("seed", range(4))
def test_single_term_routes_fuzz_vs_oracle(seed):
    """Same property for the single-term family across sym routings
    (incl. forced panel via panel_blocks on the panel impl)."""
    from svgdcpp_tpu.ops.pallas_phi import (
        _phi_rbf_fused_pallas_sympanel_impl,
        phi_rbf_fused_pallas,
    )
    from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

    r = np.random.default_rng(77 + seed)
    n = int(r.integers(80, 900))
    m = int(r.choice([1, 2, 4, 9]))
    g = jnp.float32(r.uniform(0.1, 1.5))
    x = jnp.asarray(r.normal(size=(n, m)) * 2 + 1.0, jnp.float32)
    s = jnp.asarray(r.normal(size=(n, m)), jnp.float32)
    thr = jnp.asarray(np.sort(r.uniform(0.1, 30.0, 3)), jnp.float32)
    ref_phi, ref_cnt = phi_rbf_fused_counts(x, s, g, thr)
    scale = np.abs(np.asarray(ref_phi)).max() + 1e-30

    for mode in ("cross", "sym", "panel"):
        ti, tj = 32, 64
        if mode == "panel":
            phi, counts = _phi_rbf_fused_pallas_sympanel_impl(
                x, s, g, thr, 3, ti, tj, True, panel_blocks=4
            )
        else:
            phi, counts = phi_rbf_fused_pallas(
                x, s, g, thr, tile_i=ti, tile_j=tj, interpret=True,
                sym=(mode == "sym"),
            )
        rel = np.abs(np.asarray(phi) - np.asarray(ref_phi)).max() / scale
        tol = 1e-4 if m <= 4 else 2e-2
        assert rel < tol, (n, m, mode, rel)
        cerr = np.abs(np.asarray(counts) - np.asarray(ref_cnt)).max()
        assert cerr <= (0 if m <= 4 else n), (n, m, mode)
