"""Multi-chip sharding tests on the 8-device simulated CPU mesh.

Covers what the reference never had to test (SURVEY.md §4): cross-shard
kernel blocks in phi, the distributed (psum-histogram) median, and full
sharded-run equivalence with the single-device driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import svgdcpp_tpu as sv
from svgdcpp_tpu.ops.median import pairwise_distance_median_exact
from svgdcpp_tpu.ops.phi import phi_rbf
from svgdcpp_tpu.parallel import (
    ShardedSVGD,
    ShardedSVGDConfig,
    make_particle_mesh,
    sharded_pairwise_median,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 simulated devices"
    return make_particle_mesh()


def test_sharded_median_matches_exact(mesh, rng):
    coords = jnp.asarray(rng.normal(size=(64, 3)))
    axis = mesh.axis_names[0]

    def f(local):
        srcs = jax.lax.all_gather(local, axis, tiled=True)
        return sharded_pairwise_median(
            local, srcs, axis, bins=512, passes=3, row_tile=16
        )

    out = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P(axis, None), out_specs=P())
    )(coords)
    exact = float(pairwise_distance_median_exact(coords))
    assert abs(float(out) - exact) <= 1e-6 * exact


def test_sharded_phi_matches_dense(mesh, rng):
    from svgdcpp_tpu.ops.phi import phi_rbf_cross

    n, m = 40, 3
    coords = jnp.asarray(rng.normal(size=(n, m)))
    scores = jnp.asarray(rng.normal(size=(n, m)))
    p_mat = jnp.asarray(np.eye(m) * 0.7 + 0.1)
    axis = mesh.axis_names[0]

    def f(c_loc, s_loc):
        srcs = jax.lax.all_gather(c_loc, axis, tiled=True)
        s_all = jax.lax.all_gather(s_loc, axis, tiled=True)
        return phi_rbf_cross(c_loc, srcs, s_all, p_mat, row_tile=4, axis_name=axis)

    sharded = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(axis, None),
        )
    )(coords, scores)
    dense = phi_rbf(coords, scores, p_mat)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense), rtol=1e-10)


@pytest.mark.parametrize("method", ["median", "hessian"])
def test_sharded_run_matches_single_device(mesh, rng, method):
    """Full sharded training run == single-device driver trajectory."""
    n, dim, iters = 32, 2, 10
    mean = np.array([0.5, -1.0])
    cov = np.array([[1.0, 0.2], [0.2, 0.8]])
    x0 = rng.normal(size=(n, dim)) * 2

    scale_method = (
        sv.ScaleMethod.MEDIAN if method == "median" else sv.ScaleMethod.HESSIAN
    )

    # Single-device reference trajectory
    model = sv.MultivariateNormal(mean, cov)
    kernel = sv.GaussianRBFKernel(x0, scale_method, model, median_method="exact")
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim,
            num_iterations=iters,
            coordinate_matrix=x0.copy(),
            kernel=kernel,
            model=model,
            optimizer=sv.AdaGrad(dim, n, 0.1),
        )
    )
    svgd.initialize()
    single = np.asarray(svgd.run())

    # Sharded trajectory
    model2 = sv.MultivariateNormal(mean, cov)
    sharded = ShardedSVGD(
        model2,
        sv.AdaGrad(dim, n, 0.1),
        num_particles=n,
        dimension=dim,
        mesh=mesh,
        config=ShardedSVGDConfig(
            scale_method=scale_method,
            median_bins=1024,
            median_passes=4,
            row_tile=4,
            warm_start=False,  # pin the cold selection for exact comparison
        ),
    )
    out = np.asarray(sharded.run(x0.copy(), iters))

    # Median path uses histogram selection (approximate to ~1e-9 of range);
    # after 10 steps trajectories agree to ~1e-5.
    tol = 1e-5 if method == "median" else 1e-9
    np.testing.assert_allclose(out, single, rtol=tol, atol=tol)


def test_sharded_bounds(mesh, rng):
    n, dim = 16, 2
    x0 = rng.normal(size=(n, dim)) * 5
    model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    sharded = ShardedSVGD(
        model,
        sv.AdaGrad(dim, n, 0.1),
        num_particles=n,
        dimension=dim,
        mesh=mesh,
        config=ShardedSVGDConfig(
            scale_method=sv.ScaleMethod.CONSTANT,
            constant_scale=np.eye(dim),
            lower_bound=np.array([-1.0, -1.0]),
            upper_bound=np.array([1.0, 1.0]),
        ),
    )
    out = np.asarray(sharded.run(x0, 5))
    assert np.abs(out).max() <= 1.0 + 1e-12


def test_uneven_shard_raises(mesh):
    model = sv.MultivariateNormal(np.zeros(2), np.eye(2))
    with pytest.raises(sv.DimensionMismatchError):
        ShardedSVGD(model, sv.AdaGrad(2, 30, 0.1), num_particles=30, dimension=2,
                    mesh=mesh)


def test_gspmd_mesh_option(mesh, rng):
    """SVGDOptions.mesh: GSPMD auto-sharding path produces the same result."""
    n, dim, iters = 24, 2, 5
    x0 = rng.normal(size=(n, dim))
    mean, cov = np.zeros(dim), np.eye(dim)

    def build(mesh_opt):
        model = sv.MultivariateNormal(mean, cov)
        kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model)
        return sv.SVGD(
            sv.SVGDOptions(
                dimension=dim,
                num_iterations=iters,
                coordinate_matrix=x0.copy(),
                kernel=kernel,
                model=model,
                optimizer=sv.AdaGrad(dim, n, 0.1),
                mesh=mesh_opt,
            )
        )

    s1 = build(None)
    s1.initialize()
    r1 = np.asarray(s1.run())

    s2 = build(mesh)
    s2.initialize()
    r2 = np.asarray(s2.run())
    np.testing.assert_allclose(r1, r2, rtol=1e-9, atol=1e-12)


def test_ring_phi_matches_dense(mesh, rng):
    from svgdcpp_tpu.parallel.ring import ring_phi_rbf

    n, m = 40, 3
    coords = jnp.asarray(rng.normal(size=(n, m)))
    scores = jnp.asarray(rng.normal(size=(n, m)))
    p_mat = jnp.asarray(np.eye(m) * 0.7 + 0.1)
    axis = mesh.axis_names[0]

    out = jax.jit(
        jax.shard_map(
            lambda c, s: ring_phi_rbf(c, s, p_mat, axis, n),
            mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(axis, None),
        )
    )(coords, scores)
    dense = phi_rbf(coords, scores, p_mat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), rtol=1e-10)


def test_ring_median_matches_exact(mesh, rng):
    from svgdcpp_tpu.parallel.ring import ring_pairwise_median

    coords = jnp.asarray(rng.normal(size=(64, 3)))
    axis = mesh.axis_names[0]
    out = jax.jit(
        jax.shard_map(
            lambda c: ring_pairwise_median(c, axis, 64, bins=16, passes=8),
            mesh=mesh, in_specs=P(axis, None), out_specs=P(),
        )
    )(coords)
    exact = float(pairwise_distance_median_exact(coords))
    assert abs(float(out) - exact) <= 1e-5 * exact


def test_ring_mode_full_run_matches_gather(mesh, rng):
    n, dim, iters = 32, 2, 8
    x0 = rng.normal(size=(n, dim)) * 2
    mean, cov = np.zeros(dim), np.eye(dim)

    results = []
    for mode in ("gather", "ring"):
        model = sv.MultivariateNormal(mean, cov)
        sharded = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
            mesh=mesh,
            config=ShardedSVGDConfig(
                scale_method=sv.ScaleMethod.MEDIAN,
                median_bins=16, median_passes=10, row_tile=4, phi_mode=mode,
                warm_start=False,
            ),
        )
        results.append(np.asarray(sharded.run(x0.copy(), iters)))
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("mode", ["gather", "ring"])
def test_warm_start_sharded_converges(mesh, rng, mode):
    """Warm-started sharded runs: deterministic, finite, and posterior-close
    to the cold-selection run (bandwidth-level differences only)."""
    n, dim, iters = 32, 2, 15
    x0 = rng.normal(size=(n, dim)) * 2
    mean, cov = np.zeros(dim), np.eye(dim)

    def run(warm):
        model = sv.MultivariateNormal(mean, cov)
        sharded = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
            mesh=mesh,
            config=ShardedSVGDConfig(
                scale_method=sv.ScaleMethod.MEDIAN, phi_mode=mode,
                median_bins=16, median_passes=4, row_tile=4, warm_start=warm,
            ),
        )
        return np.asarray(sharded.run(x0.copy(), iters))

    warm_a = run(True)
    warm_b = run(True)
    np.testing.assert_array_equal(warm_a, warm_b)  # deterministic
    cold = run(False)
    assert np.isfinite(warm_a).all()
    # bandwidth-level deviation only: posterior positions stay close
    assert np.abs(warm_a - cold).max() < 5e-2


def test_sharded_with_adam(mesh, rng):
    """Adam's scalar counter must shard as replicated (review finding)."""
    n, dim = 16, 2
    x0 = rng.normal(size=(n, dim))
    model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    sharded = ShardedSVGD(
        model, sv.Adam(dim, n, 0.1, 0.9, 0.999), num_particles=n,
        dimension=dim, mesh=mesh,
        config=ShardedSVGDConfig(scale_method=sv.ScaleMethod.MEDIAN,
                                 median_passes=4, row_tile=4),
    )
    out = np.asarray(sharded.run(x0, 5))
    assert np.isfinite(out).all()
    # matches the single-device driver with the same warm-start settings off?
    # (warm defaults on in both paths; just check movement + determinism)
    out2 = np.asarray(sharded.run(x0, 5))
    np.testing.assert_array_equal(out, out2)


def test_gspmd_mesh_with_warm_median(mesh, rng):
    """GSPMD auto-sharding + warm-started median (n > exact threshold):
    runs, stays finite, and matches the unsharded driver exactly."""
    n, dim, iters = 2560, 2, 3
    x0 = rng.normal(size=(n, dim)).astype(np.float32)
    mean, cov = np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)

    def build(mesh_opt):
        model = sv.MultivariateNormal(mean, cov)
        kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model)
        s = sv.SVGD(
            sv.SVGDOptions(
                dimension=dim, num_iterations=iters,
                coordinate_matrix=x0.copy(), kernel=kernel, model=model,
                optimizer=sv.AdaGrad(dim, n, 0.1), mesh=mesh_opt,
            )
        )
        s.initialize()
        return np.asarray(s.run())

    meshed = build(mesh)
    plain = build(None)
    # GSPMD partitions the count/phi reductions differently, perturbing the
    # f32 sums at the last bits; trajectories agree to ~1e-4 after 3 steps.
    np.testing.assert_allclose(meshed, plain, rtol=5e-4, atol=5e-5)


def test_ring_phi_off_center_f32(mesh, rng):
    """Ring phi with global-mean centering stays accurate for f32 clusters
    far from the origin (review finding: 41x relative error before)."""
    from svgdcpp_tpu.ops.phi import phi_rbf
    from svgdcpp_tpu.parallel.ring import ring_phi_rbf

    n, m = 64, 2
    coords64 = np.array([50.0, -30.0]) + 1e-3 * rng.normal(size=(n, m))
    scores64 = rng.normal(size=(n, m))
    gamma = np.log(n) / (2e-3) ** 2  # bandwidth at the cluster scale
    p64 = gamma * np.eye(m)

    # f64 truth by explicit differences
    d = coords64[:, None, :] - coords64[None, :, :]
    K = np.exp(-gamma * (d ** 2).sum(-1))
    Psym = p64 + p64.T
    phi64 = (K @ scores64 + np.einsum("ij,ijk->ik", K, d @ Psym)) / n

    coords = jnp.asarray(coords64, jnp.float32)
    scores = jnp.asarray(scores64, jnp.float32)
    p_mat = jnp.asarray(p64, jnp.float32)
    axis = mesh.axis_names[0]
    out = jax.jit(
        jax.shard_map(
            lambda c, s: ring_phi_rbf(c, s, p_mat, axis, n),
            mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(axis, None),
        )
    )(coords, scores)
    rel = np.abs(np.asarray(out) - phi64).max() / np.abs(phi64).max()
    assert rel < 2e-2, rel


def test_config_validation():
    with pytest.raises(ValueError):
        ShardedSVGDConfig(phi_mode="rings")
    with pytest.raises(ValueError):
        ShardedSVGDConfig(scale_method=sv.ScaleMethod.CONSTANT)


# ----------------------------------------------------------------------
# Generic/composed kernels on the sharded path
# ----------------------------------------------------------------------


def _composed_kernel(x0, model, extra_scale=0.25):
    dim = x0.shape[1]
    return sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model, median_method="exact"
    ) + sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT,
        constant_scale=extra_scale * np.eye(dim),
    )


def test_sharded_generic_kernel_matches_driver(mesh, rng):
    """Composed kernel on the sharded path == single-chip driver."""
    n, dim, iters = 32, 2, 8
    mean = np.array([0.5, -1.0])
    cov = np.array([[1.0, 0.2], [0.2, 0.8]])
    x0 = rng.normal(size=(n, dim)) * 2

    model = sv.MultivariateNormal(mean, cov)
    kernel = _composed_kernel(x0, model)
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=iters, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model, optimizer=sv.AdaGrad(dim, n, 0.1),
        )
    )
    svgd.initialize()
    single = np.asarray(svgd.run())

    model2 = sv.MultivariateNormal(mean, cov)
    kernel2 = _composed_kernel(x0, model2)
    sharded = ShardedSVGD(
        model2, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, kernel=kernel2,
        config=ShardedSVGDConfig(
            median_bins=1024, median_passes=4, row_tile=4, warm_start=False,
            kernel_phi="generic",  # pin the VJP path (auto would flatten)
        ),
    )
    assert sharded._rbf_terms is None
    out = np.asarray(sharded.run(x0.copy(), iters))
    np.testing.assert_allclose(out, single, rtol=1e-5, atol=1e-5)


def test_sharded_generic_ring_matches_gather(mesh, rng):
    n, dim, iters = 32, 2, 5
    x0 = rng.normal(size=(n, dim)) * 2
    results = []
    for mode in ("gather", "ring"):
        model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
        kernel = _composed_kernel(x0, model)
        sharded = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
            mesh=mesh, kernel=kernel,
            config=ShardedSVGDConfig(
                phi_mode=mode, median_bins=16, median_passes=10,
                row_tile=4, warm_start=False,
                kernel_phi="generic",  # pin the VJP path (auto would flatten)
            ),
        )
        results.append(np.asarray(sharded.run(x0.copy(), iters)))
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6, atol=1e-9)


def test_sharded_generic_hessian_foreign_model(mesh, rng):
    """A Hessian slot targeting a model other than the driver's resolves
    its scale from that model's parameters (sharded mirror of the driver
    foreign-model test)."""
    n, dim, iters = 16, 2, 3
    x0 = rng.normal(size=(n, dim))
    model1 = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    cov2 = np.array([[2.0, 0.0], [0.0, 2.0]])
    model2 = sv.MultivariateNormal(np.ones(dim), cov2)
    kernel = sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model1, median_method="exact"
    ) + sv.GaussianRBFKernel(x0, sv.ScaleMethod.HESSIAN, model2)
    sharded = ShardedSVGD(
        model1, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, kernel=kernel,
        config=ShardedSVGDConfig(median_passes=4, row_tile=4),
    )
    state = sharded.init_state(x0)
    state = sharded.run_state(state, iters)
    expect = np.linalg.inv(cov2) / (2 * dim)
    np.testing.assert_allclose(
        np.asarray(state["kernel_params"][1]), expect, rtol=1e-6
    )


# ----------------------------------------------------------------------
# Sharded feature parity: annealing, stats, resume
# ----------------------------------------------------------------------


def test_sharded_annealing(mesh, rng):
    n, dim, iters = 16, 2, 10
    x0 = rng.normal(size=(n, dim)) * 2

    def run(annealing):
        model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
        sharded = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
            mesh=mesh,
            config=ShardedSVGDConfig(
                median_passes=4, row_tile=4, annealing=annealing,
            ),
        )
        return np.asarray(sharded.run(x0.copy(), iters))

    plain = run(None)
    ones = run(np.ones(iters))
    np.testing.assert_allclose(plain, ones, rtol=1e-12)
    ramp = run(np.linspace(0.1, 1.0, iters))
    assert not np.allclose(ramp, plain)
    ramp2 = run(lambda it: 0.1 + 0.9 * it / (iters - 1))
    np.testing.assert_allclose(ramp2, ramp, rtol=1e-9)


def test_sharded_track_stats(mesh, rng):
    n, dim, iters = 16, 2, 6
    x0 = rng.normal(size=(n, dim)) * 3
    model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh,
        config=ShardedSVGDConfig(
            median_passes=4, row_tile=4, track_stats=True,
        ),
    )
    sharded.run(x0, iters)
    stats = sharded.stats
    assert set(stats) == {"phi_rms", "step_max", "bandwidth"}
    assert all(np.asarray(v).shape == (iters,) for v in stats.values())
    assert (np.asarray(stats["bandwidth"]) > 0).all()
    # continuation appends
    sharded.run(None, 4)
    assert all(np.asarray(v).shape == (iters + 4,) for v in sharded.stats.values())


def test_sharded_run_continues_in_place(mesh, rng):
    """run(coords) then run(None) == one uninterrupted run — optimizer
    moments and iteration counter persist (the reference's in-place Run()
    contract, SVGD.hpp:393)."""
    n, dim = 16, 2
    x0 = rng.normal(size=(n, dim)) * 2

    def make():
        model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
        return ShardedSVGD(
            model, sv.Adam(dim, n, 0.1, 0.9, 0.999), num_particles=n,
            dimension=dim, mesh=mesh,
            config=ShardedSVGDConfig(median_passes=4, row_tile=4),
        )

    a = make()
    full = np.asarray(a.run(x0.copy(), 10))
    b = make()
    b.run(x0.copy(), 5)
    split = np.asarray(b.run(None, 5))
    np.testing.assert_allclose(split, full, rtol=1e-12, atol=1e-15)
    assert int(b._state["iteration"]) == 10


def test_sharded_fused_matches_driver_fused(mesh, rng):
    """config.fused_phi (one cross-shard sweep/step) reproduces the
    driver's phi_impl='fused' trajectory: same lag-1 median, same bracket
    logic, counts psum'ed across shards."""
    n, dim, iters = 32, 2, 10
    x0 = rng.normal(size=(n, dim)) * 2
    mean = np.array([0.5, -1.0])
    cov = np.array([[1.0, 0.2], [0.2, 0.8]])

    model = sv.MultivariateNormal(mean, cov)
    kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model)
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=iters, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model, optimizer=sv.AdaGrad(dim, n, 0.1),
            phi_impl="fused",
        )
    )
    svgd.initialize()
    single = np.asarray(svgd.run())

    model2 = sv.MultivariateNormal(mean, cov)
    sharded = ShardedSVGD(
        model2, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh,
        config=ShardedSVGDConfig(row_tile=4, fused_phi=True),
    )
    out = np.asarray(sharded.run(x0.copy(), iters))
    np.testing.assert_allclose(out, single, rtol=1e-8, atol=1e-10)


def test_fused_phi_config_validation():
    with pytest.raises(ValueError):
        ShardedSVGDConfig(fused_phi=True, phi_mode="ring")
    with pytest.raises(ValueError):
        ShardedSVGDConfig(
            fused_phi=True, scale_method=sv.ScaleMethod.HESSIAN
        )


def test_sharded_checkpoint_resume(mesh, rng, tmp_path):
    """Sharded state round-trips through save/restore with sharding kept."""
    from svgdcpp_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    n, dim = 16, 2
    x0 = rng.normal(size=(n, dim)) * 2

    def make():
        model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
        return ShardedSVGD(
            model, sv.Adam(dim, n, 0.1, 0.9, 0.999), num_particles=n,
            dimension=dim, mesh=mesh,
            config=ShardedSVGDConfig(median_passes=4, row_tile=4),
        )

    a = make()
    full = np.asarray(a.run(x0.copy(), 10))

    b = make()
    state = b.init_state(x0.copy())
    state = b.run_state(state, 5)
    save_checkpoint(tmp_path / "shck", state, step=5)

    c = make()
    exemplar = c.init_state(x0.copy())
    restored, step = restore_checkpoint(tmp_path / "shck", exemplar)
    assert step == 5
    # restored coords keep the exemplar's NamedSharding
    assert restored["coords"].sharding == exemplar["coords"].sharding
    final = c.run_state(restored, 5)
    np.testing.assert_allclose(
        np.asarray(final["coords"]), full, rtol=1e-12, atol=1e-15
    )


def test_sharded_kernel_hotswap_revalidates_psd(mesh, rng):
    """Swapping a composed kernel's constant slot to an INDEFINITE matrix
    must flip the trace-time PSD clamp flag (and match the driver, which
    re-validates in update_kernel_parameters) — regression for the sharded
    path silently keeping the stale clamp and truncating k > 1 values."""
    n, dim, iters = 32, 2, 4
    mean = np.array([0.5, -1.0])
    cov = np.array([[1.0, 0.2], [0.2, 0.8]])
    x0 = rng.normal(size=(n, dim)) * 2
    indefinite = np.diag([0.05, -0.08])  # exp(-d^T P d) legitimately > 1

    def swapped_params(kernel):
        params = list(kernel.parameters)
        params[1] = indefinite
        return tuple(params)

    model = sv.MultivariateNormal(mean, cov)
    kernel = _composed_kernel(x0, model)
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=iters, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model, optimizer=sv.AdaGrad(dim, n, 0.1),
            phi_impl="rbf_terms",
        )
    )
    svgd.initialize()
    assert svgd._term_psd == [True, True]
    svgd.update_kernel_parameters(swapped_params(kernel))
    assert svgd._term_psd == [True, False]
    single = np.asarray(svgd.run())

    model2 = sv.MultivariateNormal(mean, cov)
    kernel2 = _composed_kernel(x0, model2)
    sharded = ShardedSVGD(
        model2, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, kernel=kernel2,
        config=ShardedSVGDConfig(
            median_bins=1024, median_passes=4, row_tile=4, warm_start=False,
            kernel_phi="rbf_terms",
        ),
    )
    assert sharded._term_psd == [True, True]
    sharded.update_kernel_parameters(swapped_params(kernel2))
    assert sharded._term_psd == [True, False]
    out = np.asarray(sharded.run(x0.copy(), iters))
    np.testing.assert_allclose(out, single, rtol=1e-5, atol=1e-5)

    # Direct kernel mutation (bypassing update_kernel_parameters) is caught
    # by init_state's staleness check.
    model3 = sv.MultivariateNormal(mean, cov)
    kernel3 = _composed_kernel(x0, model3)
    sharded3 = ShardedSVGD(
        model3, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, kernel=kernel3,
        config=ShardedSVGDConfig(
            median_bins=1024, median_passes=4, row_tile=4, warm_start=False,
            kernel_phi="rbf_terms",
        ),
    )
    kernel3.update_parameters(swapped_params(kernel3))
    out3 = np.asarray(sharded3.run(x0.copy(), iters))
    assert sharded3._term_psd == [True, False]
    np.testing.assert_allclose(out3, single, rtol=1e-5, atol=1e-5)


def test_sharded_fused_hotswap_rejects_anisotropic(mesh, rng):
    """fused_phi reads each constant slot as gamma = P[0, 0]; an
    anisotropic hot-swap must be rejected, not silently truncated (same
    contract as the driver's fused_terms update_kernel_parameters)."""
    n, dim = 16, 2
    x0 = rng.normal(size=(n, dim)) * 2
    model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    kernel = _composed_kernel(x0, model)
    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, kernel=kernel,
        config=ShardedSVGDConfig(fused_phi=True, row_tile=4),
    )
    params = list(kernel.parameters)
    params[1] = np.diag([0.3, 0.1])  # anisotropic
    with pytest.raises(ValueError, match="isotropic"):
        sharded.update_kernel_parameters(tuple(params))


def test_sharded_fused_bimodal_matches_driver(mesh, rng):
    """Bimodal (gap-straddling median) data through the fused sharded path:
    the per-rank bracket plumbing (6-slot aux tuple, split-mode edges) must
    reproduce the driver's fused trajectory exactly."""
    n, dim, iters = 32, 2, 12
    half = n // 2
    x0 = np.concatenate([
        0.3 * rng.normal(size=(half, dim)),
        0.3 * rng.normal(size=(half, dim)) + np.array([8.0, 0.0]),
    ])
    m1 = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    m2 = sv.MultivariateNormal(np.array([8.0, 0.0]), np.eye(dim))

    gmm = m1 + m2
    kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, gmm)
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=iters, coordinate_matrix=x0.copy(),
            kernel=kernel, model=gmm, optimizer=sv.AdaGrad(dim, n, 0.05),
            phi_impl="fused",
        )
    )
    svgd.initialize()
    single = np.asarray(svgd.run())

    gmm2 = sv.MultivariateNormal(np.zeros(dim), np.eye(dim)) + \
        sv.MultivariateNormal(np.array([8.0, 0.0]), np.eye(dim))
    sharded = ShardedSVGD(
        gmm2, sv.AdaGrad(dim, n, 0.05), num_particles=n, dimension=dim,
        mesh=mesh,
        config=ShardedSVGDConfig(row_tile=4, fused_phi=True),
    )
    out = np.asarray(sharded.run(x0.copy(), iters))
    np.testing.assert_allclose(out, single, rtol=1e-8, atol=1e-10)


def test_sharded_constant_scale_f32_coords(mesh, rng):
    """An f64 constant_scale with f32 coords must not break the scan carry
    (the CONSTANT branch now casts to the coords dtype like median/Hessian)."""
    n, dim = 16, 2
    x0 = rng.normal(size=(n, dim)).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh,
        config=ShardedSVGDConfig(
            scale_method=sv.ScaleMethod.CONSTANT,
            constant_scale=np.eye(dim),  # f64 under the x64 test config
            row_tile=4,
        ),
    )
    out = np.asarray(sharded.run(x0, 3))
    assert np.isfinite(out).all()


# ----------------------------------------------------------------------
# Sharded logging + hooks (mirrors of the driver-path tests; reference
# SVGD.hpp:346-366 logging, Model.hpp:413 / Kernel.hpp:356 hooks)
# ----------------------------------------------------------------------


def test_sharded_intermediate_logging(mesh, rng, tmp_path):
    """ShardedSVGDConfig.log_intermediate_matrices writes the reference-
    format per-iteration dump and matches the single-chip driver's debug
    stacks on the same run."""
    n, dim, iters = 24, 2, 4
    x0 = rng.normal(size=(n, dim)) * 2
    mean, cov = np.zeros(dim), np.eye(dim)
    path = str(tmp_path / "sharded_log.txt")
    model = sv.MultivariateNormal(mean, cov)
    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh,
        # warm_start off + deep bisection: the sharded median is then
        # selection-exact, so the stacks compare tightly against the
        # driver's exact-median generic logging path.
        config=ShardedSVGDConfig(
            log_intermediate_matrices=True,
            intermediate_matrices_output_path=path,
            row_tile=8, warm_start=False, median_bins=32, median_passes=8,
        ),
    )
    sharded.run(x0.copy(), iters)

    text = open(path).read()
    assert text.count("========== Step") == iters
    for section in ("LogModelGrad=", "Kernel=", "KernelGrad=", "CoordMat="):
        assert text.count(section) == iters

    logs = sharded.intermediate_logs
    assert logs["kernel"].shape == (iters, n, n)
    assert logs["kernel_grad"].shape == (iters, n, n, dim)

    # The driver's debug dump on the same run (its logging path forces the
    # generic impl with the exact same-step median; the deep sharded
    # bisection median agrees to selection tolerance in f64).
    kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model)
    drv = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=iters, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model, optimizer=sv.AdaGrad(dim, n, 0.1),
            log_intermediate_matrices=True,
            intermediate_matrices_output_path=str(tmp_path / "drv_log.txt"),
        )
    )
    drv.initialize()
    drv.run()
    for key in ("log_model_grad", "kernel", "kernel_grad", "coords"):
        np.testing.assert_allclose(
            logs[key], np.asarray(drv._intermediate_logs[key]),
            rtol=1e-4, atol=1e-7,
        )


def test_sharded_logging_requires_gather():
    model = sv.MultivariateNormal(np.zeros(2), np.eye(2))
    with pytest.raises(ValueError, match="gather"):
        ShardedSVGDConfig(log_intermediate_matrices=True, phi_mode="ring")


class _CountingModel(sv.MultivariateNormal):
    def __init__(self, *a):
        super().__init__(*a)
        self.hook_calls = 0

    def step(self):
        self.hook_calls += 1


def test_sharded_custom_hooks_run_eagerly(mesh, rng):
    """A custom model Step hook runs once per iteration (eager fallback);
    a no-op hook leaves the trajectory identical to the scanned path."""
    n, dim, iters = 16, 2, 5
    x0 = rng.normal(size=(n, dim))
    model = _CountingModel(np.zeros(dim), np.eye(dim))
    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, config=ShardedSVGDConfig(row_tile=8),
    )
    assert sharded._has_custom_hooks()
    out = np.asarray(sharded.run(x0.copy(), iters))
    assert model.hook_calls == iters

    model2 = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    plain = ShardedSVGD(
        model2, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, config=ShardedSVGDConfig(row_tile=8),
    )
    assert not plain._has_custom_hooks()
    np.testing.assert_allclose(
        out, np.asarray(plain.run(x0.copy(), iters)), rtol=1e-12
    )


def test_sharded_kernel_camelcase_hook(mesh, rng):
    """A composed kernel overriding the CamelCase Step is detected and
    invoked per iteration; stats still collect on the eager path."""
    n, dim, iters = 16, 2, 3
    x0 = rng.normal(size=(n, dim))

    class CamelKernel(sv.GaussianRBFKernel):
        calls = 0

        def Step(self):
            type(self).calls += 1

    model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    kernel = CamelKernel(x0, sv.ScaleMethod.MEDIAN, model)
    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, kernel=kernel,
        config=ShardedSVGDConfig(row_tile=8, track_stats=True),
    )
    assert sharded._has_custom_hooks()
    CamelKernel.calls = 0
    sharded.run(x0.copy(), iters)
    assert CamelKernel.calls == iters
    assert sharded.stats is not None
    assert np.asarray(sharded.stats["phi_rms"]).shape == (iters,)


def test_sharded_step_state_logging_accumulates(mesh, rng, tmp_path):
    """Per-step driving via step_state() must accumulate the debug log
    across calls (review finding: each call used to truncate the file to
    one mislabeled step)."""
    n, dim, steps = 16, 2, 3
    x0 = rng.normal(size=(n, dim))
    path = str(tmp_path / "steplog.txt")
    model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh,
        config=ShardedSVGDConfig(
            log_intermediate_matrices=True,
            intermediate_matrices_output_path=path, row_tile=8,
        ),
    )
    assert sharded.intermediate_logs is None  # probe-able before any run
    state = sharded.init_state(x0)
    for _ in range(steps):
        state = sharded.step_state(state)
    assert sharded.intermediate_logs["coords"].shape[0] == steps
    text = open(path).read()
    assert text.count("========== Step") == steps
    assert f"========== Step {steps} " in text


def test_chained_run_hits_jit_cache(mesh, rng):
    """Feeding a run's output state back in must not recompile: every
    state leaf gets an explicit mesh sharding at init so the chained
    signature matches the step's output shardings (regression for the
    measured 2.6 s extra compile per chained call) — on BOTH the driver
    (SVGDOptions.mesh) and ShardedSVGD."""
    n, dim = 32, 2
    x0 = rng.normal(size=(n, dim))
    model = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))

    sharded = ShardedSVGD(
        model, sv.AdaGrad(dim, n, 0.1), num_particles=n, dimension=dim,
        mesh=mesh, config=ShardedSVGDConfig(row_tile=8),
    )
    state = sharded.init_state(x0)
    state = sharded.run_state(state, 2)
    state = sharded.run_state(state, 2)
    state = sharded.run_state(state, 2)
    assert sharded.run_fn._cache_size() == 1

    model2 = sv.MultivariateNormal(np.zeros(dim), np.eye(dim))
    kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model2)
    drv = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=2, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model2, optimizer=sv.AdaGrad(dim, n, 0.1),
            mesh=mesh,
        )
    )
    drv.initialize()
    st = drv.make_state()
    st, _ = drv._jit_run(st, 2)
    st, _ = drv._jit_run(st, 2)
    assert drv._jit_run._cache_size() == 1
