"""Kernel Stein discrepancy tests: closed form vs a jax.grad oracle, and
monotone decrease along an SVGD run."""

import jax
import jax.numpy as jnp
import numpy as np

import svgdcpp_tpu as sv
from svgdcpp_tpu.ops.ksd import ksd_rbf, ksd_squared_rbf


def u_p_autodiff(x, y, s_fn, p_matrix):
    """Stein kernel u_p via autodiff (oracle)."""
    k = lambda a, b: jnp.exp(-(a - b) @ p_matrix @ (a - b))
    gx = jax.grad(k, 0)
    gy = jax.grad(k, 1)
    hxy = jax.jacfwd(gy, 0)(x, y)  # d/dx of grad_y k -> (m, m)
    return (
        s_fn(x) @ s_fn(y) * k(x, y)
        + s_fn(x) @ gy(x, y)
        + gx(x, y) @ s_fn(y)
        + jnp.trace(hxy)
    )


def test_ksd_matches_autodiff_oracle(rng):
    n, m = 12, 3
    coords = jnp.asarray(rng.normal(size=(n, m)))
    p_mat = jnp.asarray(np.array([[0.7, 0.1, 0.0], [0.1, 0.5, 0.2], [0.0, 0.2, 0.9]]))
    mean = jnp.zeros(m)
    cov_inv = jnp.asarray(np.linalg.inv(np.eye(m) + 0.3))
    s_fn = lambda x: -cov_inv @ (x - mean)
    scores = jax.vmap(s_fn)(coords)

    closed = float(ksd_squared_rbf(coords, scores, p_mat, row_tile=4))
    oracle = float(
        np.mean(
            [
                float(u_p_autodiff(coords[i], coords[j], s_fn, p_mat))
                for i in range(n)
                for j in range(n)
            ]
        )
    )
    assert np.isclose(closed, oracle, rtol=1e-8), (closed, oracle)


def test_ksd_decreases_along_svgd(rng):
    n, dim = 64, 2
    mean = np.array([0.5, -0.5])
    cov = np.array([[1.0, 0.2], [0.2, 0.8]])
    model = sv.MultivariateNormal(mean, cov)
    x0 = rng.normal(size=(n, dim)) * 3 + 2

    ksd_before = float(ksd_rbf(model, x0))

    kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model)
    svgd = sv.SVGD(
        sv.SVGDOptions(dimension=dim, num_iterations=200, coordinate_matrix=x0,
                       kernel=kernel, model=model,
                       optimizer=sv.AdaGrad(dim, n, 0.1))
    )
    svgd.initialize()
    out = np.asarray(svgd.run())
    ksd_after = float(ksd_rbf(model, out))
    # finite-n particles keep a residual KSD; a converged run shrinks it
    # several-fold (measured ~4x at n=64 after 200 iters)
    assert ksd_after < 0.4 * ksd_before, (ksd_before, ksd_after)
