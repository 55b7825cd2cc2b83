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
