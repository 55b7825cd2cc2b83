"""Example-workload convergence tests — the correctness anchors.

BASELINE.md: posterior moments on the reference's MVN and GMM example
configs must match the target distribution within Monte-Carlo error
(reference examples/multivariate_normal/mvn_example.cpp and
examples/gaussian_mixture_model/gmm_example.cpp).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import gmm_example  # noqa: E402
import mvn_example  # noqa: E402


def test_mvn_example_converges():
    x0, final, mean, cov = mvn_example.run(verbose=False)
    assert final.shape == x0.shape
    # With 10 particles the empirical mean carries MC error ~ sqrt(var/10);
    # allow 2x that slack per coordinate.
    tol = 2.0 * np.sqrt(np.diag(cov) / x0.shape[0])
    err = np.abs(final.mean(axis=0) - mean)
    assert np.all(err < tol), f"mean error {err} vs tol {tol}"
    # Particles spread (not collapsed onto the mode)
    assert np.all(final.std(axis=0) > 0.3 * np.sqrt(np.diag(cov)))


def test_notebooks_execute():
    """The shipped .ipynb mirrors (analog of the reference's example
    notebooks) are valid nbformat-4 JSON whose code cells execute
    end-to-end."""
    import json

    import matplotlib

    matplotlib.use("Agg")
    examples = Path(__file__).resolve().parent.parent / "examples"
    for name in ("mvn_example.ipynb", "gmm_example.ipynb"):
        nb = json.loads((examples / name).read_text())
        assert nb["nbformat"] == 4
        code = "\n".join(
            "".join(c["source"])
            for c in nb["cells"]
            if c["cell_type"] == "code"
        )
        assert "plot_overlay" in code
        ns = {"__name__": f"nb_{name}"}
        exec(compile(code.replace("plt.show()", "plt.close('all')"),
                     str(examples / name), "exec"), ns)


def test_visual_regression_figure(tmp_path):
    """Figure generation across all four workloads (the analog of the
    reference's visualization notebooks) runs and writes a real PNG."""
    import plot_results

    path = plot_results.main(tmp_path, quick=True)
    assert path.exists()
    assert path.stat().st_size > 20_000  # a real 2x2 overlay, not a stub


def test_gmm_example_covers_both_modes():
    """PARITY anchor: the driver's GMM run must match the f64
    reference-semantics oracle (bench.numpy_gmm_oracle) PER PARTICLE.

    The oracle reproduces the example's 16/4 mode split from this x0 —
    mode-mass imbalance is what the reference algorithm itself produces
    here (SVGD mass allocation is kernel-width-dependent, not 50/50), so
    the anchor pins the exact assignment vector, not a loose 'bimodal'."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    x0, final, (mean1, cov1), (mean2, cov2) = gmm_example.run(verbose=False)
    oracle = bench.numpy_gmm_oracle(
        x0, (mean1, mean2), (cov1, cov2), iters=1000
    )
    d1 = np.linalg.norm(final - mean1, axis=1)
    d2 = np.linalg.norm(final - mean2, axis=1)
    assign = d1 < d2
    o1 = np.linalg.norm(oracle - mean1, axis=1)
    o2 = np.linalg.norm(oracle - mean2, axis=1)
    oracle_assign = o1 < o2
    # Exact per-particle mode agreement with the reference-semantics oracle
    # (both runs share x0; the split is 16/4 for the committed seed).
    assert np.array_equal(assign, oracle_assign), (
        f"mode assignment diverged from the f64 oracle: "
        f"{assign.astype(int)} vs {oracle_assign.astype(int)}"
    )
    # Converged particles sit on top of the oracle's (sub-MC-error scale)
    assert np.abs(final - oracle).max() < 0.15, (
        f"coordinate drift vs oracle: {np.abs(final - oracle).max()}"
    )
    # And the original anchor criteria still hold
    c1 = final[assign].mean(axis=0)
    c2 = final[~assign].mean(axis=0)
    assert np.linalg.norm(c1 - mean1) < 1.5
    assert np.linalg.norm(c2 - mean2) < 1.5


def test_large_scale_example_runs_and_improves_ksd():
    """The large-scale example (sized down for CPU) runs the fused path and
    shrinks the KSD."""
    import large_scale_example

    out, ksd_before, ksd_after = large_scale_example.run(
        num_particles=2048, num_iterations=40, verbose=False
    )
    assert out.shape == (2048, 2)
    assert ksd_after < 0.8 * ksd_before


def test_sharded_example_converges():
    """The multi-chip example runs on the simulated 8-device mesh and
    reduces the KSD toward the target."""
    import sharded_example

    x0, final, ksd0, ksd1 = sharded_example.run(
        num_particles=256, num_iterations=150, verbose=False
    )
    assert final.shape == x0.shape
    assert np.isfinite(final).all()
    assert ksd1 < 0.5 * ksd0  # discrepancy to the target dropped
