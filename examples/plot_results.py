"""Visual-regression plots for the example workloads.

The reference ships Jupyter notebooks that run the example binaries and
overlay initial/final particle scatters on target-density contours
(reference examples/*/*.ipynb, examples/README.md:3-14). This script is the
equivalent: it runs the MVN and GMM examples and writes the overlay figures
to PNG.

    python examples/plot_results.py [outdir]
"""

import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import gmm_example
import mvn_example


def _density_grid(log_density, xlim, ylim, res=200):
    xs = np.linspace(*xlim, res)
    ys = np.linspace(*ylim, res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)  # (res^2, 2)
    z = np.exp(log_density(pts)).reshape(res, res)
    return gx, gy, z


def _mvn_logpdf(mean, cov):
    inv = np.linalg.inv(cov)

    def f(pts):
        d = np.atleast_2d(pts) - mean
        return -0.5 * np.einsum("ni,ij,nj->n", d, inv, d)

    return f


def plot_overlay(ax, x0, final, log_density, title):
    lim = (
        min(x0.min(), final.min()) - 1.0,
        max(x0.max(), final.max()) + 1.0,
    )
    gx, gy, z = _density_grid(log_density, lim, lim, res=120)
    ax.contour(gx, gy, z, levels=8, cmap="Greys", alpha=0.7)
    ax.scatter(x0[:, 0], x0[:, 1], c="#d62728", s=18, label="initial")
    ax.scatter(final[:, 0], final[:, 1], c="#1f77b4", s=18, label="final")
    ax.set_title(title)
    ax.legend(loc="upper right", fontsize=8)


def main(outdir=None):
    out = (
        Path(outdir)
        if outdir is not None
        else Path(__file__).resolve().parent / "figures"
    )
    out.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(11, 5))

    x0, final, mean, cov = mvn_example.run(verbose=False)
    plot_overlay(axes[0], x0, final, _mvn_logpdf(mean, cov), "MVN (10 particles)")

    x0, final, (m1, c1), (m2, c2) = gmm_example.run(verbose=False)
    f1, f2 = _mvn_logpdf(m1, c1), _mvn_logpdf(m2, c2)
    gmm_log = lambda pts: np.logaddexp(f1(pts), f2(pts))
    plot_overlay(axes[1], x0, final, gmm_log, "GMM (20 particles)")

    fig.tight_layout()
    path = out / "examples_overlay.png"
    fig.savefig(path, dpi=110)
    print(f"wrote {path}")
    return path


if __name__ == "__main__":
    main(*sys.argv[1:])
