"""Posterior-level evidence for the anisotropic fused sweep (round-5
verdict item: the aniso path's accuracy class was only characterized on a
random-data metric).

Runs the hierarchical-anchor-shaped workload — d=11 MVN target, composed
kernel RBF(median) + RBF(constant FULL-MATRIX PD P) — for 1000 iterations
on the real chip through BOTH the auto-selected
`fused_aniso_terms_pallas` Mosaic path and the exact per-term
`rbf_terms` path, and reports each posterior's moment errors in MC units
plus the cross-path moment agreement. Appends the result to
PARITY_r05.json under "aniso_posterior".

    timeout 1200 python scripts/check_aniso_posterior.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax

import svgdcpp_tpu as sv


def moments_mc(coords, mean, cov):
    coords = np.asarray(coords, np.float64)
    n = coords.shape[0]
    emp_mean = coords.mean(axis=0)
    emp_cov = np.cov(coords.T)
    mean_mc = np.sqrt(np.diag(cov) / n)
    cov_mc = np.sqrt((np.outer(np.diag(cov), np.diag(cov)) + cov**2) / n)
    return {
        "mean_err_over_mc": round(
            float((np.abs(emp_mean - mean) / mean_mc).max()), 3
        ),
        "cov_err_over_mc": round(
            float((np.abs(emp_cov - cov) / cov_mc).max()), 3
        ),
        "cov_rel_err": round(
            float(np.linalg.norm(emp_cov - cov) / np.linalg.norm(cov)), 4
        ),
    }


def run(phi_impl, x0, mean, cov, p_aniso, iters=1000):
    n, dim = x0.shape
    model = sv.MultivariateNormal(
        mean.astype(np.float32), cov.astype(np.float32)
    )
    kernel = sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.MEDIAN, model
    ) + sv.GaussianRBFKernel(
        x0, sv.ScaleMethod.CONSTANT,
        constant_scale=p_aniso.astype(np.float32),
    )
    svgd = sv.SVGD(
        sv.SVGDOptions(
            dimension=dim, num_iterations=iters, coordinate_matrix=x0.copy(),
            kernel=kernel, model=model,
            optimizer=sv.AdaGrad(dim, n, 0.05), phi_impl=phi_impl,
        )
    )
    svgd.initialize()
    t0 = time.perf_counter()
    out = np.asarray(svgd.run())
    dt = time.perf_counter() - t0
    return out, svgd._phi_impl, n * iters / dt


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    n, dim = 10240, 11
    a = rng.normal(size=(dim, dim)) * 0.3
    cov = (np.eye(dim) + a @ a.T).astype(np.float64)
    mean = rng.normal(size=dim)
    x0 = (rng.normal(size=(n, dim)) * 2).astype(np.float32)
    # full-matrix PD constant scale (anisotropic slot)
    b = rng.normal(size=(dim, dim)) * 0.1
    p_aniso = 0.05 * np.eye(dim) + b @ b.T

    out_a, impl_a, rate_a = run("auto", x0, mean, cov, p_aniso)
    out_r, impl_r, rate_r = run("rbf_terms", x0, mean, cov, p_aniso)

    rec = {
        "config": "d=11 MVN, RBF(median) + RBF(const full-matrix PD), "
                  "N=10240, 1000 iters, AdaGrad lr=0.05",
        "auto_impl": impl_a,
        "auto": moments_mc(out_a, mean, cov),
        "rbf_terms": moments_mc(out_r, mean, cov),
        "cross_path_moment_diff": {
            "mean": float(np.abs(out_a.mean(0) - out_r.mean(0)).max()),
            "cov_fro_rel": float(
                np.linalg.norm(np.cov(out_a.T) - np.cov(out_r.T))
                / np.linalg.norm(np.cov(out_r.T))
            ),
        },
        "rate_auto": round(rate_a, 1),
        "rate_rbf_terms": round(rate_r, 1),
    }
    print(json.dumps(rec), flush=True)

    parity = ROOT / "PARITY_r05.json"
    if parity.exists():
        base = json.loads(parity.read_text())
        base["aniso_posterior"] = rec
        parity.write_text(json.dumps(base) + "\n")
        print(f"appended to {parity}")


if __name__ == "__main__":
    main()
