"""Prove the sharded Mosaic fused sweep on real TPU (1-device mesh).

ShardedSVGDConfig.fused_pallas auto-selects the per-device Mosaic kernel on
TPU backends; the simulated CPU mesh cannot exercise it (the pallas
interpreter's grid loop is VMA-untyped inside shard_map), so this script
runs the compiled path on a Mesh over the real chip — shard_map + check_vma
+ Mosaic — and checks trajectory equality against the XLA fused sweep, for
the built-in RBF, a composed 2-term kernel, AND the driver's
SVGDOptions.mesh path (whose fused sweep rides an internal shard_map so
GSPMD does not lose the Mosaic win). Each case also asserts the compiled
program actually contains the Mosaic custom-call — guarding against a
silent fallback making the trajectory check vacuous. Prints one JSON line
per case; --out writes the lines to a committed artifact.

The cross-shard math this validates at D=1 is proven at D=4/8 by the
decomposition tests (tests/test_pallas.py::test_fused_pallas_shard_
decomposition): per-shard Mosaic sweeps + host-psum equal the global
result exactly.

Run:  timeout 900 python scripts/check_sharded_pallas.py --out SHARDED_PALLAS_r03.json
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import svgdcpp_tpu as sv
from svgdcpp_tpu.parallel.sharded import ShardedSVGD, ShardedSVGDConfig

RESULTS = []


def _emit(rec):
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)


def _has_mosaic_call(jitted, *args) -> bool:
    """Whether the compiled program contains the Mosaic custom-call
    (pallas lowers to a tpu_custom_call op on TPU backends)."""
    txt = jitted.lower(*args).compile().as_text()
    return "tpu_custom_call" in txt


def _moment_diff(a, b):
    """Distributional distance between two particle sets: AdaGrad's early
    steps are sign-like (step ~ +/-lr wherever phi crosses zero), so ANY
    per-pair fp difference between two correct implementations amplifies
    into per-particle divergence over steps; empirical mean/cov of the
    ensembles is the implementation-equivalence observable (per-sweep
    equality is pinned separately by
    tests/test_pallas.py::test_fused_pallas_shard_decomposition)."""
    scale = np.abs(b).max() + 1e-30
    dmean = np.abs(a.mean(0) - b.mean(0)).max() / scale
    dcov = np.abs(np.cov(a.T) - np.cov(b.T)).max() / (
        np.abs(np.cov(b.T)).max() + 1e-30
    )
    return float(dmean), float(dcov)


def run_case(name, kernel_fn, n=4096, dim=2, steps=20):
    rng = np.random.default_rng(0)
    x0 = (rng.normal(size=(n, dim)) * 2 + 1.5).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    outs = {}
    mosaic_in_hlo = None
    for flag in (True, False):
        kernel = kernel_fn(x0, model) if kernel_fn is not None else None
        drv = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), n, dim, kernel=kernel,
            config=ShardedSVGDConfig(fused_phi=True, fused_pallas=flag),
        )
        assert drv._fused_pallas is flag, (name, flag, drv._fused_pallas)
        state = drv.init_state(x0.copy())
        if flag:
            mosaic_in_hlo = _has_mosaic_call(drv._step_full, state)
        state = drv.run_state(state, steps)
        outs[flag] = np.asarray(jax.device_get(state["coords"]))
    dmean, dcov = _moment_diff(outs[True], outs[False])
    ok = bool(
        np.isfinite(outs[True]).all()
        and dmean < 5e-3 and dcov < 2e-2 and mosaic_in_hlo
    )
    _emit({
        "case": name, "n": n, "steps": steps,
        "moment_diff_vs_xla": {"mean": dmean, "cov": dcov},
        "mosaic_custom_call_in_hlo": bool(mosaic_in_hlo), "ok": ok,
    })
    return ok


def run_sym_case(name, kernel_fn=None, n=4096, dim=2, steps=20):
    """The symmetric distributed sweep (fused_sym): global triangle pair
    list split across devices + accumulator psum vs the cross sweep —
    both Mosaic, trajectory-compared, custom-call asserted. ``kernel_fn``
    exercises the composed (multi-term) variant."""
    rng = np.random.default_rng(0)
    x0 = (rng.normal(size=(n, dim)) * 2 + 1.5).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    outs = {}
    mosaic_in_hlo = None
    for sym in (True, False):
        kernel = kernel_fn(x0, model) if kernel_fn is not None else None
        drv = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), n, dim, kernel=kernel,
            config=ShardedSVGDConfig(fused_phi=True, fused_sym=sym),
        )
        assert drv._fused_sym is sym, (sym, drv._fused_sym)
        state = drv.init_state(x0.copy())
        if sym:
            mosaic_in_hlo = _has_mosaic_call(drv._step_full, state)
        state = drv.run_state(state, steps)
        outs[sym] = np.asarray(jax.device_get(state["coords"]))
    dmean, dcov = _moment_diff(outs[True], outs[False])
    ok = bool(
        np.isfinite(outs[True]).all()
        and dmean < 5e-3 and dcov < 2e-2 and mosaic_in_hlo
    )
    _emit({
        "case": name, "n": n, "steps": steps,
        "moment_diff_vs_cross": {"mean": dmean, "cov": dcov},
        "mosaic_custom_call_in_hlo": bool(mosaic_in_hlo), "ok": ok,
    })
    return ok


def run_driver_mesh_case(n=4096, dim=2, steps=20):
    """SVGDOptions.mesh keeps the Mosaic sweep: phi_impl='auto' on a TPU
    mesh selects 'fused_pallas' (internal shard_map wrapper), the compiled
    program carries the Mosaic custom-call, and the trajectory matches the
    no-mesh Mosaic driver."""
    from svgdcpp_tpu.parallel import make_particle_mesh

    rng = np.random.default_rng(0)
    x0 = (rng.normal(size=(n, dim)) * 2 + 1.5).astype(np.float32)
    outs = {}
    impls = {}
    mosaic_in_hlo = None
    for with_mesh in (True, False):
        model = sv.MultivariateNormal(
            np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
        )
        kernel = sv.GaussianRBFKernel(x0, sv.ScaleMethod.MEDIAN, model)
        drv = sv.SVGD(
            sv.SVGDOptions(
                dimension=dim, num_iterations=steps,
                coordinate_matrix=x0.copy(), kernel=kernel, model=model,
                optimizer=sv.AdaGrad(dim, n, 0.1),
                mesh=make_particle_mesh() if with_mesh else None,
            )
        )
        drv.initialize()
        impls[with_mesh] = drv._phi_impl
        if with_mesh:
            mosaic_in_hlo = _has_mosaic_call(drv._jit_step, drv.make_state())
        outs[with_mesh] = np.asarray(drv.run())
    # Same kernel both sides on a 1-device mesh: bitwise-equality expected,
    # but allow fp slack from layout-sensitive reductions.
    rel = np.abs(outs[True] - outs[False]).max() / (
        np.abs(outs[False]).max() + 1e-30
    )
    ok = bool(
        np.isfinite(outs[True]).all()
        and impls[True] == "fused_pallas"
        and impls[False] == "fused_pallas"
        and mosaic_in_hlo
        and rel < 5e-3
    )
    _emit({
        "case": "driver_gspmd_mesh", "n": n, "steps": steps,
        "phi_impl_mesh": impls[True], "phi_impl_no_mesh": impls[False],
        "max_rel_diff_vs_no_mesh": float(rel),
        "mosaic_custom_call_in_hlo": bool(mosaic_in_hlo), "ok": ok,
    })
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the JSON lines here")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()

    ok = run_case("rbf_median_builtin", None)
    ok &= run_case(
        "composed_two_term",
        lambda x0, model: sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.MEDIAN, model
        ) + sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.CONSTANT,
            constant_scale=0.1 * np.eye(x0.shape[1], dtype=np.float32),
        ),
    )
    ok &= run_sym_case("fused_sym_vs_cross")
    ok &= run_sym_case(
        "fused_sym_vs_cross_composed",
        lambda x0, model: sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.MEDIAN, model
        ) + sv.GaussianRBFKernel(
            x0, sv.ScaleMethod.CONSTANT,
            constant_scale=0.1 * np.eye(x0.shape[1], dtype=np.float32),
        ),
    )
    ok &= run_driver_mesh_case()
    if args.out:
        Path(args.out).write_text(
            "\n".join(json.dumps(r) for r in RESULTS) + "\n"
        )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
