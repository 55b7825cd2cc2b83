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
        assert bool(drv._fused_sym) == sym, (sym, drv._fused_sym)
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


def run_panel_sym_case(n=262144, dim=2, steps=5):
    """Round 5: past the full-width accumulator budget the engine
    auto-resolves fused_sym='panel' (the chunked panel-rotated triangle)
    instead of falling back to the cross sweep; trajectory-compared
    against the cross engine on the 1-device mesh, custom-call asserted."""
    rng = np.random.default_rng(0)
    x0 = (rng.normal(size=(n, dim)) * 2 + 1.5).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    outs = {}
    mosaic_in_hlo = None
    mode = None
    for sym in (None, False):
        drv = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), n, dim,
            config=ShardedSVGDConfig(fused_phi=True, fused_sym=sym),
        )
        if sym is None:
            mode = drv._fused_sym
        state = drv.init_state(x0.copy())
        if sym is None:
            mosaic_in_hlo = _has_mosaic_call(drv._step_full, state)
        state = drv.run_state(state, steps)
        outs[sym] = np.asarray(jax.device_get(state["coords"]))
    dmean, dcov = _moment_diff(outs[None], outs[False])
    ok = bool(
        np.isfinite(outs[None]).all()
        and mode == "panel"
        and dmean < 5e-3 and dcov < 2e-2 and mosaic_in_hlo
    )
    _emit({
        "case": "fused_sym_panel_vs_cross", "n": n, "steps": steps,
        "resolved_mode": str(mode),
        "moment_diff_vs_cross": {"mean": dmean, "cov": dcov},
        "mosaic_custom_call_in_hlo": bool(mosaic_in_hlo), "ok": ok,
    })
    return ok


def run_panel_chunk_case(n=262144, dim=2, chunks=8):
    """Round 5 decomposition proof ON CHIP: the D=8 chunked panel plan's
    per-device grids (the exact rotating-window regions a real 8-chip
    mesh would compile) each run on the single chip; summed accumulators
    + band epilogue must match the single-chip auto (panel) sweep."""
    import jax.numpy as jnp

    from svgdcpp_tpu.ops.pallas_phi import (
        phi_rbf_fused_pallas,
        phi_rbf_fused_pallas_sympanel_sharded,
        phi_rbf_fused_sym_finish,
        sym_panel_sharded_plan,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, dim)) * 2 + 1.5, jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, dim)), jnp.float32)
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)
    g = jnp.float32(np.log(n) / 4.0)

    plan = sym_panel_sharded_plan(n, dim, chunks)
    assert plan is not None
    pi, pj, nb, w, n_pad, per = plan
    acc = lanes = None
    for c in range(chunks):
        a, l = phi_rbf_fused_pallas_sympanel_sharded(
            x, s, g, thr, jnp.asarray(pi[c * per:(c + 1) * per]),
            jnp.asarray(pj[c * per:(c + 1) * per]), nb=nb, w=w,
            num_thresholds=3,
        )
        acc = a if acc is None else acc + a
        lanes = l if lanes is None else lanes + l
    counts = 2.0 * jnp.sum(lanes, axis=1) - jnp.float32(n)
    center = jnp.mean(x, axis=0)
    phi = phi_rbf_fused_sym_finish(acc[:, :n], s, x, center, g, n)

    ref_phi, ref_cnt = phi_rbf_fused_pallas(x, s, g, thr)
    rel = float(
        np.abs(np.asarray(phi) - np.asarray(ref_phi)).max()
        / (np.abs(np.asarray(ref_phi)).max() + 1e-30)
    )
    # chunked lane sums reorder f32 additions; per-lane totals at this n
    # sit just above the 2^24 exact-integer range (documented bound)
    cdiff = float(np.abs(np.asarray(counts) - np.asarray(ref_cnt)).max())
    ok = bool(rel < 1e-3 and cdiff <= 32)
    _emit({
        "case": "panel_chunked_decomposition_chip", "n": n,
        "chunks": chunks, "per_chunk_panels": int(per),
        "nb": int(nb), "w": int(w),
        "max_rel_phi_vs_singlechip_panel": rel,
        "max_count_diff": cdiff, "ok": ok,
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
    ok &= run_panel_sym_case()
    ok &= run_panel_chunk_case()
    if args.out:
        Path(args.out).write_text(
            "\n".join(json.dumps(r) for r in RESULTS) + "\n"
        )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
