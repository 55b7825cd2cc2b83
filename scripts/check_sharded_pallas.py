"""Prove the sharded Mosaic fused sweep on real TPU (1-device mesh).

ShardedSVGDConfig.fused_pallas auto-selects the per-device Mosaic kernel on
TPU backends; the simulated CPU mesh cannot exercise it (the pallas
interpreter's grid loop is VMA-untyped inside shard_map), so this script
runs the compiled path on a Mesh over the real chip — shard_map + check_vma
+ Mosaic — and checks trajectory equality against the XLA fused sweep, for
both the built-in RBF and a composed 2-term kernel. Prints one JSON line
per case.

Run:  timeout 600 python scripts/check_sharded_pallas.py
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import svgdcpp_tpu as sv
from svgdcpp_tpu.parallel.sharded import ShardedSVGD, ShardedSVGDConfig


def run_case(name, kernel_fn, n=4096, dim=2, steps=20):
    rng = np.random.default_rng(0)
    x0 = (rng.normal(size=(n, dim)) * 2 + 1.5).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )
    outs = {}
    for flag in (True, False):
        kernel = kernel_fn(x0, model) if kernel_fn is not None else None
        drv = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), n, dim, kernel=kernel,
            config=ShardedSVGDConfig(fused_phi=True, fused_pallas=flag),
        )
        assert drv._fused_pallas is flag, (name, flag, drv._fused_pallas)
        state = drv.init_state(x0.copy())
        state = drv.run_state(state, steps)
        outs[flag] = np.asarray(jax.device_get(state["coords"]))
    rel = np.abs(outs[True] - outs[False]).max() / (
        np.abs(outs[False]).max() + 1e-30
    )
    ok = bool(np.isfinite(outs[True]).all() and rel < 5e-3)
    print(json.dumps({
        "case": name, "n": n, "steps": steps,
        "max_rel_diff_vs_xla": float(rel), "ok": ok,
    }), flush=True)
    return ok


def main():
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
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
