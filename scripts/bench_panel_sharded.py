"""Steady-state step time: fused_sym='panel' vs cross on the 1-device mesh
(n past the full-width budget — the round-5 distributed-panel win).

    timeout 1800 python scripts/bench_panel_sharded.py [n]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import svgdcpp_tpu as sv
from svgdcpp_tpu.parallel.sharded import ShardedSVGD, ShardedSVGDConfig


def main():
    assert jax.default_backend() == "tpu"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    dim = 2
    rng = np.random.default_rng(0)
    x0 = (rng.normal(size=(n, dim)) * 2 + 1.5).astype(np.float32)
    model = sv.MultivariateNormal(
        np.zeros(dim, np.float32), np.eye(dim, dtype=np.float32)
    )

    for sym in (None, False):
        drv = ShardedSVGD(
            model, sv.AdaGrad(dim, n, 0.1), n, dim,
            config=ShardedSVGDConfig(fused_phi=True, fused_sym=sym),
        )
        st = drv.init_state(x0.copy())
        steps = 40
        # warm with the SAME step count: run_fn's scan length is a static
        # shape, so a different warm length would leave a fresh compile
        # inside the timed region (~6 s through the tunnel)
        st, _ = drv.run_fn(st, steps)
        np.asarray(st["coords"])
        t0 = time.perf_counter()
        st, _ = drv.run_fn(st, steps)
        np.asarray(st["coords"])
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"n={n} fused_sym={drv._fused_sym!r:8}: {dt:8.2f} ms/step "
              f"({n / dt * 1e3 / 1e6:6.2f}M updates/s)", flush=True)


if __name__ == "__main__":
    main()
