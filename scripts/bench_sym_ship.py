"""A/B the shipped sym (triangle) Mosaic sweeps vs the square sweeps on TPU.

Per shape: 400 sweeps chained in one lax.scan dispatch (tiny data dependency
defeats hoisting), one warm dispatch, host-transfer-synced timing.

    timeout 1200 python scripts/bench_sym_ship.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from svgdcpp_tpu.ops.pallas_phi import (
    phi_rbf_fused_pallas,
    phi_rbf_terms_fused_pallas,
)


def scan_time(run_fn, coords, iters=400):
    def body(x, _):
        phi, cnt = run_fn(x)
        return x + 1e-30 * phi, cnt[0]

    @jax.jit
    def prog(x):
        return jax.lax.scan(body, x, None, length=iters)

    np.asarray(prog(coords)[0])  # compile+warm
    t0 = time.perf_counter()
    out = prog(coords)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)

    print("== single-term (flagship family) ==", flush=True)
    for n in (1024, 2048, 4096, 10240, 20480):
        x = jnp.asarray(rng.normal(size=(n, 2)) * 2, jnp.float32)
        s = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
        g = jnp.float32(np.log(n) / 4.0)
        for sym in (False, True):
            run = lambda xx, sym=sym, g=g: phi_rbf_fused_pallas(
                xx, s, g, thr, sym=sym)
            try:
                ms = scan_time(run, x)
                rate = n / ms * 1000.0
                print(f"n={n:6d} sym={int(sym)}: {ms:7.4f} ms/sweep "
                      f"({rate/1e6:7.2f}M part-sweeps/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:6d} sym={int(sym)}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    print("== multi-term m=11 T=2 (hier family) ==", flush=True)
    for n in (4096, 10240):
        x = jnp.asarray(rng.normal(size=(n, 11)) * 2, jnp.float32)
        s = jnp.asarray(rng.normal(size=(n, 11)), jnp.float32)
        gs = (jnp.float32(np.log(n) / 8.0), jnp.float32(np.log(n) / 2.0))
        ss = (1.0, 1.0)
        for sym in (False, True):
            run = lambda xx, sym=sym: phi_rbf_terms_fused_pallas(
                xx, s, gs, ss, thr, sym=sym)
            try:
                ms = scan_time(run, x)
                rate = n / ms * 1000.0
                print(f"n={n:6d} sym={int(sym)}: {ms:7.4f} ms/sweep "
                      f"({rate/1e6:7.2f}M part-sweeps/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:6d} sym={int(sym)}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
