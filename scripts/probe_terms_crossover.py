"""Map the terms-family square/legacy-sym/direct-sym crossover on chip.

    timeout 1500 python scripts/probe_terms_crossover.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import svgdcpp_tpu.ops.pallas_phi as pp


def scan_time(run_fn, coords, iters=400):
    def body(x, _):
        phi, cnt = run_fn(x)
        return x + 1e-30 * phi, cnt[0]

    @jax.jit
    def prog(x):
        return jax.lax.scan(body, x, None, length=iters)

    np.asarray(prog(coords)[0])
    t0 = time.perf_counter()
    out = prog(coords)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    thr = jnp.asarray([0.5, 4.0, 30.0], jnp.float32)
    m = 11
    gs = (jnp.float32(0.3), jnp.float32(0.08))
    ss = (1.0, 1.0)

    for n in (2048, 4096, 6144, 8192, 10240, 20480):
        x = jnp.asarray(rng.normal(size=(n, m)) * 2, jnp.float32)
        s = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)

        def t_square():
            return scan_time(lambda xx: pp.phi_rbf_terms_fused_pallas(
                xx, s, gs, ss, thr, sym=False), x)

        def t_legacy():
            return scan_time(
                lambda xx: pp._phi_rbf_terms_fused_pallas_sym_impl(
                    xx, s, gs, ss, thr, 3, 512, 2048, False), x)

        def t_direct(tj):
            return scan_time(
                lambda xx: pp._phi_rbf_terms_fused_pallas_sym_direct_impl(
                    xx, s, gs, ss, thr, 3, 512, tj, False), x)

        row = [f"n={n:6d}"]
        for name, fn in (("square", t_square), ("legacy", t_legacy),
                         ("direct2048", lambda: t_direct(2048)),
                         ("direct1024", lambda: t_direct(1024))):
            try:
                row.append(f"{name}={fn():7.4f}")
            except Exception as e:  # noqa: BLE001
                row.append(f"{name}=FAIL({type(e).__name__})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
