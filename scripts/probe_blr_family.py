"""BLR-family (d=50) sweep measurements: bound rows + bf16 A/B at large m.

Round-4 verdict items 4: the d=50 roofline rows carried no bound, and the
predicted large-m `dot_dtype='bfloat16'` win was never measured. This
measures the shipped kernel (round-5 packed bf16x3 sq: TWO MXU passes at
3m = 150 depth vs three in round 4) against the one-pass bf16 opt-in at
the BLR shapes, and reports effective ops/pair for the bound table.

    timeout 1800 python scripts/probe_blr_family.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from svgdcpp_tpu.ops.pallas_phi import phi_rbf_fused_pallas
from svgdcpp_tpu.ops.phi import phi_rbf_fused_counts

M = 50
VPU_OPS_PER_S = 4e12


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
    thr = jnp.asarray([5.0, 40.0, 300.0], jnp.float32)

    for n, sym in ((1000, False), (2048, True), (4096, True)):
        x = jnp.asarray(rng.normal(size=(n, M)), jnp.float32)
        s = jnp.asarray(rng.normal(size=(n, M)), jnp.float32)
        g = jnp.float32(np.log(n) / (2 * M))

        phi_ref, counts_ref = phi_rbf_fused_counts(x, s, g, thr)
        phi_ref = np.asarray(phi_ref)
        scale = np.abs(phi_ref).max()
        pairs = n * n / (2.0 if sym else 1.0)

        for dd in ("float32", "bfloat16"):
            run = lambda xx, d=dd, sy=sym: phi_rbf_fused_pallas(
                xx, s, g, thr, sym=sy, dot_dtype=d)
            try:
                phi, counts = run(x)
                rel = np.abs(np.asarray(phi) - phi_ref).max() / scale
                cerr = np.abs(np.asarray(counts) - np.asarray(counts_ref)
                              ).max()
                ms = scan_time(run, x)
                ops = ms * 1e-3 * VPU_OPS_PER_S / pairs
                print(f"n={n:5d} sym={int(sym)} {dd:9s}: {ms:7.4f} ms "
                      f"({ops:5.1f} eff ops/pair)  rel={rel:.2e} "
                      f"cnt_err={cerr:.0f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:5d} sym={int(sym)} {dd:9s}: FAIL "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
