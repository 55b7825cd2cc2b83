"""On-chip parity matrix for every fused Mosaic kernel family.

The round-3 lesson, institutionalized: interpret-mode tests are f32-exact
and CANNOT see compiled-MXU precision bugs (TPU DEFAULT matmul precision
is bf16), so every compiled kernel is compared against its XLA twin ON
THE CHIP. This script runs the full matrix — square cross, full-width
triangle, panel-rotated triangle (single- and multi-term), the clamped
large-n multi-term cross, and the anisotropic composed sweep — and
writes one JSON artifact (default KERNELS_r{N}.json) with per-kernel
timing and error stats.

Error semantics: the oracles are the XLA fused implementations
(ops/phi.py), which share the reference algorithm's semantics
(SVGD.hpp:445-449 phi; GaussianRBFKernel.hpp:224-253 median counts) and
run their sq dots at HIGHEST precision. Mosaic kernels accumulate their
contraction dots at the MXU's bf16 default, so the expected error class
is ~1e-3..1e-2 max / ~1e-3 RMS relative (docs/perf.md "Numerics");
counts may differ by threshold-tie noise only.

    python scripts/check_kernels_chip.py [out.json]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _rel_stats(apx, ref):
    d = np.abs(np.asarray(apx) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    return {
        "max_rel_err": float(d.max() / scale),
        "rms_rel_err": float(np.sqrt((d**2).mean()) / scale),
    }


def _time_sweep(fn, iters):
    np.asarray(fn()[0])  # compile + warm (host sync; block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters


def main(out_path=None):
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "run on the real chip"
    from svgdcpp_tpu.ops import pallas_phi as pp
    from svgdcpp_tpu.ops import phi as xphi

    rng = np.random.default_rng(0)
    results = []

    def record(name, config, sweep_ms, stats, cnt_diff=None):
        row = {"kernel": name, "config": config,
               "ms_per_sweep": round(sweep_ms * 1e3, 3), **stats}
        if cnt_diff is not None:
            row["count_max_abs_diff"] = float(cnt_diff)
        results.append(row)
        print(f"{name:34s} {config:28s} {row['ms_per_sweep']:>9.3f} ms  "
              f"max {row['max_rel_err']:.2e} rms {row['rms_rel_err']:.2e}"
              + (f"  cnt {row.get('count_max_abs_diff')}" if cnt_diff
                 is not None else ""), flush=True)

    def data(n, m, spread=2.0):
        x = jnp.asarray((rng.normal(size=(n, m)) * spread).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
        return x, s

    # ---- single-term family (flagship shape + large-n panels) ----
    n, m = 10240, 2
    x, s = data(n, m)
    g = jnp.float32(5.0)
    thr = jnp.asarray([0.05, 0.2], jnp.float32)
    ref_phi, ref_cnt = xphi.phi_rbf_fused_counts(x, s, g, thr)
    ref_phi, ref_cnt = np.asarray(ref_phi), np.asarray(ref_cnt)

    for name, mode in [("fused_pallas square", False),
                       ("fused_pallas full-sym", True)]:
        fn = lambda _m=mode: pp.phi_rbf_fused_pallas(x, s, g, thr, sym=_m)
        dt = _time_sweep(fn, 30)
        phi, cnt = fn()
        record(name, f"n={n} m={m}", dt, _rel_stats(phi, ref_phi),
               np.abs(np.asarray(cnt) - ref_cnt).max())

    # panel vs the on-chip square sweep (an XLA oracle at 262k is
    # impractically slow; the square Mosaic sweep is itself oracle-checked
    # above at n=10240)
    n_big = 262144
    xb, sb = data(n_big, 2)
    sq_fn = lambda: pp.phi_rbf_fused_pallas(xb, sb, g, thr, sym=False)
    pn_fn = lambda: pp.phi_rbf_fused_pallas(xb, sb, g, thr, sym="panel")
    dt_sq = _time_sweep(sq_fn, 5)
    dt_pn = _time_sweep(pn_fn, 5)
    phi_sq, cnt_sq = sq_fn()
    phi_pn, cnt_pn = pn_fn()
    record("fused_pallas panel (vs square)", f"n={n_big} m=2", dt_pn,
           _rel_stats(phi_pn, np.asarray(phi_sq)),
           np.abs(np.asarray(cnt_pn) - np.asarray(cnt_sq)).max())
    results[-1]["square_ms_per_sweep"] = round(dt_sq * 1e3 * 1e3, 3) / 1e3

    # large-m panel route (round-5 audit): past the full-width budget a
    # single-term m>4 shape auto-routes to the panel kernel with a
    # (2m+1)-row rotating window — oracle-checked here directly (O(n^2 m)
    # XLA at n=16k is still tractable on chip)
    n_lm, m_lm = 16384, 50
    xl, sl = data(n_lm, m_lm, spread=1.0)
    gl = jnp.float32(np.log(n_lm) / (2 * m_lm))
    thr_lm = jnp.asarray([5.0, 40.0], jnp.float32)
    ref_phi_lm, ref_cnt_lm = xphi.phi_rbf_fused_counts(xl, sl, gl, thr_lm)
    fn = lambda: pp.phi_rbf_fused_pallas(xl, sl, gl, thr_lm)
    dt = _time_sweep(fn, 5)
    phi, cnt = fn()
    record("fused_pallas panel large-m (vs XLA)", f"n={n_lm} m={m_lm}", dt,
           _rel_stats(phi, np.asarray(ref_phi_lm)),
           np.abs(np.asarray(cnt) - np.asarray(ref_cnt_lm)).max())

    # ---- multi-term family ----
    n, m = 10240, 11
    x, s = data(n, m)
    gs = [jnp.float32(0.3), jnp.float32(0.08)]
    sg = [1.0, 1.0]
    thr2 = jnp.asarray([4.0, 9.0], jnp.float32)
    ref_phi, ref_cnt = xphi.phi_rbf_terms_fused_counts(x, s, gs, sg, thr2)
    ref_phi, ref_cnt = np.asarray(ref_phi), np.asarray(ref_cnt)
    fn = lambda: pp.phi_rbf_terms_fused_pallas(x, s, gs, sg, thr2, sym=True)
    dt = _time_sweep(fn, 20)
    phi, cnt = fn()
    record("fused_terms_pallas full-sym", f"n={n} m={m} T=2", dt,
           _rel_stats(phi, ref_phi),
           np.abs(np.asarray(cnt) - ref_cnt).max())

    n_big = 100_000
    xb, sb = data(n_big, 11)
    sq_fn = lambda: pp.phi_rbf_terms_fused_pallas(xb, sb, gs, sg, thr2,
                                                  sym=False)
    pn_fn = lambda: pp.phi_rbf_terms_fused_pallas(xb, sb, gs, sg, thr2,
                                                  sym="panel")
    dt_sq = _time_sweep(sq_fn, 4)
    dt_pn = _time_sweep(pn_fn, 4)
    phi_sq, cnt_sq = sq_fn()
    phi_pn, cnt_pn = pn_fn()
    record("fused_terms_pallas panel (vs square)", f"n={n_big} m=11 T=2",
           dt_pn, _rel_stats(phi_pn, np.asarray(phi_sq)),
           np.abs(np.asarray(cnt_pn) - np.asarray(cnt_sq)).max())
    results[-1]["square_ms_per_sweep"] = round(dt_sq * 1e3 * 1e3, 3) / 1e3

    # clamped large-n diff-branch terms cross (the latent round-3 OOM
    # region; vs the tile-streamed XLA oracle, single shot)
    n_big = 300_000
    xb, sb = data(n_big, 2, spread=0.5)
    gs2 = [jnp.float32(5.0), jnp.float32(1.0)]
    fn = lambda: pp.phi_rbf_terms_fused_pallas(xb, sb, gs2, sg, thr, sym=False)
    dt = _time_sweep(fn, 3)
    phi, cnt = fn()
    ref = np.asarray(
        xphi.phi_rbf_cross(xb, xb, sb, 5.0 * jnp.eye(2), psd=True)
        + xphi.phi_rbf_cross(xb, xb, sb, 1.0 * jnp.eye(2), psd=True)
    )
    record("terms cross (tile_j clamp)", f"n={n_big} m=2 T=2", dt,
           _rel_stats(phi, ref))

    # ---- anisotropic composed sweep ----
    n, m = 10240, 11
    x, s = data(n, m)
    a = rng.normal(size=(m, m)).astype(np.float32) * 0.05
    p_an = jnp.asarray(a @ a.T + 0.1 * np.eye(m, dtype=np.float32))
    ref = np.asarray(
        xphi.phi_rbf_cross(x, x, s, 0.7 * jnp.eye(m), psd=True)
        + xphi.phi_rbf_cross(x, x, s, p_an, psd=True)
    )
    fn = lambda: pp.phi_rbf_aniso_terms_fused_pallas(
        x, s, [jnp.float32(0.7)], [1.0], [p_an], [1.0], thr2)
    dt = _time_sweep(fn, 20)
    phi, _ = fn()
    record("fused_aniso_terms_pallas", f"n={n} m={m} 1 iso + 1 aniso", dt,
           _rel_stats(phi, ref))

    out = Path(out_path) if out_path else ROOT / "KERNELS_r04.json"
    out.write_text(json.dumps({
        "oracle": "XLA fused twins (HIGHEST-sq), on-chip",
        "timing_note": "ms_per_sweep includes ~1 ms per-dispatch tunnel "
        "overhead (single calls, no scan); device-side sweep times are in "
        "docs/perf.md",
        "results": results,
    }, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
