"""Trace ship vs symmetric sweep kernels and report device-side op totals.

    timeout 900 python scripts/trace_sym_probe.py [tile=512] [variant=tsc_kt]
"""

import gzip
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

import jax
import jax.numpy as jnp

import probe_sym_kernel as pk  # noqa: E402


def make_progs(tile, variant):
    from svgdcpp_tpu.ops.pallas_phi import _phi_rbf_fused_pallas_cross_impl

    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(pk.N, pk.M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(pk.N, pk.M)), jnp.float32)
    gamma = jnp.float32(np.log(pk.N) / 4.0)
    thr = jnp.asarray(np.linspace(0.5, 30.0, pk.T_EDGES), jnp.float32)

    def ship_run(x):
        return _phi_rbf_fused_pallas_cross_impl(
            x, x, scores, gamma, thr, pk.T_EDGES, 512, 2048, False
        )

    def ship_narrow(x):
        return _phi_rbf_fused_pallas_cross_impl(
            x, x, scores, gamma, thr, pk.T_EDGES, 512, 512, False
        )

    fn, args, _, _ = pk.build_sym(pk.T_EDGES, tile, variant)
    bi, bj, g, thrr = args[:4]

    def sym_run(x):
        b = jnp.concatenate([scores, x, jnp.ones((pk.N, 1), jnp.float32)], 1)
        e1v = b.T if variant == "tsc_kt" else b
        return fn(bi, bj, g, thrr, x, x.T, e1v, b.T)

    ufn, uargs, _, _ = pk.build_rect_uniform(pk.T_EDGES, 512, 2048)
    ubi, ubj, ug, uthr = uargs[:4]

    def uni_run(x):
        b = jnp.concatenate([scores, x, jnp.ones((pk.N, 1), jnp.float32)], 1)
        return ufn(ubi, ubj, ug, uthr, x, x.T, b.T)

    def chain(run):
        def body(x, _):
            acc, cnt = run(x)
            return x + 1e-30 * acc[:, : pk.M], cnt[0]

        @jax.jit
        def prog(x):
            return jax.lax.scan(body, x, None, length=50)

        return prog

    return (chain(ship_run), chain(ship_narrow), chain(sym_run),
            chain(uni_run), coords)


def main(tile="512", variant="tsc_kt"):
    assert jax.default_backend() == "tpu"
    ship, narrow, sym, uni, coords = make_progs(int(tile), variant)
    for p in (ship, narrow, sym, uni):
        np.asarray(p(coords)[0])  # compile
    # Trace each program into its OWN directory so identically-named fusions
    # in ship vs narrow vs sym are never conflated in the totals.
    for label, prog in (("ship", ship), ("narrow", narrow), ("sym", sym),
                        ("uni", uni)):
        out = Path(f"/tmp/trace_sym_{label}")
        with jax.profiler.trace(str(out)):
            np.asarray(prog(coords)[0])
        tr = sorted(out.rglob("*.trace.json.gz"))[-1]
        events = json.loads(gzip.decompress(tr.read_bytes()))["traceEvents"]
        totals = {}
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                key = (e.get("pid"), e.get("name", ""))
                totals[key] = totals.get(key, 0) + e["dur"]
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:12]
        print(f"--- {label} ---")
        for (pid, name), dur in top:
            print(f"{dur / 1e3:9.3f} ms  pid={pid}  {name[:100]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
