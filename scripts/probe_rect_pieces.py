"""Piece-cost isolation for the rect-triangle symmetric sweep.

Builds stripped variants of the 512x2048 rect kernel (INTENTIONALLY WRONG
results — cost probes only) and traces them back-to-back; prints device-side
per-sweep times from the trace JSON.

    timeout 900 python scripts/probe_rect_pieces.py
"""

import functools
import gzip
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, M, T_EDGES = 10240, 2, 3
RI, CJ = 512, 2048
LOG2E = float(np.log2(np.e))
BW = 2 * M + 1


def kern(flags, bi_ref, bj_ref, g_ref, thr_ref, xi_ref, xjt_ref, b1_ref,
         bti_ref, acc_out, cnt_out, acc_sc, cnt_sc):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bi = bi_ref[t]
    bj = bj_ref[t]

    @pl.when(t == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        cnt_sc[:] = jnp.zeros_like(cnt_sc)

    sq = None
    for k in range(M):
        d = xi_ref[:, k : k + 1] - xjt_ref[k : k + 1, :]
        sq = d * d if sq is None else sq + d * d
    k_tile = jnp.exp2(-g_ref[0, 0] * sq)

    if "mask" in flags:
        gi = bi * RI + jax.lax.broadcasted_iota(jnp.int32, (RI, CJ), 0)
        gj = bj * CJ + jax.lax.broadcasted_iota(jnp.int32, (RI, CJ), 1)
        k_up = k_tile * (gj >= gi).astype(jnp.float32)
    else:
        k_up = k_tile

    r1t = jax.lax.dot_general(
        b1_ref[:], k_up, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if "dyn" in flags:
        acc_sc[:, pl.ds(bi * RI, RI)] += r1t
    else:
        acc_sc[:, 0:RI] += r1t

    if "r2" in flags:
        r2t = jnp.dot(bti_ref[:], k_tile, preferred_element_type=jnp.float32)
        if "dyn" in flags:
            acc_sc[:, pl.ds(bj * CJ, CJ)] += r2t
        else:
            acc_sc[:, 0:CJ] += r2t

    if "cnt" in flags:
        for e in range(T_EDGES):
            cnt_sc[e, :] += 2.0 * jnp.sum(
                (sq <= thr_ref[0, e]).astype(jnp.float32), axis=0)

    @pl.when(t == nt - 1)
    def _():
        acc_out[:] = acc_sc[:]
        cnt_out[:] = cnt_sc[:]


def build(flags, tri=True):
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.normal(size=(N, M)) * 2, jnp.float32)
    scores = jnp.asarray(rng.normal(size=(N, M)), jnp.float32)
    gamma = jnp.float32(np.log(N) / 4.0 * LOG2E)
    thr = jnp.asarray(np.linspace(0.5, 30.0, T_EDGES), jnp.float32).reshape(1, -1)
    b = jnp.concatenate([scores, coords, jnp.ones((N, 1), jnp.float32)], 1)
    bt = b.T
    nbi, nbj = N // RI, N // CJ
    r = CJ // RI
    if tri:
        pairs = [(i, J) for i in range(nbi) for J in range(i // r, nbj)]
    else:
        pairs = [(i, J) for i in range(nbi) for J in range(nbj)]
    bi = jnp.asarray([p[0] for p in pairs], jnp.int32)
    bj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    vm = pltpu.VMEM
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, bi, bj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T_EDGES), lambda t, bi, bj: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((RI, M), lambda t, bi, bj: (bi[t], 0),
                         memory_space=vm),
            pl.BlockSpec((M, CJ), lambda t, bi, bj: (0, bj[t]),
                         memory_space=vm),
            pl.BlockSpec((BW, CJ), lambda t, bi, bj: (0, bj[t]),
                         memory_space=vm),
            pl.BlockSpec((BW, RI), lambda t, bi, bj: (0, bi[t]),
                         memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((BW, N), lambda t, bi, bj: (0, 0), memory_space=vm),
            pl.BlockSpec((T_EDGES, CJ), lambda t, bi, bj: (0, 0),
                         memory_space=vm),
        ),
        scratch_shapes=[pltpu.VMEM((BW, N), jnp.float32),
                        pltpu.VMEM((T_EDGES, CJ), jnp.float32)],
    )
    f = pl.pallas_call(
        functools.partial(kern, flags), grid_spec=gs,
        out_shape=(jax.ShapeDtypeStruct((BW, N), jnp.float32),
                   jax.ShapeDtypeStruct((T_EDGES, CJ), jnp.float32)))
    g = gamma.reshape(1, 1)

    def body(x, _):
        acc, cnt = f(bi, bj, g, thr, x, x.T, bt, bt)
        return x + 1e-30 * acc[:M, :].T, cnt[0, 0]

    def prog(x):
        return jax.lax.scan(body, x, None, length=50)

    prog.__name__ = "prog_" + "_".join(sorted(flags)) + ("_tri" if tri else "_full")
    return jax.jit(prog), coords


def main():
    assert jax.default_backend() == "tpu"
    cases = [
        (frozenset(["dyn", "r2", "cnt"]), True),   # full rect-tri (unmasked)
        (frozenset(["dyn", "r2", "cnt", "mask"]), True),  # + mask everywhere
        (frozenset(["dyn", "cnt"]), True),          # no second dot
        (frozenset(["cnt"]), True),                 # fixed offsets, no r2
        (frozenset(["dyn", "r2"]), True),           # no counts
        (frozenset(["dyn", "r2", "cnt"]), False),   # full grid (100 tiles)
    ]
    progs = []
    for flags, tri in cases:
        p, coords = build(flags, tri)
        np.asarray(p(coords)[0])  # compile
        progs.append((p, flags, tri))
    out = Path("/tmp/trace_rect_pieces")
    with jax.profiler.trace(str(out)):
        for p, _, _ in progs:
            np.asarray(p(coords)[0])
    tr = sorted(out.rglob("*.trace.json.gz"))[-1]
    events = json.loads(gzip.decompress(tr.read_bytes()))["traceEvents"]
    totals = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e.get("name", "").startswith("jit_prog"):
            totals[e["name"]] = totals.get(e["name"], 0) + e["dur"]
    # order of jit_prog names is not stable; match by printing all
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"{dur / 50 / 1e3:7.3f} ms/sweep  {name}")
    # also print per-case wall fallback
    import time
    for p, flags, tri in progs:
        t0 = time.perf_counter()
        np.asarray(p(coords)[0])
        dt = (time.perf_counter() - t0) / 50 * 1e3
        print(f"wall {dt:7.3f} ms/sweep  {sorted(flags)} tri={tri}")


if __name__ == "__main__":
    main()
