"""Summarize a jax.profiler trace directory: device-side op totals.

    python scripts/summarize_trace.py docs/traces/mvn10k_r4 [steps=50]

Prints the top device ops (aggregated over the trace) and ms/step for the
dominant program; appends the breakdown to the directory's SUMMARY.txt.
"""

import gzip
import json
import sys
from pathlib import Path


def summarize(trace_dir, steps=50, top=10):
    trace_dir = Path(trace_dir)
    files = sorted(trace_dir.rglob("*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    events = json.loads(gzip.decompress(files[-1].read_bytes()))["traceEvents"]
    # Device pids: trace-viewer tags device lanes with process_name metadata;
    # the tunneled chip shows up as a small pid with XLA op names. Heuristic:
    # aggregate X events whose name does not look like host-side python.
    totals = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "")
            if name.startswith("$") or "asarray" in name or ".py" in name:
                continue  # host-side python frames
            key = (e.get("pid"), name)
            totals[key] = totals.get(key, 0) + e["dur"]
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    lines = [f"Device-side op totals over {steps} steps (top {top}):"]
    for (pid, name), dur in rows:
        lines.append(
            f"  {dur / 1e3:9.3f} ms total  {dur / 1e3 / steps:7.4f} ms/step"
            f"  pid={pid}  {name[:80]}"
        )
    text = "\n".join(lines) + "\n"
    print(text)
    summary = trace_dir / "SUMMARY.txt"
    if summary.exists():
        summary.write_text(summary.read_text() + "\n" + text)
    else:
        summary.write_text(text)


if __name__ == "__main__":
    summarize(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 50,
    )
