"""Aggregate a jax.profiler trace JSON (XLA Ops thread) with nesting
removed: computes SELF time per event (duration minus contained child
events on the same thread), then reports totals by hlo_category and the
top individual ops with their long_name shape signatures.

    python -m simplerecon_tpu.scripts.trace_agg <trace.json.gz> [nsteps]
"""

from __future__ import annotations

import collections
import gzip
import json
import re
import sys


def main():
    path = sys.argv[1]
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    with gzip.open(path) as f:
        t = json.load(f)

    evs = [e for e in t.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("tid") == 3
           and "hlo_category" in e.get("args", {})]
    evs.sort(key=lambda e: (e["ts"], -e["dur"]))

    # self time via a stack sweep (events are properly nested per tid)
    stack = []  # (end_ts, child_time_accum index)
    child_time = [0.0] * len(evs)
    order = []
    for idx, e in enumerate(evs):
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][0] - 1e-9:
            stack.pop()
        if stack:
            child_time[stack[-1][1]] += dur
        stack.append((ts + dur, idx))
        order.append(idx)

    by_cat = collections.defaultdict(float)
    by_op = collections.defaultdict(float)
    op_count = collections.Counter()
    op_example = {}
    total = 0.0
    for idx, e in enumerate(evs):
        self_ms = (e["dur"] - child_time[idx]) / 1e3
        args = e["args"]
        cat = args["hlo_category"]
        by_cat[cat] += self_ms
        total += self_ms
        ln = args.get("long_name", "")
        # strip the %name = prefix -> signature is shapes + op
        sig = re.sub(r"^%[\w.\-]+ = ", "", ln)
        sig = re.sub(r"%[\w.\-]+", "_", sig)[:140]
        key = (cat, sig)
        by_op[key] += self_ms
        op_count[key] += 1
        op_example[key] = ln[:200]

    print(f"total self-time {total:.2f} ms / {nsteps} steps "
          f"= {total / nsteps:.2f} ms/step\n")
    print("by hlo_category (self ms/step):")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v / nsteps:9.3f}")
    print("\ntop 45 op signatures (self ms/step, count/step):")
    for (cat, sig), v in sorted(by_op.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {v / nsteps:8.3f} ms x{op_count[(cat, sig)] // nsteps:3d} "
              f"[{cat}] {sig[:110]}")


if __name__ == "__main__":
    main()
