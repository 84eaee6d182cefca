#!/usr/bin/env python3
"""Adjudicate per-gate wall-clock spikes between two bench artifacts using
the load-INVARIANT telemetry (executor cpuMs + shuffle bytes) added in
round 12.

Usage: python3 tools/adjudicate.py BENCH_local_rNN.json BENCH_local_rMM.json
       (older first, newer second)

Verdict per gate with wall ratio >= THRESH and absolute delta >= MIN_ABS:
  - LOAD  : cpuMs and shuffle bytes within band of the older run -> the
            spike is external machine load by construction.
  - PLAN  : cpuMs or shuffle volume moved with the wall -> a real plan /
            code change; investigate.
  - NO-TELEMETRY: one side lacks cpu/shuffle fields (pre-round-12
            artifact) -> fall back to the BenchAB min-of-4 protocol.

Shuffle bytes are deterministic for a fixed plan+data (identical across
all four BenchAB passes in every observed gate), so SHUF_BAND is tight;
cpuMs varies with JIT/GC, so CPU_BAND is loose and only large movements
count.
"""
import json
import sys

THRESH = 2.0       # wall ratio considered a spike
MIN_ABS = 1.0      # seconds; ignore sub-second jitter
CPU_BAND = 1.8     # cpuMs ratio beyond which we call it a plan change
SHUF_BAND = 1.2    # shuffle-bytes ratio beyond which we call it a plan change


def load(path):
    with open(path) as f:
        d = json.loads(f.read())
    return d.get("queries", {}), d.get("telemetry", {})


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    q0, t0 = load(sys.argv[1])
    q1, t1 = load(sys.argv[2])
    spikes = []
    for g, w1 in sorted(q1.items()):
        w0 = q0.get(g)
        if w0 is None or w0 <= 0 or w1 <= 0:
            continue
        if w1 / w0 >= THRESH and w1 - w0 >= MIN_ABS:
            spikes.append((g, w0, w1))
    if not spikes:
        print(f"no spikes (ratio>={THRESH}, abs>={MIN_ABS}s) between "
              f"{sys.argv[1]} and {sys.argv[2]}")
        return
    print(f"{'gate':32s} {'wall':>14s} {'cpuMs':>16s} {'shufReadB':>22s}  verdict")
    for g, w0, w1 in spikes:
        a, b = t0.get(g, {}), t1.get(g, {})
        if "cpuMs" not in a or "cpuMs" not in b:
            print(f"{g:32s} {w0:6.2f}->{w1:6.2f} {'':>16s} {'':>22s}  NO-TELEMETRY (use BenchAB)")
            continue
        cpu_r = (b["cpuMs"] + 1) / (a["cpuMs"] + 1)
        shuf_r = (b.get("shufReadB", 0) + 1) / (a.get("shufReadB", 0) + 1)
        plan = cpu_r > CPU_BAND or shuf_r > SHUF_BAND or shuf_r < 1 / SHUF_BAND
        verdict = "PLAN (cpu/shuffle moved)" if plan else "LOAD (cpu+shuffle at band)"
        print(f"{g:32s} {w0:6.2f}->{w1:6.2f} "
              f"{a['cpuMs']:>7d}->{b['cpuMs']:<7d} "
              f"{a.get('shufReadB', 0):>10d}->{b.get('shufReadB', 0):<10d}  {verdict}")


if __name__ == "__main__":
    main()
