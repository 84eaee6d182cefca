#!/usr/bin/env python3
"""Board-to-board bench comparison on the load-invariant axes.

Usage: compare_boards.py <new_board.json> <old_board.json> [--top N]

Prints, for the COMMON gate set: wall/cpuMs/shuffle-read totals and
ratios, the per-gate shuffle-byte diff list (plan-movement candidates vs
LZ4 jitter), and the top wall movers both directions; for the new/removed
gate sets: their wall sums. Old boards can come from git history:

    git show <sha>:BENCH_local_r13.json > /tmp/old.json

This is the comparison every round-close section narrates — one command
instead of ad-hoc python. Wall is NOT the adjudication signal on a loaded
box (see adjudicate.py); shuffle bytes are the load-proof axis. cpuMs is
ADVISORY ONLY under load: the round-14 judge session measured per-gate
cpuMs inflating up to 6.2x (x_dedup_editdist 13.9s->68.2s) on
byte-identical shuffle and identical src/main — treat cpu deltas >1.5x
with unchanged shuffle as suspect-load and confirm with a quiet min-of-4.

Dev tool only (driver-side python); never shipped with the library.
"""
import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 8
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    new, old = (json.load(open(p)) for p in args[:2])
    qn, qo = new["queries"], old["queries"]
    tn, to = new.get("telemetry", {}), old.get("telemetry", {})
    common = sorted(set(qn) & set(qo))
    added, removed = sorted(set(qn) - set(qo)), sorted(set(qo) - set(qn))

    def tot(field, tel, keys):
        return sum(tel.get(k, {}).get(field, 0) for k in keys)

    wn, wo = sum(qn[k] for k in common), sum(qo[k] for k in common)
    cn, co = tot("cpuMs", tn, common), tot("cpuMs", to, common)
    sn, so = tot("shufReadB", tn, common), tot("shufReadB", to, common)
    print(f"boards: new={new.get('round','?')}@{new.get('gitSha','?')[:7]} "
          f"(total {new['value']:.1f}s/{new['passed']}) vs "
          f"old={old.get('round','?')}@{old.get('gitSha','?')[:7]} "
          f"(total {old['value']:.1f}s/{old['passed']})")
    print(f"common {len(common)} gates:")
    print(f"  wall   {wn:10.1f}s vs {wo:10.1f}s  ratio {wn/wo:.3f}   (load-sensitive)")
    if co:
        print(f"  cpuMs  {cn:10d}  vs {co:10d}   ratio {cn/co:.3f}   (advisory: inflates <=6.2x under load)")
    if so:
        print(f"  shufR  {sn:10d}B vs {so:10d}B  ratio {sn/so:.4f}  (the plan signal)")
    if added:
        print(f"added {len(added)} gates, wall {sum(qn[k] for k in added):.1f}s: "
              + ", ".join(added))
    if removed:
        print(f"removed {len(removed)} gates (old wall {sum(qo[k] for k in removed):.1f}s): "
              + ", ".join(removed))

    # .get with a sentinel: pre-round-12 boards lack shufReadB — skip those
    # entries instead of raising KeyError (tot() already guards the same way).
    sdiff = [(k, o, n) for k in common
             for o in [to.get(k, {}).get("shufReadB")]
             for n in [tn.get(k, {}).get("shufReadB")]
             if o is not None and n is not None and o != n]
    print(f"shuffle-differing gates: {len(sdiff)}"
          + ("" if sdiff else "  (byte-identical board)"))
    for k, o, n in sorted(sdiff, key=lambda t: -abs(t[2] / max(t[1], 1) - 1))[:top]:
        r = n / max(o, 1)
        flag = "JITTER" if abs(r - 1) < 0.005 else "PLAN? -> investigate"
        print(f"  {k:30s} {o:12d} -> {n:12d}  ratio {r:.4f}  {flag}")

    movers = sorted(((qn[k] - qo[k], k) for k in common))
    print(f"top wall movers (noise under load — check shuffle first, cpu is advisory):")
    # De-duplicate the two slices: with few common gates they overlap and
    # the same gate would print twice.
    for d, k in dict.fromkeys(movers[:3] + movers[-top:]):
        print(f"  {k:30s} {qo[k]:7.2f} -> {qn[k]:7.2f}s")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. `| head` closing the pipe — not an error
        sys.exit(0)
