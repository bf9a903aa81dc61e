#!/usr/bin/env python3
"""Aggregate full-Bench session logs and compare per-query minima against a
reference bench JSON (e.g. BENCH_r05.json's parsed.queries).

Usage: python3 tools/session_compare.py <ref.json> <session.log> [more...]

Host noise on this sandbox reaches 2-3x per query across sessions, so the
per-query MIN across >= 3 sessions is the honest capability estimate (the
same min-of-passes logic Bench applies within a session, lifted across
sessions).
"""
import json
import sys


def load_line(path):
    for line in open(path, errors="replace"):
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])
    raise SystemExit(f"no bench line in {path}")


def main():
    ref_path, session_paths = sys.argv[1], sys.argv[2:]
    ref_raw = json.load(open(ref_path))
    ref = ref_raw.get("parsed", ref_raw)
    refq = ref["queries"]
    sessions = [load_line(p) for p in session_paths]
    names = sorted(refq)
    best = {}
    missing = []
    for n in names:
        vals = [s["queries"].get(n) for s in sessions if s["queries"].get(n) is not None]
        if vals:
            best[n] = min(vals)
        else:
            missing.append(n)
    kg_best = min(s["kg"]["seconds"] for s in sessions)
    totals = [s["value"] for s in sessions]
    print(f"ref total {ref['value']:.1f} (kg {ref['kg']['seconds']:.2f})")
    if missing:
        # a query with no successful pass in ANY session is the worst
        # possible regression — shout, never silently shrink the sum
        print(f"!! {len(missing)} ref queries have NO successful pass in any "
              f"session (treat as regressions): {', '.join(missing)}")
    print(f"session totals: {[round(t,1) for t in totals]}; best-of kg {kg_best:.2f}")
    print(f"sum of cross-session per-query minima: {sum(best.values()):.1f} + kg {kg_best:.2f} = {sum(best.values())+kg_best:.1f}")
    rows = [(n, refq[n], best.get(n)) for n in names if best.get(n) is not None]
    imp = sorted(rows, key=lambda r: r[2] - r[1])
    print("\nbiggest improvements vs ref (sec):")
    for n, r, b in imp[:25]:
        print(f"  {n:28s} {r:6.2f} -> {b:6.2f}  ({b-r:+5.2f}  x{b/r if r else 0:.2f})")
    print("\nqueries slower than ref by >20% AND >0.1s (cross-session min):")
    bad = [(n, r, b) for n, r, b in rows if b > r * 1.2 and b - r > 0.1]
    for n, r, b in sorted(bad, key=lambda t: t[1] - t[2]):
        print(f"  {n:28s} {r:6.2f} -> {b:6.2f}  ({b-r:+5.2f})")
    if not bad:
        print("  (none)")


if __name__ == "__main__":
    main()
