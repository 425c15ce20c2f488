#!/usr/bin/env python3
"""Per-query bench regression diff.

Usage:
  python3 tools/bench_diff.py <new> [<baseline>] [--threshold 1.5]

<new> is either a driver BENCH_r{N}.json (uses its "parsed" object) or a
file of raw Bench stdout lines (uses the last {"metric":"total"...} line).
<baseline> defaults to tools/bench_r06_baseline.json — the round-6 driver
run (90.82 s / 128 queries, the operative baseline per the r6 verdict);
tools/bench_r06_local.json holds the builder's clean local run of the
same code for disambiguating machine noise. Exit code 1 if any
query exceeds threshold x its baseline time (queries under 0.5 s in the
baseline are skipped — they are pure noise at this scale).
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "parsed" in d:
            return d["parsed"]
        if isinstance(d, dict) and d.get("metric") == "total":
            return d
    except json.JSONDecodeError:
        pass
    # raw Bench stdout: take the last compact contract line.
    lines = [l for l in text.splitlines() if l.startswith('{"metric":"total"')
             and '"total_detail"' not in l]
    if not lines:
        sys.exit(f"no parseable bench line in {path}")
    return json.loads(lines[-1])


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    new = load(args[0])
    base = load(args[1] if len(args) > 1 else "tools/bench_r06_baseline.json")
    nq, bq = new["queries"], base["queries"]
    flagged = []
    print(f"total: {base['value']:.2f} -> {new['value']:.2f} s "
          f"({new['value'] / base['value']:.2f}x)")
    print(f"{'query':30} {'base':>7} {'new':>7}  ratio")
    for k in sorted(set(nq) & set(bq)):
        if bq[k] < 0.5:
            continue
        r = nq[k] / bq[k]
        mark = "  <<< REGRESSION" if r > thr else ""
        if r > thr:
            flagged.append(k)
        print(f"{k:30} {bq[k]:7.2f} {nq[k]:7.2f} {r:6.2f}{mark}")
    gone = sorted(set(bq) - set(nq))
    if gone:
        print(f"\nin baseline top-list but now below the report cutoff "
              f"(improved or renamed): {', '.join(gone)}")
    if flagged:
        print(f"\n{len(flagged)} queries over {thr}x baseline: {flagged}")
        sys.exit(1)
    print(f"\nno query over {thr}x its baseline time")


if __name__ == "__main__":
    main()
