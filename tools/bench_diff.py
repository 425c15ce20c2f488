#!/usr/bin/env python3
"""Per-query bench regression diff.

Usage:
  python3 tools/bench_diff.py <new> [<baseline>] [--threshold 1.5]

<new> is either a driver BENCH_r{N}.json (uses its "parsed" object) or a
file of raw Bench stdout lines (uses the last {"metric":"total"...} line).
<baseline> defaults to the newest repo-root BENCH_r{N}.json with N >= 8
(per the r7 verdict, BENCH_r08 — the first driver run after the q39
fused-aggregate fix — becomes the operative baseline; r7's 190.17 s run
is dominated by that since-fixed defect and would mask regressions),
falling back to tools/bench_r06_baseline.json (90.82 s / 128 queries)
until a driver run of the fixed code exists.
tools/bench_r0{6,8}_local.json hold the builder's clean local runs of
the same code for disambiguating machine noise. Exit code 1 if any
query exceeds threshold x its baseline time (queries under 0.5 s in the
baseline are skipped — they are pure noise at this scale).
"""
import glob
import json
import os
import re
import sys


def default_baseline():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = {}
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
        if m and int(m.group(1)) >= 8:
            rounds[int(m.group(1))] = p
    if rounds:
        return rounds[max(rounds)]
    return os.path.join(here, "tools", "bench_r06_baseline.json")


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
    base_path = args[1] if len(args) > 1 else default_baseline()
    base = load(base_path)
    print(f"baseline: {base_path}")
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
