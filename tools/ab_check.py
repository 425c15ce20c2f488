#!/usr/bin/env python3
"""Isolated A/B check for a flagged bench query.

Rounds 6-8 each adjudicated suspicious per-query bench flags by hand:
run the query alone (SPARK_GRAFT_ONLY) a few times in a quiet JVM and
compare the isolated median against the in-suite number — ambient noise
(GC neighborhoods, box contention, sequential-small-job scheduling)
inflates in-suite numbers 1.2-60x while the isolated number stays at
baseline. This script is that protocol as one command.

Usage:
  python3 tools/ab_check.py <query>[,<query2>...] [--runs 3]
      [--sf /root/testdata/sf0.1] [--baseline tools/bench_r09b_local.json]
      [--insuite <seconds>]

Each run invokes `sbt -batch "runMain graft.Bench"` with
SPARK_GRAFT_ONLY=<queries> — Bench's own warmup pass and median-of-3
tier apply, so each reported number is already noise-dampened; N
isolated processes on top of that bound JVM-level variance. Verdict per
query: AMBIENT (isolated median <= 1.3x baseline — the in-suite flag
was noise), REAL (>1.5x — regression reproduces in isolation), or
BORDERLINE between. Exit 1 if any query reads REAL.
"""
import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_BASELINE = os.path.join(HERE, "tools", "bench_r09b_local.json")
AMBIENT_MAX = 1.3
REAL_MIN = 1.5


def contract_line(stdout):
    lines = [l for l in stdout.splitlines()
             if l.startswith('{"metric":"total"')
             and '"total_detail"' not in l]
    return json.loads(lines[-1]) if lines else None


def run_once(queries, sf):
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(queries),
               SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=HERE, env=env, capture_output=True, text=True, timeout=900)
    line = contract_line(p.stdout)
    if p.returncode != 0 or line is None:
        sys.exit(f"bench run failed (exit {p.returncode}):\n"
                 + p.stdout[-1500:] + p.stderr[-1500:])
    return line


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        sys.exit(__doc__)
    queries = [q.strip() for q in args[0].split(",") if q.strip()]
    opt = lambda name, dflt: next(
        (sys.argv[i + 1] if "=" not in a else a.split("=", 1)[1]
         for i, a in enumerate(sys.argv) if a.startswith(f"--{name}")), dflt)
    runs = int(opt("runs", "3"))
    sf = opt("sf", "/root/testdata/sf0.1")
    base = load_queries(opt("baseline", DEFAULT_BASELINE))
    insuite = opt("insuite", None)

    samples = {q: [] for q in queries}
    calibs = []
    for i in range(runs):
        line = run_once(queries, sf)
        for q in queries:
            if q not in line["queries"]:
                sys.exit(f"query {q} missing from bench output "
                         f"(available: {sorted(line['queries'])})")
            samples[q].append(line["queries"][q])
        if line.get("calib_s"):
            calibs.append(line["calib_s"])
        print(f"run {i + 1}/{runs}: "
              + ", ".join(f"{q}={line['queries'][q]:.2f}s" for q in queries)
              + (f" calib={line['calib_s']}" if line.get("calib_s") else ""))

    print()
    bad = False
    for q in queries:
        med = statistics.median(samples[q])
        b = base.get(q)
        if b is None or b <= 0:
            print(f"{q}: isolated median {med:.2f}s over {runs} runs "
                  f"(min {min(samples[q]):.2f} max {max(samples[q]):.2f}) — "
                  f"no baseline entry, record this as the pin")
            continue
        r = med / b
        verdict = ("AMBIENT (in-suite flag was noise)" if r <= AMBIENT_MAX
                   else "REAL — regression reproduces in isolation"
                   if r >= REAL_MIN else "BORDERLINE — profile before pinning")
        bad |= r >= REAL_MIN
        extra = f", in-suite read {float(insuite):.2f}s" if insuite else ""
        print(f"{q}: isolated median {med:.2f}s "
              f"(min {min(samples[q]):.2f} max {max(samples[q]):.2f}) vs "
              f"baseline {b:.2f}s = {r:.2f}x{extra} -> {verdict}")
    if calibs:
        print(f"calibration across runs: {calibs}")
    if bad:
        sys.exit(1)


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    return (d.get("parsed") or d)["queries"]


if __name__ == "__main__":
    main()
