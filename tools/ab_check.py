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
      [--sf /root/testdata/sf0.1] [--baseline tools/bench_r12_local.json]
      [--insuite <seconds>] [--control <query>]

Each run invokes `sbt -batch "runMain graft.Bench"` with
SPARK_GRAFT_ONLY=<queries> — Bench's own warmup pass and median-of-3
tier apply, so each reported number is already noise-dampened; N
isolated processes on top of that bound JVM-level variance. Verdict per
query: AMBIENT (isolated median <= 1.3x baseline — the in-suite flag
was noise), REAL (>1.5x — regression reproduces in isolation), or
BORDERLINE between. Exit 1 if any query reads REAL.

--control runs a known-stable query in the SAME processes and
normalizes each suspect's ratio by the control's ratio before the
verdict (round-10 protocol: on a uniformly warm box every query reads
1.2-1.4x its pin — including code untouched for rounds — so the raw
ratio measures the box, and dividing by a stable control's ratio
recovers the code's own drift; q39 read 1.47x raw, 1.16x normalized,
matching its round-9 isolated pin). q95_range_layout is the canonical
control (stable since round 6, 1.03x isolated in round 9). A control
reading >= 1.5x its own baseline aborts the verdict: either the box is
too contended to measure anything, or the control itself regressed —
re-run later, or A/B the control against a different one first.
"""
import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_diff import parse_contract  # one parser for the contract line

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_BASELINE = os.path.join(HERE, "tools", "bench_r12_local.json")
AMBIENT_MAX = 1.3
REAL_MIN = 1.5
RUN_TIMEOUT_S = 900


def run_once(queries, sf, cpus):
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(queries),
               SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_CPUS=cpus)
    try:
        p = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            cwd=HERE, env=env, capture_output=True, text=True,
            timeout=RUN_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        sys.exit(f"isolated run exceeded {RUN_TIMEOUT_S}s — the box is "
                 "heavily contended (the situation being adjudicated); "
                 "no verdict is possible from a timed-out sample. Re-run "
                 "when the box quiets down.")
    line = parse_contract(p.stdout)
    if p.returncode != 0 or line is None:
        sys.exit(f"bench run failed (exit {p.returncode}):\n"
                 + p.stdout[-1500:] + p.stderr[-1500:])
    return line


def parse_args(argv):
    """Options consume their values, so '--runs 5 q71' cannot run a
    full bench against query '5' (the old parser did exactly that)."""
    opts = {"runs": "3", "sf": "/root/testdata/sf0.1",
            "baseline": DEFAULT_BASELINE, "insuite": None, "control": None}
    args, i = [], 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            name = a[2:].split("=", 1)[0]
            if name not in opts:
                sys.exit(f"unknown option --{name}\n\n{__doc__}")
            if "=" in a:
                opts[name] = a.split("=", 1)[1]
            elif i + 1 < len(argv):
                opts[name] = argv[i + 1]
                i += 1
            else:
                sys.exit(f"--{name} needs a value")
        else:
            args.append(a)
        i += 1
    if len(args) != 1:
        sys.exit(__doc__)
    return args[0], opts


def main():
    qarg, opts = parse_args(sys.argv[1:])
    queries = [q.strip() for q in qarg.split(",") if q.strip()]
    runs = int(opts["runs"])
    sf = opts["sf"]
    baseline = load_baseline(opts["baseline"])
    base = baseline["queries"]
    insuite = opts["insuite"]
    control = opts["control"]
    if control:
        if base.get(control) is None or base[control] <= 0:
            sys.exit(f"--control {control} has no baseline entry in "
                     f"{opts['baseline']} — a control is only meaningful "
                     "against a pinned time")
        if control in queries:
            sys.exit(f"--control {control} is also a suspect — a query "
                     "cannot normalize itself; pick a stable control "
                     "(q95_range_layout is the canonical one)")
        queries = queries + [control]

    # verdicts are only meaningful at the parallelism the baseline was
    # measured at: default to it, and refuse an explicit mismatch (the
    # round-9 lesson — a local[4] median vs a local[32] baseline reads
    # as a fake REAL regression).
    base_cpus = str(baseline.get("cpus", "32"))
    env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if env_cpus and env_cpus != base_cpus:
        sys.exit(f"SPARK_GRAFT_CPUS={env_cpus} but the baseline "
                 f"({opts['baseline']}) was measured at cpus={base_cpus} — "
                 "an isolated median at a different parallelism cannot be "
                 "compared to it. Unset SPARK_GRAFT_CPUS or pass a "
                 "--baseline measured at that parallelism.")
    cpus = env_cpus or base_cpus

    samples = {q: [] for q in queries}
    calibs = []
    for i in range(runs):
        line = run_once(queries, sf, cpus)
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
    ctl_ratio = None
    if control:
        ctl_med = statistics.median(samples[control])
        ctl_ratio = ctl_med / base[control]
        print(f"control {control}: isolated median {ctl_med:.2f}s vs "
              f"baseline {base[control]:.2f}s = {ctl_ratio:.2f}x "
              "(box-level inflation; suspect ratios are divided by this)")
        if ctl_ratio >= REAL_MIN:
            sys.exit(f"control reads {ctl_ratio:.2f}x its own baseline — "
                     "either the box is too contended for any verdict or "
                     "the control itself regressed; re-run when the box "
                     "quiets, or adjudicate the control first against a "
                     "different stable query")
    bad = False
    for q in queries:
        if q == control:
            continue
        med = statistics.median(samples[q])
        b = base.get(q)
        if b is None or b <= 0:
            print(f"{q}: isolated median {med:.2f}s over {runs} runs "
                  f"(min {min(samples[q]):.2f} max {max(samples[q]):.2f}) — "
                  f"no baseline entry, record this as the pin")
            continue
        raw = med / b
        r = raw / ctl_ratio if ctl_ratio else raw
        verdict = ("AMBIENT (in-suite flag was noise)" if r <= AMBIENT_MAX
                   else "REAL — regression reproduces in isolation"
                   if r >= REAL_MIN else "BORDERLINE — profile before pinning")
        bad |= r >= REAL_MIN
        extra = f", in-suite read {float(insuite):.2f}s" if insuite else ""
        norm = (f" = {r:.2f}x control-normalized" if ctl_ratio else "")
        print(f"{q}: isolated median {med:.2f}s "
              f"(min {min(samples[q]):.2f} max {max(samples[q]):.2f}) vs "
              f"baseline {b:.2f}s = {raw:.2f}x{norm}{extra} -> {verdict}")
    if calibs:
        print(f"calibration across runs: {calibs}")
    if bad:
        sys.exit(1)


def load_baseline(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed") or d


if __name__ == "__main__":
    main()
