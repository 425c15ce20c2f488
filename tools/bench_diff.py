#!/usr/bin/env python3
"""Per-query bench regression diff.

Usage:
  python3 tools/bench_diff.py <new> [<baseline>] [--threshold 1.5]
  python3 tools/bench_diff.py --selftest

<new> is either a driver BENCH_r{N}.json (uses its "parsed" object) or a
file of raw Bench stdout lines (uses the last {"metric":"total"...} line).

Baseline policy (round-9 rework — the r8 postmortem):
  The operative baseline is the PINNED CLEAN RUN — always the NEWEST
  tools/bench_r*_local.json (the selftest asserts PINNED_CLEAN is that
  file and that README's Performance section names it, after both
  pointers went stale for two rounds — VERDICT r13 #4). Prior pins
  are kept for history.
  Driver BENCH_r{N}.json files are
  considered as baseline candidates ONLY if they pass a plausibility
  gate: total <= SANITY_FACTOR x the pinned clean total. BENCH_r08.json
  (879.67 s) fails that gate — it was measured under sustained box
  contention (its shuffle bytes are identical to the clean run's, so the
  plans were the same and only wall-clock differs) — and is refused,
  falling back to the pinned run. The candidate file being diffed
  (argv[1]) is never its own baseline (the old glob-newest default
  self-compared and reported zero regressions by construction).

Ambient-noise handling:
  Bench.scala (round 9, interleaved round 10) times a fixed,
  data-independent CPU-bound calibration probe at bench start, after
  every 33rd query, and at bench end, reporting all samples as
  "calib_s":[...]. When the new run carries them and the WORST sample
  exceeds AMBIENT_FACTOR x the parallelism-matched clean value, the
  whole run is flagged as ambient-contaminated: per-query ratios are
  also shown normalized by the calibration ratio, and flags are
  labeled unconfirmed (max, not mean: contention is bursty — BENCH_r09
  read 2.06x total with CLEAN start/end samples because the burst
  lived between them, and a round-10 local run read [1.11, 0.43]).
  Queries the bench marked "runaway" (first run >= 20 s, single-shot,
  no median) are labeled unconfirmed too, as is every flag when the
  new run and baseline were measured at different parallelism or when
  the run's cpus has no recorded clean calib value — confirm any of
  these with tools/ab_check.py before treating it as a plan defect.

Exit code 1 if any CONFIRMED flag exceeds threshold x its baseline time
(queries under 0.5 s in the baseline are skipped — pure noise at this
scale); exit 2 if the only flags are unconfirmed (runaway/ambient) —
non-zero so they can't be shrugged off, distinct so nobody "fixes" a
clean plan before the A/B.
"""
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PINNED_CLEAN = os.path.join(HERE, "tools", "bench_r14d_local.json")
FALLBACK = os.path.join(HERE, "tools", "bench_r06_baseline.json")
SANITY_FACTOR = 2.0   # refuse baselines slower than this x the pinned run
AMBIENT_FACTOR = 2.0  # calib slower than this x clean => contaminated run
# Clean-box values of Bench.scala's calibration probe, keyed on the
# "cpus" the run reports (the probe saturates the configured
# parallelism, so its clean value depends on it — the round-9 lesson:
# three local[4] runs read "2.9x ambient" against the local[32] value
# while their totals were the best ever measured). Measured on the
# builder box: local[32] 0.39-0.62 across ~15 isolated runs; local[4]
# [1.37,1.24],[1.43,1.20],[1.37,1.21] across three full suites. The
# probe is a fixed 400M-row xxhash64 chain, median-of-3 per sample;
# see tools/bench_notes_r09.md. Runs that don't carry calib_s (pre-r9
# files) skip ambient detection; runs with an unrecognized cpus value
# skip it too (printed) rather than misjudge against the wrong clean.
CLEAN_CALIB_BY_CPUS = {"32": 0.45, "4": 1.30}
CLEAN_CALIB_S = CLEAN_CALIB_BY_CPUS["32"]  # legacy lines without "cpus"


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "parsed" in d:
            return d["parsed"]
        if isinstance(d, dict) and d.get("metric") in ("total", "total_detail"):
            return d
    except json.JSONDecodeError:
        pass
    # raw Bench stdout: take the last compact contract line.
    d = parse_contract(text)
    if d is None:
        sys.exit(f"no parseable bench line in {path}")
    return d


def parse_contract(text):
    """Last compact contract line from raw Bench stdout, or None.

    When the detail line is present too, its FULL failed/runaway lists
    replace the compact line's 5-name caps — the caps exist for the
    driver's 2000-char stdout tail, not for local files that kept the
    whole output. A capture that concatenates several bench runs could
    pair the last detail line with a DIFFERENT run's compact line, so
    the merge only uses a detail line that immediately precedes the
    compact line, or (failing adjacency — e.g. a stray log line between
    them) one earlier in the capture whose calib_s AND sf match the
    compact line's: same-run provenance, since two runs sharing every
    calibration sample to the hundredth is vanishingly unlikely.
    (Shared with tools/ab_check.py so the two tools cannot drift on the
    line format.)"""
    lines = text.splitlines()
    compact = [i for i, l in enumerate(lines)
               if l.startswith('{"metric":"total"')
               and '"total_detail"' not in l]
    if not compact:
        return None
    ci = compact[-1]
    d = json.loads(lines[ci])
    detail_idx = [i for i, l in enumerate(lines)
                  if i < ci and l.startswith('{"metric":"total_detail"')]
    chosen = None
    for i in reversed(detail_idx):
        try:
            dd = json.loads(lines[i])
        except json.JSONDecodeError:
            continue
        if i == ci - 1 or (dd.get("calib_s") == d.get("calib_s")
                           and dd.get("sf") == d.get("sf")):
            chosen = dd
            break
    if chosen is not None:
        for k in ("failed", "runaway"):
            if len(chosen.get(k, [])) >= len(d.get(k, [])):
                d[k] = chosen[k]
    return d


def default_baseline(exclude_path=None, root=None, pinned=None, log=print,
                     match_cpus=None, match_nqueries=None):
    """Newest sane driver bench, else the pinned clean run.

    A driver BENCH_r{N}.json qualifies only if (a) it is not the file
    being diffed, (b) its total passes the plausibility gate vs the
    pinned clean run, (c) when match_cpus is given, it was measured
    at that parallelism — per-query seconds across different local[N]
    settings are not comparable, so adopting a cpus-mismatched baseline
    would turn every ratio into a false flag — and (d) when
    match_nqueries is given, its catalog size is within 10% of the run
    being diffed: totals across materially different catalogs are not
    comparable, and a pin refresh that grows the catalog (and so the
    pinned total) must not let an older, smaller, contaminated driver
    run slide back under the 2x plausibility gate (the round-10
    BENCH_r09 re-adoption scenario). Refusals are printed so baseline
    drift is visible, never silent.
    """
    root = root or HERE
    pinned = pinned or PINNED_CLEAN
    try:
        clean_total = load(pinned)["value"]
    except (OSError, KeyError):
        return FALLBACK
    exclude = os.path.abspath(exclude_path) if exclude_path else None
    rounds = {}
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
        if m and int(m.group(1)) >= 8 and os.path.abspath(p) != exclude:
            rounds[int(m.group(1))] = p
    for n in sorted(rounds, reverse=True):
        try:
            cand = load(rounds[n])
        except SystemExit:
            continue
        total = cand["value"]
        amb = ambient_ratio(cand)
        cand_cpus = str(cand.get("cpus", "32"))
        if match_cpus is not None and cand_cpus != str(match_cpus):
            log(f"baseline candidate {os.path.basename(rounds[n])} skipped: "
                f"measured at cpus={cand_cpus}, run being diffed is "
                f"cpus={match_cpus} (not comparable)")
            continue
        cand_nq = cand.get("queries_run") or len(cand.get("queries") or {})
        if (match_nqueries and cand_nq
                and abs(cand_nq - match_nqueries) > 0.1 * match_nqueries):
            log(f"baseline candidate {os.path.basename(rounds[n])} skipped: "
                f"{cand_nq} queries vs {match_nqueries} in the run being "
                f"diffed (catalog sizes differ >10%; totals not comparable)")
            continue
        if total > SANITY_FACTOR * clean_total:
            log(f"baseline candidate {os.path.basename(rounds[n])} refused: "
                f"total {total:.2f}s > {SANITY_FACTOR}x pinned clean "
                f"{clean_total:.2f}s (contaminated run; see README Performance)")
            continue
        if amb is not None and amb > AMBIENT_FACTOR:
            # a moderately contaminated run can pass the total gate (the
            # r8 failure mode at lower intensity) but its own probe
            # gives it away — never adopt it as the operative baseline.
            log(f"baseline candidate {os.path.basename(rounds[n])} refused: "
                f"calib {cand.get('calib_s')} = {amb:.2f}x ambient "
                f"(> {AMBIENT_FACTOR}x; contaminated measurement)")
            continue
        return rounds[n]
    return pinned


def clean_calib_for(run):
    """Parallelism-matched clean probe value; None = can't judge."""
    cpus = run.get("cpus")
    if cpus is None:
        return CLEAN_CALIB_S  # legacy line: recorded at local[32]
    return CLEAN_CALIB_BY_CPUS.get(str(cpus))


def ambient_ratio(run):
    """Worst calibration sample vs the known clean value; None if absent.

    MAX, not mean: each sample is already a median-of-3 (robust to a
    single GC pause), and contention is bursty — the round-10 lesson is
    a 131.89 s run whose calib read [1.11, 0.43]: a contaminated start
    that faded before the end sample, which a mean of 0.77 (1.7x) would
    have called clean while the early queries ran 1.3-1.5x inflated.
    With interleaved mid-run samples (Bench.scala round 10) any burst
    longer than one probe interval trips the max."""
    calib = run.get("calib_s")
    if not calib:
        return None
    clean = clean_calib_for(run)
    if clean is None:
        return None
    return max(calib) / clean


def diff(new, base, thr, out=print):
    nq, bq = new["queries"], base["queries"]
    runaway = set(new.get("runaway", []))
    # round 12: queries in runaway_retry were re-timed ONCE at end of
    # suite behind a clean calibration probe, and the retry IS the
    # operative number in "queries" — those values are trusted, so they
    # are NOT demoted to unconfirmed the way single-shot runaways are.
    retried = new.get("runaway_retry", {}) or {}
    runaway_count = new.get("runaway_count", len(runaway))
    runaway_truncated = runaway_count > len(runaway)
    if retried:
        ev = ", ".join(f"{k} {v[0]:.1f}s->{v[1]:.1f}s"
                       for k, v in sorted(retried.items()))
        out(f"runaway retries (clean-probe-gated; retry is operative): {ev}")
    failed = list(new.get("failed", []))
    failed_count = new.get("failed_count", len(failed))
    if failed_count:
        out(f"*** {failed_count} FAILED queries (broken, not slow): "
            + (", ".join(failed) if failed else "names not in this line")
            + (" (+ more, list truncated — see the detail line)"
               if failed_count > len(failed) else "")
            + " — fix the failures; the timing diff below ignores them")
    amb = ambient_ratio(new)
    contaminated = amb is not None and amb > AMBIENT_FACTOR
    # per-query seconds are only comparable at the same parallelism: a
    # local[4] run diffed against a local[32] baseline reads ~4x across
    # the board — with the per-cpus clean calib it would even read
    # "calib clean" while every ratio is a config artifact, not code
    # (ADVICE r9). ab_check.py refuses the mismatch outright; here the
    # diff still prints (it's informative) but no flag can be CONFIRMED.
    base_cpus = str(base.get("cpus", "32"))
    new_cpus = str(new.get("cpus", "32"))
    cpus_mismatch = new_cpus != base_cpus
    # calib present but no clean value recorded for this parallelism:
    # the run is UNJUDGEABLE, which must demote flags the same way a
    # truncated runaway list does — an undetectably contaminated run
    # must not exit 1 with "confirmed" regressions (ADVICE r9).
    calib_unjudgeable = bool(new.get("calib_s")) and clean_calib_for(new) is None
    out(f"total: {base['value']:.2f} -> {new['value']:.2f} s "
        f"({new['value'] / base['value']:.2f}x)")
    if cpus_mismatch:
        out(f"*** PARALLELISM MISMATCH: new run cpus={new_cpus}, baseline "
            f"cpus={base_cpus} — per-query ratios are config artifacts, "
            "every flag below is unconfirmed; re-measure at the baseline's "
            "parallelism (ab_check.py refuses this case outright)")
    if calib_unjudgeable:
        out(f"calibration: {new['calib_s']} at cpus={new.get('cpus')} — no "
            "clean value recorded for that parallelism, so ambient "
            "contamination is UNDETECTABLE; flags below are unconfirmed "
            "(add the clean value to CLEAN_CALIB_BY_CPUS after 3 clean runs)")
    if amb is not None:
        # 1.15-2.0x: sub-alarm "warm box" band. The CPU-bound probe
        # undersenses memory/IO-side warmth (round-10 observation: probe
        # 1.22x while a known-stable control query read 1.27x and the
        # suite 1.40x), so a mildly elevated probe means ratios below
        # carry a comparable uniform inflation — flags stay actionable
        # but expect the A/B to land them in the AMBIENT band.
        warm = not contaminated and amb > 1.15
        out(f"calibration: {new['calib_s']} vs clean "
            f"{clean_calib_for(new):.2f}s (cpus={new.get('cpus', '32?')}) "
            f"= {amb:.2f}x ambient (worst sample)"
            + (" — RUN IS CONTAMINATED; ratios below are also shown /calib;"
               " flags are unconfirmed" if contaminated
               else " — WARM BOX: expect uniform ~probe-level inflation in"
               " the ratios below; adjudicate flags with tools/ab_check.py"
               " plus a known-stable control query" if warm
               else " (clean)"))
    # round 12: the contract line carries the burst's recorded cause —
    # probe-windows' 1-min load average and this JVM's own on-CPU share.
    cr = new.get("calib_ratio")
    l1, cf = new.get("load1"), new.get("cpu_frac")
    if cr is not None and l1 and cf:
        out(f"box record: calib_ratio={cr:.2f} load1(max)={max(l1):.1f} "
            f"cpu_frac(min)={min(cf):.2f}"
            + (" -> external burst (high load, low own-CPU during slow "
               "probes)" if cr > AMBIENT_FACTOR and min(cf) < 0.5
               and max(l1) > 40 else ""))
    if runaway_truncated:
        out(f"runaway list truncated ({len(runaway)} of {runaway_count} "
            "names in this line) — every flag below is demoted to "
            "unconfirmed, since any unlisted query may be one of the "
            "runaways (full list: the detail line / driver log)")
    confirmed, unconfirmed = [], []
    out(f"{'query':30} {'base':>7} {'new':>7}  ratio")
    for k in sorted(set(nq) & set(bq)):
        if bq[k] < 0.5 or nq[k] < 0:
            continue
        r = nq[k] / bq[k]
        flagged = r > thr
        norm = f" ({r / amb:5.2f}x /calib)" if contaminated and flagged else ""
        single_shot_runaway = k in runaway and k not in retried
        if flagged and (contaminated or cpus_mismatch or calib_unjudgeable
                        or single_shot_runaway or runaway_truncated):
            why = ("runaway single-shot" if single_shot_runaway
                   else f"cpus {new_cpus} vs baseline {base_cpus}"
                   if cpus_mismatch
                   else "ambient run" if contaminated
                   else "calib unjudgeable (unknown cpus)"
                   if calib_unjudgeable
                   else "possibly an unlisted runaway")
            unconfirmed.append(k)
            mark = f"  <<< UNCONFIRMED ({why} — A/B with tools/ab_check.py){norm}"
        elif flagged:
            confirmed.append(k)
            mark = "  <<< REGRESSION"
        else:
            mark = ""
        out(f"{k:30} {bq[k]:7.2f} {nq[k]:7.2f} {r:6.2f}{mark}")
    gone = sorted(set(bq) - set(nq))
    if gone:
        out(f"\nin baseline top-list but now below the report cutoff "
            f"(improved or renamed): {', '.join(gone)}")
    # the symmetric gap: a query in THIS run's top-list with no baseline
    # row is silently un-diffable — either brand-new (pin it) or, worse,
    # one that regressed from below the baseline's report cutoff into
    # the top list, which the ratio loop above can never flag. Surface
    # it instead of skipping silently (the repo's no-silent-caps rule).
    fresh = sorted(k for k in set(nq) - set(bq) if nq[k] >= 0.5)
    if fresh:
        out(f"\nin this run's top-list but absent from the baseline — no "
            "ratio computable (new query, or newly slow from below the "
            "baseline cutoff; pin with tools/ab_check.py): "
            + ", ".join(f"{k} ({nq[k]:.2f}s)" for k in fresh))
    if confirmed:
        out(f"\n{len(confirmed)} queries over {thr}x baseline: {confirmed}")
    if unconfirmed:
        out(f"{len(unconfirmed)} UNCONFIRMED flags (isolate with "
            f"SPARK_GRAFT_ONLY / tools/ab_check.py): {unconfirmed}")
    if not confirmed and not unconfirmed:
        out(f"\nno query over {thr}x its baseline time")
    return confirmed, unconfirmed


def selftest():
    """Pins the baseline-rejection paths (VERDICT r8 'what's wrong' #1)."""
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        pinned = os.path.join(d, "clean.json")
        mk = lambda total, qs: {"metric": "total", "value": total,
                                "unit": "sec", "queries": qs}
        with open(pinned, "w") as f:
            json.dump(mk(122.36, {"q1": 1.0}), f)
        quiet = lambda *a, **k: None

        # 1. contaminated newest driver bench is refused -> pinned clean.
        with open(os.path.join(d, "BENCH_r08.json"), "w") as f:
            json.dump({"parsed": mk(879.67, {"q1": 8.0})}, f)
        got = default_baseline(root=d, pinned=pinned, log=quiet)
        assert got == pinned, f"contaminated r08 adopted: {got}"

        # 2. the file being diffed is never its own baseline.
        new9 = os.path.join(d, "BENCH_r09.json")
        with open(new9, "w") as f:
            json.dump({"parsed": mk(130.0, {"q1": 1.1})}, f)
        got = default_baseline(exclude_path=new9, root=d, pinned=pinned,
                               log=quiet)
        assert got == pinned, f"self-compare not excluded: {got}"

        # 3. a sane driver bench (not the new file) IS adopted.
        got = default_baseline(root=d, pinned=pinned, log=quiet)
        assert got == new9, f"sane newest not adopted: {got}"

        # 4. ambient-contaminated run: flags demoted to unconfirmed.
        new = mk(300.0, {"q1": 3.0, "q2": 1.0})
        new["calib_s"] = [2.5 * CLEAN_CALIB_S, 2.6 * CLEAN_CALIB_S]
        base = mk(122.36, {"q1": 1.0, "q2": 1.0})
        confirmed, unconfirmed = diff(new, base, 1.5, out=quiet)
        assert confirmed == [] and unconfirmed == ["q1"], \
            f"ambient demotion failed: {confirmed} {unconfirmed}"

        # 5. clean calib + runaway marker: runaway flag is unconfirmed,
        #    plain regression stays confirmed.
        new = mk(300.0, {"q1": 25.0, "q2": 2.0})
        new["calib_s"] = [CLEAN_CALIB_S, CLEAN_CALIB_S]
        new["runaway"] = ["q1"]
        confirmed, unconfirmed = diff(new, base, 1.5, out=quiet)
        assert confirmed == ["q2"] and unconfirmed == ["q1"], \
            f"runaway demotion failed: {confirmed} {unconfirmed}"

        # 6. truncated runaway list (compact line caps at 5 but
        #    runaway_count says more): every flag demotes to unconfirmed,
        #    since any unlisted query may be one of the runaways.
        new = mk(300.0, {"q1": 25.0, "q2": 2.0})
        new["calib_s"] = [CLEAN_CALIB_S, CLEAN_CALIB_S]
        new["runaway"] = ["qa", "qb", "qc", "qd", "qe"]
        new["runaway_count"] = 6
        confirmed, unconfirmed = diff(new, base, 1.5, out=quiet)
        assert confirmed == [] and set(unconfirmed) == {"q1", "q2"}, \
            f"truncated-runaway demotion failed: {confirmed} {unconfirmed}"

        # 7. failed queries are surfaced loudly, not silently skipped.
        new = mk(1.0, {"q1": -1.0, "q2": 1.0})
        new["failed"], new["failed_count"] = ["q1"], 1
        lines = []
        diff(new, base, 1.5, out=lines.append)
        assert any("FAILED" in l and "q1" in l for l in lines), \
            f"failed queries not surfaced: {lines}"

        # 8. a driver bench whose own calibration is ambient is refused
        #    even when its total passes the 2x gate.
        cal = {"parsed": dict(mk(150.0, {"q1": 1.2}),
                              calib_s=[2.5 * CLEAN_CALIB_S] * 2)}
        newest = os.path.join(d, "BENCH_r10.json")
        with open(newest, "w") as f:
            json.dump(cal, f)
        got = default_baseline(root=d, pinned=pinned, log=quiet)
        assert got == new9, f"calib-ambient candidate adopted: {got}"

        # 9. the stdout parser merges the detail line's FULL lists over
        #    the compact line's 5-name caps.
        stdout = "\n".join([
            '{"metric":"total_detail","value":1,"unit":"sec","queries":{},'
            '"shuffle_mb":{},"failed":[],'
            '"runaway":["qa","qb","qc","qd","qe","qf"],"calib_s":[0.4,0.4],'
            '"cpus":"32","sf":"x"}',
            '{"metric":"total","value":1,"unit":"sec","queries":{},'
            '"queries_run":1,"queries_omitted_fast":0,"shuffle_mb_total":0,'
            '"failed":[],"failed_count":0,'
            '"runaway":["qa","qb","qc","qd","qe"],"runaway_count":6,'
            '"calib_s":[0.4,0.4],"cpus":"32","sf":"x"}'])
        merged = parse_contract(stdout)
        assert merged["runaway"] == ["qa", "qb", "qc", "qd", "qe", "qf"], \
            f"detail-line merge failed: {merged['runaway']}"

        # 10. a concatenated capture (two runs back to back): run A's
        #     detail line must NOT be merged into run B's compact line
        #     when neither adjacency nor calib_s/sf provenance matches.
        run_a_detail = ('{"metric":"total_detail","value":1,"unit":"sec",'
                        '"queries":{},"shuffle_mb":{},"failed":[],'
                        '"runaway":["qa","qb","qc","qd","qe","qf"],'
                        '"calib_s":[0.4,0.4],"cpus":"32","sf":"runA"}')
        run_b_compact = ('{"metric":"total","value":2,"unit":"sec",'
                         '"queries":{},"queries_run":1,'
                         '"queries_omitted_fast":0,"shuffle_mb_total":0,'
                         '"failed":[],"failed_count":0,'
                         '"runaway":["qx"],"runaway_count":1,'
                         '"calib_s":[0.5,0.5],"cpus":"32","sf":"runB"}')
        merged = parse_contract("\n".join(
            [run_a_detail, "intervening log line", run_b_compact]))
        assert merged["runaway"] == ["qx"], \
            f"cross-run detail merged: {merged['runaway']}"
        #     ... but a same-run detail line separated by a stray log
        #     line IS merged via the calib_s+sf provenance match.
        run_b_detail = run_b_compact.replace(
            '"metric":"total"', '"metric":"total_detail"').replace(
            '"runaway":["qx"],"runaway_count":1', '"runaway":["qx","qy"]')
        merged = parse_contract("\n".join(
            [run_a_detail, run_b_detail, "stray line", run_b_compact]))
        assert merged["runaway"] == ["qx", "qy"], \
            f"same-run provenance merge failed: {merged['runaway']}"

        # 11. ambient detection uses the WORST calibration sample: a
        #     bursty contaminated start that faded by the end sample
        #     still marks the run (round-10 lesson: calib [1.11, 0.43]).
        new = mk(160.0, {"q1": 2.0, "q2": 1.0})
        new["calib_s"] = [2.5 * CLEAN_CALIB_S, 1.0 * CLEAN_CALIB_S]
        confirmed, unconfirmed = diff(new, base, 1.5, out=quiet)
        assert confirmed == [] and unconfirmed == ["q1"], \
            f"max-sample ambient demotion failed: {confirmed} {unconfirmed}"

        # 12. parallelism mismatch between new run and baseline: every
        #     flag demotes to unconfirmed (a local[4] run vs a local[32]
        #     baseline reads ~4x across the board by config, not code).
        new = mk(400.0, {"q1": 4.1, "q2": 3.9})
        new["cpus"] = "4"
        new["calib_s"] = [1.30, 1.30]  # clean FOR local[4]
        base32 = dict(base, cpus="32")
        confirmed, unconfirmed = diff(new, base32, 1.5, out=quiet)
        assert confirmed == [] and set(unconfirmed) == {"q1", "q2"}, \
            f"cpus-mismatch demotion failed: {confirmed} {unconfirmed}"

        # 13. calib present but cpus unrecognized: contamination is
        #     undetectable, so flags demote instead of staying CONFIRMED.
        new = mk(300.0, {"q1": 3.0, "q2": 1.0})
        new["cpus"] = "16"
        new["calib_s"] = [0.6, 0.6]
        base16 = dict(base, cpus="16")
        confirmed, unconfirmed = diff(new, base16, 1.5, out=quiet)
        assert confirmed == [] and unconfirmed == ["q1"], \
            f"unjudgeable-calib demotion failed: {confirmed} {unconfirmed}"

        # 14. default_baseline skips a candidate measured at a different
        #     parallelism than the run being diffed.
        with open(os.path.join(d, "BENCH_r11.json"), "w") as f:
            json.dump({"parsed": dict(mk(30.0, {"q1": 1.0}), cpus="4",
                                      calib_s=[1.30, 1.30])}, f)
        got = default_baseline(root=d, pinned=pinned, log=quiet,
                               match_cpus="32")
        assert got != os.path.join(d, "BENCH_r11.json"), \
            f"cpus-mismatched baseline adopted: {got}"

        # 15. a query in the new run's top-list but absent from the
        #     baseline (new query, or newly slow from below the cutoff)
        #     is surfaced, not silently skipped; sub-0.5s entries stay
        #     quiet (noise floor).
        new = mk(130.0, {"q1": 1.0, "q_new": 5.0, "q_tiny": 0.1})
        new["calib_s"] = [CLEAN_CALIB_S]
        lines = []
        confirmed, unconfirmed = diff(new, base, 1.5,
                                      out=lambda s: lines.append(str(s)))
        joined = "\n".join(lines)
        assert "q_new (5.00s)" in joined, \
            f"new-query note missing: {joined}"
        assert "q_tiny" not in joined, \
            f"sub-cutoff new query surfaced as noise: {joined}"

        # 16. catalog-size mismatch: a pin refresh that grows the
        #     catalog raises the pinned total, which can slide an older,
        #     smaller, contaminated driver run back under the 2x gate
        #     (the round-10 BENCH_r09 re-adoption scenario) — when the
        #     candidate's query count differs >10% from the run being
        #     diffed, it is skipped regardless of its total.
        with open(new9, "w") as f:
            json.dump({"parsed": dict(mk(130.0, {"q1": 1.1}),
                                      queries_run=133)}, f)
        os.remove(newest)
        got = default_baseline(root=d, pinned=pinned, log=quiet,
                               match_nqueries=187)
        assert got == pinned, f"catalog-size-mismatched candidate adopted: {got}"
        got = default_baseline(root=d, pinned=pinned, log=quiet,
                               match_nqueries=130)
        assert got == new9, f"size-matched candidate refused: {got}"

    # 17. pointer freshness (VERDICT r13 #4: PINNED_CLEAN and the
    #     README's operative-pin paragraph each went stale for two
    #     rounds): PINNED_CLEAN must be the NEWEST
    #     tools/bench_r*_local.json, and README.md must name the same
    #     file. BenchContractSpec mirrors this check in sbt test.
    pin_glob = glob.glob(os.path.join(HERE, "tools", "bench_r*_local.json"))
    assert pin_glob, "no bench_r*_local.json pins found"

    def pin_key(p):
        m = re.search(r"bench_r(\d+)([a-z]?)_local\.json$", p)
        return (int(m.group(1)), m.group(2))
    newest_pin = max(pin_glob, key=pin_key)
    assert os.path.abspath(PINNED_CLEAN) == os.path.abspath(newest_pin), \
        f"PINNED_CLEAN {PINNED_CLEAN} is stale; newest pin is {newest_pin}"
    with open(os.path.join(HERE, "README.md")) as f:
        assert os.path.basename(PINNED_CLEAN) in f.read(), \
            "README Performance section does not name the operative pin"
    print("bench_diff selftest: 17/17 ok")


def parse_args(argv):
    """Positional args + threshold; consumes space-separated option
    values so '--threshold 2' cannot leak '2' into the baseline slot
    (the old parser crashed on the usage string's own syntax)."""
    args, thr, i = [], 1.5, 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                thr = float(argv[i + 1])
                i += 1
            else:
                sys.exit("--threshold needs a value")
        elif a.startswith("--"):
            sys.exit(f"unknown option {a}\n\n{__doc__}")
        else:
            args.append(a)
        i += 1
    if not args or len(args) > 2:
        sys.exit(__doc__)
    return args, thr


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    args, thr = parse_args(sys.argv[1:])
    new = load(args[0])
    new_nq = new.get("queries_run") or len(new.get("queries") or {})
    base_path = (args[1] if len(args) > 1
                 else default_baseline(args[0],
                                       match_cpus=new.get("cpus", "32"),
                                       match_nqueries=new_nq))
    base = load(base_path)
    print(f"baseline: {base_path}")
    confirmed, unconfirmed = diff(new, base, thr)
    if new.get("failed_count") or new.get("failed"):
        sys.exit(1)  # a broken query is worse than a slow one
    if confirmed:
        sys.exit(1)
    if unconfirmed:
        sys.exit(2)


if __name__ == "__main__":
    main()
