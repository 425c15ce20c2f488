#!/usr/bin/env python3
"""Promote the last bench detail line to a bench_r*_local.json pin.

Usage: python3 tools/promote_pin.py <out_pin.json> "<note text>"
Reads tools/bench_last_detail.json (written atomically by graft.Bench)
and stores the pin in the same shape as every bench_r*_local.json:
metric/value/unit/queries/shuffle_mb/calib_s/cpus/sf/note.
"""
import json
import sys


def main() -> None:
    out, note = sys.argv[1], sys.argv[2]
    d = json.load(open("tools/bench_last_detail.json"))
    pin = {
        "metric": "total",
        "value": round(sum(v for v in d["queries"].values() if v >= 0), 2),
        "unit": "sec",
        "queries": d["queries"],
        "shuffle_mb": d["shuffle_mb"],
        "calib_s": d["calib_s"],
        "cpus": d["cpus"],
        "sf": d["sf"],
        "note": note,
    }
    with open(out, "w") as f:
        json.dump(pin, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {pin['value']} s, {len(pin['queries'])} queries")


if __name__ == "__main__":
    main()
