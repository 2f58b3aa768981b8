#!/usr/bin/env python3
"""Merge N graft.Bench sweep logs into one min-of-N sweep JSON.

Per-row minimum across sweeps is the noise-robust reference this
host needs (ROADMAP round-9 close: transient hypervisor contention
windows make single sweeps unusable as baselines; only min-of-2+
quiet-window sweeps are meaningful). Output goes to stdout (or
--out <file>) in the same shape graft.Bench prints, so it feeds
straight into `bench_diff.py --write-baseline`.

Usage:
    python3 tools/bench_min.py sweep1.log sweep2.log [...] --out min.json

Refuses to merge sweeps whose query sets differ (a partial sweep
must not silently shrink the reference) and propagates the max
`failed` count so --write-baseline's failed-sweep refusal still
fires.
"""
import json
import sys

from bench_diff import load_sweep


def main():
    args = []
    out_path = None
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--out":
            if i + 1 >= len(argv):
                raise SystemExit("--out needs a file argument")
            out_path = argv[i + 1]
            i += 2
        elif a.startswith("--out="):
            out_path = a[len("--out="):]
            i += 1
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a} (only --out FILE)")
        else:
            args.append(a)
            i += 1
    if len(args) < 2:
        raise SystemExit(__doc__)
    sweeps = [load_sweep(p) for p in args]
    keys = set(sweeps[0]["queries"])
    for p, s in zip(args[1:], sweeps[1:]):
        if set(s["queries"]) != keys:
            diff = set(s["queries"]) ^ keys
            raise SystemExit(
                f"query sets differ between {args[0]} and {p} "
                f"(e.g. {sorted(diff)[:5]}) — refusing a partial merge")
    rows = {k: min(s["queries"][k] for s in sweeps) for k in keys}
    merged = {
        "metric": sweeps[0].get("metric", "total"),
        "value": round(sum(rows.values()), 3),
        "unit": sweeps[0].get("unit", "sec"),
        "queries": rows,
        "failed": max(s.get("failed", 0) for s in sweeps),
        "sf": sweeps[0].get("sf"),
        "merged_from": len(sweeps),
    }
    text = json.dumps(merged, sort_keys=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
        print(f"min-of-{len(sweeps)} written: {len(rows)} rows -> {out_path}")
    else:
        print(text)


if __name__ == "__main__":
    sys.exit(main())
