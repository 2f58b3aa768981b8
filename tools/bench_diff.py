#!/usr/bin/env python3
"""Per-row bench regression tripwire.

Compares a graft.Bench sweep's per-query times against the committed
per-row baseline (BASELINE_ROWS.json) and fails loudly on per-row
drift — totals-only comparison is how the round-7 dedup_fuzzy_names /
sim_ann_pq regressions hid inside the "host noise" band for two
closing sweeps.

Usage:
    python3 tools/bench_diff.py <sweep.json> [baseline.json]

<sweep.json> is a file whose LAST line containing '"queries"' is the
Bench JSON line (so a raw `sbt runMain` log works directly), or a
plain JSON file. Default baseline: BASELINE_ROWS.json next to this
tools/ dir.

Exit 1 if any row regresses beyond the gate; prints every flagged row
either way. Gates:
  - ratio > RATIO_GATE (default 2.0) AND absolute slowdown
    > ABS_FLOOR seconds (default 1.0 — sub-second rows jitter by
    multiples without meaning anything);
  - rows missing from the sweep or new vs the baseline are REPORTED
    (not failed) so intentional additions surface in review.

To re-baseline after an intentional perf change: run a quiet-host
sweep and `python3 tools/bench_diff.py --write-baseline <sweep.json>`.
--write-baseline REFUSES a sweep that reports failed queries or that
is missing rows present in the current baseline (a partial sweep must
not silently become the reference); `--force` overrides.
"""
import json
import os
import sys

RATIO_GATE = float(os.environ.get("BENCH_DIFF_RATIO", "2.0"))
ABS_FLOOR = float(os.environ.get("BENCH_DIFF_ABS_FLOOR", "1.0"))

HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_BASELINE = os.path.join(HERE, "..", "BASELINE_ROWS.json")


def load_sweep(path):
    """Extract the Bench JSON object from a file: last line holding a
    "queries" key (works on raw sbt logs), else the whole file."""
    with open(path) as f:
        text = f.read()
    candidate = None
    for line in text.splitlines():
        if '"queries"' in line:
            start = line.find("{")
            if start >= 0:
                try:
                    candidate = json.loads(line[start:])
                except json.JSONDecodeError:
                    pass
    if candidate is None:
        candidate = json.loads(text)
    if "queries" not in candidate:
        raise SystemExit(f"no 'queries' object found in {path}")
    return candidate


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_baseline = "--write-baseline" in sys.argv
    if not args:
        raise SystemExit(__doc__)
    sweep = load_sweep(args[0])
    rows = sweep["queries"]

    baseline_path = args[1] if len(args) > 1 else DEFAULT_BASELINE
    if write_baseline:
        force = "--force" in sys.argv
        problems = []
        failed = sweep.get("failed")
        if failed:
            problems.append(f"sweep reports {failed} failed queries")
        if os.path.exists(baseline_path):
            with open(baseline_path) as f:
                prev = json.load(f).get("queries", {})
            dropped = sorted(set(prev) - set(rows))
            if dropped:
                problems.append(
                    f"sweep is missing {len(dropped)} baseline rows "
                    f"(e.g. {', '.join(dropped[:5])})")
        if problems and not force:
            raise SystemExit(
                "refusing to write baseline: " + "; ".join(problems) +
                " (pass --force to override)")
        out = {
            "total": sweep.get("value"),
            "sf": sweep.get("sf"),
            "queries": rows,
        }
        with open(baseline_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"baseline written: {len(rows)} rows -> {baseline_path}")
        return 0

    if not os.path.exists(baseline_path):
        raise SystemExit(
            f"no baseline at {baseline_path}; create one with --write-baseline")
    with open(baseline_path) as f:
        base = json.load(f)
    base_rows = base["queries"]

    regressed, improved, new, missing = [], [], [], []
    for name, secs in sorted(rows.items()):
        if name not in base_rows:
            new.append((name, secs))
            continue
        b = base_rows[name]
        if b <= 0 or secs <= 0:
            continue
        ratio = secs / b
        if ratio > RATIO_GATE and (secs - b) > ABS_FLOOR:
            regressed.append((name, b, secs, ratio))
        elif ratio < 1.0 / RATIO_GATE and (b - secs) > ABS_FLOOR:
            improved.append((name, b, secs, ratio))
    for name, secs in sorted(base_rows.items()):
        if name not in rows:
            missing.append((name, secs))

    for name, b, s, r in regressed:
        print(f"REGRESSED  {name}: {b:.2f}s -> {s:.2f}s ({r:.2f}x)")
    for name, b, s, r in improved:
        print(f"improved   {name}: {b:.2f}s -> {s:.2f}s ({r:.2f}x)")
    for name, s in new:
        print(f"new row    {name}: {s:.2f}s (not in baseline)")
    for name, s in missing:
        print(f"missing    {name}: baseline {s:.2f}s, absent from sweep")

    bt = base.get("total")
    st = sweep.get("value")
    if bt and st:
        print(f"totals: baseline {bt:.1f}s -> sweep {st:.1f}s ({st / bt:.2f}x)")
    print(f"checked {len(rows)} rows against {len(base_rows)} baseline rows: "
          f"{len(regressed)} regressed (> {RATIO_GATE}x and > {ABS_FLOOR}s), "
          f"{len(improved)} improved, {len(new)} new, {len(missing)} missing")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
