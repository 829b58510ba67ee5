#!/usr/bin/env python3
"""Min-over-runs bench report (round-7 advice #6).

Usage: python3 tools/bench_trend.py [bench_history.jsonl] [--top N]

Each line of the history file is `<ISO timestamp> <bench JSON>` as
appended by graft.Bench. Single runs on this host swing 2-10x under
multi-minute throttling bursts, so the only honest per-query cost is the
MIN across runs; this tool reports, per query, that min, the latest
run's value, and latest/min — a ratio far above 1 on the LATEST run
means either a regression or a burst, and a ratio near 1 means the
latest run is a fair measurement. Failed (-1) samples are excluded from
min; a query failing in the latest run is flagged.
"""
import json
import sys


def load(path):
    runs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            ts, _, payload = line.partition(" ")
            try:
                runs.append((ts, json.loads(payload)))
            except json.JSONDecodeError:
                print(f"warn: skipping unparsable line ({ts})", file=sys.stderr)
    return runs


def main(argv):
    path = "bench_history.jsonl"
    top = None
    args = [a for a in argv[1:]]
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        del args[i:i + 2]
    if args:
        path = args[0]
    runs = load(path)
    if not runs:
        print("no runs in history", file=sys.stderr)
        return 1
    # min-over-runs is only meaningful within one scale factor: compare
    # the latest run against prior runs of the SAME sf dir.
    sf = runs[-1][1].get("sf")
    runs = [(ts, r) for ts, r in runs if r.get("sf") == sf]
    latest_ts, latest = runs[-1]
    mins = {}
    for _, run in runs:
        for q, v in run.get("queries", {}).items():
            if v >= 0 and (q not in mins or v < mins[q]):
                mins[q] = v

    rows = []
    for q, v in latest.get("queries", {}).items():
        m = mins.get(q)
        if v < 0:
            rows.append((float("inf"), q, m, v, "FAILED in latest run"))
        elif m is None or m == 0:
            rows.append((1.0, q, v, v, "only run"))
        else:
            rows.append((v / m, q, m, v, ""))
    rows.sort(reverse=True)

    print(f"history: {len(runs)} runs, latest {latest_ts}")
    # restrict the headline total to queries the LATEST run declares AND
    # succeeded in (v >= 0): a renamed/removed query's stale min would
    # inflate the ratio, and a failed query's min would land in total_min
    # while total_latest excludes it — understating the ratio exactly
    # when the run has failures
    latest_ok = {q for q, v in latest.get("queries", {}).items() if v >= 0}
    total_min = sum(m for q, m in mins.items() if q in latest_ok)
    total_latest = sum(v for v in latest.get("queries", {}).values() if v >= 0)
    print(f"total: latest {total_latest:.1f}s vs sum-of-mins {total_min:.1f}s "
          f"(x{total_latest / total_min:.2f})" if total_min else "total: n/a")
    print(f"{'query':<28} {'min':>8} {'latest':>8} {'ratio':>7}  note")
    for ratio, q, m, v, note in (rows[:top] if top else rows):
        ms = f"{m:.3f}" if m is not None else "-"
        vs = f"{v:.3f}" if v >= 0 else "-1"
        rs = "inf" if ratio == float("inf") else f"{ratio:.2f}"
        print(f"{q:<28} {ms:>8} {vs:>8} {rs:>7}  {note}")
    errs = latest.get("errors", [])
    if errs:
        print(f"\nerrors in latest run ({len(errs)}): {', '.join(errs)}")
        return 1
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv))
    except BrokenPipeError:  # piped into head
        sys.exit(0)
