#!/usr/bin/env python3
"""Partitioning-determinism check: diff two Verify dumps produced with
different parallelism (e.g. SPARK_GRAFT_CPUS=4 vs 8). Any query whose
output depends on partition order (unordered limits, raw double sums,
tie-broken ranks) shows up as a mismatch here before the driver sees it.

Usage:
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <sfDir> /tmp/v8"
  SPARK_GRAFT_CPUS=4 sbt "runMain graft.Verify <sfDir> /tmp/v4"
  python3 tools/check_determinism.py /tmp/v8 /tmp/v4
"""
import sys, os
import duckdb

def main(a: str, b: str) -> int:
    con = duckdb.connect()
    names = [d for d in sorted(os.listdir(a)) if os.path.isdir(os.path.join(a, d))]
    bad = []
    for name in names:
        pa, pb = f"{a}/{name}/*.parquet", f"{b}/{name}/*.parquet"
        try:
            n1, n2, d1, d2 = con.sql(f"""
              SELECT (SELECT COUNT(*) FROM '{pa}'),
                     (SELECT COUNT(*) FROM '{pb}'),
                     (SELECT COUNT(*) FROM ((SELECT * FROM '{pa}') EXCEPT ALL (SELECT * FROM '{pb}'))),
                     (SELECT COUNT(*) FROM ((SELECT * FROM '{pb}') EXCEPT ALL (SELECT * FROM '{pa}')))
            """).fetchone()
            if n1 != n2 or d1 or d2:
                bad.append((name, (n1, n2, d1, d2)))
                print(f"DIFF {name}: rows {n1} vs {n2}, asymm {d1}/{d2}")
            else:
                print(f"SAME {name}: {n1} rows")
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append((name, str(e)[:120]))
            print(f"ERR  {name}: {e}")
    print(f"\n{len(names) - len(bad)} identical / {len(bad)} mismatched")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
