#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle parity check.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
named after the parquet tables in <sfDir>, loads the Spark result parquet
from <verifyOutDir>/<name>/, sorts columns by name (as the driver does),
and compares row counts, schemas, and values (exact, with a tolerance
diagnostic on mismatch).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(out_dir, sf_dir, subset=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        # An explicitly-requested subset skips the rest quietly; in a FULL
        # run a missing result dir means the query CRASHED during Verify
        # (exceptions are caught there and no parquet is written) — that
        # must FAIL, not vanish from the report.
        if subset is not None and name not in subset:
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: no Spark result dir "
                  f"(query crashed during Verify, or was never run)")
            n_fail += 1
            continue
        try:
            orel = con.sql(sql)
            otypes = dict(zip(orel.columns, (str(t) for t in orel.types)))
            odf = orel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            srel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            stypes = dict(zip(srel.columns, (str(t) for t in srel.types)))
            sdf = srel.df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        # Type-class check: the driver's value hash is representation-
        # sensitive. DuckDB SUM(int) -> HUGEINT lands in pandas as
        # float64 while Spark emits BIGINT (int64) -> hash mismatch,
        # but Python's 1000.0 == 1000 made the old value loop blind to
        # it. Integer *widths* (int32 vs int64) hash the same driver-
        # side, so compare pandas dtype KIND (i/u/f/b/O/M), not the raw
        # DuckDB type. Report the DuckDB types for diagnosis.
        def kind(df, c):
            k = df[c].dtype.kind
            return "i" if k == "u" else k
        tdiff = [c for c in ocols if kind(odf, c) != kind(sdf, c)]
        if tdiff:
            c = tdiff[0]
            print(f"FAIL {name}: type class differs col {c}: "
                  f"oracle={otypes[c]}({odf[c].dtype}) "
                  f"spark={stypes[c]}({sdf[c].dtype}) "
                  f"({len(tdiff)} col(s) total)")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows differ oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        o = odf[ocols].values.tolist()
        s = sdf[scols].values.tolist()
        bad = None
        worst = 0.0
        for i, (orow, srow) in enumerate(zip(o, s)):
            for j, (a, b) in enumerate(zip(orow, srow)):
                a, b = norm(a), norm(b)
                if a != b:
                    if (isinstance(a, float) and isinstance(b, float)):
                        d = abs(a - b) / max(1.0, abs(a))
                        worst = max(worst, d)
                        if bad is None:
                            bad = (i, ocols[j], a, b)
                    else:
                        bad = (i, ocols[j], a, b)
                        worst = float("inf")
        if bad is None:
            print(f"PASS {name}: {len(odf)} rows exact")
            n_pass += 1
        else:
            i, c, a, b = bad
            print(f"FAIL {name}: first diff row {i} col {c}: "
                  f"oracle={a!r} spark={b!r} (worst rel err {worst:.2e})")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  subset=set(sys.argv[3:]) if len(sys.argv) > 3 else None))
