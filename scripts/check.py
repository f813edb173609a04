#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare with the Spark parquet dump.

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    try:
        with open(f"{out_dir}/_errors.json") as f:
            spark_errors = json.load(f)
    except FileNotFoundError:
        spark_errors = {}

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            why = spark_errors.get(name, "no spark output")
            print(f"FAIL {name}: {why}")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(p) for p in files])
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        want = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"columns {list(got.columns)} vs {list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        else:
            if [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
                problems.append(
                    "dtypes " + str([(c, str(a), str(b)) for c, a, b in
                        zip(got.columns, got.dtypes, want.dtypes)
                        if str(a) != str(b)]))
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    eq = (a.isna() & b.isna()) | (a == b)
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    bad = (~eq).idxmax()
                    problems.append(
                        f"col {c}: {int((~eq).sum())} diffs, first@{bad}: "
                        f"{a[bad]!r} vs {b[bad]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1

    # rows-only entries (no oracle): just report row counts
    import os
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("q") and d not in oracles and \
                os.path.isdir(f"{out_dir}/{d}"):
            files = sorted(glob.glob(f"{out_dir}/{d}/*.parquet"))
            n = sum(len(pd.read_parquet(p)) for p in files) if files else 0
            print(f"ROWS {d}: {n}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
