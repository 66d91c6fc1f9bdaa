#!/usr/bin/env python3
"""Local dev harness: mimic the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`. For each
query output parquet under <outDir>, executes the matching oracle SQL
from oracle_sql.json in DuckDB against the same testdata tables and
compares: column names (sorted), row count, and exact values.

Dev tooling only — the shipped Scala library does not depend on this.

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    # The driver's hash compare is type-sensitive: every compared
    # column type outside this set has empirically hash-mismatched
    # (DECIMAL(38,2) emissions and DuckDB HUGEINT sums all failed in
    # round 2 while the same values as DOUBLE/BIGINT passed). The
    # mirror's pandas compare coerces dtypes and cannot see this, so
    # enforce the type contract explicitly on BOTH sides.
    GREEN = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
             "FLOAT", "TIMESTAMP", "TIMESTAMP_NS", "DATE", "VARCHAR",
             "BOOLEAN")

    def bad_types(describe_sql):
        rows = con.execute(f"DESCRIBE {describe_sql}").fetchall()
        return [(r[0], r[1]) for r in rows
                if r[1].split("(")[0].upper() not in GREEN]

    n_fail = 0
    n_skip = 0
    for name, sql in sorted(oracles.items()):
        # Verify's optional prefix filter dumps a subset — a missing
        # output dir there is "not requested", not a failure
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            bad_w = bad_types(sql)
            bad_g = bad_types(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            want = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if bad_w or bad_g:
            print(f"FAIL {name}: compared-column type outside the "
                  f"hash-proven set: oracle={bad_w} spark={bad_g}")
            n_fail += 1
            continue
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # exact, order-sensitive compare (mirror of the hash check)
        bad = []
        for c in want.columns:
            wc, gc = want[c], got[c]
            if wc.dtype != gc.dtype:
                try:
                    gc = gc.astype(wc.dtype)
                except Exception:  # noqa: BLE001
                    bad.append((c, "dtype", str(wc.dtype), str(gc.dtype)))
                    continue
            neq = ~((wc == gc) | (wc.isna() & gc.isna()))
            if neq.any():
                i = neq.idxmax()
                bad.append((c, f"row {i}", repr(wc[i]), repr(gc[i])))
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched col(s): {bad[:3]}")
            n_fail += 1
        else:
            print(f"ok   {name}: {len(got)} rows")
    n_checked = len(oracles) - n_skip
    skipped = f" ({n_skip} not dumped, skipped)" if n_skip else ""
    if n_checked == 0:
        # a mis-pointed or empty outDir must not read as a pass: with
        # every oracle skipped, this gate verified nothing
        print(f"FAIL: 0 queries checked{skipped} — wrong outDir?")
        return 1
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: "
          f"{n_checked - n_fail}/{n_checked} queries match{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
