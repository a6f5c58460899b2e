#!/usr/bin/env python3
"""Dev-only mirror of the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet, runs the oracle SQL from oracle_sql.json in
DuckDB over the same testdata parquet, sorts columns by name + rows by all
columns, and compares values exactly. Usage:

    python3 tools/check_oracle.py <sfDir> <outDir>

NOT part of the Scala library (driver-side python is out of bounds for the
engine itself); this exists so oracle drift is caught locally before the
driver's per-round run.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # bytes → hex for comparability
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # the driver hashes VALUES: a float64 123.0 vs int64 123 hash-differs
        # even though == passes. DuckDB SUM(BIGINT) returns HUGEINT → pandas
        # float64; oracles must CAST such sums back to BIGINT. Catch it here.
        kind_clash = None
        for c in got.columns:
            gk = got[c].dtype.kind
            wk = want[c].dtype.kind
            if {gk, wk} == {"f", "i"} or {gk, wk} == {"f", "u"}:
                kind_clash = (c, got[c].dtype, want[c].dtype)
                break
        if kind_clash:
            c, gd, wd = kind_clash
            print(f"FAIL {name}: dtype clash col={c}: spark={gd} oracle={wd} "
                  f"(driver hash distinguishes 123.0 from 123 — CAST the oracle)")
            failures += 1
            continue
        mismatch = None
        for c in got.columns:
            ga, wa = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if not values_equal(x, y):
                    mismatch = (c, i, x, y)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col={c} row={i}: spark={x!r} oracle={y!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    # queries without oracle: report rows for visibility
    import os
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("q") and name not in oracles and os.path.isdir(f"{out_dir}/{name}"):
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"INFO {name}: no oracle, {n} rows")
    print(f"\n{failures} failures / {len(oracles)} oracle-checked")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
