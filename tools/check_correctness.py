#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same
testdata parquet tables, and compares:
  - column name sets (sorted-by-name, like the driver)
  - row counts
  - values: exact for non-floats; exact-bits first, then 1e-9 rel
    tolerance reported separately for floats (the driver may be
    strict, so we want exact).

This script is a dev-side verification tool only — it is not part of
the Spark library.
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    return ds.dataset(path, format="parquet").to_table().to_pandas()


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b


def values_close(a, b):
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (TypeError, ValueError):
        return values_equal(a, b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = load_spark_result(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        exact = True
        close = True
        first_diff = None
        for col in g.columns:
            gv, ev = g[col].tolist(), e[col].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                # pandas NaN-vs-None normalization
                if (a is None or (isinstance(a, float) and math.isnan(a))) and \
                   (b is None or (isinstance(b, float) and math.isnan(b))):
                    continue
                if not values_equal(a, b):
                    exact = False
                    if not values_close(a, b):
                        close = False
                        if first_diff is None:
                            first_diff = (col, i, a, b)
        if exact:
            print(f"PASS {name}: {len(got)} rows, exact match")
            n_pass += 1
        elif close:
            print(f"WARN {name}: {len(got)} rows, within 1e-9 but NOT exact"
                  f" — tighten arithmetic")
            n_fail += 1
        else:
            col, i, a, b = first_diff
            print(f"FAIL {name}: value mismatch col={col} row={i}: {a!r} != {b!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
