#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate — DTYPE-STRICT.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same
testdata parquet tables, and compares:
  - column name sets (sorted-by-name, like the driver)
  - row counts
  - per-column DTYPE KINDS (int vs float vs bool vs other). This is
    the round-4 lesson: DuckDB types SUM(<integer>) as HUGEINT which
    pandas renders as float64 (120.0), while Spark emits int64 (120).
    The driver's value hash sees "120.0" != "120" and fails, but a
    float(a) == float(b) comparison is blind to it — which is exactly
    how q23/q29/q51/q54 stayed red for three rounds while this script
    reported "bit-exact". An integer-kind vs float-kind mismatch is
    now a hard FAIL even when every value compares float-equal.
  - values: exact for non-floats; exact-bits first, then 1e-9 rel
    tolerance reported separately for floats (the driver is strict,
    so we want exact).

It also LINTS declared result types: for each oracle SQL it reads the
DuckDB relation's logical types (rel.types) and the Spark result's
parquet/arrow schema, and reports any integer/float-kind divergence —
this catches HUGEINT (SUM of integers), `x // y` (DuckDB int division
of HUGEINT stays HUGEINT), and MIN/MAX-of-int32 style traps even when
the sampled values happen to collide.

This script is a dev-side verification tool only — it is not part of
the Spark library.
"""
import decimal
import json
import math
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark_dataset(path):
    return ds.dataset(path, format="parquet")


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_kind(dt):
    """Collapse a pandas dtype to a comparison kind.

    int/uint -> 'int', float -> 'float', bool -> 'bool',
    datetime -> 'time', everything else (object: str, list, decimal)
    -> 'other'. A nullable int column surfaces as float64 on BOTH
    sides (pyarrow and duckdb both promote int+NULL to float64 in
    pandas), so null-promotion does not produce false positives here.
    """
    k = dt.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "time"
    return "other"


def series_kind(s):
    """dtype_kind, but resolves object columns that hold Decimals.

    The round-19 lesson: Spark parquet decimals arrive in pandas as
    object columns of decimal.Decimal (full declared scale,
    Decimal('95455.770')) while DuckDB's .df() converts DECIMAL
    results to float64 (95455.77). Both values compare float-equal,
    but the driver hashes the RENDERED values and sees them apart —
    so 'decimal' must be its own kind, never 'other', or the
    dtype-strict check silently skips the exact divergence that kept
    q226/q230/q231/q232/q235 red for two rounds.
    """
    k = dtype_kind(s.dtype)
    if k == "other":
        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if isinstance(v, decimal.Decimal):
                return "decimal"
            break
    return k


def arrow_kind(t):
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_temporal(t):
        return "time"
    if pa.types.is_decimal(t):
        return "decimal"
    return "other"


def duckdb_kind(t):
    """Map a DuckDB logical type name to a kind, flagging the traps.

    HUGEINT/UHUGEINT are logically integer but pandas renders them as
    float64, so against a Spark int64 they are a hash divergence —
    classify them as their own kind so the lint always surfaces them.
    """
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if s == "BOOLEAN":
        return "bool"
    if s.startswith("TIMESTAMP") or s in ("DATE", "TIME", "INTERVAL"):
        return "time"
    return "other"


def lint_declared_types(name, rel, spark_schema):
    """Compare DuckDB declared result types vs Spark result schema.

    Returns a list of human-readable mismatch strings (empty = clean).
    Only integer/float-kind divergence is flagged — VARCHAR vs string
    etc. all map to 'other' and are fine.
    """
    problems = []
    duck = dict(zip(rel.columns, [duckdb_kind(t) for t in rel.types]))
    duck_raw = dict(zip(rel.columns, [str(t) for t in rel.types]))
    for field in spark_schema:
        if field.name not in duck:
            continue  # column-set mismatch reported elsewhere
        sk = arrow_kind(field.type)
        dk = duck[field.name]
        if dk == "hugeint":
            problems.append(
                f"col={field.name}: DuckDB {duck_raw[field.name]} "
                f"(pandas float64) vs Spark {field.type} — CAST the "
                f"oracle column AS BIGINT")
        elif sk == "decimal" or dk == "decimal":
            # ANY decimal-typed result column is a render hazard:
            # pyarrow delivers Decimal objects at full declared scale,
            # DuckDB's .df() delivers float64 — even when both sides
            # declare DECIMAL the pandas conversions diverge and the
            # driver hash can never match.
            problems.append(
                f"col={field.name}: DECIMAL-typed result column "
                f"(spark={field.type}, duckdb={duck_raw[field.name]}) "
                f"— render hazard; CAST BOTH sides to VARCHAR/STRING "
                f"(exactness-preserving) or DOUBLE")
        elif {sk, dk} == {"int", "float"}:
            problems.append(
                f"col={field.name}: DuckDB {duck_raw[field.name]} ({dk}) "
                f"vs Spark {field.type} ({sk})")
    return problems


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


def main(sf_dir, out_dir, partial=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_lint = 0
    for name, sql in sorted(oracle.items()):
        # --partial: single-query Verify runs (graft.Verify <sf> <out>
        # <query...>) dump the full oracle map but only the named
        # outputs — skip the absent ones instead of failing them.
        if partial and not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            dset = load_spark_dataset(f"{out_dir}/{name}")
            got = dset.to_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            exp = rel.df()
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
        # Declared-type lint (independent of values; catches traps
        # even when the sampled values coincidentally hash-match).
        lint = lint_declared_types(name, rel, dset.schema)
        if lint:
            n_lint += len(lint)
            for p in lint:
                print(f"LINT {name}: {p}")
        g, e = canon(got), canon(exp)
        # DTYPE-STRICT: integer-kind vs float-kind per column is a
        # hard fail — the driver hashes "120" vs "120.0" differently.
        dtype_fail = None
        for col in g.columns:
            gk, ek = series_kind(g[col]), series_kind(e[col])
            if gk != ek and "other" not in (gk, ek):
                dtype_fail = (col, gk, ek)
                break
        if dtype_fail:
            col, gd, ed = dtype_fail
            print(f"FAIL {name}: dtype mismatch col={col}: "
                  f"spark={gd} oracle={ed} — values may compare equal "
                  f"but the driver hash will not"
                  + (" (Decimal objects vs float64: cast both sides "
                     "to STRING/VARCHAR or DOUBLE)"
                     if "decimal" in (gd, ed) else ""))
            n_fail += 1
            continue
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
    print(f"== {n_pass} pass, {n_fail} fail, {n_lint} declared-type lint(s)")
    if partial and n_pass == 0 and n_fail == 0:
        # Checking nothing must not read as green: the query under test
        # either failed inside Verify (it writes no dir) or the name
        # was mistyped (Verify's filter matched nothing).
        print("== PARTIAL RUN CHECKED ZERO DATASETS — query failed in "
              "Verify or name mistyped")
        return 1
    return 1 if n_fail or n_lint else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  partial="--partial" in sys.argv[3:]))
