"""Local replica of the driver's t2 correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]

Set SPARK_GRAFT_HOSTILE=1 to replicate the judge's hostile-config
session (ANSI mode on, non-UTC session timezone) before each query —
every impl must call session.configure() and survive it.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from nifi_minifi_cpp_spark.session import TABLES, get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df_pandas):
    """Canonical (columns, rows) with TYPE-SENSITIVE values.

    The driver's hash is string-level, so DuckDB HUGEINT -> pandas
    float64 ("1636.0") mismatches Spark int64 ("1636") even when the
    values are numerically equal. Python's ``1636 == 1636.0`` is True,
    which is exactly how the three round-1 hash failures shipped green
    locally — so every value is tagged with its type kind and floats
    keep a float repr.
    """
    import numpy as np

    cols = sorted(df_pandas.columns)
    rows = []
    for _, row in df_pandas[cols].iterrows():
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(("null", None))
            elif isinstance(v, (bool, np.bool_)):
                vals.append(("bool", bool(v)))
            elif isinstance(v, (int, np.integer)):
                vals.append(("int", int(v)))
            elif isinstance(v, (float, np.floating)):
                vals.append(("float", round(float(v), 9)))
            elif hasattr(v, "isoformat"):
                vals.append(("ts", v.isoformat()))
            else:
                vals.append((type(v).__name__, v))
        rows.append(tuple(vals))
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main():
    import __spark_entry__ as entry

    only = set(sys.argv[2:]) if len(sys.argv) > 2 else None
    spark = get_spark("correctness-check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    hostile = os.environ.get("SPARK_GRAFT_HOSTILE") == "1"
    if hostile:
        print("HOSTILE session: ansi=true, tz=America/New_York (configure() must win)")
    con = duck_connection(SF_DIR)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if hostile:
            # the driver may hand each query a session with adversarial
            # configs; configure(spark) inside the impl must reassert ours
            spark.conf.set("spark.sql.ansi.enabled", "true")
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {str(e)[:300]}")
            continue
        s_cols, s_rows = canon(sdf)
        o_cols, o_rows = canon(odf)
        if s_cols != o_cols:
            failures.append(name)
            print(f"FAIL {name}: columns {s_cols} vs {o_cols}")
            continue
        if len(s_rows) != len(o_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(o_rows)}")
            continue
        if s_rows != o_rows:
            failures.append(name)
            diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            continue
        print(f"OK   {name}: {len(s_rows)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
