"""Local emulation of the driver's correctness gate: run every queries()
entry through Spark AND its oracle_sql() twin through DuckDB on the same
parquet, then compare row-count + schema + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ffn_polars_spark.sources import TESTDATA_TABLES, get_spark


def normalize(df, float_exact=True):
    """Sort columns by name, rows by values — the driver's order-insensitive
    view."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name, sdf, odf):
    if len(sdf) != len(odf):
        return f"ROWS {len(sdf)} vs {len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    a, b = normalize(sdf), normalize(odf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        for i in range(len(av)):
            x, y = av[i], bv[i]
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn:
                return f"NULLDIFF col={c} row={i}: {x!r} vs {y!r}"
            if isinstance(x, float) or isinstance(y, float):
                if float(x) != float(y):
                    return f"VALDIFF col={c} row={i}: {x!r} vs {y!r} (delta={float(x)-float(y):.3e})"
            elif str(x) != str(y):
                return f"VALDIFF col={c} row={i}: {x!r} vs {y!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: ORACLE ERROR {type(ex).__name__}: {str(ex)[:300]}")
            continue
        diff = compare(name, sdf, odf)
        if diff:
            failures.append(name)
            print(f"FAIL  {name}: {diff}")
        else:
            print(f"OK    {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
