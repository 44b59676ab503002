"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real catalog lives in ``ffn_polars_spark/queries.py`` — one entry per
operator from SURVEY.md §2 plus the LLM-data-pipeline extensions; this module
is the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-style pricing
    summary over lineitem (scan -> filter -> hash agg; the driver checks
    rows>0 and a stable schema)."""
    from ffn_polars_spark.queries import QUERY_FNS

    return QUERY_FNS["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + pipeline ops).

    Each callable takes (spark, sf_dir) and returns a DataFrame whose column
    names match the oracle SQL exactly.
    """
    from ffn_polars_spark.queries import QUERY_FNS

    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins. Omitted entries (prob-mom's Student-t
    CDF, the random bootstraps, xxhash64-based MinHash/SimHash/LSH-ANN) are
    genuinely non-SQL-portable -> rows-only checks; their correctness is
    pinned by unit tests instead (tests/test_dedup.py, tests/test_ratios.py)."""
    from ffn_polars_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
