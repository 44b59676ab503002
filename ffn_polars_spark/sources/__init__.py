"""Data sources: session builder, testdata loaders, golden-CSV reader.

The reference's only scan is ``pl.read_csv`` in its test fixture
(tests/fixtures.py:11); Spark gives us Parquet/CSV/JSON plus predicate
pushdown and column pruning for free, so the engine standardizes on these
helpers for all I/O.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def configure(spark: SparkSession) -> SparkSession:
    """Runtime confs the engine depends on; safe to apply to an externally
    created session (the correctness driver owns its own SparkSession).

    * ``nanosAsLong``: the tick tables carry parquet TIMESTAMP(NANOS) — Spark
      has no ns-precision timestamp, so they surface as epoch-ns LongType,
      exactly the engine's tick time axis (FIXTURES.md).
    * UTC session timezone: calendar functions on naive timestamps must agree
      with the (UTC-based) oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "ffn-polars-spark", cpus: Optional[int] = None) -> SparkSession:
    """Local session tuned for the test/bench environment.

    On a real cluster these settings come from spark-submit; the knobs that
    matter at scale are set the same way here: AQE on (runtime re-plan, skew
    join handling), Arrow on (every pandas_udf boundary is Arrow-batched),
    shuffle partitions sized to the parallelism.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    session = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        # local single-file tables split into ~file_size/maxPartitionBytes
        # scan tasks; the default 128 MB leaves most cores idle on CPU-bound
        # projections (a 380 MB file = 3 tasks on 32 cores). 16 MB is a
        # LOCAL tuning — clusters set their own via spark-submit.
        .config("spark.sql.files.maxPartitionBytes", "16MB")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # UI off by default (test startup cost); bench.py turns it on via the
        # env knob to read per-stage metrics from the UI REST API
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .getOrCreate()
    )
    return configure(session)


def load_testdata(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """All driver-generated parquet tables from one scale-factor directory."""
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in TESTDATA_TABLES
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet"))
    }


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def ts_ns_col(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-nanosecond tick-time Column, µs-aligned, robust to how the
    testdata was written.

    The driver's ``events.ts`` has shipped both as parquet TIMESTAMP(NANOS)
    (surfaces as epoch-ns LongType under ``nanosAsLong``) and as plain
    ``timestamp[us]`` (surfaces as TIMESTAMP_NTZ, which ``nanosAsLong``
    does not touch).  Both paths normalize to the same µs-truncated epoch-ns
    integer the DuckDB oracle computes with ``epoch_us(ts) * 1000``:

    * LongType epoch-ns → ``ts div 1000 * 1000`` (truncate sub-µs noise —
      DuckDB reads TIMESTAMP(NANOS) at µs precision).
    * timestamp / TIMESTAMP_NTZ → ``unix_micros(cast(ts as timestamp)) *
      1000`` (exact under the UTC session timezone :func:`configure` sets).

    Dispatching on the *read* dtype here — rather than assuming a writer
    convention — is what keeps the whole tick catalog alive when the
    testdata generator changes its parquet logical type.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return F.expr(f"`{col}` div 1000") * F.lit(1000)
    return F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000)


GOLDEN_CSV = "/root/reference/tests/data/test_data.csv"


def load_golden_prices(spark: SparkSession, path: str = GOLDEN_CSV) -> DataFrame:
    """The reference's 10-year AAPL/MSFT/C daily close CSV (M/D/YYYY dates),
    used by its golden-value tests (tests/fixtures.py:8-17)."""
    raw = spark.read.csv(path, header=True, inferSchema=True)
    return raw.select(
        F.to_date("Date", "M/d/yyyy").alias("Date"),
        F.col("AAPL").cast("double"),
        F.col("MSFT").cast("double"),
        F.col("C").cast("double"),
    )


# ---------------------------------------------------------------------------
# Sinks.
# ---------------------------------------------------------------------------

def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by=None,
    max_records_per_file: Optional[int] = None,
) -> None:
    """Write a (partitioned) table.

    ``partition_by`` is the scale lever: partitioning tick data by
    date/ticker prunes whole directories at read time (PartitionFilters in
    the scan), which is the difference between touching one day and touching
    100 TB. ``max_records_per_file`` caps file size so downstream scans
    parallelize regardless of writer parallelism.
    """
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by,
    num_buckets: int = 32,
    sort_by=None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles on the join/agg key at write time: two tables
    bucketed the same way join with ZERO exchanges, and per-key windows skip
    their sort when ``sort_by`` matches. This is the co-located-join story
    for keys too big to broadcast.
    """
    bucket_cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(int(num_buckets), *bucket_cols)
    if sort_by:
        sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: Optional[str] = None,
    max_records_per_file: Optional[int] = None,
) -> None:
    """Write a table as JSON Lines — the interchange format LLM corpora
    ship in (one JSON object per line; gzip/zstd splittable-enough when
    written as many files).

    ``max_records_per_file`` keeps individual .jsonl files bounded so a
    re-read parallelizes regardless of writer parallelism — the same
    small-files/giant-files lever as the parquet writer.
    """
    w = df.write.format("json").mode(mode)
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.save(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read JSON Lines. ALWAYS pass ``schema`` in production: without it
    Spark runs a full extra pass over the data just to infer types — at
    100 TB that is a second 100 TB scan before the first real job, and
    inference can also silently widen/narrow types between runs. With an
    explicit schema the read is a single streaming-decode scan and
    malformed lines land in ``_corrupt_record`` instead of failing type
    inference."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: Optional[str] = None,
    max_records_per_file: Optional[int] = None,
) -> None:
    """Write a table as quoted CSV with escaping that survives embedded
    newlines, quotes, and unicode (quote-doubling, the RFC 4180 dialect) —
    the lowest-common-denominator export every downstream consumer can
    read. Re-reading a multiline CSV cannot split a file across tasks
    (records cross line boundaries), so ``max_records_per_file`` is the
    lever that keeps files small enough for read parallelism.
    """
    w = (
        df.write.format("csv")
        .mode(mode)
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')  # RFC 4180 quote-doubling
        # the writer TRIMS cell whitespace by default — byte-exactness
        # requires turning that off explicitly
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
    )
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.save(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read CSV written by :func:`write_csv`. ALWAYS pass ``schema`` in
    production (same one-extra-full-scan inference trap as
    :func:`read_jsonl`); ``multiLine`` honors quoted embedded newlines."""
    r = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
    )
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_records_per_file: Optional[int] = None,
) -> None:
    """Write ORC — the other columnar interchange format (Hive/Trino
    ecosystems); same pushdown/pruning properties as parquet from Spark's
    side, so it's a drop-in sink where the consumer dictates ORC."""
    w = df.write.format("orc").mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC (schema travels with the file — no inference pass)."""
    return spark.read.orc(path)


def write_bucketed_table(
    df: "DataFrame",
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table —
    Spark's co-located-join layout: two tables bucketed by the same key
    into the same bucket count join with NO exchange on either side (and
    with ``sortBy``, no sort either — the sort-merge join reads both
    sides' buckets pre-sorted). This is the layout decision that removes
    the dominant shuffle from every future join at 100 TB fact-table
    scale; the write pays one up-front shuffle.

    tests/test_plans.py pins the exchange-free join plan.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    # a stale warehouse directory from a previous session is not in this
    # session's catalog, so mode("overwrite") cannot claim it — drop both
    # the table entry and the location
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    loc = os.path.join(wh.path or wh.netloc, table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(int(n_buckets), key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
