"""Footer-based scan metadata (operators/_scanmeta.py): the plan walk, the
file cap, multi-file totals, and the exact/upper-bound/None contract that
both the ANN scale guards and the spread guards rely on."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.operators._scanmeta import (
    _FOOTER_FILE_CAP,
    bare_scan_row_count,
    scan_row_groups,
)


@pytest.fixture(scope="module")
def multi(tmp_path_factory, spark):
    """A 3-file parquet directory: 60+80+100 rows, 2 row groups per file."""
    d = tmp_path_factory.mktemp("multi")
    for i, n in enumerate((60, 80, 100)):
        pq.write_table(
            pa.table({"id": list(range(n))}),
            str(d / f"part-{i}.parquet"),
            row_group_size=50,
        )
    return spark.read.parquet(str(d))


def test_multi_file_totals(multi):
    assert bare_scan_row_count(multi) == 240
    assert scan_row_groups(multi) == 6  # 2+2+2


def test_walk_steps_only_known_nodes(multi, spark):
    # count-preserving shells keep exactness
    assert bare_scan_row_count(multi.select(F.col("id").alias("x"))) == 240
    assert bare_scan_row_count(multi.repartition(4)) == 240
    # reducing nodes need allow_reducing and yield the footer UPPER bound
    assert bare_scan_row_count(multi.where("id < 3")) is None
    assert bare_scan_row_count(multi.where("id < 3"), allow_reducing=True) == 240
    # row-increasing / non-relation shapes: never answered
    assert bare_scan_row_count(multi.join(multi.limit(1), "id"), allow_reducing=True) is None
    assert bare_scan_row_count(spark.range(5)) is None
    assert scan_row_groups(spark.range(5)) is None


def test_file_cap_falls_back(tmp_path, spark, monkeypatch):
    import ffn_polars_spark.operators._scanmeta as sm

    d = tmp_path / "many"
    d.mkdir()
    for i in range(4):
        pq.write_table(pa.table({"id": [i]}), str(d / f"f{i}.parquet"))
    df = spark.read.parquet(str(d))
    assert bare_scan_row_count(df) == 4
    # past the cap the helpers refuse (the probe job is cheaper than
    # thousands of driver-side footer opens)
    monkeypatch.setattr(sm, "_FOOTER_FILE_CAP", 3)
    assert bare_scan_row_count(df) is None
    assert scan_row_groups(df) is None
    assert _FOOTER_FILE_CAP >= 3  # module default untouched by the patch
