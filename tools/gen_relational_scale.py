"""Streamed relational tables for the third scale decade (sf10 / sf100).

`tools/gen_testdata.py` materializes every column as an in-memory Python
list — fine through sf1 (6M lineitem rows), hopeless at sf100 (600M rows).
This generator streams ONLY the tables the relational/bootstrap headline
queries read (lineitem, orders, customer, supplier, part, nation, region,
events) in numpy-vectorized chunks through a ParquetWriter with realistic
64k-row groups, the same approach as tools/gen_corpus_scale.py for the
corpus decade.

Schemas and structural invariants match gen_testdata.py exactly (events.ts
strictly increasing and globally unique at µs resolution; key domains
consistent across tables); values are NOT identical to gen_testdata output
— this data is for scale measurement (docs/scaling.md), not the
correctness gate.

Usage::

    python tools/gen_relational_scale.py OUTDIR SF [SF ...]

e.g. ``python tools/gen_relational_scale.py /tmp/td 10 100`` writes
/tmp/td/sf10 and /tmp/td/sf100 (skipping tables that already exist, so a
corpus-decade dir can be extended in place).
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = datetime(2023, 1, 2, 9, 30, 0)
BASE_US = np.datetime64(BASE, "us").astype("int64")
# orders/lineitem use the canonical 1995–2001 era (see gen_testdata.py:
# REL_BASE) so date-filtered queries like pricing_summary are non-vacuous
REL_BASE_US = np.datetime64(datetime(1995, 1, 2), "us").astype("int64")
REL_SPAN_DAYS = 2400
ROW_GROUP = 65536
CHUNK = 4_000_000

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "scroll", "hover"]


def _pick(options, idx):
    """Vectorized options[idx] as a pyarrow array (no Python-level loop)."""
    return pa.array(np.asarray(options, dtype=object)[idx])


def _stream(path: str, schema: pa.Schema, batches) -> None:
    if os.path.exists(path):
        print(f"  skip {os.path.basename(path)}: exists")
        return
    tmp = path + ".tmp"
    with pq.ParquetWriter(tmp, schema) as w:
        for batch in batches:
            w.write_table(pa.Table.from_arrays(batch, schema=schema),
                          row_group_size=ROW_GROUP)
    os.rename(tmp, path)
    print(f"  wrote {os.path.basename(path)} "
          f"({os.path.getsize(path) / 1e9:.2f} GB)")


def gen(outdir: str, sf: float, seed: int = 42) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_li = max(600, int(6_000_000 * sf))
    n_ord = n_li // 4
    n_cust = max(30, int(150_000 * sf))
    n_supp = max(5, int(10_000 * sf))
    n_part = max(40, int(200_000 * sf))
    n_ev = max(200, int(1_000_000 * sf))

    def j(name):
        return os.path.join(outdir, f"{name}.parquet")

    # tiny dims: written whole
    if not os.path.exists(j("region")):
        pq.write_table(pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }), j("region"))
        print("  wrote region.parquet")
    if not os.path.exists(j("nation")):
        pq.write_table(pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i:02d}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }), j("nation"))
        print("  wrote nation.parquet")

    cust_schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ])

    def cust_batches():
        for lo in range(0, n_cust, CHUNK):
            hi = min(lo + CHUNK, n_cust)
            keys = np.arange(lo + 1, hi + 1, dtype=np.int64)
            yield [
                pa.array(keys),
                pa.array([f"Customer#{k:09d}" for k in keys]),
                pa.array(rng.integers(0, 25, hi - lo).astype(np.int32)),
                pa.array(np.round(rng.uniform(-999.99, 9999.99, hi - lo), 2)),
                _pick(SEGMENTS, keys % 5),
            ]

    _stream(j("customer"), cust_schema, cust_batches())

    supp_schema = pa.schema([
        ("s_suppkey", pa.int64()), ("s_name", pa.string()),
        ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64()),
    ])

    def supp_batches():
        for lo in range(0, n_supp, CHUNK):
            hi = min(lo + CHUNK, n_supp)
            keys = np.arange(lo + 1, hi + 1, dtype=np.int64)
            yield [
                pa.array(keys),
                pa.array([f"Supplier#{k:09d}" for k in keys]),
                pa.array(rng.integers(0, 25, hi - lo).astype(np.int32)),
                pa.array(np.round(rng.uniform(-999.99, 9999.99, hi - lo), 2)),
            ]

    _stream(j("supplier"), supp_schema, supp_batches())

    part_schema = pa.schema([
        ("p_partkey", pa.int64()), ("p_name", pa.string()),
        ("p_brand", pa.string()), ("p_type", pa.string()),
        ("p_size", pa.int32()), ("p_retailprice", pa.float64()),
    ])

    def part_batches():
        for lo in range(0, n_part, CHUNK):
            hi = min(lo + CHUNK, n_part)
            keys = np.arange(lo + 1, hi + 1, dtype=np.int64)
            b = (keys % 5 + 1).astype(np.int64)
            yield [
                pa.array(keys),
                pa.array([f"part {k} burnished steel" for k in keys]),
                pa.array([f"Brand#{v}{v}" for v in b]),
                _pick([f"TYPE {i}" for i in range(25)], keys % 25),
                pa.array(rng.integers(1, 51, hi - lo).astype(np.int32)),
                pa.array(np.round(rng.uniform(900.0, 2000.0, hi - lo), 2)),
            ]

    _stream(j("part"), part_schema, part_batches())

    ord_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ])

    def ord_batches():
        day_us = 86_400_000_000
        for lo in range(0, n_ord, CHUNK):
            hi = min(lo + CHUNK, n_ord)
            n = hi - lo
            keys = np.arange(lo + 1, hi + 1, dtype=np.int64)
            days = rng.integers(0, REL_SPAN_DAYS, n).astype(np.int64)
            yield [
                pa.array(keys),
                pa.array(rng.integers(1, n_cust + 1, n).astype(np.int64)),
                _pick(["O", "F", "P"], keys % 3),
                pa.array(np.round(rng.uniform(1000.0, 400000.0, n), 2)),
                pa.array(REL_BASE_US + days * day_us, pa.timestamp("us")),
                _pick(PRIORITIES, keys % 5),
            ]

    _stream(j("orders"), ord_schema, ord_batches())

    li_schema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ])

    def li_batches():
        day_us = 86_400_000_000
        for lo in range(0, n_li, CHUNK):
            hi = min(lo + CHUNK, n_li)
            n = hi - lo
            idx = np.arange(lo, hi, dtype=np.int64)
            days = rng.integers(0, REL_SPAN_DAYS, n).astype(np.int64)
            yield [
                pa.array(rng.integers(1, n_ord + 1, n).astype(np.int64)),
                pa.array(rng.integers(1, n_part + 1, n).astype(np.int64)),
                pa.array(rng.integers(1, n_supp + 1, n).astype(np.int64)),
                pa.array((idx % 7 + 1).astype(np.int32)),
                pa.array(np.floor(rng.uniform(1, 51, n))),
                pa.array(np.round(rng.uniform(1000.0, 100000.0, n), 2)),
                pa.array(np.round(rng.uniform(0.0, 0.1, n), 2)),
                pa.array(np.round(rng.uniform(0.0, 0.08, n), 2)),
                _pick(["A", "N", "R"], idx % 3),
                _pick(["O", "F"], idx % 2),
                pa.array(REL_BASE_US + days * day_us, pa.timestamp("us")),
            ]

    _stream(j("lineitem"), li_schema, li_batches())

    ev_schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])

    def ev_batches():
        # strictly-increasing unique µs timestamps, carried across chunks
        last_us = BASE_US
        for lo in range(0, n_ev, CHUNK):
            hi = min(lo + CHUNK, n_ev)
            n = hi - lo
            idx = np.arange(lo, hi, dtype=np.int64)
            gaps = rng.integers(100_000, 5_000_000, n).astype(np.int64)
            ts = last_us + np.cumsum(gaps)
            last_us = int(ts[-1])
            yield [
                pa.array(idx),
                pa.array(ts, pa.timestamp("us")),
                pa.array(rng.integers(1, max(2, n_ev // 20), n).astype(np.int64)),
                _pick(EVENT_TYPES, rng.integers(0, 5, n)),
                pa.array(rng.normal(0.0, 40.0, n)),
                _pick([f'{{"k": {i}}}' for i in range(10)], idx % 10),
            ]

    _stream(j("events"), ev_schema, ev_batches())


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    root = sys.argv[1]
    for s in sys.argv[2:]:
        sf = float(s)
        outdir = os.path.join(root, f"sf{sf:g}")
        print(f"generating {outdir} (sf={sf:g})")
        gen(outdir, sf)


if __name__ == "__main__":
    main()
