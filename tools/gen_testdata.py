"""Generate schema-compatible synthetic test tables.

The engine's test-suite and bench read a TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings`` tables (one parquet file each —
see TESTDATA.md for the layout).  This generator produces the same schemas
and the same structural invariants the tests rely on:

* ``events.ts``: strictly increasing timestamps, globally unique at
  microsecond resolution (the tick time axis).
* ``documents``: planted near-duplicate groups (case/whitespace variants of
  shared contents) so dedup operators have true positives.
* ``embeddings``: 64-wide float vectors with planted near-duplicates of the
  first few ids (ANN/dedup recall targets).

Usage::

    python tools/gen_testdata.py OUTDIR [sf ...]   # default sfs: 0.001

It never overwrites an existing sf directory — the canonical driver-generated
data (which this deliberately does NOT reproduce value-for-value; it matches
schema and invariants only) always wins.
"""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = datetime(2023, 1, 2, 9, 30, 0)
# Relational (orders/lineitem) dates follow the canonical driver data's
# 1995–2001 era, NOT the events era: pricing_summary filters
# l_shipdate <= 1998-09-02, and with 2023 ship dates that entry (and any
# other date-filtered relational query) passes VACUOUSLY (0 rows == 0
# rows) on generated data — CI would never notice the filter or the agg
# breaking. ~6.5 years also gives the calendar ops (CAGR/MTD/YTD on the
# orders-derived price series) real multi-year structure.
REL_BASE = datetime(1995, 1, 2)
REL_SPAN_DAYS = 2400

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "scroll", "hover"]
LANGS = ["en", "de", "fr", "es", "it"]
SOURCES = ["web", "books", "wiki", "code", "news"]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    # Realistic row groups (~64k rows), NOT pyarrow's one-giant-group
    # default: a parquet row group is Spark's atomic read unit, so a
    # single-row-group file serializes every scan onto one task no matter
    # the cluster size. The engine defends against that layout anyway
    # (operators/_scanmeta.spread_scan — exercised by the canonical
    # driver-written testdata, which ships single-group), but a GENERATOR
    # should produce what sane pipelines produce.
    pq.write_table(
        table, os.path.join(outdir, f"{name}.parquet"), row_group_size=65536
    )


def generate(outdir: str, sf: float, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=False)

    # Row counts mirror the canonical driver data (TESTDATA.md dirs):
    # lineitem 6M/sf-unit, events 1M, orders n_li/4, customer 150k,
    # supplier 10k, part 200k — documents/embeddings scale SUB-linearly
    # (max(500, 50k·sf) / max(500, 20k·sf)), matching the shipped tables.
    n_li = max(600, int(6_000_000 * sf))
    n_ord = n_li // 4
    n_cust = max(30, int(150_000 * sf))
    n_supp = max(5, int(10_000 * sf))
    n_part = max(40, int(200_000 * sf))
    n_ev = max(200, int(1_000_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i % 5] for i in range(n_cust)],
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": [f"part {i} burnished steel" for i in range(1, n_part + 1)],
        "p_brand": [f"Brand#{i % 5 + 1}{i % 5 + 1}" for i in range(n_part)],
        "p_type": [f"TYPE {i % 25}" for i in range(n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2000.0, n_part), 2),
    }))

    o_dates = [
        REL_BASE + timedelta(days=int(d))
        for d in rng.integers(0, REL_SPAN_DAYS, n_ord)
    ]
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), pa.int64()),
        "o_orderstatus": [("O", "F", "P")[i % 3] for i in range(n_ord)],
        "o_totalprice": np.round(rng.uniform(1000.0, 400000.0, n_ord), 2),
        "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i % 5] for i in range(n_ord)],
    }))

    l_ship = [
        REL_BASE + timedelta(days=int(d))
        for d in rng.integers(0, REL_SPAN_DAYS, n_li)
    ]
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(1, n_ord + 1, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li), pa.int64()),
        "l_linenumber": pa.array((np.arange(n_li) % 7) + 1, pa.int32()),
        "l_quantity": np.floor(rng.uniform(1, 51, n_li)),
        "l_extendedprice": np.round(rng.uniform(1000.0, 100000.0, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": [("A", "N", "R")[i % 3] for i in range(n_li)],
        "l_linestatus": [("O", "F")[i % 2] for i in range(n_li)],
        "l_shipdate": pa.array(l_ship, pa.timestamp("us")),
    }))

    # events: strictly-increasing, globally-unique microsecond timestamps
    gaps_us = rng.integers(100_000, 5_000_000, n_ev)  # 0.1-5 s spacing
    ts = np.datetime64(BASE, "us") + np.cumsum(gaps_us).astype("timedelta64[us]")
    _write(outdir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, max(2, n_ev // 20), n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[int(i)] for i in rng.integers(0, 5, n_ev)],
        # full-precision values: rounding to a few decimals makes derived
        # averages land exactly on 1e-6 rounding boundaries, where a 1-ulp
        # accumulation-order difference between engines flips the r6/R()
        # comparison (observed on rolling_stats)
        "value": rng.normal(0.0, 40.0, n_ev),
        "props": [f'{{"k": {i % 10}}}' for i in range(n_ev)],
    }))

    # documents: rich random-vocabulary texts (~40-70 tokens, like the
    # canonical ~54-token average) so the shingle distribution has no hot
    # keys; the last third are near-duplicate variants of earlier docs
    # (case/whitespace/appended-tail edits) so dedup has true positives
    vocab = [f"word{i:04d}" for i in range(5000)]
    n_base = max(1, n_doc * 2 // 3)
    base_texts = []
    texts = []
    for i in range(n_doc):
        if i < n_base:
            ln = 40 + int(rng.integers(0, 30))
            t = " ".join(vocab[w] for w in rng.integers(0, len(vocab), ln))
            base_texts.append(t)
            texts.append(t)
        else:
            src = base_texts[int(rng.integers(0, n_base))]
            mode = i % 3
            if mode == 0:
                texts.append(src.upper())
            elif mode == 1:
                texts.append(f"  {src} ")
            else:
                texts.append(src + f" tail{i}")
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i % 5] for i in range(n_doc)],
        "source": [SOURCES[i % 5] for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 64-wide, with near-duplicates of ids 0..4 planted at the end
    dim = 64
    vecs = rng.standard_normal((n_emb, dim)).astype("float32")
    for j in range(min(5, n_emb // 2)):
        vecs[n_emb - 1 - j] = vecs[j] + 0.01 * rng.standard_normal(dim).astype("float32")
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    root = sys.argv[1]
    sfs = [float(s) for s in sys.argv[2:]] or [0.001]
    for sf in sfs:
        outdir = os.path.join(root, f"sf{sf:g}")
        if os.path.exists(outdir):
            print(f"skip {outdir}: exists (never overwrite canonical data)")
            continue
        generate(outdir, sf)
        print(f"wrote {outdir}")


if __name__ == "__main__":
    main()
