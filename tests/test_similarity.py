"""Similarity-search tests: cosine vs numpy, exact top-k, LSH recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ffn_polars_spark.operators.similarity import (
    ann_topk,
    ann_topk_lsh,
    cosine,
    embedding_cosine_pairs,
)

DIM = 16


@pytest.fixture(scope="module")
def embdf(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((30, DIM)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(30)]
    # planted near-duplicates of vectors 0..4 (tiny perturbation)
    for j in range(5):
        rows.append((100 + j, (base[j] + 0.01 * rng.standard_normal(DIM).astype("float32")).tolist()))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_cosine_matches_numpy(spark, embdf):
    rows = embdf.orderBy("vec_id").limit(2).collect()
    a = np.array(rows[0]["embedding"], dtype="float64")
    b = np.array(rows[1]["embedding"], dtype="float64")
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    df = spark.createDataFrame(
        [(rows[0]["embedding"], rows[1]["embedding"])], ["a", "b"]
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    assert got == pytest.approx(expected, abs=1e-9)


def test_cosine_pairs_finds_planted(spark, embdf):
    pairs = {
        (r["id_a"], r["id_b"]) for r in embedding_cosine_pairs(embdf, threshold=0.95).collect()
    }
    for j in range(5):
        assert (j, 100 + j) in pairs


def test_ann_topk_exact(spark, embdf):
    out = ann_topk(embdf, embdf.where("vec_id < 2"), k=3)
    rows = out.orderBy("query_id", "rank").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["item_id"])
    # nearest neighbor of 0 is its planted near-dup 100, of 1 is 101
    assert by_q[0][0] == 100
    assert by_q[1][0] == 101
    assert all(len(v) == 3 for v in by_q.values())


def test_ann_topk_lsh_recall(spark, embdf):
    exact = {
        (r["query_id"], r["item_id"])
        for r in ann_topk(embdf, embdf.where("vec_id < 5"), k=3).collect()
    }
    approx = {
        (r["query_id"], r["item_id"])
        for r in ann_topk_lsh(
            embdf, embdf.where("vec_id < 5"), k=3, planes=6, tables=6
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall}"
    # the planted near-dup must be retrieved for every query
    for j in range(5):
        assert (j, 100 + j) in approx
