"""deterministic_split / shard_by_tokens / winnow_overlap_pairs contracts."""

from pyspark.sql import functions as F

from ffn_polars_spark.operators.pipeline import deterministic_split, shard_by_tokens
from ffn_polars_spark.operators.text import winnow_overlap_pairs


def test_split_is_deterministic_and_total(spark):
    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in deterministic_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in deterministic_split(docs.repartition(7)).collect()}
    assert a == b  # partitioning can't move a doc between splits
    assert len(a) == 500 and set(a.values()) <= {"train", "val", "test"}
    # weights are honored to within bucket granularity on a hash sample
    frac_train = sum(v == "train" for v in a.values()) / 500
    assert 0.8 < frac_train < 0.97


def test_split_salt_rerolls_and_weights_cut(spark):
    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    base = {r["doc_id"]: r["split"] for r in deterministic_split(docs).collect()}
    salted = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs, salt="v2").collect()
    }
    assert base != salted  # salt re-rolls assignment
    half = deterministic_split(docs, weights={"a": 0.5, "b": 0.5}).collect()
    for r in half:
        assert r["split"] == ("a" if r["bucket"] < 5000 else "b")


def test_shard_by_tokens_matches_serial_prefix_sum(spark):
    rows = [(i, "w " * (3 + (i * 7) % 11)) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # small block forces multiple cumsum blocks, exercising the offset pass
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in shard_by_tokens(docs, budget=50, block=64).collect()
    }
    cum = 0
    for i in range(200):
        n = len(rows[i][1].split())
        assert got[i] == (n, cum // 50)
        cum += n
    # shard ids are nondecreasing in doc order and start at 0
    shard_seq = [got[i][1] for i in range(200)]
    assert shard_seq[0] == 0 and all(a <= b for a, b in zip(shard_seq, shard_seq[1:]))


def test_winnow_overlap_pairs_finds_heavy_overlap_only(spark):
    shared = "a long identical run of characters that both documents quote verbatim"
    docs = spark.createDataFrame(
        [
            (1, f"intro {shared} outro one"),
            (2, f"completely different lead-in {shared}"),
            (3, "nothing in common with the others whatsoever zzz qqq"),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]): r for r in winnow_overlap_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["containment"] > 0.4
    assert all(3 not in p for p in pairs)
