"""Inverted index and conjunctive keyword search semantics."""

import pytest

from ffn_polars_spark.operators.search import inverted_index, keyword_search


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark joins hash tables fast"),
            (2, "hash join hash join hash join"),
            (3, "sort merge join"),
            (4, "   "),
        ],
        ["doc_id", "text"],
    )


def test_inverted_index_postings_sorted_and_presence_based(docs):
    idx = {r.token: r for r in inverted_index(docs).collect()}
    # presence, not counts: doc 2's repeated "hash" appears once
    assert idx["hash"].n_docs == 2 and idx["hash"].doc_ids == [1, 2]
    assert idx["join"].doc_ids == [2, 3]
    assert idx["joins"].doc_ids == [1]
    assert "" not in idx  # whitespace-only doc contributes nothing
    # min_docs filter drops hapax tokens
    idx2 = {r.token for r in inverted_index(docs, min_docs=2).collect()}
    assert "hash" in idx2 and "joins" not in idx2


def test_keyword_search_requires_all_terms_and_ranks_by_tf(docs):
    rows = {r.doc_id: r for r in keyword_search(docs, ["hash", "join"]).collect()}
    # only doc 2 has both "hash" and "join" (doc 1 has "joins", not "join")
    assert set(rows) == {2}
    assert rows[2].n_terms == 2
    assert rows[2].total_tf == 6  # 3x hash + 3x join
    # single-term query matches docs 2 and 3
    got = {r.doc_id for r in keyword_search(docs, ["join"]).collect()}
    assert got == {2, 3}
    # duplicate/cased query tokens dedupe before matching
    got2 = {r.doc_id for r in keyword_search(docs, ["Join", "JOIN"]).collect()}
    assert got2 == {2, 3}


def test_keyword_search_rejects_empty_query(docs):
    with pytest.raises(ValueError):
        keyword_search(docs, ["", "  "][:1])


def test_rrf_fuse_rewards_consensus(spark):
    from ffn_polars_spark.operators.search import rrf_fuse

    # doc B is 2nd in both systems; A and C are 1st in one and absent
    # from the other -> with k0=0, B: 1/2+1/2 = 1.0 beats A: 1/1 = 1.0?
    # use k0=1: B: 1/3+1/3 = 2/3 > A: 1/2, C: 1/2
    rows = [("s1", "A", 1), ("s1", "B", 2), ("s2", "C", 1), ("s2", "B", 2)]
    out = rrf_fuse(
        spark.createDataFrame(rows, ["sys", "item", "rk"]),
        "sys", "item", "rk", k0=1, top_k=3,
    ).collect()
    by_rank = sorted(out, key=lambda r: r["fused_rank"])
    assert by_rank[0]["item"] == "B" and by_rank[0]["n_systems"] == 2
    assert abs(by_rank[0]["rrf_score"] - 2 / 3) < 1e-12
    # A and C tie on score; item ascending breaks the tie
    assert [r["item"] for r in by_rank[1:]] == ["A", "C"]


def test_rrf_fuse_top_k_cut(spark):
    from ffn_polars_spark.operators.search import rrf_fuse

    rows = [("s1", f"d{i}", i) for i in range(1, 8)]
    out = rrf_fuse(
        spark.createDataFrame(rows, ["sys", "item", "rk"]),
        "sys", "item", "rk", top_k=3,
    ).collect()
    assert len(out) == 3
    assert sorted(r["fused_rank"] for r in out) == [1, 2, 3]
