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
