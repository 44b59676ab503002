"""Winnowing fingerprint contracts (Schleimer/Wilkerson/Aiken 2003)."""

from ffn_polars_spark.operators.text import (
    _WINNOW_BASE,
    _WINNOW_MOD,
    winnow_fingerprints,
)


def _ref_fps(text, k=4, window=4):
    """Pure-python reference: poly k-gram hashes -> window minima -> set."""
    s = " ".join(text.strip().lower().split())
    if len(s) < k + window - 1:
        return set()
    hs = []
    for i in range(len(s) - k + 1):
        acc = 0
        for ch in s[i : i + k]:
            acc = (acc * _WINNOW_BASE + ord(ch)) % _WINNOW_MOD
        hs.append(acc)
    return {min(hs[i : i + window]) for i in range(len(hs) - window + 1)}


def test_winnow_matches_reference_and_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "The quick   brown fox jumps"),
            (2, "smol"),  # < k + window - 1 after normalization: no rows
            (3, "exactly7"),  # boundary: length 8 >= 7, emits
        ],
        ["doc_id", "text"],
    )
    rows = winnow_fingerprints(docs, k=4, window=4).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got.keys() == {1, 3}
    assert got[1] == _ref_fps("The quick   brown fox jumps")
    assert got[3] == _ref_fps("exactly7")


def test_winnow_shared_substring_guarantee(spark):
    # Any shared substring of length >= window + k - 1 = 7 must yield at
    # least one common fingerprint — that is the winnowing guarantee that
    # makes overlap detection a plain equi-join on fp.
    shared = "identical stretch of text"
    docs = spark.createDataFrame(
        [(1, f"left context {shared} aaa"), (2, f"zzz other prefix {shared}")],
        ["doc_id", "text"],
    )
    rows = winnow_fingerprints(docs).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]
