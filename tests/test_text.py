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


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org or visit https://ex.io/p?e=a@b.co"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    from ffn_polars_spark.operators.text import pii_scrub

    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    # URL swallowed first, so the email inside its query string counts once
    assert out[1]["clean_text"] == "mail me at <EMAIL> or visit <URL>"
    assert (out[1]["n_url"], out[1]["n_email"], out[1]["n_redactions"]) == (1, 1, 2)
    assert out[2]["clean_text"] == "call <PHONE> today"
    assert out[2]["n_phone"] == 1
    assert out[3]["clean_text"] == "nothing sensitive here"
    assert out[3]["n_redactions"] == 0


def test_corpus_stats_single_group_values(spark):
    docs = spark.createDataFrame(
        [(i, "w " * n, "en", "web") for i, n in enumerate([1, 2, 3, 4, 10])],
        ["doc_id", "text", "lang", "source"],
    )
    from ffn_polars_spark.operators.text import corpus_stats

    row = corpus_stats(docs).collect()[0]
    assert (row["n_docs"], row["total_tokens"]) == (5, 20)
    assert row["avg_tokens"] == 4.0
    assert row["p50_tokens"] == 3.0
    assert abs(row["p95_tokens"] - 8.8) < 1e-6


def test_group_split_keeps_groups_together(spark):
    from ffn_polars_spark.operators.pipeline import deterministic_split

    docs = spark.createDataFrame(
        [(i, f"src-{i % 7}") for i in range(140)], ["doc_id", "source"]
    )
    rows = deterministic_split(docs, id_col="source").collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_source.values())


def test_repetition_stats_catches_loops(spark):
    from ffn_polars_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "foo bar foo bar foo bar foo bar"),          # bigram loop
            (2, "all words here are fully distinct tokens"), # clean
            (3, "one two three one two three one two three"),# trigram chorus
            (4, "x"),                                        # too short for grams
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert len(out) == 4
    # doc 1: 8 tokens, 2 distinct -> dup_word 0.75; top bigram "foo bar" 4/7
    assert out[1]["dup_word_frac"] == 0.75
    assert abs(out[1]["top_bigram_frac"] - 4 / 7) < 1e-6
    # doc 2: fully distinct, no repeated grams
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["top_bigram_frac"] < 0.2 and out[2]["dup_trigram_frac"] == 0.0
    # doc 3: every trigram occurrence repeats ("one two three" x3 + wraps)
    assert out[3]["dup_trigram_frac"] > 0.4
    # doc 4: single token -> no grams, zero fractions, still present
    assert out[4]["n_tokens"] == 1 and out[4]["top_bigram_frac"] == 0.0


def test_unigram_logprob_matches_hand_computation(spark):
    import math

    from ffn_polars_spark.operators.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "   ")], ["doc_id", "text"]
    )
    # corpus: tf(a)=2, tf(b)=2, tf(c)=1, N=5
    rows = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert set(rows) == {1, 2}  # all-whitespace doc 3 has no score
    assert rows[1].n_tokens == 3
    assert rows[1].neg_logprob == round(math.log(5) - math.log(2), 6)
    assert rows[2].n_tokens == 2
    assert rows[2].neg_logprob == round(
        math.log(5) - (math.log(2) + math.log(1)) / 2, 6
    )
    # rarer tokens -> strictly higher score
    assert rows[2].neg_logprob > rows[1].neg_logprob


def test_corpus_rollup_levels_and_null_disambiguation(spark):
    from ffn_polars_spark.operators.text import corpus_rollup

    docs = spark.createDataFrame(
        [
            (1, "one two", "s1", "en"),
            (2, "three", "s1", "en"),
            (3, "vier", "s1", None),  # genuine NULL lang
            (4, "cinq six sept", "s2", "fr"),
        ],
        ["doc_id", "text", "source", "lang"],
    )
    rows = corpus_rollup(docs, group_cols=("source", "lang")).collect()
    by = {(r.source, r.lang, r.gid): r for r in rows}
    # leaf rows: gid=0, including the genuine-NULL lang group
    assert by[("s1", "en", 0)].n_docs == 2
    assert by[("s1", "en", 0)].n_tokens == 3
    assert by[("s1", None, 0)].n_docs == 1  # real NULL, gid 0
    # source subtotal: lang rolled up -> gid has the lang bit set
    assert by[("s1", None, 1)].n_docs == 3
    assert by[("s2", None, 1)].n_tokens == 3
    # grand total: both bits set
    assert by[(None, None, 3)].n_docs == 4
    assert by[(None, None, 3)].n_tokens == 7


def test_chunk_documents_overlap_and_tail(spark):
    from ffn_polars_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, " ")], ["doc_id", "text"]
    )
    rows = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    got = [(r.doc_id, r.chunk_id, r.chunk_text, r.chunk_tokens) for r in rows]
    # stride 2: starts 0,2,4,6,8 for the 10-token doc; the tail chunk is
    # short, consecutive chunks share 2 tokens, every token is covered
    assert got == [
        (1, 0, "w0 w1 w2 w3", 4),
        (1, 1, "w2 w3 w4 w5", 4),
        (1, 2, "w4 w5 w6 w7", 4),
        (1, 3, "w6 w7 w8 w9", 4),
        (1, 4, "w8 w9", 2),
        (2, 0, "short doc", 2),
    ]  # whitespace-only doc 3 yields nothing


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from ffn_polars_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_bigram_logprob_hand_computed(spark):
    import math

    from ffn_polars_spark.operators.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], ["doc_id", "text"]
    )
    # corpus bigrams: (a,b)x3, (b,a)x1 -> c_left(a)=3, c_left(b)=1
    rows = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert set(rows) == {1, 2}  # single-token doc 3 has no bigrams
    assert rows[1].n_bigrams == 3
    # doc1: ab, ba, ab -> -mean(ln(3/3), ln(1/1), ln(3/3)) = 0
    assert rows[1].neg_logprob == 0.0
    assert rows[2].n_bigrams == 1 and rows[2].neg_logprob == 0.0

    # a rarer continuation scores higher
    docs2 = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    r2 = {r.doc_id: r for r in bigram_logprob(docs2).collect()}
    assert r2[3].neg_logprob == round(-math.log(1 / 3), 6)
    assert r2[1].neg_logprob == round(-math.log(2 / 3), 6)
    assert r2[3].neg_logprob > r2[1].neg_logprob


def test_pmi_collocations_scores_phrases_over_chance(spark):
    from ffn_polars_spark.operators.text import pmi_collocations

    # "new york" always adjacent; "the" pairs with everything
    docs = spark.createDataFrame(
        [
            (i, "the new york office of the big firm in new york")
            for i in range(5)
        ],
        ["doc_id", "text"],
    )
    rows = pmi_collocations(docs, k=10, min_count=3).collect()
    by = {(r.prev, r.token): r for r in rows}
    assert ("new", "york") in by
    assert by[("new", "york")].n == 10
    # exclusivity ranks: "the new" (the most promiscuous left context
    # here) scores strictly lowest; fully-exclusive pairs score highest —
    # the classic PMI preference for rare-but-always-together pairs
    assert by[("new", "york")].pmi > by[("the", "new")].pmi
    assert all(r.pmi >= by[("the", "new")].pmi for r in rows)
    assert by[("big", "firm")].pmi == max(r.pmi for r in rows)
    # deterministic order: pmi desc then pair
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_scrub_spans_removes_covered_words_and_keeps_rest(spark):
    from ffn_polars_spark.operators.text import scrub_spans

    # "a b c" appears in docs 1 and 2 -> duplicated 3-gram; doc 3 is unique.
    df = spark.createDataFrame(
        [
            (1, "x a b c y"),
            (2, "p q a b c"),
            (3, "u v w z t"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in scrub_spans(df, width=3, min_docs=2).collect()
    }
    # coverage: every word inside an occurrence of the dup span is dropped
    assert out[1].text_clean == "x y" and out[1].n_removed == 3
    assert out[2].text_clean == "p q" and out[2].n_removed == 3
    assert out[3].text_clean == "u v w z t" and out[3].n_removed == 0
    assert all(out[i].n_words == 5 for i in (1, 2, 3))

    # a doc that is entirely one duplicated span scrubs to empty string
    df2 = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b d")], ["doc_id", "text"]
    )
    out2 = {r.doc_id: r for r in scrub_spans(df2, width=3, min_docs=2).collect()}
    assert out2[1].text_clean == "" and out2[1].n_removed == 3
    assert out2[3].text_clean == "a b d" and out2[3].n_removed == 0

    # repeats WITHIN one doc don't count toward the min_docs threshold
    df3 = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "z z z z z z")], ["doc_id", "text"]
    )
    out3 = {r.doc_id: r for r in scrub_spans(df3, width=3, min_docs=2).collect()}
    assert out3[1].n_removed == 0


def test_zipf_slope_exact_on_constructed_vocab(spark):
    import math

    from ffn_polars_spark.operators.text import zipf_slope

    # vocabulary: "a" x4, "b" x2, "c" x1 -> ranks 1,2,3
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a a b c")], ["doc_id", "text"]
    )
    out = zipf_slope(df).collect()[0]
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (4, 2, 1)]
    mx = sum(xs) / 3
    my = sum(ys) / 3
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / 2
    var = sum((x - mx) ** 2 for x in xs) / 2
    assert abs(out.zipf_slope - cov / var) < 1e-12
    assert out.vocab_size == 3
    assert abs(out.zipf_intercept - (my - cov / var * mx)) < 1e-12

    # single-token vocabulary: rank variance 0 -> NULL slope
    one = spark.createDataFrame([(1, "x x x")], ["doc_id", "text"])
    assert zipf_slope(one).collect()[0].zipf_slope is None


def test_doc_entropy_word_and_char_hand_computed(spark):
    import math

    from ffn_polars_spark.operators.text import doc_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # zero entropy (one distinct token)
            (2, "a b c d"),          # uniform over 4 -> ln(4)
            (3, "a a b"),            # H = ln3 - (2 ln2)/3
            (4, ""),                 # empty -> absent
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in doc_entropy(df, unit="word").collect()}
    assert out[1].entropy == 0.0 and out[1].n_distinct == 1
    assert abs(out[2].entropy - math.log(4)) < 1e-12
    assert abs(out[3].entropy - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12
    assert out[3].n_units == 3 and out[3].n_distinct == 2
    assert 4 not in out

    # char unit: "aab" -> same distribution as doc 3 above
    ch = {r.doc_id: r for r in doc_entropy(
        spark.createDataFrame([(1, "aab")], ["doc_id", "text"]), unit="char"
    ).collect()}
    assert abs(ch[1].entropy - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12

    import pytest

    with pytest.raises(ValueError):
        doc_entropy(df, unit="bigram")


def test_vocab_jsd_bounds_and_hand_computed(spark):
    import math

    from ffn_polars_spark.operators.text import vocab_jsd

    # identical distributions -> 0
    same = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "a b c", "y")], ["doc_id", "text", "side"]
    )
    r = vocab_jsd(same, "side", "x", "y").collect()[0]
    assert abs(r.jsd) < 1e-12 and r.vocab_union == 3

    # disjoint vocabularies -> ln 2
    dj = spark.createDataFrame(
        [(1, "a a b", "x"), (2, "c d d", "y")], ["doc_id", "text", "side"]
    )
    d = vocab_jsd(dj, "side", "x", "y").collect()[0]
    assert abs(d.jsd - math.log(2)) < 1e-12
    assert d.n_tokens_a == 3 and d.n_tokens_b == 3 and d.vocab_union == 4

    # hand-computed mixed case: p = {a:.5, b:.5}, q = {a:1.0}
    mx = spark.createDataFrame(
        [(1, "a b", "x"), (2, "a", "y")], ["doc_id", "text", "side"]
    )
    p, q = {"a": 0.5, "b": 0.5}, {"a": 1.0, "b": 0.0}
    want = sum(
        (0.5 * p[t] * math.log(p[t] / ((p[t] + q[t]) / 2)) if p[t] else 0)
        + (0.5 * q[t] * math.log(q[t] / ((p[t] + q[t]) / 2)) if q[t] else 0)
        for t in ("a", "b")
    )
    got = vocab_jsd(mx, "side", "x", "y").collect()[0]
    assert abs(got.jsd - want) < 1e-12

    # other sides ignored
    extra = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "a b c", "y"), (3, "zzz", "other")],
        ["doc_id", "text", "side"],
    )
    assert abs(vocab_jsd(extra, "side", "x", "y").collect()[0].jsd) < 1e-12


def test_zipf_slope_all_unique_tokens_null_r2(spark):
    """r13 corr-audit: a corpus where every token appears exactly once has
    constant log-frequency — r2 must be NULL, not an ANSI
    DIVIDE_BY_ZERO crash; the slope itself is 0 (flat fit)."""
    from ffn_polars_spark.operators.text import zipf_slope

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    r = zipf_slope(df).collect()[0]
    assert r["vocab_size"] == 5
    assert r["r2"] is None
    assert r["zipf_slope"] == 0.0
