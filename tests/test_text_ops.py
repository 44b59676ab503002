

def test_oov_rate_hand_computed(spark):
    from ffn_polars_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "a a a b", "s1"),
            (2, "a b c", "s1"),
            (3, "x y z z", "s2"),
        ],
        ["doc_id", "text", "source"],
    )
    # top-2 vocab by freq desc, token asc: a(4), z(2) beats b(2)? no --
    # b(2) ties z(2), tie-break asc keeps b. vocab = {a, b}
    out = {r.source: r for r in oov_rate(docs, vocab_size=2).collect()}
    assert out["s1"].n_tokens == 7 and out["s1"].oov_tokens == 1  # c
    assert abs(out["s1"].oov_rate - 1 / 7) < 1e-12
    assert out["s2"].n_tokens == 4 and out["s2"].oov_tokens == 4
    assert out["s2"].oov_rate == 1.0


def test_dedup_cluster_stats_histogram(spark):
    from ffn_polars_spark.operators.dedup import dedup_cluster_stats

    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 6), (7, 6)],
        ["doc_id", "canonical_id"],
    )
    out = {r.cluster_size: r for r in dedup_cluster_stats(assign).collect()}
    assert out[3].n_clusters == 1 and out[3].n_docs == 3
    assert out[2].n_clusters == 1 and out[2].n_docs == 2
    assert out[1].n_clusters == 2 and out[1].n_docs == 2


def test_sentence_stats_hand_computed(spark):
    from ffn_polars_spark.operators.text import sentence_stats

    docs = spark.createDataFrame(
        [
            (1, "One two three. Four five! Six?"),
            (2, "No terminal punctuation here"),
            (3, "!!! ..."),          # punctuation runs only -> 0 sentences
            (4, "a.\nb c."),         # newline between sentences
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in sentence_stats(docs).collect()}
    assert out[1].n_sentences == 3
    assert abs(out[1].avg_sentence_words - (3 + 2 + 1) / 3) < 1e-12
    assert out[1].max_sentence_words == 3
    assert out[2].n_sentences == 1 and out[2].max_sentence_words == 4
    assert out[3].n_sentences == 0 and out[3].avg_sentence_words is None
    assert out[4].n_sentences == 2 and out[4].max_sentence_words == 2


def test_strip_markup_tags_entities_whitespace(spark):
    from ffn_polars_spark.operators.text import strip_markup

    docs = spark.createDataFrame(
        [
            (1, "<p>Hello <b>world</b></p>"),
            (2, "a &amp;lt; b and x &lt; y plus &quot;q&quot; &#39;s&#39;"),
            (3, "lots   of\n\nwhitespace\t here "),
            (4, "no markup at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.clean_text for r in strip_markup(docs).collect()}
    assert out[1] == "Hello world"
    # &amp; decodes LAST: "&amp;lt;" -> literal "&lt;", not "<"
    assert out[2] == 'a &lt; b and x < y plus "q" \'s\''
    assert out[3] == "lots of whitespace here"
    assert out[4] == "no markup at all"


def test_flesch_readability_hand_computed(spark):
    from ffn_polars_spark.operators.text import flesch_readability

    # "The cat sat. It ran!" -> 5 whitespace tokens ("sat." and "ran!"
    # keep their punctuation), 2 sentences, vowel runs e,a,a,I,a -> 5
    df = spark.createDataFrame([(1, "The cat sat. It ran!")], ["doc_id", "text"])
    r = flesch_readability(df).collect()[0]
    assert r["n_words"] == 5 and r["n_sentences"] == 2 and r["n_syllables"] == 5
    expect = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert abs(r["flesch"] - expect) < 1e-9


def test_flesch_readability_degenerate_null(spark):
    from ffn_polars_spark.operators.text import flesch_readability

    df = spark.createDataFrame(
        [(1, "..."), (2, "word no terminator")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in flesch_readability(df).collect()}
    # "..." is one whitespace token but zero word-bearing sentences
    assert got[1]["n_sentences"] == 0 and got[1]["flesch"] is None
    # an unterminated fragment still counts as one sentence (split yields it)
    assert got[2]["n_sentences"] == 1 and got[2]["flesch"] is not None
