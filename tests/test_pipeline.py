"""clean_corpus pipeline: keep/drop decisions and single-pass plan shape."""

from pyspark.sql import functions as F

from ffn_polars_spark.operators.pipeline import clean_corpus


def test_clean_corpus_decisions(spark):
    docs = spark.createDataFrame(
        [
            # good English doc: keeps
            (1, "the cat sat on the mat and it was a good day for sitting"),
            # exact duplicate (case/whitespace variant): dropped as duplicate
            (2, "  THE cat sat on the mat and it was a good day FOR sitting "),
            # German doc: language-filtered
            (3, "der hund ist nicht auf der matte und das ist ein problem"),
            # short + all punctuation + no stopwords: quality-filtered
            # (loses length, punct-ratio, and stopword-ratio credits)
            (4, "!!! ??? ###"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in clean_corpus(docs).collect()}
    assert out[1]["keep"] and not out[1]["is_duplicate"]
    assert not out[2]["keep"] and out[2]["is_duplicate"] and out[2]["canonical_id"] == 1
    assert not out[3]["keep"] and out[3]["lang_pred"] == "de"
    assert not out[4]["keep"] and out[4]["quality_score"] < 0.5
    # every input doc gets a decision row
    assert len(out) == 4


def test_clean_corpus_single_scan_plan(spark):
    docs = spark.createDataFrame([(1, "the a of and to in is")], ["doc_id", "text"])
    plan = clean_corpus(docs)._jdf.queryExecution().optimizedPlan().toString()
    # one fingerprint aggregate, no extra self-joins on doc_id: the text
    # features all evaluate in the scan-side projection
    assert plan.count("Aggregate") == 1
