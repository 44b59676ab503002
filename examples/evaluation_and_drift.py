"""Model evaluation, drift monitoring, and embedding geometry — the
round-6 measurement surfaces on the driver testdata.

Walks the quality loop a training-data pipeline runs around its
classifiers and feeds:

1. score a heuristic (language ID) against gold labels — agreement, not
   just accuracy (Cohen's kappa);
2. screen candidate features by single-feature ROC AUC in one pass;
3. watch a value distribution for drift three ways — max gap (KS),
   integrated gap (Wasserstein), and where it moved (QQ);
4. correct a fan-out of per-group p-values for multiple testing (BH);
5. check the embedding corpus for anisotropy (top principal component)
   and remove it (all-but-the-top).

Run: python examples/evaluation_and_drift.py [sf_dir]
     (default /root/testdata/sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ffn_polars_spark.sources import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("evaluation-example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    ev = read_table(spark, sf_dir, "events")
    emb = read_table(spark, sf_dir, "embeddings")

    # 1. heuristic vs gold: chance-corrected agreement. The gold labels
    #    include languages the heuristic cannot emit (zh, ...) — kappa
    #    stays honest about that, plain accuracy would not.
    from ffn_polars_spark.operators.evaluation import cohens_kappa
    from ffn_polars_spark.operators.text import language_id

    pred = language_id(docs).select("doc_id", "lang_pred")
    lab = docs.select("doc_id", F.col("lang").alias("gold")).join(pred, "doc_id")
    cohens_kappa(lab, "lang_pred", "gold").show()

    # 2. one-pass feature screen: which raw columns order the label at all?
    from ffn_polars_spark.operators.evaluation import feature_auc_screen

    orders = read_table(spark, sf_dir, "orders")
    pre = orders.select(
        (F.col("o_orderstatus") == "F").cast("int").alias("finished"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_ts"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    feature_auc_screen(pre, "finished", ["order_ts", "price"]).show()

    # 3. drift, three ways: scalar gates first, then WHERE it moved
    from ffn_polars_spark.operators.quality import (
        ks_drift,
        qq_data,
        wasserstein_distance,
    )

    t = ev.select("event_type", (100.0 + F.col("value") / 10.0).alias("price"))
    ks_drift(t, "price", "event_type", "purchase", "view").show()
    wasserstein_distance(t, "price", "event_type", "purchase", "view").show()
    qq_data(
        t, "price", "event_type", "purchase", "view",
        quantiles=(0.1, 0.25, 0.5, 0.75, 0.9),
    ).orderBy("q").show()

    # 4. multiple testing: a per-group tester fans out hundreds of
    #    p-values; BH turns them into FDR-controlled discoveries
    from ffn_polars_spark.operators.evaluation import p_adjust_bh

    tests = orders.where(F.col("o_orderkey") % 37 == 0).select(
        F.col("o_orderkey").alias("test_id"),
        F.col("o_orderstatus").alias("family"),
        ((F.col("o_orderkey") * 2654435761 % 999999937).cast("double")
         / 999999937.0).alias("p"),
    )
    adj = p_adjust_bh(tests, "p", by="family")
    print("discoveries at FDR 0.1:", adj.where("p_adj <= 0.1").count(),
          "of", adj.count())

    # 5. embedding geometry: the dominant direction and its removal —
    #    the d x d moment pass is the only data-width stage
    from ffn_polars_spark.operators.linalg import (
        embedding_remove_pc,
        embedding_top_pc,
    )

    pc = embedding_top_pc(emb)
    pc.orderBy(F.abs(F.col("loading")).desc()).show(5)
    resid = embedding_remove_pc(emb)
    resid.groupBy().agg(
        F.sum(F.col("residual") * F.col("residual")).alias("residual_energy")
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
