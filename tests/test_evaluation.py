"""Model-evaluation operators (operators/evaluation.py) plus the new
ratio/microstructure additions — hand-computed expectations on tiny frames,
cross-checked against sklearn-style formulas worked by hand."""

import math

import pytest
from pyspark.sql import functions as F

from ffn_polars_spark.functions.eod_ratios import jensen_alpha
from ffn_polars_spark.functions.quote import realized_spread
from ffn_polars_spark.functions.tick_direction import lee_ready
from ffn_polars_spark.operators.evaluation import (
    auc_by_group,
    benford_digits,
    calibration_bins,
    spearman_corr,
)
from ffn_polars_spark.operators.quality import hhi_concentration

SEC = 1_000_000_000


def test_auc_perfect_and_random(spark):
    # Perfect separation: all positives score above all negatives -> AUC 1.
    rows = [("a", 1.0, False), ("a", 2.0, False), ("a", 3.0, True), ("a", 4.0, True)]
    out = auc_by_group(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g"
    ).collect()[0]
    assert out["auc"] == 1.0 and out["n_pos"] == 2 and out["n_neg"] == 2

    # Reversed scores -> AUC 0.
    rows = [("a", 4.0, False), ("a", 3.0, False), ("a", 2.0, True), ("a", 1.0, True)]
    out = auc_by_group(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g"
    ).collect()[0]
    assert out["auc"] == 0.0


def test_auc_ties_use_midranks(spark):
    # One positive and one negative share the same score: that pair
    # contributes 1/2, the midrank formula must produce AUC = 0.5 here.
    rows = [("a", 1.0, False), ("a", 1.0, True)]
    out = auc_by_group(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g"
    ).collect()[0]
    assert out["auc"] == 0.5


def test_auc_degenerate_group_null(spark):
    rows = [("a", 1.0, True), ("a", 2.0, True)]  # no negatives
    out = auc_by_group(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g"
    ).collect()[0]
    assert out["auc"] is None


def test_calibration_bins_edges_and_rates(spark):
    # Scores 0..9 with labels = (score >= 5): 10 equal-width bins over
    # [0, 9]; score 9 lands in bin 9 (the least() clamp), score 0 in bin 0.
    rows = [("g", float(i), i >= 5) for i in range(10)]
    out = calibration_bins(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g", bins=10
    )
    got = {r["bin"]: r for r in out.collect()}
    assert set(got) == set(range(10))
    assert all(got[b]["n"] == 1 for b in got)
    assert got[0]["pos_rate"] == 0.0 and got[9]["pos_rate"] == 1.0
    assert got[9]["mean_score"] == 9.0


def test_calibration_zero_width_range(spark):
    rows = [("g", 5.0, True), ("g", 5.0, False)]
    out = calibration_bins(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g"
    ).collect()
    assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n"] == 2


def test_spearman_monotone_and_sign(spark):
    # y = exp(x) is nonlinear but strictly monotone: Spearman exactly 1.
    rows = [("g", float(i), math.exp(i)) for i in range(6)]
    out = spearman_corr(
        spark.createDataFrame(rows, ["g", "x", "y"]), "x", "y", by="g"
    ).collect()[0]
    assert abs(out["spearman"] - 1.0) < 1e-12 and out["n"] == 6

    rows = [("g", float(i), -float(i) ** 3) for i in range(6)]
    out = spearman_corr(
        spark.createDataFrame(rows, ["g", "x", "y"]), "x", "y", by="g"
    ).collect()[0]
    assert abs(out["spearman"] + 1.0) < 1e-12


def test_spearman_drops_nulls(spark):
    rows = [("g", 1.0, 1.0), ("g", 2.0, None), ("g", 3.0, 2.0), ("g", 4.0, 3.0)]
    out = spearman_corr(
        spark.createDataFrame(rows, ["g", "x", "y"]), "x", "y", by="g"
    ).collect()[0]
    assert out["n"] == 3 and abs(out["spearman"] - 1.0) < 1e-12


def test_benford_digit_extraction_and_chi2(spark):
    # Values with known first digits across magnitudes; zero/negative dropped.
    vals = [1.5, 19.0, 123.0, 2.0, 29.0, 0.0, -7.0, 0.003]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = benford_digits(df, "v")
    got = {r["digit"]: r for r in out.collect()}
    assert {d: got[d]["n"] for d in sorted(got)} == {1: 3, 2: 2, 3: 1}
    total = 6
    for d, r in got.items():
        assert abs(r["observed_freq"] - r["n"] / total) < 1e-12
        assert abs(r["expected_freq"] - math.log10(1 + 1 / d)) < 1e-12
        exp = math.log10(1 + 1 / d)
        assert abs(
            r["chi2_term"] - total * (r["n"] / total - exp) ** 2 / exp
        ) < 1e-9


def test_jensen_alpha_recovers_planted_line(spark):
    # r = 0.5*b + 0.001 + 0 noise -> beta exactly 0.5, per-period alpha 0.001.
    bs = [0.01, -0.02, 0.015, 0.03, -0.01]
    rows = [("g", 0.5 * b + 0.001, b) for b in bs]
    out = jensen_alpha(
        spark.createDataFrame(rows, ["g", "r", "b"]), "r", "b", by="g", n=252
    ).collect()[0]
    assert abs(out["beta"] - 0.5) < 1e-12
    assert abs(out["alpha"] - 0.001 * 252) < 1e-9
    mean_r = sum(0.5 * b + 0.001 for b in bs) / len(bs)
    assert abs(out["treynor_ratio"] - mean_r * 252 / 0.5) < 1e-9
    assert out["n_obs"] == 5


def test_jensen_alpha_null_alignment(spark):
    # NULL on either side drops the row from every moment.
    rows = [("g", 0.01, 0.02), ("g", None, 0.05), ("g", 0.02, 0.04), ("g", 0.03, None)]
    out = jensen_alpha(
        spark.createDataFrame(rows, ["g", "r", "b"]), "r", "b", by="g"
    ).collect()[0]
    assert out["n_obs"] == 2
    # two points define the line exactly: beta = (0.02-0.01)/(0.04-0.02)
    assert abs(out["beta"] - 0.5) < 1e-12


def test_hhi_even_vs_concentrated(spark):
    rows = [("g1", "a", 1.0), ("g1", "b", 1.0), ("g1", "c", 1.0), ("g1", "d", 1.0),
            ("g2", "a", 10.0), ("g2", "b", 0.0)]
    out = hhi_concentration(
        spark.createDataFrame(rows, ["g", "e", "v"]), "v", "e", group_col="g"
    )
    got = {r["g"]: r for r in out.collect()}
    assert abs(got["g1"]["hhi"] - 0.25) < 1e-12          # 4 even entities -> 1/4
    assert abs(got["g1"]["hhi_normalized"] - 0.0) < 1e-12
    assert abs(got["g2"]["hhi"] - 1.0) < 1e-12           # one entity holds all
    assert abs(got["g2"]["hhi_normalized"] - 1.0) < 1e-12
    assert got["g1"]["n_entities"] == 4


def test_lee_ready_mid_test_and_fallback(spark):
    trades = spark.createDataFrame(
        [("t", 1, 0 * SEC, 10.0),   # before any quote -> tick rule, first row 0
         ("t", 2, 2 * SEC, 10.6),   # above mid 10.5 -> +1
         ("t", 3, 4 * SEC, 10.4),   # below mid 10.5 -> -1
         ("t", 4, 6 * SEC, 11.0)],  # at mid 11.0 -> tick rule: 11.0 > 10.4 -> +1
        ["event_type", "event_id", "ts_ns", "price"],
    )
    quotes = spark.createDataFrame(
        [("t", 1 * SEC, 10.6, 10.4), ("t", 5 * SEC, 11.1, 10.9)],
        ["event_type", "ts_ns", "ask", "bid"],
    )
    out = lee_ready(trades, quotes, by="event_type")
    got = {r["event_id"]: r["lr_direction"] for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: -1, 4: 1}


def test_realized_spread_future_mid(spark):
    # One trade, quotes before and after; horizon reaches the later quote.
    trades = spark.createDataFrame(
        [("t", 1, 10 * SEC, 10.0), ("t", 2, 11 * SEC, 10.2)],
        ["event_type", "event_id", "ts_ns", "price"],
    )
    quotes = spark.createDataFrame(
        [("t", 9 * SEC, 10.1, 9.9),     # mid 10.0 (prevailing at trade time)
         ("t", 15 * SEC, 10.7, 10.5)],  # mid 10.6 (prevailing at t+10s)
        ["event_type", "ts_ns", "ask", "bid"],
    )
    out = realized_spread(
        trades, quotes, horizon=10 * SEC, by=["event_type"]
    )
    got = {r["event_id"]: r for r in out.collect()}
    # trade 2: tick rule +1 (10.2 > 10.0); mid at 21s -> latest quote 15s = 10.6
    assert abs(got[2]["mid_future"] - 10.6) < 1e-12
    assert abs(got[2]["realized_spread"] - 2 * 1 * (10.2 - 10.6)) < 1e-12
    # trade 1: first row -> direction 0 -> realized spread 0
    assert got[1]["realized_spread"] == 0.0


def test_auc_matches_pairwise_bruteforce(spark):
    # Random-ish fixed sample with ties: the rank-sum identity must equal
    # the O(n^2) pairwise definition (wins + half-ties over pos*neg pairs).
    scores = [0.1, 0.4, 0.4, 0.8, 0.2, 0.9, 0.4, 0.6]
    labels = [False, True, False, True, False, True, False, True]
    rows = [("g", s, y) for s, y in zip(scores, labels)]
    out = auc_by_group(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g"
    ).collect()[0]
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    assert abs(out["auc"] - wins / (len(pos) * len(neg))) < 1e-12


def test_ece_perfect_calibration_zero(spark):
    # pos_rate equals mean_score in every bin -> ECE and MCE exactly 0.
    from ffn_polars_spark.operators.evaluation import expected_calibration_error
    rows = []
    for b in range(10):
        s = b / 10.0 + 0.05
        # 20 rows at score s with exactly s*20 positives
        npos = int(round(s * 20))
        rows += [("g", s, i < npos) for i in range(20)]
    out = expected_calibration_error(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g"
    ).collect()[0]
    assert abs(out["ece"]) < 1e-12 and abs(out["mce"]) < 1e-12
    assert out["n"] == 200


def test_ece_weights_by_bin_size(spark):
    from ffn_polars_spark.operators.evaluation import expected_calibration_error
    # Two effective bins: scores 0.0 (never positive -> gap 0) and 1.0
    # (never positive -> gap 1). 3 rows low, 1 row high.
    rows = [("g", 0.0, False)] * 3 + [("g", 1.0, False)]
    out = expected_calibration_error(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g", bins=10
    ).collect()[0]
    assert abs(out["ece"] - 1.0 / 4.0) < 1e-12   # (3*0 + 1*1)/4
    assert abs(out["mce"] - 1.0) < 1e-12


def test_ndcg_perfect_and_inverted(spark):
    from ffn_polars_spark.operators.evaluation import ndcg_at_k
    # System ranking identical to ideal -> nDCG 1.
    rows = [("q", i, float(10 - i), float(10 - i)) for i in range(5)]
    out = ndcg_at_k(
        spark.createDataFrame(rows, ["q", "id", "score", "rel"]),
        "q", "score", "rel", k=5, tie_col="id",
    ).collect()[0]
    assert abs(out["ndcg"] - 1.0) < 1e-12

    # Reversed ranking: hand-compute DCG/IDCG.
    rows = [("q", i, float(i), float(3 - i)) for i in range(4)]  # rels 3,2,1,0
    out = ndcg_at_k(
        spark.createDataFrame(rows, ["q", "id", "score", "rel"]),
        "q", "score", "rel", k=4, tie_col="id",
    ).collect()[0]
    import math as m
    # system order: score desc -> ids 3,2,1,0 -> rels 0,1,2,3
    dcg = sum(r / m.log2(i + 2) for i, r in enumerate([0.0, 1.0, 2.0, 3.0]))
    idcg = sum(r / m.log2(i + 2) for i, r in enumerate([3.0, 2.0, 1.0, 0.0]))
    assert abs(out["ndcg"] - dcg / idcg) < 1e-12


def test_ndcg_truncates_at_k(spark):
    from ffn_polars_spark.operators.evaluation import ndcg_at_k
    # Relevant item parked at rank 3 > k=2 contributes nothing to DCG.
    rows = [("q", 1, 10.0, 0.0), ("q", 2, 9.0, 0.0), ("q", 3, 8.0, 5.0)]
    out = ndcg_at_k(
        spark.createDataFrame(rows, ["q", "id", "score", "rel"]),
        "q", "score", "rel", k=2, tie_col="id",
    ).collect()[0]
    assert out["ndcg"] == 0.0


def test_mrr_first_relevant_rank(spark):
    from ffn_polars_spark.operators.evaluation import mrr_at_k
    rows = [("q", 1, 10.0, 0.0), ("q", 2, 9.0, 0.0), ("q", 3, 8.0, 1.0),
            ("q2", 4, 5.0, 1.0), ("q3", 5, 1.0, 0.0)]
    out = mrr_at_k(
        spark.createDataFrame(rows, ["q", "id", "score", "rel"]),
        "q", "score", "rel", k=10, tie_col="id",
    )
    got = {r["q"]: r for r in out.collect()}
    assert abs(got["q"]["rr"] - 1 / 3) < 1e-12 and got["q"]["first_rel_rank"] == 3
    assert got["q2"]["rr"] == 1.0
    assert got["q3"]["rr"] == 0.0 and got["q3"]["first_rel_rank"] is None


def test_hill_recovers_pareto_exponent(spark):
    # Exact Pareto(alpha) quantile sample: x_i = (i/n)^(-1/alpha).
    from ffn_polars_spark.operators.sketch import hill_tail_index
    alpha = 2.0
    n = 2000
    rows = [("g", i, (i / n) ** (-1.0 / alpha)) for i in range(1, n + 1)]
    out = hill_tail_index(
        spark.createDataFrame(rows, ["g", "id", "x"]), "x", k=100,
        by=["g"], tie_col="id",
    ).collect()[0]
    # Hill on the exact quantile grid converges to 1/alpha with O(k/n) bias.
    assert abs(out["alpha"] - alpha) < 0.15
    assert out["n_tail"] == 100 and out["x_k1"] > 1.0


def test_hill_insufficient_tail_null(spark):
    from ffn_polars_spark.operators.sketch import hill_tail_index
    rows = [("g", i, float(i)) for i in range(1, 6)]
    out = hill_tail_index(
        spark.createDataFrame(rows, ["g", "id", "x"]), "x", k=10,
        by=["g"], tie_col="id",
    ).collect()[0]
    assert out["hill"] is None and out["alpha"] is None


def test_execution_slippage_vs_hand_vwap(spark):
    from ffn_polars_spark.functions.tick_flow import execution_slippage
    DAY = 86_400_000_000_000
    rows = [("t", 1, 0, 10.0, 1.0),        # day 0
            ("t", 2, 1000, 12.0, 3.0),     # day 0; vwap0 = (10+36)/4 = 11.5
            ("t", 3, DAY, 20.0, 2.0)]      # day 1; vwap1 = 20
    df = spark.createDataFrame(
        rows, ["event_type", "event_id", "ts_ns", "price", "volume"]
    )
    out = execution_slippage(df, "price", "volume", "ts_ns", by="event_type")
    got = {r["event_id"]: r for r in out.collect()}
    assert abs(got[1]["vwap"] - 11.5) < 1e-12 and got[1]["bucket"] == 0
    # trade 2 is an uptick -> d=+1; paid 12 vs 11.5 -> positive slippage
    assert abs(got[2]["slippage"] - (12.0 - 11.5) / 11.5) < 1e-12
    assert got[3]["bucket"] == 1 and abs(got[3]["vwap"] - 20.0) < 1e-12
    # first trade of the partition: d=0 -> slippage 0
    assert got[1]["slippage"] == 0.0


def test_pr_at_k_hand_computed(spark):
    from ffn_polars_spark.operators.evaluation import pr_at_k
    # Ranking by score desc: ids 1..6, labels T,F,T,T,F,F
    rows = [("g", 1, 6.0, True), ("g", 2, 5.0, False), ("g", 3, 4.0, True),
            ("g", 4, 3.0, True), ("g", 5, 2.0, False), ("g", 6, 1.0, False)]
    out = pr_at_k(
        spark.createDataFrame(rows, ["g", "id", "s", "y"]), "s", "y",
        by="g", ks=(1, 3, 5), tie_col="id",
    )
    got = {r["k"]: r for r in out.collect()}
    assert set(got) == {1, 3, 5}
    assert got[1]["precision"] == 1.0 and abs(got[1]["recall"] - 1 / 3) < 1e-12
    assert abs(got[3]["precision"] - 2 / 3) < 1e-12
    assert abs(got[3]["recall"] - 2 / 3) < 1e-12
    assert abs(got[5]["precision"] - 3 / 5) < 1e-12 and got[5]["recall"] == 1.0
    assert got[1]["n_pos"] == 3


def test_pr_at_k_short_group_emits_final_rank(spark):
    from ffn_polars_spark.operators.evaluation import pr_at_k
    rows = [("g", 1, 2.0, True), ("g", 2, 1.0, False)]
    out = pr_at_k(
        spark.createDataFrame(rows, ["g", "id", "s", "y"]), "s", "y",
        by="g", ks=(1, 10), tie_col="id",
    )
    got = {r["k"]: r for r in out.collect()}
    assert set(got) == {1, 2}          # rank 2 stands in for the unreachable 10
    assert got[2]["recall"] == 1.0


def test_ic_decay_planted_monotone_signal(spark):
    from ffn_polars_spark.operators.evaluation import ic_decay
    # Price grows a fixed 1% per step: forward return is constant, so IC is
    # NULL (zero rank variance) — use a price with signal-correlated moves:
    # signal_i = i, price jumps big when the NEXT step's signal is high.
    # Simplest sanity: exponentially rising price -> fwd returns constant ->
    # corr NULL; falling-vol price gives monotone fwd returns.
    n = 40
    prices = [100.0 * (1.0 + 0.001 * i) for i in range(n)]  # growth rate rises
    rows = [("g", i, float(i), prices[i]) for i in range(n)]
    out = ic_decay(
        spark.createDataFrame(rows, ["g", "ts", "sig", "p"]),
        "sig", "p", "ts", horizons=(1, 2), by="g", tie_col="ts",
    )
    got = {r["horizon"]: r for r in out.collect()}
    # fwd return at h=1 is (1+.001(i+1))/(1+.001 i) - 1, strictly DECREASING
    # in i while the signal increases -> Spearman exactly -1.
    assert abs(got[1]["ic"] + 1.0) < 1e-12
    assert abs(got[2]["ic"] + 1.0) < 1e-12
    assert got[1]["n"] == n - 1 and got[2]["n"] == n - 2


def test_cusum_alarm_and_reset(spark):
    from ffn_polars_spark.operators.recursive import cusum_changepoints
    # target 0, drift 0, threshold 5: +3 steps accumulate 3,6 -> alarm at 6,
    # reset, then -4,-8 on the negative side -> alarm again.
    vals = [3.0, 3.0, -4.0, -4.0, 1.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    out = cusum_changepoints(
        spark.createDataFrame(rows, ["g", "ts", "x"]), "ts", "x",
        target=0.0, threshold=5.0, drift=0.0, by=["g"],
    )
    r = {row["ts"]: row for row in out.collect()}
    assert r[0]["cusum_pos"] == 3.0 and not r[0]["alarm"]
    assert r[1]["cusum_pos"] == 6.0 and r[1]["alarm"] and r[1]["segment_id"] == 1
    assert r[2]["cusum_pos"] == 0.0 and r[2]["cusum_neg"] == 4.0
    assert r[2]["segment_id"] == 2 and not r[2]["alarm"]
    assert r[3]["cusum_neg"] == 8.0 and r[3]["alarm"]
    assert r[4]["segment_id"] == 3


def test_quantile_transform_hazen_positions(spark):
    from ffn_polars_spark.operators.sketch import quantile_transform
    rows = [("g", 1, 10.0), ("g", 2, 20.0), ("g", 3, 20.0), ("g", 4, 40.0)]
    out = quantile_transform(
        spark.createDataFrame(rows, ["g", "id", "v"]), "v", by=["g"]
    )
    got = {r["id"]: r["v_quantile"] for r in out.collect()}
    # n=4: rank 1 -> (1-0.5)/4; ties at rank 2,3 share midrank 2.5
    assert abs(got[1] - 0.5 / 4) < 1e-12
    assert abs(got[2] - 2.0 / 4) < 1e-12 and got[2] == got[3]
    assert abs(got[4] - 3.5 / 4) < 1e-12


def test_bm25_ranks_rarer_term_higher(spark):
    from ffn_polars_spark.operators.search import bm25_search
    import math as m
    docs = [(1, "apple banana"), (2, "apple cherry"), (3, "apple apple"),
            (4, "durian fig")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = bm25_search(df, ["banana", "apple"], k1=1.2, b=0.75)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3}
    # doc 1 matches both terms; banana is rarer (df=1 vs 3) so doc 1 wins.
    top = max(got.values(), key=lambda r: r["score"])
    assert top["doc_id"] == 1 and got[1]["n_terms"] == 2
    # hand-check doc 3's score: tf=2, len=2, avglen=2, N=4, df(apple)=3
    idf = m.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    s = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 2 / 2))
    assert abs(got[3]["score"] - s) < 1e-12


def test_bipower_no_jump_vs_jump(spark):
    from ffn_polars_spark.functions.tick_price import bipower_variation
    import math as m
    # Smooth geometric walk: constant log return r -> RV = n*r^2,
    # BV = (pi/2)*(n-1)*r^2 -> jump_share = max(0, 1 - (pi/2)(n-1)/n) = 0
    # (pi/2 > 1 makes BV exceed RV; clamped to 0).
    n = 11
    prices = [100.0 * m.exp(0.01 * i) for i in range(n)]
    rows = [("g", i, prices[i]) for i in range(n)]
    out = bipower_variation(
        spark.createDataFrame(rows, ["g", "ts", "price"]), "price",
        order_by=["ts"], by=["g"],
    ).collect()[0]
    assert abs(out["rv"] - (n - 1) * 0.01 ** 2) < 1e-12
    assert out["jump_share"] == 0.0
    assert out["n"] == n - 1

    # One huge jump in an otherwise flat tape: RV is dominated by the jump,
    # BV stays near zero (the jump multiplies a ~0 neighbor) -> share ~ 1.
    prices = [100.0] * 5 + [200.0] + [200.0] * 5
    rows = [("g", i, p) for i, p in enumerate(prices)]
    out = bipower_variation(
        spark.createDataFrame(rows, ["g", "ts", "price"]), "price",
        order_by=["ts"], by=["g"],
    ).collect()[0]
    assert out["jump_share"] == 1.0


def test_rv_signature_grids(spark):
    from ffn_polars_spark.functions.tick_price import rv_signature
    import math as m
    SEC = 1_000_000_000
    # ticks every 30s for 10 minutes, price doubles each minute-bucket close
    rows = [("g", i * 30 * SEC, 100.0 * (2.0 ** (i // 2))) for i in range(20)]
    out = rv_signature(
        spark.createDataFrame(rows, ["g", "ts_ns", "price"]), "price",
        "ts_ns", by=["g"], intervals=[60 * SEC, 300 * SEC],
    )
    got = {r["interval_ns"]: r for r in out.collect()}
    assert got[60 * SEC]["n_buckets"] == 10
    # close-to-close log return is ln 2 each minute: RV = 9 * (ln 2)^2
    assert abs(got[60 * SEC]["rv"] - 9 * m.log(2.0) ** 2) < 1e-9
    assert got[300 * SEC]["n_buckets"] == 2
    # one 5-min close pair: ratio 2^5 -> (5 ln 2)^2
    assert abs(got[300 * SEC]["rv"] - (5 * m.log(2.0)) ** 2) < 1e-9


def test_dedup_incremental_drops_history_and_batch_dupes(spark):
    from ffn_polars_spark.operators.dedup import dedup_incremental
    seen = spark.createDataFrame(
        [(1, "Hello  World"), (2, "old doc")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(10, "hello world"),      # dup of history (case/ws-normalized)
         (11, "fresh one"),
         (12, "fresh one"),        # in-batch dup -> keep min id 11
         (13, "another")],
        ["doc_id", "text"],
    )
    out = dedup_incremental(new, seen)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [11, 13]


def test_zorder_interleave_bits(spark):
    from ffn_polars_spark.operators.pipeline import zorder_key
    # x=0b11, y=0b01 -> z = x bits at even positions, y at odd:
    # bit0=x0=1, bit1=y0=1, bit2=x1=1, bit3=y1=0 -> 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], ["x", "y"])
    out = zorder_key(df, "x", "y", bits=4).collect()[0]
    assert out["zorder"] == 7
    # locality: neighbors in x differ in low z bits
    df2 = spark.createDataFrame([(i, 0) for i in range(4)], ["x", "y"])
    zs = [r["zorder"] for r in zorder_key(df2, "x", "y", bits=4).orderBy("x").collect()]
    assert zs == [0, 1, 4, 5]  # Morton x-only pattern


def test_seasonal_adjust_removes_planted_cycle(spark):
    from ffn_polars_spark.operators.pipeline import seasonal_adjust
    HOUR = 3_600_000_000_000
    # Two full days, hourly rows: value = base profile depending on phase.
    prof = {h: 10.0 + (5.0 if h < 12 else -5.0) for h in range(24)}
    rows = [("g", d * 24 * HOUR + h * HOUR, prof[h])
            for d in range(2) for h in range(24)]
    out = seasonal_adjust(
        spark.createDataFrame(rows, ["g", "ts", "v"]), "v", "ts", by="g",
        period_ns=24 * HOUR, buckets=24,
    )
    rowso = out.collect()
    # Perfectly periodic input: adjusted value = grand mean everywhere.
    for r in rowso:
        assert abs(r["v_adjusted"] - 10.0) < 1e-9
    # index reflects the profile: 1.5 mornings, 0.5 afternoons
    idx = {r["phase"]: r["seasonal_index"] for r in rowso}
    assert abs(idx[0] - 1.5) < 1e-12 and abs(idx[23] - 0.5) < 1e-12


def test_triple_barrier_labels(spark):
    from ffn_polars_spark.functions.tick_bars import triple_barrier_label
    # Anchor 100.0, barriers at 101/99 (1%): path rises to 101.5 at t=2.
    prices = [100.0, 100.5, 101.5, 98.0, 98.5, 98.4, 98.45, 98.41, 98.42, 98.43]
    rows = [("g", i, prices[i]) for i in range(len(prices))]
    out = triple_barrier_label(
        spark.createDataFrame(rows, ["g", "ts", "price"]), "price", "ts",
        horizon=3, up_pct=0.01, down_pct=0.01, by=["g"],
    )
    got = {r["ts"]: r for r in out.collect()}
    assert got[0]["label"] == 1 and got[0]["first_hit"] == 2   # 101.5 >= 101
    assert got[2]["label"] == -1 and got[2]["first_hit"] == 1  # 98 <= 100.485
    # late flat stretch: neither barrier within 3 ticks -> time barrier
    assert got[5]["label"] == 0 and got[5]["first_hit"] is None
    # last row has no future -> label 0
    assert got[9]["label"] == 0


def test_walkforward_split_triangular(spark):
    from ffn_polars_spark.operators.pipeline import walkforward_split
    rows = [(float(i),) for i in range(100)]
    out = walkforward_split(
        spark.createDataFrame(rows, ["ts"]), "ts", n_folds=4
    )
    agg = {(r["fold"], r["role"]): r["cnt"] for r in
           out.groupBy("fold", "role").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # 5 equal blocks of 20: fold f trains on f*20 rows, tests on 20.
    for f in range(1, 5):
        assert agg[(f, "train")] == 20 * f
        assert agg[(f, "test")] == 20
    # leakage check: every train ts < every test ts within each fold
    mx = out.where("role = 'train'").groupBy("fold").agg(F.max("ts").alias("m"))
    mn = out.where("role = 'test'").groupBy("fold").agg(F.min("ts").alias("m"))
    for f in range(1, 5):
        tmax = [r["m"] for r in mx.collect() if r["fold"] == f][0]
        tmin = [r["m"] for r in mn.collect() if r["fold"] == f][0]
        assert tmax < tmin


def test_volume_curve_shares(spark):
    from ffn_polars_spark.functions.tick_flow import volume_curve
    HOUR = 3_600_000_000_000
    # Two days; each day 75% of volume in hour 0, 25% in hour 1.
    rows = []
    for d in range(2):
        rows += [("g", d * 24 * HOUR + 0, 75.0), ("g", d * 24 * HOUR + HOUR, 25.0)]
    out = volume_curve(
        spark.createDataFrame(rows, ["g", "ts", "v"]), "v", "ts", by="g"
    )
    got = {r["bucket"]: r for r in out.collect()}
    assert abs(got[0]["avg_share"] - 0.75) < 1e-12 and got[0]["n_days"] == 2
    assert abs(got[1]["avg_share"] - 0.25) < 1e-12


def test_kelly_fraction_closed_form(spark):
    from ffn_polars_spark.functions.eod_ratios import kelly_fraction
    import statistics as st
    rs = [0.01, -0.005, 0.02, 0.0, -0.01, 0.015]
    df = spark.createDataFrame([(r,) for r in rs], ["r"])
    out = df.agg(kelly_fraction("r").alias("k")).collect()[0]
    assert abs(out["k"] - st.mean(rs) / st.variance(rs)) < 1e-12


def test_stateful_cusum_matches_batch_walk(spark, tmp_path):
    import pandas as pd
    from ffn_polars_spark.streaming import stateful_cusum, run_available_now
    from ffn_polars_spark.operators.recursive import cusum_changepoints

    # small tape with alarms; stream it from a staged parquet file
    rows = [("a", i * 1000, float(v)) for i, v in
            enumerate([3, 3, -4, -4, 1, 6, -7, 2, 2, 2])]
    src = str(tmp_path / "tape")
    spark.createDataFrame(rows, ["k", "ts", "x"]).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stateful_cusum(stream, "k", "ts", "x", target=0.0, threshold=5.0)
    drained = {r["k"]: r for r in run_available_now(out, "update").collect()}

    batch = cusum_changepoints(
        spark.createDataFrame(rows, ["k", "ts", "x"]), "ts", "x",
        target=0.0, threshold=5.0, by=["k"],
    ).orderBy("ts").collect()
    n_alarms = sum(1 for r in batch if r["alarm"])
    last = batch[-1]
    exp_sp = 0.0 if last["alarm"] else last["cusum_pos"]
    exp_sn = 0.0 if last["alarm"] else last["cusum_neg"]
    got = drained["a"]
    assert got["n_events"] == len(rows)
    assert got["n_alarms"] == n_alarms
    assert got["cusum_pos"] == exp_sp and got["cusum_neg"] == exp_sn


def test_bootstrap_ci_brackets_mean_and_deterministic(spark):
    from ffn_polars_spark.operators.resample import bootstrap_ci
    rows = [("g", i, float(i % 10)) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    out = bootstrap_ci(
        df, "v", by=["g"], num_trials=50, alpha=0.1, key_col="id", seed=3
    ).collect()[0]
    assert out["ci_lo"] <= out["mean"] <= out["ci_hi"]
    assert out["n_trials"] == 50
    # deterministic draws: a second run reproduces the CI exactly
    out2 = bootstrap_ci(
        df, "v", by=["g"], num_trials=50, alpha=0.1, key_col="id", seed=3
    ).collect()[0]
    assert (out["ci_lo"], out["ci_hi"]) == (out2["ci_lo"], out2["ci_hi"])


def test_fuzzy_match_blocks_and_distance(spark):
    from ffn_polars_spark.operators.dedup import fuzzy_match_pairs
    rows = [("b1", 1, "kitten"), ("b1", 2, "sitten"), ("b1", 3, "kitchen"),
            ("b2", 4, "kitten")]  # same text, different block -> never paired
    out = fuzzy_match_pairs(
        spark.createDataFrame(rows, ["blk", "id", "t"]), "t", "id", "blk",
        max_dist=2,
    )
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in out.collect()}
    assert got == {(1, 2): 1, (1, 3): 2, (2, 3): 3} or (2, 3) not in got
    assert (1, 2) in got and got[(1, 2)] == 1
    assert all(a != 4 and b != 4 for a, b in got)


def test_containment_catches_quote_inclusion(spark):
    from ffn_polars_spark.operators.dedup import containment_pairs
    short = "alpha beta gamma delta epsilon"
    long = short + " zeta eta theta iota kappa " * 5
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    out = containment_pairs(df, threshold=0.9, n=3)
    got = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    # every shingle of the short doc appears in the long one
    assert r["containment_a"] == 1.0 and r["containment_b"] < 0.5


def test_pruning_stats_sorted_vs_shuffled_layout(spark):
    from ffn_polars_spark.operators.quality import pruning_stats
    # layout key == value: perfectly clustered -> most buckets prunable
    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["pos", "v"])
    out = pruning_stats(df, "pos", "v", lo=40.0, hi=49.0, bucket_width=10)
    r = out.collect()[0]
    assert r["n_buckets"] == 10 and r["n_pruned"] == 9
    assert r["rows_pruned"] == 90 and abs(r["prune_fraction"] - 0.9) < 1e-12
    # value uncorrelated with layout -> nothing prunable
    rows = [(i, float((i * 37) % 100)) for i in range(100)]
    r2 = pruning_stats(
        spark.createDataFrame(rows, ["pos", "v"]), "pos", "v",
        lo=40.0, hi=49.0, bucket_width=10,
    ).collect()[0]
    assert r2["n_pruned"] == 0


def test_embedding_covariance_planted(spark):
    from ffn_polars_spark.operators.similarity import embedding_covariance
    import numpy as np
    rng = np.random.RandomState(0)
    x = rng.randn(200)
    vecs = [[float(a), float(2 * a), float(rng.randn())] for a in x]
    # regenerate third dim independently for clean structure
    vecs = [[v[0], v[1], float(z)] for v, z in zip(vecs, rng.randn(200))]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    out = {(r["i"], r["j"]): r for r in embedding_covariance(df).collect()}
    arr = np.array(vecs)
    cov = np.cov(arr, rowvar=False, bias=True)
    for (i, j), r in out.items():
        assert abs(r["cov"] - cov[i][j]) < 1e-9
    # dim1 = 2*dim0 exactly -> corr 1
    assert abs(out[(0, 1)]["corr"] - 1.0) < 1e-9
    assert len(out) == 6  # upper triangle of 3x3


def test_market_basket_lift(spark):
    from ffn_polars_spark.operators.funnel import market_basket
    # 4 baskets: {a,b} x2, {a} x1, {c} x1 -> support(a,b)=0.5,
    # conf(a->b)=2/3, conf(b->a)=1, lift = 0.5/(0.75*0.5)=4/3
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"),
            (1, "a")]  # duplicate inside basket must not double-count
    out = market_basket(
        spark.createDataFrame(rows, ["basket", "item"]), "basket", "item"
    ).collect()
    ab = [r for r in out if r["item_a"] == "a" and r["item_b"] == "b"][0]
    assert ab["n_co"] == 2
    assert abs(ab["support"] - 0.5) < 1e-12
    assert abs(ab["confidence_a"] - 2 / 3) < 1e-12
    assert abs(ab["confidence_b"] - 1.0) < 1e-12
    assert abs(ab["lift"] - 2 * 4 / (3 * 2)) < 1e-12


def test_attribution_first_last_touch(spark):
    from ffn_polars_spark.operators.sessions import attribution
    MIN = 60_000_000_000
    rows = [
        ("u", 0 * MIN, "ad", 0.0),
        ("u", 1 * MIN, "email", 0.0),
        ("u", 2 * MIN, "purchase", 50.0),
        ("u", 3 * MIN, "purchase", 10.0),
        # new session 2h later, converts on first event -> last_touch NULL
        ("u", 150 * MIN, "purchase", 5.0),
        # third session, never converts
        ("u", 300 * MIN, "ad", 0.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "ch", "v"])
    out = attribution(
        df, "ts", "user_id", "ch", (F.col("ch") == "purchase"), "v",
        gap=3600 * 1_000_000_000,
    )
    got = {r["session_id"]: r for r in out.collect()}
    assert got[0]["first_touch"] == "ad" and got[0]["last_touch"] == "email"
    assert got[0]["conversion_value"] == 60.0 and got[0]["n_events"] == 4
    assert got[1]["first_touch"] == "purchase" and got[1]["last_touch"] is None
    assert got[2]["conversion_value"] == 0.0 and got[2]["last_touch"] is None


def test_luhn_known_numbers(spark):
    from ffn_polars_spark.operators.text import luhn_validate
    rows = [(1, "4532015112830366"),   # valid test card number
            (2, "4532015112830367"),   # off-by-one check digit
            (3, "79927398713"),        # classic Luhn example, valid
            (4, "79927398710"),        # invalid
            (5, "4111-1111"),          # non-digits -> NULL
            (6, "7")]                  # too short -> NULL
    out = luhn_validate(
        spark.createDataFrame(rows, ["id", "cand"]), "cand"
    )
    got = {r["id"]: r["luhn_valid"] for r in out.collect()}
    assert got[1] is True and got[2] is False
    assert got[3] is True and got[4] is False
    assert got[5] is None and got[6] is None


def test_pagerank_star_graph(spark):
    from ffn_polars_spark.operators.graph import pagerank
    # star: 1..4 all point at 0; 0 points at 1. Hub must outrank leaves,
    # ranks sum to 1.
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]
    out = pagerank(
        spark.createDataFrame(edges, ["src", "dst"]), iterations=30
    )
    got = {r["node"]: r["rank"] for r in out.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[0] > got[1] > got[2]  # leaf 1 gets hub's mass, 2-4 only base
    assert abs(got[2] - got[3]) < 1e-12 and abs(got[3] - got[4]) < 1e-12


def test_pagerank_dangling_mass(spark):
    from ffn_polars_spark.operators.graph import pagerank
    # 0 -> 1, 1 dangling: without redistribution ranks leak below 1.
    out = pagerank(
        spark.createDataFrame([(0, 1)], ["src", "dst"]), iterations=40
    )
    got = {r["node"]: r["rank"] for r in out.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[1] > got[0]


def test_pareto_front_dominance(spark):
    from ffn_polars_spark.operators.quality import pareto_front
    pts = [("g", 1, 5.0, 10), ("g", 2, 4.0, 11), ("g", 3, 3.0, 12),
           ("g", 2, 3.0, 13),   # dominated by (2,4)
           ("g", 1, 1.0, 14),   # dominated by everything
           ("g", 3, 3.0, 15)]   # exact duplicate of id 12 -> one representative
    out = pareto_front(
        spark.createDataFrame(pts, ["g", "x", "y", "id"]), "x", "y",
        by=["g"], id_col="id",
    )
    got = sorted((r["x"], r["y"]) for r in out.collect())
    assert got == [(1, 5.0), (2, 4.0), (3, 3.0)]


def test_cdc_merge_ops(spark):
    from ffn_polars_spark.operators.scd import cdc_merge
    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "bal"]
    )
    ch = spark.createDataFrame(
        [(2, 1, "U", 21.0), (2, 2, "U", 22.0),   # last write wins -> 22
         (3, 1, "D", 0.0),                        # delete
         (4, 1, "I", 40.0)],                      # insert new key
        ["k", "ts", "op", "bal"],
    )
    out = cdc_merge(snap, ch, "k", "ts", "op", ["bal"])
    got = {r["k"]: r["bal"] for r in out.collect()}
    assert got == {1: 10.0, 2: 22.0, 4: 40.0}


def test_mutual_information_independent_vs_functional(spark):
    from ffn_polars_spark.operators.evaluation import mutual_information
    import itertools
    # independent uniform grid: MI ~ 0
    rows = [("g", float(i), float(j)) for i, j in
            itertools.product(range(8), range(8))]
    out = mutual_information(
        spark.createDataFrame(rows, ["g", "x", "y"]), "x", "y", by="g", bins=8
    ).collect()[0]
    assert abs(out["mi"]) < 1e-9
    # y = 2x: the equal-width y bins coincide with the x bins, so the
    # binned variables are identical -> normalized MI exactly 1
    rows = [("g", float(i), float(2 * i)) for i in range(64)]
    out = mutual_information(
        spark.createDataFrame(rows, ["g", "x", "y"]), "x", "y", by="g", bins=8
    ).collect()[0]
    assert abs(out["mi_normalized"] - 1.0) < 1e-9


def test_groupk_sample_exact_k_and_deterministic(spark):
    from ffn_polars_spark.operators.sketch import groupk_sample
    rows = [(i, "s" + str(i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = groupk_sample(df, 5, by=["source"]).collect()
    from collections import Counter
    c = Counter(r["source"] for r in out)
    assert all(v == 5 for v in c.values()) and len(c) == 3
    out2 = groupk_sample(df.repartition(7), 5, by=["source"]).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)


def test_paired_ttest_known_values(spark):
    from ffn_polars_spark.operators.evaluation import paired_ttest
    import statistics as st
    a = [1.0, 2.0, 3.0, 4.0]
    b = [0.5, 1.8, 2.0, 3.9]
    rows = [("g", x, y) for x, y in zip(a, b)]
    out = paired_ttest(
        spark.createDataFrame(rows, ["g", "a", "b"]), "a", "b", by="g"
    ).collect()[0]
    d = [x - y for x, y in zip(a, b)]
    assert abs(out["mean_diff"] - st.mean(d)) < 1e-12
    expected_t = st.mean(d) / (st.stdev(d) / len(d) ** 0.5)
    assert abs(out["t_stat"] - expected_t) < 1e-12
    assert out["n"] == 4


def test_paired_ttest_zero_variance_null(spark):
    from ffn_polars_spark.operators.evaluation import paired_ttest
    rows = [("g", 2.0, 1.0), ("g", 3.0, 2.0)]   # constant diff 1.0
    out = paired_ttest(
        spark.createDataFrame(rows, ["g", "a", "b"]), "a", "b", by="g"
    ).collect()[0]
    assert out["t_stat"] is None and out["mean_diff"] == 1.0


def test_doc_perplexity_uniformity(spark):
    from ffn_polars_spark.operators.text import doc_perplexity
    import math as m
    # two docs over a 2-word vocab, each word twice: p(w) = (2+1)/(4+2)
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "bb aa")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in doc_perplexity(df).collect()}
    p = 3.0 / 6.0
    for d in (1, 2):
        assert out[d]["n_tokens"] == 2
        assert abs(out[d]["cross_entropy"] - (-m.log(p))) < 1e-12
        assert abs(out[d]["perplexity"] - 1 / p) < 1e-9
    # a doc full of rare words scores higher than a doc of common words
    df2 = spark.createDataFrame(
        [(1, "the the the the"), (2, "zyx qwv")], ["doc_id", "text"]
    )
    o2 = {r["doc_id"]: r["cross_entropy"] for r in doc_perplexity(df2).collect()}
    assert o2[2] > o2[1]


def test_json_extract_stats_mixed_payloads(spark):
    from ffn_polars_spark.operators.wide import json_extract_stats
    rows = [("g", '{"k": 5}'), ("g", '{"k": 15}'), ("g", '{"other": 1}'),
            ("g", "not json"), ("g", None)]
    out = json_extract_stats(
        spark.createDataFrame(rows, ["g", "p"]), "p", "$.k", by="g"
    ).collect()[0]
    assert out["n_rows"] == 5 and out["n_field"] == 2
    assert out["min_v"] == 5.0 and out["max_v"] == 15.0
    assert abs(out["avg_v"] - 10.0) < 1e-12


def test_temporal_cooccurrence_window(spark):
    from ffn_polars_spark.operators.funnel import temporal_cooccurrence
    SEC = 1_000_000_000
    rows = [(1, 0 * SEC, "a"), (1, 10 * SEC, "b"),     # within 30s
            (1, 100 * SEC, "c"),                       # far from both
            (2, 0 * SEC, "a"), (2, 29 * SEC, "b"),     # within (boundary)
            (2, 0 * SEC, "x")]                         # a-x same ts
    out = temporal_cooccurrence(
        spark.createDataFrame(rows, ["u", "ts", "i"]), "ts", "u", "i",
        window=30 * SEC,
    )
    got = {(r["item_a"], r["item_b"]): r["n_co"] for r in out.collect()}
    assert got[("a", "b")] == 2
    assert got[("a", "x")] == 1 and got[("b", "x")] == 1
    assert ("a", "c") not in got and ("b", "c") not in got


def test_theil_sen_ignores_outliers(spark):
    from ffn_polars_spark.operators.sketch import theil_sen_slope
    # y = 2x + noiseless, with 10% wild outliers: median slope stays ~2.
    rows = []
    for i in range(200):
        y = 2.0 * i + (1000.0 if i % 10 == 0 else 0.0)
        rows.append(("g", float(i), y))
    out = theil_sen_slope(
        spark.createDataFrame(rows, ["g", "x", "y"]), "x", "y",
        by=["g"], n_pairs=400,
    ).collect()[0]
    assert abs(out["theil_sen_slope"] - 2.0) < 0.5
    assert out["n_points"] == 200 and out["n_pairs_used"] <= 400


def test_sorted_fuzzy_matches_within_window(spark):
    from ffn_polars_spark.operators.dedup import sorted_fuzzy_pairs
    rows = [("b", 1, "kitten"), ("b", 2, "kittes"), ("b", 3, "kitter"),
            ("b", 4, "zzzzzz")]
    out = sorted_fuzzy_pairs(
        spark.createDataFrame(rows, ["blk", "id", "t"]), "t", "id",
        window=3, max_dist=2, by=["blk"],
    )
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in out.collect()}
    # sort order: kitten(1), kitter(3), kittes(2), zzzzzz(4)
    assert got[(1, 3)] == 1 and got[(1, 2)] == 1 and got[(3, 2)] == 1
    assert all("zzzzzz" not in (a, b) for a, b in got)


def test_fuzzy_max_block_guard_drops_degenerate_blocks(spark):
    from ffn_polars_spark.operators.dedup import fuzzy_match_pairs
    rows = [("big", i, "name" + str(i % 3)) for i in range(50)]
    rows += [("small", 100, "abc"), ("small", 101, "abd")]
    df = spark.createDataFrame(rows, ["blk", "id", "t"])
    out = fuzzy_match_pairs(df, "t", "id", "blk", max_dist=2, max_block=10)
    got = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert got == [(100, 101)]       # the 50-row block never reaches the join


def test_stateful_psi_matches_batch_histogram(spark, tmp_path):
    import math as m
    from ffn_polars_spark.streaming import stateful_psi, run_available_now
    rows = [("a", i, float(v)) for i, v in
            enumerate([5, 15, 15, 25, 95, 95, 95, 5, 5, 5])]
    src = str(tmp_path / "psitape")
    spark.createDataFrame(rows, ["k", "ts", "value"]).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stateful_psi(
        stream, "k", "value", ref_probs=[0.1] * 10, lo=0.0, width=10.0
    )
    got = {r["k"]: r for r in run_available_now(out, "update").collect()}["a"]
    assert got["n_events"] == 10
    counts = [4, 2, 1, 0, 0, 0, 0, 0, 0, 3]
    eps = 1e-6
    psi = sum(
        (max(c / 10.0, eps) - 0.1) * m.log(max(c / 10.0, eps) / 0.1)
        for c in counts
    )
    assert abs(got["psi"] - psi) < 1e-9


def test_shingle_novelty_first_introduction(spark):
    from ffn_polars_spark.operators.dedup import shingle_novelty
    docs = [(1, "a b c d"),          # shingles: abc, bcd — all novel
            (2, "a b c e"),          # abc seen, bce novel -> 0.5
            (3, "a b c d")]          # exact repeat -> 0.0
    out = shingle_novelty(
        spark.createDataFrame(docs, ["doc_id", "text"]), n=3
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["novelty"] == 1.0 and got[1]["n_shingles"] == 2
    assert got[2]["novelty"] == 0.5
    assert got[3]["novelty"] == 0.0


def test_information_value_separating_feature(spark):
    import math as m
    from ffn_polars_spark.operators.evaluation import information_value
    # score separates perfectly: low scores negative, high positive
    rows = [("g", float(i), i >= 50) for i in range(100)]
    out = information_value(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", by="g", bins=2
    )
    got = {r["bin"]: r for r in out.collect()}
    assert got[0]["n_pos"] == 0 and got[0]["n_neg"] == 50
    assert got[1]["n_pos"] == 50 and got[1]["n_neg"] == 0
    # strong-IV direction: each bin's WoE at the eps clamp
    assert got[1]["woe"] == m.log(1.0 / 1e-6)
    iv = sum(r["iv_term"] for r in got.values())
    assert iv > 0.3


def test_ols_residual_diagnostics_planted(spark):
    from ffn_polars_spark.operators.evaluation import ols_residual_diagnostics
    # y = 2x + 1 exactly: r2 = 1, residuals 0 -> DW null (sse = 0)
    rows = [("g", i, 2.0 * x + 1.0, x) for i, x in
            enumerate([0.1, -0.2, 0.3, 0.15, -0.05])]
    out = ols_residual_diagnostics(
        spark.createDataFrame(rows, ["g", "ts", "y", "x"]), "y", "x", "ts",
        by="g",
    ).collect()[0]
    assert abs(out["beta"] - 2.0) < 1e-12 and abs(out["alpha"] - 1.0) < 1e-12
    assert abs(out["r2"] - 1.0) < 1e-9
    # residuals are float noise (~1e-17), so DW is defined but meaningless;
    # r2 ~ 1 is the signal that the fit explains everything
    # alternating residuals -> DW near 4 (strong negative autocorrelation)
    rows = [("g", i, (1.0 if i % 2 == 0 else -1.0), 0.0) for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "ts", "y", "x"])
    # x constant -> var_pop(x)=0 -> beta NULL; use tiny slope-free variant:
    rows = [("g", i, (1.0 if i % 2 == 0 else -1.0) + 0.001 * i, 0.001 * i)
            for i in range(50)]
    out = ols_residual_diagnostics(
        spark.createDataFrame(rows, ["g", "ts", "y", "x"]), "y", "x", "ts",
        by="g",
    ).collect()[0]
    assert out["durbin_watson"] > 3.0


def test_debounce_anchors_to_kept_event(spark):
    from ffn_polars_spark.operators.recursive import debounce
    # cooldown 10: events at 0, 5, 9, 12, 25 -> keep 0 (then 5, 9 inside
    # cooldown of 0; 12 >= 0+10 keeps; 25 >= 12+10 keeps).
    rows = [("k", t) for t in [0, 5, 9, 12, 25]]
    out = debounce(
        spark.createDataFrame(rows, ["k", "ts"]), "ts", cooldown=10, by=["k"]
    )
    got = {r["ts"]: r["kept"] for r in out.collect()}
    assert got == {0: True, 5: False, 9: False, 12: True, 25: True}
    # fixed-grid dedup would WRONGLY keep 9 (bucket 0) vs 12 — the anchor
    # to the kept event is the semantic difference this walk implements


def test_impact_decay_permanent_vs_transient(spark):
    from ffn_polars_spark.functions.quote import impact_decay
    SEC = 1_000_000_000
    # One uptick buy at t=10; mid jumps 0.5 immediately and stays (permanent)
    trades = spark.createDataFrame(
        [("t", 1, 9 * SEC, 10.0), ("t", 2, 10 * SEC, 10.2)],
        ["event_type", "event_id", "ts_ns", "price"],
    )
    quotes = spark.createDataFrame(
        [("t", 8 * SEC, 10.1, 9.9),    # mid 10.0
         ("t", 11 * SEC, 10.6, 10.4)], # mid 10.5 from t=11 on
        ["event_type", "ts_ns", "ask", "bid"],
    )
    out = impact_decay(
        trades, quotes, horizons=[2 * SEC, 100 * SEC], by=["event_type"]
    )
    got = {r["horizon"]: r for r in out.collect()}
    # trade 2 (d=+1, mid0=10.0): both horizons land after the quote update
    # trade 1 (d=0) contributes 0 at every horizon
    assert abs(got[2 * SEC]["avg_impact"] - 0.25) < 1e-12   # (0 + 0.5)/2
    assert abs(got[100 * SEC]["avg_impact"] - 0.25) < 1e-12
    assert got[2 * SEC]["n"] == 2


def test_union_evolve_aligns_and_widens(spark):
    from ffn_polars_spark.operators.wide import union_evolve
    a = spark.createDataFrame([(1, 10)], ["k", "v"])                  # v int
    b = spark.createDataFrame([(2, 3.5, "x")], ["k", "v", "extra"])   # v double
    out = union_evolve(a, b)
    assert out.columns == ["k", "v", "extra"]
    assert dict(out.dtypes)["v"] == "double"
    got = {r["k"]: r for r in out.collect()}
    assert got[1]["v"] == 10.0 and got[1]["extra"] is None
    assert got[2]["extra"] == "x"
    import pytest as _pytest
    c = spark.createDataFrame([("s",)], ["v"])   # string v cannot widen
    with _pytest.raises(TypeError):
        union_evolve(a, c)


def test_skew_profile_recommends_buckets(spark):
    from ffn_polars_spark.operators.skew import skew_profile
    rows = [("hot",)] * 90 + [("a",)] * 5 + [("b",)] * 5
    out = skew_profile(spark.createDataFrame(rows, ["k"]), "k", top_k=2)
    got = {r["key"]: r for r in out.collect()}
    assert set(got) == {"hot", "a"}   # top-2 by count then key
    r = got["hot"]
    assert r["rank"] == 1 and abs(r["share"] - 0.9) < 1e-12
    assert r["n_keys"] == 3
    # hot key is 90 rows vs mean 100/3: ceil(90/33.33) = 3 buckets
    assert r["recommended_buckets"] == 3


def test_mann_whitney_u_separated_samples(spark):
    from ffn_polars_spark.operators.evaluation import mann_whitney_u
    # sample1 = {1,2,3}, sample0 = {4,5,6}: R1 = 6, U = 0,
    # var = 9/12 * 7 = 5.25, z = -4.5/sqrt(5.25)
    rows = [(v, 1) for v in (1.0, 2.0, 3.0)] + [(v, 0) for v in (4.0, 5.0, 6.0)]
    out = mann_whitney_u(
        spark.createDataFrame(rows, ["v", "y"]), "v", "y"
    ).collect()[0]
    assert out["u"] == 0.0
    assert abs(out["z"] - (-4.5 / 5.25 ** 0.5)) < 1e-12
    assert out["n_pos"] == 3 and out["n_neg"] == 3


def test_mann_whitney_u_tie_correction(spark):
    from ffn_polars_spark.operators.evaluation import mann_whitney_u
    # values [1,1,2,2], labels [1,0,1,0]: midranks 1.5,1.5,3.5,3.5,
    # R1 = 5, U = 2 = mu -> z = 0 with the tie-corrected variance
    rows = [(1.0, 1), (1.0, 0), (2.0, 1), (2.0, 0)]
    out = mann_whitney_u(
        spark.createDataFrame(rows, ["v", "y"]), "v", "y"
    ).collect()[0]
    assert out["u"] == 2.0
    assert abs(out["z"]) < 1e-12


def test_rank_portfolio_long_short_spread(spark):
    from ffn_polars_spark.operators.evaluation import rank_portfolio
    # one period, 5 keys, signal = key index, ret = index/10:
    # ntile(5) puts one key per bucket -> long=.5 short=.1 spread=.4
    rows = [("p1", f"k{i}", float(i), i / 10.0) for i in range(1, 6)]
    out = rank_portfolio(
        spark.createDataFrame(rows, ["p", "k", "sig", "ret"]),
        "p", "k", "sig", "ret", n_quantiles=5,
    ).collect()[0]
    assert abs(out["long_ret"] - 0.5) < 1e-12
    assert abs(out["short_ret"] - 0.1) < 1e-12
    assert abs(out["spread"] - 0.4) < 1e-12
    assert out["n_long"] == 1 and out["n_short"] == 1


def test_chi_square_textbook_2x2(spark):
    # 2x2 grid: [[10, 20], [20, 10]] -> chi2 = 60*(10*10-20*20)^2/(30*30*30*30)
    # = n*(ad-bc)^2/(r1*r2*c1*c2) = 60*90000/810000 = 6.666...
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 20 + [("b", "y")] * 10
    )
    from ffn_polars_spark.operators.evaluation import chi_square

    out = chi_square(spark.createDataFrame(rows, ["u", "v"]), "u", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 60 and r["dof"] == 1
    assert abs(r["chi2"] - 60 * (10 * 10 - 20 * 20) ** 2 / 810000) < 1e-9


def test_chi_square_counts_observed_zero_cells(spark):
    # a never pairs with z: the (a,z) cell is absent from the observed
    # frame but must still contribute (0-E)^2/E
    rows = [("a", "x")] * 5 + [("b", "x")] * 5 + [("b", "z")] * 5
    from ffn_polars_spark.operators.evaluation import chi_square

    r = chi_square(spark.createDataFrame(rows, ["u", "v"]), "u", "v").collect()[0]
    # E(a,z) = 5*5/15 = 5/3; manual chi2 = 3.75
    assert abs(r["chi2"] - 3.75) < 1e-9
    assert r["dof"] == 1 and r["n"] == 15


def test_chi_square_independent_is_zero(spark):
    # perfectly proportional grid -> chi2 exactly 0
    rows = [("a", "x")] * 4 + [("a", "y")] * 2 + [("b", "x")] * 8 + [("b", "y")] * 4
    from ffn_polars_spark.operators.evaluation import chi_square

    r = chi_square(spark.createDataFrame(rows, ["u", "v"]), "u", "v").collect()[0]
    assert abs(r["chi2"]) < 1e-12


def test_cohens_kappa_textbook(spark):
    # classic 2x2: both say yes 20, both no 15, a-yes/b-no 5, a-no/b-yes 10
    # po = 35/50 = .7; pa_yes=.5, pb_yes=.6 -> pe = .3+.2 = .5; kappa = .4
    from ffn_polars_spark.operators.evaluation import cohens_kappa

    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15 + [("y", "n")] * 5 + [("n", "y")] * 10
    )
    r = cohens_kappa(spark.createDataFrame(rows, ["a", "b"]), "a", "b").collect()[0]
    assert r["n"] == 50
    assert abs(r["po"] - 0.7) < 1e-12
    assert abs(r["pe"] - 0.5) < 1e-12
    assert abs(r["kappa"] - 0.4) < 1e-12


def test_cohens_kappa_constant_raters_null(spark):
    # both raters constant and identical: pe = 1, kappa undefined -> NULL
    from ffn_polars_spark.operators.evaluation import cohens_kappa

    rows = [("y", "y")] * 5
    r = cohens_kappa(spark.createDataFrame(rows, ["a", "b"]), "a", "b").collect()[0]
    assert r["kappa"] is None and r["po"] == 1.0 and r["pe"] == 1.0


def test_cohens_kappa_label_present_on_one_side_only(spark):
    # rater b uses a label a never uses: the full-outer marginal join
    # must keep it (na=0 contributes 0 to pe, not a dropped row)
    from ffn_polars_spark.operators.evaluation import cohens_kappa

    rows = [("y", "y"), ("y", "z"), ("n", "n"), ("n", "n")]
    r = cohens_kappa(spark.createDataFrame(rows, ["a", "b"]), "a", "b").collect()[0]
    # po = 3/4; pe = (2*1 + 2*2 + 0*1)/16 = 6/16
    assert abs(r["po"] - 0.75) < 1e-12
    assert abs(r["pe"] - 6 / 16) < 1e-12


def test_triangle_count_book_graph(spark):
    from ffn_polars_spark.operators.graph import triangle_count

    # square 1-2-3-4-1 with one diagonal 1-3: triangles (1,2,3), (1,3,4)
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    out = {r["node"]: r for r in triangle_count(
        spark.createDataFrame(edges, ["src", "dst"])
    ).collect()}
    assert {n: r["n_triangles"] for n, r in out.items()} == {
        1: 2, 2: 1, 3: 2, 4: 1
    }
    assert out[1]["degree"] == 3
    # node 1: 2 triangles over C(3,2)=3 wedges -> clustering 2/3
    assert abs(out[1]["clustering"] - 2 / 3) < 1e-12
    assert out[2]["clustering"] == 1.0


def test_triangle_count_canonicalizes_direction_and_dupes(spark):
    from ffn_polars_spark.operators.graph import triangle_count

    # same triangle given as mixed directions, duplicates, and a self-loop
    edges = [(2, 1), (1, 2), (2, 3), (3, 1), (1, 1)]
    out = {r["node"]: r for r in triangle_count(
        spark.createDataFrame(edges, ["src", "dst"])
    ).collect()}
    assert all(r["n_triangles"] == 1 for r in out.values())
    assert all(r["degree"] == 2 for r in out.values())


def test_triangle_count_triangle_free(spark):
    from ffn_polars_spark.operators.graph import triangle_count

    # a path graph has no triangles; degree-1 endpoints get NULL clustering
    edges = [(1, 2), (2, 3)]
    out = {r["node"]: r for r in triangle_count(
        spark.createDataFrame(edges, ["src", "dst"])
    ).collect()}
    assert all(r["n_triangles"] == 0 for r in out.values())
    assert out[1]["clustering"] is None
    assert out[2]["clustering"] == 0.0


def test_newey_west_iid_matches_plain_se(spark):
    from ffn_polars_spark.operators.evaluation import newey_west_tstat

    # all autocovariances of an exactly-alternating series: gamma_1 is
    # negative, so NW variance < naive variance; check the closed form
    rows = [("a", i, 1.0 if i % 2 == 0 else -1.0) for i in range(8)]
    r = newey_west_tstat(
        spark.createDataFrame(rows, ["k", "t", "v"]), "v",
        order_by="t", by="k", lags=1,
    ).collect()[0]
    # mean 0, u_t = v_t; g0 = 8, g1 = -7 (7 adjacent pairs, each -1)
    # var = 1 + 2*(1-1/2)*(-7/8) = 1 - 7/8 = 1/8; se = sqrt(1/64)
    assert r["mean"] == 0.0
    assert abs(r["se_nw"] - (1.0 / 64.0) ** 0.5) < 1e-12
    assert r["t_nw"] == 0.0 and r["n"] == 8


def test_newey_west_zero_lags_is_plain_se(spark):
    from ffn_polars_spark.operators.evaluation import newey_west_tstat

    rows = [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0)]
    r = newey_west_tstat(
        spark.createDataFrame(rows, ["k", "t", "v"]), "v",
        order_by="t", by="k", lags=0,
    ).collect()[0]
    # u = (-1,0,1); var = 2/3; se = sqrt(2/9); t = 2/sqrt(2/9)
    assert abs(r["se_nw"] - (2.0 / 9.0) ** 0.5) < 1e-12
    assert abs(r["t_nw"] - 2.0 / (2.0 / 9.0) ** 0.5) < 1e-12


def test_event_study_car_hand_computed(spark):
    from ffn_polars_spark.operators.evaluation import event_study

    # returns 1..5 per key a (mean 3); event at t=3, window 1:
    # CAR = (2-3)+(3-3)+(4-3) = 0, n_obs 3
    rets = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 6)], ["k", "t", "r"]
    )
    evs = spark.createDataFrame([("a", 3)], ["k", "t"])
    r = event_study(rets, evs, "k", "t", "r", window=1).collect()[0]
    assert r["event_seq"] == 3 and r["n_obs"] == 3
    assert abs(r["car"]) < 1e-12


def test_event_study_clipped_window(spark):
    from ffn_polars_spark.operators.evaluation import event_study

    # event at the series start: window clips, n_obs < 2w+1
    rets = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 0.0)], ["k", "t", "r"]
    )
    evs = spark.createDataFrame([("a", 1)], ["k", "t"])
    r = event_study(rets, evs, "k", "t", "r", window=2).collect()[0]
    # mean 5; CAR = (10-5)+(0-5) = 0 over the 2 surviving obs
    assert r["n_obs"] == 2 and abs(r["car"]) < 1e-12


def test_p_adjust_bh_textbook(spark):
    from ffn_polars_spark.operators.evaluation import p_adjust_bh

    # classic example: p = .01, .02, .03, .04, .05 with m=5
    # raw = .05, .05, .05, .05, .05 -> all adj .05
    rows = [(i, 0.01 * i) for i in range(1, 6)]
    out = p_adjust_bh(spark.createDataFrame(rows, ["id", "p"]), "p").collect()
    assert all(abs(r["p_adj"] - 0.05) < 1e-12 for r in out)


def test_p_adjust_bh_monotone_enforcement(spark):
    from ffn_polars_spark.operators.evaluation import p_adjust_bh

    # p = .01, .04, .05: raw = .03, .06, .05 -> tail min makes
    # adj = .03, .05, .05 (rank 2's .06 is pulled down by rank 3)
    rows = [(1, 0.01), (2, 0.04), (3, 0.05)]
    got = {r["id"]: r["p_adj"] for r in p_adjust_bh(
        spark.createDataFrame(rows, ["id", "p"]), "p"
    ).collect()}
    assert abs(got[1] - 0.03) < 1e-12
    assert abs(got[2] - 0.05) < 1e-12
    assert abs(got[3] - 0.05) < 1e-12


def test_p_adjust_bh_families_and_nulls(spark):
    from ffn_polars_spark.operators.evaluation import p_adjust_bh

    rows = [("a", 1, 0.5), ("a", 2, None), ("b", 3, 0.02)]
    out = {r["id"]: r for r in p_adjust_bh(
        spark.createDataFrame(rows, ["fam", "id", "p"]), "p", by="fam"
    ).collect()}
    assert out[1]["p_adj"] == 0.5      # m=1 within family a
    assert out[2]["p_adj"] is None     # null passthrough, not counted
    assert abs(out[3]["p_adj"] - 0.02) < 1e-12


def test_proportion_ztest_hand_computed(spark):
    from ffn_polars_spark.operators.evaluation import proportion_ztest

    # arm 1: 30/100, arm 0: 20/100; pooled .25
    rows = [(1, 1)] * 30 + [(0, 1)] * 70 + [(1, 0)] * 20 + [(0, 0)] * 80
    r = proportion_ztest(
        spark.createDataFrame(rows, ["s", "v"]), "s", "v"
    ).collect()[0]
    assert r["n_1"] == 100 and r["n_0"] == 100
    assert abs(r["lift"] - 0.10) < 1e-12
    import math
    se = math.sqrt(0.25 * 0.75 * (1 / 100 + 1 / 100))
    assert abs(r["z"] - 0.10 / se) < 1e-12


def test_proportion_ztest_degenerate_null_z(spark):
    from ffn_polars_spark.operators.evaluation import proportion_ztest

    # all successes in both arms: pooled variance 0 -> z NULL
    rows = [(1, 1), (1, 1), (1, 0), (1, 0)]
    r = proportion_ztest(
        spark.createDataFrame(rows, ["s", "v"]), "s", "v"
    ).collect()[0]
    assert r["z"] is None and r["rate_1"] == 1.0 and r["rate_0"] == 1.0


def test_forecast_mase_perfect_seasonality(spark):
    from ffn_polars_spark.operators.evaluation import forecast_mase

    # period-2 series 1,9,1,9,...: seasonal(2) error 0, naive error 8
    rows = [("a", i, 1.0 if i % 2 == 0 else 9.0) for i in range(10)]
    r = forecast_mase(
        spark.createDataFrame(rows, ["k", "t", "v"]), "v",
        order_by="t", by="k", season=2,
    ).collect()[0]
    assert r["mase"] == 0.0
    assert r["mae_seasonal"] == 0.0 and r["mae_naive"] == 8.0


def test_simpson_check_detects_reversal(spark):
    from ffn_polars_spark.operators.evaluation import simpson_check

    # within each stratum y DECREASES in x; pooled y INCREASES in x
    # (the strata are offset so the between-group trend dominates)
    rows = (
        [("g1", float(x), 10.0 - x) for x in range(5)]
        + [("g2", float(x) + 20.0, 40.0 - x) for x in range(5)]
    )
    out = {r["stratum"]: r for r in simpson_check(
        spark.createDataFrame(rows, ["g", "x", "y"]), "x", "y", "g"
    ).collect()}
    assert out["g1"]["slope"] < 0 and out["g2"]["slope"] < 0
    assert out["__pooled__"]["slope"] > 0
    assert out["__pooled__"]["n"] == 10


def test_feature_auc_screen_ranks_features(spark):
    from ffn_polars_spark.operators.evaluation import feature_auc_screen

    # f_good separates perfectly; f_noise is constant -> AUC 0.5 (all ties)
    rows = [(1, float(i), 7.0) for i in range(5, 10)] + [
        (0, float(i), 7.0) for i in range(5)
    ]
    out = {r["feature"]: r for r in feature_auc_screen(
        spark.createDataFrame(rows, ["y", "f_good", "f_noise"]),
        "y", ["f_good", "f_noise"],
    ).collect()}
    assert out["f_good"]["auc"] == 1.0
    assert abs(out["f_noise"]["auc"] - 0.5) < 1e-12
    assert out["f_good"]["n_pos"] == 5 and out["f_good"]["n_neg"] == 5


def test_ols2_recovers_planted_coefficients(spark):
    from ffn_polars_spark.operators.evaluation import ols2_by_group

    # y = 2 + 3*x1 - 0.5*x2 exactly -> perfect recovery, r2 = 1
    rows = [
        ("g", float(x1), float(x2), 2.0 + 3.0 * x1 - 0.5 * x2)
        for x1 in range(5) for x2 in range(4)
    ]
    r = ols2_by_group(
        spark.createDataFrame(rows, ["g", "x1", "x2", "y"]),
        "y", "x1", "x2", by="g",
    ).collect()[0]
    assert abs(r["alpha"] - 2.0) < 1e-9
    assert abs(r["beta1"] - 3.0) < 1e-9
    assert abs(r["beta2"] + 0.5) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-9


def test_ols2_collinear_regressors_null(spark):
    from ffn_polars_spark.operators.evaluation import ols2_by_group

    # x2 = 2*x1: det = 0 -> all coefficients NULL
    rows = [("g", float(i), 2.0 * i, float(i * 3)) for i in range(10)]
    r = ols2_by_group(
        spark.createDataFrame(rows, ["g", "x1", "x2", "y"]),
        "y", "x1", "x2", by="g",
    ).collect()[0]
    assert r["beta1"] is None and r["beta2"] is None and r["alpha"] is None


def test_effective_sample_size_iid_near_n(spark):
    from ffn_polars_spark.operators.evaluation import effective_sample_size

    # alternating series: rho_1 strongly negative -> factor floors at 1,
    # n_eff = n (negative autocorrelation never inflates the SE here)
    rows = [("g", i, 1.0 if i % 2 == 0 else -1.0) for i in range(40)]
    r = effective_sample_size(
        spark.createDataFrame(rows, ["g", "t", "v"]), "v",
        order_by="t", by="g", lags=2,
    ).collect()[0]
    assert r["n"] == 40 and r["n_eff"] == 40.0
    assert r["autocorr_sum"] < 0


def test_effective_sample_size_persistent_series_shrinks(spark):
    from ffn_polars_spark.operators.evaluation import effective_sample_size

    # long runs of equal values: strong positive autocorrelation
    rows = [("g", i, 1.0 if (i // 10) % 2 == 0 else -1.0) for i in range(60)]
    r = effective_sample_size(
        spark.createDataFrame(rows, ["g", "t", "v"]), "v",
        order_by="t", by="g", lags=5,
    ).collect()[0]
    assert r["n_eff"] < r["n"] / 2


def test_rate_ratio_test_hand_computed(spark):
    import math

    from ffn_polars_spark.operators.evaluation import rate_ratio_test

    rows = [(1,)] * 40 + [(0,)] * 10
    r = rate_ratio_test(
        spark.createDataFrame(rows, ["v"]), "v"
    ).collect()[0]
    assert r["n_1"] == 40 and r["n_0"] == 10
    assert abs(r["rate_ratio"] - 4.0) < 1e-12
    assert abs(r["z"] - math.log(4.0) / math.sqrt(1 / 40 + 1 / 10)) < 1e-12


def test_rate_ratio_test_with_exposure(spark):
    from ffn_polars_spark.operators.evaluation import rate_ratio_test

    # arm 1: 10 events over exposure 5; arm 0: 10 events over exposure 20
    rows = [(1, 0.5)] * 10 + [(0, 2.0)] * 10
    r = rate_ratio_test(
        spark.createDataFrame(rows, ["v", "w"]), "v", exposure_col="w"
    ).collect()[0]
    assert abs(r["rate_1"] - 2.0) < 1e-12
    assert abs(r["rate_0"] - 0.5) < 1e-12
    assert abs(r["rate_ratio"] - 4.0) < 1e-12


def test_tail_dependence_coupled_vs_independent(spark):
    from ffn_polars_spark.operators.evaluation import tail_dependence

    # y = x: perfect tail coupling -> lambda_u = 1
    rows = [("c", float(i), float(i)) for i in range(100)]
    r = tail_dependence(
        spark.createDataFrame(rows, ["g", "x", "y"]), "x", "y",
        by="g", q=0.9,
    ).collect()[0]
    assert r["lambda_u"] == 1.0
    assert abs(r["lift"] - 1.0 / r["benchmark"]) < 1e-9

    # y anti-aligned with x: no co-exceedance -> lambda_u = 0
    rows2 = [("a", float(i), float(99 - i)) for i in range(100)]
    r2 = tail_dependence(
        spark.createDataFrame(rows2, ["g", "x", "y"]), "x", "y",
        by="g", q=0.9,
    ).collect()[0]
    assert r2["lambda_u"] == 0.0


def test_spearman_constant_side_null(spark):
    """r13 corr-audit: an all-tied side (constant midranks) must yield
    NULL spearman, not an ANSI DIVIDE_BY_ZERO crash."""
    from ffn_polars_spark.operators.evaluation import spearman_corr

    df = spark.createDataFrame(
        [(1.0, float(i)) for i in range(5)], ["x", "y"]
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r["spearman"] is None and r["n"] == 5
