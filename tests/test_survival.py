"""Kaplan–Meier product-limit estimator."""

import pytest

from ffn_polars_spark.operators.survival import kaplan_meier


def test_kaplan_meier_textbook_curve(spark):
    # durations 1(e) 2(e) 3(c) 4(e) 5(c): S = .8, .6, then .3 at t=4
    rows = [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 1), (5.0, 0)]
    out = kaplan_meier(
        spark.createDataFrame(rows, ["dur", "ev"]), "dur", "ev"
    ).collect()
    got = {r["t"]: r for r in sorted(out, key=lambda r: r["t"])}
    assert sorted(got) == [1.0, 2.0, 4.0]  # censored times emit no row
    assert got[1.0]["n_at_risk"] == 5 and abs(got[1.0]["survival"] - 0.8) < 1e-12
    assert got[2.0]["n_at_risk"] == 4 and abs(got[2.0]["survival"] - 0.6) < 1e-12
    assert got[4.0]["n_at_risk"] == 2 and abs(got[4.0]["survival"] - 0.3) < 1e-12
    assert got[4.0]["n_censored"] == 0


def test_kaplan_meier_all_events_hits_zero(spark):
    # everyone dies: last factor is exactly 0 -> survival pinned to 0,
    # no ln(0) anywhere in the plan
    rows = [(1.0, 1), (2.0, 1)]
    out = kaplan_meier(
        spark.createDataFrame(rows, ["dur", "ev"]), "dur", "ev"
    ).collect()
    got = {r["t"]: r["survival"] for r in out}
    assert abs(got[1.0] - 0.5) < 1e-12
    assert got[2.0] == 0.0


def test_kaplan_meier_grouped_and_tied(spark):
    # two ties at t=1 in group a (d=2, n=3): S = 1/3; group b untouched
    rows = [("a", 1.0, 1), ("a", 1.0, 1), ("a", 2.0, 0),
            ("b", 5.0, 1)]
    out = kaplan_meier(
        spark.createDataFrame(rows, ["g", "dur", "ev"]), "dur", "ev", by="g"
    ).collect()
    got = {(r["g"], r["t"]): r for r in out}
    a = got[("a", 1.0)]
    assert a["n_events"] == 2 and a["n_at_risk"] == 3
    assert abs(a["survival"] - (1 - 2 / 3)) < 1e-12
    assert got[("b", 5.0)]["survival"] == 0.0
