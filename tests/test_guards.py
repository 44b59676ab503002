"""Guard-mode contracts: WARN / STRICT / SILENT behavior of the input guard
layer (reference guardrails.py:12-31 semantics)."""

import warnings

import pytest

import ffn_polars_spark as ffn
from ffn_polars_spark import GuardMode, set_guard_mode
from ffn_polars_spark.utils import guard_input


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_guard_mode(GuardMode.WARN)


def test_warn_mode_emits_warning_and_proceeds(spark):
    # to_price_index requires the input name to contain "returns"
    set_guard_mode(GuardMode.WARN)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        col = ffn.eod.to_price_index(
            "not_rets", over=ffn.Over(order_by="d")
        )
    assert col is not None  # expression still built
    assert any("returns" in str(w.message) for w in caught)


def test_strict_mode_raises(spark):
    set_guard_mode(GuardMode.STRICT)
    with pytest.raises(ValueError, match="returns"):
        ffn.eod.to_price_index("not_rets", over=ffn.Over(order_by="d"))


def test_silent_mode_is_quiet(spark):
    set_guard_mode(GuardMode.SILENT)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        col = ffn.eod.to_price_index("not_rets", over=ffn.Over(order_by="d"))
    assert col is not None
    assert not [w for w in caught if "guard" in str(w.message)]


def test_computed_column_no_inspection_warning(spark):
    """A computed Column has no resolvable root name in Spark — the guard
    must stay silent instead of emitting '[guard] Column unknown ... could
    not be inspected' on every legitimate expression input (the sim path
    passes computed price/volume columns; round-5 catalog runs were noisy)."""
    from pyspark.sql import functions as F

    set_guard_mode(GuardMode.WARN)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        col = ffn.tick.calc_vwap(F.col("price") * 1.0, F.col("volume") + 0)
    assert col is not None
    assert not [w for w in caught if "guard" in str(w.message)]
    # STRICT must not raise on structurally-uninspectable inputs either
    set_guard_mode(GuardMode.STRICT)
    assert ffn.tick.calc_vwap(F.col("price") * 1.0, F.col("volume") + 0) is not None


def test_conforming_name_no_warning(spark):
    set_guard_mode(GuardMode.WARN)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ffn.eod.to_price_index("my_returns", over=ffn.Over(order_by="d"))
    assert not [w for w in caught if "guard" in str(w.message)]
