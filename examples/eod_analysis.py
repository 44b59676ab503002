"""EOD portfolio analytics on the reference's 10-year price CSV.

Run: python examples/eod_analysis.py [path/to/test_data.csv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ffn_polars_spark as ffn
from ffn_polars_spark import Over
from ffn_polars_spark.sources import GOLDEN_CSV, get_spark, load_golden_prices


def main() -> None:
    spark = get_spark("eod-example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    path = sys.argv[1] if len(sys.argv) > 1 else GOLDEN_CSV
    px = load_golden_prices(spark, path)
    over = Over(order_by="Date")

    # Series transforms: returns and drawdown per ticker column
    series = px.select(
        "Date",
        ffn.eod.to_returns("AAPL", over=over),
        ffn.eod.to_drawdown_series("AAPL", over=over),
    )
    series.show(5)

    # Scalar analytics across the full history
    px.select(
        ffn.eod.calc_cagr("AAPL", "Date"),
        ffn.eod.calc_total_return("AAPL", "Date"),
        ffn.eod.year_frac("Date"),
    ).show()

    # Max drawdown is order-dependent -> DataFrame-level two-phase operator
    from ffn_polars_spark.functions.eod_risk import calc_max_drawdown

    calc_max_drawdown(px, "AAPL", order_by="Date").show()

    # Ratio suite on daily returns
    rets = px.select("Date", ffn.eod.to_returns("AAPL", over=over)).where(
        "AAPL_returns IS NOT NULL"
    )
    rets.select(
        ffn.eod.calc_sharpe("AAPL_returns", rf=0.0, n=252),
        ffn.eod.sortino_ratio("AAPL_returns", rf=0.0, n=252),
        ffn.eod.omega_ratio("AAPL_returns"),
    ).show()

    # Episode-level drawdown report, calendar monthly returns, and the
    # EWMA smoother (per-key sequential scan)
    from ffn_polars_spark.functions.eod_returns import monthly_returns
    from ffn_polars_spark.functions.eod_risk import drawdown_details
    from ffn_polars_spark.operators.recursive import ewma

    drawdown_details(px, "AAPL", order_by="Date").orderBy(
        "depth"
    ).show(3)
    monthly_returns(px, "AAPL").orderBy("year", "month").show(3)
    ewma(px.select("Date", "AAPL"), "AAPL", 0.06, "Date").orderBy(
        "Date", ascending=False
    ).show(3)

    # Portfolio composition: weighted cross-asset return series, then the
    # whole EOD risk panel applies to the portfolio series itself
    from ffn_polars_spark.functions.eod_returns import portfolio_returns

    # build per-ticker daily returns, then a 60/40-style blend
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    px_long = px.selectExpr(
        "Date", "stack(3, 'AAPL', AAPL, 'MSFT', MSFT, 'C', C) AS (ticker, price)"
    )
    w = Window.partitionBy("ticker").orderBy("Date")
    port_rets = px_long.select(
        "ticker", "Date",
        (F.col("price") / F.lag("price").over(w) - 1).alias("ret"),
    )
    port = portfolio_returns(
        port_rets, {"AAPL": 0.5, "MSFT": 0.3, "C": 0.2},
        key_col="ticker", ts_col="Date", return_col="ret",
    )
    port.orderBy("ts").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
