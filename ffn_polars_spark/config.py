"""Global configuration constants.

Parity: /root/reference/ffn_polars/config.py:1 (TRADING_DAYS_PER_YEAR) and
/root/reference/ffn_polars/expr/tick/utils.py:1-6 (nanosecond SCALE map).
"""

TRADING_DAYS_PER_YEAR = 252

# Nanosecond-base time unit scales. Tick timestamps are stored as LongType
# epoch-nanoseconds (Spark TimestampType is microsecond-precision, which would
# silently truncate exchange feed timestamps).
SCALE = {
    "s": 1_000_000_000,
    "ms": 1_000_000,
    "us": 1_000,
    "ns": 1,
}

# Average year length in seconds (365.25 days), used by year_frac / CAGR.
SECONDS_PER_YEAR = 31_557_600.0
