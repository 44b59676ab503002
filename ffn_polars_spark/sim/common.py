"""Market constants shared by the quote and trade simulators.

Behavioral parity with /root/reference/ffn_polars/sim/common.py:3-42 (US
equity exchange ids + SIP weights, the tape assignment rule, and the
09:30-16:00 US/Eastern trading window anchored at 2024-04-12), re-expressed
as Column logic where the reference used per-row Python.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

from ffn_polars_spark.sim.rand import randint

# (exchange id, name, SIP weight) — common.py:3-15
EXCHANGES = [
    (12, "Nasdaq", 0.25),
    (10, "NYSE", 0.20),
    (11, "NYSE Arca", 0.15),
    (8, "Cboe EDGX", 0.15),
    (2, "Nasdaq BX", 0.10),
    (1, "AMEX", 0.05),
    (201, "FINRA NYSE TRF", 0.05),
    (202, "FINRA Nasdaq TRF Carteret", 0.05),
]
EXCHANGE_IDS = [e[0] for e in EXCHANGES]
EXCHANGE_WEIGHTS = [e[2] for e in EXCHANGES]

_TAPE_1 = (10, 11, 1)  # NYSE-listed venues
_TAPE_3 = (12, 2)  # Nasdaq venues
_TRF = (201, 202)  # FINRA TRFs report on a random tape


def assign_tape(
    exchange: Column, id_col: Column, tag: str, seed: int, hash_fn: str = "xxhash64"
) -> Column:
    """Tape 1/2/3 from exchange id (common.py:18-26). TRF venues draw a
    uniform tape, like the reference's ``np.random.choice([1, 2, 3])``."""
    rand_tape = (randint(id_col, tag, seed, 0, 3, hash_fn=hash_fn) + 1).cast("int")
    return (
        F.when(exchange.isin(*_TAPE_1), F.lit(1))
        .when(exchange.isin(*_TAPE_3), F.lit(3))
        .when(exchange.isin(*_TRF), rand_tape)
        .otherwise(F.lit(2))
    )


def get_trading_window_ns(day_offset: int = 0) -> tuple[int, int]:
    """(open, close) as epoch-ns for 09:30-16:00 US/Eastern on
    2024-04-12 + day_offset (common.py:29-42)."""
    try:
        from zoneinfo import ZoneInfo

        tz = ZoneInfo("US/Eastern")
    except Exception:  # pragma: no cover - zoneinfo ships with py>=3.9
        tz = datetime.timezone(datetime.timedelta(hours=-4))
    base = datetime.date(2024, 4, 12) + datetime.timedelta(days=day_offset)
    start = datetime.datetime.combine(base, datetime.time(9, 30), tzinfo=tz)
    end = datetime.datetime.combine(base, datetime.time(16, 0), tzinfo=tz)
    return int(start.timestamp() * 1e9), int(end.timestamp() * 1e9)
