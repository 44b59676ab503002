"""Market event (burst) windows.

Parity: /root/reference/ffn_polars/sim/market_events.py:6-34. Window
*generation* is a handful of driver-side seeded draws (tiny, and the result
parameterizes the whole day's plan, so driver-side is the right place);
*membership* is a boolean OR of range predicates — a Column, evaluated
distributed, instead of the reference's numpy mask.
"""

from __future__ import annotations

import random
from typing import List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F


def inject_event_windows(
    trading_ns: Tuple[int, int],
    day_index: int,
    num_events: int,
    min_duration_ns: int,
    max_duration_ns: int,
    probability: float = 0.5,
    seed: int = 42,
) -> List[Tuple[int, int]]:
    """Random (start, end) ns windows inside the trading day; with
    probability ``1 - probability`` the day has none."""
    rng = random.Random((seed + day_index) * 0x9E3779B9)
    start_ns, end_ns = trading_ns
    if rng.random() > probability:
        return []
    windows = []
    for _ in range(rng.randint(1, num_events)):
        duration = min_duration_ns + rng.randrange(max_duration_ns - min_duration_ns)
        t0 = start_ns + rng.randrange(end_ns - start_ns - duration)
        windows.append((t0, t0 + duration))
    return windows


def within_events(ts: Column, windows: List[Tuple[int, int]]) -> Column:
    """Boolean Column: is ``ts`` inside any [start, end) window."""
    mask = F.lit(False)
    for start, end in windows:
        mask = mask | ((ts >= F.lit(start)) & (ts < F.lit(end)))
    return mask


def day_burst_windows(
    start_ns: int, end_ns: int, day_index: int, seed: int
) -> List[Tuple[int, int]]:
    """Open 30 min + close 30 min + probabilistic news windows — the burst
    regime both simulators share (quotes.py:37-49, trades.py:36-46)."""
    half_hour = int(30 * 60 * 1e9)
    news = inject_event_windows(
        (start_ns, end_ns),
        day_index=day_index,
        num_events=2,
        min_duration_ns=int(5 * 60 * 1e9),
        max_duration_ns=int(30 * 60 * 1e9),
        probability=0.3,
        seed=seed,
    )
    return [(start_ns, start_ns + half_hour), (end_ns - half_hour, end_ns)] + news
