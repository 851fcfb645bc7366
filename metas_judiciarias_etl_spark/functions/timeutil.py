"""Integer time-bucket math for int64-nanosecond timestamps.

``events.ts`` arrives as int64 nanoseconds (sources/parquet.py reads
TIMESTAMP(NANOS) via nanosAsLong). Bucket boundaries must be PURE INTEGER
arithmetic: a double division ``(ts / width_ns).cast('long')`` has two
failure modes vs an exact-SQL oracle —

* truncation rounds toward zero while ``floor()`` rounds down, so any
  pre-1970 (negative) timestamp buckets one window too late;
* nanosecond magnitudes (~2^60) sit far above double's 2^53 exact-integer
  range (~256 ns ulp), so an event within an ulp of a boundary can land in
  the neighboring bucket.

``pmod`` floor-aligns (positive remainder even for negative inputs), after
which ``div`` is exact — no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NS_PER_S = 1_000_000_000


def floor_bucket_s(ts_name: str, width_s: int) -> Column:
    """Bucket start in epoch SECONDS for a ``width_s``-second tumbling
    window over the int64-nanos column named ``ts_name`` — floor semantics,
    all-integer. (Takes a column NAME: integer ``div`` is SQL-only, Column
    has no floordiv operator.)"""
    w_ns = width_s * NS_PER_S
    return F.expr(
        f"(({ts_name} - pmod({ts_name}, {w_ns})) div {w_ns}) * {width_s}"
    )


def floor_epoch_s(ts_name: str) -> Column:
    """Epoch seconds (floor) of an int64-nanos column — ``floor(epoch(ts))``."""
    return floor_bucket_s(ts_name, 1)
