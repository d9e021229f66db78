"""Stream-stream joins with watermark-bounded state.

The batch engine answers "which clicks preceded each purchase?" with
:func:`operators.rangejoin.interval_join` / a time-range self-join; this
module is the Structured Streaming twin: two live streams joined on a
key plus an event-time range condition. Spark's streaming join buffers
each side in the state store and emits matches as rows arrive; the
WATERMARKS plus the time-range predicate are what let it DROP state —
a click older than ``purchase watermark − lookback`` can never match a
future purchase, so its buffered row is evicted.

State size is therefore bounded by ``input rate × (watermark delay +
lookback)`` per side, independent of total stream length — the property
that makes this viable on an unbounded 100 TB/day event firehose, and
the reason the time bound on BOTH sides of the condition is mandatory
(without it Spark would buffer one side forever; it warns and keeps all
state).

Inner-join semantics do not depend on the watermark (it only gates
state eviction and, for outer modes, null-extension timing), so a
bounded file-source run emits EXACTLY the batch join's rows — which is
what the correctness harness exploits: the oracle is the equivalent
batch time-range self-join in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_stream(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_type: str = "purchase",
    right_type: str = "click",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lookback_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Attribution join: each LEFT event (e.g. purchase) paired with
    every RIGHT event (e.g. click) of the same key in the preceding
    ``lookback_minutes``.

    ``left`` / ``right`` are two independent ``readStream`` frames over
    the same (or different) sources; filtering to one event type each
    happens here so the state store only buffers the relevant slices.

    Output: (key, left_id, left_ts, right_id, right_ts) — append mode.
    """
    l = (
        left.filter(F.col("event_type") == left_type)
        .select(
            F.col(key_col).alias("key"),
            F.col(id_col).alias("left_id"),
            F.col(ts_col).alias("left_ts"),
        )
        .withWatermark("left_ts", watermark)
    )
    r = (
        right.filter(F.col("event_type") == right_type)
        .select(
            F.col(key_col).alias("rkey"),
            F.col(id_col).alias("right_id"),
            F.col(ts_col).alias("right_ts"),
        )
        .withWatermark("right_ts", watermark)
    )
    cond = (
        (F.col("key") == F.col("rkey"))
        & (
            F.col("right_ts")
            >= F.col("left_ts") - F.expr(f"INTERVAL {lookback_minutes} MINUTES")
        )
        & (F.col("right_ts") <= F.col("left_ts"))
    )
    return l.join(r, cond, "inner").select(
        "key", "left_id", "left_ts", "right_id", "right_ts"
    )
