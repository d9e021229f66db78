"""Streaming gap-based sessionization via ``session_window`` — the
Structured Streaming twin of ``plans.analytics.sessionize``.

Batch sessionize needs two windows over a per-user sort; on a stream the
engine's native session windows do the same grouping with MERGING state:
each user carries at most the set of still-open sessions, closed sessions
are emitted and dropped once the watermark passes ``session end + gap``.
State is bounded by (active users x open sessions), independent of
stream length — the watermark, not the data volume, caps memory.

Semantics note (documented divergence, boundary-exact only): batch
starts a new session when the gap is STRICTLY GREATER than
``gap_minutes``; ``session_window`` closes the window at
``last_ts + gap`` exclusive, so an event arriving at exactly the gap
starts a new session in streaming but continues the session in batch.
With microsecond event times an exact-gap delta is measure-zero; every
other arrival pattern produces identical sessions (asserted against the
batch operator in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_stream(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One output row per closed (user, session): span, event count,
    exact value sum (DECIMAL partials — order-independent under any
    trigger pacing). ``session_start``/``session_end`` are the first and
    last EVENT times (the ``session_window`` end minus the gap), matching
    the batch operator's output shape."""
    sw = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    gap_expr = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), sw.alias("sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            user_col,
            "session_start",
            "session_end",
            (F.col("sess.end").cast("timestamp") - gap_expr).alias("window_close"),
            "n_events",
            "sum_value",
        )
    )
