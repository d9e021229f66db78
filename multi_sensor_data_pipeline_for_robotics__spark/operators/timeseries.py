"""Per-key time-series smoothing: rolling stats and truncated EWMA.

The reference's only smoothing is the quantile clamp (app.py:122-131,
→ ``operators/clean.py``); real sensor feeds also want trailing-window
statistics and exponential smoothing. Both are expressed as ONE window
pass per key — shuffle on the key, sort by time, then frame aggregates
/ a fixed fan of ``lag`` terms — so the plan is exactly what a 100 TB
cluster wants: no self-joins, no Python, per-key parallelism. (A hot
key serializes into one partition's sort — same caveat and same remedy
as the keyed as-of join's ``time_buckets`` mode.)

EWMA note: the textbook recursion ``y_t = α·x_t + (1-α)·y_{t-1}`` is
inherently sequential. The distributed form used here TRUNCATES the
memory at ``window_rows`` terms::

    y_t = Σ_{j<W} β^j · x_{t-j}  /  Σ_{j<W, t-j exists} β^j ,  β = 1-α

which is the pandas ``ewm(alpha).mean()`` with ``adjust=True`` limited
to a W-term tail. Truncation error is bounded by β^W (β=0.7, W=32 →
~1e-5 of the oldest weight), while making the operator a pure window
expression: W ``lag`` calls over ONE window spec evaluate in a single
sort pass, and the identical SQL runs on any engine — so unlike a
stateful scan, the smoothed values are oracle-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def rolling_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Trailing-window mean/std/min/max per key: frame = the last
    ``window_rows`` observations (ROWS BETWEEN W-1 PRECEDING AND
    CURRENT ROW). One shuffle + one sort; emits one row per input row.

    Cross-engine note: for fixed-decimal inputs, means over a
    power-of-two frame terminate after ``decimals + log10-ish(W)``
    places — 2-decimal data with W=16 is exact within round(6), while
    W=32 lands on 7th-decimal halves where engines' round() tie rules
    diverge (Spark HALF_UPs the shortest decimal repr, DuckDB rounds
    the binary value). Pick W (or ``round_to``) so ties cannot occur
    when comparing results across engines.
    """
    w = (
        W.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    v = F.col(value_col).cast("double")
    return df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        v.alias("value"),
        F.round(F.avg(v).over(w), round_to).alias("roll_mean"),
        F.round(F.stddev_samp(v).over(w), round_to).alias("roll_std"),
        F.round(F.min(v).over(w), round_to).alias("roll_min"),
        F.round(F.max(v).over(w), round_to).alias("roll_max"),
        F.count(v).over(w).alias("roll_n"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    window_rows: int = 32,
    round_to: int = 6,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key (see
    module docstring for the formulation and its error bound).

    All ``window_rows`` lag terms share one window spec, so Spark
    evaluates them in a single partition-sort pass.
    """
    beta = 1.0 - alpha
    w = W.partitionBy(key_col).orderBy(ts_col)
    v = F.col(value_col).cast("double")
    lags = [F.lag(v, j).over(w) for j in range(window_rows)]
    numer = sum(
        (F.coalesce(lag, F.lit(0.0)) * F.lit(beta**j) for j, lag in enumerate(lags)),
        F.lit(0.0),
    )
    denom = sum(
        (
            F.when(lag.isNotNull(), F.lit(beta**j)).otherwise(F.lit(0.0))
            for j, lag in enumerate(lags)
        ),
        F.lit(0.0),
    )
    return df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        v.alias("value"),
        F.round(numer / denom, round_to).alias("ewma"),
    )


def rolling_stats_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 16,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`rolling_stats`."""
    fr = f"ROWS BETWEEN {window_rows - 1} PRECEDING AND CURRENT ROW"
    ow = f"OVER (PARTITION BY {key_col} ORDER BY {ts_col} {fr})"
    v = f"CAST({value_col} AS DOUBLE)"
    return f"""
SELECT {key_col} AS key, {ts_col} AS ts, {v} AS value,
       round(avg({v}) {ow}, {round_to}) AS roll_mean,
       round(stddev_samp({v}) {ow}, {round_to}) AS roll_std,
       round(min({v}) {ow}, {round_to}) AS roll_min,
       round(max({v}) {ow}, {round_to}) AS roll_max,
       count({v}) {ow} AS roll_n
FROM {table}
"""


def ewma_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    window_rows: int = 32,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ewma` — the same W lag terms, same
    left-to-right summation order, so doubles agree bit-for-bit."""
    beta = 1.0 - alpha
    ow = f"OVER (PARTITION BY {key_col} ORDER BY {ts_col})"
    v = f"CAST({value_col} AS DOUBLE)"
    numer = " + ".join(
        f"coalesce(lag({v}, {j}) {ow}, 0.0) * {beta**j!r}"
        for j in range(window_rows)
    )
    denom = " + ".join(
        f"(CASE WHEN lag({v}, {j}) {ow} IS NOT NULL THEN {beta**j!r} ELSE 0.0 END)"
        for j in range(window_rows)
    )
    return f"""
SELECT {key_col} AS key, {ts_col} AS ts, {v} AS value,
       round(({numer}) / ({denom}), {round_to}) AS ewma
FROM {table}
"""
