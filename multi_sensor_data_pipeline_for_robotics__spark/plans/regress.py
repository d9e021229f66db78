"""Per-group ordinary least squares — the "fit a trend line to every
key at once" primitive: one closed-form aggregation pass computes
slope / intercept / r² for MILLIONS of groups simultaneously, which is
how a cluster fits per-sensor drift lines, per-user engagement trends,
or per-source corpus growth curves without ever iterating.

Closed form via the moment built-ins::

    slope     = covar_samp(x, y) / var_samp(x)
    intercept = avg(y) - slope * avg(x)
    r²        = covar_samp(x, y)² / (var_samp(x) · var_samp(y))

built on ``covar_samp``/``var_samp``/``avg`` so both engines run their
numerically-stable one-pass accumulators (naive Σxy - ΣxΣy/n forms
cancel catastrophically when x is something epoch-sized).  Callers
should still CENTER/SCALE x to a sane unit (e.g. hours since the data
epoch, not raw epoch seconds) — the helper ``hours_since`` does this —
because a slope of 1e-9 per second rounds to zero at 6 dp while the
same line is 3.6e-6 per hour.

Scale shape: ONE map-side-combined groupBy; output is group-cardinality
sized.  Degenerate groups (n < 2 or zero x-variance) yield NULL slope —
surfaced, not dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_ols", "grouped_ols_oracle_sql", "hours_since"]

_EPOCH = "2024-01-01 00:00:00"


def hours_since(ts_col: Column | str, epoch: str = _EPOCH) -> Column:
    """Hours (double) between ``ts_col`` and a fixed epoch — the
    recommended x-unit for time trends (see module docstring).
    Microsecond-exact: ``cast(ts as long)`` TRUNCATES to seconds while
    DuckDB's ``epoch()`` keeps fractions, so both sides route through
    integer microseconds before the one division."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (
        F.unix_micros(c) - F.unix_micros(F.to_timestamp(F.lit(epoch)))
    ).cast("double") / 3.6e9


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x: Column | str,
    y: Column | str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group OLS fit: (group..., n, slope, intercept, r2)."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("double")
    yc = (F.col(y) if isinstance(y, str) else y).cast("double")
    base = df.filter(xc.isNotNull() & yc.isNotNull()).select(
        *group_cols, xc.alias("__x"), yc.alias("__y")
    )
    # covar/var, NOT corr: Spark's ANSI-mode corr aggregate itself
    # raises DIVIDE_BY_ZERO on a zero-variance group (and a CASE guard
    # can't help — the division is inside the aggregate). covar_samp /
    # var_samp never divide by the moments, and the (n-1) factors
    # cancel in both slope and r².
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_samp("__x", "__y").alias("__cxy"),
        F.var_samp("__x").alias("__vx"),
        F.var_samp("__y").alias("__vy"),
        F.avg("__x").alias("__mx"),
        F.avg("__y").alias("__my"),
    )
    slope = F.when(
        F.col("__vx") > 0, F.try_divide(F.col("__cxy"), F.col("__vx"))
    )
    r2 = F.when(
        (F.col("__vx") > 0) & (F.col("__vy") > 0),
        F.try_divide(
            F.col("__cxy") * F.col("__cxy"), F.col("__vx") * F.col("__vy")
        ),
    )
    return agg.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.round(slope, round_to).alias("slope"),
        F.round(F.col("__my") - slope * F.col("__mx"), round_to).alias(
            "intercept"
        ),
        F.round(r2, round_to).alias("r2"),
    )


def grouped_ols_oracle_sql(
    table: str,
    group_cols: list[str],
    x_sql: str,
    y_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`grouped_ols` — same moment built-ins."""
    g = ", ".join(group_cols)
    return f"""
WITH base AS (
    SELECT {g}, CAST({x_sql} AS DOUBLE) AS x, CAST({y_sql} AS DOUBLE) AS y
    FROM {table}
    WHERE {x_sql} IS NOT NULL AND {y_sql} IS NOT NULL
),
agg AS (
    SELECT {g}, count(*) AS n, covar_samp(x, y) AS cxy,
           var_samp(x) AS vx, var_samp(y) AS vy,
           avg(x) AS mx, avg(y) AS my
    FROM base GROUP BY {g}
)
SELECT {g}, CAST(n AS BIGINT) AS n,
       round(CASE WHEN vx > 0 THEN cxy / vx END, {round_to}) AS slope,
       round(my - (CASE WHEN vx > 0 THEN cxy / vx END) * mx,
             {round_to}) AS intercept,
       round(CASE WHEN vx > 0 AND vy > 0 THEN cxy * cxy / (vx * vy) END,
             {round_to}) AS r2
FROM agg
"""
