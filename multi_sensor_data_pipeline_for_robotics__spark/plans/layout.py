"""Layout QUALITY measurement: does a clustering key actually prune?

`functions/zorder.py` and `functions/hilbert.py` produce the keys;
this module answers the operational question — after laying the table
out in key order with N rows per file/row-group, what fraction of
groups does a range predicate on each filtered column still have to
read? That is exactly the min/max-zone-map arithmetic a lakehouse
engine runs at scan time, so the report predicts real scan costs
before committing a 100 TB rewrite (and arbitrates Z-order vs Hilbert
vs plain sort on the workload's own data).

Method: rank rows by (layout_key, id) with the two-phase prefix count
(no single-task window), cut the order into groups of ``rows_per_group``
(the simulated file/row-group boundaries), take per-group min/max of
every candidate filter column — the zone map — and reduce to one row
per column:

  - ``avg_span_frac``: mean over groups of (max-min)/(global range).
    This IS the expected fraction of groups a uniformly-placed POINT
    predicate reads. 1/n_groups is perfect clustering; ~1.0 means the
    column is shuffled across every group (no pruning).
  - ``ideal_span_frac`` = 1/n_groups, for reading the gap.

Everything is exact-integer bucketing plus plain aggregates — the
whole report is SQL-expressible and hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pruning_report(
    df: DataFrame,
    layout_col: str,
    id_col: str,
    value_cols: list[str],
    rows_per_group: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """One row per ``value_cols`` entry:
    (column, n_groups, avg_span_frac, ideal_span_frac).

    ``layout_col`` is the clustering key under evaluation (a z-key, an
    h-key, or any sort column); ``id_col`` breaks rank ties so the
    simulated layout is total and partitioning-independent. NULL
    values count into no span (min/max ignore NULLs — matching real
    zone maps, where NULL presence is a separate flag).
    """
    from multi_sensor_data_pipeline_for_robotics__spark.operators.pack import (
        global_running_sum,
    )

    if rows_per_group < 1:
        raise ValueError(f"rows_per_group must be >= 1, got {rows_per_group}")
    ranked = global_running_sum(
        df.select(layout_col, id_col, *value_cols),
        [layout_col, id_col],
        F.lit(1),
        "__rn",
    )
    grouped = ranked.withColumn(
        "__grp", F.expr(f"(__rn - 1) div {rows_per_group}")
    )
    zone = grouped.groupBy("__grp").agg(
        *[
            a
            for c in value_cols
            for a in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    glob = df.agg(
        *[
            a
            for c in value_cols
            for a in (
                F.min(F.col(c).cast("double")).alias(f"__glo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__ghi_{c}"),
            )
        ]
    )
    z = zone.crossJoin(F.broadcast(glob))
    per_col = [
        z.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_groups"),
            F.round(
                F.avg(
                    (F.col(f"__hi_{c}") - F.col(f"__lo_{c}"))
                    / (F.col(f"__ghi_{c}") - F.col(f"__glo_{c}"))
                ),
                round_to,
            ).alias("avg_span_frac"),
            F.round(F.lit(1.0) / F.count(F.lit(1)), round_to).alias(
                "ideal_span_frac"
            ),
        )
        for c in value_cols
    ]
    out = per_col[0]
    for nxt in per_col[1:]:
        out = out.unionByName(nxt)
    return out


def pruning_oracle_sql(
    table_sql: str,
    layout_expr: str,
    id_col: str,
    value_cols: list[str],
    rows_per_group: int = 1000,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`pruning_report` — single-window rank (the
    two-phase plan is provably identical), same bucketing, same span
    arithmetic. ``layout_expr`` is the SQL expression for the layout
    key over ``table_sql``'s output."""
    spans = []
    for c in value_cols:
        spans.append(f"""
SELECT '{c}' AS column, count(*) AS n_groups,
       round(avg((hi_{c} - lo_{c}) / (ghi_{c} - glo_{c})), {round_to})
           AS avg_span_frac,
       round(1.0 / count(*), {round_to}) AS ideal_span_frac
FROM zone CROSS JOIN gstats""")
    zone_aggs = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS lo_{c}, max(CAST({c} AS DOUBLE)) AS hi_{c}"
        for c in value_cols
    )
    glob_aggs = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS glo_{c}, max(CAST({c} AS DOUBLE)) AS ghi_{c}"
        for c in value_cols
    )
    cols = ", ".join(value_cols)
    return f"""
WITH src AS ({table_sql}),
ranked AS (
    SELECT {id_col}, {cols},
           row_number() OVER (ORDER BY ({layout_expr}), {id_col}) AS rn
    FROM src
),
grouped AS (SELECT *, (rn - 1) // {rows_per_group} AS grp FROM ranked),
zone AS (SELECT grp, {zone_aggs} FROM grouped GROUP BY grp),
gstats AS (SELECT {glob_aggs} FROM src)
{" UNION ALL ".join(spans)}
"""
