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
    # ONE aggregation over the zone table for every column (a union of
    # per-column aggregates would re-execute the rank+zone subtree per
    # column — Catalyst does not dedupe repeated subtrees), then a
    # 1-row explode into the per-column report rows
    one = z.agg(
        F.count(F.lit(1)).alias("__ng"),
        *[
            F.avg(
                (F.col(f"__hi_{c}") - F.col(f"__lo_{c}"))
                / (F.col(f"__ghi_{c}") - F.col(f"__glo_{c}"))
            ).alias(f"__sf_{c}")
            for c in value_cols
        ],
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__ng").alias("n_groups"),
                    F.round(F.col(f"__sf_{c}"), round_to).alias(
                        "avg_span_frac"
                    ),
                    F.round(F.lit(1.0) / F.col("__ng"), round_to).alias(
                        "ideal_span_frac"
                    ),
                )
                for c in value_cols
            ]
        )
    ).alias("r")
    return one.select(rows).select("r.*")


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


def plan_compaction(
    n_rows: int,
    total_bytes: int,
    target_file_mb: int = 128,
    min_files: int = 1,
    max_files: int | None = None,
) -> dict:
    """Small-file compaction arithmetic: how many output files should a
    rewrite produce so each lands near ``target_file_mb``? Driver-side
    pure function — feed it ANALYZE output (``plans.stats``) or
    filesystem stats; pair with :func:`write_clustered_parquet` to
    execute.

    The small-file problem is the quiet 100 TB killer: a table written
    by 10k tasks × 200 partitions yields 2M files, and every query pays
    2M opens + footer reads before scanning a byte. Target ~128 MB
    (HDFS-block-ish; good row-group amortization) unless the consumer
    dictates otherwise.

    Returns {n_files, rows_per_file, est_file_mb}.
    """
    if n_rows < 0 or total_bytes < 0:
        raise ValueError("n_rows/total_bytes must be >= 0")
    if target_file_mb < 1:
        raise ValueError(f"target_file_mb must be >= 1, got {target_file_mb}")
    target = target_file_mb * 1024 * 1024
    n_files = max(min_files, -(-total_bytes // target))  # ceil div
    if max_files is not None:
        n_files = min(n_files, max_files)
    n_files = max(1, n_files)
    return {
        "n_files": int(n_files),
        "rows_per_file": int(-(-n_rows // n_files)) if n_rows else 0,
        "est_file_mb": round(total_bytes / n_files / 1024 / 1024, 2),
    }


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    layout_cols: list[str],
    n_files: int,
) -> None:
    """Execute a clustering rewrite: range-partition into ``n_files``
    slices of ``layout_cols`` order (z-key, h-key, or plain sort
    columns), sort within each, write parquet — exactly how OPTIMIZE
    ZORDER materializes, one range shuffle total. Each output file
    covers a contiguous key range, so the zone maps
    (:func:`pruning_report` predicts their quality) stay tight."""
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    cols = [F.col(c) for c in layout_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )
