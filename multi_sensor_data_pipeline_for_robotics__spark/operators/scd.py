"""Slowly-changing-dimension (type 2) merge.

The warehouse-side CDC primitive: apply a batch of updated entity
snapshots to a versioned dimension, closing the previous version's
validity interval and opening a new one — keeping full history
queryable with an as-of predicate (``valid_from <= t AND (valid_to IS
NULL OR t < valid_to)``), which composes with this repo's as-of join
family for time-travel enrichment.

Batch contract: at most ONE update row per key per call (the usual CDC
arrangement — dedupe a multi-update batch to its latest row first,
e.g. with ``plans.analytics.top_per_group``). The merge itself is two
hash joins on the key plus a union — no windows, no collects; at
100 TB both joins shuffle only (key, tracked-attrs) projections and
the output unions four already-partitioned legs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    eff_ts_col: str = "eff_ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Merge ``updates`` (key, tracked attrs, eff_ts) into an SCD2
    ``dim`` (key, tracked attrs, valid_from, valid_to NULL=current).

    A key's update is a CHANGE iff it has no current version or any
    tracked attribute differs (null-safe comparison). Changes close the
    current version at ``eff_ts`` and open a new one; no-op updates and
    unrelated keys pass through untouched. Returns the full new
    dimension (history + revised current rows).
    """
    cur = dim.filter(F.col(to_col).isNull())
    hist = dim.filter(F.col(to_col).isNotNull())
    up = updates.select(
        F.col(key_col).alias("__k"),
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
        F.col(eff_ts_col).alias("__eff"),
    )
    j = cur.join(up, cur[key_col] == up["__k"], "full_outer")
    same = None
    for c in tracked_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        same = eq if same is None else (same & eq)
    is_update = F.col("__k").isNotNull()
    has_cur = F.col(key_col).isNotNull()
    changed = is_update & (~has_cur | ~same)

    untouched = j.filter(has_cur & ~changed).select(dim.columns)
    closed = j.filter(has_cur & changed).select(
        *[F.col(c) for c in dim.columns if c != to_col],
        F.col("__eff").alias(to_col),
    ).select(dim.columns)
    opened = j.filter(changed).select(
        F.col("__k").alias(key_col),
        *[F.col(f"__u_{c}").alias(c) for c in tracked_cols],
        F.col("__eff").alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
    ).select(dim.columns)
    return hist.unionByName(untouched).unionByName(closed).unionByName(opened)
