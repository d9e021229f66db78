"""Slowly-changing-dimension (type 2) merge.

The warehouse-side CDC primitive: apply a batch of updated entity
snapshots to a versioned dimension, closing the previous version's
validity interval and opening a new one — keeping full history
queryable with an as-of predicate (``valid_from <= t AND (valid_to IS
NULL OR t < valid_to)``), which composes with this repo's as-of join
family for time-travel enrichment.

Batch contract: a RAW CDC batch — any number of update rows per key —
applies in one call, equivalent to replaying the key's updates one at
a time in ``eff_ts`` order (each update is a change iff its tracked
attributes differ from the then-current version; intermediate versions
are chain-closed at the next change's ``eff_ts``). Rows whose
attributes equal the previous row in the sequence (or the current
version, for the first) are no-ops and produce no version.

Determinism: within one (key, eff_ts) the ordering tie-breaks on the
tracked attribute values; exact duplicate (key, eff_ts, attrs) rows
collapse to one version. Distinct attrs at the SAME (key, eff_ts) are
contradictory CDC input — both versions are emitted with a shared
boundary, a zero-width interval closing instantly (callers should
dedupe upstream).

Scale shape: every wide operation keys on the dimension key — the
update-side windows (run-length collapse, interval chaining) partition
by key, and the three joins against the current slice are plain hash
joins on the same key, so one partitioning serves the whole plan. No
collects, no global windows; the output unions four already-keyed
legs.

Chained application (the nightly-CDC loop): the output references the
input dimension in FOUR legs, so N naive chained applies would build a
~4^N-leaf logical plan and OOM the driver around N=4. ``scd2_apply``
therefore snaps a complex input dimension to a ``localCheckpoint``
leaf before merging (see :func:`_bounded_lineage`), bounding the plan
of every apply to one merge's worth regardless of chain length — the
same lineage-truncation law ``connected_components`` applies per
iteration. A parquet/leaf-backed dimension (the normal warehouse read)
is left untouched, keeping scan pruning intact. On a real cluster
prefer persisting the dimension between nightly runs anyway (the
checkpoint is per-session state); the truncation makes in-session
chains safe, not durable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# an analyzed-plan render longer than this marks the dimension as the
# output of a previous merge (one apply adds ~50 lines); leaf scans and
# simple projections stay well under it
_LINEAGE_PLAN_LINES = 40

# Python-side attribute scd2_apply stamps on every DataFrame it
# returns: the render-format-INDEPENDENT chained-apply signal. The
# nightly-CDC loop threads the returned handle straight back in, so
# the marker survives exactly where lineage grows.
_SCD2_MERGED_ATTR = "_sensorpipe_scd2_merged"


def _bounded_lineage(dim: DataFrame) -> DataFrame:
    """Return ``dim`` as-is when its logical plan is simple (a scan /
    in-memory relation / light projection), else a lazily
    local-checkpointed leaf.

    Two independent detectors, either sufficient: (1) the explicit
    ``_SCD2_MERGED_ATTR`` marker a previous :func:`scd2_apply` stamped
    on its output — exact and immune to plan-render format changes;
    (2) the analyzed-plan line count (renders the ANALYZED plan, never
    the optimized one — analysis is linear in the tree the caller
    built), which also catches dimensions built by OTHER multi-leg
    plans. A render that raises (Spark Connect, mocks) or shrinks to
    under the threshold in some future format still fails SAFE for
    chained applies via the marker; the residual risk is only
    over-eager checkpointing, never an unbounded plan."""
    if getattr(dim, _SCD2_MERGED_ATTR, False):
        return dim.localCheckpoint(eager=False)
    try:
        n_lines = dim._jdf.queryExecution().analyzed().toString().count("\n")
    except Exception:  # non-JVM-backed (connect, mocks): be safe
        n_lines = _LINEAGE_PLAN_LINES + 1
    if n_lines <= _LINEAGE_PLAN_LINES:
        return dim
    return dim.localCheckpoint(eager=False)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    eff_ts_col: str = "eff_ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Merge ``updates`` (key, tracked attrs, eff_ts — possibly many
    rows per key) into an SCD2 ``dim`` (key, tracked attrs, valid_from,
    valid_to NULL=current). Returns the full new dimension (history +
    revised versions); see the module docstring for the replay
    semantics and the chained-application lineage contract.
    """
    dim = _bounded_lineage(dim)
    cur = dim.filter(F.col(to_col).isNull())
    hist = dim.filter(F.col(to_col).isNotNull())
    ucols = [f"__u_{c}" for c in tracked_cols]
    up = updates.select(
        F.col(key_col).alias("__k"),
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
        F.col(eff_ts_col).alias("__eff"),
    )
    wk = W.partitionBy("__k").orderBy("__eff", *ucols)

    # 1. intra-batch run-length collapse: an update equal to its
    #    predecessor (null-safe, all tracked attrs) is a no-op
    same_prev = None
    for c in ucols:
        eq = F.col(c).eqNullSafe(F.lag(c).over(wk))
        same_prev = eq if same_prev is None else (same_prev & eq)
    surv = (
        up.withColumn("__rn", F.row_number().over(wk))
        .withColumn("__same_prev", same_prev)
        .filter((F.col("__rn") == 1) | ~F.col("__same_prev"))
        .drop("__rn", "__same_prev")
    )

    # 2. the FIRST surviving update per key is a no-op iff it matches
    #    the current version's attrs (equality is transitive, so later
    #    survivors — which differ from their predecessor — stay changes)
    surv = surv.withColumn("__rn", F.row_number().over(wk))
    curp = cur.select(
        F.col(key_col).alias("__ck"),
        *[F.col(c).alias(f"__c_{c}") for c in tracked_cols],
    )
    j = surv.join(curp, F.col("__k") == F.col("__ck"), "left")
    same_cur = None
    for c in tracked_cols:
        eq = F.col(f"__u_{c}").eqNullSafe(F.col(f"__c_{c}"))
        same_cur = eq if same_cur is None else (same_cur & eq)
    changes = j.filter(
        ~((F.col("__rn") == 1) & F.col("__ck").isNotNull() & same_cur)
    )

    # 3. chain the surviving changes into validity intervals: each
    #    opens at its eff_ts and closes at the NEXT change's (the last
    #    stays current)
    to_type = dim.schema[to_col].dataType
    opened = changes.select(
        F.col("__k").alias(key_col),
        *[F.col(f"__u_{c}").alias(c) for c in tracked_cols],
        F.col("__eff").alias(from_col),
        F.lead("__eff").over(wk).cast(to_type).alias(to_col),
    ).select(dim.columns)

    # 4. close the pre-batch current version at the first change
    first_eff = changes.groupBy("__k").agg(F.min("__eff").alias("__fe"))
    closed = (
        cur.join(first_eff, cur[key_col] == first_eff["__k"], "inner")
        .select(
            *[F.col(c) for c in dim.columns if c != to_col],
            F.col("__fe").cast(to_type).alias(to_col),
        )
        .select(dim.columns)
    )
    untouched = cur.join(
        first_eff, cur[key_col] == first_eff["__k"], "left_anti"
    ).select(dim.columns)
    out = hist.unionByName(untouched).unionByName(closed).unionByName(opened)
    # stamp the chained-apply marker (see _bounded_lineage): a Python
    # attribute on the handle, no plan or JVM interaction
    setattr(out, _SCD2_MERGED_ATTR, True)
    return out
