"""Cleaning operators — the reference's ``clean_data`` (app.py:104-137)
re-expressed as lazy DataFrame transformations.

Reference semantics, in order:
  O7  drop rows with any missing value              (app.py:108-112)
  O9  per numeric column, drop rows where
      ``col < -900 OR col > 10000``                 (app.py:115-120)
  O10 motion only: values outside [q01, q99] are
      replaced with the column median (rows kept);
      the median is computed BEFORE replacement,
      i.e. including the outliers                   (app.py:122-131)
  O11 global ascending sort by timestamp            (app.py:133-135)

Scale notes:
  - The reference filters each column in sequence, materializing an
    intermediate per column. Here the chained filters collapse into one
    conjunctive predicate (Catalyst ``CombineFilters``) that is pushed
    into the parquet scan.
  - The reference recounts rows after every step for its report
    (app.py:110, 117, 128). Naively that is one Spark job per count;
    ``cleaning_report`` instead computes every count in a single
    conditional-aggregation pass over the input.
  - Quantiles are exact (``F.percentile`` — linear interpolation, the
    same definition as pandas' default and DuckDB ``quantile_cont``),
    computed for all clamp columns in ONE aggregation job.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference constants (app.py:116, 125-126)
SENTINEL_LOW = -900.0
SENTINEL_HIGH = 10000.0
CLAMP_LOW_Q = 0.01
CLAMP_HIGH_Q = 0.99

# Motion spike-smoothing column set — accel_z deliberately excluded
# because gravity keeps it near 9.8 (app.py:123).
MOTION_CLAMP_COLS = ["accel_x", "accel_y", "gyro_x", "gyro_y", "gyro_z"]


def numeric_columns(df: DataFrame) -> list[str]:
    """Runtime numeric-column discovery — mirror of
    ``select_dtypes(include=[np.number])`` (app.py:114)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.NumericType)]


def drop_missing(df: DataFrame) -> DataFrame:
    """O7 — ``dropna()`` (app.py:109): remove rows with >=1 NULL."""
    return df.na.drop("any")


def sentinel_filter(
    df: DataFrame,
    cols: list[str] | None = None,
    low: float = SENTINEL_LOW,
    high: float = SENTINEL_HIGH,
) -> DataFrame:
    """O9 — sentinel/range predicate (app.py:115-120).

    The reference loops per column, dropping ``col < -900 OR col >
    10000`` (strict inequalities: exactly -900 / 10000 survive). The
    sequential per-column filters are equivalent to one conjunctive
    predicate; written as chained ``.filter`` so Catalyst fuses and
    pushes them into the scan.
    """
    cols = cols if cols is not None else numeric_columns(df)
    out = df
    for c in cols:
        out = out.filter(~((F.col(c) < low) | (F.col(c) > high)))
    return out


def clamp_outliers(
    df: DataFrame,
    cols: list[str],
    low_q: float = CLAMP_LOW_Q,
    high_q: float = CLAMP_HIGH_Q,
    exact: bool = True,
    rel_err: float = 1e-4,
) -> DataFrame:
    """O10 — quantile spike smoothing (app.py:122-131).

    Values outside [q_low, q_high] are replaced with the column median;
    rows are kept. Parity trap honored: the median is computed over the
    column INCLUDING the outliers (app.py:130 runs before replacement).

    All 3 x len(cols) exact percentiles are computed in a single
    aggregation job (one shuffle-free partial-agg pass), then applied as
    a codegen'd ``CASE WHEN`` projection — no second scan of the data
    per column, no Python in the hot path.

    ``exact=False`` is the 100 TB path: ``F.percentile`` buffers every
    value per column in the aggregation state (exact by sorting — fine
    to ~10^8 rows/executor, reference-parity default), while
    Greenwald-Khanna ``approx_percentile`` keeps O(1/rel_err) sketch
    entries regardless of input size and merges map-side. At
    ``rel_err=1e-4`` the rank error on the 1%/99% fences is far below
    the noise the fences exist to clip.
    """
    if not cols:
        return df
    probs = F.array(F.lit(low_q), F.lit(0.5), F.lit(high_q))
    aggs = []
    for c in cols:
        aggs.append(
            (
                F.percentile(F.col(c), probs)
                if exact
                else F.approx_percentile(
                    F.col(c), probs, F.lit(int(1.0 / rel_err))
                )
            ).alias(f"__q_{c}")
        )
    # r13: the quantile row rides a broadcast cross-join instead of a
    # blocking driver `.first()` + literal substitution — one Spark
    # query instead of an action barrier mid-build (the barrier cost
    # ~0.2s per clamp at bench scale and serialized the flagship
    # pipeline's build). Values are identical: a NULL quantile array
    # (empty/all-NULL column) makes both comparisons NULL, so the
    # otherwise-branch keeps the original value — the same "nothing to
    # clamp" behavior the scalar path special-cased.
    row = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(row))
    for c in cols:
        q = F.col(f"__q_{c}")
        out = out.withColumn(
            c,
            F.when((F.col(c) < q[0]) | (F.col(c) > q[2]), q[1]).otherwise(
                F.col(c)
            ),
        )
    return out.drop(*[f"__q_{c}" for c in cols])


def filter_by_quantile(
    df: DataFrame,
    score_col: str,
    q: float,
    keep: str = "top",
    group_cols: list[str] | None = None,
    exact: bool = True,
    rel_err: float = 1e-4,
) -> DataFrame:
    """Keep the rows whose ``score_col`` clears the q-quantile — "train
    on the top 30% by quality score" as one declarative step
    (beyond-reference; the percentile-threshold filter every curated
    training mix applies after scoring).

    ``keep='top'`` keeps ``score >= quantile(q)`` (so q=0.7 keeps the
    best ~30%); ``keep='bottom'`` keeps ``score <= quantile(q)``. NULL
    scores never pass. With ``group_cols`` the quantile is computed PER
    GROUP ("top 30% per language" — the per-stratum gate that keeps a
    strict global threshold from silently deleting low-scoring
    languages wholesale).

    The thresholds are one aggregate joined back by broadcast (1 row
    globally, |groups| rows grouped) — the plan stays lazy (no driver
    action at build time) and the filter is a codegen'd comparison.
    ``exact=False`` swaps the exact percentile for Greenwald-Khanna
    ``approx_percentile`` — the 100 TB path, same trade as
    :func:`clamp_outliers`; the grouped aggregation combines map-side
    either way.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if keep not in ("top", "bottom"):
        raise ValueError(f"keep must be 'top' or 'bottom', got {keep!r}")
    c = F.col(score_col)
    thr_expr = (
        F.percentile(c, F.lit(q))
        if exact
        else F.approx_percentile(c, F.lit(q), F.lit(int(1.0 / rel_err)))
    )
    cond = (c >= F.col("__thr")) if keep == "top" else (c <= F.col("__thr"))
    if not group_cols:
        thr = df.agg(thr_expr.alias("__thr"))
        return df.crossJoin(F.broadcast(thr)).filter(cond).drop("__thr")
    thr = df.groupBy(*group_cols).agg(thr_expr.alias("__thr"))
    renamed = thr.select(
        *[F.col(g).alias(f"__g_{g}") for g in group_cols], "__thr"
    )
    on = None
    for g in group_cols:
        eq = F.col(g) == F.col(f"__g_{g}")
        on = eq if on is None else (on & eq)
    # NOT force-broadcast: |groups| is caller-controlled — strata are
    # usually a handful of rows (AQE broadcasts them at runtime), but a
    # high-cardinality group column must not be driver-materialized
    return (
        df.join(renamed, on, "inner")
        .filter(cond)
        .drop("__thr", *[f"__g_{g}" for g in group_cols])
    )


def mad_outliers(
    df: DataFrame,
    col: str,
    k: float = 3.5,
    group_cols: list[str] | None = None,
    out_col: str = "robust_z",
    flag_col: str = "is_outlier",
    round_to: int = 6,
) -> DataFrame:
    """Robust outlier screen via the modified z-score (Iglewicz &
    Hoaglin): ``robust_z = 0.6745 · (x − median) / MAD`` with
    ``MAD = median(|x − median|)``; rows with ``|robust_z| > k``
    (default 3.5, the published cut) are flagged. Median/MAD resist
    the very outliers being hunted — unlike the mean/σ screen
    (``ts_anomaly``), one wild sensor spike cannot drag the threshold
    toward itself and mask its neighbors.

    Two aggregation passes by construction (MAD needs the median
    first), each a map-side-combinable percentile joined back by
    broadcast (1 row globally, |groups| rows with ``group_cols``).
    Degenerate MAD = 0 (>50% identical values) flags nothing —
    deviation from a point mass has no robust scale; NULL values get
    NULL z and a false flag.
    """
    c = F.col(col).cast("double")
    gcols = group_cols or []
    # grouped param frames are NOT force-broadcast: |groups| is caller-
    # controlled (AQE broadcasts small ones at runtime); the global
    # 1-row frames are
    if gcols:
        med = df.groupBy(*gcols).agg(F.percentile(c, F.lit(0.5)).alias("__med"))
        with_med = df.join(med, gcols)
    else:
        med = df.agg(F.percentile(c, F.lit(0.5)).alias("__med"))
        with_med = df.crossJoin(F.broadcast(med))
    dev = F.abs(c - F.col("__med"))
    if gcols:
        mad = with_med.groupBy(*gcols).agg(
            F.percentile(dev, F.lit(0.5)).alias("__mad")
        )
        staged = with_med.join(mad, gcols)
    else:
        mad = with_med.agg(F.percentile(dev, F.lit(0.5)).alias("__mad"))
        staged = with_med.crossJoin(F.broadcast(mad))
    z = F.lit(0.6745) * (c - F.col("__med")) / F.col("__mad")
    return (
        staged.withColumn(
            out_col,
            F.when(F.col("__mad") > 0, F.round(z, round_to)),
        )
        .withColumn(
            flag_col,
            F.coalesce(F.abs(F.col(out_col)) > k, F.lit(False)),
        )
        .drop("__med", "__mad")
    )


def sort_by_time(df: DataFrame, on: str = "timestamp") -> DataFrame:
    """O11 — global ascending sort (app.py:133-135).

    Range-partitioned ``SortExec`` in Spark: each partition sorts
    locally after a range shuffle, so the sort scales horizontally
    instead of funnelling through one node.
    """
    return df.orderBy(on)


@dataclass
class CleanResult:
    """``(cleaned, cleaning_report)`` return shape of app.py:137."""

    df: DataFrame
    report: list[str] = field(default_factory=list)


def cleaning_report_counts(
    df: DataFrame,
    cols: list[str] | None = None,
    low: float = SENTINEL_LOW,
    high: float = SENTINEL_HIGH,
) -> DataFrame:
    """Single-pass conditional aggregation producing every count the
    reference's report prints (app.py:110-120) — one job instead of one
    job per column.

    Columns: total rows, rows with any NULL, and per input column the
    count of out-of-range values among non-null rows.
    """
    cols = cols if cols is not None else numeric_columns(df)
    any_null = None
    for f_ in df.schema.fields:
        cond = F.col(f_.name).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(any_null, 1).otherwise(0)).alias("n_with_null"),
    ]
    for c in cols:
        aggs.append(
            F.sum(
                F.when((F.col(c) < low) | (F.col(c) > high), 1).otherwise(0)
            ).alias(f"n_outlier_{c}")
        )
    return df.agg(*aggs)


def clean(
    df: DataFrame,
    sensor_type: str = "camera",
    timestamp_col: str = "timestamp",
    clamp_cols: list[str] | None = None,
    collect_report: bool = True,
    sort: bool = True,
) -> CleanResult:
    """Full ``clean_data`` pipeline (app.py:104-137), lazily composed.

    ``sensor_type='motion'`` additionally applies the O10 quantile clamp
    (app.py:122), to ``clamp_cols`` (default: the reference's motion
    channel set intersected with the frame's columns).

    ``sort=False`` elides the O11 global sort — semantics-preserving
    when the consumer imposes its own ordering (``synchronize`` re-keys
    every row onto the grid), and it saves a range-partitioner sampling
    job plus a full range shuffle per sensor that the as-of bucket
    shuffle would immediately destroy.
    """
    report: list[str] = []
    if collect_report:
        counts = cleaning_report_counts(df).first()
        report.append(f"rows_in={counts['n_rows']}")
        report.append(f"rows_with_missing={counts['n_with_null']}")
        for k in counts.asDict():
            if k.startswith("n_outlier_") and counts[k]:
                report.append(f"{k}={counts[k]}")

    out = drop_missing(df)
    out = sentinel_filter(out)
    if sensor_type == "motion":
        cols = clamp_cols
        if cols is None:
            cols = [c for c in MOTION_CLAMP_COLS if c in out.columns]
        out = clamp_outliers(out, cols)
    if sort and timestamp_col in out.columns:
        out = sort_by_time(out, timestamp_col)
    return CleanResult(out, report)
