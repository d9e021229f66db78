"""ANALYZE-style table statistics — the inputs a cost-based optimizer
(or a human sizing a 100 TB job) needs per column: row/null counts,
min/max, and a distinct-count estimate. Spark's own ``ANALYZE TABLE …
COMPUTE STATISTICS`` stores these in the catalog; this operator
computes them AS A QUERY, with every estimate in portable arithmetic
(md5-prefix KMV, the same estimator as ``functions.sketch``), so the
stats themselves are hash-checkable cross-engine.

Plan shape: the table is projected once into a narrow exploded
(column, value-string, hash) stream — C small rows per input row —
then ONE groupBy per statistic family: exact n/nulls/min/max from a
single aggregation, the KMV ndv from a distinct + two-phase salted
bottom-k (``functions.sketch.grouped_bottom_k`` — every COLUMN is a
group here, so a single-window form would sort a 10^9-ndv id column's
full hash set in one task; the salted split caps the largest sort at
max(ndv/S, k·S) rows and is lossless by the KMV merge law). Min/max
come in BOTH forms: the string form (deterministic, engine-identical,
defined for every type) AND typed numeric min/max/mean (`num_min`/
`num_max`/`num_mean`, NULL for non-numeric columns) — the numbers a
join planner or range-pruner actually consumes; lexicographic "min"
of an int column ("10" < "9") is not a bound.

At 100 TB: C× row multiplication sounds expensive, but each exploded
row is ~30 bytes and every aggregate is map-side combinable — the
shuffle carries k hashes + 1 stat row per column, not data. The
alternative (C independent count_distinct aggs) expands the same way
inside Spark's Expand operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
    _DENOM,
    grouped_bottom_k,
    kmv_hash,
)


def _narrow_stream(df: DataFrame, columns: list[str] | None) -> DataFrame:
    """The exploded (column, value-string, value-double) stream both
    ANALYZE forms aggregate: C small rows per input row, numeric
    columns carrying a typed double twin (NULL otherwise)."""
    from pyspark.sql import types as T

    cols = columns or df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("v"),
                    (
                        F.col(c).cast("double")
                        if isinstance(dtypes[c], T.NumericType)
                        else F.lit(None).cast("double")
                    ).alias("vn"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return df.select(pairs).select("p.column", "p.v", "p.vn")


def analyze_table(
    df: DataFrame,
    columns: list[str] | None = None,
    k: int = 256,
    round_to: int = 4,
    salt_buckets: int = 64,
) -> DataFrame:
    """Per-column statistics in two scans of a narrow projection.

    Output: (column, n_rows, n_null, approx_ndv double, min_value,
    max_value, num_min, num_max, num_mean) — min/max as the value's
    string form (null-safe, every type), num_* as doubles for numeric
    columns (NULL otherwise; mean rounded to ``round_to`` for
    cross-engine hashability; integers above 2^53 lose low bits to the
    double cast — the usual stats-table caveat), approx_ndv exact
    below k.
    """
    narrow = _narrow_stream(df, columns)

    base = narrow.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
        F.min("vn").alias("num_min"),
        F.max("vn").alias("num_max"),
        F.round(F.avg("vn"), round_to).alias("num_mean"),
    )

    d = (
        narrow.filter(F.col("v").isNotNull())
        .select("column", kmv_hash(F.col("v")).alias("h"))
        .distinct()
    )
    mins = grouped_bottom_k(d, ["column"], k, salt_buckets)
    ndv = mins.groupBy("column").agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("m")
    )
    est = F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
        F.round((k - 1) / (F.col("hk").cast("double") / _DENOM), round_to)
    )
    return (
        base.join(ndv.select("column", est.alias("approx_ndv")), "column", "left")
        .select(
            "column",
            "n_rows",
            "n_null",
            F.coalesce("approx_ndv", F.lit(0.0)).alias("approx_ndv"),
            "min_value",
            "max_value",
            "num_min",
            "num_max",
            "num_mean",
        )
    )


def analyze_oracle_sql(
    table: str,
    columns: list[str],
    k: int = 256,
    round_to: int = 4,
    numeric_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`analyze_table` — same exploded stream,
    same md5 KMV estimator, same string min/max, same typed numeric
    min/max/mean for the columns named in ``numeric_cols`` (SQL has no
    schema introspection here, so the caller declares them)."""
    hx = (
        f"cast(concat('0x', substr(md5(v), 1, 15)) as bigint)"
    )
    nset = set(numeric_cols or [])
    selects = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS v,"
        + (
            f" CAST({c} AS DOUBLE) AS vn"
            if c in nset
            else " CAST(NULL AS DOUBLE) AS vn"
        )
        + f" FROM {table}"
        for c in columns
    )
    return f"""
WITH narrow AS ({selects}),
base AS (
    SELECT col, count(*) AS n_rows,
           sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_null,
           min(v) AS min_value, max(v) AS max_value,
           min(vn) AS num_min, max(vn) AS num_max,
           round(avg(vn), {round_to}) AS num_mean
    FROM narrow GROUP BY col
),
d AS (SELECT DISTINCT col, {hx} AS h FROM narrow WHERE v IS NOT NULL),
mins AS (
    SELECT col, h, row_number() OVER (PARTITION BY col ORDER BY h) AS rn
    FROM d
),
ndv AS (
    SELECT col, max(h) AS hk, count(*) AS m
    FROM mins WHERE rn <= {k} GROUP BY col
)
SELECT b.col AS "column", b.n_rows, b.n_null,
       coalesce(CASE WHEN n.m < {k} THEN CAST(n.m AS DOUBLE)
                ELSE round(({k} - 1) / (CAST(n.hk AS DOUBLE) / {_DENOM!r}),
                           {round_to}) END, 0.0) AS approx_ndv,
       b.min_value, b.max_value, b.num_min, b.num_max, b.num_mean
FROM base b LEFT JOIN ndv n ON b.col = n.col
"""


def analyze_sketch(
    df: DataFrame,
    columns: list[str] | None = None,
    k: int = 256,
    salt_buckets: int = 64,
) -> DataFrame:
    """The STORED, MERGEABLE form of :func:`analyze_table` — what a
    nightly 100 TB stats job computes PER PARTITION (day, file batch,
    table shard) and keeps, so table-level stats come from merging
    tiny sketch rows instead of rescanning history.

    One row per column: additive counters (n_rows, n_null, num_sum,
    num_cnt), extrema (min/max string form, typed num_min/num_max) and
    the bottom-k KMV hash ARRAY (the distinct-count sketch itself, <= k
    longs). Every field merges losslessly (:func:`merge_analyze_sketches`):
    counters add, extrema take min/max, and the union's bottom-k equals
    the bottom-k of unioned bottom-k's — the KMV merge law — so
    ``stats_from_sketches(merge(per-partition sketches))`` is
    bit-identical to ``analyze_table`` over the union (num_mean
    included: it is derived from the unrounded sum/count at readout).

    Scale shape: identical to analyze_table's (one exploded narrow
    stream, map-side-combinable aggs, salted bottom-k) — the sketch
    adds only a collect_list over <= k already-reduced hashes per
    column."""
    narrow = _narrow_stream(df, columns)
    base = narrow.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
        F.min("vn").alias("num_min"),
        F.max("vn").alias("num_max"),
        F.sum("vn").alias("num_sum"),
        F.count("vn").alias("num_cnt"),
    )
    d = (
        narrow.filter(F.col("v").isNotNull())
        .select("column", kmv_hash(F.col("v")).alias("h"))
        .distinct()
    )
    mins = grouped_bottom_k(d, ["column"], k, salt_buckets)
    hs = mins.groupBy("column").agg(
        F.sort_array(F.collect_list("h")).alias("kmv_hashes")
    )
    return base.join(hs, "column", "left").select(
        "column",
        "n_rows",
        "n_null",
        "min_value",
        "max_value",
        "num_min",
        "num_max",
        "num_sum",
        "num_cnt",
        F.coalesce("kmv_hashes", F.array().cast("array<bigint>")).alias(
            "kmv_hashes"
        ),
    )


def merge_analyze_sketches(sketches: list[DataFrame], k: int = 256) -> DataFrame:
    """Lossless merge of stored :func:`analyze_sketch` outputs (same k
    required): counters add, extrema min/max, hash arrays union ->
    distinct -> bottom-k. Any subset of partitions merges to exactly
    the sketch of their unioned rows."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    merged_hs = F.slice(
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("kmv_hashes")))),
        1,
        k,
    )
    return u.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null").alias("n_null"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.min("num_min").alias("num_min"),
        F.max("num_max").alias("num_max"),
        F.sum("num_sum").alias("num_sum"),
        F.sum("num_cnt").alias("num_cnt"),
        merged_hs.alias("kmv_hashes"),
    )


def stats_from_sketches(
    sketch: DataFrame, k: int = 256, round_to: int = 4
) -> DataFrame:
    """Readout: a (possibly merged) :func:`analyze_sketch` row ->
    the exact :func:`analyze_table` output schema, same estimator,
    same rounding — so stored-and-merged stats are hash-checkable
    against a direct ANALYZE of the union."""
    m = F.size("kmv_hashes")
    hk = F.element_at("kmv_hashes", m).cast("double")
    est = F.when(m < k, m.cast("double")).otherwise(
        F.round((k - 1) / (hk / _DENOM), round_to)
    )
    return sketch.select(
        "column",
        "n_rows",
        "n_null",
        F.coalesce(
            F.when(m > 0, est), F.lit(0.0)
        ).alias("approx_ndv"),
        "min_value",
        "max_value",
        "num_min",
        "num_max",
        F.when(
            F.col("num_cnt") > 0,
            F.round(F.col("num_sum") / F.col("num_cnt"), round_to),
        ).alias("num_mean"),
    )


def scale_features(
    df: DataFrame,
    cols: list[str],
    key_cols: list[str],
    method: str = "zscore",
    round_to: int = 6,
) -> DataFrame:
    """Feature scaling from one aggregate pass — the ML-prep companion
    of :func:`analyze_table`: z-score ((v - mean) / stddev_samp) or
    min-max ((v - min) / (max - min)) per column, the scaling params
    computed over the SAME frame (fit == transform here; persist the
    1-row param frame to reuse a training fit on serving data).

    Output: key_cols + one scaled double per input col (same names).
    Plan shape: one map-side-combinable aggregation into a 1-row param
    frame, broadcast back onto the scan — no shuffle of data rows, no
    window. Degenerate columns (zero variance / constant) scale to
    NULL rather than dividing by zero.
    """
    if method not in ("zscore", "minmax"):
        raise ValueError(f"unknown scaling method: {method}")
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        if method == "zscore":
            aggs += [
                F.avg(v).alias(f"__mu_{c}"),
                F.stddev_samp(v).alias(f"__sd_{c}"),
            ]
        else:
            aggs += [
                F.min(v).alias(f"__lo_{c}"),
                F.max(v).alias(f"__hi_{c}"),
            ]
    params = df.agg(*aggs)
    out_cols = [F.col(k) for k in key_cols]
    for c in cols:
        v = F.col(c).cast("double")
        if method == "zscore":
            denom = F.col(f"__sd_{c}")
            scaled = (v - F.col(f"__mu_{c}")) / F.when(denom != 0, denom)
        else:
            rng = F.col(f"__hi_{c}") - F.col(f"__lo_{c}")
            scaled = (v - F.col(f"__lo_{c}")) / F.when(rng != 0, rng)
        out_cols.append(F.round(scaled, round_to).alias(c))
    return df.crossJoin(F.broadcast(params)).select(*out_cols)


def scale_features_oracle_sql(
    table: str,
    cols: list[str],
    key_cols: list[str],
    method: str = "zscore",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`scale_features` — same params, same
    arithmetic, same NULL-on-degenerate behavior."""
    if method == "zscore":
        params = ", ".join(
            f"avg(CAST({c} AS DOUBLE)) AS mu_{c},"
            f" stddev_samp(CAST({c} AS DOUBLE)) AS sd_{c}"
            for c in cols
        )
        scaled = ", ".join(
            f"round((CAST(t.{c} AS DOUBLE) - p.mu_{c})"
            f" / (CASE WHEN p.sd_{c} <> 0 THEN p.sd_{c} END), {round_to}) AS {c}"
            for c in cols
        )
    else:
        params = ", ".join(
            f"min(CAST({c} AS DOUBLE)) AS lo_{c},"
            f" max(CAST({c} AS DOUBLE)) AS hi_{c}"
            for c in cols
        )
        scaled = ", ".join(
            f"round((CAST(t.{c} AS DOUBLE) - p.lo_{c})"
            f" / (CASE WHEN p.hi_{c} - p.lo_{c} <> 0"
            f" THEN p.hi_{c} - p.lo_{c} END), {round_to}) AS {c}"
            for c in cols
        )
    keys = ", ".join(f"t.{k}" for k in key_cols)
    return f"""
WITH p AS (SELECT {params} FROM {table})
SELECT {keys}, {scaled} FROM {table} t CROSS JOIN p
"""


def key_skew_report(
    df: DataFrame, key_col: str, round_to: int = 6
) -> DataFrame:
    """Join/aggregation SKEW diagnosis for a key column — the question
    to ask before shuffling 100 TB on it (pairs with
    ``functions.sketch.kmv_join_cardinality``: that sizes the join,
    this says whether one reducer eats it). One groupBy(key) into
    (key, cnt) partials, one 1-row aggregate over them.

    Output (1 row): n_rows, n_keys, max_count, top1_share (largest
    key's row fraction), skew_ratio (max/mean count — 1.0 is
    perfectly uniform), entropy_norm (Shannon entropy of the key
    distribution / ln(n_keys); 1.0 uniform, →0 degenerate). NULL keys
    count as a key (they hash-collide into one reducer too).
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    agg = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_count"),
        F.sum(F.col("cnt") * F.log("cnt")).alias("__clogc"),
    )
    ent = (
        F.log(F.col("n_rows"))
        - F.col("__clogc") / F.col("n_rows")
    )
    return agg.select(
        "n_rows",
        "n_keys",
        "max_count",
        F.round(F.col("max_count") / F.col("n_rows"), round_to).alias(
            "top1_share"
        ),
        F.round(
            F.col("max_count") / (F.col("n_rows") / F.col("n_keys")),
            round_to,
        ).alias("skew_ratio"),
        F.round(
            F.when(
                F.col("n_keys") > 1, ent / F.log(F.col("n_keys"))
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("entropy_norm"),
    )


def key_skew_oracle_sql(
    table_sql: str, key_col: str, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`key_skew_report` — same entropy identity
    H = ln(n) - sum(c*ln c)/n, same rounding."""
    return f"""
WITH counts AS (
    SELECT {key_col} AS k, count(*) AS cnt FROM ({table_sql}) GROUP BY 1
),
agg AS (
    SELECT sum(cnt) AS n_rows, count(*) AS n_keys, max(cnt) AS max_count,
           sum(cnt * ln(cnt)) AS clogc
    FROM counts
)
SELECT n_rows, n_keys, max_count,
       round(CAST(max_count AS DOUBLE) / n_rows, {round_to}) AS top1_share,
       round(CAST(max_count AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys),
             {round_to}) AS skew_ratio,
       round(CASE WHEN n_keys > 1
             THEN (ln(n_rows) - clogc / n_rows) / ln(n_keys)
             ELSE 0.0 END, {round_to}) AS entropy_norm
FROM agg
"""


def rank_normalize(
    df: DataFrame,
    score_col: str,
    id_col: str,
    out_col: str = "pct_rank",
    round_to: int = 6,
) -> DataFrame:
    """Percent-rank transform of a score column — the distribution-free
    normalization for heterogeneous quality signals (length, perplexity
    and classifier scores live on incomparable scales; their ranks
    don't). Output matches SQL ``percent_rank() OVER (ORDER BY score)``:
    (rank_with_ties - 1) / (n - 1), ties share the rank of their first
    row. NULL scores are dropped (they have no rank).

    Spark's own ``percent_rank`` window has no partition key — the
    whole table funnels through ONE task. This plan never does: row
    numbers come from the two-phase prefix count
    (``operators.pack.global_running_sum``: range shuffle +
    per-partition windows + broadcast prefix), tie-groups take
    ``min(row_number)`` per distinct score (one groupBy, map-side
    combined, broadcast back), and n is a 1-row aggregate.
    """
    from multi_sensor_data_pipeline_for_robotics__spark.operators.pack import (
        global_running_sum,
    )

    scored = df.filter(F.col(score_col).isNotNull())
    rn = global_running_sum(scored, [score_col, id_col], F.lit(1), "__rn")
    # rank-with-ties = min row number among rows sharing the score.
    # NOT broadcast: with continuous scores the distinct-value side is
    # data-sized — a shuffle hash join on the value is the right plan
    # (AQE will still broadcast it when it happens to be small).
    tie_rank = rn.groupBy(F.col(score_col).alias("__v")).agg(
        F.min("__rn").alias("__rank")
    )
    n = scored.agg(F.count(F.lit(1)).alias("__n"))
    return (
        rn.join(tie_rank, F.col(score_col) == F.col("__v"))
        .crossJoin(F.broadcast(n))
        .withColumn(
            out_col,
            F.round(
                F.when(F.col("__n") > 1,
                       (F.col("__rank") - 1) / (F.col("__n") - 1))
                .otherwise(F.lit(0.0)),
                round_to,
            ),
        )
        .drop("__rn", "__v", "__rank", "__n")
    )


def rank_normalize_oracle_sql(
    table_sql: str, score_col: str, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`rank_normalize` — the plain window form
    the two-phase plan must equal."""
    return f"""
SELECT *, round(percent_rank() OVER (ORDER BY {score_col}), {round_to})
       AS pct_rank
FROM ({table_sql}) WHERE {score_col} IS NOT NULL
"""


def user_activity_features(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    round_to: int = 4,
) -> DataFrame:
    """Per-entity RFM-style feature snapshot — the one-groupBy feature
    table a downstream model trains on: recency (first/last event,
    active span in seconds), frequency (event count, distinct event
    types, events per active day), monetary (value sum/mean). One
    shuffle on the entity key, every aggregate map-side combinable;
    at 100 TB this is the canonical "wide scan → narrow per-user row"
    reduction (output rows = |users|, not |events|).

    NULL users are excluded (no entity to attribute to); NULL values
    contribute to counts but not sums/means (SQL aggregate semantics).

    Value sums/means are EXACT-INTEGER arithmetic in micro-units
    (value → decimal(·,6) → ×10⁶ → long; sums add, the mean is the
    floor-divided micro quotient) and the displayed doubles are plain
    micro/10⁶ divisions with NO rounding function — engine-identical
    bits. The obvious ``round(avg(value), 4)`` is a cross-engine trap:
    float sums are partition-order-dependent, and even the exact
    decimal-sum quotient lands on ``x.xxxx5`` halves often enough
    (2-decimal inputs make sums multiples of 0.01) that decimal-string
    HALF_UP (Spark) and binary rounding (DuckDB) split — observed on
    ~0.5% of users at sf0.1. Micro sums overflow long at ~9.2e12
    value-units — beyond any real per-entity total.
    """
    from multi_sensor_data_pipeline_for_robotics__spark.functions.timeutil import (
        ts_us,
    )

    micro = (
        F.col(value_col).cast("decimal(30,6)") * F.lit(1_000_000)
    ).cast("long")
    span_days = (
        ts_us(F.col("last_ts")) - ts_us(F.col("first_ts"))
    ).cast("double") / F.lit(86400.0 * 1e6)
    return (
        events.filter(F.col(user_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(type_col).alias("n_event_types"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            F.sum(micro).alias("__micro"),
            F.count(value_col).alias("__nv"),
        )
        .select(
            user_col,
            "n_events",
            "n_event_types",
            "first_ts",
            "last_ts",
            (F.col("__micro") / F.lit(1e6)).alias("total_value"),
            F.when(
                F.col("__nv") > 0,
                F.expr("__micro div __nv") / F.lit(1e6),
            ).alias("avg_value"),
            F.round(
                F.col("n_events")
                / F.greatest(span_days, F.lit(1.0 / 86400.0)),
                round_to,
            ).alias("events_per_day"),
        )
    )


def quantile_bucketize(
    df: DataFrame,
    col: str,
    num_buckets: int = 10,
    out_col: str = "bucket",
    exact: bool = True,
    rel_err: float = 1e-4,
) -> DataFrame:
    """Discretize a column into ``num_buckets`` equal-frequency bins —
    the feature-engineering quantile transform (decile features,
    calibration bins, equal-mass histograms). Bucket i covers values in
    [q(i/B), q((i+1)/B)); ties at a boundary go UP (value >= threshold
    counts the threshold), NULL values get a NULL bucket.

    The obvious ``ntile(B) OVER (ORDER BY col)`` funnels the whole
    table through ONE task (the same unpartitioned-window trap
    rank_normalize avoids). This plan is one percentile aggregation
    (B-1 thresholds, map-side combined) broadcast back as a 1-row
    frame, then a codegen'd fold over the ≤ B-1 threshold array — no
    shuffle of the data at all. Note the semantics differ from ntile
    on ties: ntile SPLITS a tie run across buckets to equalize counts;
    quantile bucketing keeps equal values together (the property
    feature pipelines actually want — equal inputs, equal feature).

    ``exact=False`` uses Greenwald-Khanna ``approx_percentile`` — the
    100 TB path, same trade as :func:`scale_features`' inputs.
    """
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    c = F.col(col).cast("double")
    probs = F.array(
        *[F.lit(i / num_buckets) for i in range(1, num_buckets)]
    )
    thr_expr = (
        F.percentile(c, probs)
        if exact
        else F.approx_percentile(c, probs, F.lit(int(1.0 / rel_err)))
    )
    thr = df.agg(thr_expr.alias("__t"))
    bucket = F.aggregate(
        F.col("__t"),
        F.lit(0),
        lambda acc, t: acc + F.when(c >= t, 1).otherwise(0),
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .withColumn(
            out_col,
            F.when(c.isNotNull(), bucket).cast("int"),
        )
        .drop("__t")
    )


def suggest_join_strategy(
    left_rows: int,
    right_rows: int,
    right_row_bytes: int = 100,
    broadcast_threshold_bytes: int = 10 * 1024 * 1024,
    skew_ratio: float | None = None,
    skew_limit: float = 20.0,
) -> dict:
    """Join-strategy advice from ANALYZE-style stats — the human-
    readable CBO step for a 100 TB job plan (feed `analyze_table`
    row counts and `key_skew_report.skew_ratio`):

      - right side under the broadcast threshold -> broadcast hash
        join (no shuffle of the big side);
      - skewed left key (skew_ratio > skew_limit) and a
        non-broadcastable right -> salted join
        (``functions.skew.salted_join``), with a suggested salt count
        ~ sqrt of the skew ratio (enough to flatten the hot reducer
        without over-replicating the dim);
      - otherwise the default shuffle join (AQE will pick
        hash/sort-merge and split residual skew at runtime).

    Driver-side pure arithmetic; returns {strategy, reason, n_salts?}.
    """
    if min(left_rows, right_rows, right_row_bytes) < 0:
        raise ValueError("row counts/bytes must be >= 0")
    right_bytes = right_rows * right_row_bytes
    if right_bytes <= broadcast_threshold_bytes:
        return {
            "strategy": "broadcast",
            "reason": f"right side ~{right_bytes} bytes fits the "
            f"{broadcast_threshold_bytes}-byte broadcast budget",
        }
    if skew_ratio is not None and skew_ratio > skew_limit:
        n_salts = max(4, min(64, int(round(skew_ratio ** 0.5))))
        return {
            "strategy": "salted",
            "reason": f"left key skew_ratio {skew_ratio:.1f} > "
            f"{skew_limit} and right side too big to broadcast",
            "n_salts": n_salts,
        }
    return {
        "strategy": "shuffle",
        "reason": "right side exceeds broadcast budget; key skew within "
        "AQE's runtime skew-split capability",
    }


def rank_normalize_grouped(
    df: DataFrame,
    score_col: str,
    group_cols: list[str],
    out_col: str = "pct_rank",
    round_to: int = 6,
) -> DataFrame:
    """Per-group percent-rank — normalize scores WITHIN each stratum
    ("percentile within its language"), the grouped complement of
    :func:`rank_normalize`. With a group key the window is properly
    partitioned, so Spark's native ``percent_rank`` is the right plan
    (one shuffle on the group key, groups rank in parallel) — the
    two-phase machinery exists for the UNPARTITIONED case only. The
    per-group partition bound is the same one sessionize lives with:
    a single group hot enough to break it belongs in a pre-split.
    NULL scores are dropped (no rank)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols).orderBy(score_col)
    return df.filter(F.col(score_col).isNotNull()).withColumn(
        out_col, F.round(F.percent_rank().over(w), round_to)
    )
