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


def acf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    max_lag: int = 8,
    tiebreak_col: str | None = None,
    round_to: int = 6,
    time_bucket_ms: int | None = None,
) -> DataFrame:
    """Pooled autocorrelation function: one row per lag 1..``max_lag``
    with (lag, n_pairs, acf) — Pearson correlation of (x_t, x_{t+lag})
    pairs formed WITHIN each key's time-ordered series and pooled
    across keys.

    Plan: ONE window pass per key emits all ``max_lag`` lead columns,
    a generated-in-place stack unpivots them to (lag, x, y) rows, and
    a ``max_lag``-group corr aggregate finishes — no self-joins, no
    per-lag rescans. A hot key serializes one partition's sort; pass
    ``time_bucket_ms`` to split each key into time buckets with a
    ``max_lag``-row overlap head copied to the previous bucket — each
    (t, t+lag) pair is then computed in t's bucket exactly once and
    the per-task sort bound drops from rows-per-key to
    rows-per-bucket (the keyed as-of join's ``time_buckets`` remedy).
    EXACTNESS CONDITION: a pair is formed only if its successor lies
    in t's bucket or the next bucket's first ``max_lag`` rows — so
    results equal the direct window whenever every non-empty bucket
    holds >= ``max_lag`` rows (property-tested); buckets sparser than
    that drop their boundary-spanning pairs (same class of documented
    truncation as the EWMA window). Size the span so a bucket holds
    thousands of rows: at 1e9 rows/key/day, an hourly span gives
    ~4e7-row tasks and loses nothing.

    ``tiebreak_col`` (pass a unique id) makes the intra-key order
    total when timestamps collide, which both engines must agree on
    for hash parity.
    """
    v = F.col(value_col).cast("double")
    if time_bucket_ms is None:
        order = [F.col(ts_col)] + (
            [F.col(tiebreak_col)] if tiebreak_col else []
        )
        w = W.partitionBy(key_col).orderBy(*order)
        leads = df.select(
            v.alias("x"),
            *[
                F.lead(v, k).over(w).alias(f"y{k}")
                for k in range(1, max_lag + 1)
            ],
        )
    else:
        base = df.select(
            F.col(key_col).alias("__k"),
            F.col(ts_col).alias("__ts"),
            v.alias("__v"),
            *(
                [F.col(tiebreak_col).alias("__tb")]
                if tiebreak_col
                else [F.lit(0).alias("__tb")]
            ),
        ).withColumn(
            "__bkt",
            F.floor(F.unix_micros(F.col("__ts")) / (time_bucket_ms * 1000)),
        )
        in_bkt = W.partitionBy("__k", "__bkt").orderBy("__ts", "__tb")
        pos = base.withColumn("__pos", F.row_number().over(in_bkt))
        # the first max_lag rows of each bucket also serve as lead
        # TARGETS for the previous bucket's tail (overlap copy)
        head_copy = (
            pos.filter(F.col("__pos") <= max_lag)
            .withColumn("__bkt", F.col("__bkt") - 1)
            .withColumn("__copy", F.lit(True))
        )
        both = pos.withColumn("__copy", F.lit(False)).unionByName(head_copy)
        w2 = W.partitionBy("__k", "__bkt").orderBy("__ts", "__tb")
        leads = both.select(
            F.col("__copy"),
            F.col("__v").alias("x"),
            *[
                F.lead("__v", k).over(w2).alias(f"y{k}")
                for k in range(1, max_lag + 1)
            ],
        ).filter(~F.col("__copy")).drop("__copy")
    stacked = leads.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col("x").alias("x"),
                        F.col(f"y{k}").alias("y"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("s")
    ).select("s.lag", "s.x", "s.y")
    return (
        stacked.filter(F.col("y").isNotNull() & F.col("x").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("x", "y"), round_to).alias("acf"),
        )
    )


def acf_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    max_lag: int = 8,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`acf` — the same lead fan and pooled corr."""
    order = ts_col + (f", {tiebreak_col}" if tiebreak_col else "")
    ow = f"OVER (PARTITION BY {key_col} ORDER BY {order})"
    v = f"CAST({value_col} AS DOUBLE)"
    arms = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS lag, x, y{k} AS y FROM leads"
        for k in range(1, max_lag + 1)
    )
    leadcols = ",\n           ".join(
        f"lead({v}, {k}) {ow} AS y{k}" for k in range(1, max_lag + 1)
    )
    return f"""
WITH leads AS (
    SELECT {v} AS x,
           {leadcols}
    FROM {table}
),
stacked AS (
    {arms}
)
SELECT lag, count(*) AS n_pairs, round(corr(x, y), {round_to}) AS acf
FROM stacked WHERE y IS NOT NULL AND x IS NOT NULL
GROUP BY lag
"""


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    micro_scale: int = 1_000_000,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """CUSUM change-point per key: (key, n, k_change, ts_change, stat).

    The classic mean-shift scan: ``S_k = sum_{i<=k} (x_i - mean)``;
    the change-point is ``argmax_k |S_k|`` and the test statistic is
    ``max_k |S_k| / (s * sqrt(n))`` (compare to Kolmogorov-type
    critical values ~1.36 at 5%).

    ARGMAX IS COMPUTED IN EXACT INTEGER ARITHMETIC: with x in
    ``micro_scale`` units, ``n * S_k = n * prefix_k - k * total`` is a
    BIGINT — so which k wins never depends on float summation order
    (running double sums associate differently across engines, and a
    1e-12 wobble between near-tied |S_k| values would flip the argmax
    where rounding can't save it). Only the final ``stat`` touches
    doubles; the argmax products run in decimal(38,0) (DuckDB:
    int128), so the envelope is ``n^2 * mean * micro_scale < 1e38`` —
    effectively unreachable. The BIGINT prefix sum itself bounds
    ``n * mean * micro_scale < 2^63`` per key (at 1e10 rows/key with
    values ~1e3, drop ``micro_scale`` to 1e3).

    Plan: one group aggregate for (n, total, var) joins back onto one
    prefix-sum window pass per key; the deterministic argmax is a
    row_number over (|nS| desc, k asc). ``tiebreak_col`` (a unique id)
    totalizes the order when timestamps collide — without it, tied-ts
    prefix sums are engine-arbitrary.
    """
    xm = F.round(F.col(value_col).cast("double") * micro_scale, 0).cast(
        "long"
    )
    order = [F.col("ts")] + ([F.col("__tb")] if tiebreak_col else [])
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        xm.alias("xm"),
        *([F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []),
    )
    totals = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").alias("total"),
        F.stddev_samp(F.col("xm").cast("double") / micro_scale).alias("s"),
    )
    w = W.partitionBy("key").orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    pre = base.select(
        "key",
        "ts",
        F.sum("xm").over(w).alias("prefix"),
        F.row_number().over(w).alias("k"),
    )
    j = pre.join(totals, "key")
    # decimal(38,0), not BIGINT products: at 10M+ rows in one key,
    # n * prefix exceeds int64 (caught by the hot-key scale smoke as an
    # ANSI ARITHMETIC_OVERFLOW). DuckDB already computes this in
    # int128, so the VALUES — and therefore the argmax — stay
    # identical; the envelope moves from ~2^63 to 10^38
    # (n * total * micro_scale < 1e38).
    ns = F.col("n").cast("decimal(12,0)") * F.col("prefix").cast(
        "decimal(26,0)"
    ) - F.col("k").cast("decimal(12,0)") * F.col("total").cast(
        "decimal(26,0)"
    )
    ranked = j.select(
        "key",
        "ts",
        "k",
        "n",
        "s",
        ns.alias("ns"),
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("key").orderBy(F.abs(F.col("ns")).desc(), F.col("k"))
        ),
    )
    stat = (
        F.abs(F.col("ns")).cast("double")
        / F.col("n")
        / micro_scale
        / (F.col("s") * F.sqrt(F.col("n").cast("double")))
    )
    return ranked.filter(F.col("rn") == 1).select(
        "key",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k_change"),
        F.col("ts").alias("ts_change"),
        F.round(stat, round_to).alias("stat"),
    )


def cusum_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    micro_scale: int = 1_000_000,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cusum_changepoint` — identical integer
    argmax, so no float-order ambiguity in which row wins."""
    order = "ts" + (", tb" if tiebreak_col else "")
    ow = (
        f"OVER (PARTITION BY key ORDER BY {order} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    tb_sel = f", {tiebreak_col} AS tb" if tiebreak_col else ""
    return f"""
WITH base AS (
    SELECT {key_col} AS key, {ts_col} AS ts,
           CAST(round(CAST({value_col} AS DOUBLE) * {micro_scale})
                AS BIGINT) AS xm{tb_sel}
    FROM {table}
),
totals AS (
    SELECT key, count(*) AS n, sum(xm) AS total,
           stddev_samp(CAST(xm AS DOUBLE) / {micro_scale}) AS s
    FROM base GROUP BY key
),
pre AS (
    SELECT key, ts,
           sum(xm) {ow} AS prefix,
           row_number() {ow} AS k
    FROM base
),
ranked AS (
    SELECT pre.key, pre.ts, pre.k, totals.n, totals.s,
           CAST(totals.n AS BIGINT) * pre.prefix
             - CAST(pre.k AS BIGINT) * totals.total AS ns,
           row_number() OVER (
               PARTITION BY pre.key
               ORDER BY abs(CAST(totals.n AS BIGINT) * pre.prefix
                            - CAST(pre.k AS BIGINT) * totals.total) DESC,
                        pre.k
           ) AS rn
    FROM pre JOIN totals USING (key)
)
SELECT key, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_change,
       ts AS ts_change,
       round(CAST(abs(ns) AS DOUBLE) / n / {micro_scale}
             / (s * sqrt(CAST(n AS DOUBLE))), {round_to}) AS stat
FROM ranked WHERE rn = 1
"""


def acf_bucketed_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    max_lag: int,
    time_bucket_ms: int,
    tiebreak_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`acf` with ``time_bucket_ms`` set — replays
    the bucket + overlap-head semantics exactly (including the
    documented sparse-bucket pair truncation), so the SCALE PATH is
    hash-graded, not just the direct window."""
    v = f"CAST({value_col} AS DOUBLE)"
    leadcols = ",\n           ".join(
        f"lead(v, {k}) OVER (PARTITION BY k, bkt ORDER BY ts, tb) AS y{k}"
        for k in range(1, max_lag + 1)
    )
    arms = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS lag, x, y{k} AS y FROM leads"
        for k in range(1, max_lag + 1)
    )
    return f"""
WITH base AS (
    SELECT {key_col} AS k, {ts_col} AS ts, {tiebreak_col} AS tb,
           {v} AS v,
           CAST(floor(epoch_us({ts_col})
                      / ({time_bucket_ms} * 1000.0)) AS BIGINT) AS bkt
    FROM {table}
),
pos AS (
    SELECT *, row_number() OVER (PARTITION BY k, bkt
                                 ORDER BY ts, tb) AS p
    FROM base
),
ub AS (
    SELECT k, bkt, ts, tb, v, FALSE AS is_copy FROM pos
    UNION ALL
    SELECT k, bkt - 1, ts, tb, v, TRUE FROM pos WHERE p <= {max_lag}
),
leads AS (
    SELECT is_copy, v AS x,
           {leadcols}
    FROM ub
),
stacked AS (
    {arms.replace("FROM leads", "FROM leads WHERE NOT is_copy")}
)
SELECT lag, count(*) AS n_pairs, round(corr(x, y), {round_to}) AS acf
FROM stacked WHERE x IS NOT NULL AND y IS NOT NULL
GROUP BY lag
"""
