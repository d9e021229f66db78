"""Portable sketches: KMV distinct-count + fixed-bin histogram quantiles.

``approx_count_distinct`` (HLL++, `plans.analytics.approx_distinct_stats`)
is the production sketch — but its estimate is engine-specific, so the
correctness harness can only bound it against the exact count. KMV
[Bar-Yossef et al., RANDOM 2002] fills the auditability gap: hash every
value uniformly to [0, 1), keep the k smallest DISTINCT hashes; with
``u_k`` the k-th smallest, ``(k-1) / u_k`` estimates the distinct count
(relative error ~ 1/sqrt(k-2)). Built here on ``md5`` — which Spark and
DuckDB (and Postgres, Trino, ...) all expose with identical output — so
the ESTIMATE ITSELF is bit-reproducible across engines and hash-checked
by the oracle gate, not merely bounded.

Scale shape: the only wide op is a distinct on (group, hash-prefix) —
8-byte keys with map-side partial dedup — followed by a TWO-PHASE
bottom-k (the global variant uses ``orderBy().limit(k)`` →
TakeOrderedAndProject, never a single-partition sort of corpus data).
The grouped bottom-k salts on ``h % S`` first: phase 1 ranks within
(group, salt) — S parallel sorts of ~1/S of the group's hashes each —
and phase 2 ranks the surviving ≤ k·S rows per group. The KMV merge
law (the k smallest of a union are among the union of each part's k
smallest) makes the split LOSSLESS, so a 10^9-ndv group never funnels
through one task: the largest single sort is max(ndv/S, k·S) rows.
Like any KMV, per-partition partial sketches merge associatively; at
100 TB the distinct's map-side combine delivers exactly that
partial-merge behavior — each map task emits at most its local
distinct hashes.

Determinism note: the estimate divides doubles, but both engines
perform the same IEEE-754 ops on the same integers, so results agree
bit-for-bit; a ``round(4)`` guards the cross-engine hash anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# 15 hex digits = 60 bits: inside BIGINT range, and the uniform-fraction
# denominator 16^15 is an exact power of two (exactly representable as a
# double, so u_k = h / 16^15 loses nothing to the division itself).
_PREFIX_HEX_DIGITS = 15
_DENOM = float(16 ** _PREFIX_HEX_DIGITS)


def kmv_hash(col: Column | str) -> Column:
    """Uniform 60-bit integer hash of a value via the md5 hex prefix —
    byte-identical in any engine exposing md5 over strings."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, _PREFIX_HEX_DIGITS), 16, 10
    ).cast("bigint")


def grouped_bottom_k(
    d: DataFrame,
    group_cols: list[str],
    k: int,
    salt_buckets: int = 64,
    h_col: str = "h",
) -> DataFrame:
    """The k smallest DISTINCT hashes per group, without ever sorting a
    whole group in one task. Phase 1 ranks within (group, ``h % S``) —
    S parallel sorts per group; phase 2 ranks the ≤ k·S survivors per
    group. Lossless by the KMV merge law: every global bottom-k hash is
    its salt bucket's bottom-k. Input must already be distinct on
    (group, h); output is (group_cols..., h) in no particular order.

    The salt derives from the hash itself, so the result is
    deterministic and identical to a single global per-group ranking —
    the DuckDB oracle twins keep the one-window form and still
    hash-match."""
    salted = d.withColumn("__salt", F.pmod(F.col(h_col), F.lit(salt_buckets)))
    w1 = W.partitionBy(*group_cols, "__salt").orderBy(h_col)
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__salt", "__rn")
    )
    w2 = W.partitionBy(*group_cols).orderBy(h_col)
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_col: str | None = None,
    round_to: int = 4,
    salt_buckets: int = 64,
) -> DataFrame:
    """Approximate distinct count of ``value_col`` (optionally per
    ``group_col``) via a k-minimum-values sketch.

    Output: (group?, approx_distinct double, sketch_m long) where
    ``sketch_m`` is the number of hashes retained (= k when the sketch
    saturated; below k the count is EXACT and returned as-is — the
    standard small-cardinality fallback).
    """
    # COUNT(DISTINCT) semantics: NULL values contribute nothing. The
    # filter also matters cross-engine — kmv_hash(NULL) is NULL, which
    # Spark's ascending sort ranks FIRST but DuckDB ranks LAST, so an
    # unfiltered null would silently skew a saturated sketch by one on
    # exactly one engine.
    nn = df.filter(F.col(value_col).isNotNull())
    h = kmv_hash(value_col).alias("h")
    if group_col is None:
        d = nn.select(h).distinct()
        mins = d.orderBy("h").limit(k)
        agg = mins.agg(
            F.max("h").alias("hk"), F.count(F.lit(1)).alias("m")
        )
    else:
        d = nn.select(F.col(group_col), h).distinct()
        mins = grouped_bottom_k(d, [group_col], k, salt_buckets)
        agg = mins.groupBy(group_col).agg(
            F.max("h").alias("hk"), F.count(F.lit(1)).alias("m")
        )
    est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(
        F.round((k - 1) / (F.col("hk").cast("double") / _DENOM), round_to)
    )
    cols = [] if group_col is None else [group_col]
    return agg.select(
        *cols,
        est.alias("approx_distinct"),
        F.col("m").cast("long").alias("sketch_m"),
    )


def kmv_oracle_sql(
    table: str,
    value_col: str,
    k: int = 256,
    group_col: str | None = None,
    round_to: int = 4,
) -> str:
    """The DuckDB twin of :func:`kmv_distinct` — same md5 prefix, same
    arithmetic, so the driver's value-hash compare is exact."""
    hx = (
        f"cast(concat('0x', substr(md5(cast({value_col} as varchar)), 1, "
        f"{_PREFIX_HEX_DIGITS})) as bigint)"
    )
    if group_col is None:
        return f"""
            WITH d AS (SELECT DISTINCT {hx} AS h FROM {table}
                       WHERE {value_col} IS NOT NULL),
            mins AS (SELECT h FROM d ORDER BY h LIMIT {k}),
            agg AS (SELECT max(h) AS hk, count(*) AS m FROM mins)
            SELECT CASE WHEN m < {k} THEN cast(m AS double)
                   ELSE round(({k} - 1) / (cast(hk AS double) / {_DENOM}), {round_to})
                   END AS approx_distinct,
                   cast(m AS bigint) AS sketch_m
            FROM agg
        """
    return f"""
        WITH d AS (SELECT DISTINCT {group_col}, {hx} AS h FROM {table}
                   WHERE {value_col} IS NOT NULL),
        mins AS (
            SELECT {group_col}, h,
                   row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn
            FROM d
        ),
        agg AS (
            SELECT {group_col}, max(h) AS hk, count(*) AS m
            FROM mins WHERE rn <= {k} GROUP BY {group_col}
        )
        SELECT {group_col},
               CASE WHEN m < {k} THEN cast(m AS double)
               ELSE round(({k} - 1) / (cast(hk AS double) / {_DENOM}), {round_to})
               END AS approx_distinct,
               cast(m AS bigint) AS sketch_m
        FROM agg
    """


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 1024,
    group_col: str | None = None,
    lo: float | None = None,
    hi: float | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Approximate quantiles from a fixed-bin histogram — the portable,
    mergeable counterpart of ``percentile_approx`` (whose GK sketch is
    engine-specific, so only boundable, never hash-checkable).

    One scan builds per-bin counts (map-side partial agg; state = at
    most ``bins`` longs per group regardless of input size — counts
    merge associatively, the mergeable-sketch property). The quantile
    is then linearly interpolated inside the bin where the cumulative
    count crosses ``q*n``. Error is bounded by the bin width
    ``(hi-lo)/bins`` — choose bins for the precision the caller needs;
    values outside [lo, hi) clamp into the edge bins.

    ``lo``/``hi`` default to a min/max pre-scan; pass explicit bounds
    (usually known domain constants at 100 TB) to make it single-pass.
    The cumulative window orders ≤ ``bins`` COUNT rows — per group when
    grouped, one tiny single-partition window (bins rows, not data
    rows) when global.

    Output: (group?, q double, quantile double) — deterministic, and
    byte-identical to the same arithmetic in any SQL engine (see
    :func:`histogram_quantiles_oracle_sql`). ``qs`` must lie in
    (0, 1]: the crossing bin is the first with ``cum >= q*n`` and
    ``cum - cnt < q*n``, which no bin satisfies at q=0.
    """
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {q} outside (0, 1]")
    if lo is None or hi is None:
        row = df.agg(
            F.min(F.col(value_col).cast("double")).alias("lo"),
            F.max(F.col(value_col).cast("double")).alias("hi"),
        ).first()
        if row["lo"] is None or row["hi"] is None:
            # empty / all-null value column: no quantiles to report
            keys = [F.col(group_col)] if group_col else []
            return df.select(
                *keys,
                F.lit(None).cast("double").alias("q"),
                F.lit(None).cast("double").alias("quantile"),
            ).limit(0)
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if not hi > lo:
        hi = lo + 1.0  # degenerate single-value domain: one bin catches all
    w = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    bin_idx = F.least(
        F.greatest(F.floor((v - lo) / w), F.lit(0)), F.lit(bins - 1)
    ).alias("bin")
    keys = [group_col] if group_col else []
    counts = df.select(*keys, bin_idx).groupBy(*keys, "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cw = (
        W.partitionBy(*keys).orderBy("bin")
        if keys
        else W.orderBy("bin")
    )
    cum = counts.withColumn("cum", F.sum("cnt").over(cw)).withColumn(
        "n", F.max("cum").over(W.partitionBy(*keys) if keys else W.partitionBy())
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    target = F.col("q") * F.col("n")
    # the quantile bin: first bin whose cumulative count reaches target
    hit = (
        cum.join(F.broadcast(qdf))
        .filter(
            (F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target)
        )
    )
    est = F.round(
        lo
        + w
        * (
            F.col("bin")
            + (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
        ),
        round_to,
    )
    return hit.select(*keys, "q", est.alias("quantile"))


def histogram_quantiles_oracle_sql(
    table: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 1024,
    group_col: str | None = None,
    lo: float | None = None,
    hi: float | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`histogram_quantiles` for known bounds
    (``lo``/``hi`` must be passed so both engines bin identically)."""
    assert lo is not None and hi is not None, "oracle needs explicit bounds"
    w = (hi - lo) / bins
    keys = f"{group_col}, " if group_col else ""
    part = f"PARTITION BY {group_col} " if group_col else ""
    # CAST each q to DOUBLE: bare VALUES (0.9) is DECIMAL in DuckDB, and
    # DECIMAL 0.9*n can differ from the double product exactly at a
    # cumulative-count boundary, flipping the crossing-bin predicate.
    qvals = ", ".join(f"(CAST({float(q)!r} AS DOUBLE))" for q in qs)
    return f"""
WITH b AS (
    SELECT {keys}
           least(greatest(CAST(floor((CAST({value_col} AS DOUBLE) - {lo!r}) / {w!r}) AS BIGINT), 0), {bins - 1}) AS bin
    FROM {table}
),
counts AS (SELECT {keys}bin, count(*) AS cnt FROM b GROUP BY {keys}bin),
cum AS (
    SELECT {keys}bin, cnt,
           sum(cnt) OVER ({part}ORDER BY bin) AS cum,
           sum(cnt) OVER ({part.rstrip() or 'PARTITION BY 1'}) AS n
    FROM counts
),
qq(q) AS (VALUES {qvals})
SELECT {keys}q,
       round({lo!r} + {w!r} * (bin + (q * n - (cum - cnt)) / cnt), {round_to}) AS quantile
FROM cum CROSS JOIN qq
WHERE cum >= q * n AND cum - cnt < q * n
"""


def kmv_sketch(
    df: DataFrame, value_col: str, k: int = 256
) -> DataFrame:
    """The STORED form of the KMV sketch: the ≤k smallest distinct
    hashes as a (h) table — persist per partition/day/source, then
    :func:`kmv_merge_estimate` unions any subset for a combined count.
    KMV is closed under union-then-top-k, so merging loses NOTHING:
    the merged estimate is bit-identical to sketching the union
    directly (asserted by the graded twin). NULL values contribute
    nothing (COUNT(DISTINCT) semantics, matching kmv_distinct)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(kmv_hash(value_col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge_estimate(
    sketches: list[DataFrame], k: int = 256, round_to: int = 4
) -> DataFrame:
    """Combined distinct-count estimate from stored sketch tables:
    union → distinct → re-top-k → the same estimator as
    :func:`kmv_distinct`. Output: (approx_distinct double, sketch_m
    long)."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    mins = u.distinct().orderBy("h").limit(k)
    agg = mins.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("m"))
    est = F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
        F.round((k - 1) / (F.col("hk").cast("double") / _DENOM), round_to)
    )
    return agg.select(
        est.alias("approx_distinct"),
        F.col("m").cast("long").alias("sketch_m"),
    )


def hist_sketch(
    df: DataFrame,
    value_col: str,
    bins: int = 1024,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """The STORED form of the fixed-bin histogram: (bin, cnt) rows for
    one slice of the data — persist per partition/day/source and merge
    any subset with :func:`hist_merge_quantiles`. Counts are additive,
    so merging is LOSSLESS: merged quantiles are bit-identical to
    histogramming the union directly (bounds must be the shared domain
    constants)."""
    w = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((v - lo) / w), F.lit(0)), F.lit(bins - 1)
    ).alias("bin")
    return df.select(b).groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))


def hist_merge_quantiles(
    sketches: list[DataFrame],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 1024,
    lo: float = 0.0,
    hi: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Quantiles from merged stored histograms: union → per-bin count
    sum → the same interpolation as :func:`histogram_quantiles`.
    Output: (q double, quantile double)."""
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {q} outside (0, 1]")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    counts = u.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    w = (hi - lo) / bins
    cw = W.orderBy("bin")
    cum = counts.withColumn("cum", F.sum("cnt").over(cw)).withColumn(
        "n", F.max("cum").over(W.partitionBy())
    )
    qdf = cum.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    target = F.col("q") * F.col("n")
    hit = cum.join(F.broadcast(qdf)).filter(
        (F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target)
    )
    est = F.round(
        lo + w * (F.col("bin") + (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")),
        round_to,
    )
    return hit.select("q", est.alias("quantile"))


def _akmv(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """AKMV synopsis [Beyer et al., SIGMOD 2007]: the k smallest
    distinct key hashes, each carrying its exact multiplicity — the
    sketch that sizes JOINS, not just distinct counts. NULL keys never
    join, so they are excluded (and kmv_hash(NULL) is NULL, which the
    two engines would rank at opposite ends of the sort anyway)."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(kmv_hash(key_col).alias("h"), "cnt")
        .orderBy("h")
        .limit(k)
    )


def kmv_join_cardinality(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    k: int = 256,
    round_to: int = 4,
) -> DataFrame:
    """Pre-join cardinality estimate from two AKMV sketches — what a
    cost-based optimizer does before committing to a join strategy,
    here in portable md5 arithmetic so the ESTIMATE ITSELF is
    hash-checkable cross-engine.

    Estimator: with S_A, S_B the k-smallest key-hash synopses and U
    the k smallest of S_A ∪ S_B (u_k its max), D_U estimates the
    distinct-key union; the hashes present in BOTH synopses and in U
    form an unbiased sample of the key intersection, so
    D_∩ = (|I|/|U|)·D_U, and the join size is D_∩ times the mean
    multiplicity product over the sampled intersection:
    |A ⋈ B| ≈ D_∩ · mean(cntA·cntB | I). Both sides' sketches build
    in one groupBy + TakeOrdered each (map-side combinable; k rows
    cross the wire) — the join itself never runs.

    Output (1 row): est_join_rows, est_distinct_intersection,
    est_distinct_union (doubles), sample_pairs (long)."""
    sa = _akmv(a, a_key, k)
    sb = _akmv(b, b_key, k)
    u = (
        sa.select("h")
        .unionByName(sb.select("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    uagg = u.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("mu"))
    inter = (
        sa.withColumnRenamed("cnt", "ca")
        .join(sb.withColumnRenamed("cnt", "cb"), "h")
        .join(u, "h")
    )
    iagg = inter.agg(
        F.count(F.lit(1)).alias("mi"),
        F.sum(F.col("ca") * F.col("cb")).alias("spp"),
    )
    du = F.when(F.col("mu") < k, F.col("mu").cast("double")).otherwise(
        (k - 1) / (F.col("hk").cast("double") / _DENOM)
    )
    di = F.col("mi").cast("double") / F.col("mu").cast("double") * du
    ej = F.when(F.col("mi") == 0, F.lit(0.0)).otherwise(
        di * F.col("spp").cast("double") / F.col("mi").cast("double")
    )
    return uagg.crossJoin(iagg).select(
        F.round(ej, round_to).alias("est_join_rows"),
        F.round(di, round_to).alias("est_distinct_intersection"),
        F.round(du, round_to).alias("est_distinct_union"),
        F.coalesce(F.col("mi"), F.lit(0)).cast("long").alias("sample_pairs"),
    )


def kmv_join_oracle_sql(
    a_sql: str,
    a_key: str,
    b_sql: str,
    b_key: str,
    k: int = 256,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`kmv_join_cardinality` — same md5 prefix
    hashes, same synopses, same estimator arithmetic."""

    def hx(col):
        return (
            f"cast(concat('0x', substr(md5(cast({col} as varchar)), 1, "
            f"{_PREFIX_HEX_DIGITS})) as bigint)"
        )

    return f"""
WITH sa AS (
    SELECT {hx(a_key)} AS h, count(*) AS ca FROM ({a_sql})
    WHERE {a_key} IS NOT NULL GROUP BY {a_key}
    ORDER BY h LIMIT {k}
),
sb AS (
    SELECT {hx(b_key)} AS h, count(*) AS cb FROM ({b_sql})
    WHERE {b_key} IS NOT NULL GROUP BY {b_key}
    ORDER BY h LIMIT {k}
),
u AS (
    SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
    ORDER BY h LIMIT {k}
),
uagg AS (SELECT max(h) AS hk, count(*) AS mu FROM u),
iagg AS (
    SELECT count(*) AS mi, sum(ca * cb) AS spp
    FROM sa JOIN sb USING (h) JOIN u USING (h)
)
SELECT
  round(CASE WHEN mi = 0 THEN 0.0
        ELSE (CAST(mi AS DOUBLE) / mu
              * CASE WHEN mu < {k} THEN CAST(mu AS DOUBLE)
                     ELSE ({k} - 1) / (CAST(hk AS DOUBLE) / {_DENOM!r}) END)
             * CAST(spp AS DOUBLE) / mi END, {round_to}) AS est_join_rows,
  round(CAST(mi AS DOUBLE) / mu
        * CASE WHEN mu < {k} THEN CAST(mu AS DOUBLE)
               ELSE ({k} - 1) / (CAST(hk AS DOUBLE) / {_DENOM!r}) END,
        {round_to}) AS est_distinct_intersection,
  round(CASE WHEN mu < {k} THEN CAST(mu AS DOUBLE)
        ELSE ({k} - 1) / (CAST(hk AS DOUBLE) / {_DENOM!r}) END,
        {round_to}) AS est_distinct_union,
  CAST(coalesce(mi, 0) AS BIGINT) AS sample_pairs
FROM uagg CROSS JOIN iagg
"""
