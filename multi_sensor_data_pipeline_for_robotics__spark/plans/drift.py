"""Distribution drift between two data slices — the monitoring
primitive a training-data pipeline runs before trusting a new crawl
snapshot, a rebalanced mixture, or last night's ingest: bin a numeric
column on a FIXED grid in both slices and compare the two histograms
with the standard divergences (KL both directions, Jensen-Shannon,
total variation).

Built on the same fixed-bin histogram as ``functions.sketch`` (counts
are additive → per-partition partials merge for free; the stored
``hist_sketch`` form of each day's slice can be diffed later without
rescanning data). Binning, smoothing and the divergence arithmetic are
all engine-portable (floor/least/greatest on doubles, ln), so the
drift NUMBERS themselves hash-check against a DuckDB replay — not
just "some drift statistic was computed".

Additive (Laplace) smoothing with ``alpha`` per bin keeps the KL terms
finite when a bin is empty on one side: p_i = (c_i + alpha) /
(n + alpha * bins) over the FULL bin spine (all ``bins`` bins,
including bins empty on both sides — the spine is generated, not
discovered, so both engines smooth identically).

Scale shape: one scan per side into ≤ ``bins`` count rows (map-side
combine), a broadcast join onto the generated spine, and a ≤
``bins``-row aggregation — the data-sized work is exactly two
histogram passes. At 100 TB, feed it stored ``hist_sketch`` tables
instead of raw slices via :func:`histogram_drift`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binned(df: DataFrame, value_col: str, bins: int, lo: float, hi: float):
    w = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((v - lo) / w), F.lit(0)), F.lit(bins - 1)
    ).alias("bin")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(b)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_drift(
    hist_a: DataFrame,
    hist_b: DataFrame,
    bins: int,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Divergences from two stored (bin, cnt) histograms over the same
    fixed grid (the ``hist_sketch`` form). Output, one row:
    (kl_ab, kl_ba, js_divergence, tvd, psi — doubles, rounded).

    js_divergence uses natural log (so its range is [0, ln 2]); tvd is
    0.5 * sum |p - q| in [0, 1]; psi is the population stability index
    = sum (p - q) ln(p/q) = kl_ab + kl_ba (Jeffreys divergence) — the
    industry drift threshold metric (<0.1 stable, >0.25 shifted).
    """
    spark = hist_a.sparkSession
    spine = spark.range(bins).select(F.col("id").alias("bin"))
    a = hist_a.groupBy("bin").agg(F.sum("cnt").alias("ca"))
    b = hist_b.groupBy("bin").agg(F.sum("cnt").alias("cb"))
    j = (
        spine.join(F.broadcast(a), "bin", "left")
        .join(F.broadcast(b), "bin", "left")
        .select(
            F.coalesce("ca", F.lit(0)).cast("double").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("double").alias("cb"),
        )
    )
    tot = j.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    p = (F.col("ca") + alpha) / (F.col("na") + alpha * bins)
    q = (F.col("cb") + alpha) / (F.col("nb") + alpha * bins)
    m = (p + q) / 2
    agg = j.crossJoin(F.broadcast(tot)).agg(
        F.sum(p * F.log(p / q)).alias("kl_ab"),
        F.sum(q * F.log(q / p)).alias("kl_ba"),
        (
            F.sum(p * F.log(p / m)) / 2 + F.sum(q * F.log(q / m)) / 2
        ).alias("js"),
        (F.sum(F.abs(p - q)) / 2).alias("tvd"),
    )
    return agg.select(
        F.round("kl_ab", round_to).alias("kl_ab"),
        F.round("kl_ba", round_to).alias("kl_ba"),
        F.round("js", round_to).alias("js_divergence"),
        F.round("tvd", round_to).alias("tvd"),
        F.round(F.col("kl_ab") + F.col("kl_ba"), round_to).alias("psi"),
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    bins: int = 256,
    lo: float = 0.0,
    hi: float = 1.0,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Drift between ``value_col`` in slices ``a`` and ``b``: histogram
    both on the shared [lo, hi) grid, then :func:`histogram_drift`.
    Bounds are explicit domain constants (the single-pass stance of
    ``histogram_quantiles`` with known bounds); values outside clamp
    into the edge bins on BOTH sides, so a shifted tail still
    registers as mass movement."""
    return histogram_drift(
        _binned(a, value_col, bins, lo, hi),
        _binned(b, value_col, bins, lo, hi),
        bins,
        alpha,
        round_to,
    )


def drift_oracle_sql(
    a_sql: str,
    b_sql: str,
    value_col: str,
    bins: int = 256,
    lo: float = 0.0,
    hi: float = 1.0,
    alpha: float = 0.5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`distribution_drift` — identical binning,
    spine, smoothing and divergence arithmetic."""
    w = (hi - lo) / bins

    def binned(src: str, alias: str) -> str:
        return f"""
{alias} AS (
    SELECT least(greatest(CAST(floor((CAST({value_col} AS DOUBLE) - {lo!r}) / {w!r}) AS BIGINT), 0), {bins - 1}) AS bin,
           count(*) AS cnt
    FROM ({src}) WHERE {value_col} IS NOT NULL GROUP BY 1
)"""

    return f"""
WITH {binned(a_sql, 'ha')}, {binned(b_sql, 'hb')},
spine AS (SELECT unnest(range({bins})) AS bin),
j AS (
    SELECT CAST(coalesce(ha.cnt, 0) AS DOUBLE) AS ca,
           CAST(coalesce(hb.cnt, 0) AS DOUBLE) AS cb
    FROM spine LEFT JOIN ha USING (bin) LEFT JOIN hb USING (bin)
),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j),
terms AS (
    SELECT (ca + {alpha!r}) / (na + {alpha!r} * {bins}) AS p,
           (cb + {alpha!r}) / (nb + {alpha!r} * {bins}) AS q
    FROM j CROSS JOIN tot
)
SELECT round(sum(p * ln(p / q)), {round_to}) AS kl_ab,
       round(sum(q * ln(q / p)), {round_to}) AS kl_ba,
       round(sum(p * ln(p / ((p + q) / 2))) / 2
             + sum(q * ln(q / ((p + q) / 2))) / 2, {round_to}) AS js_divergence,
       round(sum(abs(p - q)) / 2, {round_to}) AS tvd,
       round(sum(p * ln(p / q)) + sum(q * ln(q / p)), {round_to}) AS psi
FROM terms
"""
