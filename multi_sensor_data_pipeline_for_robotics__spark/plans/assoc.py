"""Categorical ASSOCIATION statistics and digit-law audits — the
"are these two columns related, and does this numeric column look
organic" questions a data-quality pass asks before trusting a feed:

* ``chi_square`` — Pearson chi-squared independence test between two
  categorical columns, plus Cramér's V (the [0,1] effect size that
  makes chi2 comparable across tables).
* ``mutual_information`` — Shannon MI in nats between two categorical
  columns, with both marginal entropies (so normalized variants are a
  client-side division away).
* ``benford_audit`` — first-significant-digit distribution of a
  positive numeric column vs Benford's law, the classic fabricated-
  numbers screen (Nigrini 2012).

Scale shape (all three): ONE groupBy over the data builds a
contingency/digit table bounded by CATEGORY CARDINALITY, never row
count; marginals and totals re-aggregate from that tiny table and
broadcast back.  At 100 TB the data-sized work is exactly one
map-side-combined count shuffle.

Portability: counts stay exact integers until the final divisions;
only irrational-valued outputs (chi2, V, entropies, Benford fractions)
are rounded (6 dp) — not lattice-aligned, so the decimal half-boundary
trap cannot occur.  Benford digits are extracted via exact integer
string heads (``round(x * scale)`` → BIGINT → first char), never
``floor(log10(x))``, because float log at exact powers of 10 can
differ by 1 ulp between engines and flip the digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "chi_square",
    "chi_square_oracle_sql",
    "mutual_information",
    "mutual_information_oracle_sql",
    "benford_audit",
    "benford_oracle_sql",
    "welch_t_test",
    "welch_oracle_sql",
]


def _contingency(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """(a, b, c) joint counts over non-null pairs — the one data-sized
    aggregation all the association statistics derive from."""
    return (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def chi_square(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-squared independence test: one row
    (n, dof, chi2, cramers_v).

    ``chi2 = sum (o - e)^2 / e`` with ``e = row_total * col_total / n``
    over the observed contingency CELLS (cells absent from the data
    contribute ``e`` each; equivalently ``chi2 = n * (sum o^2/(ra*cb)
    - 1)``, which needs only observed cells — the identity used here so
    the generated full grid is never materialized).
    ``cramers_v = sqrt(chi2 / (n * min(r-1, c-1)))``.

    Plan: one count shuffle bounded by |A|x|B| cells; marginals are
    re-aggregations of that table (checkpointed so its THREE consumers
    don't each replay the data-sized count); the final row is a
    broadcast-joined scalar combine.
    """
    cont = _contingency(df, col_a, col_b).localCheckpoint(eager=False)
    ra = cont.groupBy("a").agg(F.sum("c").alias("ra"))
    cb = cont.groupBy("b").agg(F.sum("c").alias("cb"))
    j = cont.join(F.broadcast(ra), "a").join(F.broadcast(cb), "b")
    parts = j.agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c").cast("double") * F.col("c")
            / (F.col("ra").cast("double") * F.col("cb"))
        ).alias("s"),
        F.count_distinct("a").alias("r"),
        F.count_distinct("b").alias("k"),
    )
    chi2 = F.col("n") * (F.col("s") - F.lit(1.0))
    dof = (F.col("r") - 1) * (F.col("k") - 1)
    v = F.sqrt(
        chi2
        / (
            F.col("n")
            * F.least(F.col("r") - 1, F.col("k") - 1).cast("double")
        )
    )
    return parts.select(
        F.col("n").cast("long").alias("n"),
        dof.cast("long").alias("dof"),
        F.round(chi2, round_to).alias("chi2"),
        F.round(v, round_to).alias("cramers_v"),
    )


def chi_square_oracle_sql(
    table: str, col_a: str, col_b: str, round_to: int = 6
) -> str:
    return f"""
WITH cont AS (
    SELECT {col_a} AS a, {col_b} AS b, count(*) AS c
    FROM {table}
    WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
    GROUP BY 1, 2
),
ra AS (SELECT a, sum(c) AS ra FROM cont GROUP BY a),
cb AS (SELECT b, sum(c) AS cb FROM cont GROUP BY b),
parts AS (
    SELECT sum(c) AS n,
           sum(CAST(c AS DOUBLE) * c / (CAST(ra AS DOUBLE) * cb)) AS s,
           count(DISTINCT cont.a) AS r,
           count(DISTINCT cont.b) AS k
    FROM cont JOIN ra USING (a) JOIN cb USING (b)
)
SELECT CAST(n AS BIGINT) AS n,
       CAST((r - 1) * (k - 1) AS BIGINT) AS dof,
       round(n * (s - 1.0), {round_to}) AS chi2,
       round(sqrt(n * (s - 1.0)
                  / (n * CAST(least(r - 1, k - 1) AS DOUBLE))),
             {round_to}) AS cramers_v
FROM parts
"""


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Shannon mutual information in nats: one row
    (n, h_a, h_b, h_ab, mi) with ``mi = h_a + h_b - h_ab`` — computed
    from the same single contingency pass as :func:`chi_square`
    (entropies are sums over observed cells only; empty cells
    contribute 0 by the ``0 ln 0 = 0`` convention).

    The cell table is checkpointed before fan-out: four consumers
    (n, h_a, h_b, h_ab) would otherwise each replay the DATA-SIZED
    count — four full scans at 100 TB for one category-bounded
    intermediate."""
    cont = _contingency(df, col_a, col_b).localCheckpoint(eager=False)
    n = cont.agg(F.sum("c").alias("n"))

    def _h():
        p = F.col("c").cast("double") / F.col("n")
        return -F.sum(p * F.log(p))

    ha = (
        cont.groupBy("a").agg(F.sum("c").alias("c"))
        .crossJoin(F.broadcast(n))
        .agg(_h().alias("h_a"))
    )
    hb = (
        cont.groupBy("b").agg(F.sum("c").alias("c"))
        .crossJoin(F.broadcast(n))
        .agg(_h().alias("h_b"))
    )
    hab = cont.crossJoin(F.broadcast(n)).agg(_h().alias("h_ab"))
    out = (
        n.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .crossJoin(F.broadcast(hab))
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.round("h_a", round_to).alias("h_a"),
        F.round("h_b", round_to).alias("h_b"),
        F.round("h_ab", round_to).alias("h_ab"),
        F.round(
            F.col("h_a") + F.col("h_b") - F.col("h_ab"), round_to
        ).alias("mi"),
    )


def mutual_information_oracle_sql(
    table: str, col_a: str, col_b: str, round_to: int = 6
) -> str:
    return f"""
WITH cont AS (
    SELECT {col_a} AS a, {col_b} AS b, count(*) AS c
    FROM {table}
    WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
    GROUP BY 1, 2
),
n AS (SELECT sum(c) AS n FROM cont),
ha AS (
    SELECT -sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS h_a
    FROM (SELECT a, sum(c) AS c FROM cont GROUP BY a), n
),
hb AS (
    SELECT -sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS h_b
    FROM (SELECT b, sum(c) AS c FROM cont GROUP BY b), n
),
hab AS (
    SELECT -sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS h_ab
    FROM cont, n
)
SELECT CAST(n.n AS BIGINT) AS n,
       round(h_a, {round_to}) AS h_a,
       round(h_b, {round_to}) AS h_b,
       round(h_ab, {round_to}) AS h_ab,
       round(h_a + h_b - h_ab, {round_to}) AS mi
FROM n, ha, hb, hab
"""


# Benford expected first-digit fractions log10(1 + 1/d), d = 1..9.
_BENFORD = [0.0] + [0.3010299956639812, 0.17609125905568124,
                    0.12493873660829993, 0.09691001300805642,
                    0.07918124604762482, 0.06694678963061322,
                    0.05799194697768673, 0.05115252244738129,
                    0.04575749056067514]


def benford_audit(
    df: DataFrame,
    col: str,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """First-significant-digit distribution of positive ``col`` vs
    Benford's law: 9 rows (digit, n_d, obs_frac, exp_frac, abs_dev).

    Digit extraction is EXACT-INTEGER: ``round(x * scale)`` (scale =
    10^decimals of the column, so the product is integral up to float
    noise) casts to BIGINT and the first character of its decimal
    string is the digit — multiplying by a power of 10 never changes
    the leading significant digit, and integer-to-string is
    engine-portable where ``floor(log10(x))`` is not.

    Plan: one 9-bucket count shuffle; everything after is a 9-row
    frame.
    """
    d = F.substring(
        F.round(F.col(col) * scale, 0).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(F.col(col).isNotNull() & (F.col(col) > 0))
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_d"))
    )
    spine = counts.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit"),
        F.element_at(
            F.array(*[F.lit(x) for x in _BENFORD[1:]]), F.col("id").cast("int")
        ).alias("exp_raw"),
    )
    tot = counts.agg(F.sum("n_d").alias("n"))
    return (
        spine.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_d", F.lit(0)).cast("long").alias("n_d"),
            F.round(
                F.coalesce("n_d", F.lit(0)).cast("double") / F.col("n"),
                round_to,
            ).alias("obs_frac"),
            F.round("exp_raw", round_to).alias("exp_frac"),
            F.round(
                F.abs(
                    F.coalesce("n_d", F.lit(0)).cast("double") / F.col("n")
                    - F.col("exp_raw")
                ),
                round_to,
            ).alias("abs_dev"),
        )
    )


def benford_oracle_sql(
    table: str, col: str, scale: int = 100, round_to: int = 6
) -> str:
    return f"""
WITH counts AS (
    SELECT CAST(substr(CAST(CAST(round({col} * {scale}) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           count(*) AS n_d
    FROM {table}
    WHERE {col} IS NOT NULL AND {col} > 0
    GROUP BY 1
),
spine AS (
    SELECT CAST(d AS INTEGER) AS digit,
           log10(1.0 + 1.0 / d) AS exp_raw
    FROM unnest(range(1, 10)) AS t(d)
),
tot AS (SELECT sum(n_d) AS n FROM counts)
SELECT spine.digit,
       CAST(coalesce(counts.n_d, 0) AS BIGINT) AS n_d,
       round(CAST(coalesce(counts.n_d, 0) AS DOUBLE) / tot.n,
             {round_to}) AS obs_frac,
       round(exp_raw, {round_to}) AS exp_frac,
       round(abs(CAST(coalesce(counts.n_d, 0) AS DOUBLE) / tot.n
                 - exp_raw), {round_to}) AS abs_dev
FROM spine LEFT JOIN counts USING (digit) CROSS JOIN tot
"""


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test between two named groups: one
    row (n_a, n_b, mean_a, mean_b, t_stat, dof) — the A/B-test
    primitive ("did the metric move, given unequal group sizes and
    variances").  ``dof`` is the Welch–Satterthwaite approximation; for
    the dof ranges real A/B tests produce (hundreds+) the 5% two-sided
    critical value is ~1.96, so callers can threshold t_stat directly
    without a p-value lookup.

    Plan: one conditional-aggregation pass (count/avg/var per group in
    the SAME scan), one 1-row combine.  Degenerate inputs (a group
    empty or single-row) yield NULL t_stat, not a crash.
    """
    va = F.when(F.col(group_col) == group_a, F.col(value_col).cast("double"))
    vb = F.when(F.col(group_col) == group_b, F.col(value_col).cast("double"))
    agg = df.agg(
        F.count(va).alias("n_a"),
        F.count(vb).alias("n_b"),
        F.avg(va).alias("mean_a"),
        F.avg(vb).alias("mean_b"),
        F.var_samp(va).alias("__va"),
        F.var_samp(vb).alias("__vb"),
    )
    sa = F.try_divide(F.col("__va"), F.col("n_a"))
    sb = F.try_divide(F.col("__vb"), F.col("n_b"))
    se = F.sqrt(sa + sb)
    t = F.when(se > 0, F.try_divide(F.col("mean_a") - F.col("mean_b"), se))
    dof = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (sa + sb > 0),
        F.try_divide(
            (sa + sb) * (sa + sb),
            F.try_divide(sa * sa, F.col("n_a") - 1)
            + F.try_divide(sb * sb, F.col("n_b") - 1),
        ),
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("mean_a", round_to).alias("mean_a"),
        F.round("mean_b", round_to).alias("mean_b"),
        F.round(t, round_to).alias("t_stat"),
        F.round(dof, round_to).alias("dof"),
    )


def welch_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    return f"""
WITH agg AS (
    SELECT count(CASE WHEN {group_col} = '{group_a}'
                      THEN {value_col} END) AS n_a,
           count(CASE WHEN {group_col} = '{group_b}'
                      THEN {value_col} END) AS n_b,
           avg(CASE WHEN {group_col} = '{group_a}'
                    THEN CAST({value_col} AS DOUBLE) END) AS mean_a,
           avg(CASE WHEN {group_col} = '{group_b}'
                    THEN CAST({value_col} AS DOUBLE) END) AS mean_b,
           var_samp(CASE WHEN {group_col} = '{group_a}'
                         THEN CAST({value_col} AS DOUBLE) END) AS va,
           var_samp(CASE WHEN {group_col} = '{group_b}'
                         THEN CAST({value_col} AS DOUBLE) END) AS vb
    FROM {table}
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(mean_a, {round_to}) AS mean_a,
       round(mean_b, {round_to}) AS mean_b,
       round(CASE WHEN va / n_a + vb / n_b > 0
                  THEN (mean_a - mean_b) / sqrt(va / n_a + vb / n_b)
             END, {round_to}) AS t_stat,
       round(CASE WHEN n_a > 1 AND n_b > 1 AND va / n_a + vb / n_b > 0
                  THEN pow(va / n_a + vb / n_b, 2)
                       / (pow(va / n_a, 2) / (n_a - 1)
                          + pow(vb / n_b, 2) / (n_b - 1))
             END, {round_to}) AS dof
FROM agg
"""


def anova_f(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA F-statistic across ALL groups: one row
    (k, n, df_between, df_within, f_stat) — the k-group generalization
    of :func:`welch_t_test` ("does the metric differ across sources /
    variants / shards at all").

    ``F = (SSB / (k-1)) / (SSW / (n-k))`` with the sums of squares
    from per-group (count, mean, var) moments::

        SSB = sum_g n_g (mean_g - grand_mean)^2
        SSW = sum_g (n_g - 1) var_g

    Plan: one map-side-combined groupBy builds the k-row moment table;
    everything after is a k-row combine.  Degenerate inputs (k < 2 or
    n <= k or zero within-variance) yield NULL f_stat.
    """
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.avg(F.col(value_col).cast("double")).alias("mg"),
            F.var_samp(F.col(value_col).cast("double")).alias("vg"),
        )
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        (F.sum(F.col("ng") * F.col("mg")) / F.sum("ng")).alias("gm"),
    )
    parts = g.crossJoin(F.broadcast(tot)).agg(
        F.first("k").alias("k"),
        F.first("n").alias("n"),
        F.sum(
            F.col("ng") * (F.col("mg") - F.col("gm")) * (F.col("mg") - F.col("gm"))
        ).alias("ssb"),
        F.sum((F.col("ng") - 1) * F.coalesce(F.col("vg"), F.lit(0.0))).alias(
            "ssw"
        ),
    )
    f = F.when(
        (F.col("k") > 1) & (F.col("n") > F.col("k")) & (F.col("ssw") > 0),
        F.try_divide(
            F.col("ssb") / (F.col("k") - 1),
            F.col("ssw") / (F.col("n") - F.col("k")),
        ),
    )
    return parts.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("n") - F.col("k")).cast("long").alias("df_within"),
        F.round(f, round_to).alias("f_stat"),
    )


def anova_oracle_sql(
    table: str, group_col: str, value_col: str, round_to: int = 6
) -> str:
    return f"""
WITH g AS (
    SELECT {group_col} AS grp, count(*) AS ng,
           avg(CAST({value_col} AS DOUBLE)) AS mg,
           var_samp(CAST({value_col} AS DOUBLE)) AS vg
    FROM {table} WHERE {value_col} IS NOT NULL
    GROUP BY 1
),
tot AS (
    SELECT count(*) AS k, sum(ng) AS n,
           sum(ng * mg) / sum(ng) AS gm
    FROM g
),
parts AS (
    SELECT any_value(k) AS k, any_value(n) AS n,
           sum(ng * (mg - gm) * (mg - gm)) AS ssb,
           sum((ng - 1) * coalesce(vg, 0.0)) AS ssw
    FROM g CROSS JOIN tot
)
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(n - k AS BIGINT) AS df_within,
       round(CASE WHEN k > 1 AND n > k AND ssw > 0
                  THEN (ssb / (k - 1)) / (ssw / (n - k)) END,
             {round_to}) AS f_stat
FROM parts
"""


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: one row
    (n_a, n_b, ks_stat) with ``ks_stat = max over pooled values of
    |ECDF_a(v) - ECDF_b(v)|`` — the distribution-equality test that
    sees SHAPE differences the mean-based tests (:func:`welch_t_test`,
    :func:`anova_f`) miss.  Threshold: reject equality at 5% when
    ``ks_stat > 1.358 * sqrt((n_a+n_b)/(n_a*n_b))``.

    Scale shape: the pooled sample aggregates to one row per DISTINCT
    value (map-side combined), then the ECDFs are cumulative counts via
    ``operators.pack.global_running_sum`` — the range-shuffle +
    per-partition-window + broadcast-prefix scan, NEVER a
    single-partition window over the data (Spark's unpartitioned
    ``ORDER BY`` window is the trap here).  Two scan passes over the
    distinct-value table, one 1-row max combine.

    Cross-engine determinism: every ECDF value is an exact-integer
    ratio, so the max is over identical doubles on any engine.
    """
    from multi_sensor_data_pipeline_for_robotics__spark.operators.pack import (
        global_running_sum,
    )

    sub = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(value_col).cast("double").alias("__v"),
        (F.col(group_col) == group_a).alias("__isa"),
    )
    pv = sub.groupBy("__v").agg(
        F.sum(F.when(F.col("__isa"), 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(~F.col("__isa"), 1).otherwise(0)).alias("__cb"),
    )
    r = global_running_sum(pv, ["__v"], F.col("__ca"), "__cum_a")
    r = global_running_sum(r, ["__v"], F.col("__cb"), "__cum_b")
    tot = pv.agg(
        F.sum("__ca").alias("n_a"), F.sum("__cb").alias("n_b")
    )
    d = F.abs(
        F.col("__cum_a").cast("double") / F.col("n_a")
        - F.col("__cum_b").cast("double") / F.col("n_b")
    )
    out = (
        r.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max(d).alias("__d"),
        )
    )
    return out.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("__d")),
            round_to,
        ).alias("ks_stat"),
    )


def ks_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    return f"""
WITH sub AS (
    SELECT CAST({value_col} AS DOUBLE) AS v,
           {group_col} = '{group_a}' AS isa
    FROM {table}
    WHERE {value_col} IS NOT NULL
      AND {group_col} IN ('{group_a}', '{group_b}')
),
pv AS (
    SELECT v, sum(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS cb
    FROM sub GROUP BY v
),
cum AS (
    SELECT v,
           sum(ca) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_a,
           sum(cb) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_b
    FROM pv
),
tot AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM pv)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(CASE WHEN n_a > 0 AND n_b > 0 THEN
           (SELECT max(abs(CAST(cum_a AS DOUBLE) / n_a
                           - CAST(cum_b AS DOUBLE) / n_b)) FROM cum)
       END, {round_to}) AS ks_stat
FROM tot
"""


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: one row
    (n_a, n_b, u_stat, z_stat) — the nonparametric two-sample location
    test (:func:`welch_t_test` without the normality assumption;
    :func:`ks_test` catches shape, this catches shift).  ``z_stat``
    uses the normal approximation with the standard tie correction;
    |z| > 1.96 rejects at 5% two-sided.

    Rank arithmetic is EXACT: with per-distinct-value counts
    ``(ca, cb)`` and the prefix count ``start`` of strictly-smaller
    rows, the tie-group midrank is ``start + (t+1)/2`` — summed as
    ``2*midrank`` (an integer) in decimal(38,0), so the rank sum never
    depends on float ordering.  Prefix counts come from the same
    range-shuffle scan as :func:`ks_test` — no single-partition
    window.  Only z touches doubles.
    """
    from multi_sensor_data_pipeline_for_robotics__spark.operators.pack import (
        global_running_sum,
    )

    sub = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(value_col).cast("double").alias("__v"),
        (F.col(group_col) == group_a).alias("__isa"),
    )
    pv = sub.groupBy("__v").agg(
        F.sum(F.when(F.col("__isa"), 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(~F.col("__isa"), 1).otherwise(0)).alias("__cb"),
    )
    t = (F.col("__ca") + F.col("__cb")).alias("__t")
    r = global_running_sum(
        pv.withColumn("__t", t), ["__v"], F.col("__t"), "__cum"
    )
    # start = rows strictly below this value; 2*midrank = 2*start + t + 1
    two_mid = (
        (F.col("__cum") - F.col("__t")).cast("decimal(28,0)") * 2
        + F.col("__t")
        + 1
    )
    parts = r.agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
        F.sum(F.col("__ca").cast("decimal(28,0)") * two_mid).alias("__r2a"),
        F.sum(
            F.col("__t").cast("double")
            * F.col("__t")
            * F.col("__t")
            - F.col("__t")
        ).alias("__tie3"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    u = (
        F.col("__r2a").cast("double") / 2.0
        - na.cast("double") * (na + 1) / 2.0
        - na.cast("double") * nb / 2.0
    )  # centered U (U - mean); mean = na*nb/2
    var = (
        na.cast("double")
        * nb
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("__tie3")
            / (n.cast("double") * (n - 1))
        )
    )
    z = F.when(var > 0, F.try_divide(u, F.sqrt(var)))
    return parts.select(
        "n_a",
        "n_b",
        F.round(
            F.col("__r2a").cast("double") / 2.0
            - na.cast("double") * (na + 1) / 2.0,
            round_to,
        ).alias("u_stat"),
        F.round(z, round_to).alias("z_stat"),
    )


def mann_whitney_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    return f"""
WITH sub AS (
    SELECT CAST({value_col} AS DOUBLE) AS v,
           {group_col} = '{group_a}' AS isa
    FROM {table}
    WHERE {value_col} IS NOT NULL
      AND {group_col} IN ('{group_a}', '{group_b}')
),
pv AS (
    SELECT v, sum(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS cb,
           sum(1) AS tt
    FROM sub GROUP BY v
),
cum AS (
    SELECT v, ca, cb, ca + cb AS t,
           sum(ca + cb) OVER (ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
    FROM pv
),
parts AS (
    SELECT CAST(sum(ca) AS BIGINT) AS n_a,
           CAST(sum(cb) AS BIGINT) AS n_b,
           sum(CAST(ca AS DECIMAL(28,0))
               * (CAST(c - t AS DECIMAL(28,0)) * 2 + t + 1)) AS r2a,
           sum(CAST(t AS DOUBLE) * t * t - t) AS tie3
    FROM cum
)
SELECT n_a, n_b,
       round(CAST(r2a AS DOUBLE) / 2.0
             - CAST(n_a AS DOUBLE) * (n_a + 1) / 2.0, {round_to}) AS u_stat,
       round(CASE WHEN CAST(n_a AS DOUBLE) * n_b / 12.0
                       * (CAST(n_a + n_b + 1 AS DOUBLE)
                          - tie3 / (CAST(n_a + n_b AS DOUBLE)
                                    * (n_a + n_b - 1))) > 0
                  THEN (CAST(r2a AS DOUBLE) / 2.0
                        - CAST(n_a AS DOUBLE) * (n_a + 1) / 2.0
                        - CAST(n_a AS DOUBLE) * n_b / 2.0)
                       / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                              * (CAST(n_a + n_b + 1 AS DOUBLE)
                                 - tie3 / (CAST(n_a + n_b AS DOUBLE)
                                           * (n_a + n_b - 1))))
             END, {round_to}) AS z_stat
FROM parts
"""
