"""Analytics operators — the reference's whole-table statistics
(SURVEY §2.4) plus group-by/join analytics the rebuild adds for scale
work.

Reference parity:
  O19 row count                      len(df)            app.py:108 etc.
  O20 pairwise Pearson correlation   df.corr()          app.py:416-423
  O21 summary statistics             df.describe()      app.py:464-468
  O24 quantile scalars               quantile(q)        app.py:125-130
  O25 min/max scalars                index min/max      app.py:155-156

Scale notes:
  - ``corr_matrix`` computes all pairs in ONE aggregation job
    (k*(k-1)/2 ``F.corr`` expressions -> single partial-agg pass, no
    shuffle of the data, scalars only to the driver) instead of one job
    per pair.
  - ``summary_stats`` uses exact percentiles (``F.percentile``, linear
    interpolation — pandas/DuckDB-compatible) computed alongside the
    moments in the same single pass per column set.
  - Floating-point note: cross-engine double aggregation differs in the
    last ulp because summation order differs; ``round_to`` (default 6
    decimal digits) makes results comparable with the DuckDB oracle.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import numeric_columns
from multi_sensor_data_pipeline_for_robotics__spark.functions.timeutil import ts_us


def row_count(df: DataFrame) -> int:
    """O19 — ``len(df)``."""
    return df.count()


def minmax(df: DataFrame, col: str) -> DataFrame:
    """O25 — min/max scalars of one column, one partial-agg job."""
    return df.agg(F.min(col).alias("min_" + col), F.max(col).alias("max_" + col))


def _bq(name: str) -> str:
    """Backtick-quote a column name for interpolation into SQL text —
    non-identifier names (spaces, hyphens, dots, reserved words) parse
    as references instead of expressions; embedded backticks double."""
    return "`" + name.replace("`", "``") + "`"


def _sq(s: str) -> str:
    """Single-quoted SQL string literal escape."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def corr_matrix(
    df: DataFrame, cols: list[str] | None = None, round_to: int | None = 6
) -> DataFrame:
    """O20 (app.py:416-423) — tidy pairwise Pearson correlation.

    Output: one row per unordered column pair ``(col_a, col_b, corr)``,
    ``col_a < col_b`` lexicographically... computed as a single
    aggregation: every ``F.corr`` pair is a partial aggregate over one
    scan, so the data is read once and never shuffled (scalar results
    only). The k x k matrix shape is a driver-side pivot of this tidy
    frame if a caller wants it.
    """
    cols = cols or numeric_columns(df)
    pairs = list(combinations(sorted(cols), 2))
    # Pearson from moment sums with try_divide: a zero-variance column
    # yields NULL (like DuckDB/pandas) instead of the DIVIDE_BY_ZERO
    # error Spark's builtin corr raises under ANSI mode; pairwise-
    # complete rows only (pandas .corr() semantics). Double sums — the
    # builtin corr is equally order-dependent, and decimal moment sums
    # cost ~15x (BigDecimal per row); round_to absorbs the ulps.
    # one parsed-SQL struct per pair instead of 6 Column builds per pair
    # (and one explode expr instead of a struct-array Column tree):
    # identical expressions/values, ~3x cheaper query construction —
    # driver-side py4j chatter was most of this operator's bench wall
    # (r13 optimization; guide §7.3 driver-work class)
    aggs = []
    for a, b in pairs:
        qa, qb = _bq(a), _bq(b)
        both = f"{qa} IS NOT NULL AND {qb} IS NOT NULL"
        xa = f"CAST(CASE WHEN {both} THEN {qa} END AS DOUBLE)"
        yb = f"CAST(CASE WHEN {both} THEN {qb} END AS DOUBLE)"
        aggs.append(
            F.expr(
                f"struct(count(CASE WHEN {both} THEN 1 END) AS n,"
                f" sum({xa}) AS sx, sum({yb}) AS sy,"
                f" sum({xa} * {xa}) AS sxx, sum({yb} * {yb}) AS syy,"
                f" sum({xa} * {yb}) AS sxy)"
            ).alias(f"{a}__{b}")
        )
    row = df.agg(*aggs)
    structs = []
    for a, b in pairs:
        k = _bq(f"{a}__{b}")
        n = f"CAST({k}.n AS DOUBLE)"
        corr = (
            f"try_divide({n} * {k}.sxy - {k}.sx * {k}.sy,"
            f" sqrt({n} * {k}.sxx - {k}.sx * {k}.sx)"
            f" * sqrt({n} * {k}.syy - {k}.sy * {k}.sy))"
        )
        structs.append(
            f"struct('{_sq(a)}' AS col_a, '{_sq(b)}' AS col_b, {corr} AS corr)"
        )
    stacked = row.select(
        F.expr(f"explode(array({', '.join(structs)}))").alias("r")
    ).select("r.col_a", "r.col_b", "r.corr")
    if round_to is not None:
        stacked = stacked.withColumn("corr", F.round("corr", round_to))
    return stacked


def summary_stats(
    df: DataFrame, cols: list[str] | None = None, round_to: int | None = 6
) -> DataFrame:
    """O21 (app.py:464-468) — ``describe()`` with EXACT percentiles.

    One row per column: count, mean, stddev (sample), min, 25%, 50%,
    75%, max. ``df.summary()`` uses approximate percentiles; for oracle
    parity we use ``F.percentile`` (exact, linear interpolation) — all
    columns' stats in a single aggregation job.

    Determinism: mean and stddev are derived from EXACT decimal sums
    (sum x, sum x²) so the result is independent of partitioning and
    engine summation order — double-sum results differ in the last ulps
    between runs, which matters when the output is hash-compared.
    """
    cols = cols or numeric_columns(df)
    dec = "decimal(38,12)"
    # parsed-SQL struct per column instead of 6 Column builds per column
    # (same expressions — double literals spelled 0.25D etc. so they
    # parse as DOUBLE, not DECIMAL): r13 driver-build-time optimization,
    # values bit-identical (oracle-checked)
    aggs = [
        F.expr(
            f"struct(count({_bq(c)}) AS cnt, sum(CAST({_bq(c)} AS {dec})) AS s,"
            f" sum(CAST(({_bq(c)} * {_bq(c)}) AS {dec})) AS ss, min({_bq(c)}) AS mn,"
            f" percentile({_bq(c)}, array(0.25D, 0.5D, 0.75D)) AS q,"
            f" max({_bq(c)}) AS mx)"
        ).alias(f"{c}__")
        for c in cols
    ]
    row = df.agg(*aggs)
    structs = []
    for c in cols:
        k = _bq(f"{c}__")
        n = f"CAST({k}.cnt AS DOUBLE)"
        s = f"CAST({k}.s AS DOUBLE)"
        ss = f"CAST({k}.ss AS DOUBLE)"
        structs.append(
            f"struct('{_sq(c)}' AS column, CAST({k}.cnt AS LONG) AS count,"
            f" {s} / {n} AS mean,"
            f" sqrt(({ss} - {s} * {s} / {n}) / ({n} - 1)) AS stddev,"
            f" CAST({k}.mn AS DOUBLE) AS min,"
            f" CAST({k}.q[0] AS DOUBLE) AS p25,"
            f" CAST({k}.q[1] AS DOUBLE) AS p50,"
            f" CAST({k}.q[2] AS DOUBLE) AS p75,"
            f" CAST({k}.mx AS DOUBLE) AS max)"
        )
    out = row.select(
        F.expr(f"explode(array({', '.join(structs)}))").alias("r")
    ).select("r.*")
    if round_to is not None:
        for c in ["mean", "stddev", "min", "p25", "p50", "p75", "max"]:
            out = out.withColumn(c, F.round(c, round_to))
    return out


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary (beyond-reference group-by agg).

    Money aggregates go through DECIMAL so sums are exact and
    order-independent — double summation order differs between engines
    and between Spark partitionings of the SAME data, so decimal is the
    scale-safe choice for auditable money totals.
    """
    dec = "decimal(30,6)"
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    agged = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(dec)).alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(dec)).alias("sum_base_price"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
        ).alias("sum_disc_price"),
        F.sum(
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).cast(dec)
        ).alias("sum_charge"),
        F.sum(F.col("l_discount").cast(dec)).alias("__sum_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    # means derive from the exact decimal sums -> engine/partitioning
    # independent (see summary_stats note)
    return (
        agged.withColumn(
            "avg_qty", F.round(F.col("sum_qty").cast("double") / F.col("count_order"), 6)
        )
        .withColumn(
            "avg_price",
            F.round(F.col("sum_base_price").cast("double") / F.col("count_order"), 6),
        )
        .withColumn(
            "avg_disc",
            F.round(F.col("__sum_disc").cast("double") / F.col("count_order"), 6),
        )
        .drop("__sum_disc")
        .orderBy("l_returnflag", "l_linestatus")
    )


def running_totals(
    orders: DataFrame, k_customers: int | None = None, round_to: int = 4
) -> DataFrame:
    """Windowed running revenue per customer (beyond-reference window
    analytics): orders ranked by date within each customer, with the
    cumulative total up to and including each order.

    One shuffle on the partition key; windows evaluate partition-local
    after a sort — no global sort, no driver loop. Cumulative sums run
    in DECIMAL so the running value is exact under any partitioning.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    out = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double"),
            round_to,
        ).alias("running_revenue"),
    )
    if k_customers is not None:
        out = out.filter(F.col("o_custkey") < k_customers)
    return out


def revenue_rollup(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    round_to: int = 4,
) -> DataFrame:
    """ROLLUP revenue by (region, nation) with subtotal and grand-total
    rows (beyond-reference grouping-set analytics).

    The dimension chain customer→nation→region is broadcast (tiny);
    orders shuffles once on the grouping keys. The rollup is one pass —
    Catalyst expands grouping sets without re-scanning the fact table.
    """
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    joined = orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast("double"),
                round_to,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def top_per_group(
    events: DataFrame, k: int = 3, round_to: int = 6
) -> DataFrame:
    """Top-k rows per group via ranked window (beyond-reference):
    highest-value events per event type, deterministic tie-break on id."""
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.select(
            "event_type",
            "event_id",
            F.round("value", round_to).alias("value"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def local_supplier_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5-shaped six-table join: revenue per nation where customer
    and supplier are co-national, one region, one order-date year.

    Join tree: region→nation are broadcast dimensions (fixed 5/25
    rows); supplier⋈dims is NOT hinted — supplier grows with SF, so the
    choice is left to Catalyst/AQE, which broadcasts while it fits and
    falls back to shuffle join beyond the threshold. The fact-side
    shuffles are lineitem⋈orders and the customer equi-join with the
    co-nationality predicate folded into the join condition so no
    post-join filter rescans.
    """
    dec = "decimal(30,6)"
    dims = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            supplier.s_nationkey == nation.n_nationkey,
        ).select("s_suppkey", "s_nationkey", "n_name")
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    joined = (
        lineitem.join(dims, lineitem.l_suppkey == dims.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(
            customer,
            (F.col("o_custkey") == customer.c_custkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
                ).cast("double"),
                4,
            ).alias("revenue")
        )
    )


def revenue_forecast_delta(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-shaped whole-scan filter + single aggregate — every
    predicate pushes into the parquet scan (DataFilters), the agg is one
    partial-combine pass with zero shuffle of row data."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < max_qty)
    )
    return li.agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(30,6)")
            ).cast("double"),
            4,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization (beyond-reference): events of one user
    separated by more than ``gap_minutes`` start a new session.

    The classic two-window plan: a boundary flag from ``lag`` then a
    cumulative sum to number sessions — ONE shuffle on the user key,
    both windows reuse the same partitioning (no second exchange).
    Output: one row per session with span and event count.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    boundary = (
        ts_us(F.col(ts_col)) - ts_us(F.lag(ts_col).over(w))
        > gap_us
    )
    numbered = events.select(
        user_col,
        ts_col,
        F.sum(F.when(boundary, 1).otherwise(0))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_seq"),
    )
    return (
        numbered.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("session_seq", F.col("session_seq").cast("long"))
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key into maximal
    spans — the gaps-and-islands plan (beyond-reference): sensor uptime
    segments, user activity windows, validity ranges.

    An interval starts a new island iff its start exceeds the running
    max of all PREVIOUS ends (strictly: touching intervals, where
    ``start == prev_end``, merge). Two windows over ONE partitioning of
    the key (no second exchange), then a groupBy on (key, island):

        prev_max_end = max(end) OVER (key ORDER BY start, end
                                      ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)
        island       = running count of (start > prev_max_end)

    The running max — not ``lag(end)`` — is what makes nested
    intervals correct: [0,10) followed by [2,3) then [5,20) is ONE
    island even though [5,20) starts after [2,3) ends.

    Output: key_cols + (span_start, span_end, n_intervals). Partition
    sizes are per-key interval counts — the same bound sessionize
    lives with; keys hot enough to break that belong in a pre-split.
    """
    from pyspark.sql import Window as W

    w_order = W.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_end = F.max(end_col).over(
        w_order.rowsBetween(W.unboundedPreceding, -1)
    )
    boundary = prev_end.isNull() | (F.col(start_col) > prev_end)
    numbered = df.select(
        *key_cols,
        start_col,
        end_col,
        F.sum(F.when(boundary, 1).otherwise(0))
        .over(w_order.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("__island"),
    )
    return (
        numbered.groupBy(*key_cols, "__island")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__island")
    )


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped join+agg+top-k (beyond-reference).

    The customer dimension is broadcast (small side); lineitem→orders is
    the one real shuffle. Deterministic top-k: revenue DESC then key ASC.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    dec = "decimal(30,6)"
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
            ).alias("revenue")
        )
    )
    return joined.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(k)


def customers_without_priority_orders(
    customer: DataFrame, orders: DataFrame, priority: str = "1-URGENT"
) -> DataFrame:
    """Anti join (beyond-reference §2.6 gap): customers with NO order of
    the given priority — the NOT EXISTS shape.

    ``left_anti`` keeps only the join keys on the wire; the priority
    filter is pushed into the orders parquet scan before the join, so
    the probe side shrinks to the matching fraction. AQE picks broadcast
    vs shuffled anti by runtime size — no hint needed for a
    SF-proportional build side.
    """
    probes = orders.filter(F.col("o_orderpriority") == priority).select("o_custkey")
    return customer.join(
        probes, customer.c_custkey == probes.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def parts_shipped_in_window(
    part: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1995-06-01",
    date_hi: str = "1995-09-01",
) -> DataFrame:
    """Semi join (beyond-reference §2.6 gap): parts with at least one
    lineitem shipped inside [date_lo, date_hi) — the EXISTS shape.

    ``left_semi`` deduplicates the probe side during the join (no
    distinct pre-pass needed) and ships only l_partkey after the pushed
    shipdate range scan filter.
    """
    probes = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
    ).select("l_partkey")
    return part.join(
        probes, part.p_partkey == probes.l_partkey, "left_semi"
    ).select("p_partkey", "p_name", "p_brand", "p_retailprice")


def revenue_grouping_sets(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    round_to: int = 4,
) -> DataFrame:
    """GROUPING SETS proper (beyond-reference): revenue by
    ((region, priority), (region), (priority)) — a set combination that
    neither ROLLUP nor CUBE expresses (no grand total, both one-dim
    margins). One pass over the fact table: Catalyst expands the sets
    with an Expand node, aggregation stays map-side combinable.

    ``grouping()`` flags disambiguate real NULLs from subtotal rows —
    required for a stable cross-engine hash.
    """
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    joined = orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
    return joined.groupingSets(
        [["r_name", "o_orderpriority"], ["r_name"], ["o_orderpriority"]],
        "r_name",
        "o_orderpriority",
    ).agg(
        F.grouping("r_name").cast("long").alias("g_region"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast("double"),
            round_to,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def segment_distinct_stats(
    customer: DataFrame, orders: DataFrame, round_to: int = 4
) -> DataFrame:
    """Multi-distinct aggregation (beyond-reference): per market segment,
    exact distinct buyers and distinct priorities alongside plain
    count/sum — the shape Catalyst executes with one Expand over the
    distinct columns (single fact-table scan, no per-distinct re-scan).
    """
    cust = customer.select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.countDistinct("o_custkey").alias("n_buyers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast("double"),
            round_to,
        ).alias("revenue"),
    )


def group_percentiles(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    probs: tuple = (0.5, 0.9, 0.99),
    round_to: int = 6,
) -> DataFrame:
    """Exact per-group percentiles (beyond-reference): ``F.percentile``
    with linear interpolation — bit-comparable to DuckDB's
    ``quantile_cont`` (same definition), unlike ``percentile_approx``.

    One hash-aggregate pass; all requested probabilities are computed by
    a single percentile aggregate per group (one sort of each group's
    values, not one per probability). Exact percentiles need the group's
    values together — the deliberate trade vs the t-digest sketch path
    (``approx_distinct_stats``) which is mergeable but approximate.
    """
    pcts = F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs]))
    cols = [
        F.round(F.element_at(F.col("__p"), i + 1), round_to).alias(
            f"p{int(round(p * 100))}"
        )
        for i, p in enumerate(probs)
    ]
    return (
        events.groupBy(group_col)
        .agg(pcts.alias("__p"), F.count(F.lit(1)).alias("n"))
        .select(group_col, *cols, "n")
    )


def revenue_cube(orders: DataFrame, round_to: int = 4) -> DataFrame:
    """CUBE over (priority, status) — all four grouping combinations in
    one Expand pass (completes the grouping-set family next to
    ``revenue_rollup`` and ``revenue_grouping_sets``)."""
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast("double"),
            round_to,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def debounce_events(
    events: DataFrame,
    window_ms: int = 300_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Debounce (beyond-reference): collapse bursts — keep the FIRST
    event per (user, type) per tumbling window, count the suppressed
    rest. The standard alerting/telemetry duplicate-suppression shape.

    First-occurrence selection is ``min(struct(ts, id))`` — algebraic,
    map-side combinable, no per-key window sort; the tumbling bucket is
    closed-form integer arithmetic on the event time, so the whole plan
    is one hash aggregate over (user, type, bucket).
    """
    bucket = (ts_us(F.col(ts_col)) / (window_ms * 1000)).cast("long")
    first = F.min(F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id")))
    return (
        events.groupBy(
            F.col(user_col),
            F.col(type_col),
            F.timestamp_micros(bucket * (window_ms * 1000)).alias("window_start"),
        )
        .agg(first.alias("__f"), F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            type_col,
            "window_start",
            F.col("__f.id").alias("first_event_id"),
            F.col("__f.ts").alias("first_ts"),
            (F.col("n_events") - 1).alias("n_suppressed"),
        )
    )


def approx_distinct_stats(
    events: DataFrame,
    group_col: str = "event_type",
    rsd: float = 0.02,
) -> DataFrame:
    """Sketch aggregates (beyond-reference, the 100 TB path where exact
    is too expensive): HyperLogLog++ distinct users and an approximate
    median per group. Mergeable sketches — map-side partials combine
    associatively, so cost is one scan regardless of key cardinality.

    DELIBERATELY not oracle-checked (sketches are engine-specific);
    tests assert the HLL estimate lands within its rsd bound of the
    exact count computed by the oracle-green exact path.
    """
    return events.groupBy(group_col).agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_median"),
        F.count(F.lit(1)).alias("n"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    within_minutes: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis (beyond-reference): how many users
    completed step 1, steps 1→2 in order, 1→2→3, ... — the standard
    event-analytics conversion query.

    Plan: ONE aggregation pass computes, per user, the earliest
    timestamp of step k that occurs AFTER their earliest qualifying
    step k-1 — expressed as chained conditional ``min`` aggregates over
    a single groupBy(user), so the cost is one shuffle of (user, type,
    ts) triples regardless of funnel depth. No joins, no windows, no
    per-step passes. ``within_minutes`` bounds the whole funnel span
    from the step-1 time.

    Output: (step long, step_name, users long) — users completing the
    funnel PREFIX ending at that step; monotonically non-increasing.
    """
    t = ts_us(F.col(ts_col))
    per_user = events.filter(F.col(type_col).isin(steps)).groupBy(user_col)
    # earliest step-1 time; then for each later step the earliest
    # occurrence strictly after the previous step's chosen time —
    # computed as nested conditional aggregates: min(ts WHERE type=k AND
    # ts > t_{k-1}) is not directly expressible (t_{k-1} is itself an
    # aggregate), so collect each step's sorted times once and resolve
    # the chain with array functions — per user the arrays hold only
    # that user's step events.
    aggs = [
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == s, t))
        ).alias(f"__t{i}")
        for i, s in enumerate(steps)
    ]
    rows = per_user.agg(*aggs)
    prev = F.array_min("__t0")
    reached = [prev]
    for i in range(1, len(steps)):
        arr = F.col(f"__t{i}")
        p = reached[-1]
        nxt = F.array_min(F.filter(arr, lambda x: x > p))
        reached.append(nxt)
    if within_minutes is not None:
        limit_us = within_minutes * 60 * 1_000_000
        start = reached[0]
        reached = [reached[0]] + [
            F.when(r - start <= limit_us, r) for r in reached[1:]
        ]
    flags = rows.select(
        *[r.isNotNull().cast("int").alias(f"__r{i}") for i, r in enumerate(reached)]
    )
    # a user counts for step k only if every prior step was reached —
    # enforce prefix semantics with a running product of flags
    prefix = []
    acc = F.col("__r0")
    prefix.append(acc)
    for i in range(1, len(steps)):
        acc = acc * F.col(f"__r{i}")
        prefix.append(acc)
    counts = flags.agg(
        *[F.sum(p).cast("long").alias(f"__s{i}") for i, p in enumerate(prefix)]
    )
    out = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("long").alias("step"),
                        F.lit(s).alias("step_name"),
                        F.col(f"__s{i}").alias("users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("x")
    )
    return out.select("x.step", "x.step_name", "x.users")


def retention_cohorts(
    events: DataFrame,
    period_days: int = 7,
    max_periods: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention (beyond-reference): bucket users by their FIRST
    activity period, then count how many are active k periods later —
    the standard retention triangle.

    Plan: one aggregation derives each user's cohort (min ts → period)
    alongside their distinct active periods (collected per user — at
    most ``max_periods`` small ints after the offset filter), then one
    explode + count builds the triangle. Cost: one shuffle of (user,
    period) pairs + one tiny aggregation; no self-joins.

    Output: (cohort long, offset long, users long), offsets 0..max.
    """
    period_us = period_days * 24 * 3600 * 1_000_000
    t = ts_us(F.col(ts_col))
    per_user = events.groupBy(user_col).agg(
        F.floor(F.min(t) / period_us).alias("cohort"),
        F.collect_set(F.floor(t / period_us)).alias("periods"),
    )
    exploded = per_user.select(
        "cohort",
        F.explode(
            F.filter(
                F.transform("periods", lambda p: p - F.col("cohort")),
                lambda o: o <= F.lit(max_periods),
            )
        ).alias("offset"),
    )
    return exploded.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).cast("long").alias("users")
    )


def user_journeys(
    events: DataFrame,
    max_steps: int = 5,
    top_n: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Path analysis (beyond-reference): the most common event-type
    journeys — each user's first ``max_steps`` events in time order,
    joined into a path string, counted across users.

    Determinism note: ``collect_list`` order is partition-dependent, so
    the path is built by collecting (ts, type) STRUCTS and
    ``array_sort``-ing them (struct order = field order, ts first) —
    reproducible under any partitioning; per-user timestamps are unique
    so the sort has no ties. Cost: one groupBy(user) carrying (ts,
    type) pairs, then a count over path strings + TakeOrdered top-n.
    """
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("e")))
    )
    path = F.array_join(
        F.transform(F.slice(pairs, 1, max_steps), lambda s: s["e"]), ">"
    )
    per_user = events.groupBy(user_col).agg(path.alias("path"))
    return (
        per_user.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(top_n)
    )
