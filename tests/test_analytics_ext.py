"""Round-2 analytics extensions: sketch error bounds, debounce
semantics, exact group percentiles."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.plans import analytics as A
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table


def test_approx_distinct_within_declared_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r
        for r in A.approx_distinct_stats(ev, rsd=0.02).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    for etype, n_exact in exact.items():
        est = approx[etype]["approx_users"]
        # HLL++ rsd=0.02 -> 5 sigma slack; deterministic data, so this
        # is a regression pin, not a flaky statistical assertion
        assert abs(est - n_exact) / n_exact < 0.10, (etype, est, n_exact)
    # approx median must land inside the group's value range
    ranges = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for etype, (lo, hi) in ranges.items():
        assert lo <= approx[etype]["approx_median"] <= hi


def test_debounce_keeps_first_per_window(spark):
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        # user 1, one burst: 3 clicks in 10s -> keep first, suppress 2
        (1, 1, "click", t0),
        (2, 1, "click", t0 + dt.timedelta(seconds=5)),
        (3, 1, "click", t0 + dt.timedelta(seconds=10)),
        # same user, next window -> kept
        (4, 1, "click", t0 + dt.timedelta(minutes=6)),
        # different type inside the first window -> its own group
        (5, 1, "view", t0 + dt.timedelta(seconds=2)),
        # different user -> its own group
        (6, 2, "click", t0 + dt.timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(
        [(i, u, ty, ts) for i, u, ty, ts in rows],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {
        (r.user_id, r.event_type, r.first_event_id): r.n_suppressed
        for r in A.debounce_events(df, window_ms=300_000).collect()
    }
    assert got == {
        (1, "click", 1): 2,
        (1, "click", 4): 0,
        (1, "view", 5): 0,
        (2, "click", 6): 0,
    }


def test_group_percentiles_linear_interpolation(spark):
    # 4 values -> p50 = linear interpolation between 2nd and 3rd
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)],
        "event_type string, value double",
    )
    r = A.group_percentiles(df, probs=(0.5, 0.75)).collect()[0]
    assert r["p50"] == pytest.approx(2.5)
    assert r["p75"] == pytest.approx(3.25)
    assert r["n"] == 4


def test_anti_and_semi_join_shapes(spark):
    cust = spark.createDataFrame(
        [(1, "a", "S1"), (2, "b", "S1"), (3, "c", "S2")],
        "c_custkey long, c_name string, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 1, "5-LOW"), (12, 2, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    got = {
        r.c_custkey
        for r in A.customers_without_priority_orders(cust, orders).collect()
    }
    assert got == {2, 3}  # 2 has only LOW orders, 3 has none at all

    part = spark.createDataFrame(
        [(100, "p1", "B1", 1.0), (200, "p2", "B2", 2.0)],
        "p_partkey long, p_name string, p_brand string, p_retailprice double",
    )
    li = spark.createDataFrame(
        [(100, dt.datetime(1995, 7, 1)), (200, dt.datetime(1999, 1, 1))],
        "l_partkey long, l_shipdate timestamp",
    )
    kept = {r.p_partkey for r in A.parts_shipped_in_window(part, li).collect()}
    assert kept == {100}  # 200 shipped outside the window


def test_grouping_sets_flags_disambiguate(spark):
    orders = spark.createDataFrame(
        [(1, 1, "1-URGENT", 10.0), (2, 1, "5-LOW", 20.0)],
        "o_orderkey long, o_custkey long, o_orderpriority string, o_totalprice double",
    )
    cust = spark.createDataFrame([(1, 0)], "c_custkey long, c_nationkey int")
    nation = spark.createDataFrame([(0, "N", 0)], "n_nationkey int, n_name string, n_regionkey int")
    region = spark.createDataFrame([(0, "R")], "r_regionkey int, r_name string")
    rows = A.revenue_grouping_sets(orders, cust, nation, region).collect()
    # sets: (r, prio) x2, (r) x1, (prio) x2 -> 5 rows, no grand total
    assert len(rows) == 5
    assert not any(r.g_region == 1 and r.g_priority == 1 for r in rows)
    region_margin = [r for r in rows if r.g_priority == 1]
    assert len(region_margin) == 1 and region_margin[0].revenue == 30.0


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), t) for u, m, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_prefix_and_order_semantics(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 0, "view"), (1, 5, "click"), (1, 10, "purchase"),
        # user 2: clicked BEFORE viewing -> counts for step 1 only
        (2, 0, "click"), (2, 5, "view"),
        # user 3: view then click, no purchase -> steps 1-2
        (3, 0, "view"), (3, 2, "click"),
        # user 4: purchase only -> no steps
        (4, 0, "purchase"),
        # user 5: view, click, purchase but purchase BEFORE click
        (5, 0, "view"), (5, 10, "purchase"), (5, 20, "click"),
    ]
    got = {
        r.step: (r.step_name, r.users)
        for r in A.funnel_counts(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: ("view", 4), 2: ("click", 3), 3: ("purchase", 1)}


def test_funnel_within_window_cuts_slow_users(spark):
    rows = [
        (1, 0, "view"), (1, 5, "click"),      # fast: within 10 min
        (2, 0, "view"), (2, 30, "click"),     # slow: beyond 10 min
    ]
    got = {
        r.step: r.users
        for r in A.funnel_counts(
            _ev(spark, rows), ["view", "click"], within_minutes=10
        ).collect()
    }
    assert got == {1: 2, 2: 1}


def test_retention_cohort_triangle(spark):
    day = 24 * 60
    rows = [
        # user 1: first week 0, returns weeks 1 and 3
        (1, 0, "view"), (1, 8 * day, "view"), (1, 22 * day, "view"),
        # user 2: first week 0 only
        (2, 1 * day, "view"),
        # user 3: first week 1, returns week 2
        (3, 8 * day, "view"), (3, 15 * day, "view"),
    ]
    rows_out = A.retention_cohorts(
        _ev(spark, rows), period_days=7, max_periods=8
    ).collect()
    # cohort labels are absolute epoch-week numbers; compare relative
    base = min(r.cohort for r in rows_out)
    got = {(r.cohort - base, r.offset): r.users for r in rows_out}
    assert got == {
        (0, 0): 2, (0, 1): 1, (0, 3): 1,
        (1, 0): 1, (1, 1): 1,
    }


def test_user_journeys_order_and_truncation(spark):
    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        (2, 0, "view"), (2, 1, "click"), (2, 2, "purchase"),
        (3, 0, "view"), (3, 1, "error"),
        # user 4: 7 events — path truncates to the first 5
        *[(4, m, "view") for m in range(7)],
    ]
    got = {
        r.path: r.n_users
        for r in A.user_journeys(_ev(spark, rows), max_steps=5).collect()
    }
    assert got == {
        "view>click>purchase": 2,
        "view>error": 1,
        "view>view>view>view>view": 1,
    }
    # partition invariance: same paths after a repartition
    again = {
        r.path: r.n_users
        for r in A.user_journeys(
            _ev(spark, rows).repartition(13), max_steps=5
        ).collect()
    }
    assert again == got


def test_analyze_table_stats(spark):
    """Exact ndv below k, null accounting, and string min/max."""
    import pandas as pd
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        analyze_table,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [1, 2, 2, 3, None],
                "s": ["x", "y", None, None, "x"],
            }
        ).astype({"a": "Int64"})
    )
    got = {r["column"]: r.asDict() for r in analyze_table(df, k=256).collect()}
    assert got["a"]["n_rows"] == 5 and got["a"]["n_null"] == 1
    assert got["a"]["approx_ndv"] == 3.0  # below k -> exact
    assert got["s"]["n_null"] == 2 and got["s"]["approx_ndv"] == 2.0
    assert got["s"]["min_value"] == "x" and got["s"]["max_value"] == "y"
    # typed numeric stats: doubles on numeric columns, NULL otherwise
    assert (got["a"]["num_min"], got["a"]["num_max"]) == (1.0, 3.0)
    assert got["a"]["num_mean"] == 2.0  # (1+2+2+3)/4, nulls excluded
    assert got["s"]["num_min"] is None and got["s"]["num_mean"] is None


def test_analyze_table_ndv_estimate_accuracy(spark, sf_dir):
    """Above k the KMV estimate must land within 3/sqrt(k) of truth."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        analyze_table,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["column"]: r["approx_ndv"]
        for r in analyze_table(li, ["l_orderkey"], k=256).collect()
    }
    true_ndv = li.select("l_orderkey").distinct().count()
    assert abs(got["l_orderkey"] - true_ndv) <= 3.0 / (256 ** 0.5) * true_ndv


def test_scale_features_zscore_and_minmax(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        scale_features,
    )
    import statistics

    vals = [3.0, 7.0, 11.0, 9.0, 5.0, None, 13.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, value double"
    )
    mu = statistics.fmean([v for v in vals if v is not None])
    sd = statistics.stdev([v for v in vals if v is not None])
    got = {
        r["id"]: r["value"]
        for r in scale_features(df, ["value"], ["id"], "zscore").collect()
    }
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] is None
        else:
            assert abs(got[i] - round((v - mu) / sd, 6)) < 1e-9
    mm = {
        r["id"]: r["value"]
        for r in scale_features(df, ["value"], ["id"], "minmax").collect()
    }
    assert mm[0] == 0.0 and mm[6] == 1.0
    # constant column -> NULL, not a divide-by-zero
    const = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, value double")
    out = scale_features(const, ["value"], ["id"], "minmax").collect()
    assert all(r["value"] is None for r in out)


def test_analyze_sketch_merge_law(spark):
    """stats_from_sketches(merge(per-part sketches)) must equal
    analyze_table over the union — including the saturated-KMV ndv
    (k < ndv so the estimator actually engages), nulls, extrema and
    the sum/count-derived mean."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        analyze_sketch,
        analyze_table,
        merge_analyze_sketches,
        stats_from_sketches,
    )

    df = spark.range(3000).select(
        F.col("id").alias("a"),
        F.when(F.col("id") % 7 != 0, (F.col("id") % 500).cast("double"))
        .alias("b"),
        F.concat(F.lit("s"), (F.col("id") % 40).cast("string")).alias("s"),
    )
    want = {
        r["column"]: r.asDict()
        for r in analyze_table(df, k=64).collect()
    }
    parts = [df.filter(F.pmod(F.col("a"), F.lit(4)) == i) for i in range(4)]
    sks = [analyze_sketch(p, k=64) for p in parts]
    merged = merge_analyze_sketches(sks, k=64)
    got = {
        r["column"]: r.asDict()
        for r in stats_from_sketches(merged, k=64).collect()
    }
    assert got == want
    # saturation sanity: 'a' has 3000 distinct > k=64 -> estimate path
    assert want["a"]["approx_ndv"] not in (3000.0,)
    # empty-partition robustness: merging in an empty shard is a no-op
    empty = analyze_sketch(df.filter(F.lit(False)), k=64)
    got2 = {
        r["column"]: r.asDict()
        for r in stats_from_sketches(
            merge_analyze_sketches(sks + [empty], k=64), k=64
        ).collect()
    }
    assert got2 == want


# ---------------------------------------------------------------------------
# merge_intervals (gaps-and-islands)
# ---------------------------------------------------------------------------
def test_merge_intervals_nested_and_touching(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.analytics import (
        merge_intervals,
    )

    rows = [
        # key a: [0,10) contains [2,3); [5,20) overlaps; [20,25) touches
        # -> one island [0,25) x4 ... then a gap ... [30,31) alone
        ("a", 0, 10), ("a", 2, 3), ("a", 5, 20), ("a", 20, 25), ("a", 30, 31),
        ("b", 0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        (r["k"], r["span_start"], r["span_end"]): r["n_intervals"]
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert got == {("a", 0, 25): 4, ("a", 30, 31): 1, ("b", 0, 1): 1}


def test_merge_intervals_partition_independence(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.analytics import (
        merge_intervals,
    )

    import random

    rnd = random.Random(7)
    rows = [
        (f"k{i % 5}", s, s + rnd.randint(1, 40))
        for i in range(400)
        for s in [rnd.randint(0, 1000)]
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    a = sorted(map(tuple, merge_intervals(df, ["k"], "s", "e").collect()))
    b = sorted(
        map(tuple, merge_intervals(df.repartition(13), ["k"], "s", "e").collect())
    )
    assert a == b
    # spans of one key never overlap each other
    by_k = {}
    for k, s, e, _ in a:
        by_k.setdefault(k, []).append((s, e))
    for spans in by_k.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # strictly after: touching spans would have merged


# ---------------------------------------------------------------------------
# rank_normalize
# ---------------------------------------------------------------------------
def test_rank_normalize_matches_percent_rank(spark):
    from pyspark.sql import Window as W

    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        rank_normalize,
    )

    # duplicate scores -> tie groups share the first row's rank
    df = spark.createDataFrame(
        [(i, float(i % 40)) for i in range(200)], "id long, s double"
    )
    got = {
        (r["id"]): r["pct_rank"] for r in rank_normalize(df, "s", "id").collect()
    }
    ref = {
        r["id"]: round(r["pr"], 6)
        for r in df.withColumn(
            "pr", F.percent_rank().over(W.orderBy("s"))
        ).collect()
    }
    assert got == ref


def test_rank_normalize_null_scores_dropped_single_row_zero(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        rank_normalize,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, None)], "id long, s double"
    )
    got = rank_normalize(df, "s", "id").collect()
    assert len(got) == 1 and got[0]["pct_rank"] == 0.0


def test_quantile_bucketize_equal_masses_and_ties(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        quantile_bucketize,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v")
    )
    got = quantile_bucketize(df, "v", 10)
    per = {
        r["bucket"]: r["n"]
        for r in got.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert set(per) == set(range(10))
    assert all(v == 100 for v in per.values())
    # equal inputs always share a bucket (unlike ntile's tie splitting)
    dup = got.groupBy("v").agg(F.countDistinct("bucket").alias("nb")).collect()
    assert all(r["nb"] == 1 for r in dup)
    # NULL value -> NULL bucket; validation
    df2 = spark.createDataFrame([(1, None), (2, 5.0)], "id long, v double")
    rows = {r["id"]: r["bucket"] for r in quantile_bucketize(df2, "v", 2).collect()}
    assert rows[1] is None
    import pytest as _pt

    with _pt.raises(ValueError):
        quantile_bucketize(df, "v", 1)


def test_rank_normalize_grouped_matches_per_group_window(spark):
    from pyspark.sql import Window as W

    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        rank_normalize_grouped,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i % 7)) for i in range(60)] + [(99, "g0", None)],
        "id long, g string, s double",
    )
    got = {
        (r["g"], r["id"]): r["pct_rank"]
        for r in rank_normalize_grouped(df, "s", ["g"]).collect()
    }
    ref = {
        (r["g"], r["id"]): round(r["pr"], 6)
        for r in df.filter("s IS NOT NULL")
        .withColumn("pr", F.percent_rank().over(W.partitionBy("g").orderBy("s")))
        .collect()
    }
    assert got == ref
    assert ("g0", 99) not in got  # NULL score dropped
