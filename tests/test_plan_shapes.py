"""Physical-plan REGRESSION pins: the two-phase salted operators must
never plan an unpartitioned (SinglePartition) window over data-scale
rows. The smoke suite measures the win; these tests keep a refactor
from silently reintroducing the single-task sort. The check inspects
the executed plan text: window specs in these operators always
partition by (group, salt) / (group), so any `Window` node running on
`SinglePartition` is a regression. (Bounded helper windows — e.g. the
<= num-partitions-row prefix table inside global_running_sum — ARE
allowed SinglePartition; the operators pinned here don't use it.)"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _window_on_single_partition(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Window nodes print as
    #   Window [exprs], [partition cols], [order]   (partitioned)
    #   Window [exprs], [order]                     (UNPARTITIONED)
    # so a Window line with fewer than two "], [" separators has no
    # partition spec -> Spark funnels the input through one task.
    # (Verified against a deliberate `row_number() OVER (ORDER BY ...)`
    # plan, which this detector flags and the pinned operators don't.)
    for line in plan.splitlines():
        m = re.search(r"\bWindow(?:GroupLimit)? \[", line)
        if m and "WindowGroupLimit" not in line:
            if line.count("], [") < 2:
                return True
    return False


def test_group_sample_k_no_single_partition_window(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        group_sample_k,
    )

    df = spark.range(10_000).select(
        F.col("id").alias("key"), (F.col("id") % 3).alias("grp")
    )
    assert not _window_on_single_partition(group_sample_k(df, "key", "grp", 10))


def test_grouped_topk_no_single_partition_window(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.freq import (
        top_k_frequent,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 500).alias("v"), (F.col("id") % 3).alias("g")
    )
    assert not _window_on_single_partition(top_k_frequent(df, "v", 5, group_col="g"))


def test_grouped_weighted_sample_no_single_partition_window(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        weighted_sample_topk,
    )

    df = spark.range(10_000).select(
        F.col("id").alias("key"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    assert not _window_on_single_partition(
        weighted_sample_topk(df, "key", "w", 5, group_col="g")
    )


def test_suggest_join_strategy_branches():
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        suggest_join_strategy,
    )

    assert suggest_join_strategy(10**9, 1000)["strategy"] == "broadcast"
    s = suggest_join_strategy(10**9, 10**8, skew_ratio=400.0)
    assert s["strategy"] == "salted" and 4 <= s["n_salts"] <= 64
    assert (
        suggest_join_strategy(10**9, 10**8, skew_ratio=2.0)["strategy"]
        == "shuffle"
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        suggest_join_strategy(-1, 1)
