"""Salted aggregation/join must be value-identical to the direct plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions.skew import (
    salted_aggregate,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of one hot key + a long tail
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(500).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_aggregate_matches_direct(spark, skewed):
    direct = {
        (r["k"],): (r["n"], r["total"], r["lo"], r["hi"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["total"], r["lo"], r["hi"])
        for r in salted_aggregate(
            skewed,
            ["k"],
            {
                "n": ("count", "*"),
                "total": ("sum", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
        ).collect()
    }
    assert set(direct) == set(salted)
    for k, (n, total, lo, hi) in direct.items():
        sn, st, sl, sh = salted[k]
        assert sn == n and sl == lo and sh == hi
        assert abs(st - total) < 1e-6


def test_salted_aggregate_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"m": ("median", "v")})


def test_salted_join_matches_direct(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)],
        "k string, label string",
    )
    direct = (
        skewed.join(dim, "k")
        .groupBy("k", "label")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    )
    salted = (
        salted_join(skewed, dim, "k")
        .groupBy("k", "label")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    )
    d = {(r["k"], r["label"]): (r["n"], r["s"]) for r in direct}
    s = {(r["k"], r["label"]): (r["n"], r["s"]) for r in salted}
    assert set(d) == set(s)
    for key in d:
        assert d[key][0] == s[key][0]
        assert abs(d[key][1] - s[key][1]) < 1e-6


def test_salted_join_rejects_right_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="right")
