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


def test_salted_join_deterministic_salt_matches_direct(spark, skewed):
    # salt_from makes the scatter a pure function of the row: same
    # result under any repartitioning, and still identical to direct
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)],
        "k string, label string",
    )
    src = skewed.withColumn("rid", F.monotonically_increasing_id().cast("string"))
    direct = sorted(
        map(tuple, src.join(dim, "k", "left").collect()), key=str
    )
    got = sorted(
        map(
            tuple,
            salted_join(
                src, dim, "k", n_salts=4, how="left", salt_from="rid"
            ).collect(),
        ),
        key=str,
    )
    assert got == direct


def test_salted_aggregate_deterministic_salt(spark, skewed):
    src = skewed.withColumn("rid", F.concat(F.col("k"), F.col("v")))
    a = salted_aggregate(
        src, ["k"], {"n": ("count", "*"), "s": ("sum", "v")}, salt_from="rid"
    )
    b = salted_aggregate(
        src.repartition(13),
        ["k"],
        {"n": ("count", "*"), "s": ("sum", "v")},
        salt_from="rid",
    )
    da = {r["k"]: (r["n"], round(r["s"], 6)) for r in a.collect()}
    db = {r["k"]: (r["n"], round(r["s"], 6)) for r in b.collect()}
    assert da == db
