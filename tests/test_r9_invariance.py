"""Partitioning-invariance properties for the r9 operators whose
docstrings CLAIM partition-independence (exact-integer argmax, prefix
scans, hash probes): the same input under different partitionings must
produce byte-identical results. This is the failure mode Spark makes
easy (per-partition RNG, float reduce order, range-sample split
points) and the reason these operators use exact arithmetic."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.operators.timeseries import (
    acf,
    cusum_changepoint,
)
from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import (
    ks_test,
    mann_whitney_u,
)
from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
    dsir_log_weights,
)

PARTS = [1, 7, 32]


def _events(spark, n=600, seed=11):
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            k=f"k{i % 5}",
            g="a" if i % 2 == 0 else "b",
            ts=t0 + dt.timedelta(seconds=i * 7),
            eid=i,
            v=round(rng.uniform(-50, 50), 3),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def _stable(spark, build):
    """Run `build(df)` under several partitionings; all results equal."""
    df = _events(spark)
    outs = []
    for p in PARTS:
        rows = sorted(map(tuple, build(df.repartition(p)).collect()))
        outs.append(rows)
    assert outs[0] == outs[1] == outs[2]
    return outs[0]


def test_cusum_partition_invariant(spark):
    got = _stable(
        spark,
        lambda d: cusum_changepoint(d, "k", "ts", "v", tiebreak_col="eid"),
    )
    assert len(got) == 5


def test_mwu_partition_invariant(spark):
    got = _stable(spark, lambda d: mann_whitney_u(d, "g", "v", "a", "b"))
    assert len(got) == 1


def test_ks_partition_invariant(spark):
    got = _stable(spark, lambda d: ks_test(d, "g", "v", "a", "b"))
    assert len(got) == 1


def test_acf_bucketed_partition_invariant(spark):
    got = _stable(
        spark,
        lambda d: acf(
            d, "k", "ts", "v", max_lag=3, tiebreak_col="eid",
            time_bucket_ms=120_000,
        ),
    )
    assert len(got) == 3


def test_dsir_partition_invariant(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"w{i % 9} w{(i * 5) % 9} w{(i * 7) % 11}",
                lang="en" if i % 3 == 0 else "zh")
            for i in range(120)
        ]
    )
    outs = []
    for p in PARTS:
        rows = sorted(
            map(
                tuple,
                dsir_log_weights(
                    docs.repartition(p), F.col("lang") == "en", buckets=64
                ).collect(),
            )
        )
        outs.append(rows)
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 120
