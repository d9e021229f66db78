"""Distributed synthetic sensor generators — Spark-native rebuilds of
the reference's seeded numpy generators (app.py:29-101).

The reference materializes numpy arrays in driver memory; these
generators are ``spark.range(n)`` projections — the row space is
partitioned across executors from birth, so n can be 10^10 without a
driver bottleneck. Values follow the reference's *distributions*
(sinusoid trajectories + seeded noise, app.py:42-45, 66-71, 95-98);
bit-level parity with numpy's MT19937 stream is explicitly NOT a goal —
Spark's ``rand``/``randn`` are seeded and deterministic per (seed,
partition, row) which is what reproducibility at scale actually needs.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH = dt.datetime(2024, 1, 1)

EVENT_TYPES = [
    "GRIPPER_OPEN",
    "GRIPPER_CLOSE",
    "ARM_MOVE",
    "SENSOR_READ",
    "CALIBRATION",
    "ERROR",
    "WARNING",
]
EVENT_PROBS = [0.15, 0.15, 0.3, 0.2, 0.1, 0.05, 0.05]


def _us(ts: dt.datetime) -> int:
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=dt.timezone.utc)
    return int(ts.timestamp() * 1_000_000)


def generate_camera(
    spark: SparkSession,
    n: int = 500,
    start: dt.datetime | None = None,
    freq_hz: float = 30.0,
    seed: int = 42,
    noise: bool = True,
) -> DataFrame:
    """O1 (app.py:29-52): 30 Hz object tracking with sin/cos trajectory,
    clipped-normal confidence, 5% NaN noise in object_x and -999
    sentinels in object_y for half of those rows.

    ``noise=False`` yields the pure deterministic trajectory (no NaN /
    sentinel injection, confidence pinned to its 0.9 center) — engine-
    independent, used for cross-engine generator parity checks."""
    start = start or _EPOCH
    step_us = int(1_000_000 / freq_hz)
    t = F.col("id") * (4 * math.pi / n)  # phase sweep like linspace(0, 4π)
    t2 = F.col("id") * (2 * math.pi / n)
    noisy = (F.rand(seed + 1) < 0.05) if noise else F.lit(False)
    sentinel = noisy & (F.rand(seed + 2) < 0.5)
    conf = (
        F.least(F.greatest(F.randn(seed) * 0.1 + 0.9, F.lit(0.0)), F.lit(1.0))
        if noise
        else F.lit(0.9)
    )
    return spark.range(n).select(
        F.timestamp_micros(F.lit(_us(start)) + F.col("id") * step_us).alias("timestamp"),
        F.col("id").alias("frame_id"),
        F.when(noisy, F.lit(None).cast("double"))
        .otherwise(F.sin(t) * 100 + 200)
        .alias("object_x"),
        F.when(sentinel, F.lit(-999.0)).otherwise(F.cos(t) * 80 + 150).alias("object_y"),
        (F.abs(F.sin(t2)) * 50 + 20).alias("object_size"),
        conf.alias("confidence"),
    )


def generate_motion(
    spark: SparkSession,
    n: int = 600,
    start: dt.datetime | None = None,
    freq_hz: float = 50.0,
    seed: int = 43,
    noise: bool = True,
) -> DataFrame:
    """O2 (app.py:55-79): 50 Hz IMU starting +50 ms, gravity-offset
    accel_z, ~10/n of rows get x10 accel_x spikes.

    ``noise=False``: pure sinusoids, no spikes — for cross-engine
    generator parity checks."""
    start = (start or _EPOCH) + dt.timedelta(milliseconds=50)
    step_us = int(1_000_000 / freq_hz)
    p6 = F.col("id") * (6 * math.pi / n)
    p4 = F.col("id") * (4 * math.pi / n)
    p3 = F.col("id") * (3 * math.pi / n)
    p2 = F.col("id") * (2 * math.pi / n)
    spike = (F.rand(seed + 1) < (10.0 / n)) if noise else F.lit(False)

    def jitter(s: int, scale: float):
        return (F.randn(s) * scale) if noise else F.lit(0.0)

    ax = F.sin(p6) + jitter(seed, 0.1)
    return spark.range(n).select(
        F.timestamp_micros(F.lit(_us(start)) + F.col("id") * step_us).alias("timestamp"),
        F.when(spike, ax * 10).otherwise(ax).alias("accel_x"),
        (F.cos(p6) + jitter(seed + 2, 0.1)).alias("accel_y"),
        (F.sin(p3) * 0.5 + 9.8 + jitter(seed + 3, 0.05)).alias("accel_z"),
        (F.sin(p4) * 2 + jitter(seed + 4, 0.2)).alias("gyro_x"),
        (F.cos(p4) * 2 + jitter(seed + 5, 0.2)).alias("gyro_y"),
        (F.sin(p2) + jitter(seed + 6, 0.15)).alias("gyro_z"),
    )


def generate_log(
    spark: SparkSession,
    n: int = 100,
    start: dt.datetime | None = None,
    span_s: float = 16.0,
    seed: int = 44,
) -> DataFrame:
    """O3 (app.py:82-101): irregular event log starting -100 ms;
    categorical event types via inverse-CDF bucketing of uniform draws
    (the distributed form of ``np.random.choice(p=...)``)."""
    start = (start or _EPOCH) - dt.timedelta(milliseconds=100)
    u = F.rand(seed + 1)
    cum = 0.0
    expr = None
    for etype, p in zip(EVENT_TYPES, EVENT_PROBS):
        cum += p
        cond = u < cum
        expr = F.when(cond, etype) if expr is None else expr.when(cond, etype)
    expr = expr.otherwise(EVENT_TYPES[-1])
    return (
        spark.range(n)
        .select(
            F.timestamp_micros(
                F.lit(_us(start)) + (F.rand(seed) * span_s * 1_000_000).cast("long")
            ).alias("timestamp"),
            expr.alias("event_type"),
            (F.rand(seed + 2) * 360 - 180).alias("joint_1"),
            (F.rand(seed + 3) * 180 - 90).alias("joint_2"),
            (F.rand(seed + 4) * 360 - 180).alias("joint_3"),
            (F.rand(seed + 5) * 100).alias("gripper_force"),
        )
        .orderBy("timestamp")
    )
