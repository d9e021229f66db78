"""Distributed synthetic sensor generators — Spark-native rebuilds of
the reference's seeded numpy generators (app.py:29-101).

The reference materializes numpy arrays in driver memory; these
generators are ``spark.range(n)`` projections — the row space is
partitioned across executors from birth, so n can be 10^10 without a
driver bottleneck. Values follow the reference's *distributions*
(sinusoid trajectories + seeded noise, app.py:42-45, 66-71, 95-98);
bit-level parity with numpy's MT19937 stream is explicitly NOT a goal.

Randomness is a counter-based PRNG: uniform draws are the top 60 bits
of ``sha256(f"{seed}:{stream}:{row_id}")``, normals come from those via
Box–Muller. Unlike ``F.rand(seed)`` — whose stream is a function of the
*physical partition index*, so a repartition or AQE re-plan changes the
data — this depends only on the logical row id: the generated dataset
is bit-identical under any partitioning, any cluster size, and any
engine with sha256 (the DuckDB oracle replays it exactly).
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


_TWO60 = float(1 << 60)


def uniform01(seed: int, stream: int, id_col: str = "id"):
    """Counter-based uniform draw in [0, 1): top 60 bits of
    ``sha256(f"{seed}:{stream}:{id}")`` divided by 2^60.

    Partition-independent (depends only on the logical row id, not the
    physical partition like ``F.rand``), so generated data is stable
    under repartitioning/AQE — and reproducible in any engine with
    sha256. DuckDB twin::

        CAST(('0x' || substr(sha256('<seed>:<stream>:' ||
             CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)
            / 1152921504606846976.0
    """
    h = F.sha2(
        F.concat_ws(
            ":", F.lit(str(seed)), F.lit(str(stream)), F.col(id_col).cast("string")
        ),
        256,
    )
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(_TWO60)


def normal01(seed: int, stream: int, id_col: str = "id"):
    """Standard normal via Box–Muller over two :func:`uniform01` streams.

    ``z = sqrt(-2 ln(1-u1)) * cos(2π u2)`` — `1-u1` keeps the log
    argument in (0, 1]. Same closed form replays in the DuckDB oracle."""
    u1 = uniform01(seed, 2 * stream, id_col)
    u2 = uniform01(seed, 2 * stream + 1, id_col)
    return F.sqrt(F.log(F.lit(1.0) - u1) * -2.0) * F.cos(u2 * (2 * math.pi))


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
    noisy = (uniform01(seed, 100) < 0.05) if noise else F.lit(False)
    sentinel = noisy & (uniform01(seed, 101) < 0.5)
    conf = (
        F.least(F.greatest(normal01(seed, 0) * 0.1 + 0.9, F.lit(0.0)), F.lit(1.0))
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
    spike = (uniform01(seed, 100) < (10.0 / n)) if noise else F.lit(False)

    def jitter(stream: int, scale: float):
        return (normal01(seed, stream) * scale) if noise else F.lit(0.0)

    ax = F.sin(p6) + jitter(0, 0.1)
    return spark.range(n).select(
        F.timestamp_micros(F.lit(_us(start)) + F.col("id") * step_us).alias("timestamp"),
        F.when(spike, ax * 10).otherwise(ax).alias("accel_x"),
        (F.cos(p6) + jitter(1, 0.1)).alias("accel_y"),
        (F.sin(p3) * 0.5 + 9.8 + jitter(2, 0.05)).alias("accel_z"),
        (F.sin(p4) * 2 + jitter(3, 0.2)).alias("gyro_x"),
        (F.cos(p4) * 2 + jitter(4, 0.2)).alias("gyro_y"),
        (F.sin(p2) + jitter(5, 0.15)).alias("gyro_z"),
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
    u = uniform01(seed, 1)
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
                F.lit(_us(start))
                + F.floor(uniform01(seed, 0) * (span_s * 1_000_000)).cast("long")
            ).alias("timestamp"),
            expr.alias("event_type"),
            (uniform01(seed, 2) * 360 - 180).alias("joint_1"),
            (uniform01(seed, 3) * 180 - 90).alias("joint_2"),
            (uniform01(seed, 4) * 360 - 180).alias("joint_3"),
            (uniform01(seed, 5) * 100).alias("gripper_force"),
        )
        .orderBy("timestamp")
    )
