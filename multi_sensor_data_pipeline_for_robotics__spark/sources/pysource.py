"""Custom Spark DataSource (Python DataSource API, Spark 4) exposing
the synthetic sensor generators as a REGISTERED SOURCE::

    spark.dataSource.register(SensorDataSource)
    spark.read.format("sensorgen").option("sensor", "camera") \\
         .option("n", 500).load()

Same semantics as ``sources.datagen`` (reference app.py:29-101), second
implementation path: ``datagen`` builds Column-expression plans (the
JVM/codegen route), this source generates rows Python-side behind the
DataSource contract — the route you'd take for a REAL external system
(device API, proprietary binary log) that Spark can't scan natively.

Scale/determinism design:
  - ``partitions()`` splits the row space into ``numPartitions``
    disjoint id ranges — executors generate their slice independently;
    nothing is materialized on the driver.
  - Row values are pure functions of the logical row id (the same
    counter-based sha256 PRNG as ``datagen``), so output is
    bit-identical under any partitioning — and matches the JVM
    generators exactly except for last-ulp transcendental differences
    (Python libm vs JVM), which the 6-decimal rounding of every
    oracle-facing query absorbs.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from multi_sensor_data_pipeline_for_robotics__spark.sources.datagen import (
    EVENT_PROBS,
    EVENT_TYPES,
    _EPOCH,
    _us,
)

_TWO60 = float(1 << 60)

SCHEMAS = {
    "camera": (
        "timestamp timestamp, frame_id long, object_x double, "
        "object_y double, object_size double, confidence double"
    ),
    "motion": (
        "timestamp timestamp, accel_x double, accel_y double, accel_z double, "
        "gyro_x double, gyro_y double, gyro_z double"
    ),
    "log": (
        "timestamp timestamp, event_type string, joint_1 double, "
        "joint_2 double, joint_3 double, gripper_force double"
    ),
}

_DEFAULTS = {"camera": (500, 30.0, 42), "motion": (600, 50.0, 43), "log": (100, None, 44)}


def _u01(seed: int, stream: int, i: int) -> float:
    """Python twin of datagen.uniform01 — bit-identical (sha256 +
    IEEE-754 division, no transcendentals)."""
    h = hashlib.sha256(f"{seed}:{stream}:{i}".encode()).hexdigest()
    return int(h[:15], 16) / _TWO60


def _n01(seed: int, stream: int, i: int) -> float:
    u1 = _u01(seed, 2 * stream, i)
    u2 = _u01(seed, 2 * stream + 1, i)
    return math.sqrt(-2.0 * math.log(1.0 - u1)) * math.cos(2 * math.pi * u2)


def _ts(us: int) -> dt.datetime:
    # naive UTC: the session timezone is UTC (get_session), so this is
    # the same instant timestamp_micros() produces JVM-side
    return dt.datetime.fromtimestamp(us / 1_000_000, dt.timezone.utc).replace(tzinfo=None)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SensorDataSource(DataSource):
    """``format("sensorgen")`` — options: sensor (camera|motion|log),
    n, seed, noise (true|false), numPartitions, startUs."""

    @classmethod
    def name(cls) -> str:
        return "sensorgen"

    def schema(self) -> str:
        return SCHEMAS[self.options.get("sensor", "camera")]

    def reader(self, schema) -> "SensorReader":
        return SensorReader(self.options)


class SensorReader(DataSourceReader):
    def __init__(self, options):
        self.sensor = options.get("sensor", "camera")
        if self.sensor not in SCHEMAS:
            raise ValueError(f"unknown sensor {self.sensor!r}")
        n_def, freq_def, seed_def = _DEFAULTS[self.sensor]
        self.n = int(options.get("n", n_def))
        self.seed = int(options.get("seed", seed_def))
        self.noise = str(options.get("noise", "true")).lower() != "false"
        self.num_partitions = int(options.get("numpartitions", 8))
        self.freq_hz = float(options.get("freqhz", freq_def or 0.0))
        self.span_s = float(options.get("spans", 16.0))
        self.start_us = int(options.get("startus", _us(_EPOCH)))

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        gen = getattr(self, f"_read_{self.sensor}")
        yield from gen(partition.start, partition.end)

    # -- per-sensor row kernels: mirror datagen's formulas exactly --

    def _read_camera(self, lo: int, hi: int):
        n, seed = self.n, self.seed
        step_us = int(1_000_000 / self.freq_hz)
        for i in range(lo, hi):
            t = i * (4 * math.pi / n)
            t2 = i * (2 * math.pi / n)
            noisy = self.noise and _u01(seed, 100, i) < 0.05
            sentinel = noisy and _u01(seed, 101, i) < 0.5
            conf = (
                min(max(_n01(seed, 0, i) * 0.1 + 0.9, 0.0), 1.0)
                if self.noise
                else 0.9
            )
            yield (
                _ts(self.start_us + i * step_us),
                i,
                None if noisy else math.sin(t) * 100 + 200,
                -999.0 if sentinel else math.cos(t) * 80 + 150,
                abs(math.sin(t2)) * 50 + 20,
                conf,
            )

    def _read_motion(self, lo: int, hi: int):
        n, seed = self.n, self.seed
        step_us = int(1_000_000 / self.freq_hz)
        start_us = self.start_us + 50_000  # +50 ms (app.py:57)
        for i in range(lo, hi):
            p6 = i * (6 * math.pi / n)
            p4 = i * (4 * math.pi / n)
            p3 = i * (3 * math.pi / n)
            p2 = i * (2 * math.pi / n)
            spike = self.noise and _u01(seed, 100, i) < (10.0 / n)

            def j(stream: int, scale: float) -> float:
                return _n01(seed, stream, i) * scale if self.noise else 0.0

            ax = math.sin(p6) + j(0, 0.1)
            yield (
                _ts(start_us + i * step_us),
                ax * 10 if spike else ax,
                math.cos(p6) + j(1, 0.1),
                math.sin(p3) * 0.5 + 9.8 + j(2, 0.05),
                math.sin(p4) * 2 + j(3, 0.2),
                math.cos(p4) * 2 + j(4, 0.2),
                math.sin(p2) + j(5, 0.15),
            )

    def _read_log(self, lo: int, hi: int):
        seed = self.seed
        start_us = self.start_us - 100_000  # -100 ms (app.py:87)
        for i in range(lo, hi):
            u = _u01(seed, 1, i)
            cum, etype = 0.0, EVENT_TYPES[-1]
            for name, p in zip(EVENT_TYPES, EVENT_PROBS):
                cum += p
                if u < cum:
                    etype = name
                    break
            yield (
                _ts(start_us + math.floor(_u01(seed, 0, i) * self.span_s * 1_000_000)),
                etype,
                _u01(seed, 2, i) * 360 - 180,
                _u01(seed, 3, i) * 180 - 90,
                _u01(seed, 4, i) * 360 - 180,
                _u01(seed, 5, i) * 100,
            )
