"""Custom Python DataSource (format('sensorgen')): parity with the
Column-expression generators, partition independence, option handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.sources import datagen as DG
from multi_sensor_data_pipeline_for_robotics__spark.sources.pysource import (
    SensorDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(SensorDataSource)


def _read(spark, sensor, **opts):
    r = spark.read.format("sensorgen").option("sensor", sensor)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_motion_parity_with_jvm_generator(spark):
    src = _read(spark, "motion").orderBy("timestamp").toPandas()
    jvm = DG.generate_motion(spark).orderBy("timestamp").toPandas()
    assert (src["timestamp"] == jvm["timestamp"]).all()
    for c in ["accel_x", "accel_y", "accel_z", "gyro_x", "gyro_y", "gyro_z"]:
        assert np.allclose(src[c], jvm[c], atol=1e-9), c


def test_log_parity_and_distribution(spark):
    src = _read(spark, "log").orderBy("timestamp", "joint_1").toPandas()
    jvm = DG.generate_log(spark).orderBy("timestamp", "joint_1").toPandas()
    assert (src["timestamp"] == jvm["timestamp"]).all()
    assert (src["event_type"] == jvm["event_type"]).all()
    for c in ["joint_1", "joint_2", "joint_3", "gripper_force"]:
        assert np.allclose(src[c], jvm[c], atol=1e-9), c


def test_partition_independence_and_count(spark):
    a = _read(spark, "camera", n=300, numPartitions=1).orderBy("frame_id").toPandas()
    b = _read(spark, "camera", n=300, numPartitions=13).orderBy("frame_id").toPandas()
    assert len(a) == len(b) == 300
    assert (a["object_y"].fillna(-1) == b["object_y"].fillna(-1)).all()


def test_noise_off_and_bad_sensor(spark):
    det = _read(spark, "camera", n=50, noise="false").toPandas()
    assert det["object_x"].notna().all()
    assert (det["confidence"] == 0.9).all()
    with pytest.raises(Exception):
        _read(spark, "lidar").collect()
