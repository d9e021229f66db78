"""CSV/parquet sources and sinks (O4-O6, app.py:225-235, 441-443).

The reference reads uploaded CSVs with inferred schemas and exports the
synchronized table as a single CSV. Here:
  - explicit ``StructType`` schemas are preferred (inference = an extra
    full scan + surprise types at scale); ``infer=True`` keeps parity
    with the reference's behavior when schemas are unknown.
  - the default sink is partitioned parquet (columnar, splittable);
    ``write_csv_single`` reproduces the reference's one-file export and
    is explicitly marked as the non-scalable path (coalesce(1) funnels
    every row through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CAMERA_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("frame_id", T.LongType()),
        T.StructField("object_x", T.DoubleType()),
        T.StructField("object_y", T.DoubleType()),
        T.StructField("object_size", T.DoubleType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)

MOTION_SCHEMA = T.StructType(
    [T.StructField("timestamp", T.TimestampType())]
    + [
        T.StructField(c, T.DoubleType())
        for c in ["accel_x", "accel_y", "accel_z", "gyro_x", "gyro_y", "gyro_z"]
    ]
)

LOG_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("joint_1", T.DoubleType()),
        T.StructField("joint_2", T.DoubleType()),
        T.StructField("joint_3", T.DoubleType()),
        T.StructField("gripper_force", T.DoubleType()),
    ]
)

SENSOR_SCHEMAS = {"camera": CAMERA_SCHEMA, "motion": MOTION_SCHEMA, "log": LOG_SCHEMA}

# Spark's CSV default truncates timestamps to milliseconds; sensor grids
# are µs-resolution (33333 µs camera steps), so sink and scan pin a
# microsecond format to make the round trip lossless.
CSV_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def read_sensor_csv(
    spark: SparkSession, path: str, sensor_type: str | None = None, infer: bool = False
) -> DataFrame:
    """O4 — CSV scan with explicit schema when the sensor type is known
    (app.py:225-235 infer for parity via ``infer=True``)."""
    reader = spark.read.option("header", True).option("timestampFormat", CSV_TS_FORMAT)
    if sensor_type in SENSOR_SCHEMAS and not infer:
        reader = reader.schema(SENSOR_SCHEMAS[sensor_type])
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Scalable sink: partitioned parquet."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv_single(df: DataFrame, path: str) -> None:
    """O5 — single-file CSV export (app.py:441-443 parity).

    ``coalesce(1)`` routes everything through one task — correct for
    the reference's interactive export, wrong for bulk data; use
    ``write_parquet`` for anything large."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", CSV_TS_FORMAT)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan (beyond the reference surface — the interchange
    format most training-data corpora arrive in). An explicit schema
    skips the inference pre-scan AND pins types: at 100 TB, inference
    reads every byte twice and can silently widen a column (one
    malformed row makes an int column string). ``columnNameOfCorruptRecord``
    stays at Spark's default PERMISSIVE null-fill; strict pipelines
    should add a `_corrupt_record IS NULL` gate downstream."""
    reader = spark.read.option("timestampFormat", CSV_TS_FORMAT)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """JSON-lines sink: one JSON object per line, gzip-friendly,
    splittable per file. Parallel (one file per partition) — unlike
    ``write_csv_single`` this IS a scale path, though parquet remains
    the better storage format when the reader is also Spark."""
    w = df.write.mode("overwrite").option("timestampFormat", CSV_TS_FORMAT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a BUCKETED managed table: rows are hash-partitioned
    into ``num_buckets`` files by ``bucket_cols`` at write time, and the
    bucketing is recorded in the catalog.

    This is the co-located-join primitive for repeated big joins at
    100 TB: two tables bucketed the same way on the join key join with
    NO exchange on either side (the physical plan drops both
    ``Exchange hashpartitioning`` nodes — verified in
    tests/test_io.py::test_bucketed_join_has_no_exchange). The shuffle
    is paid ONCE at write time instead of per query; ``sort_cols``
    additionally pre-sorts within buckets so sort-merge joins skip
    their sort too.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink — the columnar interchange format for Hive/Trino-side
    consumers (predicate pushdown, column pruning, and splittability
    like parquet; zlib-block compressed by default). Parallel, one
    file per partition."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Schema comes from the file footer (self-describing,
    no inference pre-scan); filters and projections push down into the
    reader exactly as with parquet."""
    return spark.read.orc(path)
