"""O4/O5 round-trip: CSV sink -> CSV scan with explicit schema
(reference: app.py:225-235 scan, app.py:441-443 export)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.sources import datagen as DG
from multi_sensor_data_pipeline_for_robotics__spark.sources.io import (
    CAMERA_SCHEMA,
    read_sensor_csv,
    write_csv_single,
    write_parquet,
)


def test_csv_roundtrip_camera(spark, tmp_path):
    src = DG.generate_camera(spark, n=50, noise=False)
    path = str(tmp_path / "camera_csv")
    write_csv_single(src, path)

    back = read_sensor_csv(spark, path, "camera")
    assert back.schema == CAMERA_SCHEMA
    assert back.count() == 50

    a = {r["frame_id"]: r for r in src.collect()}
    b = {r["frame_id"]: r for r in back.collect()}
    assert set(a) == set(b)
    for fid, ra in a.items():
        rb = b[fid]
        assert ra["timestamp"] == rb["timestamp"]
        for c in ["object_x", "object_y", "object_size", "confidence"]:
            assert abs(ra[c] - rb[c]) < 1e-9


def test_csv_inferred_schema(spark, tmp_path):
    src = DG.generate_motion(spark, n=20, noise=False)
    path = str(tmp_path / "motion_csv")
    write_csv_single(src, path)
    back = read_sensor_csv(spark, path, sensor_type=None)  # infer
    assert back.count() == 20
    assert "accel_x" in back.columns


def test_parquet_roundtrip(spark, tmp_path):
    src = DG.generate_log(spark, n=30)
    path = str(tmp_path / "log_parquet")
    write_parquet(src, path)
    back = spark.read.parquet(path)
    assert back.count() == 30
    # parquet scan marks everything nullable; compare names + types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in src.schema.fields
    ]


def test_parquet_partitioned_sink(spark, tmp_path):
    src = DG.generate_log(spark, n=30)
    path = str(tmp_path / "log_part")
    write_parquet(src, path, partition_by=["event_type"])
    back = spark.read.parquet(path)
    assert back.count() == 30
    # partition pruning: filtering on the partition column scans a subset
    one = back.filter(F.col("event_type") == "ARM_MOVE")
    plan = one.queryExecution if False else one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() <= 30


def test_foreign_csv_through_clean(spark, tmp_path):
    """Schema-inferred FOREIGN CSV (columns the library has never seen)
    flows through clean()'s runtime numeric-column discovery end-to-end
    (O8, app.py:114 select_dtypes parity): unexpected numeric columns
    participate in O7/O9, string columns pass through untouched."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import clean

    p = tmp_path / "foreign"
    p.mkdir()
    (p / "part.csv").write_text(
        "timestamp,widget_temp,flux_ratio,label\n"
        "2024-01-01T00:00:03.000000Z,21.5,0.9,ok\n"       # survives (sorted last)
        "2024-01-01T00:00:01.000000Z,-950.0,0.5,low\n"    # O9: widget_temp < -900
        "2024-01-01T00:00:02.000000Z,22.0,,nan\n"         # O7: NULL flux_ratio
        "2024-01-01T00:00:00.500000Z,23.0,12000.5,hi\n"   # O9: flux_ratio > 10000
        "2024-01-01T00:00:00.000000Z,19.0,1.1,ok\n"       # survives (sorted first)
    )
    df = read_sensor_csv(spark, str(p), sensor_type=None, infer=True)
    res = clean(df, sensor_type="unknown")
    rows = res.df.collect()
    assert [r["label"] for r in rows] == ["ok", "ok"]          # sorted by time
    assert [r["widget_temp"] for r in rows] == [19.0, 21.5]
    assert any("rows_with_missing=1" in line for line in res.report)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Bucketed-by-join-key tables join WITHOUT shuffling either side —
    the pay-the-shuffle-once-at-write-time primitive for repeated
    100 TB joins."""
    from multi_sensor_data_pipeline_for_robotics__spark.sources.io import (
        write_bucketed_table,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
        load_table,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed_table(orders, "orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed_table(lineitem, "lineitem_b", ["l_orderkey"], 8, ["l_orderkey"])
    try:
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        # disable broadcast so the join must pick SMJ, the strategy
        # bucketing accelerates
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        n = joined.count()
        want = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert n == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_jsonl_roundtrip_preserves_types_and_unicode(spark, tmp_path):
    from multi_sensor_data_pipeline_for_robotics__spark.sources.io import (
        read_jsonl,
        write_jsonl,
    )

    rows = [
        (0, 'quote " comma, newline\\n done', "en", 3.5),
        (1, "unicode: café 中文 \U0001f680", "zh", -0.25),
        (2, None, None, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string, lang string, score double")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=df.schema)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_jsonl_partitioned_sink(spark, tmp_path):
    import os

    from multi_sensor_data_pipeline_for_robotics__spark.sources.io import (
        read_jsonl,
        write_jsonl,
    )

    df = spark.range(100).selectExpr("id", "id % 3 AS part")
    path = str(tmp_path / "parts_jsonl")
    write_jsonl(df, path, partition_by=["part"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("part=")
    ) == ["part=0", "part=1", "part=2"]
    back = read_jsonl(spark, path, schema=df.schema)
    assert back.count() == 100 and back.agg({"id": "sum"}).first()[0] == 4950


def test_partitioned_write_prunes_partitions_at_scan(spark, tmp_path, sf_dir):
    """partitionBy(event_type) + a type predicate must prune directories
    at PLANNING time: the scan's partition count and PartitionFilters
    show only the selected partition is read — the other half of the
    pay-once-at-write-time story next to bucketing."""
    from multi_sensor_data_pipeline_for_robotics__spark.sources.io import write_parquet
    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_part")
    write_parquet(ev, path, partition_by=["event_type"])

    q = spark.read.parquet(path).filter(F.col("event_type") == "click")
    n = q.count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (directory pruning at
    # planning time), NOT in PushedFilters/DataFilters (row filtering
    # inside every file)
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf and "click" in pf
    df_section = plan.split("DataFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" not in df_section
    assert n == ev.filter(F.col("event_type") == "click").count() > 0


def test_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    from multi_sensor_data_pipeline_for_robotics__spark.sources.io import (
        read_orc,
        write_orc,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc")
    write_orc(ev, path)
    back = read_orc(spark, path)
    assert back.schema == ev.schema
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0
