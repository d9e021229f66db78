"""End-to-end CLI drive: gen -> clean -> sync -> stats, in-process."""

from __future__ import annotations

from multi_sensor_data_pipeline_for_robotics__spark.__main__ import main


def test_cli_full_pipeline(spark, tmp_path, capsys):
    base = str(tmp_path)
    assert main(["gen", "--out", f"{base}/raw", "--n-camera", "120",
                 "--n-motion", "150", "--n-log", "40"], spark) == 0
    assert main(["clean", "--input", f"{base}/raw/camera",
                 "--sensor-type", "camera", "--out", f"{base}/cam"], spark) == 0
    assert main(["clean", "--input", f"{base}/raw/motion",
                 "--sensor-type", "motion", "--out", f"{base}/mot"], spark) == 0
    assert main(["sync", "--camera", f"{base}/cam", "--motion", f"{base}/mot",
                 "--log", f"{base}/raw/log", "--method", "nearest",
                 "--out", f"{base}/synced"], spark) == 0
    synced = spark.read.parquet(f"{base}/synced")
    assert synced.count() > 0
    assert any(c.startswith("camera_") for c in synced.columns)
    assert any(c.startswith("motion_") for c in synced.columns)
    assert any(c.startswith("event_") for c in synced.columns)
    assert main(["stats", "--input", f"{base}/synced"], spark) == 0
    out = capsys.readouterr().out
    assert "window_start" in out and "stddev" in out


def test_cli_sync_disjoint_errors(spark, tmp_path):
    import datetime as dt

    base = str(tmp_path)
    a = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1.0)], "timestamp timestamp, x double"
    )
    b = spark.createDataFrame(
        [(dt.datetime(2025, 1, 1), 2.0)], "timestamp timestamp, y double"
    )
    a.write.parquet(f"{base}/a")
    b.write.parquet(f"{base}/b")
    rc = main(["sync", "--camera", f"{base}/a", "--motion", f"{base}/b",
               "--out", f"{base}/out"], spark)
    assert rc == 1


def test_cli_csv_format_roundtrip(spark, tmp_path):
    base = str(tmp_path)
    assert main(["--format", "csv", "gen", "--out", f"{base}/raw",
                 "--n-camera", "60", "--n-motion", "80", "--n-log", "20"], spark) == 0
    assert main(["--format", "csv", "clean", "--input", f"{base}/raw/camera",
                 "--sensor-type", "camera", "--out", f"{base}/cam"], spark) == 0
    assert main(["--format", "csv", "sync", "--camera", f"{base}/cam",
                 "--motion", f"{base}/raw/motion", "--log", f"{base}/raw/log",
                 "--out", f"{base}/synced"], spark) == 0
    from multi_sensor_data_pipeline_for_robotics__spark.sources.io import read_sensor_csv
    synced = read_sensor_csv(spark, f"{base}/synced", sensor_type=None)
    assert synced.count() > 0


def test_cli_search_and_dedup(spark, tmp_path, capsys):
    base = str(tmp_path)
    long_doc = (
        "the quick brown fox jumps over the lazy dog while the calm cat "
        "naps beside the warm stone wall in the quiet afternoon sun"
    )
    corpus = spark.createDataFrame(
        [(0, long_doc), (2, "spark shuffles hash partitions across executors")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, long_doc.replace("jumps", "leaps")), (3, "novel text about music")],
        "doc_id long, text string",
    )
    corpus.write.parquet(f"{base}/corpus")
    new.write.parquet(f"{base}/new")

    assert main(["search", "--input", f"{base}/corpus",
                 "--terms", "spark,fox", "--k", "2"], spark) == 0
    out = capsys.readouterr().out
    assert "score" in out and "rank" in out

    assert main(["dedup", "--input", f"{base}/new", "--corpus", f"{base}/corpus",
                 "--out", f"{base}/kept"], spark) == 0
    out = capsys.readouterr().out
    assert "kept 1/2" in out
    kept = spark.read.parquet(f"{base}/kept")
    assert [r.doc_id for r in kept.collect()] == [3]


def test_cli_check_gate(spark, tmp_path, capsys):
    base = str(tmp_path)
    clean = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.0)], "id long, cat string, v double"
    )
    dirty = spark.createDataFrame(
        [(1, "a", 5.0), (1, "zzz", 99.0)], "id long, cat string, v double"
    )
    clean.write.parquet(f"{base}/clean")
    dirty.write.parquet(f"{base}/dirty")
    rules = ["--rule", "not_null:id", "--rule", "range:v:0:10",
             "--rule", "accepted_values:cat:a,b", "--rule", "unique:id"]
    assert main(["check", "--input", f"{base}/clean", *rules], spark) == 0
    assert main(["check", "--input", f"{base}/dirty", *rules], spark) == 1
    out = capsys.readouterr().out
    assert "range(v,0.0,10.0): 1 violations" in out
    assert "unique(id): 1 violations" in out
