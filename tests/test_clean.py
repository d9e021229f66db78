from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.operators import clean as C
from tests._pandas_reference import clean_pd, make_camera, make_motion


def _to_spark(spark, pdf):
    return spark.createDataFrame(pdf)


def _sorted(pdf, by="timestamp"):
    return pdf.sort_values(by).reset_index(drop=True)


def test_drop_missing_matches_pandas(spark):
    pdf = make_camera()
    got = C.drop_missing(_to_spark(spark, pdf)).toPandas()
    want = pdf.dropna()
    assert len(got) == len(want)


def test_sentinel_filter_strict_bounds(spark):
    pdf = pd.DataFrame(
        {"timestamp": pd.date_range("2024-01-01", periods=6, freq="1s"),
         "v": [-900.0, -900.01, -999.0, 10000.0, 10000.01, 5.0]}
    )
    got = C.sentinel_filter(_to_spark(spark, pdf)).toPandas()
    # strict inequalities: -900 and 10000 survive (app.py:116)
    assert sorted(got["v"].tolist()) == [-900.0, 5.0, 10000.0]


def test_clean_camera_matches_pandas(spark):
    pdf = make_camera()
    got = C.clean(_to_spark(spark, pdf), "camera", collect_report=False).df.toPandas()
    want = clean_pd(pdf, "camera")
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(want), check_dtype=False, rtol=1e-12
    )


def test_clean_motion_quantile_clamp_matches_pandas(spark):
    pdf = make_motion()
    got = C.clean(_to_spark(spark, pdf), "motion", collect_report=False).df.toPandas()
    want = clean_pd(pdf, "motion")
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(want), check_dtype=False, rtol=1e-9
    )


def test_clean_report_counts_single_pass(spark):
    pdf = make_camera()
    res = C.clean(_to_spark(spark, pdf), "camera", collect_report=True)
    assert any(r.startswith("rows_in=500") for r in res.report)
    n_nan = pdf["object_x"].isna().sum()
    assert f"rows_with_missing={n_nan}" in res.report


def test_clamp_median_includes_outliers(spark):
    # median computed BEFORE replacement (app.py:130)
    vals = [1.0, 2.0, 3.0, 4.0, 1000.0]
    pdf = pd.DataFrame({"v": vals})
    got = C.clamp_outliers(_to_spark(spark, pdf), ["v"]).toPandas()["v"]
    s = pd.Series(vals)
    q1, q99, med = s.quantile(0.01), s.quantile(0.99), s.median()
    want = s.where(~((s < q1) | (s > q99)), med)
    assert np.allclose(sorted(got), sorted(want))


def test_numeric_columns_discovery(spark):
    pdf = make_camera()
    df = _to_spark(spark, pdf)
    cols = C.numeric_columns(df)
    assert "timestamp" not in cols
    assert set(cols) == {"frame_id", "object_x", "object_y", "object_size", "confidence"}


def test_clamp_outliers_approx_close_to_exact(spark, sf_dir):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
        clamp_outliers,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    exact = clamp_outliers(li, ["v"]).agg(
        F.sum("v").alias("s"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    approx = clamp_outliers(li, ["v"], exact=False, rel_err=1e-4).agg(
        F.sum("v").alias("s"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    # GK guarantees RANK error (<= rel_err*n ranks); in VALUE terms the
    # fence can move further where the tail is sparse, so bound loosely
    # and check the clamped aggregate, which is what consumers see
    assert approx["s"] == pytest.approx(exact["s"], rel=1e-3)
    assert approx["lo"] == pytest.approx(exact["lo"], rel=0.05)
    assert approx["hi"] == pytest.approx(exact["hi"], rel=0.05)


# ---------------------------------------------------------------------------
# filter_by_quantile
# ---------------------------------------------------------------------------
def test_filter_by_quantile_top_and_bottom(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
        filter_by_quantile,
    )

    df = spark.range(100).select(F.col("id").cast("double").alias("score"))
    top = filter_by_quantile(df, "score", 0.9).collect()
    vals = sorted(r["score"] for r in top)
    assert vals[0] >= 89.0 and len(vals) in (10, 11)
    bot = filter_by_quantile(df, "score", 0.1, keep="bottom").collect()
    bvals = sorted(r["score"] for r in bot)
    assert bvals[-1] <= 10.0 and len(bvals) in (10, 11)


def test_filter_by_quantile_nulls_never_pass(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
        filter_by_quantile,
    )

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,)], "score double"
    )
    got = filter_by_quantile(df, "score", 0.0).collect()
    assert sorted(r["score"] for r in got) == [1.0, 2.0, 3.0]


def test_filter_by_quantile_validates(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
        filter_by_quantile,
    )

    df = spark.range(5).select(F.col("id").cast("double").alias("s"))
    import pytest as _pt

    with _pt.raises(ValueError):
        filter_by_quantile(df, "s", 1.5)
    with _pt.raises(ValueError):
        filter_by_quantile(df, "s", 0.5, keep="middle")


def test_filter_by_quantile_grouped(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
        filter_by_quantile,
    )

    # group a: scores 0..99, group b: scores 1000..1099 — a global
    # threshold would drop ALL of group a; the grouped gate keeps the
    # top of each
    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(1000 + i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, score double")
    got = filter_by_quantile(df, "score", 0.9, group_cols=["g"])
    per = {}
    for r in got.collect():
        per.setdefault(r["g"], []).append(r["score"])
    assert set(per) == {"a", "b"}
    assert len(per["a"]) in (10, 11) and min(per["a"]) >= 89.0
    assert len(per["b"]) in (10, 11) and min(per["b"]) >= 1089.0


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------
def test_mad_outliers_resists_masking(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
        mad_outliers,
    )

    # 20 inliers around 10 plus TWO wild spikes: the mean/sigma screen
    # at 2 sigma would let the spikes inflate sigma; MAD doesn't move
    vals = [float(10 + (i % 5)) for i in range(20)] + [1000.0, -1000.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    got = {r["id"]: (r["robust_z"], r["is_outlier"]) for r in mad_outliers(df, "v").collect()}
    assert got[20][1] is True and got[21][1] is True
    assert sum(1 for z, f in got.values() if f) == 2  # only the spikes


def test_mad_outliers_degenerate_mad_flags_nothing(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
        mad_outliers,
    )

    # >50% identical values -> MAD = 0 -> no robust scale, no flags
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(10)] + [(99, 1e9)], "id long, v double"
    )
    got = mad_outliers(df, "v").collect()
    assert all(not r["is_outlier"] for r in got)
    assert all(r["robust_z"] is None for r in got)


def test_mad_outliers_grouped_thresholds_independent(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
        mad_outliers,
    )

    # group a is tight around 10 (100 is wild); group b is wide, where
    # 100 is ordinary
    rows = [("a", float(10 + (i % 3))) for i in range(20)] + [("a", 100.0)]
    rows += [("b", float(i * 50)) for i in range(20)]
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id long, g string, v double"
    )
    got = {(r["g"], r["v"]): r["is_outlier"] for r in mad_outliers(df, "v", group_cols=["g"]).collect()}
    assert got[("a", 100.0)] is True
    assert not any(f for (g, v), f in got.items() if g == "b")
