"""Data-quality constraint checker: crafted violations fixture."""

from __future__ import annotations

import pytest

from multi_sensor_data_pipeline_for_robotics__spark.operators.quality import (
    check_constraints,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "click", 10.0, "{a}"),
        (1, "click", -5.0, "{b}"),     # dup id + below range
        (2, None, 500.0, "oops"),      # null type? no — type col nullable; above range + bad props
        (3, "zzz", 50.0, None),        # unaccepted value; null props passes matches
        (None, "view", None, "{c}"),   # null id; null value passes range
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double, props string"
    )


def test_check_constraints_counts(spark, messy):
    got = {
        r.rule: r.violations
        for r in check_constraints(
            messy,
            [
                ("not_null", "event_id"),
                ("range", "value", 0.0, 100.0),
                ("accepted_values", "event_type", ["click", "view"]),
                ("matches", "props", r"^\{.*\}$"),
                ("unique", ["event_id"]),
            ],
        ).collect()
    }
    assert got == {
        "not_null(event_id)": 1,
        "range(value,0.0,100.0)": 2,       # -5.0 and 500.0
        "accepted_values(event_type)": 1,  # zzz (null passes)
        "matches(props)": 1,               # "oops" (null passes)
        "unique(event_id)": 1,             # second row with id 1
    }


def test_check_constraints_unique_only_and_clean_table(spark):
    df = spark.range(10).selectExpr("id AS k")
    got = check_constraints(df, [("unique", ["k"])]).collect()
    assert [(r.rule, r.violations) for r in got] == [("unique(k)", 0)]


def test_check_constraints_unknown_rule(spark, messy):
    with pytest.raises(ValueError):
        check_constraints(messy, [("made_up", "x")])


def test_check_foreign_keys_orphans_and_nulls(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.quality import (
        check_foreign_keys,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = check_foreign_keys([(child, "fk", parent, "pk", "c_p")]).first()
    assert (
        row["relationship"], row["n_child"], row["n_null_key"],
        row["n_orphans"], row["ok"],
    ) == ("c_p", 4, 1, 1, False)
    clean = spark.createDataFrame([(1, 10), (2, 20)], "id long, fk long")
    row2 = check_foreign_keys([(clean, "fk", parent, "pk", "ok_rel")]).first()
    assert row2["n_orphans"] == 0 and row2["ok"] is True


def test_key_skew_report_uniform_vs_degenerate(spark):
    import math

    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        key_skew_report,
    )

    uniform = spark.range(1000).select((F.col("id") % 10).alias("k"))
    r = key_skew_report(uniform, "k").first()
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (1000, 10, 100)
    assert r["skew_ratio"] == 1.0 and r["entropy_norm"] == 1.0
    hot = spark.range(1000).select(
        F.when(F.col("id") < 991, 0).otherwise(F.col("id")).alias("k")
    )
    r2 = key_skew_report(hot, "k").first()
    assert r2["top1_share"] == 0.991 and r2["n_keys"] == 10
    assert r2["entropy_norm"] < 0.1
    # single-key degenerate: entropy_norm defined as 0
    one = spark.range(5).select(F.lit(1).alias("k"))
    assert key_skew_report(one, "k").first()["entropy_norm"] == 0.0


def test_check_foreign_keys_empty_child_is_all_zero(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.quality import (
        check_foreign_keys,
    )

    child = spark.createDataFrame([], "fk long")
    parent = spark.createDataFrame([(1,)], "pk long")
    row = check_foreign_keys([(child, "fk", parent, "pk", "empty")]).first()
    # SUM over zero rows is NULL in Spark; the operator must report 0
    # (DuckDB-oracle parity on the empty-relation edge)
    assert (row["n_child"], row["n_null_key"], row["n_orphans"], row["ok"]) == (
        0, 0, 0, True,
    )


def test_table_diff_statuses_and_changed_cols(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.quality import (
        table_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged
         (2, "b2", None),      # s changed; v NULL==NULL -> not flagged
         (3, "c", None),       # v 3.0 -> NULL flagged (null-safe)
         (5, "e", 5.0)],       # added; 4 removed
        "k long, s string, v double",
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("changed", "s"),
        3: ("changed", "v"),
        4: ("removed", ""),
        5: ("added", ""),
    }
    full = table_diff(old, new, ["k"], include_unchanged=True).collect()
    assert {r["k"]: r["status"] for r in full}[1] == "unchanged"
