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
