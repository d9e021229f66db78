"""Rolling stats + truncated EWMA vs pandas references."""

from __future__ import annotations

import math

import pandas as pd

from multi_sensor_data_pipeline_for_robotics__spark.operators.timeseries import (
    ewma,
    rolling_stats,
)

ROWS = [
    (k, t, ((t * 2654435761 + ord(k)) % 997) / 9.97)
    for k in ("a", "b")
    for t in range(200)
]


def _df(spark):
    return spark.createDataFrame(ROWS, "k string, t long, v double")


def test_rolling_stats_matches_pandas(spark):
    got = {
        (r.key, r.ts): (r.roll_mean, r.roll_std, r.roll_min, r.roll_max, r.roll_n)
        for r in rolling_stats(_df(spark), "k", "t", "v", window_rows=16).collect()
    }
    pdf = pd.DataFrame(ROWS, columns=["k", "t", "v"])
    for k, g in pdf.groupby("k"):
        g = g.sort_values("t")
        roll = g["v"].rolling(16, min_periods=1)
        for t, mean, std, mn, mx, n in zip(
            g["t"], roll.mean(), roll.std(), roll.min(), roll.max(), roll.count()
        ):
            gm, gs, gmn, gmx, gn = got[(k, t)]
            assert abs(gm - mean) < 1e-6 and abs(gmn - mn) < 1e-6
            assert abs(gmx - mx) < 1e-6 and gn == int(n)
            if math.isnan(std):
                assert gs is None  # single-row frame: stddev_samp undefined
            else:
                assert abs(gs - std) < 1e-6


def test_ewma_matches_pandas_beyond_truncation_error(spark):
    alpha, W = 0.3, 32
    got = {
        (r.key, r.ts): r.ewma
        for r in ewma(_df(spark), "k", "t", "v", alpha=alpha, window_rows=W).collect()
    }
    pdf = pd.DataFrame(ROWS, columns=["k", "t", "v"])
    for k, g in pdf.groupby("k"):
        g = g.sort_values("t")
        ref = g["v"].ewm(alpha=alpha, adjust=True).mean()
        # truncating the tail at W terms perturbs the value by at most
        # ~beta^W / (1-beta) of the value scale (beta=0.7, W=32 → ~4e-5
        # relative on this ~100-scale data)
        for t, want in zip(g["t"], ref):
            assert abs(got[(k, t)] - want) < 2e-2


def test_ewma_exact_within_window(spark):
    # for rows with fewer than W predecessors the truncated EWMA IS the
    # exact adjust=True EWMA — compare bitwise-ish (round 6 both sides)
    alpha, W = 0.3, 32
    got = {
        (r.key, r.ts): r.ewma
        for r in ewma(_df(spark), "k", "t", "v", alpha=alpha, window_rows=W).collect()
    }
    pdf = pd.DataFrame(ROWS, columns=["k", "t", "v"])
    for k, g in pdf.groupby("k"):
        g = g.sort_values("t").head(W)
        ref = g["v"].ewm(alpha=alpha, adjust=True).mean()
        for t, want in zip(g["t"], ref):
            assert abs(got[(k, t)] - round(want, 6)) <= 1e-6


def test_rolling_and_ewma_emit_one_row_per_input(spark):
    df = _df(spark)
    assert rolling_stats(df, "k", "t", "v").count() == df.count()
    assert ewma(df, "k", "t", "v").count() == df.count()
