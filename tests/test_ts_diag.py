"""Time-series diagnostics (operators/timeseries.py acf/cusum) —
known-answer fixtures: a perfectly periodic series has ACF(+1) at its
period, a hard mean shift puts the CUSUM argmax exactly at the break."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from multi_sensor_data_pipeline_for_robotics__spark.operators.timeseries import (
    acf,
    cusum_changepoint,
)


def _series(spark, vals, key="k"):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(key=key, ts=t0 + dt.timedelta(seconds=i), eid=i, x=float(v))
            for i, v in enumerate(vals)
        ]
    )


def test_acf_periodic_series(spark):
    # period-2 alternation: ACF(lag 2) = +1, ACF(lag 1) = -1
    df = _series(spark, [1.0, -1.0] * 20)
    got = {r.lag: r for r in acf(df, "key", "ts", "x", max_lag=2).collect()}
    assert got[2].acf == pytest.approx(1.0, abs=1e-6)
    assert got[1].acf == pytest.approx(-1.0, abs=1e-6)
    assert got[1].n_pairs == 39 and got[2].n_pairs == 38


def test_acf_pools_within_keys_only(spark):
    # two keys, each constant but at different levels: pairs form only
    # WITHIN keys (3 per key, never a 7th cross-key pair), and the
    # pooled pairs (5,5)/(9,9) correlate perfectly
    a = _series(spark, [5.0] * 4, key="a")
    b = _series(spark, [9.0] * 4, key="b")
    got = acf(a.union(b), "key", "ts", "x", max_lag=1).collect()
    assert got[0].n_pairs == 6
    assert got[0].acf == pytest.approx(1.0, abs=1e-6)


def test_acf_tiebreak_makes_order_total(spark):
    # all rows share one timestamp; tiebreak by eid must give the
    # eid-ordered series deterministically
    t0 = dt.datetime(2024, 1, 1)
    rows = [Row(key="k", ts=t0, eid=i, x=float(v))
            for i, v in enumerate([1.0, -1.0, 1.0, -1.0])]
    df = spark.createDataFrame(rows)
    got = {r.lag: r.acf
           for r in acf(df, "key", "ts", "x", max_lag=1,
                        tiebreak_col="eid").collect()}
    assert got[1] == pytest.approx(-1.0, abs=1e-6)


def test_cusum_finds_mean_shift(spark):
    # 20 points at 0, then 20 at 10: |S_k| peaks exactly at the break
    df = _series(spark, [0.0] * 20 + [10.0] * 20)
    got = cusum_changepoint(df, "key", "ts", "x").collect()
    assert len(got) == 1
    r = got[0]
    assert r.n == 40
    assert r.k_change == 20
    assert r.ts_change == dt.datetime(2024, 1, 1, 0, 0, 19)
    assert r.stat > 1.36  # far above the 5% critical value


def test_cusum_stable_series_low_stat(spark):
    df = _series(spark, [3.0, 3.1, 2.9, 3.0, 3.05, 2.95] * 5)
    r = cusum_changepoint(df, "key", "ts", "x").collect()[0]
    assert r.stat < 1.0


def test_cusum_integer_argmax_ties_pick_earliest(spark):
    # symmetric V shape: |S_k| ties at multiple k; exact integer
    # arithmetic must pick the smallest k, not a float-noise winner
    df = _series(spark, [1.0, 1.0, -1.0, -1.0])
    r = cusum_changepoint(df, "key", "ts", "x").collect()[0]
    assert r.k_change == 2  # S = [1, 2, 1, 0] -> unique max at k=2


def test_acf_time_bucketed_equals_direct_on_dense_series(spark):
    """time_bucket_ms mode must reproduce the direct window exactly
    when every bucket holds >= max_lag rows (the documented exactness
    condition), including pairs crossing bucket boundaries."""
    import random

    rng = random.Random(7)
    vals = [rng.uniform(-5, 5) for _ in range(400)]
    # 1 row per second; 20s buckets -> 20 rows per bucket >= max_lag 4
    df = _series(spark, vals)
    direct = {
        r.lag: (r.n_pairs, r.acf)
        for r in acf(df, "key", "ts", "x", max_lag=4,
                     tiebreak_col="eid").collect()
    }
    bucketed = {
        r.lag: (r.n_pairs, r.acf)
        for r in acf(df, "key", "ts", "x", max_lag=4, tiebreak_col="eid",
                     time_bucket_ms=20_000).collect()
    }
    assert direct == bucketed


def test_acf_time_bucketed_sparse_drops_documented_pairs(spark):
    """A bucket with fewer than max_lag rows drops boundary-spanning
    pairs — the documented truncation, visible in n_pairs."""
    df = _series(spark, [1.0, 2.0, 3.0, 4.0])  # 1s apart
    # 1s buckets -> one row per bucket; lag-2 pairs need to cross TWO
    # boundaries and are dropped; lag-1 pairs survive via the overlap
    got = {
        r.lag: r.n_pairs
        for r in acf(df, "key", "ts", "x", max_lag=2, tiebreak_col="eid",
                     time_bucket_ms=1_000).collect()
    }
    assert got.get(1) == 3
    assert 2 not in got or got[2] == 0
