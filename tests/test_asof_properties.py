"""Property tests (SURVEY §5.2 #3) for the as-of align invariants:

  pad      ∀ grid point g: matched ts <= g, and no sensor ts in (matched, g]
  backfill ∀ g: matched ts >= g, and no sensor ts in [g, matched)
  nearest  ∀ g: |matched - g| is minimal over all sensor ts
  tolerance⇒ no match with |Δ| > tolerance

Hypothesis drives randomized sensor timestamp sets; examples are kept
small because every example is a Spark round trip.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multi_sensor_data_pipeline_for_robotics__spark.operators import sync as S

T0 = dt.datetime(2024, 1, 1)
STEP_MS = 100
N_GRID = 8
GRID = [T0 + dt.timedelta(milliseconds=STEP_MS * i) for i in range(N_GRID)]

sensor_ts_sets = st.lists(
    st.integers(min_value=-250, max_value=N_GRID * STEP_MS + 250),
    min_size=1,
    max_size=12,
    unique=True,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from multi_sensor_data_pipeline_for_robotics__spark import get_session

        _spark = get_session(app_name="msdp_tests", shuffle_partitions=8)
    return _spark


def _align(ms_offsets, method, tolerance_ms=None):
    spark = _get_spark()
    rows = [
        (T0 + dt.timedelta(milliseconds=ms), float(ms)) for ms in sorted(ms_offsets)
    ]
    sensor = spark.createDataFrame(rows, "timestamp timestamp, x double")
    grid = S.time_grid(spark, GRID[0], GRID[-1], STEP_MS)
    out = S.asof_align(grid, sensor, method=method, tolerance_ms=tolerance_ms)
    return {
        r["timestamp"]: (r["__matched_ts"], r["x"]) for r in out.collect()
    }, [r[0] for r in rows]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ms=sensor_ts_sets)
def test_pad_invariants(ms):
    got, sensor_ts = _align(ms, "pad")
    assert set(got) == set(GRID)
    for g, (matched, _) in got.items():
        earlier = [t for t in sensor_ts if t <= g]
        if not earlier:
            assert matched is None
        else:
            assert matched == max(earlier)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ms=sensor_ts_sets)
def test_backfill_invariants(ms):
    got, sensor_ts = _align(ms, "backfill")
    for g, (matched, _) in got.items():
        later = [t for t in sensor_ts if t >= g]
        if not later:
            assert matched is None
        else:
            assert matched == min(later)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ms=sensor_ts_sets)
def test_nearest_minimal_distance_late_tiebreak(ms):
    got, sensor_ts = _align(ms, "nearest")
    for g, (matched, _) in got.items():
        assert matched is not None  # some observation always exists
        best = min(abs((t - g).total_seconds()) for t in sensor_ts)
        assert abs((matched - g).total_seconds()) == pytest.approx(best)
        # exact midpoint tie resolves to the LATER observation
        ties = [t for t in sensor_ts if abs((t - g).total_seconds()) == pytest.approx(best)]
        if len(ties) > 1:
            assert matched == max(ties)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ms=sensor_ts_sets, tol=st.integers(min_value=0, max_value=300))
def test_tolerance_nulls_stale_matches(ms, tol):
    got, _ = _align(ms, "nearest", tolerance_ms=tol)
    for g, (matched, x) in got.items():
        if matched is not None:
            assert abs((matched - g).total_seconds()) * 1000 <= tol
            assert x is not None


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ms=sensor_ts_sets)
def test_interp_linear_between_neighbors(ms):
    got, sensor_ts = _align(ms, "interp")
    for g, (matched, x) in got.items():
        earlier = [t for t in sensor_ts if t <= g]
        later = [t for t in sensor_ts if t > g]
        # sensor value == its offset in ms, so interpolation is linear
        # in time: expected value is simply g's offset clamped to the
        # sensor's time span
        if earlier and later:
            want = (g - T0).total_seconds() * 1000.0
        elif earlier:
            want = (max(earlier) - T0).total_seconds() * 1000.0
        else:
            want = (min(later) - T0).total_seconds() * 1000.0
        assert x == pytest.approx(want, abs=1e-6), f"grid {g}"
        # matched_ts reports the nearer neighbor (tie -> later)
        best = min(abs((t - g).total_seconds()) for t in sensor_ts)
        assert abs((matched - g).total_seconds()) == pytest.approx(best)


def test_interp_exact_match_is_exact():
    # an observation exactly on a grid point is returned untouched
    got, _ = _align([0, 100, 250], "interp")
    assert got[GRID[0]][1] == pytest.approx(0.0)
    assert got[GRID[1]][1] == pytest.approx(100.0)
    # grid point 200 interpolates between 100 and 250: 100 + 150*(100/150)
    assert got[GRID[2]][1] == pytest.approx(200.0)


# ---- keyed as-of: hypothesis-driven direct == bucketed == semantics ----

keyed_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),       # key
        st.integers(min_value=0, max_value=2000),    # ts offset ms
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=keyed_rows, rrows=keyed_rows, nb=st.sampled_from([1, 3, 16]))
def test_keyed_asof_bucketed_equals_direct_and_semantics(lrows, rrows, nb):
    """For random keyed series (duplicate (key, ts) pairs allowed on
    the left; right deduped per (key, ts) so the match value is
    unambiguous): the bucketed plan returns exactly the direct plan's
    matches, and each match is the latest right ts <= left ts of the
    same key."""
    spark = _get_spark()
    rseen = {}
    for k, ms in rrows:
        rseen[(k, ms)] = float(ms)
    l = spark.createDataFrame(
        [
            (i, k, T0 + dt.timedelta(milliseconds=ms))
            for i, (k, ms) in enumerate(lrows)
        ],
        "lid long, k long, ts timestamp",
    )
    r = spark.createDataFrame(
        [
            (k, T0 + dt.timedelta(milliseconds=ms), v)
            for (k, ms), v in sorted(rseen.items())
        ],
        "k long, ts timestamp, rv double",
    )
    kw = dict(on="ts", by="k", value_cols=["rv"])
    direct = {
        row["lid"]: (row["rv_r"], row["matched_ts_r"])
        for row in S.asof_join_keyed(l, r, **kw).collect()
    }
    bucketed = {
        row["lid"]: (row["rv_r"], row["matched_ts_r"])
        for row in S.asof_join_keyed(l, r, time_buckets=nb, **kw).collect()
    }
    assert direct == bucketed
    for i, (k, ms) in enumerate(lrows):
        earlier = [m for (kk, m) in rseen if kk == k and m <= ms]
        want = (rseen[(k, max(earlier))], T0 + dt.timedelta(milliseconds=max(earlier))) if earlier else (None, None)
        assert direct[i] == want, f"left row {i} key {k} ts {ms}"
