"""Hypothesis property tests for the portable sketches + A-ES sampler.

Each property is the mathematical invariant the operator's docstring
promises, checked on random inputs — the cheap way to catch the edge
the fixed fixtures missed.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
    weighted_sample_topk,
)
from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
    histogram_quantiles,
    kmv_distinct,
)

values = st.lists(
    st.floats(min_value=0.0, max_value=999.0, allow_nan=False),
    min_size=5,
    max_size=60,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=values)
def test_hist_quantiles_monotone_in_q(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {
        r.q: r.quantile
        for r in histogram_quantiles(
            df, "v", qs=(0.25, 0.5, 0.75, 1.0), bins=64, lo=0.0, hi=1000.0
        ).collect()
    }
    assert got[0.25] <= got[0.5] <= got[0.75] <= got[1.0]
    # every estimate stays inside the value domain
    assert all(0.0 <= v <= 1000.0 for v in got.values())


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=80)
)
def test_kmv_never_exceeds_k_and_exact_below(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "v long")
    row = kmv_distinct(df, "v", k=32).first()
    n_true = len(set(ids))
    assert row.sketch_m == min(n_true, 32)
    if n_true < 32:
        assert row.approx_distinct == float(n_true)
    else:
        assert row.approx_distinct > 0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=10, max_value=40),
    boost=st.integers(min_value=0, max_value=9),
)
def test_weighted_sample_upweight_never_evicts(spark, n, boost):
    """A-ES monotonicity: raising one row's weight can only improve its
    own priority (ln(u)/w rises toward 0) while leaving every other
    row's priority unchanged — so a selected row stays selected when
    ONLY its weight increases."""
    k = n // 2
    base = [(i, 1.0 + (i % 3)) for i in range(n)]
    df = spark.createDataFrame(base, "id long, w double")
    before = {r.id for r in weighted_sample_topk(df, "id", "w", k=k).collect()}
    target = sorted(before)[0]
    bumped = [(i, w + (100.0 if i == target else 0.0)) for i, w in base]
    df2 = spark.createDataFrame(bumped, "id long, w double")
    after = {r.id for r in weighted_sample_topk(df2, "id", "w", k=k).collect()}
    assert target in after
    # and nothing outside {previously selected} ∪ {target} can enter:
    # all other priorities are unchanged, so the k-th threshold can
    # only rise
    assert after <= before | {target}


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6), min_size=2, max_size=25
    )
)
def test_fuzzy_match_equals_bruteforce_on_random_strings(spark, names):
    """SymSpell blocking finds EXACTLY the brute-force distance-<=1
    pairs on arbitrary strings over a colliding alphabet (short 'abc'
    strings maximize neighborhood overlap and duplicate edge cases)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.linkage import (
        fuzzy_match_pairs,
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    for k in (1, 2):
        got = {
            (r.id_a, r.id_b): r.dist
            for r in fuzzy_match_pairs(df, "name", "id", max_dist=k).collect()
        }
        want = {
            (ia, ib): lev(sa, sb)
            for i, (ia, sa) in enumerate(rows)
            for ib, sb in rows[i + 1:]
            if lev(sa, sb) <= k
        }
        assert got == want, k


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    updates=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["A", "B", "C"])),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_invariants_under_any_update_sequence(spark, updates):
    """After ANY sequence of merges: exactly one open version per key,
    and each key's intervals are non-overlapping and contiguous."""
    import datetime as dt

    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.operators.scd import (
        scd2_apply,
    )

    t0 = dt.datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [(k, "init", t0, None) for k in range(4)],
        "k long, seg string, valid_from timestamp, valid_to timestamp",
    )
    dim0 = dim
    stamped = [
        (key, seg, t0 + dt.timedelta(days=step))
        for step, (key, seg) in enumerate(updates, 1)
    ]
    for key, seg, eff in stamped:
        up = spark.createDataFrame(
            [(key, seg, eff)], "k long, seg string, eff_ts timestamp"
        )
        dim = scd2_apply(dim, up, "k", ["seg"])
    rows = dim.collect()

    # one multi-update call over the whole batch == the sequential replay
    multi = scd2_apply(
        dim0,
        spark.createDataFrame(stamped, "k long, seg string, eff_ts timestamp"),
        "k",
        ["seg"],
    ).collect()
    assert {(r.k, r.seg, r.valid_from, r.valid_to) for r in multi} == {
        (r.k, r.seg, r.valid_from, r.valid_to) for r in rows
    }
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append((r.valid_from, r.valid_to, r.seg))
    for k, ivs in by_key.items():
        opens = [iv for iv in ivs if iv[1] is None]
        assert len(opens) == 1, (k, ivs)
        ivs_sorted = sorted(ivs, key=lambda x: x[0])
        for (f1, t1, _), (f2, _, _) in zip(ivs_sorted, ivs_sorted[1:]):
            assert t1 == f2, (k, ivs_sorted)  # contiguous, no overlap/gap


def test_hist_quantiles_empty_and_all_null_inputs(spark):
    """Default-bounds pre-scan on an empty or all-null value column must
    return an empty frame, not raise float(None)."""
    empty = spark.createDataFrame([], "g string, v double")
    out = histogram_quantiles(empty, "v")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["q", "quantile"]

    nulls = spark.createDataFrame(
        [("a", None), ("b", None)], "g string, v double"
    )
    out2 = histogram_quantiles(nulls, "v", group_col="g")
    assert out2.count() == 0
    assert [f.name for f in out2.schema.fields] == ["g", "q", "quantile"]


def test_stream_round_half_up_matches_spark_round_on_ties():
    """_round_half_up must agree with Spark/DuckDB round() on exact
    decimal-half ties where np.round (half-to-even) differs."""
    import numpy as np

    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        _round_half_up,
    )

    y = np.array([0.0000005, 0.0000015, 1.0000025, -0.0000005, 2.125])
    got = _round_half_up(y, 6)
    # Spark round() is HALF_UP away from zero on the shortest repr
    want = np.array([0.000001, 0.000002, 1.000003, -0.000001, 2.125])
    assert np.array_equal(got, want), got
    # and np.round really does disagree on the .5 ties (sanity)
    assert np.round(y[0], 6) == 0.0


def test_kmv_join_cardinality_accuracy(spark, sf_dir):
    """The AKMV estimate must land within ~3/sqrt(k) of the true join
    cardinality on the FK-shaped orders x customer join (k=256 ->
    ~19% bound; measured ~7%), and the intersection estimate within
    the same bound of the true matched-key count."""
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        kmv_join_cardinality,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
        load_table,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    row = kmv_join_cardinality(orders, "o_custkey", cust, "c_custkey", k=256).first()
    true_join = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    true_inter = (
        orders.select("o_custkey")
        .distinct()
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .count()
    )
    tol = 3.0 / (256 ** 0.5)
    assert abs(row.est_join_rows - true_join) <= tol * true_join, (
        row.est_join_rows, true_join,
    )
    assert abs(row.est_distinct_intersection - true_inter) <= tol * max(true_inter, 1)


def test_kmv_join_cardinality_disjoint_keys(spark):
    """Disjoint key domains -> zero estimated join rows, zero sampled
    pairs."""
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        kmv_join_cardinality,
    )

    a = spark.range(1000).selectExpr("id AS ka")
    b = spark.range(1000).selectExpr("id + 1000000 AS kb")
    row = kmv_join_cardinality(a, "ka", b, "kb", k=128).first()
    assert row.est_join_rows == 0.0 and row.sample_pairs == 0


_texty = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)  # no lone surrogates
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ref_texts=st.lists(_texty, min_size=1, max_size=4),
       doc_texts=st.lists(_texty, min_size=1, max_size=6))
def test_char_lm_map_twin_matches_catalyst_on_random_unicode(
    spark, ref_texts, doc_texts
):
    """The vectorized codepoint-packed map scorer == the Catalyst join
    scorer on ARBITRARY unicode (any planes, any lengths incl. < 3) —
    the property the CJK fixture spot-checks."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        char_lm_score,
        char_lm_score_map,
        collect_char_lm,
    )

    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doc_texts)], "doc_id long, text string"
    )
    want = sorted(map(tuple, char_lm_score(docs, ref).collect()))
    got = sorted(
        map(tuple, char_lm_score_map(docs, collect_char_lm(ref)).collect())
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(doc_texts=st.lists(
    st.text(alphabet="ab déß🙂 ", min_size=0, max_size=30),
    min_size=1, max_size=6,
))
def test_dsir_map_twin_matches_catalyst_on_random_tokens(spark, doc_texts):
    """The factorize+memo DSIR map scorer == the Catalyst join path on
    random token streams (repeated tokens, empty strings, unicode)."""
    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        collect_dsir_model,
        dsir_log_weights,
        dsir_score_map,
    )

    docs = spark.createDataFrame(
        [(i, t, "en" if i % 2 == 0 else "zh") for i, t in enumerate(doc_texts)],
        "doc_id long, text string, lang string",
    )
    tgt = F.col("lang") == "en"
    want = sorted(map(tuple, dsir_log_weights(docs, tgt, buckets=64).collect()))
    got = sorted(map(tuple, dsir_score_map(
        docs, collect_dsir_model(docs, tgt, buckets=64)
    ).collect()))
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dims=st.tuples(st.integers(1, 9), st.integers(1, 9)),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_parser_roundtrip_random(spark, dims, seed):
    """P6 encode -> parse recovers exact pixels for random dimensions
    and pixel content, including header comment/whitespace variants;
    any truncation of the raster raises ValueError."""
    import numpy as np

    from multi_sensor_data_pipeline_for_robotics__spark.operators.multimodal import (
        _encode_p6,
        _parse_p6,
    )

    w, h = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = _encode_p6(w, h, px.tobytes())
    gw, gh, got, gmv = _parse_p6(payload)
    assert (gw, gh, gmv) == (w, h, 255) and (got == px).all()
    # spec-corner header: comments and mixed whitespace
    fancy = b"P6\n# c1\n  %d\t# c2\n%d\n# c3\n255\n" % (w, h) + px.tobytes()
    gw, gh, got, _mv = _parse_p6(fancy)
    assert (gw, gh) == (w, h) and (got == px).all()
    # 16-bit samples: maxval > 255 -> big-endian 2-byte samples, exact
    px16 = rng.integers(0, 65536, size=(h, w, 3), dtype=np.uint16).astype('>u2')
    p16 = _encode_p6(w, h, px16.tobytes(), maxval=65535)
    gw, gh, got16, mv16 = _parse_p6(p16)
    assert (gw, gh, mv16) == (w, h, 65535) and (got16 == px16).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _parse_p6(p16[:-1])
    with _pytest.raises(ValueError):
        _parse_p6(payload[:-1])
