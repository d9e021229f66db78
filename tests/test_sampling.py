"""Hash sampling: partitioning-independent, disjoint splits, stable
membership as split weights grow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
    hash_sample,
    hash_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(20_000).select(F.col("id").alias("key"))


def test_hash_sample_rate_and_partition_independence(spark, ids):
    s1 = set(r["key"] for r in hash_sample(ids, "key", 0.2).collect())
    assert 0.17 < len(s1) / 20_000 < 0.23
    # different physical partitioning -> identical sample
    s2 = set(
        r["key"] for r in hash_sample(ids.repartition(7), "key", 0.2).collect()
    )
    assert s1 == s2


def test_hash_split_disjoint_and_stable(spark, ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = hash_split(ids, "key", w).collect()
    assert len(got) == 20_000  # weights sum to 1 -> nothing dropped
    by_split = {}
    for r in got:
        by_split.setdefault(r["split"], set()).add(r["key"])
    assert 0.77 < len(by_split["train"]) / 20_000 < 0.83
    assert not (by_split["train"] & by_split["val"])
    assert not (by_split["val"] & by_split["test"])
    # growing the train share keeps existing train members (cumulative
    # bucket edges): stability under re-splitting
    bigger = hash_split(ids, "key", {"train": 0.9, "val": 0.1})
    train2 = {r["key"] for r in bigger.collect() if r["split"] == "train"}
    assert by_split["train"] <= train2


def test_hash_split_rejects_overweight(spark, ids):
    with pytest.raises(ValueError):
        hash_split(ids, "key", {"a": 0.9, "b": 0.2})


def test_stratified_sample_rates_and_determinism(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        stratified_hash_sample,
    )

    df = spark.range(30_000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("zh")
        .alias("lang"),
    )
    got = stratified_hash_sample(
        df, "key", "lang", rates={"en": 0.2, "de": 1.0}, default_rate=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0.17 < by_lang["en"] / 10_000 < 0.23
    assert by_lang["de"] == 10_000  # rate 1.0 keeps everything
    assert "zh" not in by_lang  # default_rate 0.0 drops unlisted strata
    # per-stratum membership is the same hash family as hash_sample:
    # the en sample IS hash_sample at 0.2 restricted to en rows
    en_direct = set(
        r["key"]
        for r in hash_sample(df.filter(F.col("lang") == "en"), "key", 0.2).collect()
    )
    en_strat = set(
        r["key"] for r in got.filter(F.col("lang") == "en").collect()
    )
    assert en_direct == en_strat


def test_stratified_sample_rejects_bad_rate(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        stratified_hash_sample,
    )

    df = spark.range(10).select(F.col("id").alias("key"), F.lit("en").alias("lang"))
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "key", "lang", rates={"en": 1.5})


def test_weighted_sample_topk_proportional_and_deterministic(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        weighted_sample_topk,
    )

    # 2000 rows, weight 9 for ids < 200, weight 1 otherwise: heavy rows
    # are 10% of the population but ~2/3 of the expected sample mass
    # (1800*9 : wait — 200*9=1800 vs 1800*1=1800 → ~half the sample)
    df = spark.range(2000).selectExpr(
        "id", "CASE WHEN id < 200 THEN 9.0 ELSE 1.0 END AS w"
    )
    got = weighted_sample_topk(df, "id", "w", k=400)
    ids = sorted(r.id for r in got.collect())
    assert len(ids) == 400
    heavy = sum(1 for i in ids if i < 200)
    # expected heavy share ~ 50% (1800 vs 1800 weight mass); allow wide
    # tolerance — the point is it's FAR above the 10% population share
    assert 0.3 < heavy / 400 < 0.7
    # determinism: same rows on a different partitioning
    again = sorted(
        r.id for r in weighted_sample_topk(df.repartition(17), "id", "w", k=400).collect()
    )
    assert again == ids


def test_weighted_sample_topk_grouped(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        weighted_sample_topk,
    )

    df = spark.range(300).selectExpr("id", "id % 3 AS g", "1.0 + id % 5 AS w")
    got = weighted_sample_topk(df, "id", "w", k=10, group_col="g")
    rows = got.collect()
    assert len(rows) == 30
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r.id)
    assert all(len(v) == 10 for v in by_g.values())
    # per-group selection equals running the global sampler on the slice
    for g, ids in by_g.items():
        solo = sorted(
            r.id
            for r in weighted_sample_topk(
                df.filter(f"g = {g}"), "id", "w", k=10
            ).collect()
        )
        assert sorted(ids) == solo


def test_weighted_sample_k_exceeding_population_returns_all(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        weighted_sample_topk,
    )

    df = spark.range(5).selectExpr("id", "1.0 + id AS w")
    got = sorted(r.id for r in weighted_sample_topk(df, "id", "w", k=50).collect())
    assert got == [0, 1, 2, 3, 4]


def test_epoch_shuffle_is_uniform_permutation_and_seed_switchable(spark, ids):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        epoch_shuffle,
    )

    out = epoch_shuffle(ids, "key", seed=0, num_partitions=8)
    rows = out.collect()  # collect preserves partition order: the global order
    assert len(rows) == 20_000
    keys = [r["shuffle_key"] for r in rows]
    assert keys == sorted(keys)  # realized order IS the permutation order
    assert sorted(r["key"] for r in rows) == list(range(20_000))  # a permutation
    # partition-count independence: same order at any parallelism
    rows2 = epoch_shuffle(ids.repartition(13), "key", seed=0, num_partitions=3).collect()
    assert [r["key"] for r in rows2] == [r["key"] for r in rows]
    # a different seed is a different permutation, uncorrelated with id order
    rows_s1 = epoch_shuffle(ids, "key", seed=1, num_partitions=8).collect()
    order0 = [r["key"] for r in rows]
    order1 = [r["key"] for r in rows_s1]
    assert order0 != order1
    agree = sum(a == b for a, b in zip(order0, order1))
    assert agree < 20  # ~n/n! chance of fixed points beyond Poisson(1) scale


def test_mixture_resample_hits_target_shares(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        mixture_resample,
    )

    # availability: en 12000, de 6000, fr 2000; target 50/30/20
    # binding source: fr (2000 / 0.2 = 10k total) -> en keeps 5000/12000,
    # de keeps 3000/6000, fr keeps all
    rows = spark.range(20_000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") < 12_000, "en")
        .when(F.col("id") < 18_000, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    out = mixture_resample(
        rows, "key", "lang", {"en": 0.5, "de": 0.3, "fr": 0.2}
    )
    got = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got["fr"] == 2000  # binding source keeps everything
    n = sum(got.values())
    assert abs(got["en"] / n - 0.5) < 0.02
    assert abs(got["de"] / n - 0.3) < 0.02
    # deterministic: same rows on a different partitioning
    out2 = mixture_resample(
        rows.repartition(17), "key", "lang", {"en": 0.5, "de": 0.3, "fr": 0.2}
    )
    assert sorted(r["key"] for r in out.collect()) == sorted(
        r["key"] for r in out2.collect()
    )
    # sources absent from the target mix are dropped
    extra = rows.withColumn(
        "lang", F.when(F.col("key") % 100 == 0, "xx").otherwise(F.col("lang"))
    )
    out3 = mixture_resample(extra, "key", "lang", {"en": 0.5, "de": 0.3, "fr": 0.2})
    assert out3.filter(F.col("lang") == "xx").count() == 0


def test_mixture_resample_missing_source_fails_loudly(spark):
    import pytest
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        mixture_resample,
    )

    df = spark.createDataFrame(
        [(i, "en") for i in range(50)], "key long, lang string"
    )
    plan = mixture_resample(df, "key", "lang", {"en": 0.5, "xx": 0.5})
    # lazy: construction succeeds, execution surfaces the missing source
    with pytest.raises(Exception, match="xx.*has no rows|has no rows.*xx"):
        plan.count()


# ---------------------------------------------------------------------------
# group_sample_k
# ---------------------------------------------------------------------------
def test_group_sample_k_size_and_determinism(spark):
    df = spark.range(5_000).select(
        F.col("id").alias("key"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        group_sample_k,
    )

    got = group_sample_k(df, "key", "grp", 10)
    rows = got.collect()
    per = {}
    for r in rows:
        per.setdefault(r["grp"], set()).add(r["key"])
    assert set(per) == {"0", "1", "2", "3"}
    assert all(len(v) == 10 for v in per.values())
    # partitioning-independent: same rows from a different layout
    again = {
        (r["grp"], r["key"])
        for r in group_sample_k(df.repartition(11), "key", "grp", 10).collect()
    }
    assert again == {(g, k) for g, v in per.items() for k in v}


def test_group_sample_k_small_group_returns_all(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "key long, grp string"
    )
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        group_sample_k,
    )

    got = group_sample_k(df, "key", "grp", 10).collect()
    assert len(got) == 3  # groups smaller than k are kept whole


def test_group_sample_k_matches_single_window(spark):
    # two-phase salted ranking == one global per-group ranking
    from pyspark.sql import Window as W

    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        group_sample_k,
    )

    df = spark.range(3_000).select(
        F.col("id").alias("key"), (F.col("id") % 3).alias("grp")
    )
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("key").cast("string"), F.lit("#gsample")), 256),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    w = W.partitionBy("grp").orderBy(h, "key")
    ref = {
        (r["grp"], r["key"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 25")
        .collect()
    }
    got = {
        (r["grp"], r["key"])
        for r in group_sample_k(df, "key", "grp", 25).collect()
    }
    assert got == ref


# ---------------------------------------------------------------------------
# temperature_resample
# ---------------------------------------------------------------------------
def test_temperature_alpha1_keeps_everything(spark):
    df = spark.range(2_000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 10 < 8, "big").otherwise("small").alias("src"),
    )
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        temperature_resample,
    )

    assert temperature_resample(df, "key", "src", alpha=1.0).count() == 2_000


def test_temperature_alpha0_equalizes(spark):
    # 1600 big / 400 small; alpha=0 -> equal shares -> ~400 of each
    df = spark.range(2_000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 5 < 4, "big").otherwise("small").alias("src"),
    )
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        temperature_resample,
    )

    got = temperature_resample(df, "key", "src", alpha=0.0)
    per = {r["src"]: r["n"] for r in got.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert per["small"] == 400  # binding source keeps 100%
    assert 340 <= per["big"] <= 460  # hash-threshold noise around 400


def test_temperature_midpoint_shares(spark):
    # n = {big: 1600, small: 400}, alpha=0.5 -> shares 2:1
    df = spark.range(2_000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 5 < 4, "big").otherwise("small").alias("src"),
    )
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        temperature_resample,
    )

    got = temperature_resample(df, "key", "src", alpha=0.5)
    per = {r["src"]: r["n"] for r in got.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert per["small"] == 400
    assert 700 <= per["big"] <= 900  # expected 800

def test_temperature_rejects_bad_alpha(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        temperature_resample,
    )

    df = spark.range(10).select(F.col("id").alias("key"), F.lit("a").alias("src"))
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_resample(df, "key", "src", alpha=1.5)


# ---------------------------------------------------------------------------
# kfold
# ---------------------------------------------------------------------------
def test_kfold_disjoint_complete_stable(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        kfold_assign,
        kfold_train_test,
    )

    df = spark.range(5_000).select(F.col("id").alias("key"))
    folds = kfold_assign(df, "key", 5)
    per = {
        r["fold"]: r["n"]
        for r in folds.groupBy("fold").agg(F.count("*").alias("n")).collect()
    }
    assert set(per) == {0, 1, 2, 3, 4}
    assert sum(per.values()) == 5_000
    assert all(850 <= n <= 1150 for n in per.values())
    # partitioning independence
    again = kfold_assign(df.repartition(13), "key", 5)
    assert (
        folds.exceptAll(again).count() == 0 and again.exceptAll(folds).count() == 0
    )
    tr, te = kfold_train_test(df, "key", 5, 2)
    assert tr.count() + te.count() == 5_000
    assert tr.join(te, "key").count() == 0


def test_kfold_validates(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        kfold_assign,
        kfold_train_test,
    )

    df = spark.range(5).select(F.col("id").alias("key"))
    import pytest as _pt

    with _pt.raises(ValueError):
        kfold_assign(df, "key", 1)
    with _pt.raises(ValueError):
        kfold_train_test(df, "key", 5, 5)


def test_referential_subsample_integrity_and_ratio(spark, sf_dir):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        referential_subsample,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
        load_table,
    )

    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p, c = referential_subsample(od, li, "o_orderkey", "l_orderkey", 0.2)
    # every child FK resolves inside the sampled parent set
    assert c.join(p, c.l_orderkey == p.o_orderkey, "left_anti").count() == 0
    # parent rate near 20%; child ratio (lines per order) preserved
    n_od, n_li = od.count(), li.count()
    n_p, n_c = p.count(), c.count()
    assert 0.14 < n_p / n_od < 0.26
    full_ratio = n_li / n_od
    samp_ratio = n_c / n_p
    assert abs(samp_ratio - full_ratio) / full_ratio < 0.2


# ---------------------------------------------------------------------------
# two-phase salted ranking law (hypothesis)
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=4),
    k=st.integers(min_value=1, max_value=12),
    salt_buckets=st.sampled_from([1, 2, 7, 64]),
)
def test_group_sample_k_equals_single_window_property(sizes, k, salt_buckets):
    """The lossless-split law: for ANY group sizes, k, and salt bucket
    count, the two-phase salted ranking selects exactly the rows the
    single per-group window would."""
    from pyspark.sql import Window as W

    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        group_sample_k,
    )
    from tests.test_asof_properties import _get_spark

    spark = _get_spark()
    rows = [
        (g * 1000 + i, f"g{g}")
        for g, n in enumerate(sizes)
        for i in range(n)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "key long, grp string")
    got = {
        (r["grp"], r["key"])
        for r in group_sample_k(df, "key", "grp", k, salt_buckets).collect()
    }
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("key").cast("string"), F.lit("#gsample")), 256),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    w = W.partitionBy("grp").orderBy(h, "key")
    ref = {
        (r["grp"], r["key"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    }
    assert got == ref


def test_sample_negatives_hash_properties(spark):
    """Determinism, k-per-anchor, self/positive exclusion, and
    partitioning-independence of the hash-probe negative sampler."""
    from pyspark.sql import Row

    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        sample_negatives_hash,
    )

    items = spark.createDataFrame([Row(vec_id=i) for i in range(50)])
    pos = spark.createDataFrame(
        [Row(doc_a=0, doc_b=1), Row(doc_a=2, doc_b=3)]
    )
    out = sample_negatives_hash(items, 50, k=4, exclude_pairs=pos)
    rows = out.collect()
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor, []).append(r.neg_id)
    assert set(by_anchor) == set(range(50))
    assert all(len(v) == 4 for v in by_anchor.values())
    # no self-negatives; positives excluded in BOTH orientations
    assert all(a not in v for a, v in by_anchor.items())
    assert 1 not in by_anchor[0] and 0 not in by_anchor[1]
    assert 3 not in by_anchor[2] and 2 not in by_anchor[3]
    # repartitioning must not change the sample
    again = sample_negatives_hash(
        items.repartition(7), 50, k=4, exclude_pairs=pos
    ).collect()
    assert sorted((r.anchor, r.probe, r.neg_id) for r in again) == sorted(
        (r.anchor, r.probe, r.neg_id) for r in rows
    )


def test_sample_negatives_count_frame(spark):
    from pyspark.sql import Row

    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        sample_negatives_hash,
    )
    from pyspark.sql import functions as F

    items = spark.createDataFrame([Row(vec_id=i) for i in range(20)])
    lit = sample_negatives_hash(items, 20, k=3).collect()
    frame = sample_negatives_hash(
        items, items.agg(F.count(F.lit(1)).alias("n")), k=3
    ).collect()
    assert sorted(map(tuple, lit)) == sorted(map(tuple, frame))


def test_contrastive_triplets_invariants(spark):
    """Every triplet: negative != anchor, negative is NOT any of the
    anchor's positives (either orientation), exactly k negatives per
    (anchor, positive) row, and the same triplets come back when the
    pair frame is repartitioned."""
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        contrastive_triplets,
    )

    pairs = spark.createDataFrame(
        [(0, 5), (0, 7), (3, 9)], "doc_a long, doc_b long"
    )
    got = contrastive_triplets(pairs, 100, k=2).collect()
    pos = {(0, 5), (0, 7), (3, 9)}
    pos |= {(b, a) for a, b in pos}
    by_pair = {}
    for r in got:
        assert r.negative != r.anchor
        assert (r.anchor, r.negative) not in pos
        by_pair.setdefault((r.anchor, r.positive), []).append(r.negative)
    assert set(by_pair) == {(0, 5), (0, 7), (3, 9)}
    assert all(len(v) == 2 for v in by_pair.values())
    # both positives of anchor 0 share the anchor's negative draw
    assert sorted(by_pair[(0, 5)]) == sorted(by_pair[(0, 7)])
    again = contrastive_triplets(pairs.repartition(7), 100, k=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
