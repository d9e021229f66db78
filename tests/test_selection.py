"""Data-selection family (plans/selection.py): char-trigram LM scoring
and DSIR importance weights — semantic properties a hash-green oracle
can't express (probability mass sums to 1, in-domain scores beat
out-of-domain, weights favor target-like docs, short-string edges)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
    char_lm_score,
    char_trigrams,
    dsir_log_weights,
    dsir_select_top,
    train_char_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=g) for i, (t, g) in enumerate(rows)]
    )


def test_char_trigrams_short_strings(spark):
    df = spark.createDataFrame(
        [Row(s="abcd"), Row(s="abc"), Row(s="ab"), Row(s="")]
    ).select(char_trigrams("s").alias("g"))
    got = [r.g for r in df.collect()]
    assert got == [["abc", "bcd"], ["abc"], [], []]


def test_char_lm_proper_distribution(spark):
    """For every observed context, sum over the reference ALPHABET of
    p(c|ctx) must be exactly 1 — the add-alpha model is a proper
    conditional distribution, not an ad-hoc score."""
    ref = _docs(spark, [("abab abba", "en"), ("baab", "en")])
    tri, ctx, vocab = train_char_lm(ref)
    alpha = 0.5
    v = vocab.collect()[0].v
    chars = [r.ch for r in
             ref.select(F.explode(F.split("text", "")).alias("ch"))
                .filter(F.length("ch") >= 1).distinct().collect()]
    assert len(chars) == v
    tri_map = {r.gram: r.cnt3 for r in tri.collect()}
    for rc in ctx.collect():
        total = sum(
            (tri_map.get(rc.ctx + c, 0) + alpha) / (rc.cnt2 + alpha * v)
            for c in chars
        )
        assert total == pytest.approx(1.0, abs=1e-12)


def test_char_lm_in_domain_scores_higher(spark):
    """A doc made of reference-like text must get a higher avg_logp
    (lower bits_per_gram) than alphabet-disjoint noise."""
    ref = _docs(spark, [("the quick brown fox jumps over the lazy dog", "en")] * 3)
    docs = _docs(
        spark,
        [
            ("the quick brown fox", "en"),
            ("zzz@@@###!!!&&&***", "xx"),
        ],
    )
    out = {r.doc_id: r for r in char_lm_score(docs, ref).collect()}
    assert out[0].avg_logp > out[1].avg_logp
    assert out[0].bits_per_gram < out[1].bits_per_gram
    # bits_per_gram = -avg_logp/ln2 (both post-rounding, so loose tol)
    assert out[0].bits_per_gram == pytest.approx(
        -out[0].avg_logp / math.log(2), abs=1e-5
    )


def test_char_lm_score_skips_sub_trigram_docs(spark):
    ref = _docs(spark, [("abcdef", "en")])
    docs = _docs(spark, [("abcdef", "en"), ("ab", "en")])
    got = char_lm_score(docs, ref).collect()
    assert [r.doc_id for r in got] == [0]


def test_dsir_weights_favor_target_vocab(spark):
    """Docs sharing the target slice's vocabulary get strictly higher
    log-weights than docs made of off-target tokens."""
    rows = (
        [("alpha beta gamma delta", "en")] * 5
        + [("omega psi chi phi", "zh")] * 5
    )
    docs = _docs(spark, rows)
    w = dsir_log_weights(docs, F.col("lang") == "en", buckets=64)
    got = {r.doc_id: r.log_weight for r in w.collect()}
    en = [got[i] for i in range(5)]
    zh = [got[i] for i in range(5, 10)]
    assert min(en) > max(zh)
    assert w.count() == 10


def test_dsir_select_top_deterministic_ties(spark):
    rows = [("alpha beta", "en")] * 4 + [("omega psi", "zh")] * 4
    docs = _docs(spark, rows)
    w = dsir_log_weights(docs, F.col("lang") == "en", buckets=64)
    top = dsir_select_top(w, 3).collect()
    # all 4 en docs tie on weight; doc_id breaks the tie ascending
    assert [r.doc_id for r in top] == [0, 1, 2]


def test_dsir_n_tokens_counts_all_tokens(spark):
    docs = _docs(spark, [("a b c", "en"), ("d d", "zh")])
    w = dsir_log_weights(docs, F.col("lang") == "en", buckets=16)
    got = {r.doc_id: r.n_tokens for r in w.collect()}
    assert got == {0: 3, 1: 2}


def test_char_lm_score_map_matches_join_path(spark):
    """The streaming-safe mapInPandas scorer must reproduce the
    Catalyst join-based scorer exactly at round(6), including unseen
    grams/contexts and dropped sub-trigram docs."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        char_lm_score_map,
        collect_char_lm,
    )

    ref = _docs(spark, [("the quick brown fox", "en")] * 3)
    docs = _docs(
        spark,
        [
            ("the quick brown fox", "en"),
            ("zzz@@@### unseen alphabet", "xx"),
            ("ab", "en"),  # dropped by both paths
        ],
    )
    want = sorted(
        map(tuple, char_lm_score(docs, ref).collect())
    )
    got = sorted(
        map(tuple, char_lm_score_map(docs, collect_char_lm(ref)).collect())
    )
    assert got == want
    assert len(got) == 2


def test_dsir_score_map_matches_join_path(spark):
    """The streaming-safe DSIR map scorer must reproduce the Catalyst
    join path exactly at round(6) — same sha256 buckets, same add-alpha
    smoothing."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        collect_dsir_model,
        dsir_score_map,
    )

    rows = (
        [("alpha beta gamma delta", "en")] * 5
        + [("omega psi chi phi", "zh")] * 5
    )
    docs = _docs(spark, rows)
    want = sorted(
        map(tuple, dsir_log_weights(
            docs, F.col("lang") == "en", buckets=64
        ).collect())
    )
    got = sorted(
        map(tuple, dsir_score_map(
            docs, collect_dsir_model(docs, F.col("lang") == "en", buckets=64)
        ).collect())
    )
    assert got == want


def test_collect_char_lm_size_guard_fires(spark):
    """A unicode-heavy reference slice (CJK-style wide alphabet) must
    trip the fail-fast max_model_rows budget BEFORE the model lands on
    the driver, with the remediation in the message."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        collect_char_lm,
    )

    # 40 distinct CJK chars in one string -> 38 distinct trigrams +
    # 38 contexts (trigram prefixes) = 76 model rows
    cjk = "".join(chr(0x4E00 + i) for i in range(40))
    ref = _docs(spark, [(cjk, "zh")])
    with pytest.raises(ValueError, match="min_count"):
        collect_char_lm(ref, max_model_rows=50)
    # raising the budget (or disabling it) admits the same model
    tri_d, ctx_d, v = collect_char_lm(ref, max_model_rows=76)
    assert len(tri_d) == 38 and len(ctx_d) == 38 and v == 40
    tri_d2, _, _ = collect_char_lm(ref, max_model_rows=None)
    assert tri_d2 == tri_d


def test_collect_char_lm_min_count_prunes_to_smoothing_floor(spark):
    """min_count pruning drops rare trigram NUMERATORS to the add-alpha
    unseen floor while context totals stay exact: common grams score
    identically, pruned grams score exactly like unseen grams of the
    same context."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        char_lm_score_map,
        collect_char_lm,
    )

    ref = _docs(spark, [("abcabcabc", "en"), ("abx", "en")])
    full = collect_char_lm(ref)
    pruned = collect_char_lm(ref, min_count=2)
    assert "abx" in full[0] and "abx" not in pruned[0]
    # contexts and vocab unchanged by pruning
    assert pruned[1] == full[1] and pruned[2] == full[2]
    docs = _docs(spark, [("abcabc", "en"), ("abx", "en"), ("abq", "en")])
    got = {
        r.doc_id: r.avg_logp
        for r in char_lm_score_map(docs, pruned).collect()
    }
    # common-gram doc unchanged vs the exact model
    exact = {
        r.doc_id: r.avg_logp
        for r in char_lm_score_map(docs, full).collect()
    }
    assert got[0] == exact[0]
    # pruned gram "abx" now scores exactly like never-seen "abq"
    assert got[1] == got[2]


def test_char_lm_score_map_unicode_parity(spark):
    """The vectorized codepoint-packed scorer must match the Catalyst
    join path on CJK and non-BMP (emoji) text — the packing uses 21-bit
    codepoints, so astral-plane chars are the edge to prove."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        char_lm_score_map,
        collect_char_lm,
    )

    ref = _docs(
        spark,
        [
            ("你好世界你好", "zh"),
            ("\U0001f600\U0001f601\U0001f600\U0001f601x", "xx"),
        ],
    )
    docs = _docs(
        spark,
        [
            ("你好世界", "zh"),
            ("\U0001f600\U0001f601\U0001f600", "xx"),
            ("mixed 你\U0001f600 tail", "mx"),
        ],
    )
    want = sorted(map(tuple, char_lm_score(docs, ref).collect()))
    got = sorted(
        map(tuple, char_lm_score_map(docs, collect_char_lm(ref)).collect())
    )
    assert got == want and len(got) == 3


def test_corpus_select_pipeline_composition(spark):
    """The composed pipeline's survivors (a) pass the quality gate,
    (b) are dedup representatives (unique texts, min id kept), (c) all
    clear the bits_per_gram bucket, and (d) are exactly the k highest
    DSIR weights among bucket survivors (ties by id)."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        corpus_select_pipeline,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = corpus_select_pipeline(
        docs, F.col("lang") == "en", k=10, max_bits=1.2
    ).collect()
    assert len(out) == 10
    assert all(r.bits_per_gram <= 1.2 for r in out)
    # weights strictly ordered after sorting desc, ties by id
    ws = sorted(((-r.log_weight, r.doc_id) for r in out))
    assert ws == sorted(ws)
    # selected ids must be unique and reference real docs
    ids = [r.doc_id for r in out]
    assert len(set(ids)) == 10
    texts = {
        r.doc_id: r.text
        for r in docs.filter(F.col("doc_id").isin(ids)).collect()
    }
    assert len(set(texts.values())) == 10  # dedup: no two share a text


def test_dsir_select_token_budget_crossing_doc_included(spark):
    """Docs ordered by weight desc fill the budget; the doc that
    CROSSES the budget is kept, everything after is not; a budget
    beyond the corpus keeps everything."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        dsir_select_token_budget,
    )

    w = spark.createDataFrame(
        [(1, 50, 3.0), (2, 40, 2.0), (3, 30, 1.0), (4, 20, 0.5)],
        "doc_id long, n_tokens long, log_weight double",
    )
    got = {r.doc_id: r.cum_tokens
           for r in dsir_select_token_budget(w, 100).collect()}
    # 50 + 40 = 90 < 100 -> doc 3 crosses (preceding 90 < 100), doc 4
    # is out (preceding 120 >= 100)
    assert got == {1: 50, 2: 90, 3: 120}
    assert dsir_select_token_budget(w, 1000).count() == 4
    assert dsir_select_token_budget(w, 1).count() == 1  # first doc always


def test_mixture_token_budget_per_source_fill(spark):
    """Each source's slice fills independently: budgets split by share,
    per-source best-first order, crossing doc included, unlisted
    sources excluded."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        mixture_token_budget,
    )

    w = spark.createDataFrame(
        [
            (1, "a", 60, 3.0), (2, "a", 60, 2.0), (3, "a", 60, 1.0),
            (4, "b", 30, 5.0), (5, "b", 30, 4.0),
            (6, "c", 10, 9.0),  # unlisted -> excluded
        ],
        "doc_id long, source string, n_tokens long, log_weight double",
    )
    got = {
        r.doc_id: (r.source, r.cum_tokens)
        for r in mixture_token_budget(w, {"a": 0.5, "b": 0.5}, 200).collect()
    }
    # a's budget 100: doc1 (pre 0), doc2 (pre 60 < 100, crossing), not
    # doc3 (pre 120); b's budget 100: both fit (pre 0, 30)
    assert got == {1: ("a", 60), 2: ("a", 120), 4: ("b", 30), 5: ("b", 60)}
    import pytest as _pt

    with _pt.raises(ValueError):
        mixture_token_budget(w, {}, 100)


def test_model_tables_roundtrip_and_errors(spark, tmp_path):
    """save/load preserves model tables and meta exactly; scoring with
    the reloaded model matches the train-in-place path; bad inputs
    fail loudly."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        char_lm_score,
        train_char_lm,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.models import (
        load_model_tables,
        save_model_tables,
    )

    ref = _docs(spark, [("the quick brown fox", "en")] * 2)
    docs = _docs(spark, [("the quick brown", "en"), ("zzz yyy xxx", "xx")])
    tri, ctx, vocab = train_char_lm(ref)
    p = str(tmp_path / "m")
    save_model_tables(p, {"tri": tri, "ctx": ctx, "vocab": vocab},
                      meta={"alpha": 0.5})
    loaded, meta = load_model_tables(spark, p)
    assert meta == {"alpha": 0.5}
    want = sorted(map(tuple, char_lm_score(docs, ref).collect()))
    got = sorted(map(tuple, char_lm_score(
        docs, model=(loaded["tri"], loaded["ctx"], loaded["vocab"])
    ).collect()))
    assert got == want
    with pytest.raises(ValueError):
        save_model_tables(p, {})
    with pytest.raises(ValueError):
        save_model_tables(p, {"_bad": tri})
    with pytest.raises(FileNotFoundError):
        load_model_tables(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError):
        char_lm_score(docs)  # neither ref nor model
    with pytest.raises(ValueError):
        char_lm_score(docs, ref, model=(tri, ctx, vocab))  # both


def test_model_tables_roundtrip_file_uri(spark, tmp_path):
    """The manifest goes through the Hadoop FileSystem API, so a
    file:-scheme URI (the local stand-in for hdfs:/s3a: paths)
    round-trips identically — no POSIX open() anywhere in the save or
    load path."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        train_char_lm,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.models import (
        load_model_tables,
        save_model_tables,
    )

    ref = _docs(spark, [("the quick brown fox", "en")] * 2)
    tri, ctx, vocab = train_char_lm(ref)
    p = "file://" + str(tmp_path / "m_uri")
    save_model_tables(p, {"tri": tri, "vocab": vocab}, meta={"k": [1, 2]})
    loaded, meta = load_model_tables(spark, p)
    assert meta == {"k": [1, 2]}
    assert sorted(loaded) == ["tri", "vocab"]
    assert sorted(map(tuple, loaded["tri"].collect())) == sorted(
        map(tuple, tri.collect())
    )


def test_char_lm_incremental_merge_equals_full_train(spark):
    """Merged additive artifacts score bit-identically to a full
    retrain, including when the halves have disjoint alphabets; the
    artifact round-trips through model persistence."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        char_lm_from_tables,
        char_lm_score,
        merge_char_lm_tables,
        train_char_lm_tables,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.models import (
        load_model_tables,
        save_model_tables,
    )

    ref_a = _docs(spark, [("the quick brown fox jumps", "en")] * 2)
    ref_b = _docs(spark, [("ZEBRA! 123 ZEBRA? 456", "en")] * 3)
    full = _docs(
        spark,
        [("the quick brown fox jumps", "en")] * 2
        + [("ZEBRA! 123 ZEBRA? 456", "en")] * 3,
    )
    docs = _docs(
        spark, [("the quick zebra", "en"), ("fox 123!", "xx")]
    )
    merged = merge_char_lm_tables(
        train_char_lm_tables(ref_a), train_char_lm_tables(ref_b)
    )
    got = sorted(
        map(
            tuple,
            char_lm_score(docs, model=char_lm_from_tables(merged)).collect(),
        )
    )
    want = sorted(map(tuple, char_lm_score(docs, full).collect()))
    assert got == want
    # vocab of the merge is the union alphabet, not a sum of sizes
    v_merged = char_lm_from_tables(merged)[2].first()["v"]
    va = char_lm_from_tables(train_char_lm_tables(ref_a))[2].first()["v"]
    vb = char_lm_from_tables(train_char_lm_tables(ref_b))[2].first()["v"]
    assert v_merged < va + vb  # ' ' at least is shared
    assert v_merged >= max(va, vb)


def test_char_lm_tables_persist_roundtrip(spark, tmp_path):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        char_lm_from_tables,
        char_lm_score,
        merge_char_lm_tables,
        train_char_lm_tables,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.models import (
        load_model_tables,
        save_model_tables,
    )

    ref = _docs(spark, [("alpha beta gamma", "en")] * 2)
    docs = _docs(spark, [("alpha gamma", "en")])
    t = train_char_lm_tables(ref)
    save_model_tables(str(tmp_path / "lm"), t, meta={"kind": "char_lm"})
    loaded, meta = load_model_tables(spark, str(tmp_path / "lm"))
    assert meta["kind"] == "char_lm"
    got = char_lm_score(docs, model=char_lm_from_tables(loaded)).collect()
    want = char_lm_score(docs, ref).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        merge_char_lm_tables()
    with _pytest.raises(ValueError, match="'tri' and 'chars'"):
        char_lm_from_tables({"tri": t["tri"]})


def test_corpus_select_funnel_by_source_sums_to_scalar(spark):
    """Per-source funnel rows sum to the scalar funnel at every stage
    (same stage construction, just sliced)."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        corpus_select_funnel,
    )

    rows = []
    texts = [
        "the quick brown fox jumps over a lazy dog and runs far away home",
        "a calm cat naps beside the warm stone wall in quiet afternoon sun",
        "numbers and words mix here the of is and a pattern keeps going on",
    ]
    for i in range(30):
        rows.append(
            (i, texts[i % 3] + f" tail{i} w{i}b w{i}c",
             "en" if i % 2 == 0 else "de",
             f"src{i % 3}")
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    scalar = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in corpus_select_funnel(docs, F.col("lang") == "en", k=5).collect()
    }
    by_src = corpus_select_funnel(
        docs, F.col("lang") == "en", k=5, group_col="source"
    ).collect()
    agg: dict = {}
    for r in by_src:
        d, t = agg.get(r["stage"], (0, 0))
        agg[r["stage"]] = (d + r["n_docs"], t + r["n_tokens"])
    assert agg == {k: v for k, v in scalar.items() if v[0] > 0}


def test_mixture_redistribute_waterfills_dry_source(spark):
    """A source that runs dry hands its leftover budget to the others
    in share proportion; results equal the plain form when nothing
    runs dry; integer shares are enforced."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        mixture_token_budget,
        mixture_token_budget_redistribute,
    )

    w = spark.createDataFrame(
        [
            (1, "a", 60, 3.0), (2, "a", 60, 2.0), (3, "a", 60, 1.0),
            (7, "a", 60, 0.5),
            (4, "b", 30, 5.0), (5, "b", 30, 4.0),
            (6, "c", 10, 9.0),
        ],
        "doc_id long, source string, n_tokens long, log_weight double",
    )
    # budget 200 at 60/30/10 (totals a=240, b=60, c=10) — a CASCADE:
    # round 1: c dry (10 < slice 20); round 2: rem=190/90 lifts b's
    # slice to 63.3 so b goes dry too (60*90=5400 < 190*30=5700);
    # round 3: a alone, rem=130 — docs 1,2 fit, doc3 crosses
    # (prefix 120*60=7200 < 130*60=7800), doc7 (prefix 180) is out.
    got = {
        r.doc_id: r.source
        for r in mixture_token_budget_redistribute(
            w, {"a": 60, "b": 30, "c": 10}, 200
        ).collect()
    }
    assert got == {1: "a", 2: "a", 3: "a", 4: "b", 5: "b", 6: "c"}

    # nothing runs dry (slices 50/50 vs totals 240/60) -> identical
    # selection to the plain form
    plain = {
        r.doc_id
        for r in mixture_token_budget(w, {"a": 0.5, "b": 0.5}, 100).collect()
    }
    redis = {
        r.doc_id
        for r in mixture_token_budget_redistribute(
            w, {"a": 1, "b": 1}, 100
        ).collect()
    }
    assert plain == redis and plain == {1, 4, 5}

    # budget above the whole corpus -> everything admitted
    all_in = mixture_token_budget_redistribute(
        w, {"a": 1, "b": 1, "c": 1}, 10_000
    ).count()
    assert all_in == 7

    import pytest as _pt

    with _pt.raises(ValueError, match="INTEGER"):
        mixture_token_budget_redistribute(w, {"a": 0.5}, 100)
    with _pt.raises(ValueError, match="INTEGER"):
        mixture_token_budget_redistribute(w, {"a": True}, 100)
    with _pt.raises(ValueError, match="at least one"):
        mixture_token_budget_redistribute(w, {}, 100)


def test_mixture_budget_null_weights_sort_last(spark):
    """NULL log_weight docs get the budget LAST (the pre-r11 Window
    desc() NULLS LAST contract), not first."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        mixture_token_budget,
    )

    w = spark.createDataFrame(
        [(1, "a", 50, None), (2, "a", 50, 1.0), (3, "a", 50, 2.0)],
        "doc_id long, source string, n_tokens long, log_weight double",
    )
    got = sorted(
        r.doc_id for r in mixture_token_budget(w, {"a": 1.0}, 100).collect()
    )
    assert got == [2, 3]  # the weighted docs, never the NULL one first


def test_save_model_tables_deletes_stale_manifest_first(spark, tmp_path):
    """Overwriting a model directory removes the OLD manifest before
    any table writes, so a mid-save crash leaves the dir unloadable
    instead of a torn old/new mix."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        train_char_lm,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.models import (
        _META,
        _hadoop_fs,
        _join,
        load_model_tables,
        save_model_tables,
    )

    ref = _docs(spark, [("alpha beta gamma", "en")] * 2)
    tri, ctx, vocab = train_char_lm(ref)
    p = str(tmp_path / "m")
    save_model_tables(p, {"tri": tri}, meta={"v": 1})
    # simulate the crash point: manifest deleted, tables half-written
    fs, hp = _hadoop_fs(spark, _join(p, _META))
    assert fs.exists(hp)
    fs.delete(hp, False)
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        load_model_tables(spark, p)
    # a fresh complete save loads again
    save_model_tables(p, {"tri": tri}, meta={"v": 2})
    _, meta = load_model_tables(spark, p)
    assert meta == {"v": 2}
