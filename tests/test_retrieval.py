"""BM25 retrieval + KMV sketch: differential tests against independent
pure-Python references (no Spark in the oracle path)."""

from __future__ import annotations

import hashlib
import math

import pytest

from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
    kmv_distinct,
)
from multi_sensor_data_pipeline_for_robotics__spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_multi,
    corpus_stats,
)

DOCS = [
    (0, "spark window sort spark hash"),
    (1, "merge batch value value value"),
    (2, "spark spark spark spark spark"),
    (3, "window window hash sort merge"),
    (4, "the quick brown fox jumps"),
    (5, "hash"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.split(" ") for d, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if s > 0:
            scores[d] = round(s, 6)
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_pure_python(spark, docs_df):
    terms = ["spark", "hash"]
    got = {
        r.doc: r.score for r in bm25_topk(docs_df, terms, k=10).collect()
    }
    assert got == _py_bm25(DOCS, terms)


def test_bm25_rank_deterministic_and_capped(spark, docs_df):
    rows = bm25_topk(docs_df, ["spark", "hash", "window"], k=2).collect()
    assert [r.rank for r in rows] == [1, 2]
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_precomputed_corpus_stats_equivalent(spark, docs_df):
    stats = corpus_stats(docs_df)
    a = sorted(map(tuple, bm25_topk(docs_df, ["hash"], k=10).collect()))
    b = sorted(
        map(tuple, bm25_topk(docs_df, ["hash"], k=10, corpus=stats).collect())
    )
    assert a == b


def test_bm25_multi_matches_single_query(spark, docs_df):
    qs = spark.createDataFrame(
        [(7, ["spark", "hash"]), (9, ["merge"])],
        "query_id long, terms array<string>",
    )
    multi = bm25_topk_multi(docs_df, qs, k=10).collect()
    for qid, terms in [(7, ["spark", "hash"]), (9, ["merge"])]:
        single = {
            (r.doc, r.score, r.rank)
            for r in bm25_topk(docs_df, terms, k=10).collect()
        }
        got = {
            (r.doc, r.score, r.rank) for r in multi if r.query_id == qid
        }
        assert got == single, f"query {qid} diverged from single-query path"


def _py_kmv(values, k=64):
    hs = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in values
        }
    )
    m = min(len(hs), k)
    if m < k:
        return float(m), m
    return round((k - 1) / (hs[k - 1] / float(16 ** 15)), 4), m


def test_kmv_exact_below_k(spark):
    df = spark.range(10).selectExpr("id as v")
    row = kmv_distinct(df, "v", k=64).first()
    assert row.approx_distinct == 10.0 and row.sketch_m == 10


def test_kmv_matches_pure_python_and_error_bound(spark):
    n = 5000
    df = spark.range(n).selectExpr("id as v")
    row = kmv_distinct(df, "v", k=256).first()
    est, m = _py_kmv(range(n), k=256)
    assert (row.approx_distinct, row.sketch_m) == (est, m)
    # KMV rsd ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row.approx_distinct - n) / n < 0.25


def test_kmv_grouped_matches_global_per_group(spark):
    df = spark.range(2000).selectExpr(
        "id % 7 as g", "id as v"
    )
    per_group = {
        r.g: (r.approx_distinct, r.sketch_m)
        for r in kmv_distinct(df, "v", k=64, group_col="g").collect()
    }
    for g in range(7):
        sub = df.filter(f"g = {g}")
        row = kmv_distinct(sub, "v", k=64).first()
        assert per_group[g] == (row.approx_distinct, row.sketch_m)


def test_kmv_duplicates_do_not_inflate(spark):
    base = spark.range(300).selectExpr("id as v")
    dup = base.union(base).union(base)
    a = kmv_distinct(base, "v", k=64).first()
    b = kmv_distinct(dup, "v", k=64).first()
    assert (a.approx_distinct, a.sketch_m) == (b.approx_distinct, b.sketch_m)


def _py_hist_q(values, qs, bins, lo, hi, round_to=6):
    import math as _m

    w = (hi - lo) / bins
    counts = {}
    for v in values:
        b = min(max(_m.floor((v - lo) / w), 0), bins - 1)
        counts[b] = counts.get(b, 0) + 1
    n = len(values)
    out = {}
    cum = 0
    items = sorted(counts.items())
    for q in qs:
        t = q * n
        c = 0
        for b, cnt in items:
            if c + cnt >= t and c < t:
                out[q] = round(lo + w * (b + (t - c) / cnt), round_to)
                break
            c += cnt
    return out


def test_hist_quantiles_matches_pure_python_and_exact(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        histogram_quantiles,
    )

    vals = [((i * 2654435761) % 10007) / 10.007 for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r.q: r.quantile
        for r in histogram_quantiles(
            df, "v", qs=(0.5, 0.9, 0.99), bins=512, lo=0.0, hi=1000.0
        ).collect()
    }
    assert got == _py_hist_q(vals, (0.5, 0.9, 0.99), 512, 0.0, 1000.0)
    # estimate within one bin width of the exact quantile
    sv = sorted(vals)
    for q, est in got.items():
        exact = sv[min(int(q * len(sv)), len(sv) - 1)]
        assert abs(est - exact) <= 1000.0 / 512 + 1e-9


def test_hist_quantiles_grouped_and_auto_bounds(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        histogram_quantiles,
    )

    df = spark.range(4000).selectExpr(
        "id % 4 as g", "cast(id as double) / 7.0 as v"
    )
    grouped = {
        (r.g, r.q): r.quantile
        for r in histogram_quantiles(
            df, "v", qs=(0.5, 0.9), bins=256, group_col="g",
            lo=0.0, hi=600.0,
        ).collect()
    }
    assert len(grouped) == 8
    for g in range(4):
        solo = {
            r.q: r.quantile
            for r in histogram_quantiles(
                df.filter(f"g = {g}"), "v", qs=(0.5, 0.9), bins=256,
                lo=0.0, hi=600.0,
            ).collect()
        }
        for q, v in solo.items():
            assert grouped[(g, q)] == v
    # auto-bounds path (min/max pre-scan) still lands near the exact
    auto = {
        r.q: r.quantile
        for r in histogram_quantiles(df, "v", qs=(0.5,), bins=1024).collect()
    }
    assert abs(auto[0.5] - (3999 / 2) / 7.0) < 600.0 / 1024


def test_hist_quantiles_rejects_out_of_domain_q(spark):
    import pytest as _pytest

    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        histogram_quantiles,
    )

    df = spark.range(10).selectExpr("cast(id as double) as v")
    for bad in (0.0, -0.1, 1.5):
        with _pytest.raises(ValueError):
            histogram_quantiles(df, "v", qs=(bad,), lo=0.0, hi=10.0)


def test_kmv_merge_equals_direct(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        kmv_distinct,
        kmv_merge_estimate,
        kmv_sketch,
    )

    df = spark.range(3000).selectExpr("id as v", "id % 3 as part")
    direct = kmv_distinct(df, "v", k=64).first()
    sketches = [
        kmv_sketch(df.filter(f"part = {p}"), "v", k=64) for p in range(3)
    ]
    merged = kmv_merge_estimate(sketches, k=64).first()
    # union-then-top-k is lossless: merged == direct, bit for bit
    assert (merged.approx_distinct, merged.sketch_m) == (
        direct.approx_distinct, direct.sketch_m
    )


def test_hist_merge_equals_direct(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        hist_merge_quantiles,
        hist_sketch,
        histogram_quantiles,
    )

    df = spark.range(5000).selectExpr(
        "cast(id as double) / 3.0 as v", "id % 4 as part"
    )
    direct = {
        r.q: r.quantile
        for r in histogram_quantiles(
            df, "v", qs=(0.5, 0.9), bins=256, lo=0.0, hi=2000.0
        ).collect()
    }
    sketches = [
        hist_sketch(df.filter(f"part = {p}"), "v", bins=256, lo=0.0, hi=2000.0)
        for p in range(4)
    ]
    merged = {
        r.q: r.quantile
        for r in hist_merge_quantiles(
            sketches, qs=(0.5, 0.9), bins=256, lo=0.0, hi=2000.0
        ).collect()
    }
    assert merged == direct  # count merge is lossless, bit for bit


def test_bm25_no_matches_and_unknown_terms(spark, docs_df):
    # terms absent from the corpus: empty result, no error
    assert bm25_topk(docs_df, ["zzzz", "qqqq"], k=5).count() == 0
    # mix of known and unknown terms: unknown ones contribute nothing
    known = {r.doc: r.score for r in bm25_topk(docs_df, ["hash"], k=10).collect()}
    mixed = {
        r.doc: r.score
        for r in bm25_topk(docs_df, ["hash", "zzzz"], k=10).collect()
    }
    assert mixed == known


def test_bm25_multi_empty_terms_query(spark, docs_df):
    qs = spark.createDataFrame(
        [(1, ["spark"]), (2, [])], "query_id long, terms array<string>"
    )
    out = bm25_topk_multi(docs_df, qs, k=5).collect()
    assert {r.query_id for r in out} == {1}  # empty-terms query yields no rows


def test_tfidf_cosine_pairs_identical_and_disjoint(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.retrieval import (
        tfidf_cosine_pairs,
    )
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "alpha beta gamma delta",
                    "alpha beta gamma delta",        # identical to 1
                    "alpha beta gamma epsilon",      # 3/4 shared tokens
                    "zeta eta theta iota",           # disjoint
                ],
            }
        )
    )
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(df, threshold=0.1).collect()
    }
    assert got[(1, 2)] == 1.0  # identical docs -> exact cosine 1
    assert 0.3 < got[(1, 3)] < 1.0 and got[(1, 3)] == got[(2, 3)]
    assert not any(4 in p for p in got)  # disjoint doc pairs with nobody
    # df cap drops the universally shared token: pairs connected ONLY
    # through it vanish
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["common one", "common two", "common three"],
            }
        )
    )
    capped = tfidf_cosine_pairs(df2, threshold=0.01, max_token_df=2)
    assert capped.count() == 0


def test_tfidf_cosine_uncapped_fanout_guard_fires(spark):
    import pytest
    from multi_sensor_data_pipeline_for_robotics__spark.operators.retrieval import (
        tfidf_cosine_pairs,
    )

    # a corpus-wide stopword: 60 docs all share "the" -> sum(df^2) >= 3600
    docs = spark.createDataFrame(
        [(i, f"the unique{i} word{i % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    plan = tfidf_cosine_pairs(docs, threshold=0.1, fanout_budget=1000)
    with pytest.raises(Exception, match="fanout_budget|max_token_df"):
        plan.count()
    # under budget: runs clean; with a cap: guard skipped entirely
    assert tfidf_cosine_pairs(docs, threshold=0.1, fanout_budget=10**9).count() >= 0
    assert (
        tfidf_cosine_pairs(
            docs, threshold=0.1, max_token_df=2, fanout_budget=1000
        ).count()
        >= 0
    )


def test_rrf_fuse_known_ranks(spark):
    """Hand-checked fusion: doc in both systems beats docs in one; the
    reciprocal terms round before an exact decimal sum; ties break by
    doc id; absent docs contribute nothing."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.retrieval import (
        rrf_fuse,
    )

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc long, rank long",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, doc long, rank long",
    )
    got = {r.doc: r for r in rrf_fuse([a, b], k=10, c=60).collect()}
    # doc 11: 1/62 + 1/61 rounded each to 6dp then summed
    assert got[11].rrf_score == round(1 / 62, 6) + round(1 / 61, 6)
    assert got[11].n_systems == 2 and got[11].rank == 1
    assert got[10].rrf_score == round(1 / 61, 6) and got[10].rank == 2
    assert got[13].rrf_score == round(1 / 62, 6)
    assert got[12].rrf_score == round(1 / 63, 6)
    # 13 (1/62 from rank 2) vs 12 (1/63 from rank 3): 13 ranks higher
    assert got[13].rank == 3 and got[12].rank == 4


def test_rrf_fuse_requires_input(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.operators.retrieval import (
        rrf_fuse,
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        rrf_fuse([])


def test_rrf_fuse_respects_round_to(spark):
    """round_to > 6 must survive the exact decimal sum (the decimal
    scale follows round_to instead of truncating back to 6)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.retrieval import (
        rrf_fuse,
    )

    a = spark.createDataFrame([(0, 10, 1)], "query_id long, doc long, rank long")
    b = spark.createDataFrame([(0, 10, 2)], "query_id long, doc long, rank long")
    r8 = rrf_fuse([a, b], k=5, c=60, round_to=8).collect()[0]
    assert r8.rrf_score == round(1 / 61, 8) + round(1 / 62, 8)
    r2 = rrf_fuse([a, b], k=5, c=60, round_to=2).collect()[0]
    assert r2.rrf_score == round(1 / 61, 2) + round(1 / 62, 2)
