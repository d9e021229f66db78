#!/usr/bin/env python
"""Large-input smoke: run the flagship operator families at 10-100x the
bench scale on synthetic data, printing wall times and row counts.

This is the local stand-in for "does the plan survive a scale-up":
every fixture is generated DISTRIBUTED (spark.range + hash/counter
PRNG, no driver-side materialization), written to scratch parquet once
so generation stays out of the timings, and each operator is forced
with an aggregation over its real output columns (so Catalyst cannot
prune the interesting part of the plan away).

Usage:  python tools/scale_smoke.py [--quick] [family ...]
        --quick divides all sizes by 10 (CI-sized sanity run)
        family: any of sync, keyed_asof, dedup, ann, retrieval
        (default: all)

Results are recorded per round in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark import get_session


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt:8.2f}s   {out}")
    return dt, out


def release_storage(spark) -> None:
    """Unpersist every retained RDD/relation between families.
    Several operators localCheckpoint intermediates; in a REAL job the
    blocks die with the job's JVM, but this suite runs 16 heavy
    families in ONE session — without explicit release the retained
    blocks accumulate until the heap dies mid-suite (observed at
    family 13 of a full run; per-family invocations never hit it)."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in jmap.values():
            rdd.unpersist()
        spark.catalog.clearCache()
    except Exception as exc:  # non-JVM session: nothing retained
        print(f"   (release_storage skipped: {exc})")


def main() -> None:
    quick = "--quick" in sys.argv
    div = 10 if quick else 1
    fams = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "sync", "keyed_asof", "dedup", "ann", "retrieval", "timeseries",
        "substring", "semdedup", "layout", "kmv_hot", "semdedup_cap",
        "topk_hot", "snm", "salted", "gsample_hot", "rank_norm",
        "selection", "diag", "lpa", "hardneg",
        "mixture_hot", "stream_screen", "audits", "stream_budget",
        "hot_cluster", "budget_epochs", "bpe",
    ]
    spark = get_session(app_name="scale_smoke")
    scratch = tempfile.mkdtemp(prefix="spark_graft_scale_")
    print(f"# scale smoke ({'quick ' if quick else ''}scratch={scratch})")
    try:
        if "sync" in fams:
            smoke_synchronize(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "keyed_asof" in fams:
            smoke_keyed_asof(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "dedup" in fams:
            smoke_dedup_lsh(spark, scratch, n_docs=2_000_000 // div)
            release_storage(spark)
        if "ann" in fams:
            smoke_ann(spark, scratch, n_vecs=1_000_000 // div)
            release_storage(spark)
        if "retrieval" in fams:
            smoke_retrieval_sketches(spark, scratch, n_docs=2_000_000 // div)
            release_storage(spark)
        if "timeseries" in fams:
            smoke_timeseries(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "substring" in fams:
            smoke_substring(spark, scratch, n_docs=500_000 // div)
            release_storage(spark)
        if "semdedup" in fams:
            smoke_semdedup(spark, scratch, n_vecs=50_000 // div)
            release_storage(spark)
        if "layout" in fams:
            smoke_layout(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "kmv_hot" in fams:
            smoke_kmv_hot_group(spark, scratch, n=24_000_000 // div)
            release_storage(spark)
        if "semdedup_cap" in fams:
            smoke_semdedup_hot_cluster(spark, scratch, n_vecs=20_000 // div)
            release_storage(spark)
        if "topk_hot" in fams:
            smoke_topk_hot_group(spark, scratch, n=24_000_000 // div)
            release_storage(spark)
        if "snm" in fams:
            smoke_sorted_neighborhood(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "salted" in fams:
            smoke_salted_join(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "gsample_hot" in fams:
            smoke_group_sample_hot(spark, scratch, n=24_000_000 // div)
            release_storage(spark)
        if "rank_norm" in fams:
            smoke_rank_normalize(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "selection" in fams:
            smoke_selection(spark, scratch, n_docs=2_000_000 // div)
            release_storage(spark)
        if "diag" in fams:
            smoke_ts_diag(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "lpa" in fams:
            smoke_label_prop(spark, scratch, n_edges=5_000_000 // div)
            release_storage(spark)
        if "hardneg" in fams:
            smoke_hard_negatives(spark, scratch, n_vecs=1_000_000 // div)
            release_storage(spark)
        if "mixture_hot" in fams:
            smoke_mixture_hot_source(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "stream_screen" in fams:
            smoke_stream_screen(spark, scratch, n_docs=2_000_000 // div)
            release_storage(spark)
        if "audits" in fams:
            smoke_audits(spark, scratch, n_docs=500_000 // div,
                         n_vecs=100_000 // div)
            release_storage(spark)
        if "stream_budget" in fams:
            smoke_stream_budget(spark, scratch, n=20_000_000 // div)
            release_storage(spark)
        if "hot_cluster" in fams:
            smoke_hot_cluster(
                spark, scratch, n_docs=500_000 // div, cluster=50_000 // div
            )
            release_storage(spark)
        if "budget_epochs" in fams:
            smoke_budget_epochs(spark, scratch, epochs=200 // div)
            release_storage(spark)
        if "bpe" in fams:
            smoke_bpe(spark, scratch, n_docs=2_000_000 // div)
            release_storage(spark)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def smoke_synchronize(spark, scratch, n):
    """Full sync pipeline at n rows/sensor (bench extras: 2M)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.sync import (
        synchronize,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources import datagen

    print(f"\n## synchronize @ {n:,} rows/sensor")
    datagen.generate_camera(spark, n=n, freq_hz=30_000.0).write.mode(
        "overwrite"
    ).parquet(f"{scratch}/cam")
    datagen.generate_motion(spark, n=n, freq_hz=25_000.0).write.mode(
        "overwrite"
    ).parquet(f"{scratch}/mot")
    cam = spark.read.parquet(f"{scratch}/cam")
    mot = spark.read.parquet(f"{scratch}/mot")
    for label, rc in (("raw", False), ("reduce_cells", True)):
        timed(
            f"synchronize nearest {label}",
            lambda rc=rc: synchronize(cam, mot, method="nearest", reduce_cells=rc)
            .df.agg(
                F.count(F.lit(1)).alias("rows"),
                F.round(F.sum("camera_object_x"), 2).alias("sx"),
            )
            .first(),
        )


def smoke_keyed_asof(spark, scratch, n):
    """Keyed as-of at n left rows, 90% on one hot key."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.sync import (
        asof_join_keyed,
    )

    print(f"\n## keyed as-of @ {n:,} x {n // 2:,} rows, 90% hot key")
    span_us = 24 * 3_600_000_000
    base_us = 1_704_067_200_000_000

    def gen(m, seed):
        h = F.abs(F.hash((F.col("id") + seed).cast("string")))
        return spark.range(m).select(
            F.col("id"),
            F.when(h % 10 < 9, F.lit(0)).otherwise((h % 9973).cast("long")).alias("k"),
            F.timestamp_micros(
                F.lit(base_us)
                + F.abs(F.hash((F.col("id") * 31 + seed).cast("string"))) % span_us
            ).alias("ts"),
            (h % 100000).cast("double").alias("v"),
        )

    gen(n, 1).write.mode("overwrite").parquet(f"{scratch}/kl")
    gen(n // 2, 2).write.mode("overwrite").parquet(f"{scratch}/kr")
    l = spark.read.parquet(f"{scratch}/kl").drop("v")
    r = spark.read.parquet(f"{scratch}/kr").select("ts", "k", "v")
    for label, nb in (("bucketed(1024)", 1024), ("direct", None)):
        timed(
            f"asof_join_keyed {label}",
            lambda nb=nb: asof_join_keyed(
                l, r, on="ts", by="k", value_cols=["v"], time_buckets=nb
            )
            .agg(F.count(F.lit(1)).alias("rows"), F.sum("v_r").alias("s"))
            .first(),
        )


def smoke_dedup_lsh(spark, scratch, n_docs):
    """MinHash-LSH near-dup at n_docs synthetic documents, ~10% of which
    are near-copies (token-level perturbations of a shared base)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    print(f"\n## minhash_lsh_pairs @ {n_docs:,} docs (~10% near-dups)")
    # tokens are hex-coded hashes over a ~1M-word vocabulary: two UNIQUE
    # docs share essentially no tokens (a small-vocab corpus would make
    # every pair ~0.4-Jaccard-similar and explode the LSH candidate set
    # into O(n^2) — the first draft of this smoke proved that vividly)
    h = F.abs(F.hash(F.col("id").cast("string")))
    # 90% unique docs (24 words drawn by per-position hash), 10% copies
    # of a base doc with a single-token perturbation. The base count
    # scales with n (~20 copies per base) so the true-pair count stays
    # LINEAR in corpus size — fixed base counts would grow n^2/bases
    # pairs and any pairs-listing operator would rightly blow up.
    n_bases = max(n_docs // 200, 1)
    base_id = ((h / F.lit(10)).cast("long") % n_bases).cast("long")
    is_dup = (h % 10) == 0
    seed = F.when(is_dup, base_id).otherwise(F.col("id") + 1_000_000_000)
    word = lambda s, i: F.conv(
        (F.abs(F.hash(s.cast("string"), i.cast("string"))) % 1_000_000).cast("string"),
        10,
        16,
    )
    toks = F.transform(F.sequence(F.lit(0), F.lit(23)), lambda i: word(seed, i))
    # perturb one position for dup docs so they're NEAR-dups, not exact
    toks = F.when(
        is_dup,
        F.concat(F.slice(toks, 1, 23), F.array(word(F.col("id"), F.lit(99)))),
    ).otherwise(toks)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    )
    docs.write.mode("overwrite").parquet(f"{scratch}/docs")
    d = spark.read.parquet(f"{scratch}/docs")
    timed(
        "minhash_lsh_pairs(threshold=0.7)",
        lambda: minhash_lsh_pairs(d, threshold=0.7)
        .agg(F.count(F.lit(1)).alias("pairs"))
        .first(),
    )


def smoke_ann(spark, scratch, n_vecs):
    """Hyperplane-LSH near-dup + IVF top-k at n_vecs 64-dim vectors."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        ivf_topk,
        lsh_neardup_pairs,
    )

    print(f"\n## ANN @ {n_vecs:,} x 64-dim vectors")
    # clustered synthetic embeddings (~16 vectors per cluster so the
    # true near-dup pair count stays linear in n), center + small noise,
    # all from per-(row, dim) hashes — no RNG, no driver data
    n_clusters = max(n_vecs // 16, 1)
    cl = (F.abs(F.hash(F.col("id").cast("string"))) % n_clusters).cast("string")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            (F.abs(F.hash(cl, i.cast("string"))) % 2000 - 1000) / 1000.0
            + (F.abs(F.hash(F.col("id").cast("string"), i.cast("string"))) % 200 - 100)
            / 1000.0
        ).cast("float"),
    )
    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(f"{scratch}/vecs")
    emb = spark.read.parquet(f"{scratch}/vecs")
    qs = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed(
        "ivf_topk(nlist=64, nprobe=8, k=10)",
        lambda: ivf_topk(emb, qs, k=10, nlist=64, nprobe=8)
        .agg(F.count(F.lit(1)).alias("rows"), F.round(F.avg("cosine"), 4).alias("avg"))
        .first(),
    )
    # the Arrow-batched codes-only scale path: corpus encoded to m ints
    # per vector, ADC scoring via per-query LUTs — this is what a 100 TB
    # deployment runs; exact-scored ivf_topk above is the oracle anchor
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        ivfpq_topk,
    )

    timed(
        "ivfpq_topk(nlist=64, nprobe=8, m=8, k=10)",
        lambda: ivfpq_topk(emb, qs, k=10, nlist=64, nprobe=8, m=8, ksub=16, iters=1)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.round(F.avg("approx_cosine"), 4).alias("avg"),
        )
        .first(),
    )
    # band_bits defaults to the ~log2(n) auto rule — a fixed 8-bit
    # width (256 buckets/band) would put ~n/256 unrelated docs in every
    # bucket here and send the band join quadratic (measured: 146 s for
    # what the scaled width does in ~6 s at 100k vectors)
    timed(
        "lsh_neardup_pairs(threshold=0.9, auto bits)",
        lambda: lsh_neardup_pairs(emb, threshold=0.9, bands=8)
        .agg(F.count(F.lit(1)).alias("pairs"))
        .first(),
    )


def smoke_retrieval_sketches(spark, scratch, n_docs):
    """BM25 + portable sketches at n_docs documents / rows.

    Corpus shape: 20 rare tokens (hex-hash over ~1M vocab — near-zero
    cross-doc overlap) + 4 tokens from a 1,000-word COMMON vocab, so
    query terms have realistic document frequencies (~n/250 each) and
    the postings filter actually selects ~2% of the token stream."""
    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        histogram_quantiles,
        kmv_distinct,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_multi,
    )

    print(f"\n## bm25 / kmv / hist_quantiles @ {n_docs:,} rows")
    rare = lambda s, i: F.conv(
        (F.abs(F.hash(s.cast("string"), i.cast("string"))) % 1_000_000).cast("string"),
        10, 16,
    )
    common = lambda s, i: F.concat(
        F.lit("w"),
        (F.abs(F.hash(s.cast("string"), (i + 100).cast("string"))) % 1_000).cast("string"),
    )
    toks = F.concat(
        F.transform(F.sequence(F.lit(0), F.lit(19)), lambda i: rare(F.col("id"), i)),
        F.transform(F.sequence(F.lit(0), F.lit(3)), lambda i: common(F.col("id"), i)),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    )
    docs.write.mode("overwrite").parquet(f"{scratch}/rdocs")
    d = spark.read.parquet(f"{scratch}/rdocs")
    terms = ["w3", "w77", "w541"]
    timed(
        "bm25_topk(3 terms, k=10)",
        lambda: bm25_topk(d, terms, k=10)
        .agg(F.count(F.lit(1)).alias("rows"), F.round(F.sum("score"), 2).alias("s"))
        .first(),
    )
    qs = spark.createDataFrame(
        [(i, [f"w{i * 37 % 1000}", f"w{i * 101 % 1000}"]) for i in range(8)],
        "query_id long, terms array<string>",
    )
    timed(
        "bm25_topk_multi(8 queries, k=10)",
        lambda: bm25_topk_multi(d, qs, k=10)
        .agg(F.count(F.lit(1)).alias("rows"))
        .first(),
    )
    # sketch inputs: n rows, ~n/10 distinct values, 16 groups
    vals = spark.range(n_docs).select(
        (F.col("id") % 16).alias("g"),
        (F.abs(F.hash(F.col("id").cast("string"))) % (n_docs // 10)).alias("v"),
    )
    vals.write.mode("overwrite").parquet(f"{scratch}/vals")
    v = spark.read.parquet(f"{scratch}/vals")
    timed(
        "kmv_distinct(k=256, 16 groups)",
        lambda: kmv_distinct(v, "v", k=256, group_col="g")
        .agg(
            F.round(F.avg("approx_distinct"), 0).alias("avg_est"),
            F.count(F.lit(1)).alias("groups"),
        )
        .first(),
    )
    timed(
        "exact countDistinct (same input)",
        lambda: v.groupBy("g")
        .agg(F.countDistinct("v").alias("d"))
        .agg(F.round(F.avg("d"), 0).alias("avg_exact"))
        .first(),
    )
    timed(
        "histogram_quantiles(2048 bins, 16 groups)",
        lambda: histogram_quantiles(
            v.select("g", F.col("v").cast("double").alias("x")),
            "x", qs=(0.5, 0.9, 0.99), bins=2048, group_col="g",
            lo=0.0, hi=float(n_docs // 10),
        )
        .agg(F.count(F.lit(1)).alias("rows"), F.round(F.sum("quantile"), 0).alias("s"))
        .first(),
    )


def smoke_timeseries(spark, scratch, n):
    """Rolling stats + 32-lag EWMA at n rows over 64 keys: the cost is
    one shuffle + one per-key sort + O(W) column ops per row — the
    whole point is that W lag terms share ONE window spec, so widening
    W widens arithmetic, not sorts."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.timeseries import (
        ewma,
        rolling_stats,
    )

    print(f"\n## rolling/ewma @ {n:,} rows, 64 keys")
    rows = spark.range(n).select(
        (F.col("id") % 64).cast("string").alias("k"),
        F.col("id").alias("t"),
        ((F.abs(F.hash(F.col("id").cast("string"))) % 100000) / 100.0).alias("v"),
    )
    rows.write.mode("overwrite").parquet(f"{scratch}/ts")
    t = spark.read.parquet(f"{scratch}/ts")
    timed(
        "rolling_stats(W=16)",
        lambda: rolling_stats(t, "k", "t", "v", window_rows=16)
        .agg(F.count(F.lit(1)).alias("rows"), F.round(F.sum("roll_mean"), 0).alias("s"))
        .first(),
    )
    timed(
        "ewma(alpha=0.3, W=32)",
        lambda: ewma(t, "k", "t", "v", alpha=0.3, window_rows=32)
        .agg(F.count(F.lit(1)).alias("rows"), F.round(F.sum("ewma"), 0).alias("s"))
        .first(),
    )




def smoke_substring(spark, scratch, n_docs):
    """Exact-substring span dedup at n_docs synthetic ~200-char docs,
    10% of which embed a shared 80-char passage (one of n_docs/200
    bases, so true duplicated volume stays linear in corpus size).
    The window stream is ~n_docs x 160 rows — the operator's real cost
    driver — and the span output should be ~the number of passage
    carriers."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    print(f"\n## duplicated_spans @ {n_docs:,} docs (~10% share a passage)")
    h = F.abs(F.hash(F.col("id").cast("string")))
    n_bases = max(n_docs // 200, 1)
    base_id = (h % n_bases).cast("long")
    is_dup = (h % 10) == 0
    # unique filler from the doc id; shared passage from the base id
    chunk = lambda s, i, ln: F.substring(
        F.md5(F.concat(s.cast("string"), F.lit("_"), i.cast("string"))), 1, ln
    )
    filler = F.concat(*[chunk(F.col("id") + 7_000_000_000, F.lit(i), 32) for i in range(6)])
    passage = F.concat(*[chunk(base_id, F.lit(i), 32) for i in range(10, 13)])  # 96 chars? 3x32
    text = F.when(
        is_dup, F.concat(F.substring(filler, 1, 60), passage, F.substring(filler, 61, 60))
    ).otherwise(filler)
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))
    docs.write.mode("overwrite").parquet(f"{scratch}/subdocs")
    d = spark.read.parquet(f"{scratch}/subdocs")
    timed(
        "duplicated_spans(k=40)",
        lambda: duplicated_spans(d, k=40)
        .agg(F.count(F.lit(1)).alias("spans"), F.sum("n_windows").alias("wins"))
        .first(),
    )
    timed(
        "remove_duplicated_spans(k=40)",
        lambda: remove_duplicated_spans(d, k=40)
        .agg(
            F.sum("chars_cut").alias("chars_cut"),
            F.sum("n_spans_cut").alias("spans_cut"),
        )
        .first(),
    )


def smoke_semdedup(spark, scratch, n_vecs):
    """SemDeDup at n_vecs synthetic 64-dim vectors drawn around
    n_vecs/100 cluster centers (the paper's regime: nlist grows with
    the corpus so per-cluster membership stays bounded — here nlist=64
    on a synthetic corpus whose natural cluster count is smaller, so
    within-cluster pair volume is the dominant, measured cost)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        semantic_dedup_fixedpoint,
    )

    print(f"\n## semantic_dedup_fixedpoint @ {n_vecs:,} vectors, nlist=64")
    dim = 64
    # n_vecs/100 natural centers, tight 5% noise — the clustered shape
    # SemDeDup assumes; a structureless corpus would put thousands of
    # vectors in one trained cluster and the within-cluster pair stage
    # would rightly go quadratic
    ncent = max(n_vecs // 100, 1)
    base = (F.col("id") % ncent).cast("string")
    comp = lambda i: (
        F.hash(base, F.lit(i)).cast("double") / 2147483647.0
        + 0.05 * F.hash(F.col("id").cast("string"), F.lit(i)).cast("double") / 2147483647.0
    )
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(i).cast("float") for i in range(dim)]).alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet(f"{scratch}/semvecs")
    v = spark.read.parquet(f"{scratch}/semvecs")
    timed(
        "semantic_dedup_fixedpoint(nlist=64)",
        lambda: semantic_dedup_fixedpoint(v, nlist=64, iters=2, threshold=0.9)
        .agg(F.count(F.lit(1)).alias("rows"), F.sum(F.col("is_dup").cast("long")).alias("dups"))
        .first(),
    )


def smoke_layout(spark, scratch, n):
    """Bloom semi-join reduction + Z-order keying at n fact rows.
    Bloom: 100k-key dim side (10% of the 1M key domain), m_bits sized
    at ~13 bits/key; the measure is bitmap build + reduced-count vs
    the plain join count. Z-order: key computation + range-sort write,
    the OPTIMIZE ZORDER critical path."""
    from multi_sensor_data_pipeline_for_robotics__spark.functions.bloom import (
        bloom_semi_filter,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.functions.zorder import (
        zorder_layout,
    )

    print(f"\n## bloom + zorder @ {n:,} fact rows")
    fact = spark.range(n).select(
        F.col("id"),
        (F.abs(F.hash(F.col("id").cast("string"))) % 1_000_000).alias("k"),
        (F.abs(F.hash(F.col("id").cast("string"), F.lit(1))) % 100_000
         / 100.0).alias("x"),
        (F.abs(F.hash(F.col("id").cast("string"), F.lit(2))) % 100_000
         / 100.0).alias("y"),
    )
    fact.write.mode("overwrite").parquet(f"{scratch}/fact")
    f = spark.read.parquet(f"{scratch}/fact")
    dim = spark.range(100_000).select(
        (F.col("id") * 10).alias("k")  # 10% of the key domain
    )
    dim.write.mode("overwrite").parquet(f"{scratch}/dim")
    d = spark.read.parquet(f"{scratch}/dim")

    timed(
        "bloom_semi_filter(100k keys, m=2^20, k=4)",
        lambda: bloom_semi_filter(f, d, "k", m_bits=20).count(),
    )
    timed(
        "bloom_semi_filter xxhash64 (production hash)",
        lambda: bloom_semi_filter(f, d, "k", m_bits=20, hash_fn="xxhash64").count(),
    )
    timed(
        "plain left_semi join (the baseline)",
        lambda: f.join(d, "k", "left_semi").count(),
    )
    timed(
        "zorder key + range-sort write",
        lambda: zorder_layout(
            f, {"x": (0.0, 1000.0), "y": (0.0, 1000.0)}, bits=16
        )
        .repartitionByRange(32, "z_key")
        .sortWithinPartitions("z_key")
        .write.mode("overwrite")
        .parquet(f"{scratch}/zsorted"),
    )


def smoke_kmv_hot_group(spark, scratch, n):
    """Grouped KMV ndv with ONE group holding ~n distinct values — the
    high-cardinality-column shape `analyze_table` hits on every id
    column. The round-6 one-window form funneled the whole group's
    distinct-hash set through a single task's sort; the two-phase
    salted bottom-k caps the largest sort at max(ndv/S, k*S) rows.
    Both variants are timed on the same input, and their estimates must
    agree exactly (the split is lossless by the KMV merge law)."""
    from pyspark.sql import Window as W

    from multi_sensor_data_pipeline_for_robotics__spark.functions.sketch import (
        kmv_distinct,
        kmv_hash,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        analyze_table,
    )

    print(f"\n## grouped KMV ndv, hot group @ {n:,} distinct values")
    rows = spark.range(n).select(
        F.lit("hot").alias("g"), F.col("id").alias("v")
    ).unionByName(
        spark.range(n // 100).select(
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") + 10 * n).alias("v"),
        )
    )
    rows.write.mode("overwrite").parquet(f"{scratch}/kmvhot")
    t = spark.read.parquet(f"{scratch}/kmvhot")

    def one_window_form():
        # the pre-r7 plan, inlined for comparison: per-group global
        # ranking window — the whole hot group sorts in ONE task
        d = t.select("g", kmv_hash("v").alias("h")).distinct()
        rw = W.partitionBy("g").orderBy("h")
        mins = d.withColumn("rn", F.row_number().over(rw)).filter(
            F.col("rn") <= 256
        )
        return (
            mins.groupBy("g")
            .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("m"))
            .agg(F.sum("hk").alias("s"), F.sum("m").alias("m"))
            .first()
        )

    def two_phase_form():
        return (
            kmv_distinct(t, "v", k=256, group_col="g")
            .agg(
                F.round(F.sum("approx_distinct"), 0).alias("est_sum"),
                F.sum("sketch_m").alias("m"),
            )
            .first()
        )

    timed("grouped kmv ndv, two-phase bottom-k (r7)", two_phase_form)
    timed("grouped kmv ndv, one-window form (pre-r7)", one_window_form)
    timed(
        "analyze_table(2 cols incl. unique id)",
        lambda: analyze_table(t)
        .agg(F.round(F.sum("approx_ndv"), 0).alias("ndv_sum"))
        .first(),
    )


def smoke_semdedup_hot_cluster(spark, scratch, n_vecs):
    """SemDeDup on a PATHOLOGICAL corpus: half the vectors are EXACT
    duplicates of one embedding (mode collapse / boilerplate pages all
    embedding identically) — auto-scaled nlist cannot split an exact
    point mass, so ONE trained cluster holds ~n/2 members and the
    uncapped pair stage would build ~n^2/8 pairs. max_cluster_size
    sub-buckets the hot cluster; the smoke measures the capped run and
    reports the pair volume each variant WOULD build (computed from
    cluster sizes, no pair materialization). (A merely TIGHT blob with
    noise is already handled by auto-nlist alone: k-means spends many
    centroids inside the dense region — measured hottest cluster 200
    of 30k blob members at n=60k. The cap exists for the exact-dup
    extreme below.)"""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        semantic_dedup_fixedpoint,
    )

    print(f"\n## semdedup hot-cluster cap @ {n_vecs:,} vectors (half exact dups)")
    dim = 32
    ncent = max(n_vecs // 200, 2)
    blob = F.col("id") < n_vecs // 2
    base = F.when(blob, F.lit("0")).otherwise(
        (F.col("id") % ncent).cast("string")
    )
    # blob members get ZERO noise -> one exact point mass
    comp = lambda i: (
        F.hash(base, F.lit(i)).cast("double") / 2147483647.0
        + F.when(blob, F.lit(0.0)).otherwise(
            0.02
            * F.hash(F.col("id").cast("string"), F.lit(i)).cast("double")
            / 2147483647.0
        )
    )
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(i).cast("float") for i in range(dim)]).alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet(f"{scratch}/hotvecs")
    v = spark.read.parquet(f"{scratch}/hotvecs")
    cap = 500
    timed(
        f"semantic_dedup_fixedpoint(auto nlist, cap={cap})",
        lambda: semantic_dedup_fixedpoint(
            v, nlist=None, iters=2, threshold=0.9, max_cluster_size=cap
        )
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("is_dup").cast("long")).alias("dups"),
        )
        .first(),
    )
    # pair-volume ledger from the SAME trained assignment: sum m*(m-1)/2
    # per cluster (uncapped) vs per (cluster, ceil-split sub-bucket)
    from multi_sensor_data_pipeline_for_robotics__spark.functions.vector import (
        to_double,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        _fp_assign,
        _fp_quantize,
        kmeans_centroids_fixedpoint,
    )

    nlist = max(16, n_vecs // 100)
    cents = kmeans_centroids_fixedpoint(v, nlist, 2, 1_000_000)
    qd = v.select(
        F.col("vec_id").alias("__id"), to_double(F.col("embedding")).alias("__vd")
    ).select("__id", _fp_quantize(F.col("__vd"), 1_000_000).alias("__qv"))
    sizes = (
        _fp_assign(qd, cents, out_col="cluster_id")
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    ledger = sizes.agg(
        F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("pairs_uncapped"),
        F.sum(
            F.ceil(F.col("m") / cap)
            * (
                (F.col("m") / F.ceil(F.col("m") / cap))
                * ((F.col("m") / F.ceil(F.col("m") / cap)) - 1)
                / 2
            )
        ).alias("pairs_capped_approx"),
        F.max("m").alias("hottest_cluster"),
    ).first()
    print(
        f"{'pair volume uncapped vs capped':44s} "
        f"{int(ledger['pairs_uncapped']):,} -> "
        f"{int(ledger['pairs_capped_approx']):,} "
        f"(hottest cluster {ledger['hottest_cluster']:,})"
    )




def smoke_topk_hot_group(spark, scratch, n):
    """Grouped top-k frequent with ONE group holding ~n distinct values
    (tokens-per-language, the module's motivating example). The pre-r8
    form ranked each group's count partials in a single-task window —
    the same shape the grouped-KMV smoke above measures; the r8
    two-phase salted ranking caps the largest single sort at
    max(ndv/S, k*S) rows. Both variants are timed on the same input and
    must agree exactly (the split is lossless: every global top-k row
    is its salt bucket's top-k)."""
    from pyspark.sql import Window as W

    from multi_sensor_data_pipeline_for_robotics__spark.functions.freq import (
        top_k_frequent,
    )

    print(f"\n## grouped top-k frequent, hot group @ {n:,} distinct values")
    # hot group: n distinct values with a deterministic skewed count
    # profile (value v repeats 1 + (v % 37 == 0 ? 40 : 0) times is too
    # costly to materialize at 24M; instead repeat a 2% slice 3x so the
    # top-k is non-trivial), plus 4 small groups
    base = spark.range(n).select(
        F.lit("hot").alias("g"), F.col("id").alias("v")
    )
    heavy = spark.range(n // 50).select(
        F.lit("hot").alias("g"), (F.col("id") * 50).alias("v")
    )
    small = spark.range(n // 100).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 1000).alias("v"),
    )
    base.unionByName(heavy).unionByName(heavy).unionByName(small).write.mode(
        "overwrite"
    ).parquet(f"{scratch}/topkhot")
    t = spark.read.parquet(f"{scratch}/topkhot")

    def one_window_form():
        # the pre-r8 plan, inlined for comparison: per-group ranking
        # window over the full count table — the hot group's n-row
        # count table sorts in ONE task
        counts = t.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
        w = W.partitionBy("g").orderBy(F.col("cnt").desc(), F.col("v").asc())
        top = counts.withColumn(
            "rank", F.row_number().over(w).cast("int")
        ).filter(F.col("rank") <= 10)
        return sorted(
            (r["g"], r["rank"], r["v"], r["cnt"]) for r in top.collect()
        )

    def two_phase_form():
        top = top_k_frequent(t, "v", k=10, group_col="g")
        return sorted(
            (r["g"], r["rank"], r["v"], r["cnt"]) for r in top.collect()
        )

    _, a = timed("grouped top-k, one-window (pre-r8)", one_window_form)
    _, b = timed("grouped top-k, two-phase salted (r8)", two_phase_form)
    assert a == b, "two-phase grouped top-k diverged from one-window form"
    print("   results identical (lossless split confirmed)")


def smoke_sorted_neighborhood(spark, scratch, n):
    """SNM blocking at n rows: global rank via the two-phase prefix
    count (no single-task window), pairing via successor-bucket
    equi-join — output is exactly n*(w-1) minus the tail."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    print(f"\n## sorted-neighborhood blocking @ {n:,} rows, window=4")
    spark.range(n).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("k")
    ).write.mode("overwrite").parquet(f"{scratch}/snm")
    t = spark.read.parquet(f"{scratch}/snm")
    w = 4
    _, got = timed(
        "snm pairs (count + rank_dist sum)",
        lambda: sorted_neighborhood_pairs(t, "id", "k", window=w)
        .agg(F.count(F.lit(1)).alias("pairs"), F.sum("rank_dist").alias("sd"))
        .first(),
    )
    want = sum(n - d for d in range(1, w))
    assert got["pairs"] == want, (got["pairs"], want)
    print(f"   exact pair count confirmed ({want:,})")


def smoke_salted_join(spark, scratch, n):
    """Salted vs direct shuffle join with 50% of fact rows on ONE key
    against a 100k-row dim (too big to broadcast at real scale; AQE's
    skew splitter is disabled here to isolate the operator's own
    behavior — on clusters AQE handles the sort-merge case, salting
    covers the rest). Both must agree on the aggregate."""
    from multi_sensor_data_pipeline_for_robotics__spark.functions.skew import (
        salted_join,
    )

    print(f"\n## salted join @ {n:,} fact rows, 50% on one key, 100k dim")
    n_dim = 100_000
    fact = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(
            F.abs(F.hash(F.col("id").cast("string"))) % n_dim
        ).cast("long").alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    fact.write.mode("overwrite").parquet(f"{scratch}/saltfact")
    spark.range(n_dim).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("w")
    ).write.mode("overwrite").parquet(f"{scratch}/saltdim")
    f_ = spark.read.parquet(f"{scratch}/saltfact")
    d_ = spark.read.parquet(f"{scratch}/saltdim")
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        agg = lambda j: j.agg(
            F.count(F.lit(1)).alias("rows"),
            F.round(F.sum(F.col("v") + F.col("w")), 2).alias("s"),
        ).first()
        _, a = timed("direct shuffle join (hot key)", lambda: agg(f_.join(d_, "k")))
        _, b = timed(
            "salted join n_salts=16",
            lambda: agg(salted_join(f_, d_, "k", n_salts=16, salt_from="id")),
        )
        assert a == b, (a, b)
        print("   aggregates identical (salt-invariance confirmed)")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)


def smoke_group_sample_hot(spark, scratch, n):
    """group_sample_k with ONE group holding n rows: the two-phase
    salted ranking caps the largest single sort at max(n/S, k*S) rows
    vs the one-window form's n."""
    from pyspark.sql import Window as W

    from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
        group_sample_k,
    )

    print(f"\n## group_sample_k hot group @ {n:,} rows, k=1000")
    spark.range(n).select(
        F.lit("hot").alias("g"), F.col("id").alias("key")
    ).unionByName(
        spark.range(n // 100).select(
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") + 10 * n).alias("key"),
        )
    ).write.mode("overwrite").parquet(f"{scratch}/gsample")
    t = spark.read.parquet(f"{scratch}/gsample")

    def one_window():
        h = F.conv(
            F.substring(
                F.sha2(F.concat(F.col("key").cast("string"), F.lit("#gsample")), 256),
                1, 13,
            ), 16, 10,
        ).cast("long")
        d = t.select("g", "key", h.alias("__h"))
        w = W.partitionBy("g").orderBy("__h", "key")
        kept = d.withColumn("rn", F.row_number().over(w)).filter("rn <= 1000")
        return kept.agg(F.count(F.lit(1)).alias("n"), F.sum("key").alias("s")).first()

    def two_phase():
        kept = group_sample_k(t, "key", "g", 1000)
        return kept.agg(F.count(F.lit(1)).alias("n"), F.sum("key").alias("s")).first()

    _, a = timed("group sample, one-window form", one_window)
    _, b = timed("group sample, two-phase salted", two_phase)
    assert a == b, (a, b)
    print("   identical samples (lossless split confirmed)")


def smoke_rank_normalize(spark, scratch, n):
    """percent_rank at n rows WITHOUT the unpartitioned window: the
    two-phase prefix count + per-value tie rank; checks min pct = 0
    and mean ~ 0.5 (max stays below 1 when the top value has ties —
    its tie group shares the FIRST row's rank, standard percent_rank
    semantics)."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.stats import (
        rank_normalize,
    )

    print(f"\n## rank_normalize @ {n:,} rows (ties every 1000th value)")
    spark.range(n).select(
        F.col("id"), (F.abs(F.hash(F.col("id").cast("string"))) % (n // 1000))
        .cast("double").alias("s"),
    ).write.mode("overwrite").parquet(f"{scratch}/ranknorm")
    t = spark.read.parquet(f"{scratch}/ranknorm")
    _, got = timed(
        "rank_normalize (agg over output)",
        lambda: rank_normalize(t, "s", "id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pct_rank").alias("lo"),
            F.max("pct_rank").alias("hi"),
            F.round(F.avg("pct_rank"), 3).alias("mean"),
        )
        .first(),
    )
    assert got["n"] == n and got["lo"] == 0.0
    print(f"   endpoints ok (mean={got['mean']})")




def _synth_docs(spark, scratch, n_docs, words_per_doc=40, vocab=50_000):
    """n_docs synthetic docs, ~zipf-free uniform hashed vocab, 5 langs —
    generated distributed, written once so generation stays out of
    timings."""
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words_per_doc)),
                lambda i: F.concat(
                    F.lit("w"),
                    (
                        F.abs(F.hash(F.col("id").cast("string"), i.cast("string")))
                        % vocab
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("es"), F.lit("fr"), F.lit("zh")),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("lang"),
    )
    docs.write.mode("overwrite").parquet(f"{scratch}/sel_docs")
    return spark.read.parquet(f"{scratch}/sel_docs")


def smoke_mixture_hot_source(spark, scratch, n):
    """mixture_token_budget with 90% of n rows in ONE source — the
    COMMON mixture-selection shape ("30% web of the budget" where web
    is most of the corpus). The r10 form's Window.partitionBy(source)
    sorted the dominant source's candidates in one task; the r11 form
    runs the range-shuffle global_running_sum scan keyed
    (source, -log_weight, id) so every source spreads across range
    partitions. Both variants run on the same input and must select
    identical (row count, token sum) — the split is order-preserving
    within each source."""
    from pyspark.sql import Window as W

    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        mixture_token_budget,
    )

    print(f"\n## mixture_token_budget, 90% one source @ {n:,} rows")
    shares = {"web": 0.5, "code": 0.3, "papers": 0.2}
    budget = int(n * 2)  # ~10% of total tokens (avg 20 tok/doc)
    rows = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, "web")
        .when(F.col("id") % 10 == 9, "code")
        .otherwise("papers")
        .alias("source"),
        (F.col("id") % 37 + 2).cast("long").alias("n_tokens"),
        F.round(F.sin(F.col("id").cast("double")) * 3.0, 6).alias(
            "log_weight"
        ),
    ).withColumn(
        "source",
        F.when(F.col("doc_id") % 100 == 17, "papers").otherwise(
            F.col("source")
        ),
    )
    rows.write.mode("overwrite").parquet(f"{scratch}/mixhot")
    t = spark.read.parquet(f"{scratch}/mixhot")

    def window_form():
        # the pre-r11 plan, inlined for comparison: per-source prefix
        # window — the 90% source sorts in ONE task
        items = sorted(shares.items())
        tot = sum(shares.values())
        bcol = F.lit(None).cast("double")
        for s, sh in items:
            bcol = F.when(
                F.col("source") == s, F.lit(budget * sh / tot)
            ).otherwise(bcol)
        w = (
            W.partitionBy("source")
            .orderBy(F.col("log_weight").desc(), F.col("doc_id").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return (
            t.filter(F.col("source").isin([s for s, _ in items]))
            .withColumn(
                "cum_tokens", F.sum("n_tokens").over(w).cast("long")
            )
            .filter(
                (F.col("cum_tokens") - F.col("n_tokens")).cast("double")
                < bcol
            )
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_tokens").alias("toks"),
            )
            .first()
        )

    def scan_form():
        return (
            mixture_token_budget(t, shares, budget)
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_tokens").alias("toks"),
            )
            .first()
        )

    _, a = timed("mixture budget, range-scan form (r11)", scan_form)
    _, b = timed("mixture budget, one-window form (pre-r11)", window_form)
    assert (a["docs"], a["toks"]) == (b["docs"], b["toks"]), (a, b)
    print(f"  parity: both select {a['docs']:,} docs / {a['toks']:,} tokens")

    # waterfilling form on the same input: 'papers' (~1.9% of rows)
    # runs dry against its 20% slice, so two fixpoint rounds run —
    # the extra cost over the plain scan is one |sources|-row collect
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        mixture_token_budget_redistribute,
    )

    _, c = timed(
        "mixture budget, redistribute (waterfill)",
        lambda: mixture_token_budget_redistribute(
            t, {"web": 50, "code": 30, "papers": 20}, budget
        )
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("toks"),
        )
        .first(),
    )
    assert c["toks"] >= a["toks"], (a, c)  # leftover got spent
    print(f"  waterfill spends {c['toks']:,} tokens (plain: {a['toks']:,})")


def smoke_stream_screen(spark, scratch, n_docs):
    """stream_neardup_screen throughput at n_docs incoming docs vs a
    20k-doc frozen corpus (~10% of incoming are near-copies of corpus
    docs). Three forms on the SAME input: the SHIPPED chunk-vectorized
    kernel (factorize + one Carter-Wegman matrix + minimum.reduceat),
    the pre-r11 per-doc Python loop (inlined for comparison), and the
    batch join screen (dedup_against_corpus) as the non-broadcast
    reference. The broadcast arms run WARMED and INTERLEAVED (1 warmup
    + 3 alternating timed rounds, medians reported) — a single
    back-to-back pair is dominated by a first-arm warmup artifact that
    flipped the verdict across runs until interleaving exposed it.
    Both broadcast forms must keep identical survivor counts (same
    exact integer math)."""
    import statistics
    import hashlib

    import numpy as np

    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        dedup_against_corpus,
        minhash_signatures_portable,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.dedup_stream import (
        collect_lsh_screen_model,
        stream_neardup_screen,
    )

    print(f"\n## stream_neardup_screen @ {n_docs:,} incoming docs")
    n_corpus = 20_000
    word = lambda s, i: F.conv(
        (F.abs(F.hash(s.cast("string"), i.cast("string"))) % 1_000_000)
        .cast("string"),
        10,
        16,
    )

    def gen(n, offset, dup_of_corpus):
        h = F.abs(F.hash((F.col("id") + offset).cast("string")))
        if dup_of_corpus:
            # ~10% near-copies of a corpus doc (same seed, one token
            # perturbed), 90% unique
            is_dup = (h % 10) == 0
            seed = F.when(is_dup, h % n_corpus).otherwise(
                F.col("id") + offset + 2_000_000_000
            )
        else:
            is_dup = F.lit(False)
            seed = F.col("id")
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(23)), lambda i: word(seed, i)
        )
        toks = F.when(
            is_dup,
            F.concat(
                F.slice(toks, 1, 23),
                F.array(word(F.col("id") + offset, F.lit(99))),
            ),
        ).otherwise(toks)
        return spark.range(n).select(
            (F.col("id") + offset).alias("doc_id"),
            F.array_join(toks, " ").alias("text"),
        )

    gen(n_corpus, 0, False).write.mode("overwrite").parquet(
        f"{scratch}/scr_corpus"
    )
    gen(n_docs, 10_000_000, True).write.mode("overwrite").parquet(
        f"{scratch}/scr_in"
    )
    corpus = spark.read.parquet(f"{scratch}/scr_corpus")
    incoming = spark.read.parquet(f"{scratch}/scr_in")
    sigs = minhash_signatures_portable(corpus)
    model = collect_lsh_screen_model(sigs)
    nh, bands = int(model["_nh"]), int(model["_bands"])
    r = nh // bands
    prime, mask = 2147483629, 0x7FFFFFFF

    def perdoc_form():
        # the pre-r11 kernel, inlined: per-doc shingle set + sha256
        # memo + per-doc (nh x shingles) matmul
        bmodel = spark.sparkContext.broadcast(model)

        def _screen(pdfs):
            m = bmodel.value
            mats: dict = {}
            a = np.arange(nh, dtype="int64") * 2 + 1
            b = np.arange(nh, dtype="int64") * 7919
            memo: dict = {}

            def _base(sh):
                v = memo.get(sh)
                if v is None:
                    v = int(
                        hashlib.sha256(sh.encode("utf-8")).hexdigest()[:7],
                        16,
                    )
                    memo[sh] = v
                return v

            for pdf in pdfs:
                keep = np.ones(len(pdf), dtype=bool)
                for pos, txt in enumerate(pdf["text"]):
                    if txt is None:
                        continue
                    toks = txt.split(" ")
                    if len(toks) < 3:
                        continue
                    sh_set = {
                        " ".join(toks[i : i + 3])
                        for i in range(len(toks) - 2)
                    }
                    bases = np.fromiter(
                        (_base(s) for s in sh_set),
                        dtype="int64",
                        count=len(sh_set),
                    )
                    sig = (
                        (a[:, None] * bases[None, :] + b[:, None]) % prime
                    ).min(axis=1)
                    for bi in range(bands):
                        acc = 0
                        for j in range(r):
                            acc = (acc * 31 + int(sig[bi * r + j])) & mask
                        mat = mats.get((bi, acc))
                        if mat is None:
                            rows = m.get((bi, acc))
                            if rows is None:
                                continue
                            mat = np.asarray(rows, dtype="int64")
                            mats[(bi, acc)] = mat
                        if (
                            (mat == sig[None, :]).sum(axis=1) >= 0.5 * nh
                        ).any():
                            keep[pos] = False
                            break
                yield pdf.loc[keep]

        return (
            incoming.mapInPandas(_screen, schema=incoming.schema)
            .agg(F.count(F.lit(1)).alias("survivors"))
            .first()
        )

    def shipped_form():
        return (
            stream_neardup_screen(incoming, model)
            .agg(F.count(F.lit(1)).alias("survivors"))
            .first()
        )

    shipped_form()
    perdoc_form()  # warm both paths once (JVM + python workers + scan)
    ta, tb, res = [], [], []
    for _ in range(3):
        t0 = time.perf_counter()
        a = shipped_form()
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        b = perdoc_form()
        tb.append(time.perf_counter() - t0)
        assert a["survivors"] == b["survivors"], (a, b)
        res.append(a["survivors"])
    print(
        f"screen, shipped vectorized kernel (r11)     "
        f"median {statistics.median(ta):6.2f}s  "
        f"{[round(t, 2) for t in ta]}"
    )
    print(
        f"screen, per-doc form (pre-r11)              "
        f"median {statistics.median(tb):6.2f}s  "
        f"{[round(t, 2) for t in tb]}"
    )
    timed(
        "batch join screen (dedup_against_corpus)",
        lambda: dedup_against_corpus(incoming, corpus_signatures=sigs)
        .agg(F.count(F.lit(1)).alias("survivors"))
        .first(),
    )

    # --- r12 fast family: tokenfold vs sha256 stream kernel A/B ------
    # same corpus, same incoming docs; the family swap moves the sha256
    # cost from one-per-distinct-shingle to one-per-distinct-token and
    # replaces shingle string builds with vectorized int64 folds
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        minhash_signatures_tokenfold,
    )

    tf_sigs = minhash_signatures_tokenfold(corpus)
    tf_model = collect_lsh_screen_model(tf_sigs, hash_family="tokenfold")

    def tf_form():
        return (
            stream_neardup_screen(incoming, tf_model)
            .agg(F.count(F.lit(1)).alias("survivors"))
            .first(),
        )[0]

    tf_form()  # warm
    tsha, ttf = [], []
    tf_sv = None
    for _ in range(3):
        t0 = time.perf_counter()
        shipped_form()
        tsha.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        tf_sv = tf_form()["survivors"]
        ttf.append(time.perf_counter() - t0)
    print(
        f"screen, sha256 family (shipped r11)         "
        f"median {statistics.median(tsha):6.2f}s  "
        f"{[round(t, 2) for t in tsha]}"
    )
    print(
        f"screen, tokenfold family (r12)              "
        f"median {statistics.median(ttf):6.2f}s  "
        f"{[round(t, 2) for t in ttf]}"
    )
    # full-size bit-parity: the numpy stream kernel and the Catalyst
    # batch join must keep the IDENTICAL survivor set on the new family
    dt, batch_tf = timed(
        "batch join screen (tokenfold family)",
        lambda: dedup_against_corpus(
            incoming, corpus_signatures=tf_sigs, hash_family="tokenfold"
        )
        .agg(
            F.count(F.lit(1)).alias("survivors"),
            F.sum("doc_id").alias("id_sum"),
        )
        .first(),
    )
    stream_tf = (
        stream_neardup_screen(incoming, tf_model)
        .agg(
            F.count(F.lit(1)).alias("survivors"),
            F.sum("doc_id").alias("id_sum"),
        )
        .first()
    )
    assert (batch_tf["survivors"], batch_tf["id_sum"]) == (
        stream_tf["survivors"],
        stream_tf["id_sum"],
    ), (batch_tf, stream_tf)
    print(
        f"  tokenfold parity: batch == stream survivors "
        f"({stream_tf['survivors']:,} docs, id_sum match)"
    )
    print(
        f"  parity: both broadcast forms keep {res[0]:,} of {n_docs:,}"
    )


def smoke_audits(spark, scratch, n_docs, n_vecs):
    """The two r11 screen-quality audits at full size: dedup_audit at
    n_docs (collision stratum thinned via collision_sample_mod so the
    exact-Jaccard verification stays sample-bounded) and
    lsh_banding_audit at n_vecs (random stratum bounded by
    random_buckets ~ n/2 -> Poisson-2 buckets)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        dedup_audit,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        lsh_banding_audit,
    )

    print(f"\n## screen-quality audits @ {n_docs:,} docs / {n_vecs:,} vecs")
    # docs: reuse the stream_screen generator shape (~10% near-dups)
    word = lambda s, i: F.conv(
        (F.abs(F.hash(s.cast("string"), i.cast("string"))) % 1_000_000)
        .cast("string"),
        10,
        16,
    )
    h = F.abs(F.hash(F.col("id").cast("string")))
    n_bases = max(n_docs // 200, 1)
    is_dup = (h % 10) == 0
    seed = F.when(is_dup, (h / 10).cast("long") % n_bases).otherwise(
        F.col("id") + 1_000_000_000
    )
    toks = F.transform(F.sequence(F.lit(0), F.lit(23)), lambda i: word(seed, i))
    toks = F.when(
        is_dup,
        F.concat(F.slice(toks, 1, 23), F.array(word(F.col("id"), F.lit(99)))),
    ).otherwise(toks)
    spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    ).write.mode("overwrite").parquet(f"{scratch}/audit_docs")
    d = spark.read.parquet(f"{scratch}/audit_docs")
    _, r = timed(
        "dedup_audit(sample_mod=16, buckets=n/2)",
        lambda: {
            row["stratum"]: (row["n_pairs"], row["tp"], row["fn"])
            for row in dedup_audit(
                d,
                collision_sample_mod=16,
                random_buckets=max(n_docs // 2, 1),
            ).collect()
        },
    )
    print(f"  strata: {r}")

    # vecs: hash-uniform components (sign patterns spread across the
    # full bucket key space — a first draft used sin() mixtures whose
    # few distinct sign patterns collapsed into giant buckets and 1e9
    # candidate pairs), ~10% planted near-copies of scaled base count
    # so true pairs stay LINEAR (the dedup-smoke lesson)
    vh = F.abs(F.hash(F.col("id").cast("string")))
    vn_bases = max(n_vecs // 200, 1)
    v_is_dup = (vh % 10) == 0
    v_seed = F.when(v_is_dup, (vh / 10).cast("long") % vn_bases).otherwise(
        F.col("id") + 3_000_000_000
    )
    comp = lambda s, i: (
        (F.abs(F.hash(s.cast("string"), i.cast("string"))) % 2001).cast(
            "double"
        )
        - 1000.0
    ) / 1000.0
    base_vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)), lambda i: comp(v_seed, i)
    )
    # perturb one component for dup vecs so they're NEAR-dups
    vec = F.when(
        v_is_dup,
        F.concat(
            F.slice(base_vec, 1, 63), F.array(comp(F.col("id"), F.lit(99)))
        ),
    ).otherwise(base_vec)
    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(f"{scratch}/audit_vecs")
    v = spark.read.parquet(f"{scratch}/audit_vecs")
    # band_bits MUST grow with log2(n): 8-bit buckets (256 keys) at
    # 100k vecs put ~390 vecs in every bucket -> ~80M candidate pairs
    # regardless of data (measured: the 8-bit audit ran minutes before
    # being killed). 16-bit buckets keep candidates linear here.
    _, r2 = timed(
        "lsh_banding_audit(band_bits=16, buckets=n/2)",
        lambda: {
            row["stratum"]: (row["n_pairs"], row["n_true_pairs"])
            for row in lsh_banding_audit(
                v,
                band_bits=16,
                random_buckets=max(n_vecs // 2, 1),
            ).collect()
        },
    )
    print(f"  strata: {r2}")


def smoke_stream_budget(spark, scratch, n):
    """token_budget_stream at n rows across 64 source keys on a batch
    frame equivalence check is pytest's job; here the question is
    THROUGHPUT of the stateful admission at full size vs the batch
    selector on the same data (per-key budgets shard the state)."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        dsir_select_token_budget,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        token_budget_stream,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.sync_stream import (
        run_to_memory,
    )

    print(f"\n## token-budget admission @ {n:,} rows / 64 keys")
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 64).cast("string").alias("source"),
        (F.col("id") % 37 + 2).cast("long").alias("n_tokens"),
        F.round(F.sin(F.col("id").cast("double")), 6).alias("log_weight"),
    ).write.mode("overwrite").parquet(f"{scratch}/budget_rows")
    t = spark.read.parquet(f"{scratch}/budget_rows")

    def stream_form():
        stream = (
            spark.readStream.schema(
                "doc_id long, source string, n_tokens long, log_weight double"
            ).parquet(f"{scratch}/budget_rows")
        )
        sm = token_budget_stream(stream, 1_000_000, key_col="source")
        run_to_memory(sm, "budget_smoke_tbl", output_mode="append")
        return (
            spark.table("budget_smoke_tbl")
            .agg(F.count(F.lit(1)).alias("admitted"))
            .first()
        )

    timed("token_budget_stream(64 keys)", stream_form)
    timed(
        "dsir_select_token_budget (batch, global)",
        lambda: dsir_select_token_budget(t, 64_000_000)
        .agg(F.count(F.lit(1)).alias("admitted"))
        .first(),
    )

    # --- r12: strict-GLOBAL admission, single-state-task funnel vs the
    # two-level range-shuffle form — same budget, same batch
    # boundaries, must admit the IDENTICAL set
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        token_budget_stream_to_parquet,
    )

    B_GLOBAL = 64_000_000

    def strict_global():
        stream = spark.readStream.schema(
            "doc_id long, source string, n_tokens long, log_weight double"
        ).parquet(f"{scratch}/budget_rows")
        sm = token_budget_stream(stream, B_GLOBAL, key_col=None)
        run_to_memory(sm, "budget_glb_tbl", output_mode="append")
        return (
            spark.table("budget_glb_tbl")
            .agg(
                F.count(F.lit(1)).alias("admitted"),
                F.sum("doc_id").alias("id_sum"),
            )
            .first()
        )

    def two_level():
        stream = spark.readStream.schema(
            "doc_id long, source string, n_tokens long, log_weight double"
        ).parquet(f"{scratch}/budget_rows")
        q = token_budget_stream_to_parquet(
            stream,
            B_GLOBAL,
            f"{scratch}/budget_tl_out",
            f"{scratch}/budget_tl_ckpt",
        )
        q.processAllAvailable()
        q.stop()
        return (
            spark.read.parquet(f"{scratch}/budget_tl_out")
            .agg(
                F.count(F.lit(1)).alias("admitted"),
                F.sum("doc_id").alias("id_sum"),
            )
            .first()
        )

    _, a = timed("strict global (one state task)", strict_global)
    _, b = timed("two-level global (range-shuffle/batch)", two_level)
    assert (a["admitted"], a["id_sum"]) == (b["admitted"], b["id_sum"]), (a, b)
    print(f"  identical admitted set: {a['admitted']:,} docs (id_sum match)")


def smoke_bpe(spark, scratch, n_docs):
    """BPE merge training at n_docs x 40 tokens: the corpus collapses
    ONCE to a (word, freq) vocabulary table (bounded at 50k words by
    the Zipf-ish _synth_docs vocab), then every round is one
    vocabulary-sized pair count + one merge fold — so per-round cost
    must be corpus-independent and ~flat in the round index. Measured
    as k=4 vs k=8 full trains: the marginal per-round cost of rounds
    5-8 should match rounds 1-4's."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.bpe import (
        bpe_apply,
        bpe_train_merges,
    )

    print(f"\n## BPE merge training @ {n_docs:,} docs x 40 tokens")
    docs = _synth_docs(spark, scratch, n_docs)
    m4: list = []
    m8: list = []
    t4, _ = timed(
        "bpe_train_merges(k=4)",
        lambda: m4.extend(bpe_train_merges(docs, k=4).collect()) or len(m4),
    )
    t8, _ = timed(
        "bpe_train_merges(k=8)",
        lambda: m8.extend(bpe_train_merges(docs, k=8).collect()) or len(m8),
    )
    assert [tuple(r) for r in m8[:4]] == [tuple(r) for r in m4], "k-prefix stability"
    print(
        f"  doubling k added {t8 - t4:+.1f}s on a {t4:.1f}s base — the"
        " corpus-to-vocabulary collapse dominates and 4 extra"
        " vocabulary-sized rounds are ~free (per-round cost is"
        " corpus-independent)"
    )
    timed(
        "bpe_apply(k=8 merges)",
        lambda: bpe_apply(docs, m8)
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_pieces").alias("pieces"))
        .first(),
    )


def smoke_budget_epochs(spark, scratch, epochs):
    """Recovery-cost shape of token_budget_stream_to_parquet over MANY
    micro-batches: the r13 sidecar recovers the carried counter from
    one totals row per admitting epoch (latest-prior-epoch lookup), so
    per-epoch cost must stay FLAT in epoch count — the r12 form
    re-scanned the whole admitted sink every epoch (O(admitted) I/O
    per micro-batch). Measured as wall of the first half of the epochs
    vs the second half under one warmed query; a growing recovery
    shows up as second_half >> first_half."""
    import time as _t

    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        token_budget_stream_to_parquet,
    )

    print(f"\n## budget sidecar recovery @ {epochs} single-file epochs")
    rows_per = 2_000
    base = f"{scratch}/be_rows"
    half = epochs // 2

    def _add_wave(lo, hi):
        for e in range(lo, hi):
            spark.range(e * rows_per, (e + 1) * rows_per).select(
                F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
            ).coalesce(1).write.mode("append").parquet(base)

    _add_wave(0, half)
    stream = (
        spark.readStream.schema("doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    q = token_budget_stream_to_parquet(
        stream,
        budget_tokens=10 * rows_per * epochs + 1,  # never exhausts
        out_path=f"{scratch}/be_out",
        checkpoint=f"{scratch}/be_ckpt",
    )
    t0 = _t.monotonic()
    q.processAllAvailable()
    first = _t.monotonic() - t0
    _add_wave(half, epochs)
    t0 = _t.monotonic()
    q.processAllAvailable()
    second = _t.monotonic() - t0
    q.stop()
    totals = spark.read.parquet(f"{scratch}/be_out_totals")
    n, last = totals.agg(
        F.count(F.lit(1)), F.max_by("used_after", "epoch_id")
    ).first()
    assert (n, last) == (epochs, 10 * rows_per * epochs), (n, last)
    print(
        f"  first {half} epochs: {first:.1f}s, last {epochs - half}:"
        f" {second:.1f}s (ratio {second / first:.2f}; flat ⇒ ~1.0,"
        f" sink-rescan recovery grows with admitted volume)"
    )


def smoke_selection(spark, scratch, n_docs):
    """Char-LM scoring + DSIR weights at n_docs x 40 tokens: the model
    tables stay vocabulary/bucket-sized broadcasts; the data-sized work
    is one explode + pre-aggregate each. The LM gram space here is
    bounded (hashed-integer words), mirroring real text's bounded
    alphabet."""
    from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
        char_lm_score,
        dsir_log_weights,
    )

    print(f"\n## data selection @ {n_docs:,} docs x 40 tokens")
    docs = _synth_docs(spark, scratch, n_docs)
    ref = docs.filter(F.col("lang") == "en")
    timed(
        "char_lm_score(ref=20% slice)",
        lambda: char_lm_score(docs, ref)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg("bits_per_gram"), 3).alias("avg_bits"),
        )
        .first(),
    )
    timed(
        "dsir_log_weights(B=1024)",
        lambda: dsir_log_weights(docs, F.col("lang") == "en")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg("log_weight"), 3).alias("avg_lw"),
        )
        .first(),
    )


def smoke_hard_negatives(spark, scratch, n_vecs):
    """Brute-force vs IVF-probed hard-negative mining at n_vecs 64-dim
    labeled vectors, 200 queries: the brute miner scores every
    (query, candidate) pair; the IVF miner touches ~nprobe/nlist of the
    corpus per query — the composition hard_negatives' docstring
    promises, measured."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    # 200 queries: IVF pays nlist assignment dots per corpus row ONCE
    # regardless of query count, then scores ~nprobe/nlist of the
    # corpus per query; brute force pays |queries| dots per corpus row.
    # The crossover is |queries| > nlist — real mining batches are
    # thousands of anchors, so the smoke uses 200 (not the graded
    # query's 5, which exists for oracle parity, not scale).
    print(f"\n## hard negatives @ {n_vecs:,} x 64-dim labeled vectors,"
          " 200 queries")
    n_clusters = max(n_vecs // 16, 1)
    cl = (F.abs(F.hash(F.col("id").cast("string"))) % n_clusters).cast("string")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            (F.abs(F.hash(cl, i.cast("string"))) % 2000 - 1000) / 1000.0
            + (F.abs(F.hash(F.col("id").cast("string"), i.cast("string"))) % 200 - 100)
            / 1000.0
        ).cast("float"),
    )
    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        (F.col("id") % 8).alias("label"),
    ).write.mode("overwrite").parquet(f"{scratch}/hn_vecs")
    emb = spark.read.parquet(f"{scratch}/hn_vecs")
    qs = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    force = lambda d: d.agg(
        F.count(F.lit(1)).alias("rows"),
        F.round(F.avg("cosine"), 4).alias("avg"),
    ).first()
    timed(
        "hard_negatives (brute force, k=10)",
        lambda: force(hard_negatives(emb, qs, k=10)),
    )
    timed(
        "hard_negatives_ivf (nlist=64, nprobe=8, k=10)",
        lambda: force(hard_negatives_ivf(emb, qs, k=10, nlist=64, nprobe=8)),
    )


def smoke_ts_diag(spark, scratch, n):
    """ACF(8 lags) + CUSUM at n rows: 63 cold keys plus ONE hot key
    holding 50% of rows — the per-key sort serializes the hot key into
    one task (documented rolling_stats caveat); the smoke records what
    that costs. CUSUM's integer argmax adds two windows over the same
    sort order (no extra shuffle)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.timeseries import (
        acf,
        cusum_changepoint,
    )

    print(f"\n## ts diagnostics @ {n:,} rows, 63 keys + 1 hot key (50%)")
    rows = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise((F.col("id") % 63).cast("string"))
        .alias("k"),
        F.col("id").alias("t"),
        ((F.abs(F.hash(F.col("id").cast("string"))) % 100000) / 100.0).alias("v"),
    )
    rows.write.mode("overwrite").parquet(f"{scratch}/diag")
    t = spark.read.parquet(f"{scratch}/diag")
    timed(
        "acf(max_lag=8)",
        lambda: acf(t, "k", "t", "v", max_lag=8)
        .agg(F.count(F.lit(1)).alias("lags"), F.round(F.sum("acf"), 4).alias("s"))
        .first(),
    )
    timed(
        "cusum_changepoint",
        lambda: cusum_changepoint(t, "k", "t", "v", micro_scale=1_000)
        .agg(F.count(F.lit(1)).alias("keys"), F.round(F.max("stat"), 3).alias("mx"))
        .first(),
    )


def smoke_label_prop(spark, scratch, n_edges):
    """3-round LPA on a planted-communities graph: n_edges edges over
    n_edges/10 nodes in dense blobs of ~20 plus 1% random cross-links.
    Per round: one join + a degree-bounded rank — the smoke verifies
    rounds stay flat (no lineage blowup) and no graph-sized window
    appears."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        label_propagation,
    )

    n_nodes = n_edges // 10
    print(f"\n## label propagation @ {n_edges:,} edges, {n_nodes:,} nodes")
    blob = (F.col("id") % n_nodes) - (F.col("id") % n_nodes) % 20
    e = spark.range(n_edges).select(
        (blob + (F.abs(F.hash(F.col("id").cast("string"))) % 20)).alias("doc_a"),
        (blob + (F.abs(F.hash((F.col("id") + 1).cast("string"))) % 20)).alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b"))
    e.write.mode("overwrite").parquet(f"{scratch}/lpa_edges")
    edges = spark.read.parquet(f"{scratch}/lpa_edges")
    timed(
        "label_propagation(iters=3)",
        lambda: label_propagation(edges, iters=3)
        .agg(
            F.count(F.lit(1)).alias("nodes"),
            F.count_distinct("label").alias("communities"),
        )
        .first(),
    )


def _hot_cluster_docs(spark, scratch, n_docs, cluster, name):
    """n_docs synthetic docs where the first ``cluster`` ids form ONE
    near-identical cluster (each member = the shared 24-token base with
    one hash-perturbed token; ~1 in 8 members keeps the base verbatim,
    so the cluster mixes exact copies and near-copies — exercising BOTH
    guards: signature-identical collapse and max_bucket_size). The rest
    are token-unique background docs."""
    word = lambda s, i: F.conv(
        (F.abs(F.hash(s.cast("string"), i.cast("string"))) % 1_000_000)
        .cast("string"),
        10,
        16,
    )
    in_cluster = F.col("id") < cluster
    seed = F.when(in_cluster, F.lit(0)).otherwise(F.col("id") + 1_000_000_000)
    toks = F.transform(F.sequence(F.lit(0), F.lit(23)), lambda i: word(seed, i))
    keep_exact = F.abs(F.hash(F.col("id").cast("string"), F.lit("x"))) % 8 == 0
    perturbed = F.concat(
        F.slice(toks, 1, 23), F.array(word(F.col("id"), F.lit(99)))
    )
    toks = F.when(in_cluster & ~keep_exact, perturbed).otherwise(toks)
    spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    ).write.mode("overwrite").parquet(f"{scratch}/{name}")
    return spark.read.parquet(f"{scratch}/{name}")


def _legacy_minhash_pairs(sig, num_hashes, bands, threshold):
    """The pre-r12 clique-emitting band join (no signature collapse, no
    bucket cap) — kept here ONLY as the measurement baseline for the
    hot-cluster smoke; the shipped operator is minhash_lsh_pairs."""
    r = num_hashes // bands
    banded = sig.select(
        "doc",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[bi * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "signature", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / num_hashes
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def smoke_hot_cluster(spark, scratch, n_docs, cluster):
    """The r11 weak-flag scenario: a corpus whose near-dup mass sits in
    ONE c-member near-identical cluster (templated boilerplate after
    exact dedup — the common shape of web corpora). The legacy clique
    join emits ~c^2/2 pairs for that cluster; measured here at two
    small c to show the quadratic, then the shipped form (signature
    collapse + max_bucket_size star-reduction) at the FULL size the
    legacy form cannot touch. Components over the star pairs equal
    components over the legacy clique pairs (checked at the small c)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        connected_components_star,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    print(f"\n## hot-cluster dedup @ {n_docs:,} docs, one {cluster:,}-member near-identical cluster")
    # quadratic baseline at two small cluster sizes (pairs ~ c^2/2)
    legacy_small = None
    for c_small in (1_000, 4_000):
        d = _hot_cluster_docs(
            spark, scratch, 20_000 + c_small, c_small, f"hot_{c_small}"
        )
        sig = minhash_signatures(d, 32, "text", "doc_id", 3)
        dt, out = timed(
            f"legacy clique join (c={c_small:,})",
            lambda: _legacy_minhash_pairs(sig, 32, 8, 0.5)
            .agg(F.count(F.lit(1)).alias("pairs"))
            .first(),
        )
        if c_small == 1_000:
            legacy_small = d
        release_storage(spark)

    # connectivity parity at the smallest size: components over the
    # shipped star pairs == components over the legacy clique pairs
    sig = minhash_signatures(legacy_small, 32, "text", "doc_id", 3)
    legacy_pairs = _legacy_minhash_pairs(sig, 32, 8, 0.5).select(
        "doc_a", "doc_b"
    )
    # FACTORY DEFAULTS: max_bucket_size auto-sizes (r13) — the guard
    # must engage without the caller knowing the knob exists
    new_pairs = minhash_lsh_pairs(
        legacy_small, 32, 8, 0.5, shingle_n=3
    ).select("doc_a", "doc_b")
    comp = lambda p: connected_components_star(p, nodes=legacy_small).agg(
        F.count(F.lit(1)).alias("docs"),
        F.count_distinct("component").alias("components"),
        F.sum(F.col("component")).alias("label_sum"),
    ).first()
    ca, cb = comp(legacy_pairs), comp(new_pairs)
    print(f"  components legacy={ca} shipped={cb} equal={ca == cb}")
    assert ca == cb, "star-reduced pairs changed connectivity"
    release_storage(spark)

    # the shipped form at the size the legacy join cannot touch
    d = _hot_cluster_docs(spark, scratch, n_docs, cluster, "hot_full")
    timed(
        f"shipped form (FACTORY DEFAULTS: collapse + auto cap, c={cluster:,})",
        lambda: minhash_lsh_pairs(d, 32, 8, 0.5, shingle_n=3)
        .agg(F.count(F.lit(1)).alias("pairs"))
        .first(),
    )

    # embedding twin: one hot near-identical vector cluster (base +
    # tiny per-member perturbation -> near-identical sign patterns, the
    # corpus shape that saturates a bucket in EVERY band); the shipped
    # collapse + max_bucket_size keeps candidates ~c, not c^2
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        lsh_neardup_pairs,
    )

    n_vecs, vc = n_docs // 5, cluster // 5
    comp = lambda s, i: (
        (F.abs(F.hash(s.cast("string"), i.cast("string"))) % 2001).cast(
            "double"
        )
        - 1000.0
    ) / 1000.0
    in_c = F.col("id") < vc
    seed = F.when(in_c, F.lit(0)).otherwise(F.col("id") + 5_000_000_000)
    base_vec = F.transform(F.sequence(F.lit(0), F.lit(63)), lambda i: comp(seed, i))
    jitter = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: comp(F.col("id") + 7_000_000_000, i) / 200.0,
    )
    vec = F.when(
        in_c, F.zip_with(base_vec, jitter, lambda a, b: a + b)
    ).otherwise(base_vec)
    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(f"{scratch}/hot_vecs")
    ev = spark.read.parquet(f"{scratch}/hot_vecs")
    timed(
        f"embed shipped form (FACTORY DEFAULTS: auto cap, c={vc:,}/{n_vecs:,})",
        lambda: lsh_neardup_pairs(ev, threshold=0.9)
        .agg(F.count(F.lit(1)).alias("pairs"))
        .first(),
    )


if __name__ == "__main__":
    main()
