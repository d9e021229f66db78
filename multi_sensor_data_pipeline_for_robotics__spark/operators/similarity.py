"""Similarity search over embedding columns (``array<float>``).

Three tiers, trading exactness for scale:
  - ``cosine_topk``      exact brute force — broadcast the (small) query
                         set against the corpus; one scan, no corpus
                         shuffle; per-query top-k via window.
  - ``neardup_pairs``    exact all-pairs >= threshold — quadratic;
                         correctness baseline and oracle target.
  - ``lsh_neardup_pairs`` random-hyperplane (sign) LSH — candidate
                         pairs from band equi-joins, verified with the
                         exact cosine; approximate recall, linear-ish
                         cost. The scale path for 100 TB corpora.
  - ``ivf_topk``         inverted-file ANN: partition the corpus by
                         nearest coarse centroid, probe the closest
                         ``nprobe`` lists per query.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from multi_sensor_data_pipeline_for_robotics__spark.functions.vector import (
    cosine,
    cosine_batch,
    dot,
    l2_norm,
    to_double,
)
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import ensure_parallelism


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, embedding). The query side is broadcast, so
    the corpus is scanned once with no shuffle; ranking shuffles only
    (query, candidate, sim) triples. Deterministic order: rounded sim
    DESC, then candidate id ASC.
    """
    e = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    sim = F.round(cosine(F.col("cand_vec"), F.col("query_vec")), round_to)
    scored = (
        e.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", sim)
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: cosine >= threshold,
    ``id_a < id_b``. All-pairs — use ``lsh_neardup_pairs`` at scale."""
    a = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), round_to)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _band_buckets_udf(planes: list[list[float]], bands: int, band_bits: int):
    """Arrow-vectorized Pandas UDF: all band buckets of a vector batch in
    one numpy matmul.

    Expressing (bands*band_bits) hyperplane projections as Catalyst
    ``aggregate``/``zip_with`` expressions builds a per-row expression
    tree of thousands of nodes — codegen-hostile and ~10x slower. One
    ``X @ P.T`` over an Arrow batch is the vectorized fast path; the
    plane matrix ships once per executor in the closure (bands*bits*dim
    doubles — a few KB, never a shuffle).
    """
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64)  # (bands*band_bits, dim)
    weights = (1 << np.arange(band_bits, dtype=np.int64))  # pack bits LSB-first

    @pandas_udf("array<long>")
    def buckets(vecs):
        import pandas as pd

        X = np.stack(vecs.to_numpy())  # (n, dim)
        signs = (X.astype(np.float64) @ P.T) >= 0  # (n, bands*bits)
        B = signs.reshape(len(X), -1, len(weights)) @ weights  # (n, bands)
        return pd.Series(list(B))

    return buckets


def lsh_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    bands: int = 8,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Approximate near-dup pairs: random-hyperplane LSH candidates
    verified with exact cosine.

    Each band hashes ``band_bits`` hyperplane signs; candidates are
    pairs agreeing on all bits of >= 1 band (equi-join per band). The
    deterministic seed makes runs reproducible. Recall < 1 by design —
    that is the trade for join-instead-of-cross-product at scale.
    """
    planes = _hyperplanes(dim, bands * band_bits, seed)
    buckets = _band_buckets_udf(planes, bands, band_bits)
    # Candidate generation moves only (id, band, bucket) triples — the
    # vectors are re-attached by id AFTER pair dedup, so the wide shuffle
    # of the band join never carries embedding payloads.
    banded = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("doc"),
        F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ea = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    eb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = F.round(cosine_batch(F.col("va"), F.col("vb")), round_to)
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    nlist: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means coarse quantizer for :func:`ivf_topk`.

    Deterministic init (the first ``nlist`` corpus vectors by id — no
    RNG, so runs are reproducible), then ``iters`` Lloyd rounds, each
    ONE ``mapInPandas`` scan of the corpus with assign + update fused:
    the centroid matrix ships in the closure, each Arrow batch assigns
    by one numpy matmul (cosine == dot against unit centroids; argmax
    tie → lowest centroid id) and accumulates per-centroid vector sums
    and counts, and only ``nlist×(dim+1)`` partial doubles per partition
    cross the network. No cross join, no shuffle of vectors, no
    assignment materialization. The driver reduces partials, normalizes
    (spherical k-means — IVF probes by cosine, so the quantizer
    optimizes the same metric), and re-ships.

    Empty clusters keep their previous centroid. At 100 TB you'd fit on
    a ``.sample()`` of the corpus — the quantizer needs only
    ~100×nlist training points; pass that sample as ``embeddings``.
    """
    from typing import Iterator

    import pandas as pd

    init = (
        embeddings.orderBy(id_col).limit(nlist).select(F.col(vec_col).alias("v")).collect()
    )
    cents = np.asarray([r["v"] for r in init], dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    corpus = embeddings.select(F.col(vec_col).alias("__v"))
    for _ in range(iters):
        C = cents  # closure snapshot for this round

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            k, d = C.shape
            sums = np.zeros((k, d), dtype=np.float64)
            cnt = np.zeros(k, dtype=np.int64)
            for b in batches:
                if len(b) == 0:
                    continue
                X = np.stack(b["__v"].to_numpy()).astype(np.float64)
                Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
                a = np.argmax(Xn @ C.T, axis=1)  # ties -> lowest cent_id
                np.add.at(sums, a, X)
                np.add.at(cnt, a, 1)
            if cnt.sum():
                yield pd.DataFrame(
                    {"sums": [sums.ravel().tolist()], "cnt": [cnt.tolist()]}
                )

        parts = corpus.mapInPandas(
            partials, schema="sums array<double>, cnt array<long>"
        ).collect()
        if not parts:
            break
        k, d = cents.shape
        sums = np.sum([np.asarray(p["sums"]).reshape(k, d) for p in parts], axis=0)
        cnt = np.sum([np.asarray(p["cnt"]) for p in parts], axis=0)
        new = cents.copy()
        for ci in range(k):
            if cnt[ci] > 0:
                v = sums[ci] / cnt[ci]
                n = np.linalg.norm(v)
                if n > 1e-12:
                    new[ci] = v / n
        cents = new
    return [[float(x) for x in c] for c in cents]


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
    train_iters: int = 0,
) -> DataFrame:
    """Inverted-file ANN: coarse-quantize the corpus to its nearest
    centroid, then each query scans only its ``nprobe`` nearest lists.

    ``train_iters=0`` (default) uses the first ``nlist`` corpus vectors
    as deterministic coarse centroids — fully reproducible in any
    engine, hence the oracle-checked path. ``train_iters>0`` runs that
    many spherical-k-means Lloyd rounds (:func:`kmeans_centroids`) from
    the same init — better-balanced lists / higher recall, identical
    plan shape afterwards.

    Scale shape: corpus assignment is one broadcast-join scan;
    candidate scoring touches ~nprobe/nlist of the corpus per query.
    """
    spark = embeddings.sparkSession
    if train_iters > 0:
        trained = kmeans_centroids(embeddings, nlist, train_iters, id_col, vec_col)
        cents = spark.createDataFrame(
            [(i, v) for i, v in enumerate(trained)],
            "cent_id int, cent_vec array<double>",
        )
    else:
        cents = (
            embeddings.orderBy(id_col)
            .limit(nlist)
            .select(F.col(id_col).alias("cent_src"), F.col(vec_col).alias("cent_vec"))
        )
        # stable centroid ids 0..nlist-1 by source id order
        wc = W.orderBy("cent_src")
        cents = cents.select(
            (F.row_number().over(wc) - 1).alias("cent_id"), "cent_vec"
        )

    def nearest_lists(df, vcol, out, n):
        scored = df.join(F.broadcast(cents), how="cross").withColumn(
            "__sim", cosine(F.col(vcol), F.col("cent_vec"))
        )
        w = W.partitionBy(*[c for c in df.columns if c != vcol][:1]).orderBy(
            F.col("__sim").desc(), F.col("cent_id").asc()
        )
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n)
            .select(*df.columns, F.col("cent_id").alias(out))
        )

    e = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))
    assigned = nearest_lists(e, "cand_vec", "list_id", 1)
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    probes = nearest_lists(q, "query_vec", "list_id", nprobe)

    sim = F.round(cosine(F.col("cand_vec"), F.col("query_vec")), round_to)
    scored = (
        assigned.join(probes, "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", sim)
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
        .dropDuplicates(["query_id", "cand_id"])
    )
