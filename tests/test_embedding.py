"""Distributed PCA + vector function invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions import vector as V
from multi_sensor_data_pipeline_for_robotics__spark.operators import embedding as EMB
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table


def test_pca_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = EMB.pca_fit(emb, n_components=4)
    C = np.asarray(model["components"])
    ev = np.asarray(model["explained_variance"])

    # components orthonormal, variances descending and non-negative
    assert np.allclose(C @ C.T, np.eye(4), atol=1e-8)
    assert (np.diff(ev) <= 1e-9).all() and (ev >= -1e-9).all()

    # exact numpy replica on the collected matrix
    X = np.stack(
        emb.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    cov = np.cov(X, rowvar=False, bias=True)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    assert np.allclose(ev, w, rtol=1e-8)

    # projection reproduces (X - mean) @ C.T
    got = (
        EMB.pca_project(emb, model, round_to=None)
        .orderBy("vec_id")
        .select("pca")
        .toPandas()["pca"]
    )
    Y = np.stack(got.to_numpy())
    pdf = emb.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    Xo = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    want = (Xo - np.asarray(model["mean"])) @ np.asarray(model["components"]).T
    assert np.allclose(Y, want, atol=1e-8)


def test_quantize_roundtrip(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1, 2],
                "embedding": [
                    [1.0, -2.0, 0.5, 127.0],
                    [0.0, 0.0, 0.0, 0.0],  # zero vector: no NaN/overflow
                    [-0.003, 0.001, 0.002, -0.001],
                ],
            }
        )
    )
    qs = V.quantize_int8(F.col("embedding"))
    out = (
        df.select("vec_id", qs.alias("qs"), V.dequantize_int8(qs).alias("back"))
        .orderBy("vec_id")
        .collect()
    )
    for r in out:
        orig = {0: [1.0, -2.0, 0.5, 127.0], 1: [0.0] * 4, 2: [-0.003, 0.001, 0.002, -0.001]}[
            r["vec_id"]
        ]
        scale = r["qs"]["scale"]
        assert all(-127 <= q <= 127 for q in r["qs"]["q"])
        # reconstruction error bounded by scale/2 per coordinate
        assert all(abs(b - o) <= scale / 2 + 1e-12 for b, o in zip(r["back"], orig))


def test_l2_normalize_unit_norm(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    norms = (
        emb.select(V.l2_norm(V.l2_normalize(F.col("embedding"))).alias("n"))
        .toPandas()["n"]
    )
    assert np.allclose(norms, 1.0, atol=1e-9)


def test_semantic_dedup_matches_numpy_and_survivor_invariant(spark, sf_dir):
    """Differential check of semantic_dedup_fixedpoint's pair stage:
    given the operator's own cluster assignment, a NumPy replica of the
    integer-lattice arithmetic must reproduce max_sim/dup_of/is_dup
    exactly; and the SemDeDup survivor invariant must hold — within a
    cluster, survivors are pairwise below threshold (each survivor is
    an 'earlier member' of every later survivor's screen)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators import (
        similarity as SIM,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    scale, thr = 1_000_000, 0.35
    out = (
        SIM.semantic_dedup_fixedpoint(emb, nlist=16, iters=2, threshold=thr)
        .orderBy("vec_id")
        .toPandas()
    )
    pdf = emb.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = np.maximum(np.sqrt((X * X).sum(axis=1)), 1e-12)
    Q = np.floor(X / nrm[:, None] * scale).astype(np.int64)
    ids = pdf["vec_id"].to_numpy()
    thr_int = int(np.floor(thr * float(scale) * float(scale)))

    by_cluster: dict[int, list[int]] = {}
    for i, c in zip(range(len(out)), out["cluster_id"]):
        by_cluster.setdefault(int(c), []).append(i)

    n_dup = 0
    for members in by_cluster.values():
        members.sort(key=lambda i: ids[i])
        for rank, i in enumerate(members):
            row = out.iloc[i]
            if rank == 0:
                assert pd.isna(row["max_sim"]) and not row["is_dup"]
                continue
            sims = {
                ids[j]: int(Q[i] @ Q[j]) for j in members[:rank]
            }
            best_s = max(sims.values())
            best_id = min(b for b, s in sims.items() if s == best_s)
            assert row["dup_of"] == best_id
            assert row["max_sim"] == round(best_s / float(scale) ** 2, 6)
            assert bool(row["is_dup"]) == (best_s >= thr_int)
            n_dup += int(row["is_dup"])
        # survivor invariant: pairwise integer sims below threshold
        surv = [i for i in members if not out.iloc[i]["is_dup"]]
        for a in range(len(surv)):
            for b in range(a + 1, len(surv)):
                assert int(Q[surv[a]] @ Q[surv[b]]) < thr_int
    assert n_dup > 0  # the threshold is discriminative on this corpus


# ---------------------------------------------------------------------------
# feature_hash_vectors (hashing trick)
# ---------------------------------------------------------------------------
def test_feature_hash_shape_and_determinism(spark):
    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.functions.vector import (
        feature_hash_vectors,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "a b"), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["vector"] for r in feature_hash_vectors(docs, dim=8).collect()}
    assert set(got) == {1, 2}  # NULL text -> no vector
    assert all(len(v) == 8 for v in got.values())
    # signed counts: total mass of doc 1 is 4 tokens -> sum of |v| <= 4
    assert sum(abs(x) for x in got[1]) <= 4
    # partitioning independence
    again = {
        r["doc_id"]: r["vector"]
        for r in feature_hash_vectors(docs.repartition(5), dim=8).collect()
    }
    assert got == again


def test_feature_hash_cosine_reflects_overlap(spark):
    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.functions.vector import (
        cosine,
        feature_hash_vectors,
        to_double,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "entirely different words about spark engines here now"),
        ],
        "doc_id long, text string",
    )
    vecs = feature_hash_vectors(docs, dim=64)
    a = vecs.alias("a")
    b = vecs.alias("b")
    sims = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("ia"),
            F.col("b.doc_id").alias("ib"),
            cosine(
                to_double(F.col("a.vector")), to_double(F.col("b.vector"))
            ).alias("sim"),
        )
        .collect()
    )
    s = {(r["ia"], r["ib"]): r["sim"] for r in sims}
    # near-duplicate pair scores far above the unrelated pairs
    assert s[(1, 2)] > 0.7
    assert s[(1, 2)] > s[(1, 3)] + 0.3 and s[(1, 2)] > s[(2, 3)] + 0.3


def test_feature_hash_rejects_bad_dim(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.functions.vector import (
        feature_hash_vectors,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError):
        feature_hash_vectors(docs, dim=0)


def test_hard_negatives_label_mismatch_only(spark):
    """Every returned candidate has a different label than its query,
    and within that constraint ranking matches brute-force cosine."""
    import math

    from pyspark.sql import Row

    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        hard_negatives,
    )

    # 2D unit-ish vectors at known angles; labels alternate
    vecs = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # same label as 0 -> never its negative
        (2, [0.95, 0.3], 1),   # closest different-label vector to 0
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v, label=l) for i, v, l in vecs]
    )
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    got = hard_negatives(df, q, k=2).collect()
    assert [r.cand_id for r in got] == [2, 3]
    assert all(r.query_id == 0 for r in got)
    assert got[0].cosine > got[1].cosine


def test_label_centroids_known_geometry(spark):
    """Hand-built 2D clusters: a tight class has mean cosine 1 to its
    centroid, an antipodal class collapses to a near-zero centroid."""
    from pyspark.sql import Row

    from multi_sensor_data_pipeline_for_robotics__spark.operators.embedding import (
        label_centroids,
    )

    rows = [
        # label 0: all identical -> centroid = the vector, cos = 1
        Row(vec_id=0, embedding=[3.0, 4.0], label=0),
        Row(vec_id=1, embedding=[3.0, 4.0], label=0),
        # label 1: antipodal pair -> centroid [0, 0]-ish
        Row(vec_id=2, embedding=[1.0, 0.0], label=1),
        Row(vec_id=3, embedding=[-1.0, 0.0], label=1),
    ]
    got = {r.label: r for r in label_centroids(
        spark.createDataFrame(rows)).collect()}
    assert got[0].n == 2
    assert got[0].centroid_norm == pytest.approx(5.0, abs=1e-6)
    assert got[0].mean_cos_to_centroid == pytest.approx(1.0, abs=1e-6)
    assert got[1].centroid_norm == pytest.approx(0.0, abs=1e-6)


def test_hard_negatives_ivf_recall_floor_and_label_filter(spark):
    """The IVF-probed miner: (a) every candidate's label differs from
    its query's, (b) recall@10 vs the exact brute-force miner clears a
    documented floor on the driver embeddings table (measured 0.90 at
    nprobe=4/nlist=16 on the near-random corpus — quantization's worst
    case; floor set well under per the house margin)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    K = 10
    exact = {}
    for r in hard_negatives(emb, qs, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.cand_id)
    got_rows = hard_negatives_ivf(emb, qs, k=K, nlist=16, nprobe=4).collect()
    labels = {r["vec_id"]: r["label"] for r in
              emb.select("vec_id", "label").collect()}
    approx = {}
    for r in got_rows:
        assert labels[r.cand_id] != labels[r.query_id]
        approx.setdefault(r.query_id, set()).add(r.cand_id)
    rec = sum(
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ) / len(exact)
    print("hard_negatives_ivf recall@10:", round(rec, 3))
    assert rec >= 0.60


def test_diverse_prototypes_covers_clusters(spark):
    """Hand-built 2D geometry: two well-separated directions; each
    centroid region returns its own most-centroid-aligned members, so
    the sample covers BOTH regions (uniform sampling of this frame
    would be 5:2 biased toward the dense direction)."""
    from pyspark.sql import Row

    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        diverse_prototypes,
    )

    rows = [
        # centroid 0 = vec 0 ([1,0]); centroid 1 = vec 1 ([0,1])
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0]),
        # dense region around x-axis
        Row(vec_id=2, embedding=[0.99, 0.05]),
        Row(vec_id=3, embedding=[0.98, 0.1]),
        Row(vec_id=4, embedding=[0.97, 0.15]),
        # sparse region around y-axis
        Row(vec_id=5, embedding=[0.05, 0.99]),
    ]
    df = spark.createDataFrame(rows)
    got = diverse_prototypes(df, nlist=2, per_cluster=2).collect()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.cent_id, []).append(r.vec_id)
    # both regions represented, 2 each, ordered by centroid alignment
    assert by_cluster[0] == [0, 2]   # exact member first, then closest
    assert by_cluster[1] == [1, 5]
    assert all(r.rank in (1, 2) for r in got)


def test_ivf_topk_pretrained_centroids_roundtrip(spark, tmp_path):
    """ivf_topk(centroids=...) with saved+reloaded trained centroids
    equals ivf_topk(train_iters=2) computed in place — the train-once /
    serve-many path is lossless."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.sources.models import (
        load_model_tables,
        save_model_tables,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_centroids(emb, nlist=8, iters=2)
    p = str(tmp_path / "ivf")
    save_model_tables(
        p,
        {"centroids": spark.createDataFrame(
            [(i, v) for i, v in enumerate(cents)],
            "cent_id int, cv array<double>",
        )},
        meta={"nlist": 8},
    )
    loaded, meta = load_model_tables(spark, p)
    reloaded = [
        r.cv for r in loaded["centroids"].orderBy("cent_id").collect()
    ]
    want = sorted(map(tuple, ivf_topk(
        emb, qs, k=5, nlist=8, nprobe=2, train_iters=2
    ).collect()))
    got = sorted(map(tuple, ivf_topk(
        emb, qs, k=5, nlist=meta["nlist"], nprobe=2, centroids=reloaded
    ).collect()))
    assert got == want and len(got) > 0


def test_diverse_prototypes_excludes_zero_vectors(spark):
    """An all-zeros embedding must neither become a centroid nor a
    prototype (its 0/0 cosine is NaN, which sorts above every real
    double in DESC order)."""
    from pyspark.sql import Row

    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        diverse_prototypes,
    )

    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[0.0, 0.0]),   # padding vector
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=[0.9, 0.1]),
        ]
    )
    got = diverse_prototypes(df, nlist=2, per_cluster=2).collect()
    ids = {r.vec_id for r in got}
    assert 0 not in ids
    assert all(r.cos_to_centroid == r.cos_to_centroid for r in got)  # no NaN


def test_lsh_banding_audit_collision_matches_screen(spark, sf_dir):
    """The collision stratum's true-pair count equals the portable
    screen's output exactly (same banding, same exact-cosine rule),
    and the strata are disjoint by construction."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        lsh_banding_audit,
        lsh_neardup_pairs_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    audit = {
        r["stratum"]: r for r in lsh_banding_audit(emb, random_buckets=16).collect()
    }
    n_screen = lsh_neardup_pairs_portable(emb).count()
    assert audit["collision"]["n_true_pairs"] == n_screen
    assert audit["collision"]["n_pairs"] >= n_screen
    rand = audit["random_nocollision"]
    assert rand["n_pairs"] > 0
    assert 0.0 <= rand["true_pair_rate"] <= 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 1"):
        lsh_banding_audit(emb, random_buckets=0)


def test_lsh_collapse_star_and_bucket_guard(spark):
    """Sign-identical vectors collapse to min-id star edges (a strict
    candidate pruning — members collide in every band anyway); the
    max_bucket_size guard preserves the exact-cosine survivor set's
    connectivity while the audit surfaces the dropped-pair row."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        lsh_banding_audit,
        lsh_neardup_pairs,
        lsh_neardup_pairs_portable,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=64)
    rows = [(i, [float(x) for x in base]) for i in range(6)]  # exact dupes
    rows += [
        (100 + i, [float(x) for x in rng.normal(size=64)]) for i in range(10)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for fn in (lsh_neardup_pairs, lsh_neardup_pairs_portable):
        pairs = {
            (r.id_a, r.id_b): r.cosine
            for r in fn(emb, threshold=0.9, bands=4, band_bits=4).collect()
        }
        star = {p for p in pairs if p[1] < 100}
        assert star == {(0, i) for i in range(1, 6)}
        assert all(abs(pairs[p] - 1.0) < 1e-9 for p in star)
    bounded = {
        (r.id_a, r.id_b)
        for r in lsh_neardup_pairs_portable(
            emb, threshold=0.9, bands=4, band_bits=4, max_bucket_size=1
        ).collect()
    }
    assert {(0, i) for i in range(1, 6)} <= bounded
    audit = {
        r.stratum: r
        for r in lsh_banding_audit(
            emb, bands=4, band_bits=4, random_buckets=None, max_bucket_size=1
        ).collect()
    }
    assert audit["bucket_star_dropped"].n_pairs >= 0
    assert audit["bucket_star_dropped"].n_true_pairs is None


def test_lsh_collapse_is_byte_identical_only(spark):
    """The always-on collapse must key on BYTE-IDENTICAL vectors, not
    bucket-array identity: cosine is not a function of the buckets, so
    a member sharing all sign buckets with a lower-id representative
    can still pass the threshold against an external vector the
    representative fails — collapsing it away silently changed
    components (the r12 regression). Construction: m = normalize(r +
    0.05u) shares r's entire bucket array under the portable planes;
    x sits 26.5 deg from r in the (r, u) plane, so cos(m, x) = 0.9161
    >= 0.9 > 0.894934 = cos(r, x)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.similarity import (
        _portable_planes,
        lsh_neardup_pairs_portable,
    )

    P = np.asarray(_portable_planes(64, 16))

    def buckets(v):
        signs = (P @ v >= 0).astype(int)
        return tuple(
            int("".join(map(str, signs[b * 4 : (b + 1) * 4])), 2)
            for b in range(4)
        )

    rng = np.random.default_rng(3)
    r = rng.normal(size=64)
    r /= np.linalg.norm(r)
    u = rng.normal(size=64)
    u -= (u @ r) * r
    u /= np.linalg.norm(u)
    m = r + 0.05 * u
    m /= np.linalg.norm(m)
    th = np.deg2rad(26.5)
    x = np.cos(th) * r + np.sin(th) * u
    # preconditions: the old bucket-array key WOULD have collapsed m
    # into r, and the banding does compare (m, x)
    assert buckets(r) == buckets(m)
    assert any(a == b for a, b in zip(buckets(m), buckets(x)))
    emb = spark.createDataFrame(
        [(0, [float(v) for v in r]), (1, [float(v) for v in m]),
         (2, [float(v) for v in x])],
        ["vec_id", "embedding"],
    )
    got = {
        (p.id_a, p.id_b): p.cosine
        for p in lsh_neardup_pairs_portable(
            emb, threshold=0.9, bands=4, band_bits=4
        ).collect()
    }
    # the member's edge survives; the representative's rightly fails
    assert (1, 2) in got and abs(got[(1, 2)] - 0.9161) < 1e-9
    assert (0, 2) not in got
    assert (0, 1) in got  # rep-member edge keeps the cluster connected
