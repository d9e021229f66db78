"""Embedding-matrix operators: distributed PCA for dimensionality
reduction of an ``array<float>`` embedding column.

Part of the training-data extension surface (no reference-repo analog).

Scale design — PCA over n×d embeddings with n ~ 10^9, d ~ 10^2:
the d×d Gramian XᵀX (and the column-mean vector) is all the fit needs,
and it is an algebraic aggregate: each Arrow batch contributes a
partial ``Xᵀ X`` (one numpy matmul) and a partial column sum, partials
add elementwise, and only ``d² + d`` doubles per partition ever cross
the network. The eigendecomposition of the d×d covariance runs on the
driver (d=64 → microseconds); components broadcast back inside a
projection UDF's closure. The corpus is scanned exactly once for the
fit and once for the projection — no shuffle of vectors at any point.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pca_fit(
    embeddings: DataFrame,
    n_components: int = 8,
    vec_col: str = "embedding",
) -> dict:
    """Fit PCA; returns ``{"mean": [d], "components": [k][d],
    "explained_variance": [k], "n": int}``.

    Deterministic given the input SET: the Gramian partials are summed
    with numpy float64 in a fixed elementwise reduce, and eigenvector
    sign is fixed by making each component's largest-|coordinate| entry
    positive. (Float addition order across partitions can differ by
    O(1e-15); downstream consumers round or threshold.)
    """
    d_probe = len(embeddings.select(vec_col).first()[0])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((d_probe, d_probe), dtype=np.float64)
        s = np.zeros(d_probe, dtype=np.float64)
        n = 0
        for b in batches:
            if len(b) == 0:
                continue
            X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            gram += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        if n:
            yield pd.DataFrame(
                {"gram": [gram.ravel().tolist()], "s": [s.tolist()], "n": [n]}
            )

    parts = embeddings.select(vec_col).mapInPandas(
        partials, schema="gram array<double>, s array<double>, n long"
    ).collect()
    if not parts:
        raise ValueError("pca_fit: empty input")
    gram = np.sum([np.asarray(p["gram"]).reshape(d_probe, d_probe) for p in parts], axis=0)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    n = int(sum(p["n"] for p in parts))
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T  # (k, d)
    # sign convention: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": vals[order].tolist(),
        "n": n,
    }


def pca_project(
    embeddings: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    round_to: int | None = 6,
) -> DataFrame:
    """Project onto the fitted components: ``(x - mean) @ componentsᵀ``.

    One Arrow-batched matmul per batch; the (k×d) component matrix ships
    once per executor in the UDF closure — never in a shuffle.
    """
    from pyspark.sql.functions import pandas_udf

    M = np.asarray(model["mean"], dtype=np.float64)
    C = np.asarray(model["components"], dtype=np.float64)

    @pandas_udf("array<double>")
    def _proj(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy()).astype(np.float64)
        Y = (X - M) @ C.T
        if round_to is not None:
            Y = np.round(Y, round_to)
        return pd.Series(list(Y))

    return embeddings.withColumn(out_col, _proj(F.col(vec_col)))


def label_centroids(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """Per-label centroid quality readout: one row per label
    (label, n, centroid_norm, mean_cos_to_centroid) — how tight each
    class sits around its mean vector.  Collapsing classes (centroid
    norm near 0) or diffuse ones (mean cosine well below the others)
    are the standard screens before trusting labels or training a
    classifier head on the embeddings.

    Plan: posexplode to (label, dim, val) and ONE map-side-combined
    mean per (label, dim) — shuffle bounded by labels x dim, never row
    count; the centroid assembles via sort_array(collect_list) over
    those <= dim rows per label, broadcasts back onto the vectors, and
    the per-row cosine folds in a second bounded aggregate.  Exact
    left-fold ``cosine`` keeps DuckDB parity; the mean over rows is a
    double sum rounded at 6 (non-lattice values).
    """
    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.functions.vector import (
        dot,
        l2_norm,
    )

    base = embeddings.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    dims = base.select(
        "label", F.posexplode("v").alias("dim", "val")
    )
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg("val").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("dim"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )
    joined = base.join(F.broadcast(cent), "label")
    cn = F.sqrt(
        F.aggregate("centroid", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # try_divide + explicit guard: a COLLAPSED class (antipodal vectors)
    # has a zero centroid and ANSI division would raise; the guarded
    # cosine yields NULL and avg() skips it
    cos_c = F.when(
        cn > 0,
        F.try_divide(
            dot(F.col("v"), F.col("centroid")),
            l2_norm(F.col("v")) * cn,
        ),
    )
    return (
        joined.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first(cn), round_to).alias("centroid_norm"),
            F.round(F.avg(cos_c), round_to).alias("mean_cos_to_centroid"),
        )
    )


def label_centroids_oracle_sql(round_to: int = 6) -> str:
    """DuckDB twin of :func:`label_centroids` over the embeddings view
    — same per-dim means, same left-fold cosine."""
    return f"""
WITH base AS (
    SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings
),
dims AS (
    SELECT label, CAST(i AS INTEGER) AS dim, v[i + 1] AS val
    FROM base, unnest(range(len(v))) AS t(i)
),
cent AS (
    SELECT label, list(m ORDER BY dim) AS centroid
    FROM (SELECT label, dim, avg(val) AS m FROM dims GROUP BY 1, 2)
    GROUP BY label
),
scored AS (
    SELECT base.label,
           CASE WHEN sqrt(list_dot_product(cent.centroid, cent.centroid)) > 0
                THEN list_dot_product(base.v, cent.centroid)
                     / (sqrt(list_dot_product(base.v, base.v))
                        * sqrt(list_dot_product(cent.centroid,
                                                cent.centroid)))
           END AS cos_c,
           sqrt(list_dot_product(cent.centroid, cent.centroid)) AS cn
    FROM base JOIN cent USING (label)
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(any_value(cn), {round_to}) AS centroid_norm,
       round(avg(cos_c), {round_to}) AS mean_cos_to_centroid
FROM scored GROUP BY label
"""
