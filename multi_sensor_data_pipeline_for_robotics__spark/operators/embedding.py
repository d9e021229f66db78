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
