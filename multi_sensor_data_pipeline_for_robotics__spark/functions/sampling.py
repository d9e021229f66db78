"""Deterministic sampling / splitting for training-data pipelines.

``df.sample()``/``sampleBy()`` draw per-partition pseudo-random numbers:
the sample CHANGES when the partitioning changes (file splits, AQE,
cluster size) — a reproducibility hazard for dataset building. The
scalable reproducible alternative is HASH-MOD sampling: membership is a
pure function of the row's key, so any engine, any partitioning, any
rerun selects the same rows, and downstream incremental runs stay
consistent.

The bucket hash is the first 28 bits of sha256(key) — portable across
engines (same trick as the portable MinHash family) and uniform enough
for rate control at ±0.1% on real keyspaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(key: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Stable bucket in [0, n_buckets) from sha256 of the key's string
    form. Engine-portable: any SQL engine with sha256 + hex parsing
    reproduces it bit-for-bit."""
    h = F.conv(F.substring(F.sha2(key.cast("string"), 256), 1, 7), 16, 10).cast(
        "long"
    )
    return h % n_buckets


def hash_sample(
    df: DataFrame, key: str, rate: float, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen purely by key hash. Same key ->
    same decision, forever, on any cluster."""
    return df.filter(hash_bucket(F.col(key), n_buckets) < int(rate * n_buckets))


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_col: str = "split",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Disjoint deterministic splits (e.g. train/val/test).

    ``weights``: split name -> fraction; fractions must sum to <= 1
    (the remainder, if any, is dropped). Boundaries are cumulative
    bucket ranges, so growing one split never reshuffles rows between
    the OTHER splits.
    """
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    b = hash_bucket(F.col(key), n_buckets)
    expr = None
    edge = 0
    for name, w in weights.items():
        edge += int(w * n_buckets)
        cond = b < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    out = df.withColumn(split_col, expr)  # rows past the last edge -> NULL
    return out.filter(F.col(split_col).isNotNull())
