"""Skew-mitigation primitives for hot grouping/join keys.

AQE's skew-join splitting handles most cases at runtime; these helpers
cover the two shapes AQE cannot fix:

  - a groupBy whose hot key floods one reducer even after partial
    aggregation (e.g. high-cardinality payloads per key, or
    non-combinable aggregation buffers): ``salted_aggregate`` splits
    every group into ``n_salts`` subgroups, aggregates the subgroups in
    parallel, then combines the (keys x n_salts) partials — two small
    shuffles instead of one skewed one.
  - a shuffle join against a small-but-not-broadcastable dimension with
    a hot fact key: ``salted_join`` replicates each dimension row
    ``n_salts`` times and scatters the fact side uniformly over the
    replicas, so the hot key's rows land on ``n_salts`` reducers.

Only ALGEBRAIC aggregates (re-combinable partials) are supported by
``salted_aggregate``: sum/count/min/max and anything expressible from
them (mean = sum/count at the final step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 11,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output column -> (function, input column), function in
    {sum, count, min, max}. Example::

        salted_aggregate(events, ["event_type"],
                         {"n": ("count", "*"), "total": ("sum", "value")})
    """
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r}")
    salt = (F.rand(seed) * n_salts).cast("int").alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[_PARTIAL[fn](col).alias(name) for name, (fn, col) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    seed: int = 11,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the fact side scattered over ``n_salts``
    replicas of each dimension row.

    Use when the dimension is too big to broadcast but small enough to
    replicate ``n_salts``-fold, and a fact key is hot enough to swamp a
    reducer. Columns of both inputs are preserved (join key once).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full would null-extend or duplicate the REPLICATED dim
        # side n_salts times for unmatched rows — semantically wrong
        raise ValueError("salted_join supports how='inner' or 'left' only")
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact_s = fact.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    return fact_s.join(dim_rep, [on, "__salt"], how).drop("__salt")
