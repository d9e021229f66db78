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


def _salt_col(n_salts: int, seed: int, salt_from: str | None) -> Column:
    """Per-row salt in [0, n_salts). With ``salt_from`` it is a PURE
    function of that column (same row -> same salt on any partitioning
    or rerun — use a high-cardinality column, never the hot key itself);
    without, a per-partition pseudo-random draw (fine for algebraic
    aggregation, where any scatter yields the same final answer)."""
    if salt_from is not None:
        return F.pmod(
            F.xxhash64(F.col(salt_from), F.lit(f"#salt{seed}")), F.lit(n_salts)
        ).cast("int")
    return (F.rand(seed) * n_salts).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 11,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output column -> (function, input column), function in
    {sum, count, min, max}. Example::

        salted_aggregate(events, ["event_type"],
                         {"n": ("count", "*"), "total": ("sum", "value")})

    ``salt_from`` (optional) makes the scatter deterministic — only
    relevant for reproducing intermediate partials; the final combined
    values are scatter-invariant either way.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r}")
    salt = _salt_col(n_salts, seed, salt_from).alias("__salt")
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
    salt_from: str | None = None,
) -> DataFrame:
    """Shuffle join with the fact side scattered over ``n_salts``
    replicas of each dimension row.

    Use when the dimension is too big to broadcast but small enough to
    replicate ``n_salts``-fold, and a fact key is hot enough to swamp a
    reducer. Columns of both inputs are preserved (join key once).

    The join RESULT is salt-invariant (each fact row meets each
    matching dim row exactly once — its salt's replica), but pass
    ``salt_from`` (a high-cardinality fact column, e.g. a row id) when
    the pipeline must be bit-reproducible end to end: ``F.rand`` draws
    depend on the physical partitioning, a pure column hash does not.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full would null-extend or duplicate the REPLICATED dim
        # side n_salts times for unmatched rows — semantically wrong
        raise ValueError("salted_join supports how='inner' or 'left' only")
    dim_rep = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    fact_s = fact.withColumn("__salt", _salt_col(n_salts, seed, salt_from))
    return fact_s.join(dim_rep, [on, "__salt"], how).drop("__salt")
