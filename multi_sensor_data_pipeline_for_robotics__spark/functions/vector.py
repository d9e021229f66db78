"""Vector column expressions over ``array<float>`` / ``array<double>``
embedding columns.

All JVM-side higher-order functions (``zip_with`` + ``aggregate``) — an
Arrow-batched Pandas UDF is ~2-5x faster per-row for very wide vectors,
but the built-ins need no Python workers, pickle no state, and keep the
whole plan inside codegen; at 64-128 dims they win end-to-end. Math is
done in double regardless of storage type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold sum of elementwise products (sequential order — the
    same accumulation order as DuckDB's list functions)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision: dot/(|a|*|b|)."""
    ad, bd = to_double(a), to_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def cosine_batch(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine for HIGH-VOLUME pair verification.

    The ``aggregate``/``zip_with`` expression in :func:`cosine` is exact
    left-fold (DuckDB-parity) but interpreted per element; over millions
    of candidate pairs a numpy batch is ~5-10x faster. Summation order
    differs (pairwise vs sequential) — differences are O(1e-15), so use
    this on paths whose consumers round or threshold, keep :func:`cosine`
    where bit-parity with the sequential-fold oracle matters.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(xa, xb):
        A = np.stack(xa.to_numpy()).astype(np.float64)
        B = np.stack(xb.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return _cos(a, b)


def l2_normalize(v: Column, eps: float = 1e-12) -> Column:
    """Unit-normalize a vector column (double math); zero vectors map to
    zeros instead of NaN.

    NOTE: Column expressions can't let-bind a scalar, so the O(d) norm
    inside the transform lambda is re-evaluated per element — O(d²)
    interpreted work per row. Fine at oracle/query scale (d≈64);
    use :func:`l2_normalize_batch` on 100 TB hot paths."""
    vd = to_double(v)
    n = F.greatest(l2_norm(vd), F.lit(eps))
    return F.transform(vd, lambda x: x / n)


def l2_normalize_batch(v: Column, eps: float = 1e-12) -> Column:
    """Arrow-batched twin of :func:`l2_normalize`: one numpy divide per
    batch, O(d) per row. Summation order differs from the sequential
    fold by O(1e-15) — use where consumers round or threshold."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _norm(vs):
        X = np.stack(vs.to_numpy()).astype(np.float64)
        n = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), eps)
        return pd.Series(list(X / n))

    return _norm(v)


def quantize_int8(v: Column, eps: float = 1e-12) -> Column:
    """Symmetric per-vector int8 quantization (the standard embedding
    compression for ANN serving): scale = max|x|/127, q = round(x/scale).

    Returns a struct ``(scale double, q array<tinyint>)`` — 4x smaller
    than float32 storage; recover with ``dequantize_int8``. Banker's
    rounding (F.round HALF_UP vs numpy HALF_EVEN) is avoided by using
    floor(x+0.5) explicitly, which every engine reproduces.

    Same O(d²)-per-row caveat as :func:`l2_normalize` (the scale
    aggregate re-evaluates inside the lambda); batch with a pandas UDF
    on 100 TB hot paths.
    """
    vd = to_double(v)
    amax = F.aggregate(vd, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = F.greatest(amax, F.lit(eps)) / F.lit(127.0)
    q = F.transform(vd, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qs: Column) -> Column:
    """Inverse of :func:`quantize_int8`: ``q * scale`` as array<double>."""
    return F.transform(qs["q"], lambda x: x.cast("double") * qs["scale"])
