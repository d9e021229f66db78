"""Portable Bloom-filter semi-join reduction.

The 100 TB move: a selective dimension-side predicate should shrink
the FACT side before its shuffle. Spark's own runtime bloom
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
opportunistically; this module provides the EXPLICIT, engine-portable
version: build a bitmap from the small side's join keys (k md5-derived
bit positions per key), broadcast the ~m/64-long word array as a
literal, and pre-filter the big side with a pure-codegen membership
test — no UDF, no shuffle added, and the big side's filter sits below
its join exchange, so pruned rows never shuffle.

Because the bit positions come from md5 (identical bytes in every
engine), the filter — INCLUDING its false positives — is
deterministic and cross-engine reproducible, so a graded query over
the bloom-reduced side hash-matches a DuckDB replay exactly. False
positives only ever ADD rows that a subsequent real join would drop;
the reduced join therefore equals the unfiltered join (asserted in
tests).

Scale shape: bitmap build = one pass over the SMALL side (explode k
positions, groupBy word index with bit_or — map-side combinable),
then a collect of 2^m_bits/32 words (16 KiB at m_bits=16); membership
test = k md5 evaluations per big-side row inside whole-stage codegen.
Sizing: false-positive rate ~ (1 - e^(-k·n/m))^k — ~10-16 bits per
expected key gives ~1% at k=4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex digits = 60 bits, exact in BIGINT — the same md5-prefix trick
# as functions.sketch.kmv_hash, salted per hash function
_HEX_DIGITS = 15


def _position(col: Column, j: int, m_bits: int) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f"#bloom{j}"))),
                1,
                _HEX_DIGITS,
            ),
            16,
            10,
        ).cast("bigint")
        % (2**m_bits)
    )


def bloom_build(
    small: DataFrame, key_col: str, k: int = 4, m_bits: int = 16
) -> list[int]:
    """One pass over the small side -> the bitmap as ``2^m_bits / 32``
    words (the only collect — 2048 words at m_bits=16). Words hold 32
    bits each: DuckDB raises on BIGINT ``1 << 63`` where Java wraps,
    so the portable encoding never shifts past bit 31."""
    pos = F.explode(
        F.array(*[_position(F.col(key_col), j, m_bits) for j in range(k)])
    ).alias("p")
    words = (
        small.select(pos)
        .select(
            F.shiftright("p", 5).alias("w"),
            # SQL-text shiftleft: the python wrapper only takes an int
            # shift amount, the SQL function takes any expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias(
                "b"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    arr = [0] * (2**m_bits // 32)
    for r in words:
        arr[int(r["w"])] = int(r["bits"])
    return arr


def bloom_might_contain(
    key: Column, bitmap: list[int], k: int = 4, m_bits: int = 16
) -> Column:
    """Membership-test Column over the broadcast literal word array —
    ANDs the k probed bits via ``getbit``; pure codegen, no UDF."""
    words = F.array(*[F.lit(int(w)).cast("long") for w in bitmap])
    cond = None
    for j in range(k):
        p = _position(key, j, m_bits)
        w = F.element_at(words, F.shiftright(p, 5).cast("int") + 1)
        c = F.getbit(w, p % 32) == 1
        cond = c if cond is None else cond & c
    return cond


def bloom_semi_filter(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    k: int = 4,
    m_bits: int = 16,
) -> DataFrame:
    """The composed reduction: build the bitmap from ``small``'s keys,
    pre-filter ``big`` to probable members. Follow with the real join;
    the filter only adds deterministic false positives the join
    drops."""
    bitmap = bloom_build(small, small_key or big_key, k, m_bits)
    return big.filter(bloom_might_contain(F.col(big_key), bitmap, k, m_bits))


def bloom_oracle_sql(
    big_table: str,
    small_sql: str,
    big_key: str,
    small_key: str,
    k: int = 4,
    m_bits: int = 16,
) -> str:
    """DuckDB replay: rebuild the identical bitmap in a CTE and apply
    the identical membership test — same md5 positions, same words."""
    m = 2**m_bits

    def pos(expr: str, j: int) -> str:
        return (
            f"(CAST(concat('0x', substr(md5(concat(CAST({expr} AS VARCHAR),"
            f" '#bloom{j}')), 1, {_HEX_DIGITS})) AS BIGINT) % {m})"
        )

    small_pos = ", ".join(pos(small_key, j) for j in range(k))
    tests = []
    for j in range(k):
        p = pos(f"b.{big_key}", j)
        tests.append(
            f"(((SELECT bits FROM words WHERE w = ({p} >> 5))"
            f" >> CAST({p} % 32 AS INT)) & 1) = 1"
        )
    test = "\n  AND ".join(tests)
    return f"""
WITH skeys AS ({small_sql}),
pos AS (
    SELECT UNNEST([{small_pos}]) AS p FROM skeys
),
words AS (
    SELECT p >> 5 AS w,
           bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
    FROM pos GROUP BY 1
)
SELECT * FROM {big_table} b
WHERE {test}
"""
