"""Portable frequency sketches: Count-Min, exact heavy hitters, top-k
frequent values.

The frequency side of the sketch toolbox (`functions.sketch` covers
cardinality and quantiles): how often does each value occur, which
values cross a frequency threshold, which k are most common — the
questions a training-data pipeline asks of token streams, user ids,
URLs and near-dup cluster sizes before deciding what to cap, drop or
upsample.

Count-Min [Cormode & Muthukrishnan, J. Algorithms 2005]: a depth x
width counter grid; each value increments one counter per row (md5-
derived position, salted per row), and a point estimate is the MIN
over the value's depth counters — an overestimate by at most
eps * N with probability 1 - delta at width = e/eps, depth = ln(1/
delta). Counters are plain sums, so sketches MERGE by adding
cell-wise (per-partition partials merge for free in the groupBy) and
the stored form is a tiny (d, w, cnt) table. Positions come from the
same md5-prefix arithmetic as `sketch.kmv_hash`, so the sketch —
including its collisions, hence the estimate itself — is
bit-reproducible in any engine with md5 and hash-checkable by the
oracle gate.

Heavy hitters here are EXACT, not sketched: Spark's groupBy is a
distributed counter with map-side combine, so at any scale the full
count table costs one shuffle of (value, partial-count) pairs and the
phi-threshold output is at most 1/phi rows. The classical streaming
alternatives (Misra-Gries / Space-Saving) answer a harder problem —
bounded memory on ONE pass of an ordered stream — at the price of
order-dependent summaries that can't be hash-checked; in a batch
engine the exact groupBy dominates them on every axis. (The streaming
module's `cms_stream` covers the unbounded-stream case with the
order-INsensitive Count-Min state instead.)

Scale shape: `cms_sketch` shuffles at most depth * width cells after
map-side combine regardless of input rows; `cms_estimate` is depth
broadcast-hash probes of that cell table per query key (the same
probe pattern as `functions.bloom`); `heavy_hitters` / `top_k_
frequent` shuffle map-side-combined (value, count) partials, with the
top-k taken by TakeOrderedAndProject (global) or a salted two-phase
per-group ranking (grouped) — never a global sort, never a whole
group's count table in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex digits = 60 bits in BIGINT range — the kmv_hash trick, salted
# per sketch row
_HEX_DIGITS = 15


def _cms_position(col: Column, d: int, width: int) -> Column:
    """Row-d counter index of a value: md5-prefix of ``value#cmsd`` mod
    width — byte-identical in every engine exposing md5."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f"#cms{d}"))),
                1,
                _HEX_DIGITS,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_sketch(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch of ``value_col`` as a (d, w, cnt) cell table —
    at most depth * width rows, one map-side-combinable groupBy. NULLs
    contribute nothing (their md5 is NULL — same stance as the KMV and
    bloom builders). Store per partition/day/source and merge any
    subset with :func:`cms_merge`; counters are additive, so the merge
    is LOSSLESS (merged estimates == sketching the union directly)."""
    nn = df.filter(F.col(value_col).isNotNull())
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    _cms_position(F.col(value_col), d, width).alias("w"),
                )
                for d in range(depth)
            ]
        )
    ).alias("c")
    return (
        nn.select(cells)
        .select("c.d", "c.w")
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Cell-wise sum of stored sketches (same depth/width required)."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point frequency estimates for ``keys[value_col]`` from a stored
    sketch: min over the key's depth counters (0 when a cell is absent
    — an empty cell was never incremented). Output: (value_col,
    est_count long). The probe is depth broadcast-hash joins of the
    ≤ depth*width-row cell table — the bloom probe pattern; keys stay
    distributed, the sketch broadcasts."""
    cur = keys.select(F.col(value_col)).distinct()
    for d in range(depth):
        p = _cms_position(F.col(value_col), d, width)
        sd = sketch.filter(F.col("d") == d).select(
            F.col("w").alias(f"__w{d}"), F.col("cnt").alias(f"__c{d}")
        )
        cur = cur.withColumn(f"__p{d}", p).join(
            F.broadcast(sd), F.col(f"__p{d}") == F.col(f"__w{d}"), "left"
        )
    est = F.least(
        *[F.coalesce(F.col(f"__c{d}"), F.lit(0)) for d in range(depth)]
    )
    aux = [f"__{s}{d}" for d in range(depth) for s in ("p", "w", "c")]
    return cur.select(value_col, est.cast("long").alias("est_count")).drop(
        *aux
    )


def cms_oracle_sql(
    table_sql: str,
    keys_sql: str,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB twin of ``cms_sketch`` + ``cms_estimate`` — identical md5
    positions, identical cells, identical min-over-depth estimate."""

    def pos(expr: str, d: int) -> str:
        return (
            f"(CAST(concat('0x', substr(md5(concat(CAST({expr} AS VARCHAR),"
            f" '#cms{d}')), 1, {_HEX_DIGITS})) AS BIGINT) % {width})"
        )

    cell_rows = " UNION ALL ".join(
        f"SELECT {d} AS d, {pos(value_col, d)} AS w FROM src"
        f" WHERE {value_col} IS NOT NULL"
        for d in range(depth)
    )
    ests = ", ".join(
        f"coalesce((SELECT cnt FROM cells c WHERE c.d = {d}"
        f" AND c.w = {pos('k.' + value_col, d)}), 0)"
        for d in range(depth)
    )
    return f"""
WITH src AS ({table_sql}),
cells AS (
    SELECT d, w, count(*) AS cnt FROM ({cell_rows}) GROUP BY d, w
),
ks AS (SELECT DISTINCT {value_col} FROM ({keys_sql}))
SELECT k.{value_col}, CAST(least({ests}) AS BIGINT) AS est_count
FROM ks k
"""


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    phi: float = 0.01,
    round_to: int = 6,
    group_col: str | None = None,
) -> DataFrame:
    """EXACT values occurring in at least ``phi`` of non-null rows —
    per ``group_col`` when given (the threshold is then per-group:
    each group contributes at most 1/phi rows). Output: (group?,
    value_col, cnt long, freq double). One map-side-combined groupBy
    + a broadcast totals side — the batch answer to the heavy-hitters
    question (see module docstring for why not Misra-Gries here)."""
    nn = df.filter(F.col(value_col).isNotNull())
    if group_col is None:
        counts = nn.groupBy(value_col).agg(F.count(F.lit(1)).alias("cnt"))
        total = nn.agg(F.count(F.lit(1)).alias("__n"))
        joined = counts.crossJoin(F.broadcast(total))
        keys = []
    else:
        counts = nn.groupBy(group_col, value_col).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        total = nn.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
        # no broadcast hint: |groups| is unbounded — AQE broadcasts the
        # totals side when it is actually small
        joined = counts.join(total, group_col)
        keys = [group_col]
    return joined.filter(F.col("cnt") >= F.col("__n") * phi).select(
        *keys,
        value_col,
        "cnt",
        F.round(F.col("cnt") / F.col("__n"), round_to).alias("freq"),
    )


def heavy_hitters_oracle_sql(
    table_sql: str,
    value_col: str,
    phi: float = 0.01,
    round_to: int = 6,
    group_col: str | None = None,
) -> str:
    if group_col is None:
        return f"""
WITH src AS ({table_sql}),
nn AS (SELECT {value_col} FROM src WHERE {value_col} IS NOT NULL),
counts AS (SELECT {value_col}, count(*) AS cnt FROM nn GROUP BY {value_col}),
total AS (SELECT count(*) AS n FROM nn)
SELECT c.{value_col}, c.cnt,
       round(CAST(c.cnt AS DOUBLE) / t.n, {round_to}) AS freq
FROM counts c CROSS JOIN total t
WHERE c.cnt >= t.n * {phi!r}
"""
    return f"""
WITH src AS ({table_sql}),
nn AS (
    SELECT {group_col}, {value_col} FROM src WHERE {value_col} IS NOT NULL
),
counts AS (
    SELECT {group_col}, {value_col}, count(*) AS cnt
    FROM nn GROUP BY {group_col}, {value_col}
),
total AS (SELECT {group_col}, count(*) AS n FROM nn GROUP BY {group_col})
SELECT c.{group_col}, c.{value_col}, c.cnt,
       round(CAST(c.cnt AS DOUBLE) / t.n, {round_to}) AS freq
FROM counts c JOIN total t ON c.{group_col} = t.{group_col}
WHERE c.cnt >= t.n * {phi!r}
"""


def top_k_frequent(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    group_col: str | None = None,
    salt_buckets: int = 64,
) -> DataFrame:
    """The k most frequent non-null values — per ``group_col`` when
    given — ties broken by value ascending (deterministic). Output:
    (group?, value_col, cnt long, rank int). Global: orderBy().limit(k)
    compiles to TakeOrderedAndProject over the map-side-combined count
    partials — no global sort (the rank window runs over the k
    surviving rows only). Grouped: a lossless two-phase ranking — rank
    within (group, value-hash % ``salt_buckets``) first (S parallel
    windows per group), then re-rank the ≤ k·S survivors per group —
    so a group with 10^9 distinct values never funnels its whole count
    table through one task. Lossless by the same law as
    ``sketch.grouped_bottom_k``: after the groupBy each (group, value)
    row is unique, so the salt partitions a group's rows, and any row
    outranked by ≥ k rows in its own bucket is outranked by ≥ k rows
    globally. The salt derives from the value, so the output is
    deterministic and identical to a single per-group window — oracle
    twins keep the one-window SQL form and still hash-match."""
    from pyspark.sql import Window as W

    nn = df.filter(F.col(value_col).isNotNull())
    if group_col is None:
        counts = nn.groupBy(value_col).agg(F.count(F.lit(1)).alias("cnt"))
        top = counts.orderBy(
            F.col("cnt").desc(), F.col(value_col).asc()
        ).limit(k)
        # rank assigned AFTER the take: a row_number window over k rows
        w = W.orderBy(F.col("cnt").desc(), F.col(value_col).asc())
        return top.select(
            value_col, "cnt", F.row_number().over(w).cast("int").alias("rank")
        )
    counts = nn.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    order = [F.col("cnt").desc(), F.col(value_col).asc()]
    salted = counts.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    )
    w1 = W.partitionBy(group_col, "__salt").orderBy(*order)
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__salt", "__rn")
    )
    w2 = W.partitionBy(group_col).orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= k)
        .select(group_col, value_col, "cnt", "rank")
    )


def top_k_frequent_oracle_sql(table_sql: str, value_col: str, k: int = 10) -> str:
    return f"""
WITH src AS ({table_sql}),
counts AS (
    SELECT {value_col}, count(*) AS cnt FROM src
    WHERE {value_col} IS NOT NULL GROUP BY {value_col}
)
SELECT {value_col}, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, {value_col} ASC) AS INT) AS rank
FROM counts
ORDER BY cnt DESC, {value_col} ASC LIMIT {k}
"""
