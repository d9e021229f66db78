"""Event-sequence pattern matching — the MATCH_RECOGNIZE-lite / CEP
primitive: find every occurrence of an ordered event-type pattern
``[A, B, C, ...]`` per key where each consecutive step follows within
``max_gap_ms``.  This is the complement of ``plans.analytics``'
funnel (which counts FIRST-occurrence progressions corpus-wide): here
every concrete occurrence is emitted with its timestamps, so
downstream can measure durations, rates per user, or join back to the
triggering rows.

Semantics: steps must be CONTIGUOUS IN THE PATTERN-FILTERED stream —
events of types outside the pattern are invisible, events of pattern
types break a run (CEP's ``next`` operator over the filtered stream,
i.e. the regex ``A B C`` with no permissive gaps).  Occurrences may
overlap (a row can serve as step 2 of one match and step 1 of
another); dedup downstream if exclusive matching is wanted.

Plan: filter to pattern types (pushed to the scan), ONE window pass
per key emitting len(pattern)-1 lead columns, then a row filter — no
joins, no state, no Python.  A hot key serializes one partition's
sort (same caveat and remedy as the keyed as-of join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = ["match_sequence", "match_sequence_oracle_sql"]


def match_sequence(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    pattern: list[str],
    max_gap_ms: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Every occurrence of ``pattern`` per key: (key, ts_start, ts_end,
    duration_ms).  ``tiebreak_col`` (a unique id) totalizes the order
    under timestamp collisions — required for cross-engine parity."""
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    base = df.filter(F.col(type_col).isin(list(set(pattern)))).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("t"),
        *([F.col(tiebreak_col).alias("tb")] if tiebreak_col else []),
    )
    order = [F.col("ts")] + ([F.col("tb")] if tiebreak_col else [])
    w = W.partitionBy("key").orderBy(*order)
    n = len(pattern)
    cols = [base["t"].alias("t0"), base["ts"].alias("ts0")]
    for i in range(1, n):
        cols += [
            F.lead("t", i).over(w).alias(f"t{i}"),
            F.lead("ts", i).over(w).alias(f"ts{i}"),
        ]
    led = base.select("key", *cols)
    cond = F.lit(True)
    for i, step in enumerate(pattern):
        cond = cond & (F.col(f"t{i}") == step)
    for i in range(1, n):
        gap = F.unix_micros(F.col(f"ts{i}")) - F.unix_micros(
            F.col(f"ts{i - 1}")
        )
        cond = cond & (gap <= max_gap_ms * 1000) & (gap >= 0)
    return led.filter(cond).select(
        "key",
        F.col("ts0").alias("ts_start"),
        F.col(f"ts{n - 1}").alias("ts_end"),
        F.floor(
            (
                F.unix_micros(F.col(f"ts{n - 1}"))
                - F.unix_micros(F.col("ts0"))
            )
            / 1000
        ).cast("long").alias("duration_ms"),
    )


def match_sequence_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    type_col: str,
    pattern: list[str],
    max_gap_ms: int,
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`match_sequence`."""
    n = len(pattern)
    types = ", ".join(f"'{t}'" for t in sorted(set(pattern)))
    order = ts_col + (f", {tiebreak_col}" if tiebreak_col else "")
    ow = f"OVER (PARTITION BY key ORDER BY {order})"
    leads = ",\n           ".join(
        f"lead({type_col}, {i}) {ow} AS t{i},"
        f" lead({ts_col}, {i}) {ow} AS ts{i}"
        for i in range(1, n)
    )
    conds = [f"t{i} = '{s}'" for i, s in enumerate(pattern)]
    conds += [
        f"epoch_us(ts{i}) - epoch_us(ts{i - 1}) BETWEEN 0"
        f" AND {max_gap_ms * 1000}"
        for i in range(1, n)
    ]
    return f"""
WITH base AS (
    SELECT {key_col} AS key, {ts_col}, {type_col}
           {', ' + tiebreak_col if tiebreak_col else ''}
    FROM {table} WHERE {type_col} IN ({types})
),
led AS (
    SELECT key, {type_col} AS t0, {ts_col} AS ts0,
           {leads}
    FROM base
)
SELECT key, ts0 AS ts_start, ts{n - 1} AS ts_end,
       CAST(floor((epoch_us(ts{n - 1}) - epoch_us(ts0)) / 1000.0)
            AS BIGINT) AS duration_ms
FROM led WHERE {' AND '.join(conds)}
"""
