"""Declarative data-quality constraint checking.

The reference validates interactively (drop-missing report strings,
app.py:96-118); production pipelines want the dbt/Deequ shape instead:
declare constraints, get one violations row per rule, gate the job on
the result. Every rule compiles to a conditional COUNT aggregate, so
checking N rules over any size table costs ONE scan and one 1-row
aggregation — no per-rule passes, no collects (the `unique` rule adds
one groupBy on its key columns, the only shuffle).

Rules (all engine-portable — used verbatim by the SQL oracle twin):

  ("not_null", col)                   value IS NULL
  ("range", col, lo, hi)              value outside [lo, hi]
  ("accepted_values", col, [v, ...])  value not in the list (nulls pass)
  ("matches", col, regex)             value !~ regex (nulls pass)
  ("unique", [col, ...])              rows beyond the first per key
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """One violations row per rule: (rule string, violations long).
    ``rule`` is a stable human-readable label derived from the spec.
    """
    aggs = []
    labels = []
    unique_rules = []
    for r in rules:
        kind = r[0]
        if kind == "not_null":
            col = r[1]
            labels.append(f"not_null({col})")
            aggs.append(F.sum(F.col(col).isNull().cast("long")))
        elif kind == "range":
            col, lo, hi = r[1], r[2], r[3]
            labels.append(f"range({col},{lo},{hi})")
            aggs.append(
                F.sum(
                    (
                        F.col(col).isNotNull()
                        & ((F.col(col) < lo) | (F.col(col) > hi))
                    ).cast("long")
                )
            )
        elif kind == "accepted_values":
            col, vals = r[1], list(r[2])
            labels.append(f"accepted_values({col})")
            aggs.append(
                F.sum(
                    (F.col(col).isNotNull() & ~F.col(col).isin(vals)).cast("long")
                )
            )
        elif kind == "matches":
            col, pat = r[1], r[2]
            labels.append(f"matches({col})")
            aggs.append(
                F.sum(
                    (
                        F.col(col).isNotNull() & ~F.col(col).rlike(pat)
                    ).cast("long")
                )
            )
        elif kind == "unique":
            unique_rules.append([str(c) for c in r[1]])
        else:
            raise ValueError(f"unknown rule kind: {kind}")

    parts = []
    if aggs:
        one = df.agg(*[a.alias(f"__v{i}") for i, a in enumerate(aggs)])
        parts.append(
            one.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(lbl).alias("rule"),
                                F.col(f"__v{i}").cast("long").alias("violations"),
                            )
                            for i, lbl in enumerate(labels)
                        ]
                    )
                ).alias("x")
            ).select("x.rule", "x.violations")
        )
    for cols in unique_rules:
        lbl = f"unique({','.join(cols)})"
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("n") > 1, F.col("n") - 1)), F.lit(0)
                )
                .cast("long")
                .alias("violations")
            )
            .select(F.lit(lbl).alias("rule"), "violations")
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_foreign_keys(
    relations: list[tuple[DataFrame, str, DataFrame, str, str]],
) -> DataFrame:
    """Referential-integrity audit across a star/snowflake schema: for
    each (child, child_key, parent, parent_key, name) relationship,
    count child rows whose non-null key has NO matching parent row —
    the orphan count a warehouse checks before trusting a join.

    Each relationship costs one LEFT ANTI join on the key (broadcast
    when the parent is small, AQE's call) + a 1-row count; NULL child
    keys are reported separately (SQL FK semantics: NULL references
    nothing and violates nothing). Output, one row per relationship:
    (relationship, n_child, n_null_key, n_orphans, ok boolean).
    """
    spark = relations[0][0].sparkSession
    out = None
    for child, ck, parent, pk, name in relations:
        nn = child.filter(F.col(ck).isNotNull())
        orphans = nn.join(
            parent.select(F.col(pk).alias("__pk")),
            F.col(ck) == F.col("__pk"),
            "left_anti",
        )
        row = (
            child.agg(
                F.count(F.lit(1)).alias("n_child"),
                # coalesce: SUM over ZERO rows is NULL in Spark, but an
                # empty child table has 0 null keys (and DuckDB's
                # count(*)-based oracle says 0) — engine parity on the
                # empty-relation edge
                F.coalesce(
                    F.sum(F.when(F.col(ck).isNull(), 1).otherwise(0)),
                    F.lit(0),
                ).alias("n_null_key"),
            )
            .crossJoin(
                F.broadcast(
                    orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
                )
            )
            .select(
                F.lit(name).alias("relationship"),
                "n_child",
                F.col("n_null_key").cast("long").alias("n_null_key"),
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level reconciliation between two snapshots of a keyed table
    — the audit a warehouse runs before publishing a rebuilt /
    migrated / backfilled table: what was added, what vanished, what
    changed and IN WHICH COLUMNS.

    Output, one row per key present in either side: (*key_cols, status
    'added'|'removed'|'changed'[|'unchanged'], changed_cols — a
    comma-joined string of differing column names, '' unless changed).
    Comparison is null-safe per column (NULL == NULL); keys must be
    unique per side (it is a snapshot diff, not a bag diff — feed
    ``check_quality``'s uniqueness rule first when unsure).

    Scale shape: ONE full outer hash join on the key columns (both
    sides shuffle-partitioned by the same key, or co-located for free
    when both snapshots are bucketed on it) + a per-row column
    compare; output prunes to changed rows unless
    ``include_unchanged``. changed_cols is a string, not an array, so
    results stay sortable/hashable by any downstream engine.
    """
    cmp_cols = compare_cols or [
        c for c in old.columns if c in set(new.columns) and c not in key_cols
    ]
    o = old.select(
        *[F.col(c).alias(f"__ko_{c}") for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in cmp_cols],
        F.lit(1).alias("__in_o"),
    )
    n = new.select(
        *[F.col(c).alias(f"__kn_{c}") for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in cmp_cols],
        F.lit(1).alias("__in_n"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"__ko_{c}") == F.col(f"__kn_{c}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    diffs = [
        (c, ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")))
        for c in cmp_cols
    ]
    any_diff = None
    for _, d in diffs:
        any_diff = d if any_diff is None else (any_diff | d)
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(any_diff if any_diff is not None else F.lit(False), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed = F.concat_ws(
        ",",
        *[F.when(d, F.lit(c)) for c, d in diffs],
    ) if diffs else F.lit("")
    out = j.select(
        *[
            F.coalesce(F.col(f"__ko_{c}"), F.col(f"__kn_{c}")).alias(c)
            for c in key_cols
        ],
        status.alias("status"),
        F.when(status == "changed", changed).otherwise(F.lit("")).alias(
            "changed_cols"
        ),
    )
    if include_unchanged:
        return out
    return out.filter(F.col("status") != "unchanged")
