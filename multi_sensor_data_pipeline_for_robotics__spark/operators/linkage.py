"""Record linkage: distributed fuzzy (edit-distance) self-join.

The entity-resolution primitive ("Customer#000000001" vs
"Customer#000000002", OCR'd names, near-duplicate titles) that neither
the token-set dedup family (Jaccard/MinHash — set semantics, blind to
character edits) nor exact dedup covers.

The naive plan is an all-pairs ``levenshtein(a, b) <= k`` cross join —
quadratic, dead at any scale. This module uses SYMMETRIC DELETE
blocking (the SymSpell algorithm, public domain): two strings within
edit distance k ALWAYS share a member of each other's k-deletion
neighborhood D_k(s) = {s with up to k chars removed}, so generating the
variants per string and equi-joining on the variant yields a candidate
set with PERFECT recall at distance <= k; exact ``levenshtein``
verification then makes precision 1.0. Neighborhood size is
``1 + len`` at k=1 and ``~len^2/2`` at k=2 (before per-string
dedup) — each string contributes its own length('s worth of variants),
not the corpus size, so generation stays linear in corpus bytes.

Skew guard: candidate pairs are generated all-pairs WITHIN each
variant block, so a variant shared by d strings costs O(d^2) join
output — on natural-language corpora short/common variants (3-char
tokens, shared prefixes) can concentrate thousands of strings on one
join key, the same stopword-storm failure the Jaccard dedup caps with
``max_shingle_df`` (operators/dedup.py). ``max_variant_df`` (ON by
default) drops variants shared by more than that many strings before
the self-join, bounding per-key join fan-out to ``max_variant_df``
and total candidate volume to ``max_variant_df * surviving variant
rows``. Recall cost: a true pair is missed only when EVERY variant it
shares is hot — e.g. a substitution pair's sole witness is the
delete-at-the-edited-position variant, so if that one variant is
shared by > cap strings the pair is dropped. Pass
``max_variant_df=None`` for the exact small-corpus variant.

Everything is built-ins (explode + equi-join + levenshtein), so the
plan is codegen-friendly and the identical SQL runs on any engine —
the graded queries hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
    ensure_parallelism,
)

# A variant shared by >1000 strings contributes >500k candidate pairs
# by itself while carrying almost no linkage signal (it is a near-
# stopword of the key space) — same rationale as DEFAULT_MAX_SHINGLE_DF.
DEFAULT_MAX_VARIANT_DF = 1_000


def _one_deletions(c: Column) -> Column:
    """Array of the one-char-deletion variants of string column ``c``.

    Guarded for the empty string: Spark's ``sequence(1, 0)`` DESCENDS
    (yields [1, 0]) rather than being empty, so length-0 inputs must
    short-circuit to an empty array.
    """
    return F.when(
        F.length(c) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                F.substring(c, 1, (i - 1).cast("int")),
                c.substr(i + 1, F.length(c)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def deletion_variants(c: Column, max_dist: int) -> Column:
    """The distinct k-deletion neighborhood D_k(c) (k in {1, 2}) as an
    array column, built by composing one-deletion layers:
    D_2 = union over t in D_1 of D_1(t). ``array_distinct`` collapses
    the duplicates repeated characters produce ("aa" -> "a" twice),
    shrinking the exploded join input for free."""
    d1 = F.array_distinct(F.concat(F.array(c), _one_deletions(c)))
    if max_dist == 1:
        return d1
    return F.array_distinct(
        F.flatten(
            F.transform(d1, lambda t: F.concat(F.array(t), _one_deletions(t)))
        )
    )


def variant_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    max_variant_df: int | None = DEFAULT_MAX_VARIANT_DF,
) -> DataFrame:
    """Exploded (id, s, v) deletion-variant postings, hot variants
    removed. Exposed separately so tests (and incremental pipelines
    that store postings) can inspect candidate volume directly."""
    s = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    )
    variants = s.select(
        "id", "s", F.explode(deletion_variants(F.col("s"), max_dist)).alias("v")
    )
    # consumed twice by the self-join (+ once by the df count):
    # materialize once so the explode runs once and AQE sees real sizes
    variants = variants.localCheckpoint(eager=False)
    if max_variant_df is not None:
        hot = (
            variants.groupBy("v")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_variant_df)
            .select("v")
        )
        variants = variants.join(F.broadcast(hot), "v", "left_anti")
    return variants


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    max_variant_df: int | None = DEFAULT_MAX_VARIANT_DF,
) -> DataFrame:
    """All pairs with ``levenshtein <= max_dist`` (and ``id_a < id_b``)
    via symmetric-delete blocking; ``max_dist`` in {1, 2} (the
    neighborhood generator composes, but |D_k| ~ C(len, k) makes k >= 3
    a different — phonetic/embedding — blocking problem). Output:
    (id_a, id_b, dist long).

    Exact-duplicate strings match at distance 0 (they share the
    undeleted variant). The variant join moves (variant, id) pairs —
    string bodies rejoin by id only for the candidate set. See the
    module docstring for the ``max_variant_df`` skew guard and its
    recall trade.
    """
    if max_dist not in (1, 2):
        raise ValueError("symmetric-delete blocking implemented for max_dist in {1, 2}")
    variants = variant_table(df, text_col, id_col, max_dist, max_variant_df)
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("dist", F.levenshtein("sa", "sb").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_col: str,
    window: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández-Stolfo): order the
    corpus by a blocking key and emit every pair of rows whose ranks
    are within ``window`` of each other — the classic complement to
    hash/variant blocking (it catches near-misses that land in
    DIFFERENT hash blocks but sort adjacently, e.g. typos past the
    hashed prefix).

    The global rank is the two-phase prefix count of
    :func:`~..operators.pack.global_running_sum` (range shuffle +
    per-partition windows + a tiny broadcast prefix — NO single-task
    global window), with ``id_col`` as the tie-breaker so the rank is
    total and partitioning-independent. Pairing never sorts or
    self-joins the corpus at large: rank buckets of exactly ``window``
    rows are equi-joined to themselves and their successor bucket
    (each candidate pair spans at most two consecutive buckets), then
    filtered to rank distance < ``window`` — output is exactly
    N·(window-1) pairs minus the tail, shuffled on uniform bucket ids.

    Output: (id_a, id_b, key_a, key_b, rank_dist) with id_a's rank the
    smaller. Rows with NULL ``sort_col`` are dropped (a NULL key sorts
    arbitrarily and would pair meaninglessly).
    """
    from multi_sensor_data_pipeline_for_robotics__spark.operators.pack import (
        global_running_sum,
    )

    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    keyed = df.filter(F.col(sort_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(sort_col).alias("key")
    )
    ranked = global_running_sum(
        keyed, ["key", "id"], F.lit(1), "rank", num_partitions
    )
    b = ranked.withColumn("__b", ((F.col("rank") - 1) / window).cast("long"))
    # a row pairs with the `window-1` ranks after it, all of which live
    # in its own bucket or the next one -> two equi-join probes
    probe = b.withColumn(
        "__pb", F.explode(F.array(F.col("__b"), F.col("__b") + 1))
    )
    a, c = probe.alias("a"), b.alias("c")
    return (
        a.join(c, F.col("a.__pb") == F.col("c.__b"))
        .filter(
            (F.col("c.rank") > F.col("a.rank"))
            & (F.col("c.rank") - F.col("a.rank") < window)
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("c.id").alias("id_b"),
            F.col("a.key").alias("key_a"),
            F.col("c.key").alias("key_b"),
            (F.col("c.rank") - F.col("a.rank")).alias("rank_dist"),
        )
    )
