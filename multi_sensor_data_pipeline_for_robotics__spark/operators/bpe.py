"""Tokenizer-vocabulary induction: distributed byte-pair-encoding
(BPE) merge training and application — the standard LLM-pipeline stage
"train a tokenizer on held-in data" (Sennrich et al., ACL 2016,
"Neural Machine Translation of Rare Words with Subword Units"), built
Spark-first.

Scale design — everything data-sized collapses to VOCABULARY-sized
before any per-round work:

  - The corpus is reduced ONCE to a (word, freq) table (one explode +
    one map-side-combinable groupBy over the corpus); all k training
    rounds run over that vocabulary table, never the corpus. This is
    the classic word-frequency formulation: a 100 TB corpus with a
    10M-word vocabulary trains at 10M-row cost per round.
  - Each round is (a) one pair-count aggregation — adjacent symbol
    pairs weighted by word frequency, partial-aggregated map-side, so
    the shuffle carries distinct pairs only — and (b) ONE interpreted
    higher-order ``aggregate`` fold per word applying the chosen merge
    greedily left-to-right (the tokenfold plan lesson: keep exactly
    one HOF pass per round; positions never explode for the rebuild).
  - Only the per-round argmax row (ONE row: count + tie-break ordering)
    ever reaches the driver — k rows total, not data.
  - ``localCheckpoint`` after every round keeps round N's plan from
    replaying rounds 1..N-1 (the ``connected_components`` discipline).

Determinism: greedy merge order is (count DESC, left ASC, right ASC) —
a total order, so runs reproduce bit-for-bit and a bounded-k DuckDB
replay (chained per-round CTEs with the positional-window form of the
same greedy rule) hash-matches. The left-to-right overlap rule
("aaa" + merge (a,a) -> [aa, a]) is the reference BPE behavior; its
fold form here and its gaps-and-islands window form in the oracle are
provably the same function (runs of consecutive matches merge at
alternating positions; for left != right no consecutive matches
exist).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions.text import (
    tokens,
    tokens_regex,
)
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
    ensure_parallelism,
)

MERGES_SCHEMA = "round int, left string, right string, pair_count long"

__all__ = [
    "MERGES_SCHEMA",
    "bpe_train_merges",
    "bpe_segment_words",
    "bpe_apply",
    "bpe_segment_map",
]


def _char_seg(word: Column) -> Column:
    """Initial BPE state: the word as an array of single characters —
    ``substr`` over an index sequence, identical in Spark and any SQL
    engine (``split(w, '')`` is NOT portable). Guarded for empty
    strings (``sequence(1, 0)`` is DESCENDING under ANSI, not empty)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.when(F.length(word) > 0, chars).otherwise(
        F.array().cast("array<string>")
    )


def _adjacent_pairs(syms: Column) -> Column:
    """Adjacent symbol pairs of one word as ``struct(l, r)`` — zip of
    the array with its own 1-shift; empty for single-symbol words."""
    return F.when(
        F.size(syms) >= 2,
        F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _apply_merge(seg: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of adjacent (left, right) with
    the merged symbol — ONE interpreted ``aggregate`` fold per word
    (O(len), no position explode). ``F.get`` (0-based, NULL out of
    bounds) avoids the ANSI ``element_at`` index error at the last
    position; a NULL lookahead fails the match condition, which is the
    correct end-of-word behavior."""
    merged = F.lit(left + right)
    return F.aggregate(
        F.sequence(F.lit(0), F.size(seg) - 1),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        lambda acc, i: F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        )
        .when(
            (F.get(seg, i) == F.lit(left))
            & (F.get(seg, i + 1) == F.lit(right)),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(F.get(seg, i))).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda acc: acc["out"],
    )


def _corpus_tokens(df: DataFrame, text_col: str, pretokenize: bool) -> Column:
    return (
        tokens_regex(F.col(text_col))
        if pretokenize
        else tokens(F.col(text_col))
    )


def bpe_train_merges(
    df: DataFrame,
    k: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    pretokenize: bool = True,
) -> DataFrame:
    """Learn ``k`` BPE merges from a corpus → the merges table
    ``(round, left, right, pair_count)`` in application order — the
    trained-tokenizer artifact (persist with
    ``sources.models.save_model_tables``; replay with
    :func:`bpe_apply`).

    ``pretokenize=True`` applies the BPE-ish regex pre-split
    (``functions.text.tokens_regex``: lowercase alnum runs + single
    punctuation marks — the pre-tokenization most BPE vocabularies
    assume, and the learned-merge upgrade of the regex-only
    ``text_bpe_tokens`` path); ``False`` trains on whitespace tokens
    verbatim. Merges never cross the pre-token boundary (the standard
    word-internal BPE). Training stops early when no adjacent pair
    remains (every word fully merged); the returned table then has
    fewer than ``k`` rows.

    See the module docstring for the scale shape (vocabulary-sized
    rounds, one-row-per-round driver traffic) and the determinism
    contract (count DESC, left ASC, right ASC tie-break)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = df.sparkSession
    words = (
        ensure_parallelism(df)
        .select(F.explode(_corpus_tokens(df, text_col, pretokenize)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seg = words.select(
        "word", "freq", _char_seg(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, int(k) + 1):
        best = (
            seg.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # vocabulary fully merged before k rounds
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rnd, left, right, cnt))
        seg = seg.select(
            "word", "freq", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_segment_words(
    words: DataFrame,
    merges: DataFrame | list,
    word_col: str = "word",
) -> DataFrame:
    """Segment a (distinct-)word table with a learned merges table →
    input columns + ``pieces array<string>``. Merges apply in round
    order — the BPE contract — as chained one-pass folds; the merges
    table is k rows by construction, so collecting it is free."""
    rows = (
        merges.orderBy("round").collect()
        if isinstance(merges, DataFrame)
        else sorted(merges, key=lambda r: r["round"])
    )
    seg = _char_seg(F.col(word_col))
    out = words.withColumn("pieces", seg)
    for r in rows:
        out = out.withColumn(
            "pieces", _apply_merge(F.col("pieces"), r["left"], r["right"])
        )
    return out


def bpe_apply(
    df: DataFrame,
    merges: DataFrame | list,
    text_col: str = "text",
    id_col: str = "doc_id",
    pretokenize: bool = True,
) -> DataFrame:
    """Tokenize a corpus with learned merges →
    ``(doc_id, n_words, n_pieces, pieces)`` per document, ``pieces``
    the '|'-joined subword sequence in document order.

    Scale shape: merges apply to the DISTINCT-WORD table only (the
    vocabulary — each word segmented once, not once per occurrence);
    documents then join their exploded words against the segmented
    vocabulary and re-assemble in position order. The join key is the
    word string; at 100 TB you'd bucket both sides by word. Documents
    with zero pre-tokens produce no row (nothing to segment)."""
    toks = _corpus_tokens(df, text_col, pretokenize)
    dt = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("wi", "word")
    )
    segv = bpe_segment_words(dt.select("word").distinct(), merges)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("wi", "pieces"))),
        lambda x: x["pieces"],
    )
    return (
        dt.join(segv, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("pieces")).alias("n_pieces"),
            F.array_join(F.flatten(ordered), "|").alias("pieces"),
        )
    )


def bpe_segment_map(
    df: DataFrame,
    merges: DataFrame | list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """STREAMING-SAFE learned-merge tokenization: the merges table
    (k rows) rides in the task closure and each document segments
    inside one Arrow batch — a stateless ``mapInPandas`` with NO
    shuffle and NO streaming state (the ``char_lm_score_map`` pattern),
    so the same call works on a batch frame or a ``readStream`` in
    append mode. :func:`bpe_apply` needs a posexplode + vocabulary join
    + groupBy re-assembly that a stream cannot run without aggregation
    state; this is its online twin, emitting IDENTICAL rows
    ``(doc_id, n_words, n_pieces, pieces)`` (asserted bit-for-bit in
    pytest — same regex pre-split, same greedy left-to-right merge
    order, same '|' assembly; zero-token docs dropped on both paths).

    Per-partition cost: a word→pieces memo makes segmentation
    vocabulary-amortized across every batch the task processes (each
    DISTINCT word pays k greedy scans once, exactly the work
    ``bpe_apply`` does on the distinct-word table); per row only the
    memo lookups and the join/format remain. The regex pre-split runs
    in Python ``re`` — for the ASCII ``tokens_regex`` pattern this is
    semantics-identical to Spark's Java regex (documented caveat:
    non-ASCII whitespace classes differ between the engines)."""
    import re as _re

    from multi_sensor_data_pipeline_for_robotics__spark.functions.text import (
        BPE_ISH_PATTERN,
    )

    rows = (
        merges.orderBy("round").collect()
        if isinstance(merges, DataFrame)
        else sorted(merges, key=lambda r: r["round"])
    )
    merge_list = [(r["left"], r["right"]) for r in rows]
    pat = _re.compile(BPE_ISH_PATTERN)

    def _segment(word: str) -> list[str]:
        s = list(word)
        for left, right in merge_list:
            out, i, merged = [], 0, left + right
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    def _run(pdfs):
        import pandas as pd

        memo: dict = {}
        for pdf in pdfs:
            out = {"doc_id": [], "n_words": [], "n_pieces": [], "pieces": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                words = pat.findall(text.lower())
                if not words:
                    continue  # bpe_apply's inner join drops these too
                pieces: list[str] = []
                for w in words:
                    p = memo.get(w)
                    if p is None:
                        p = _segment(w)
                        memo[w] = p
                    pieces.extend(p)
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_pieces"].append(len(pieces))
                out["pieces"].append("|".join(pieces))
            yield pd.DataFrame(out)

    keyed = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return keyed.mapInPandas(
        _run, schema="doc_id long, n_words long, n_pieces long, pieces string"
    )
