"""End-to-end training-corpus assembly: quality gate -> exact dedup ->
stratified mixing — the composed pipeline a pretraining data build runs
over raw documents, expressed as one lazy DataFrame plan.

Composition is the point: every stage is the already-tested primitive
(``functions.text`` quality/repetition flags, ``operators.dedup``'s
hash-group representative selection, ``functions.sampling``'s stratified
hash sampler), so the whole pipeline inherits their oracle checks and
their scale shapes. Catalyst fuses the quality gate into the scan
(codegen'd filter), the dedup groupBy is the single real shuffle
(32-byte hashes + ids only), and the mixing sample is a stateless
filter — one shuffle end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions.sampling import (
    stratified_hash_sample,
)
from multi_sensor_data_pipeline_for_robotics__spark.functions.text import (
    quality_flags,
    repetition_flags,
    tokens,
)


def corpus_clean_pipeline(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """documents -> training-mix rows ``(doc_id, lang, source,
    n_tokens)``.

    Stages (in plan order, all lazy):
      1. quality gate — Gopher-style length/token-length/stopword flags
         AND repetition flags; pure codegen'd expressions fused into the
         parquet scan.
      2. exact dedup — one representative (min id) per sha256(text)
         group among the quality survivors; the groupBy shuffles hashes
         and ids, never text, and the representative set joins back as
         an id-only LEFT SEMI with no broadcast hint: ``keep_ids`` is
         one id per distinct document (corpus-sized at 100 TB — tens of
         GB of ids), so the join strategy is left to AQE, which
         broadcasts while the set fits and falls back to a shuffled
         semi join when it does not.
      3. stratified mixing — per-``strata_col`` hash-rate filter
         (reproducible, partition-independent).
    """
    toks = tokens(F.col(text_col))
    q = quality_flags(toks, F.col(text_col))
    r = repetition_flags(toks)
    gated = docs.filter(
        q["ok_length"]
        & q["ok_token_len"]
        & q["ok_stopwords"]
        & r["ok_dup_ngrams"]
        & r["ok_top_token"]
    )
    keep_ids = (
        gated.groupBy(F.sha2(F.col(text_col), 256).alias("__h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    deduped = gated.join(keep_ids, id_col, "left_semi")
    mixed = (
        stratified_hash_sample(
            deduped, key=id_col, strata_col=strata_col, rates=rates or {},
            default_rate=default_rate,
        )
        if (rates or default_rate != 1.0)
        else deduped
    )
    return mixed.select(
        id_col,
        strata_col,
        "source",
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )


def bigram_logprob_scores(
    docs: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram language-model score under the corpus's own
    add-k-smoothed bigram distribution — the second-order upgrade of
    the unigram quality screen (catches plausible-words-in-implausible-
    order gibberish the unigram model scores well)::

        p(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V)

    Output: (doc_id, sum_logprob double, n_bigrams long). Short docs
    (< 2 tokens) are absent — no bigrams to score.

    One explode feeds the bigram stream; model counts are two
    aggregations OVER THAT STREAM (no second scan), and V is a 1-row
    distinct-token count folded in as a broadcast. The count joins
    carry no broadcast hint — a web-scale bigram table outgrows any
    broadcast, so the strategy is AQE's call. Float policy matches the
    unigram screen: each bigram's ln(p) is rounded to 6 BEFORE an
    exact DECIMAL sum, so the result is order-independent and
    hash-comparable across engines.
    """
    from multi_sensor_data_pipeline_for_robotics__spark.functions.text import tokens

    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__t"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - 2),
                    lambda i: F.struct(
                        F.element_at("__t", i + 1).alias("w1"),
                        F.element_at("__t", i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    bigrams = bigrams.localCheckpoint(eager=False)
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.select(F.explode("__t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    logp6 = F.round(
        F.log(
            (F.col("c12").cast("double") + F.lit(float(k)))
            / (F.col("c1").cast("double") + F.lit(float(k)) * F.col("v").cast("double"))
        ),
        6,
    ).cast("decimal(20,6)")
    return (
        bigrams.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum(logp6).cast("double").alias("sum_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    short_doc_tokens: int = 20,
    round_to: int = 4,
) -> DataFrame:
    """Dataset-card statistics in one aggregation pass: per group
    (default language × source) the document count, total characters,
    total/mean token counts, mean distinct-token ratio, and the short-
    document rate — the summary table a corpus release ships and a
    mixing decision consumes. One groupBy, every metric map-side
    combinable, no second scan.

    NULL text counts as a document with 0 tokens/0 chars (it shows up
    in ``n_docs`` and ``pct_short`` — silently dropping it would hide
    ingestion defects the card exists to surface).
    """
    from multi_sensor_data_pipeline_for_robotics__spark.functions import text as TX

    gcols = group_cols if group_cols is not None else ["lang", "source"]
    toks = TX.tokens(F.col(text_col))
    n_tok = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(F.size(toks))
    n_distinct = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.array_distinct(toks))
    )
    n_chars = F.coalesce(F.length(F.col(text_col)), F.lit(0))
    return (
        docs.select(
            *gcols,
            n_tok.alias("__nt"),
            n_distinct.alias("__nd"),
            n_chars.alias("__nc"),
        )
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nc").cast("long").alias("total_chars"),
            F.sum("__nt").cast("long").alias("total_tokens"),
            F.round(F.avg("__nt"), round_to).alias("avg_tokens"),
            F.round(
                F.avg(
                    F.when(
                        F.col("__nt") > 0,
                        F.col("__nd") / F.col("__nt"),
                    ).otherwise(F.lit(0.0))
                ),
                round_to,
            ).alias("avg_distinct_ratio"),
            F.round(
                F.avg(
                    F.when(F.col("__nt") < short_doc_tokens, 1.0).otherwise(0.0)
                ),
                round_to,
            ).alias("pct_short"),
        )
    )
