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
