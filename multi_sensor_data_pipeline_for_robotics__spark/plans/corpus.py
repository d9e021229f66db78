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


def bigram_pmi(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Collocation extraction: the ``top_k`` bigrams by pointwise
    mutual information, ``pmi = ln((c12/N) / ((c1x/N)(cx2/N)))`` with
    the marginals taken over the bigram stream (c1x = count as LEFT
    token, cx2 = count as RIGHT token — the standard self-consistent
    normalization).  ``min_count`` suppresses the low-frequency noise
    PMI is notoriously fond of; ties break lexicographically so the
    top-k is deterministic.

    Where ``bigram_logprob_scores`` scores DOCUMENTS under the bigram
    model, this ranks the BIGRAMS themselves — the "what multi-word
    units exist in this corpus" readout (phrase mining, tokenizer
    vocabulary candidates).

    One explode feeds the stream; marginals are re-aggregations of the
    (w1, w2) count table (vocabulary-sized, checkpointed), and the
    bounded-k result is a TakeOrderedAndProject, never a full sort.
    """
    from multi_sensor_data_pipeline_for_robotics__spark.functions.text import tokens

    toks = docs.select(tokens(text_col).alias("__t"))
    bigrams = toks.select(
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
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    c12 = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = c12.agg(F.sum("c12").alias("nn"))
    pmi = F.log(
        F.col("c12").cast("double")
        * F.col("nn")
        / (F.col("c1").cast("double") * F.col("c2"))
    )
    return (
        c12.filter(F.col("c12") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(pmi, round_to).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )


def bigram_pmi_oracle_sql(
    min_count: int = 5, top_k: int = 100, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`bigram_pmi` over the documents view."""
    return f"""
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
bg AS (
    SELECT toks[i] AS w1, toks[i + 1] AS w2
    FROM t, unnest(range(1, len(toks))) AS u(i)
    WHERE len(toks) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
c2 AS (SELECT w2, sum(c12) AS c2 FROM c12 GROUP BY w2),
n AS (SELECT sum(c12) AS nn FROM c12)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       round(ln(CAST(c12 AS DOUBLE) * nn
                / (CAST(c1 AS DOUBLE) * c2)), {round_to}) AS pmi
FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
WHERE c12 >= {min_count}
ORDER BY pmi DESC, w1, w2 LIMIT {top_k}
"""


def pareto_report(
    df: DataFrame,
    group_col: str,
    weight_col,
    head_share: float = 0.8,
    round_to: int = 6,
) -> DataFrame:
    """Contribution / Pareto analysis: per group (group, weight, share,
    cum_share, in_head) ordered by weight descending — "which sources
    make up 80% of the corpus" in one readout.  ``in_head`` marks the
    smallest prefix reaching ``head_share`` (the group that crosses
    the line is included).

    The running window runs over the AGGREGATED group table — bounded
    by group cardinality, never data-sized — so the single-partition
    window is a deliberate ≤|groups|-row frame, same class as the
    drift/threshold frames in PLANS audits.  Ties break by group name
    for a total, engine-stable order.
    """
    from pyspark.sql import Window as W

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    agg = df.groupBy(group_col).agg(F.sum(w.cast("double")).alias("wt"))
    tot = agg.agg(F.sum("wt").alias("tot"))
    win = W.orderBy(F.col("wt").desc(), F.col(group_col)).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.round("wt", round_to).alias("weight"),
            F.round(F.col("wt") / F.col("tot"), round_to).alias("share"),
            F.round(
                F.sum("wt").over(win) / F.col("tot"), round_to
            ).alias("cum_share"),
            (
                (F.sum("wt").over(win) - F.col("wt")) / F.col("tot")
                < head_share
            ).alias("in_head"),
        )
    )


def pareto_oracle_sql(
    table: str,
    group_col: str,
    weight_sql: str,
    head_share: float = 0.8,
    round_to: int = 6,
) -> str:
    return f"""
WITH agg AS (
    SELECT {group_col} AS g, sum(CAST({weight_sql} AS DOUBLE)) AS wt
    FROM {table} GROUP BY 1
),
tot AS (SELECT sum(wt) AS tot FROM agg)
SELECT g AS {group_col},
       round(wt, {round_to}) AS weight,
       round(wt / tot, {round_to}) AS share,
       round(sum(wt) OVER (ORDER BY wt DESC, g
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / tot, {round_to}) AS cum_share,
       (sum(wt) OVER (ORDER BY wt DESC, g
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        - wt) / tot < {head_share} AS in_head
FROM agg CROSS JOIN tot
"""


def zipf_fit(
    docs: DataFrame,
    top_n: int = 1000,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Zipf's-law diagnostic: fit ``log(count) ~ log(rank)`` over the
    ``top_n`` most frequent tokens and report one row
    (n_tokens_ranked, slope, intercept, r2).  Natural text sits near
    slope -1; templated/generated corpora drift flat (slope > -0.6)
    or cliff-steep — a one-number "does this corpus look organic"
    screen that composes the freq and regression primitives.

    Plan: one token-count groupBy (map-side combined), a bounded-k
    TakeOrdered for the top_n rows, a rank window over those <=top_n
    rows (deliberately bounded single partition, same class as the
    threshold frames), then the covar/var OLS moments.  Ties in count
    break by token so ranks are engine-stable.
    """
    from multi_sensor_data_pipeline_for_robotics__spark.functions.text import tokens
    from multi_sensor_data_pipeline_for_robotics__spark.plans.regress import (
        grouped_ols,
    )
    from pyspark.sql import Window as W

    counts = (
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(top_n)
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.col("cnt").desc(), F.col("tok"))),
    )
    fit = grouped_ols(
        ranked.withColumn("g", F.lit(1)),
        ["g"],
        F.log(F.col("rank").cast("double")),
        F.log(F.col("cnt").cast("double")),
        round_to=round_to,
    )
    return fit.select(
        F.col("n").alias("n_tokens_ranked"),
        "slope",
        "intercept",
        "r2",
    )


def zipf_oracle_sql(top_n: int = 1000, round_to: int = 6) -> str:
    """DuckDB twin of :func:`zipf_fit` over the documents view."""
    return f"""
WITH counts AS (
    SELECT tok, count(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ) GROUP BY tok
    ORDER BY cnt DESC, tok LIMIT {top_n}
),
ranked AS (
    SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS DOUBLE))
               AS x,
           ln(CAST(cnt AS DOUBLE)) AS y
    FROM counts
),
agg AS (
    SELECT count(*) AS n, covar_samp(x, y) AS cxy,
           var_samp(x) AS vx, var_samp(y) AS vy,
           avg(x) AS mx, avg(y) AS my
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_tokens_ranked,
       round(CASE WHEN vx > 0 THEN cxy / vx END, {round_to}) AS slope,
       round(my - (CASE WHEN vx > 0 THEN cxy / vx END) * mx,
             {round_to}) AS intercept,
       round(CASE WHEN vx > 0 AND vy > 0 THEN cxy * cxy / (vx * vy) END,
             {round_to}) AS r2
FROM agg
"""
