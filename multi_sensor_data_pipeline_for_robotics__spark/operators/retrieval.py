"""Keyword retrieval over the document corpus: BM25-scored top-k.

Beyond the reference surface (the reference app has no text search;
its closest analog is the substring log filter, app.py:331-340) — this
is the inverted-index retrieval a training-data pipeline needs for
corpus exploration, eval-set mining, and contamination triage.

Scale shape (the part that must survive 100 TB):

- The postings explode is filtered to the QUERY terms before anything
  shuffles — the only rows that leave the scan stage are (doc, dl,
  matched-term), a few rows per matching document, never the full
  token stream.
- Term statistics (document frequency) aggregate over that filtered
  stream and are broadcast back (≤ |query terms| rows).
- Corpus statistics (N, avgdl) are query-INDEPENDENT: one scalar-agg
  scan, broadcast as one row. A deployment serving many queries
  precomputes them once per corpus snapshot and passes
  ``corpus_stats=(n_docs, avgdl)`` — then a query costs a single scan.
- Global top-k is ``orderBy().limit(k)`` → TakeOrderedAndProject
  (per-partition heap + driver merge of k rows), not a single-partition
  sort. The multi-query variant ranks with a window PARTITIONED by
  query id — parallel across queries.

Scoring is the standard Okapi/Lucene formulation::

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Everything is built-in Catalyst expressions (split/explode/agg/join)
— no Python UDFs — so the whole plan stays in whole-stage codegen and
is oracle-checkable against the identical SQL in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from multi_sensor_data_pipeline_for_robotics__spark.functions.text import tokens
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
    ensure_parallelism,
)


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(N, avgdl) as a 1-row DataFrame — precompute once per corpus
    snapshot and reuse across queries."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )


def _scored_postings(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms,
    stats: DataFrame,
    k1: float,
    b: float,
):
    """Shared scoring pipeline: filtered postings → tf → df → per-term
    BM25 weight rows (doc, term, w). ``terms`` is either a literal
    ``list[str]`` (becomes an IN predicate evaluated in the scan stage)
    or a 1-column (term) DataFrame (becomes a broadcast semi-join right
    after the explode) — either way only matching postings ever reach a
    shuffle."""
    toks = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("__t")
    )
    posts = toks.select(
        "doc", F.size("__t").alias("dl"), F.explode("__t").alias("term")
    )
    if isinstance(terms, list):
        posts = posts.filter(F.col("term").isin(terms))
    else:
        posts = posts.join(F.broadcast(terms), "term", "left_semi")
    tf = posts.groupBy("doc", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    w = idf * F.col("tf") * (k1 + 1.0) / norm
    return (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .withColumn("w", w)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Top-k documents for one bag-of-words query, BM25-scored.

    Deterministic output: rank over (rounded score DESC, doc ASC).
    ``corpus`` optionally supplies a precomputed :func:`corpus_stats`
    frame so repeated queries skip the stats scan.
    """
    stats = corpus if corpus is not None else corpus_stats(docs, text_col)
    scored = _scored_postings(
        docs, text_col, id_col, list(query_terms), stats, k1, b
    )
    per_doc = scored.groupBy("doc").agg(
        F.round(F.sum("w"), round_to).alias("score")
    )
    topk = per_doc.orderBy(F.col("score").desc(), F.col("doc").asc()).limit(k)
    # rank assignment runs over ≤ k rows — the single partition is the
    # already-reduced driver-sized result, not corpus data
    rw = W.orderBy(F.col("score").desc(), F.col("doc").asc())
    return topk.select(
        "doc", "score", F.row_number().over(rw).cast("long").alias("rank")
    )


def bm25_topk_multi(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    corpus: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Batched retrieval: one top-k ranking per query row.

    ``queries``: (query_id, terms array<string>). The exploded query
    postings are broadcast into the term filter AND the per-query score
    join, so the corpus-side plan is identical to the single-query case
    — one filtered postings stream scores ALL queries. Ranking windows
    partition by query id (parallel across queries; per-partition state
    is one query's ≤ corpus-match rows, reduced to k before the sink).
    """
    stats = corpus if corpus is not None else corpus_stats(docs, text_col)
    qterms = queries.select(
        F.col(query_id_col).alias("qid"), F.explode(terms_col).alias("term")
    ).distinct()
    all_terms = qterms.select("term").distinct()
    scored = _scored_postings(
        docs, text_col, id_col, all_terms, stats, k1, b
    )
    per_q_doc = (
        scored.join(F.broadcast(qterms), "term")
        .groupBy("qid", "doc")
        .agg(F.round(F.sum("w"), round_to).alias("score"))
    )
    rw = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        per_q_doc.withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "doc", "score", "rank")
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    max_token_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    fanout_budget: int | None = 2_000_000_000,
) -> DataFrame:
    """Sparse LEXICAL similarity join: all document pairs whose tf-idf
    cosine reaches ``threshold`` — the inverted-index complement of the
    dense-embedding near-dup family (`similarity.neardup_pairs`), and
    the classical pre-embedding dedup/citation-detection primitive.

    Weights: tf x smooth idf (ln((1+N)/(1+df)) + 1, the text_tfidf
    convention), L2-normalized per doc so the postings dot product IS
    the cosine. Pairs form ONLY through shared tokens (a (token,
    doc_a, doc_b) equi-join on the postings table — never all-pairs),
    so cost follows the inverted-index law: a token shared by df docs
    contributes df^2 join rows. ``max_token_df`` drops tokens above
    the cap before the join (the `max_shingle_df` treatment;
    high-df tokens carry the least idf weight, so the cosine loss is
    bounded and skewed toward exactly the pairs that only stopwords
    connect).

    Output: (doc_a, doc_b, cosine double) with doc_a < doc_b,
    cosine rounded; deterministic given the cap.

    UNCAPPED runs (``max_token_df=None``, the exact semantics) are
    guarded: the worst-case postings fan-out sum(df^2) is computed in
    the same pass that builds the df table, and the job FAILS FAST
    with the offending numbers and the remediation (set
    ``max_token_df``) when it exceeds ``fanout_budget`` — at 100 TB a
    single corpus-wide stopword otherwise turns the self-join into an
    N^2 shuffle the user discovers hours in. The guard is lazy (a
    1-row broadcast folded into the weight projection, no extra
    action) and skipped entirely when a cap is set or
    ``fanout_budget=None``.
    """
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    n_docs = docs.count()
    tf = (
        tok.groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if max_token_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_token_df)
    idf = F.log(
        F.lit(float(1 + n_docs)) / (F.lit(1.0) + F.col("df"))
    ) + F.lit(1.0)
    w = tf.join(dfreq, "token").select(
        "doc", "token", (F.col("tf") * idf).alias("w")
    )
    if max_token_df is None and fanout_budget is not None:
        # sum(df^2) IS the pair-join row count; evaluated lazily from
        # the tiny <=|vocab|-row df table and folded into the weights
        # as a multiply-by-1.0 broadcast (consumed, so never pruned)
        guard = dfreq.agg(
            F.sum(F.col("df") * F.col("df")).alias("__fanout"),
            F.max("df").alias("__maxdf"),
        ).select(
            F.when(
                F.coalesce(F.col("__fanout"), F.lit(0))
                <= F.lit(int(fanout_budget)),
                F.lit(1.0),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "tfidf_cosine_pairs: uncapped postings"
                            " self-join would produce "
                        ),
                        F.col("__fanout").cast("string"),
                        F.lit(
                            f" candidate rows (> fanout_budget="
                            f"{int(fanout_budget)}); hottest token df="
                        ),
                        F.col("__maxdf").cast("string"),
                        F.lit(
                            ". Set max_token_df to cap stopword fan-out"
                            " (or raise fanout_budget)."
                        ),
                    )
                ).cast("double")
            )
            .alias("__g")
        )
        w = w.crossJoin(F.broadcast(guard)).select(
            "doc", "token", (F.col("w") * F.col("__g")).alias("w")
        )
    norms = w.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    wn = w.join(norms, "doc").select(
        "doc", "token", (F.col("w") / F.col("norm")).alias("wn")
    )
    a = wn.select(
        F.col("doc").alias("doc_a"), "token", F.col("wn").alias("wa")
    )
    b = wn.select(
        F.col("doc").alias("doc_b"), "token", F.col("wn").alias("wb")
    )
    return (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), round_to).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc",
    rank_col: str = "rank",
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) of N
    per-query rankings: ``rrf(d) = sum over systems of
    1 / (c + rank_system(d))`` — THE standard hybrid-search combiner
    (BM25 + vector ranks fuse without score normalization, since only
    RANKS enter).  Input frames each carry (query, doc, rank) under
    the given column names; a doc absent from a system contributes
    nothing (the standard convention).

    Output: (query_id, doc, rrf_score, n_systems, rank), top ``k`` per
    query by (score DESC, doc ASC).

    INPUT CONTRACT: each ranking frame carries AT MOST ONE row per
    (query, doc) — the natural output of any top-k ranker.  Duplicate
    rows would silently inflate both the fused score and ``n_systems``
    (each row contributes a reciprocal and a count); dedupe upstream
    (``dropDuplicates([query, doc])`` keeping the best rank) if a
    ranker can emit repeats.

    Float policy: each reciprocal is rounded to ``round_to`` BEFORE an
    exact DECIMAL sum (the ``bigram_logprob_scores`` discipline), so
    the fused score is independent of union/partition order and
    hash-comparable across engines.  ``round_to`` must be in [1, 27]:
    the sum accumulates in ``decimal(28, round_to)``, so larger values
    leave no integer digits (and would raise an opaque Catalyst type
    error instead of this ValueError).

    Scale shape: inputs are already top-k-per-query (k·|queries|·N
    rows total — query-sized, not corpus-sized); the fuse is one
    groupBy on (query, doc) and one per-query rank window."""
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if not 1 <= int(round_to) <= 27:
        raise ValueError(
            f"round_to must be in [1, 27], got {round_to} — the fused"
            " score accumulates in decimal(28, round_to)"
        )
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc"),
            F.col(rank_col).alias("rank"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    term = F.round(
        F.lit(1.0) / (F.col("rank").cast("double") + F.lit(float(c))),
        round_to,
    ).cast(f"decimal(28,{int(round_to)})")
    fused = u.groupBy("query_id", "doc").agg(
        F.sum(term).alias("__s"),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("__s").desc(), F.col("doc").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc",
            F.col("__s").cast("double").alias("rrf_score"),
            "n_systems",
            "rank",
        )
    )
