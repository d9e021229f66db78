"""Sequence packing for LLM training — "concat-and-chunk": order the
corpus deterministically, concatenate the token streams, cut into
fixed-length training sequences, and emit the (sequence, doc-slice)
assignment plan.

No reference-repo analog (the reference is a sensor pipeline); this is
part of the training-data extension surface. The packing is the
deterministic concat-and-chunk scheme (as used for GPT-style training
corpora): token offsets follow a single global order, so the output is
reproducible on any cluster layout and SQL-expressible for the oracle.

Scale design — the global running sum is the crux. A naive
``sum() OVER (ORDER BY doc_id)`` window has no partition key: Spark
moves the whole corpus to ONE task. :func:`global_running_sum` instead
does the classic two-phase prefix sum:

  1. range-repartition by the order column (ranges ascend with
     partition id), cumsum WITHIN each partition via a window
     partitioned by ``spark_partition_id()`` — fully parallel;
  2. per-partition totals (one tiny row per partition) are
     prefix-summed and broadcast back; global = local + prefix.

One range shuffle total, no single-task stage, identical result
regardless of partition bounds (the range sampler may place splits
differently run to run; local+prefix is invariant to that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_col: str | list[str],
    val_col: Column | str,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive-prefix-free global running sum of ``val_col`` in
    ``order_col`` order (the output INCLUDES the current row), without
    a single-partition window. Appends ``out_col``; also leaves the
    input columns untouched. ``order_col`` may be a list for a
    composite order (e.g. a sort key plus a unique tie-breaker — ties
    across rows would otherwise make the running values
    partitioning-dependent).
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, *[F.col(c) for c in order_cols]).withColumn(
        "__pid", F.spark_partition_id()
    )
    # CRITICAL: the window branch and the totals branch below both
    # consume this subtree. The range partitioner SAMPLES split points,
    # so two independent executions could place partition boundaries
    # differently — local + prefix would then mix two inconsistent
    # partitionings into wrong sums. localCheckpoint materializes the
    # partitioning once; both branches read the same layout.
    d = d.localCheckpoint(eager=False)
    w_local = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    d = d.withColumn("__local", F.sum(val_col).over(w_local))
    # one row per partition — tiny; the cross-partition prefix is a
    # window over <= num_partitions rows, then broadcast back
    w_prefix = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    prefix = (
        d.groupBy("__pid")
        .agg(F.sum(val_col).alias("__tot"))
        .select(
            "__pid",
            F.coalesce(F.sum("__tot").over(w_prefix), F.lit(0)).alias("__prefix"),
        )
    )
    return (
        d.join(F.broadcast(prefix), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__prefix")).cast("long"))
        .drop("__pid", "__local", "__prefix")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing plan: which slice of which document
    lands in which fixed-length training sequence.

    Documents are concatenated in ``id_col`` order; sequence ``s`` owns
    global token offsets ``[s*seq_len, (s+1)*seq_len)``. A document
    spanning a boundary is split across consecutive sequences (standard
    GPT-style packing — no padding, no document loss).

    Output: ``(seq_id, doc_id, tok_from, n_toks)`` — ``tok_from`` is the
    0-based offset within the document. Every sequence except the last
    covers exactly ``seq_len`` tokens; per-document slice lengths sum to
    the document's token count. The plan is metadata-only (ids and
    offsets); the actual token gather is a later co-partitioned join
    against the tokenized corpus, so the pack step never shuffles text.
    """
    toks = F.split(F.col(text_col), " ")
    # NULL text contributes 0 tokens (F.size alone returns -1 for NULL,
    # which would corrupt every later document's offset); 0-token docs
    # are excluded from span generation below
    n_toks = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(F.size(toks))
    counted = docs.select(F.col(id_col).alias("doc_id"), n_toks.alias("__n"))
    cum = global_running_sum(counted, "doc_id", "__n", "__end")
    # integer `div`, not `/`: global token offsets exceed double's 2^53
    # exact-integer range long before 100 TB of text
    spans = cum.filter(F.col("__n") > 0).withColumn(
        "__start", F.col("__end") - F.col("__n")
    ).select(
        "doc_id",
        "__start",
        "__end",
        F.explode(
            F.sequence(
                F.expr(f"__start div {seq_len}"),
                F.expr(f"(__end - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    lo = F.greatest(F.col("__start"), F.col("seq_id") * seq_len)
    hi = F.least(F.col("__end"), (F.col("seq_id") + 1) * seq_len)
    return spans.select(
        "seq_id",
        "doc_id",
        (lo - F.col("__start")).cast("long").alias("tok_from"),
        (hi - lo).cast("long").alias("n_toks"),
    )
