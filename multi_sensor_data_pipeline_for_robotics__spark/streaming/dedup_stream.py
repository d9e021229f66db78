"""Streaming ingest deduplication — the online half of
``operators/dedup.py`` for a continuously-arriving document corpus
(the standard training-data ingestion shape: crawl → stream → dedup →
land).

State design: dedup keys are 32-byte sha256 content hashes, never
document bodies — state per retained key is tens of bytes. With an
event-time column, ``dropDuplicatesWithinWatermark`` bounds state to
the watermark horizon (keys older than the delay are evicted — exactly
the guarantee a crawl pipeline wants: re-crawls of the same page within
the horizon dedup, ancient re-appearances re-land and batch dedup
sweeps them). Without an event-time column the operator falls back to
``dropDuplicates`` whose state grows with distinct keys — exact, but
documented as the bounded-corpus path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, sf_dir: str, glob: str = "documents.parquet"
) -> DataFrame:
    """File-source stream over the documents parquet (tests / local
    smoke; production would be Kafka with the same downstream plan)."""
    return (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )


def stream_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Keep the FIRST-ARRIVING row per exact content hash.

    (Batch ``dedup_exact`` keeps the min-id representative; a stream has
    no total order, so first-arrival is the only well-defined choice —
    the retained hash SET is identical, which is what the corpus
    cares about.)
    """
    out = stream.withColumn("content_hash", F.sha2(F.col(text_col), 256))
    if ts_col is not None:
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return out.dropDuplicates(["content_hash"])


def stream_corpus_screen_to_parquet(
    stream: DataFrame,
    corpus_signatures: DataFrame,
    out_path: str,
    checkpoint: str,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
):
    """Streaming twin of ``operators.dedup.dedup_against_corpus``: each
    arriving micro-batch is screened against a static (precomputed,
    stored) portable-minhash signature table; survivors append to
    parquet.

    The screen itself is the BATCH operator applied inside
    ``foreachBatch`` — the same pattern as
    ``sync_stream.sync_wide_to_parquet``: Structured Streaming hands a
    bounded DataFrame per epoch back to the batch planner, so one
    implementation serves both execution modes and no join state
    accrues (the per-epoch plan is a plain batch join against the
    static side; memory is O(batch), forever). A pure incremental-plan
    formulation is NOT available here: the "drop if ANY band matches"
    screen needs a per-doc aggregate over the band join, and a
    streaming aggregation followed by a join falls outside Spark's
    supported incremental plans.

    Within-batch duplicates pass (same caveat as the batch operator);
    the static side is pinned at query start — restart to pick up a
    refreshed signature table.

    Exactly-once landing: foreachBatch is at-least-once, so a plain
    append would duplicate survivors when a failed micro-batch retries.
    Survivors land PARTITIONED BY the epoch id with dynamic partition
    overwrite — a retry of epoch N rewrites only ``epoch_id=N``,
    making the sink idempotent (the standard parquet-sink recipe;
    transactional table formats do this natively). Readers see an extra
    ``epoch_id`` partition column.
    """
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        dedup_against_corpus,
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        kept = dedup_against_corpus(
            batch_df,
            corpus_signatures=corpus_signatures,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            shingle_n=shingle_n,
        )
        (
            kept.withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_path)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
