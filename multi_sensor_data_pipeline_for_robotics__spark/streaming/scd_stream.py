"""Streaming SCD2: maintain a versioned dimension FROM a CDC stream.

Each micro-batch applies ``operators.scd.scd2_apply`` to the stored
dimension — the sequential-replay property of the batch operator
(applying updates one batch at a time in ``eff_ts`` order equals
applying them all at once) is exactly what makes the streaming fold
correct, so the final dimension is bit-identical to the one-shot batch
merge and shares its DuckDB oracle.

Storage protocol: the dimension lives in versioned snapshot dirs
``{base}/v{epoch}`` with ``{base}/_CURRENT`` naming the live one —
the reader never observes a half-written snapshot (writes go to a new
dir; the pointer flips after the write completes), and epoch-id
tracking makes retried micro-batches no-ops (foreachBatch is
at-least-once; replaying a CDC batch against the already-advanced
dimension would re-open closed versions — the epoch guard, not
wishful idempotence, prevents that).

Ordering contract: micro-batches must arrive in ``eff_ts`` order
across batches (a CDC stream's natural order). Within a batch any
order is fine — ``scd2_apply`` sorts per key.

At 100 TB the snapshot write is the cost: a real deployment would
back this with a table format's MERGE (Delta/Iceberg) instead of full
rewrites; the per-batch plan (three key-hash joins + key windows) is
the same either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from multi_sensor_data_pipeline_for_robotics__spark.operators.scd import scd2_apply


def _current_epoch(base: str) -> int | None:
    try:
        with open(os.path.join(base, "_CURRENT")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def scd2_stream_to_parquet(
    updates_stream: DataFrame,
    init_dim: DataFrame,
    base_path: str,
    checkpoint_path: str,
    key_col: str,
    tracked_cols: list[str],
    eff_ts_col: str = "eff_ts",
):
    """Start the maintenance stream; returns the StreamingQuery.
    ``init_dim`` seeds snapshot v0 if the store is empty."""
    os.makedirs(base_path, exist_ok=True)
    if _current_epoch(base_path) is None:
        init_dim.write.mode("overwrite").parquet(f"{base_path}/v0")
        with open(os.path.join(base_path, "_CURRENT"), "w") as f:
            f.write("0")

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        last = _current_epoch(base_path)
        tag = epoch_id + 1  # v0 is the seed
        if tag <= last:
            return  # retried batch: already folded into the dimension
        dim = spark.read.parquet(f"{base_path}/v{last}")
        new = scd2_apply(dim, batch, key_col, tracked_cols, eff_ts_col)
        new.write.mode("overwrite").parquet(f"{base_path}/v{tag}")
        with open(os.path.join(base_path, "_CURRENT"), "w") as f:
            f.write(str(tag))

    return (
        updates_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def read_current_dim(spark, base_path: str) -> DataFrame:
    """The live dimension snapshot (the ``_CURRENT`` pointer)."""
    return spark.read.parquet(f"{base_path}/v{_current_epoch(base_path)}")
