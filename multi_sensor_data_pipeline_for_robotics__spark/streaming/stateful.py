"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch as-of align (operators/sync.py) carries the last observation
across time-bucket boundaries with a broadcast carry table; on a stream
the same "remember the last observation" semantics needs REAL state —
this module implements it with Spark's arbitrary-stateful-processing API:

  ``locf_enrich``  per key, every record is emitted with the value of the
                   previous observation (last-observation-carried-forward
                   across micro-batches). This is the streaming primitive
                   under pad-alignment: state = one (ts, value) pair per
                   key, O(keys) total, independent of stream length.

Scale notes: state lives in the state store, partitioned by key —
adding executors shards it. Per key the state is ~16 bytes; watermark-
based timeout (``GroupStateTimeout``) can expire idle keys when the key
space is unbounded (not enabled here — sensor channels are a small fixed
key set).

Within a micro-batch rows are processed in event-time order (sorted per
batch); records older than the carried state's timestamp are late data —
they still get the then-current previous value and do NOT rewind state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LOCF_OUTPUT_SCHEMA = (
    "key string, ts timestamp, value double, prev_ts timestamp, prev_value double"
)
LOCF_STATE_SCHEMA = "last_ts_us long, last_value double"


def _locf_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts_us, last_value = state.get
    else:
        last_ts_us, last_value = None, None

    out = []
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("ts", kind="stable")
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
        prev_ts_us = ts_us.shift(1)
        prev_val = pdf["value"].shift(1)
        # seed the first row of the batch from carried state
        if last_ts_us is not None:
            prev_ts_us.iloc[0] = last_ts_us
            prev_val.iloc[0] = last_value
        out.append(
            pd.DataFrame(
                {
                    "key": key[0],
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "prev_ts": pd.to_datetime(prev_ts_us, unit="us"),
                    "prev_value": prev_val,
                }
            )
        )
        tail = pdf.iloc[-1]
        new_ts_us = int(ts_us.iloc[-1])
        if last_ts_us is None or new_ts_us >= last_ts_us:
            last_ts_us, last_value = new_ts_us, float(tail["value"])

    if last_ts_us is not None:
        state.update((last_ts_us, last_value))
    if out:
        yield pd.concat(out, ignore_index=True)


def locf_enrich(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key LOCF enrichment over an unbounded stream.

    Input: any keyed stream with an event-time column and a value.
    Output (append mode): one row per input record with the previous
    observation's (ts, value) attached — the building block for
    streaming pad-alignment and gap/staleness detection.
    """
    from pyspark.sql import functions as F

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _locf_fn,
        outputStructType=LOCF_OUTPUT_SCHEMA,
        stateStructType=LOCF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
