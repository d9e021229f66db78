"""Timestamp-arithmetic helpers hardened against TIMESTAMP_NTZ inputs.

``F.unix_micros`` requires plain ``TIMESTAMP`` and throws
``DATATYPE_MISMATCH`` on ``TIMESTAMP_NTZ`` (which Spark produces when a
driver-owned session reads parquet µs timestamps written with
``isAdjustedToUTC=false``). ``load_table`` normalizes at scan time, but
operators can also be handed DataFrames from sessions we don't control,
so every internal ``unix_micros`` call routes through :func:`ts_us`,
which casts to ``timestamp`` first. On an already-TIMESTAMP column the
cast is a no-op that Catalyst folds away — zero cost on the normal path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_us(col: Column | str) -> Column:
    """µs since epoch for a timestamp column, tolerant of TIMESTAMP_NTZ.

    With the session timezone pinned UTC (see ``session.py`` /
    ``load_table``) the NTZ→TIMESTAMP cast is value-preserving.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
