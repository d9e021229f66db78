"""Model-artifact persistence: save/load the small TRAINED tables the
scoring operators broadcast (char-LM trigram/context counts, DSIR
bucket models, IVF coarse centroids, PQ codebooks) so a pipeline can
train once per corpus snapshot and score many runs — the missing piece
between "trains in this session" and "deployable".

Layout: one parquet per table under ``<path>/<name>.parquet`` plus a
``_model_meta.json`` manifest (arbitrary JSON-serializable params:
alpha, buckets, nlist, training row counts...).  EVERYTHING —
tables and manifest — goes through Hadoop's FileSystem API (the
manifest via ``FileSystem.create``/``open`` on the session's Hadoop
configuration), so the same code round-trips on any Hadoop-compatible
filesystem: local paths, ``file:``/``hdfs:``/``s3a:`` URIs — no POSIX
``open()`` anywhere, no partial artifacts on object stores.

The tables are MODEL-sized (vocabulary / buckets / centroids), never
data-sized — a single output file per table keeps reload cheap and the
artifact human-inspectable.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_model_tables", "load_model_tables"]

_META = "_model_meta.json"


def _join(path: str, name: str) -> str:
    # URI-safe join (os.path.join would mangle scheme://host paths on
    # non-POSIX separators and never understands URIs anyway)
    return path.rstrip("/") + "/" + name


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop
    configuration — resolves the scheme (file:, hdfs:, s3a:, ...) the
    same way Spark's own writers do."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def save_model_tables(
    path: str,
    tables: dict[str, DataFrame],
    meta: dict | None = None,
) -> None:
    """Write each named model table to ``<path>/<name>.parquet``
    (coalesced to one file — the tables are model-sized by contract)
    and the ``meta`` dict to the manifest. Overwrites.  Crash safety:
    all arguments are validated BEFORE anything touches the target (a
    caller error must leave a previously valid artifact loadable);
    then any EXISTING manifest is deleted FIRST and the new one is
    written LAST, so a save that dies mid-way leaves the directory
    unloadable (:func:`load_model_tables` requires the manifest)
    rather than a torn mix of old and new tables that would load
    silently."""
    if not tables:
        raise ValueError("save_model_tables: no tables given")
    for name in tables:
        if not name or "/" in name or name.startswith("_"):
            raise ValueError(f"bad model table name: {name!r}")
    spark = next(iter(tables.values())).sparkSession
    fs, hpath = _hadoop_fs(spark, _join(path, _META))
    if fs.exists(hpath):
        fs.delete(hpath, False)
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(
            _join(path, f"{name}.parquet")
        )
    manifest = {"tables": sorted(tables), "meta": meta or {}}
    out = fs.create(hpath, True)
    try:
        out.write(
            bytearray(
                json.dumps(manifest, indent=1, sort_keys=True).encode(
                    "utf-8"
                )
            )
        )
    finally:
        out.close()


def load_model_tables(
    spark: SparkSession, path: str
) -> tuple[dict[str, DataFrame], dict]:
    """Load every table named in the manifest; returns
    ``({name: DataFrame}, meta)``. Raises FileNotFoundError when the
    manifest is absent (not a model directory / save didn't finish)."""
    fs, hpath = _hadoop_fs(spark, _join(path, _META))
    if not fs.exists(hpath):
        raise FileNotFoundError(f"no {_META} under {path}")
    jvm = spark.sparkContext._jvm
    stream = fs.open(hpath)
    try:
        manifest = json.loads(
            jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        )
    finally:
        stream.close()
    tables = {
        name: spark.read.parquet(_join(path, f"{name}.parquet"))
        for name in manifest["tables"]
    }
    return tables, manifest.get("meta", {})
