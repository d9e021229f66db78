"""Model-artifact persistence: save/load the small TRAINED tables the
scoring operators broadcast (char-LM trigram/context counts, DSIR
bucket models, IVF coarse centroids, PQ codebooks) so a pipeline can
train once per corpus snapshot and score many runs — the missing piece
between "trains in this session" and "deployable".

Layout: one parquet per table under ``<path>/<name>.parquet`` plus a
``_model_meta.json`` manifest (arbitrary JSON-serializable params:
alpha, buckets, nlist, training row counts...).  Everything round-trips
through Spark's writers, so the same code works on any Hadoop-
compatible filesystem; the manifest write goes through the local
``open()`` only for ``file://``-style paths (the local[32] test rig) —
swap for your object-store client at deployment, it is one small JSON.

The tables are MODEL-sized (vocabulary / buckets / centroids), never
data-sized — a single output file per table keeps reload cheap and the
artifact human-inspectable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_model_tables", "load_model_tables"]

_META = "_model_meta.json"


def save_model_tables(
    path: str,
    tables: dict[str, DataFrame],
    meta: dict | None = None,
) -> None:
    """Write each named model table to ``<path>/<name>.parquet``
    (coalesced to one file — the tables are model-sized by contract)
    and the ``meta`` dict to the manifest. Overwrites."""
    if not tables:
        raise ValueError("save_model_tables: no tables given")
    for name, df in tables.items():
        if not name or "/" in name or name.startswith("_"):
            raise ValueError(f"bad model table name: {name!r}")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"{name}.parquet")
        )
    manifest = {"tables": sorted(tables), "meta": meta or {}}
    with open(os.path.join(path, _META), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


def load_model_tables(
    spark: SparkSession, path: str
) -> tuple[dict[str, DataFrame], dict]:
    """Load every table named in the manifest; returns
    ``({name: DataFrame}, meta)``. Raises FileNotFoundError when the
    manifest is absent (not a model directory)."""
    mp = os.path.join(path, _META)
    if not os.path.exists(mp):
        raise FileNotFoundError(f"no {_META} under {path}")
    with open(mp) as f:
        manifest = json.load(f)
    tables = {
        name: spark.read.parquet(os.path.join(path, f"{name}.parquet"))
        for name in manifest["tables"]
    }
    return tables, manifest.get("meta", {})
