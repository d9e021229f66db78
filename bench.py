#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with a cheap full-result action (count on the
final plan) after a warm-up of the session; per-query wall time
includes planning + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_sensor_data_pipeline_for_robotics__spark import get_session

HEADLINE = [
    "o15_sync_wide",
    "o14_asof_nearest",
    "o16_event_onehot",
    "o10_quantile_clamp",
    "o20_corr_matrix",
    "o21_summary_stats",
    "q1_pricing_summary",
    "q3_top_orders",
    "q_window_running",
    "q_rollup_revenue",
    "join_enrich_events",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_token_stats",
    "text_bpe_tokens",
    "embed_cosine_topk",
    "embed_neardup_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session(app_name="bench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warm up the JVM + parquet footers with a trivial action, and the
    # Python worker pool (first pandas_udf stage pays ~3s of per-core
    # worker spawn + pandas import otherwise)
    from pyspark.sql.functions import col, pandas_udf

    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    @pandas_udf("long")
    def _noop(x):
        return x

    cores = spark.sparkContext.defaultParallelism
    spark.range(cores * 4, numPartitions=cores).select(_noop(col("id"))).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
