#!/usr/bin/env python
"""Profile one or more declared queries: wall time (min of N passes),
final AQE executed plan, and per-stage metrics from the UI REST API.

Usage:
    python tools/profile_query.py dedup_minhash_lsh embed_neardup_lsh
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_sensor_data_pipeline_for_robotics__spark import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--outdir", default="/tmp/profile")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    spark = get_session(
        app_name="profile_query", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    import __spark_entry__ as entrymod

    from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table

    qs = entrymod.queries()

    # same warmup as bench.py
    from pyspark.sql.functions import col, pandas_udf

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, args.sf, t).count()

    @pandas_udf("long")
    def _noop(x):
        return x

    cores = sc.defaultParallelism
    spark.range(cores * 4, numPartitions=cores).select(_noop(col("id"))).count()
    from pyspark.sql import Window as _W
    from pyspark.sql.functions import broadcast, row_number, sum as _sum

    w = _W.partitionBy("g").orderBy("id")
    (
        spark.range(cores * 64)
        .selectExpr("id", "id % 8 AS g")
        .select("id", "g", row_number().over(w).alias("rn"))
        .groupBy("g")
        .agg(_sum("rn").alias("s"))
        .join(broadcast(spark.range(8).selectExpr("id AS g", "id AS j")), "g")
        .unionByName(spark.range(1).selectExpr("id AS g", "id AS s", "id AS j"))
        .count()
    )

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def stages_snapshot():
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            ) as r:
                return json.load(r)
        except Exception as e:  # noqa: BLE001
            return [{"error": str(e)}]

    for name in args.names:
        fn = qs[name]
        best = float("inf")
        for p in range(args.passes):
            spark.catalog.clearCache()
            before_ids = {s.get("stageId") for s in stages_snapshot() if "stageId" in s}
            sc.setJobDescription(f"profile:{name}:p{p}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t_plan = time.perf_counter() - t0
            n = df.count()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(f"## {name} p{p}: total={dt:.3f}s (df-build={t_plan:.3f}s, rows={n})")
            if p == args.passes - 1:
                # final adaptive plan after execution
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception as e:  # noqa: BLE001
                    plan = f"ERROR: {e}"
                with open(f"{args.outdir}/{name}_final.txt", "w") as f:
                    f.write(plan)
                stages = [
                    s
                    for s in stages_snapshot()
                    if "stageId" in s and s["stageId"] not in before_ids
                ]
                stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
                with open(f"{args.outdir}/{name}_stages.json", "w") as f:
                    json.dump(stages, f, indent=1)
                for s in stages[:12]:
                    print(
                        f"   stage {s['stageId']}: run={s.get('executorRunTime')}ms "
                        f"cpu={int((s.get('executorCpuTime') or 0)/1e6)}ms "
                        f"tasks={s.get('numCompleteTasks')} "
                        f"in={s.get('inputBytes')} sh_r={s.get('shuffleReadBytes')} "
                        f"sh_w={s.get('shuffleWriteBytes')} name={s.get('name','')[:60]!r}"
                    )
        print(f"# {name}: best={best:.3f}s")
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
