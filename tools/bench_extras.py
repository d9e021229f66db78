#!/usr/bin/env python
"""Warm-pass wall times for registry queries at sf0.1 — the per-round
timing artifact for NEW families (the frozen 18-query headline in
bench.py stays unchanged for cross-round comparison).

Usage: python tools/bench_extras.py [names...] > bench_rNN_extras.json
       (default: the r11 additions)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from multi_sensor_data_pipeline_for_robotics__spark import get_session

R11 = [
    "stream_token_budget",
    "dedup_audit",
    "embed_lsh_audit",
    "select_lm_incremental",
    "select_mixture_redistribute",
    "corpus_funnel_by_source",
]


def main() -> None:
    names = sys.argv[1:] or R11
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="bench_extras")
    qs = entrymod.queries()
    # cold warm-up pass (plan + JIT + page cache), then the timed pass
    for name in names:
        try:
            qs[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    out = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        out[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "extras_wall_seconds",
                "unit": "sec",
                "sf": 0.1,
                "pass": "warm",
                "queries": out,
                "total": round(total, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
