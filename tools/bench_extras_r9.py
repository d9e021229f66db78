#!/usr/bin/env python
"""Warm-pass wall times for the r9 query additions at sf0.1 — the
per-round timing artifact for new families (the frozen 18-query
headline in bench.py stays unchanged for cross-round comparison).

Usage: python tools/bench_extras_r9.py > bench_r9_extras.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from multi_sensor_data_pipeline_for_robotics__spark import get_session

R9 = [
    "select_lm_score",
    "select_dsir_weights",
    "select_dsir_top",
    "assoc_chi_square",
    "assoc_mutual_info",
    "assoc_welch_ttest",
    "audit_benford",
    "ts_acf",
    "ts_cusum_changepoint",
    "graph_label_prop",
    "regress_trend_by_type",
    "seq_match_funnel",
    "text_bigram_pmi",
    "corpus_pareto",
    "stream_benford",
    "stream_seq_match",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="bench_extras_r9")
    qs = entrymod.queries()
    # cold warm-up pass (plan + JIT + page cache), then the timed pass
    for name in R9:
        try:
            qs[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    out = {}
    total = 0.0
    for name in R9:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        out[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "r9_extras_wall_seconds",
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
