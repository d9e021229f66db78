"""Thin CLI over the engine (SURVEY §7: "library + thin CLI").

Replaces the reference's Streamlit buttons (app.py:212-330) with
composable commands; every command is a lazy DataFrame pipeline ending
in one write/show action.

    python -m multi_sensor_data_pipeline_for_robotics__spark gen --out /tmp/sensors
    python -m multi_sensor_data_pipeline_for_robotics__spark clean \
        --input /tmp/sensors/camera --sensor-type camera --out /tmp/clean_cam
    python -m multi_sensor_data_pipeline_for_robotics__spark sync \
        --camera /tmp/clean_cam --motion /tmp/sensors/motion \
        --log /tmp/sensors/log --method nearest --out /tmp/synced
    python -m multi_sensor_data_pipeline_for_robotics__spark stats --input /tmp/synced
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession


def _read(
    spark: SparkSession,
    path: str,
    sensor_type: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    from multi_sensor_data_pipeline_for_robotics__spark.sources.io import read_sensor_csv

    if fmt == "csv" or path.endswith(".csv"):
        return read_sensor_csv(spark, path, sensor_type)
    return spark.read.parquet(path)


def _write(df: DataFrame, path: str, fmt: str) -> None:
    from multi_sensor_data_pipeline_for_robotics__spark.sources.io import (
        write_csv_single,
        write_parquet,
    )

    (write_csv_single if fmt == "csv" else write_parquet)(df, path)


def cmd_gen(spark: SparkSession, a: argparse.Namespace) -> int:
    from multi_sensor_data_pipeline_for_robotics__spark.sources import datagen as DG

    _write(DG.generate_camera(spark, n=a.n_camera), f"{a.out}/camera", a.format)
    _write(DG.generate_motion(spark, n=a.n_motion), f"{a.out}/motion", a.format)
    _write(DG.generate_log(spark, n=a.n_log), f"{a.out}/log", a.format)
    print(f"wrote camera({a.n_camera}) motion({a.n_motion}) log({a.n_log}) -> {a.out}")
    return 0


def cmd_clean(spark: SparkSession, a: argparse.Namespace) -> int:
    from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import clean

    res = clean(_read(spark, a.input, a.sensor_type, a.format), a.sensor_type)
    for line in res.report:
        print(line)
    _write(res.df, a.out, a.format)
    return 0


def cmd_sync(spark: SparkSession, a: argparse.Namespace) -> int:
    from multi_sensor_data_pipeline_for_robotics__spark.operators.sync import synchronize

    res = synchronize(
        _read(spark, a.camera, "camera", a.format),
        _read(spark, a.motion, "motion", a.format),
        _read(spark, a.log, "log", a.format) if a.log else None,
        method=a.method,
        step_ms=a.step_ms,
        tolerance_ms=a.tolerance_ms,
        reduce_cells=a.reduce_cells,
    )
    for line in res.report:
        print(line)
    if res.df is None:
        return 1
    _write(res.df, a.out, a.format)
    return 0


def cmd_stats(spark: SparkSession, a: argparse.Namespace) -> int:
    from multi_sensor_data_pipeline_for_robotics__spark.plans.analytics import (
        corr_matrix,
        summary_stats,
    )

    df = _read(spark, a.input, None, a.format)
    summary_stats(df).show(truncate=False)
    corr_matrix(df).show(truncate=False)
    return 0


def cmd_search(spark: SparkSession, a: argparse.Namespace) -> int:
    from multi_sensor_data_pipeline_for_robotics__spark.operators.retrieval import (
        bm25_topk,
    )

    docs = spark.read.parquet(a.input)
    terms = [t for t in a.terms.split(",") if t]
    bm25_topk(
        docs, terms, k=a.k, text_col=a.text_col, id_col=a.id_col
    ).show(a.k, truncate=False)
    return 0


def cmd_dedup(spark: SparkSession, a: argparse.Namespace) -> int:
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        dedup_against_corpus,
    )

    new = spark.read.parquet(a.input)
    corpus = spark.read.parquet(a.corpus)
    kept = dedup_against_corpus(
        new, corpus, threshold=a.threshold,
        text_col=a.text_col, id_col=a.id_col,
    )
    _write(kept, a.out, a.format)
    n_in, n_kept = new.count(), kept.count()
    print(f"kept {n_kept}/{n_in} docs (dropped {n_in - n_kept} near-dups) -> {a.out}")
    return 0


def cmd_check(spark: SparkSession, a: argparse.Namespace) -> int:
    """Data-quality gate: exit 1 if any rule has violations.

    --rule accepts  not_null:col | range:col:lo:hi |
    accepted_values:col:v1,v2,... | matches:col:regex | unique:c1,c2
    """
    from multi_sensor_data_pipeline_for_robotics__spark.operators.quality import (
        check_constraints,
    )

    rules = []
    for spec in a.rule:
        kind, _, rest = spec.partition(":")
        if kind == "not_null":
            rules.append(("not_null", rest))
        elif kind == "range":
            col, lo, hi = rest.split(":")
            rules.append(("range", col, float(lo), float(hi)))
        elif kind == "accepted_values":
            col, _, vals = rest.partition(":")
            rules.append(("accepted_values", col, vals.split(",")))
        elif kind == "matches":
            col, _, pat = rest.partition(":")
            rules.append(("matches", col, pat))
        elif kind == "unique":
            rules.append(("unique", rest.split(",")))
        else:
            raise SystemExit(f"unknown rule kind: {kind}")
    rows = check_constraints(spark.read.parquet(a.input), rules).collect()
    bad = 0
    for r in rows:
        print(f"{r.rule}: {r.violations} violations")
        bad += r.violations
    return 1 if bad else 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="multi_sensor_data_pipeline_for_robotics__spark")
    p.add_argument("--format", choices=["parquet", "csv"], default="parquet")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="seeded sample sensors (O1-O3)")
    g.add_argument("--out", required=True)
    g.add_argument("--n-camera", type=int, default=500)
    g.add_argument("--n-motion", type=int, default=600)
    g.add_argument("--n-log", type=int, default=100)
    g.set_defaults(fn=cmd_gen)

    c = sub.add_parser("clean", help="clean one sensor table (O7-O11)")
    c.add_argument("--input", required=True)
    c.add_argument("--sensor-type", choices=["camera", "motion", "log"], required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_clean)

    s = sub.add_parser("sync", help="synchronize sensors (O12-O18)")
    s.add_argument("--camera", required=True)
    s.add_argument("--motion", required=True)
    s.add_argument("--log")
    s.add_argument("--method", choices=["nearest", "pad", "backfill"], default="nearest")
    s.add_argument("--step-ms", type=int, default=33)
    s.add_argument("--tolerance-ms", type=int, default=100)
    s.add_argument("--reduce-cells", action="store_true")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_sync)

    t = sub.add_parser("stats", help="summary statistics + correlations (O20-O21)")
    t.add_argument("--input", required=True)
    t.set_defaults(fn=cmd_stats)

    q = sub.add_parser("search", help="BM25 keyword search over a documents table")
    q.add_argument("--input", required=True)
    q.add_argument("--terms", required=True, help="comma-separated query terms")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--text-col", default="text")
    q.add_argument("--id-col", default="doc_id")
    q.set_defaults(fn=cmd_search)

    d = sub.add_parser(
        "dedup", help="screen new documents against a corpus (near-dup drop)"
    )
    d.add_argument("--input", required=True, help="arriving batch (parquet)")
    d.add_argument("--corpus", required=True, help="existing corpus (parquet)")
    d.add_argument("--threshold", type=float, default=0.5)
    d.add_argument("--text-col", default="text")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--out", required=True)
    d.set_defaults(fn=cmd_dedup)

    k = sub.add_parser("check", help="data-quality gate (exit 1 on violations)")
    k.add_argument("--input", required=True)
    k.add_argument("--rule", action="append", required=True,
                   help="not_null:col | range:col:lo:hi | "
                        "accepted_values:col:v1,v2 | matches:col:regex | "
                        "unique:c1,c2 (repeatable)")
    k.set_defaults(fn=cmd_check)
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    a = build_parser().parse_args(argv)
    if spark is None:
        from multi_sensor_data_pipeline_for_robotics__spark import get_session

        spark = get_session(app_name="msdp_cli")
    return a.fn(spark, a)


if __name__ == "__main__":
    sys.exit(main())
