#!/usr/bin/env python
"""A/B smoke for the VECTORIZED streaming selection scorers
(plans/selection.py char_lm_score_map / dsir_score_map, r10).

Times the shipped numpy-vectorized mapInPandas scorers against the r9
per-character / per-token Python loops (reproduced inline below,
verbatim shape) on the same synthetic corpus, so the speedup claim in
SCALE.md is a measured number, not an assertion.  Also verifies both
implementations emit IDENTICAL rows at round(6) on a 50k-doc slice.

Usage:  python tools/smoke_selection_vec.py [--quick]
"""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark import get_session
from multi_sensor_data_pipeline_for_robotics__spark.plans.selection import (
    char_lm_score_map,
    collect_char_lm,
    collect_dsir_model,
    dsir_score_map,
)
from scale_smoke import _synth_docs, timed  # noqa: E402


def legacy_char_lm_score_map(df, model, text_col="text", id_col="doc_id",
                             alpha=0.5, round_to=6):
    """The r9 per-character Python-loop scorer, kept here ONLY as the
    A/B control for this smoke."""
    spark = df.sparkSession
    tri_d, ctx_d, v = model
    btri = spark.sparkContext.broadcast(tri_d)
    bctx = spark.sparkContext.broadcast(ctx_d)
    ln2 = math.log(2.0)

    def _score(pdfs):
        import pandas as pd

        tri = btri.value
        ctx = bctx.value
        for pdf in pdfs:
            ids, ngs, avgs, bits = [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None or len(txt) < 3:
                    continue
                tot = 0.0
                n = len(txt) - 2
                for j in range(n):
                    g = txt[j:j + 3]
                    tot += math.log(
                        (tri.get(g, 0) + alpha)
                        / (ctx.get(g[:2], 0) + alpha * v)
                    )
                avg = tot / n
                ids.append(i)
                ngs.append(n)
                avgs.append(round(avg, round_to))
                bits.append(round(-avg / ln2, round_to))
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "n_grams": pd.Series(ngs, dtype="int64"),
                "avg_logp": pd.Series(avgs, dtype="float64"),
                "bits_per_gram": pd.Series(bits, dtype="float64"),
            })

    return df.mapInPandas(
        _score,
        schema=f"{id_col} long, n_grams long, avg_logp double,"
        " bits_per_gram double",
    )


def legacy_dsir_score_map(df, model, text_col="text", id_col="doc_id",
                          alpha=1.0, round_to=6):
    """The r9 per-token Python-loop scorer (A/B control)."""
    spark = df.sparkSession
    ct_d, cr_d, nt, nr, buckets = model
    bct = spark.sparkContext.broadcast(ct_d)
    bcr = spark.sparkContext.broadcast(cr_d)

    def _score(pdfs):
        import pandas as pd

        ct = bct.value
        cr = bcr.value
        den_t = nt + alpha * buckets
        den_r = nr + alpha * buckets
        for pdf in pdfs:
            ids, ns, ws = [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                tot = 0.0
                n = 0
                for tok in txt.split(" "):
                    h = hashlib.sha256(tok.encode("utf-8")).hexdigest()
                    b = int(h[:7], 16) % buckets
                    tot += math.log((ct.get(b, 0) + alpha) / den_t)
                    tot -= math.log((cr.get(b, 0) + alpha) / den_r)
                    n += 1
                ids.append(i)
                ns.append(n)
                ws.append(round(tot, round_to))
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "n_tokens": pd.Series(ns, dtype="int64"),
                "log_weight": pd.Series(ws, dtype="float64"),
            })

    return df.mapInPandas(
        _score,
        schema=f"{id_col} long, n_tokens long, log_weight double",
    )


def run_config(spark, scratch, n_docs, words, check_parity) -> None:
    docs = _synth_docs(spark, scratch, n_docs, words_per_doc=words)
    ref = docs.filter(F.col("lang") == "en")
    lm_model = collect_char_lm(ref, max_model_rows=20_000_000)
    dsir_model = collect_dsir_model(docs, F.col("lang") == "en")
    print(f"\n# selection map-scorer A/B @ {n_docs:,} docs x {words} tokens")
    print(f"  lm model: {len(lm_model[0]):,} grams,"
          f" {len(lm_model[1]):,} ctx, V={lm_model[2]}")

    if check_parity:
        # correctness: identical rows on a 50k slice
        small = docs.filter(F.col("doc_id") < 50_000)
        a = sorted(map(tuple,
                       char_lm_score_map(small, lm_model).collect()))
        b = sorted(map(tuple,
                       legacy_char_lm_score_map(small, lm_model).collect()))
        assert a == b, "char_lm_score_map != legacy on 50k slice"
        a = sorted(map(tuple, dsir_score_map(small, dsir_model).collect()))
        b = sorted(map(tuple,
                       legacy_dsir_score_map(small, dsir_model).collect()))
        assert a == b, "dsir_score_map != legacy on 50k slice"
        print("  parity on 50k docs: identical at round(6)")

    force = lambda d: d.agg(
        F.count(F.lit(1)), F.round(F.avg(d.columns[-1]), 4)
    ).first()
    # interleave twice, take the min of each — isolates code delta
    # from ambient host noise (same-window A/B discipline). A
    # pass-through mapInPandas (count only) measures the shared
    # scan+Arrow floor both variants pay, so the scoring-only delta
    # is also reported.
    runs = {"lm_new": [], "lm_old": [], "ds_new": [], "ds_old": [],
            "floor": []}
    def passthrough(pdfs):
        import pandas as pd
        for pdf in pdfs:
            yield pd.DataFrame({"n": [len(pdf)]})
    for rep in range(2):
        t, _ = timed(f"arrow passthrough (floor)   r{rep}",
                     lambda: docs.mapInPandas(
                         passthrough, schema="n long"
                     ).agg(F.sum("n")).first())
        runs["floor"].append(t)
        t, _ = timed(f"char_lm_score_map vectorized r{rep}",
                     lambda: force(char_lm_score_map(docs, lm_model)))
        runs["lm_new"].append(t)
        t, _ = timed(f"char_lm_score_map r9-loop   r{rep}",
                     lambda: force(
                         legacy_char_lm_score_map(docs, lm_model)))
        runs["lm_old"].append(t)
        t, _ = timed(f"dsir_score_map vectorized   r{rep}",
                     lambda: force(dsir_score_map(docs, dsir_model)))
        runs["ds_new"].append(t)
        t, _ = timed(f"dsir_score_map r9-loop      r{rep}",
                     lambda: force(
                         legacy_dsir_score_map(docs, dsir_model)))
        runs["ds_old"].append(t)
    floor = min(runs["floor"])
    for fam, new, old in (("char-LM", "lm_new", "lm_old"),
                          ("dsir", "ds_new", "ds_old")):
        tn, to = min(runs[new]), min(runs[old])
        so = ((to - floor) / max(tn - floor, 1e-9)
              if tn > floor else float("inf"))
        print(f"  {fam} end-to-end: {to / tn:.1f}x"
              f"   scoring-only (floor {floor:.1f}s): {so:.1f}x")


def main() -> None:
    quick = "--quick" in sys.argv
    div = 10 if quick else 1
    spark = get_session(app_name="smoke_selection_vec")
    scratch = tempfile.mkdtemp(prefix="spark_graft_selvec_")
    try:
        # short docs at corpus scale (the bench-extras shape) ...
        run_config(spark, scratch, 2_000_000 // div, 40, check_parity=True)
        # ... and long docs, where per-doc scoring dominates the floor
        run_config(spark, scratch, 500_000 // div, 120, check_parity=False)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
