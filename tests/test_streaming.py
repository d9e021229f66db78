from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table
from multi_sensor_data_pipeline_for_robotics__spark.streaming import sync_stream as SS


@pytest.fixture(scope="module")
def events_path(sf_dir):
    return sf_dir


def test_windowed_align_matches_batch(spark, sf_dir, events_path):
    stream = SS.read_events_stream(spark, events_path)
    aligned = SS.windowed_sensor_align(
        stream.filter(F.col("event_type") == "click"), step_ms=3_600_000
    )
    SS.run_to_memory(aligned, "aligned_out", "complete")
    got = spark.sql("SELECT * FROM aligned_out").toPandas()

    batch = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    want = (
        batch.groupBy(F.window("ts", "3600000 milliseconds").alias("win"))
        .agg(
            F.max_by("value", "ts").alias("value"),
            F.max("ts").alias("matched_ts"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(F.col("win.start").alias("timestamp"), "value", "matched_ts", "n_obs")
        .toPandas()
    )
    got = got.sort_values("timestamp").reset_index(drop=True)
    want = want.sort_values("timestamp").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["value"] == want["value"]).all()
    assert (got["n_obs"] == want["n_obs"]).all()


def test_event_onehot_stream_matches_batch_operator(spark, sf_dir, events_path):
    from multi_sensor_data_pipeline_for_robotics__spark.operators import sync as S

    ev = load_table(spark, sf_dir, "events")
    lo, hi = (
        ev.agg(F.min("ts"), F.max("ts")).first()[0],
        ev.agg(F.min("ts"), F.max("ts")).first()[1],
    )
    step_ms, tol_ms = 60_000, 30_000
    n_grid = (int(hi.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
              - int(lo.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)) // (step_ms * 1000) + 1

    stream = SS.read_events_stream(spark, events_path)
    oneh = SS.event_onehot_stream(
        stream, lo, n_grid, step_ms, tol_ms,
        event_types=["click", "error", "purchase", "signup", "view"],
    )
    SS.run_to_memory(oneh, "onehot_out", "complete")
    got = spark.sql("SELECT * FROM onehot_out").toPandas()

    want = S.map_events(
        ev.select(F.col("ts").alias("timestamp"), "event_type"),
        lo, hi, step_ms, tol_ms,
        event_types=["click", "error", "purchase", "signup", "view"],
    ).toPandas()
    got = got.sort_values("timestamp").reset_index(drop=True)
    want = want.sort_values("timestamp").reset_index(drop=True)
    assert len(got) == len(want)
    # full-frame equality: the grid timestamps themselves must agree,
    # not just the one-hot payloads at matching sort positions
    assert (got["timestamp"] == want["timestamp"]).all()
    for c in [c for c in want.columns if c.startswith("event_")]:
        assert (got[c] == want[c]).all(), c


def test_foreach_batch_parquet_sink(spark, events_path, tmp_path):
    stream = SS.read_events_stream(spark, events_path)
    q = SS.sync_to_parquet(
        stream.filter(F.col("event_type") == "view"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        step_ms=3_600_000,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() > 0
    assert set(out.columns) == {"timestamp", "value", "matched_ts", "n_obs"}


def test_sync_wide_stream_matches_batch(spark, sf_dir, events_path, tmp_path):
    """The streaming wide-table (single micro-batch) must equal the
    batch synchronize on the same events."""
    stream = SS.read_events_stream(spark, events_path)
    q = SS.sync_wide_to_parquet(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() > 0
    assert {"camera_x", "motion_y", "event_error", "event_signup"} <= set(got.columns)

    # batch reference on the same data (single batch -> same window)
    from multi_sensor_data_pipeline_for_robotics__spark.operators.sync import synchronize

    ev = load_table(spark, sf_dir, "events")
    cam = ev.filter(F.col("event_type") == "click").groupBy(
        F.col("ts").alias("timestamp")
    ).agg(F.max("value").alias("x"))
    mot = ev.filter(F.col("event_type") == "view").groupBy(
        F.col("ts").alias("timestamp")
    ).agg(F.max("value").alias("y"))
    log = ev.filter(F.col("event_type").isin("error", "signup")).select(
        F.col("ts").alias("timestamp"), "event_type"
    )
    want = synchronize(
        cam, mot, log, method="pad", step_ms=60_000, tolerance_ms=120_000,
        event_types=["error", "signup"],
    ).df
    g = {tuple(r) for r in got.select(sorted(got.columns)).collect()}
    w = {tuple(r) for r in want.select(sorted(want.columns)).collect()}
    assert g == w


def test_stream_dedup_exact_matches_batch(spark, sf_dir):
    from multi_sensor_data_pipeline_for_robotics__spark.operators import dedup as D
    from multi_sensor_data_pipeline_for_robotics__spark.streaming import (
        dedup_stream as DS,
    )

    stream = DS.read_documents_stream(spark, sf_dir)
    deduped = DS.stream_dedup_exact(stream)
    SS.run_to_memory(deduped, "dedup_out", "append")
    got = spark.sql("SELECT content_hash, doc_id FROM dedup_out").toPandas()

    want = D.dedup_exact(load_table(spark, sf_dir, "documents")).toPandas()
    # same distinct-hash set, one retained row per hash (representative
    # may differ: batch keeps min id, stream keeps first arrival)
    assert set(got["content_hash"]) == set(want["content_hash"])
    assert len(got) == len(want)
    assert got["content_hash"].is_unique


def test_stream_dedup_with_watermark_event_time(spark, sf_dir):
    from multi_sensor_data_pipeline_for_robotics__spark.streaming import (
        dedup_stream as DS,
    )

    stream = DS.read_documents_stream(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    deduped = DS.stream_dedup_exact(stream, ts_col="ts", watermark="1 hour")
    SS.run_to_memory(deduped, "dedup_wm_out", "append")
    got = spark.sql("SELECT content_hash FROM dedup_wm_out").toPandas()
    assert got["content_hash"].is_unique
    assert len(got) > 0


def test_session_window_stream_matches_batch_sessionize(spark, sf_dir, events_path):
    from multi_sensor_data_pipeline_for_robotics__spark.plans import analytics as A
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.sessions import (
        session_stats_stream,
    )

    stream = SS.read_events_stream(spark, events_path)
    sess = session_stats_stream(stream, gap_minutes=30)
    SS.run_to_memory(sess, "sessions_out", "complete")
    got = (
        spark.sql("SELECT user_id, session_start, session_end, n_events FROM sessions_out")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )

    batch = (
        A.sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
        .select("user_id", "session_start", "session_end", "n_events")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(batch)
    assert (got["user_id"] == batch["user_id"]).all()
    assert (got["session_start"] == batch["session_start"]).all()
    assert (got["session_end"] == batch["session_end"]).all()
    assert (got["n_events"] == batch["n_events"]).all()


def test_stream_corpus_screen_matches_batch(spark, tmp_path):
    """foreachBatch corpus screen == batch dedup_against_corpus on the
    same arriving docs, independent of micro-batch boundaries (the
    screen is per-doc vs the static corpus only)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        dedup_against_corpus,
        minhash_signatures_portable,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.dedup_stream import (
        stream_corpus_screen_to_parquet,
    )

    base_txt = (
        "the quick brown fox jumps over the lazy dog while the calm cat "
        "naps beside the warm stone wall in the quiet afternoon sun"
    )
    corpus = spark.createDataFrame(
        [(100, base_txt), (101, "spark shuffles hash partitions across executors today")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures_portable(corpus)

    arriving = spark.createDataFrame(
        [
            (1, base_txt.replace("jumps", "leaps")),   # near-dup -> drop
            (2, "completely novel text about harmony"),  # keep
            (3, "spark shuffles hash partitions across executors today"),  # exact -> drop
            (4, "another novel doc with fresh content entirely"),  # keep
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "arriving")
    # two files = two micro-batches
    arriving.filter("doc_id <= 2").coalesce(1).write.mode("append").parquet(src)
    arriving.filter("doc_id > 2").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "kept")
    q = stream_corpus_screen_to_parquet(
        stream, sigs, out, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    want = sorted(
        r.doc_id
        for r in dedup_against_corpus(arriving, corpus_signatures=sigs).collect()
    )
    assert got == want == [2, 4]


def test_nearest_align_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming nearest-within-tolerance == the batch asof_align
    nearest (non-null, within-tolerance rows), with candidates split
    across micro-batches so a grid point's winner can arrive in either
    batch."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators import sync as S

    cam = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy(F.col("ts").alias("timestamp"))
        .agg(F.max("value").alias("value"))
    )
    lo, hi = cam.agg(F.min("timestamp"), F.max("timestamp")).first()
    step_ms, tol_ms = 900_000, 300_000
    n_grid = (
        int(hi.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        - int(lo.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    ) // (step_ms * 1000) + 1

    # batch truth: nearest align, keep only within-tolerance matches
    grid = S.time_grid(spark, lo, hi, step_ms)
    batch = S.asof_align(grid, cam.withColumnRenamed("value", "x"), method="nearest")
    want = (
        batch.filter(
            F.col("__matched_ts").isNotNull()
            & (
                F.abs(
                    F.unix_micros("__matched_ts") - F.unix_micros("timestamp")
                )
                <= tol_ms * 1000
            )
        )
        .select("timestamp", F.col("x").alias("value"), F.col("__matched_ts").alias("matched_ts"))
        .toPandas()
        .sort_values("timestamp")
        .reset_index(drop=True)
    )

    # stream the raw clicks in two halves (two files -> two batches)
    src = str(tmp_path / "clicks")
    raw = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select("ts", "value")
    mid = raw.approxQuantile("value", [0.5], 0.0)[0]
    raw.filter(F.col("value") <= mid).coalesce(1).write.mode("append").parquet(src)
    raw.filter(F.col("value") > mid).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = SS.windowed_nearest_align(
        stream, lo, n_grid, step_ms=step_ms, tolerance_ms=tol_ms
    )
    SS.run_to_memory(out, "nearest_out", "complete")
    got = (
        spark.table("nearest_out")
        .toPandas()
        .sort_values("timestamp")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["timestamp"] == want["timestamp"]).all()
    assert (got["value"] == want["value"]).all()
    assert (got["matched_ts"] == want["matched_ts"]).all()


def test_nearest_align_stream_append_mode_runs(spark, sf_dir, tmp_path):
    """Append mode must be an accepted incremental plan (grid rows
    finalize as the watermark passes); rows emitted are a prefix of the
    complete-mode result."""
    src = str(tmp_path / "clicks_app")
    raw = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select("ts", "value")
    raw.coalesce(1).write.mode("append").parquet(src)
    lo = raw.agg(F.min("ts")).first()[0]
    stream = (
        spark.readStream.schema("ts timestamp, value double").parquet(src)
    )
    out = SS.windowed_nearest_align(
        stream, lo, 10_000, step_ms=900_000, tolerance_ms=300_000, late_ms=0
    )
    SS.run_to_memory(out, "nearest_append_out", "append")
    emitted = spark.table("nearest_append_out")
    assert emitted.count() >= 0  # accepted plan; content checked above


def test_pad_backfill_align_stream_matches_batch(spark, sf_dir):
    """Streaming pad/backfill within tolerance == the batch asof_align
    of the same method restricted to in-tolerance matches."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators import sync as S

    cam = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy(F.col("ts").alias("timestamp"))
        .agg(F.max("value").alias("x"))
    )
    lo, hi = cam.agg(F.min("timestamp"), F.max("timestamp")).first()
    step_ms, tol_ms = 900_000, 300_000
    n_grid = (
        int(hi.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        - int(lo.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    ) // (step_ms * 1000) + 1
    grid = S.time_grid(spark, lo, hi, step_ms)
    raw = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select("ts", "value")

    for method, sign in (("pad", 1), ("backfill", -1)):
        batch = S.asof_align(grid, cam, method=method)
        want = (
            batch.filter(
                F.col("__matched_ts").isNotNull()
                & (
                    sign
                    * (
                        F.unix_micros("timestamp")
                        - F.unix_micros("__matched_ts")
                    )
                    <= tol_ms * 1000
                )
            )
            .select(
                "timestamp",
                F.col("x").alias("value"),
                F.col("__matched_ts").alias("matched_ts"),
            )
            .toPandas()
            .sort_values("timestamp")
            .reset_index(drop=True)
        )
        stream = SS.read_events_stream(spark, sf_dir).filter(
            F.col("event_type") == "click"
        )
        out = SS.windowed_asof_align(
            stream, lo, n_grid, step_ms=step_ms, tolerance_ms=tol_ms,
            method=method,
        )
        SS.run_to_memory(out, f"asof_{method}_out", "complete")
        got = (
            spark.table(f"asof_{method}_out")
            .toPandas()
            .sort_values("timestamp")
            .reset_index(drop=True)
        )
        assert len(got) == len(want) > 0, method
        assert (got["timestamp"] == want["timestamp"]).all(), method
        assert (got["value"] == want["value"]).all(), method
        assert (got["matched_ts"] == want["matched_ts"]).all(), method


def test_stream_neardup_screen_matches_batch(spark, tmp_path):
    """The broadcast-model STATELESS screen == batch
    dedup_against_corpus on the same arriving docs — same portable
    hash family recomputed in Python, bit-identical signatures, same
    survivors regardless of micro-batch boundaries."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        dedup_against_corpus,
        minhash_signatures_portable,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.dedup_stream import (
        collect_lsh_screen_model,
        stream_neardup_screen,
    )

    base_txt = (
        "the quick brown fox jumps over the lazy dog while the calm cat "
        "naps beside the warm stone wall in the quiet afternoon sun"
    )
    corpus = spark.createDataFrame(
        [(100, base_txt), (101, "spark shuffles hash partitions across executors today")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures_portable(corpus)
    model = collect_lsh_screen_model(sigs)

    arriving = spark.createDataFrame(
        [
            (1, base_txt.replace("jumps", "leaps")),     # near-dup -> drop
            (2, "completely novel text about harmony"),  # keep
            (3, "spark shuffles hash partitions across executors today"),  # exact -> drop
            (4, "another novel doc with fresh content entirely"),  # keep
            (5, "xy"),                                   # < shingle_n tokens -> keep
            (6, None),                                   # null text -> keep
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "nd_arriving")
    arriving.filter("doc_id <= 3").coalesce(1).write.mode("append").parquet(src)
    arriving.filter("doc_id > 3").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    kept = stream_neardup_screen(stream, model)
    SS.run_to_memory(kept, "neardup_screen_tbl", output_mode="append")
    got = sorted(
        r.doc_id for r in spark.sql(
            "SELECT doc_id FROM neardup_screen_tbl"
        ).collect()
    )
    want = sorted(
        r.doc_id
        for r in dedup_against_corpus(
            arriving, corpus_signatures=sigs
        ).collect()
    )
    assert got == want == [2, 4, 5, 6]
    # batch frame through the same scorer: identical survivors
    got_batch = sorted(
        r.doc_id for r in stream_neardup_screen(arriving, model).collect()
    )
    assert got_batch == want


def test_stream_neardup_screen_tokenfold_matches_batch(spark, tmp_path):
    """The FAST portable family (per-token sha256 + integer rolling
    fold) through both implementations: numpy stream kernel survivors
    == Catalyst batch screen survivors, across micro-batch boundaries
    — the bit-parity contract that lets a 100 TB corpus swap families
    without re-verifying semantics."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        dedup_against_corpus,
        minhash_signatures_tokenfold,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.dedup_stream import (
        collect_lsh_screen_model,
        stream_neardup_screen,
    )

    base_txt = (
        "the quick brown fox jumps over the lazy dog while the calm cat "
        "naps beside the warm stone wall in the quiet afternoon sun"
    )
    corpus = spark.createDataFrame(
        [(100, base_txt), (101, "spark shuffles hash partitions across executors today")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures_tokenfold(corpus)
    model = collect_lsh_screen_model(sigs, hash_family="tokenfold")
    assert model["_family"] == "tokenfold"

    arriving = spark.createDataFrame(
        [
            (1, base_txt.replace("jumps", "leaps")),     # near-dup -> drop
            (2, "completely novel text about harmony"),  # keep
            (3, "spark shuffles hash partitions across executors today"),  # exact -> drop
            (4, "another novel doc with fresh content entirely"),  # keep
            (5, "xy"),                                   # < shingle_n tokens -> keep
            (6, None),                                   # null text -> keep
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "nd_tf_arriving")
    arriving.filter("doc_id <= 3").coalesce(1).write.mode("append").parquet(src)
    arriving.filter("doc_id > 3").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    kept = stream_neardup_screen(stream, model)
    SS.run_to_memory(kept, "neardup_tf_tbl", output_mode="append")
    got = sorted(
        r.doc_id
        for r in spark.sql("SELECT doc_id FROM neardup_tf_tbl").collect()
    )
    want = sorted(
        r.doc_id
        for r in dedup_against_corpus(
            arriving, corpus_signatures=sigs, hash_family="tokenfold"
        ).collect()
    )
    assert got == want == [2, 4, 5, 6]
    got_batch = sorted(
        r.doc_id for r in stream_neardup_screen(arriving, model).collect()
    )
    assert got_batch == want


def test_collect_lsh_screen_model_size_guard(spark):
    """The frozen-model collect must fail fast past max_model_rows,
    naming the foreachBatch join screen as the remediation."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        minhash_signatures_portable,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.dedup_stream import (
        collect_lsh_screen_model,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc number {i} alpha beta gamma delta") for i in range(8)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures_portable(corpus)
    with pytest.raises(ValueError, match="stream_corpus_screen_to_parquet"):
        collect_lsh_screen_model(sigs, max_model_rows=5)
    model = collect_lsh_screen_model(sigs, max_model_rows=8)
    assert model["_nh"] == 16 and model["_bands"] == 4


def test_token_budget_stream_across_batches(spark, tmp_path):
    """Per-key budget admission: the crossing doc is included, later
    docs are rejected, and the admitted-token state PERSISTS across
    micro-batch boundaries (two files forced into two batches)."""
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        token_budget_stream,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.sync_stream import (
        run_to_memory,
    )

    rows = spark.createDataFrame(
        [
            # key a: 40+40 admitted in batch 1 (80 < 100), then the
            # crossing doc 3 (80 < 100 -> admit, cum 120), doc 4 out
            (1, "a", 40), (2, "a", 40), (3, "a", 40), (4, "a", 40),
            # key b: one huge doc crosses immediately; nothing after
            (5, "b", 999), (6, "b", 1),
        ],
        "doc_id long, key string, n_tokens long",
    )
    src = str(tmp_path / "docs")
    # batch 1 = docs 1,2,5; batch 2 = docs 3,4,6
    rows.filter("doc_id in (1,2,5)").coalesce(1).write.mode("append").parquet(src)
    rows.filter("doc_id in (3,4,6)").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, key string, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sm = token_budget_stream(stream, 100, key_col="key")
    run_to_memory(sm, "tb_test_tbl", output_mode="append")
    got = {
        (r.key, r.doc_id): r.cum_tokens
        for r in spark.table("tb_test_tbl").collect()
    }
    assert got == {
        ("a", 1): 40, ("a", 2): 80, ("a", 3): 120,  # crossing included
        ("b", 5): 999,  # crossing included even when one doc overshoots
    }


def test_token_budget_stream_global_key_and_validation(spark, tmp_path):
    """key_col=None = one strict global budget; budget must be > 0."""
    import pytest as _pytest

    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        token_budget_stream,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.sync_stream import (
        run_to_memory,
    )

    rows = spark.createDataFrame(
        [(1, 30), (2, 30), (3, 30), (4, 30)],
        "doc_id long, n_tokens long",
    )
    src = str(tmp_path / "docs")
    rows.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, n_tokens long").parquet(src)
    sm = token_budget_stream(stream, 90, key_col=None)
    run_to_memory(sm, "tb_global_tbl", output_mode="append")
    out = spark.table("tb_global_tbl").collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 3]  # 90 tokens -> 3 docs
    assert all(r.key == "_global" for r in out)
    with _pytest.raises(ValueError, match="budget_tokens"):
        token_budget_stream(stream, 0)


def test_token_budget_two_level_matches_strict_form(spark, tmp_path):
    """token_budget_stream_to_parquet (multi-task range-shuffle
    admission per batch, sink-recovered counter) admits the IDENTICAL
    set as the single-state-task strict form at the same micro-batch
    boundaries — crossing doc included, null rows dropped, nothing
    admitted once the budget is crossed."""
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        token_budget_stream,
        token_budget_stream_to_parquet,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.sync_stream import (
        run_to_memory,
    )

    rows = spark.createDataFrame(
        [(1, 30), (2, 30), (3, None), (4, 25), (5, 30), (6, 10), (7, 10)],
        "doc_id long, n_tokens long",
    )
    src = str(tmp_path / "tl_docs")
    # batch 1 = docs 1,2,3; batch 2 = 4,5; batch 3 = 6,7
    rows.filter("doc_id <= 3").coalesce(1).write.mode("append").parquet(src)
    rows.filter("doc_id in (4,5)").coalesce(1).write.mode("append").parquet(src)
    rows.filter("doc_id >= 6").coalesce(1).write.mode("append").parquet(src)

    def reader():
        return (
            spark.readStream.schema("doc_id long, n_tokens long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # budget 100: admit 30+30 (b1), then 25+30 crossing at 115 (b2),
    # nothing in b3
    sm = token_budget_stream(reader(), 100, key_col=None)
    run_to_memory(sm, "tb_strict_tbl", output_mode="append")
    strict = {
        (r.key, r.doc_id, r.n_tokens, r.cum_tokens)
        for r in spark.table("tb_strict_tbl").collect()
    }

    out = str(tmp_path / "tl_out")
    q = token_budget_stream_to_parquet(
        reader(), 100, out, str(tmp_path / "tl_ckpt")
    )
    q.processAllAvailable()
    q.stop()
    two_level = {
        (r.key, r.doc_id, r.n_tokens, r.cum_tokens)
        for r in spark.read.parquet(out).collect()
    }
    assert two_level == strict
    assert {d for _, d, _, _ in two_level} == {1, 2, 4, 5}
    # recovery sidecar: one totals row per ADMITTING epoch, used_after
    # carried exactly (b1: 60, b2: 115; b3 admitted nothing -> no row)
    totals = {
        (r.epoch_id, r.batch_tokens, r.used_after)
        for r in spark.read.parquet(out + "_totals").collect()
    }
    assert totals == {(0, 60, 60), (1, 55, 115)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget_tokens"):
        token_budget_stream_to_parquet(reader(), 0, out, str(tmp_path / "x"))


def test_stream_components_maintain_matches_batch(spark, tmp_path):
    """N micro-batches of streamed ingest through
    stream_components_maintain_to_parquet produce labels byte-identical
    to the batch recompute over the union: per-epoch pair discovery
    (batch signatures vs stored + batch) finds every pair exactly once,
    and chained components_merge equals full star-CC because saved
    labels are component min-ids. Also covers the seeded form (saved
    nightly state as init_labels/init_signatures)."""
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        connected_components_star,
        minhash_lsh_pairs_portable,
        minhash_signatures_portable,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.dedup_stream import (
        stream_components_maintain_to_parquet,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    # three near-dup families spread ACROSS batches + singletons:
    # ids 0,10,20 share base; 1,11 share base2; 21 joins 1's family in
    # the last batch; 5,15,25 are token-disjoint singletons
    rows = [
        (0, base), (1, base.replace("alpha", "psi")), (5, "a1 b1 c1 d1 e1"),
        (10, base), (11, base.replace("alpha", "psi").replace("beta", "chi")),
        (15, "a2 b2 c2 d2 e2"),
        (20, base.replace("upsilon", "omega")),
        (21, base.replace("alpha", "psi").replace("gamma", "chi")),
        (25, "a3 b3 c3 d3 e3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "cm_docs")
    for lo in (0, 10, 20):  # one file per id-decade = one micro-batch
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "cm_out")
    q = stream_components_maintain_to_parquet(
        stream, out, str(tmp_path / "cm_ckpt"), threshold=0.5
    )
    q.processAllAvailable()
    assert q.exception() is None
    q.stop()
    snaps = spark.read.parquet(out + "/labels")
    last = snaps.agg(F.max("epoch_id")).first()[0]
    got = {
        (r.doc_id, r.component)
        for r in snaps.filter(F.col("epoch_id") == last).collect()
    }
    # batch recompute over the union (collapse/cap change pair LISTS,
    # never connectivity, so the portable screen is the right twin)
    want = {
        (r.doc_id, r.component)
        for r in connected_components_star(
            minhash_lsh_pairs_portable(docs, threshold=0.5), nodes=docs
        ).collect()
    }
    assert got == want
    # streamed state actually merged across batches: every base variant
    # (one-token perturbations chain near-dup) labels to min-id 0, and
    # that family SPANS all three micro-batches
    comp = dict(got)
    assert all(comp[i] == 0 for i in (0, 1, 10, 11, 20))
    assert all(comp[i] == i for i in (5, 15, 21, 25))

    # seeded form: first two batches play the saved nightly state, the
    # third arrives as a stream — same final labels
    old = docs.filter(F.col("doc_id") < 20)
    saved_labels = connected_components_star(
        minhash_lsh_pairs_portable(old, threshold=0.5), nodes=old
    )
    src2 = str(tmp_path / "cm2_docs")
    docs.filter(F.col("doc_id") >= 20).coalesce(1).write.mode(
        "append"
    ).parquet(src2)
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src2)
    )
    out2 = str(tmp_path / "cm2_out")
    q2 = stream_components_maintain_to_parquet(
        stream2,
        out2,
        str(tmp_path / "cm2_ckpt"),
        threshold=0.5,
        init_labels=saved_labels,
        init_signatures=minhash_signatures_portable(old),
    )
    q2.processAllAvailable()
    assert q2.exception() is None
    q2.stop()
    snaps2 = spark.read.parquet(out2 + "/labels")
    last2 = snaps2.agg(F.max("epoch_id")).first()[0]
    got2 = {
        (r.doc_id, r.component)
        for r in snaps2.filter(F.col("epoch_id") == last2).collect()
    }
    assert got2 == want


def test_token_budget_two_level_survives_empty_first_batch(spark, tmp_path):
    """A first micro-batch that admits nothing (all-null token counts)
    must not poison the sink: no _SUCCESS-only directory is written, so
    later epochs recover used=0 and admit normally (the r12 form died
    permanently here — the empty partitioned write broke schema
    inference for every subsequent recovery read)."""
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        token_budget_stream_to_parquet,
    )

    rows = spark.createDataFrame(
        [(1, None), (2, None), (3, 40), (4, 40), (5, 40)],
        "doc_id long, n_tokens long",
    )
    src = str(tmp_path / "eb_docs")
    # batch 1 = all-null rows (admits nothing), batch 2 = 3,4, batch 3 = 5
    rows.filter("doc_id <= 2").coalesce(1).write.mode("append").parquet(src)
    rows.filter("doc_id in (3, 4)").coalesce(1).write.mode("append").parquet(src)
    rows.filter("doc_id = 5").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "eb_out")
    q = token_budget_stream_to_parquet(stream, 100, out, str(tmp_path / "eb_ckpt"))
    q.processAllAvailable()
    assert q.exception() is None
    q.stop()
    got = {(r.doc_id, r.cum_tokens) for r in spark.read.parquet(out).collect()}
    # budget 100: 40 + 40 admitted in b2, doc 5 crosses at 120 in b3
    assert got == {(3, 40), (4, 80), (5, 120)}


def test_token_budget_stream_sorts_across_arrow_chunks(spark, tmp_path):
    """A key whose micro-batch spans multiple Arrow record batches is
    still admitted in global doc_id order (the kernel buffers and
    sorts the whole batch, not each ~10k-row chunk)."""
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.stateful import (
        token_budget_stream,
    )
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.sync_stream import (
        run_to_memory,
    )

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        n = 1000
        rows = spark.range(n).select(
            # descending doc_ids vs range order, single partition so one
            # group spans 10 Arrow chunks in (mostly) reversed id order
            (n - 1 - F.col("id")).alias("doc_id"),
            F.lit(1).cast("long").alias("n_tokens"),
        ).coalesce(1)
        src = str(tmp_path / "chunks")
        rows.write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id long, n_tokens long").parquet(src)
        sm = token_budget_stream(stream, 300, key_col=None)
        run_to_memory(sm, "tb_chunks_tbl", output_mode="append")
        got = sorted(r.doc_id for r in spark.table("tb_chunks_tbl").collect())
        assert got == list(range(300))  # the 300 LOWEST ids, not chunk-local
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
