"""Z-order clustering keys + Bloom-filter semi-join reduction."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions import bloom as B
from multi_sensor_data_pipeline_for_robotics__spark.functions import zorder as Z
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table


def test_zorder_layout_prunes_blocks_on_both_dimensions(spark):
    """The point of the layout, measured as min/max block pruning (the
    mechanism parquet row-group skipping actually uses): group the
    sorted table into 128-row blocks, keep each block's [min, max] per
    column, and count blocks a range predicate must read. The x-sorted
    layout prunes x-predicates perfectly but reads EVERY block for a
    y-predicate; the z-sorted layout prunes BOTH dimensions well."""
    from pyspark.sql import Window as W

    n, bits = 1 << 14, 7
    df = spark.range(n).select(
        F.abs(F.hash(F.col("id").cast("string"), F.lit(1)) % (1 << bits)).alias("x"),
        F.abs(F.hash(F.col("id").cast("string"), F.lit(2)) % (1 << bits)).alias("y"),
    )
    zk = Z.zorder_key([F.col("x"), F.col("y")], bits=bits)

    def blocks_touched(order_cols, col, lo, hi):
        blk = (
            (F.row_number().over(W.orderBy(*order_cols)) - 1) / 128
        ).cast("long").alias("blk")
        stats = (
            df.withColumn("blk", blk)
            .groupBy("blk")
            .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
        )
        total = stats.count()
        touched = stats.filter(
            (F.col("mx") >= lo) & (F.col("mn") <= hi)
        ).count()
        return touched, total

    # predicate: a 1/8-of-domain stripe on y (the column x-sort ignores)
    y_lo, y_hi = 0, (1 << bits) // 8 - 1
    tx, total = blocks_touched(["x", "y"], "y", y_lo, y_hi)
    tz, _ = blocks_touched([zk], "y", y_lo, y_hi)
    print(f"y-stripe blocks touched: x-sort={tx}/{total} z-sort={tz}/{total}")
    assert tx == total          # x-sort cannot prune a y predicate
    assert tz <= total / 4      # z-sort reads a small fraction

    # and the z-layout still prunes x predicates too
    tzx, _ = blocks_touched([zk], "x", y_lo, y_hi)
    assert tzx <= total / 4


def test_zorder_key_bit_interleave_exact(spark):
    """Hand-computed Morton codes for known coordinates."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "x long, y long"
    )
    got = [
        r[0]
        for r in df.select(
            Z.zorder_key([F.col("x"), F.col("y")], bits=3)
        ).collect()
    ]
    # interleave(x,y): bit b of x -> 2b, bit b of y -> 2b+1
    def morton(x, y):
        out = 0
        for b in range(3):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    assert got == [morton(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)]]


def test_bloom_reduction_preserves_join_and_is_selective(spark, sf_dir):
    """The reduced join equals the unfiltered join row-for-row (false
    positives are dropped by the real join), and the filter actually
    prunes: kept fraction stays near the true fraction + the ~1%
    designed false-positive rate."""
    li = load_table(spark, sf_dir, "lineitem")
    od = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    red = B.bloom_semi_filter(li, od, "l_orderkey", "o_orderkey")
    n_all, n_red = li.count(), red.count()
    n_true = li.join(od, li.l_orderkey == od.o_orderkey, "left_semi").count()
    assert n_true <= n_red  # no false negatives, ever
    # false positives bounded: <= 5% of the non-matching rows
    assert (n_red - n_true) <= 0.05 * (n_all - n_true)
    assert n_red < 0.5 * n_all  # genuinely selective on this data

    plain = li.join(od, li.l_orderkey == od.o_orderkey).count()
    reduced = red.join(od, red.l_orderkey == od.o_orderkey).count()
    assert plain == reduced


def test_bloom_empty_small_side(spark, sf_dir):
    """An empty build side yields an all-zero bitmap that keeps
    nothing."""
    li = load_table(spark, sf_dir, "lineitem")
    empty = li.select(F.col("l_orderkey")).limit(0)
    assert B.bloom_semi_filter(li, empty, "l_orderkey").count() == 0


def test_bloom_probe_hash_fn_matches_build(spark):
    """bloom_might_contain must probe with the SAME hash family the
    bitmap was built with — an xxhash64 bitmap probed via md5 positions
    yields silent false negatives. Every inserted key must test True
    under both families when build and probe agree."""
    keys = spark.range(200).select((F.col("id") * 7).alias("k"))
    probe = spark.range(200).select((F.col("id") * 7).alias("k"))
    for fn in ("md5", "xxhash64"):
        bm = B.bloom_build(keys, "k", k=4, m_bits=14, hash_fn=fn)
        hits = probe.filter(
            B.bloom_might_contain(F.col("k"), bm, k=4, m_bits=14, hash_fn=fn)
        ).count()
        assert hits == 200, fn  # no false negatives, ever


# ---------------------------------------------------------------------------
# pruning_report
# ---------------------------------------------------------------------------
def test_pruning_report_sorted_vs_shuffled(spark):
    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.plans.layout import (
        pruning_report,
    )

    n, g = 10_000, 100
    df = spark.range(n).select(
        F.col("id"),
        F.col("id").cast("double").alias("v"),
        (F.abs(F.hash(F.col("id").cast("string"))) % 1_000_000)
        .cast("double")
        .alias("r"),
    )
    # layout = id order: v is perfectly clustered, r is shuffled
    rep = {
        r["column"]: r
        for r in pruning_report(
            df, "id", "id", ["v", "r"], rows_per_group=n // g
        ).collect()
    }
    assert rep["v"]["n_groups"] == g
    # perfectly clustered: avg span ~ ideal (each group covers 1/g of
    # the range); allow quantization slack
    assert rep["v"]["avg_span_frac"] < 2.0 / g
    # shuffled: every group spans ~the whole range
    assert rep["r"]["avg_span_frac"] > 0.9


def test_pruning_report_validates(spark):
    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.plans.layout import (
        pruning_report,
    )

    df = spark.range(5).select(F.col("id"), F.col("id").alias("v"))
    import pytest as _pt

    with _pt.raises(ValueError):
        pruning_report(df, "id", "id", ["v"], rows_per_group=0)


def test_plan_compaction_arithmetic():
    from multi_sensor_data_pipeline_for_robotics__spark.plans.layout import (
        plan_compaction,
    )

    p = plan_compaction(n_rows=1_000_000, total_bytes=10 * 128 * 1024 * 1024)
    assert p["n_files"] == 10 and p["rows_per_file"] == 100_000
    assert p["est_file_mb"] == 128.0
    # cap respected
    p = plan_compaction(1_000_000, 10 * 128 * 1024 * 1024, max_files=4)
    assert p["n_files"] == 4
    # tiny table -> one file
    assert plan_compaction(10, 100)["n_files"] == 1
    import pytest as _pt

    with _pt.raises(ValueError):
        plan_compaction(1, 1, target_file_mb=0)


def test_write_clustered_parquet_roundtrip_and_ranges(spark, tmp_path):
    from pyspark.sql import functions as F

    from multi_sensor_data_pipeline_for_robotics__spark.plans.layout import (
        write_clustered_parquet,
    )

    df = spark.range(10_000).select(
        F.col("id"),
        (F.abs(F.hash(F.col("id").cast("string"))) % 1000).alias("k"),
    )
    path = str(tmp_path / "clustered")
    write_clustered_parquet(df, path, ["k", "id"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.exceptAll(df).count() == 0
    # each file covers a contiguous, non-overlapping k range
    import os

    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 8
    ranges = []
    for f in files:
        s = spark.read.parquet(os.path.join(path, f)).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi")
        ).first()
        ranges.append((s["lo"], s["hi"]))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert l2 >= h1  # ranges ascend; overlap only at boundary keys
