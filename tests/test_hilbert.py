"""Hilbert clustering key: reference parity, bijectivity, adjacency."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions.hilbert import (
    hilbert_layout,
)


def _xy2d(order: int, x: int, y: int) -> int:
    # the standard public-domain formulation, as in the module docstring
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_and_is_a_space_filling_curve(spark):
    bits, n = 3, 8  # 8x8 grid, 64 cells
    cells = [(float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "u double, v double")
    # bounds [0, n): quantize_to_bits maps x -> x exactly on integers
    out = hilbert_layout(
        df, {"u": (0.0, float(n)), "v": (0.0, float(n))}, bits=bits
    ).collect()
    got = {(int(r["u"]), int(r["v"])): r["h_key"] for r in out}
    want = {(x, y): _xy2d(n, x, y) for x in range(n) for y in range(n)}
    assert got == want
    # bijective onto [0, 64)
    assert sorted(got.values()) == list(range(n * n))
    # the Hilbert property z-order lacks: consecutive indices are GRID
    # NEIGHBORS (|dx|+|dy| == 1) — no diagonal jumps, ever
    by_d = sorted(got.items(), key=lambda kv: kv[1])
    for ((x1, y1), _), ((x2, y2), _) in zip(by_d, by_d[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1, ((x1, y1), (x2, y2))


def test_hilbert_key_range_and_determinism_at_real_bits(spark):
    df = spark.range(2000).select(
        (F.col("id") % 997).cast("double").alias("a"),
        ((F.col("id") * 37) % 511).cast("double").alias("b"),
    )
    out = hilbert_layout(
        df, {"a": (0.0, 997.0), "b": (0.0, 511.0)}, bits=12
    )
    rows = out.collect()
    assert all(0 <= r["h_key"] < 4**12 for r in rows)
    again = {
        (r["a"], r["b"]): r["h_key"]
        for r in hilbert_layout(
            df.repartition(7), {"a": (0.0, 997.0), "b": (0.0, 511.0)}, bits=12
        ).collect()
    }
    assert again == {(r["a"], r["b"]): r["h_key"] for r in rows}
