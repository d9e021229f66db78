"""Association statistics (plans/assoc.py) — known-answer fixtures the
oracle twins can't provide: independence => chi2 ~ 0 and MI ~ 0,
perfect dependence => Cramér's V = 1 and MI = min entropy, Benford
digit extraction on hand-computable values."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import (
    benford_audit,
    chi_square,
    mutual_information,
)


def _pairs(spark, rows):
    return spark.createDataFrame([Row(a=a, b=b) for a, b in rows])


def test_chi_square_independent_is_zero(spark):
    # perfectly balanced 2x2 grid: observed == expected everywhere
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(10)]
    got = chi_square(_pairs(spark, rows), "a", "b").collect()[0]
    assert got.n == 40
    assert got.dof == 1
    assert got.chi2 == pytest.approx(0.0, abs=1e-9)
    assert got.cramers_v == pytest.approx(0.0, abs=1e-9)


def test_chi_square_perfect_association(spark):
    # a determines b completely: V = 1, chi2 = n * min(r-1, c-1)
    rows = [("x", "u")] * 7 + [("y", "v")] * 13
    got = chi_square(_pairs(spark, rows), "a", "b").collect()[0]
    assert got.chi2 == pytest.approx(20.0, abs=1e-6)
    assert got.cramers_v == pytest.approx(1.0, abs=1e-6)


def test_mutual_information_known_values(spark):
    # independent -> mi 0; dependent -> mi = H(a) = H(b) = ln 2
    ind = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    got = mutual_information(_pairs(spark, ind), "a", "b").collect()[0]
    assert got.mi == pytest.approx(0.0, abs=1e-9)
    assert got.h_a == pytest.approx(math.log(2), abs=1e-6)

    dep = [("x", "u")] * 10 + [("y", "v")] * 10
    got = mutual_information(_pairs(spark, dep), "a", "b").collect()[0]
    assert got.mi == pytest.approx(math.log(2), abs=1e-6)
    assert got.h_ab == pytest.approx(math.log(2), abs=1e-6)


def test_mi_nulls_excluded(spark):
    df = spark.createDataFrame(
        [Row(a="x", b="u"), Row(a=None, b="u"), Row(a="x", b=None)]
    )
    got = mutual_information(df, "a", "b").collect()[0]
    assert got.n == 1


def test_benford_digit_extraction(spark):
    # two-decimal doubles whose leading digits are known by hand;
    # zero/negative/null rows are excluded
    vals = [123.45, 19.99, 100.00, 999.99, 2.50, 0.0, -5.0, None]
    df = spark.createDataFrame([Row(x=v) for v in vals])
    rows = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert len(rows) == 9
    n_by_digit = {d: rows[d].n_d for d in rows}
    assert n_by_digit[1] == 3  # 123.45, 19.99, 100.00
    assert n_by_digit[9] == 1
    assert n_by_digit[2] == 1
    assert sum(n_by_digit.values()) == 5
    # expected fractions are Benford's law
    assert rows[1].exp_frac == pytest.approx(math.log10(2), abs=1e-6)
    assert rows[9].exp_frac == pytest.approx(math.log10(10 / 9), abs=1e-6)


def test_benford_sub_one_values(spark):
    # 0 < x < 1: scale=100 turns 0.07 into integer 7 -> digit 7
    df = spark.createDataFrame([Row(x=0.07), Row(x=0.93)])
    rows = {r.digit: r.n_d for r in benford_audit(df, "x").collect()}
    assert rows[7] == 1 and rows[9] == 1


def test_welch_t_test_known_values(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import (
        welch_t_test,
    )

    rows = [Row(g="a", v=float(v)) for v in [1, 2, 3, 4, 5]]
    rows += [Row(g="b", v=float(v)) for v in [2, 4, 6, 8, 10, 12]]
    rows += [Row(g="c", v=99.0)]  # other groups ignored
    r = welch_t_test(
        spark.createDataFrame(rows), "g", "v", "a", "b"
    ).collect()[0]
    assert (r.n_a, r.n_b) == (5, 6)
    assert r.mean_a == pytest.approx(3.0) and r.mean_b == pytest.approx(7.0)
    # hand-computed Welch: se = sqrt(2.5/5 + 14/6), t = -4/se
    se = math.sqrt(2.5 / 5 + 14.0 / 6)
    assert r.t_stat == pytest.approx(-4.0 / se, abs=1e-6)
    num = (2.5 / 5 + 14.0 / 6) ** 2
    den = (2.5 / 5) ** 2 / 4 + (14.0 / 6) ** 2 / 5
    assert r.dof == pytest.approx(num / den, abs=1e-5)


def test_welch_degenerate_groups_null(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import (
        welch_t_test,
    )

    rows = [Row(g="a", v=1.0), Row(g="b", v=2.0)]  # single-row groups
    r = welch_t_test(
        spark.createDataFrame(rows), "g", "v", "a", "b"
    ).collect()[0]
    assert r.t_stat is None and r.dof is None


def test_anova_f_known_value(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import anova_f

    # three groups with means 0/1/2, equal within-variance; scipy-free
    # hand computation: SSB = 4*((0-1)^2 + 0 + (2-1)^2) = 8,
    # SSW = sum (n_g-1)*var_g = 3 * 3 * var([−.3,−.1,.1,.3]) = 9*0.0667
    base = [-0.3, -0.1, 0.1, 0.3]
    rows = []
    for gi, mean in enumerate([0.0, 1.0, 2.0]):
        rows += [Row(g=f"g{gi}", v=mean + b) for b in base]
    r = anova_f(spark.createDataFrame(rows), "g", "v").collect()[0]
    assert (r.k, r.n, r.df_between, r.df_within) == (3, 12, 2, 9)
    ssb = 4 * (1.0 + 0.0 + 1.0)
    var_g = sum(b * b for b in base) / 3  # sample var of base
    ssw = 3 * 3 * var_g
    want = (ssb / 2) / (ssw / 9)
    assert r.f_stat == pytest.approx(want, abs=1e-5)


def test_anova_f_identical_groups_zero(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import anova_f

    rows = [Row(g=g, v=float(v)) for g in "ab" for v in [1, 2, 3]]
    r = anova_f(spark.createDataFrame(rows), "g", "v").collect()[0]
    assert r.f_stat == pytest.approx(0.0, abs=1e-9)


def test_anova_f_degenerate_null(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import anova_f

    # one group only -> k < 2 -> NULL
    rows = [Row(g="a", v=float(v)) for v in [1, 2, 3]]
    r = anova_f(spark.createDataFrame(rows), "g", "v").collect()[0]
    assert r.f_stat is None


def test_ks_identical_samples_zero(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import ks_test

    rows = [Row(g=g, v=float(v)) for g in "ab" for v in [1, 2, 3, 4, 5]]
    r = ks_test(spark.createDataFrame(rows), "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (5, 5)
    assert r.ks_stat == pytest.approx(0.0, abs=1e-9)


def test_ks_disjoint_samples_one(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import ks_test

    rows = [Row(g="a", v=float(v)) for v in [1, 2, 3]]
    rows += [Row(g="b", v=float(v)) for v in [10, 11, 12]]
    r = ks_test(spark.createDataFrame(rows), "g", "v", "a", "b").collect()[0]
    assert r.ks_stat == pytest.approx(1.0, abs=1e-9)


def test_ks_known_shift(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import ks_test

    # a = {1..4}, b = {3..6}: max ECDF gap at v=2 -> |2/4 - 0/4| = 0.5
    rows = [Row(g="a", v=float(v)) for v in [1, 2, 3, 4]]
    rows += [Row(g="b", v=float(v)) for v in [3, 4, 5, 6]]
    r = ks_test(spark.createDataFrame(rows), "g", "v", "a", "b").collect()[0]
    assert r.ks_stat == pytest.approx(0.5, abs=1e-9)


def test_mann_whitney_textbook_values(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import (
        mann_whitney_u,
    )

    # disjoint: U_a = 0, z = -4.5/sqrt(9*7/12)
    rows = [Row(g="a", v=float(v)) for v in [1, 2, 3]]
    rows += [Row(g="b", v=float(v)) for v in [4, 5, 6]]
    r = mann_whitney_u(
        spark.createDataFrame(rows), "g", "v", "a", "b"
    ).collect()[0]
    assert r.u_stat == pytest.approx(0.0)
    assert r.z_stat == pytest.approx(-4.5 / math.sqrt(9 * 7 / 12), abs=1e-5)

    # with ties: midranks give R_a = 7 -> U = 1; tie-corrected var
    rows = [Row(g="a", v=float(v)) for v in [1, 2, 2]]
    rows += [Row(g="b", v=float(v)) for v in [2, 3, 4]]
    r = mann_whitney_u(
        spark.createDataFrame(rows), "g", "v", "a", "b"
    ).collect()[0]
    assert r.u_stat == pytest.approx(1.0)
    var = 9 / 12 * (7 - 24 / 30)
    assert r.z_stat == pytest.approx(-3.5 / math.sqrt(var), abs=1e-5)


def test_mann_whitney_symmetric(spark):
    from multi_sensor_data_pipeline_for_robotics__spark.plans.assoc import (
        mann_whitney_u,
    )

    # identical samples: U = na*nb/2, z = 0... but all-tied values make
    # the variance collapse to 0 -> NULL z (documented guard)
    rows = [Row(g=g, v=1.0) for g in "ab" for _ in range(3)]
    r = mann_whitney_u(
        spark.createDataFrame(rows), "g", "v", "a", "b"
    ).collect()[0]
    assert r.u_stat == pytest.approx(4.5)
    assert r.z_stat is None
