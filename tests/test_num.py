"""Numeric expressions vs numpy/math ground truth (mirrors reference
tests/test_many.py strategy: compare against independent impls)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.functions import num as N


def _one(spark, col, **kw):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_gamma_digamma(spark):
    for x in [0.5, 1.0, 2.5, 5.5, 9.9]:
        got = _one(spark, N.gamma(F.lit(x)))
        assert got == pytest.approx(math.gamma(x), rel=1e-10)
    # digamma reference values (Abramowitz & Stegun)
    refs = {1.0: -0.5772156649015329, 2.0: 0.42278433509846713,
            5.0: 1.5061176684318003, 0.5: -1.9635100260214235}
    for x, want in refs.items():
        got = _one(spark, N.digamma(F.lit(x)))
        assert got == pytest.approx(want, rel=1e-9)


def test_gcd_lcm_vectors(spark):
    df = spark.range(1, 500).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 360 + 1).alias("b")
    )
    rows = df.select("a", "b", N.gcd("a", "b").alias("g"), N.lcm("a", "b").alias("l")).collect()
    for r in rows:
        assert r["g"] == math.gcd(r["a"], r["b"])
        assert r["l"] == math.lcm(r["a"], r["b"])


def test_elementwise(spark):
    x = 0.3
    assert _one(spark, N.expit(F.lit(x))) == pytest.approx(1 / (1 + math.exp(-x)))
    assert _one(spark, N.logit(F.lit(x))) == pytest.approx(math.log(x / (1 - x)))
    assert _one(spark, N.sinc(F.lit(x))) == pytest.approx(np.sinc(x))
    assert _one(spark, N.exp2(F.lit(x))) == pytest.approx(2 ** x)
    assert _one(spark, N.fract(F.lit(3.75))) == pytest.approx(0.75)
    assert _one(spark, N.trunc(F.lit(-3.75))) == -3.0
    assert _one(spark, N.xlogy(F.lit(0.0), F.lit(0.0))) == 0.0


def test_haversine_known(spark):
    # JFK (40.6413, -73.7781) to LHR (51.47, -0.4543) ≈ 5540 km
    got = _one(spark, N.haversine(F.lit(40.6413), F.lit(-73.7781),
                                  F.lit(51.47), F.lit(-0.4543)))
    assert got == pytest.approx(5540, abs=20)


def test_softmax_sums_to_one(spark, sf_dir):
    from polars_ds_extension_spark.sources import load_table
    cu = load_table(spark, sf_dir, "customer")
    s = cu.select(F.col("c_nationkey"), N.softmax("c_acctbal", by=["c_nationkey"]).alias("p"))
    sums = s.groupBy("c_nationkey").agg(F.sum("p").alias("t")).collect()
    for r in sums:
        assert r["t"] == pytest.approx(1.0, rel=1e-9)


def test_horizontal(spark):
    row = spark.range(1).select(
        N.l1_horizontal(F.lit(-1.0), F.lit(2.0), F.lit(-3.0)).alias("l1"),
        N.l2_sq_horizontal(F.lit(1.0), F.lit(2.0)).alias("l2"),
        N.l_inf_horizontal(F.lit(-5.0), F.lit(2.0)).alias("linf"),
    ).first()
    assert row["l1"] == 6.0 and row["l2"] == 5.0 and row["linf"] == 5.0


def test_array_ops(spark):
    df = spark.range(1).select(
        F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("a"),
        F.array(F.lit(4.0), F.lit(5.0), F.lit(6.0)).alias("b"),
    )
    row = df.select(
        N.arr_dot("a", "b").alias("dot"),
        N.arr_l1_dist("a", "b").alias("l1"),
        N.arr_sql2_dist("a", "b").alias("l2"),
        N.jaccard_row("a", "b").alias("jac"),
        N.list_amax("a").alias("amax"),
    ).first()
    assert row["dot"] == 32.0
    assert row["l1"] == 9.0
    assert row["l2"] == 27.0
    assert row["jac"] == 0.0
    assert row["amax"] == 3.0


def test_detrend_removes_trend(spark):
    import pandas as pd

    pdf = pd.DataFrame({"i": range(100), "x": [2.5 * i + 7 for i in range(100)]})
    df = spark.createDataFrame(pdf)
    out = N.detrend(df, "x", "i").select("detrended").toPandas()
    assert np.abs(out["detrended"]).max() < 1e-8


def test_combinations_df_matches_itertools(spark):
    import itertools
    from polars_ds_extension_spark.functions.iters import combinations_df
    vals = [5, 1, 3, 3, 9]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = sorted(tuple(r) for r in
                 combinations_df(df, "x", k=3).collect())
    exp = sorted(tuple(sorted(c)) for c in itertools.combinations(vals, 3))
    assert got == exp
    got2 = sorted(tuple(r) for r in
                  combinations_df(df, "x", k=2, unique=True).collect())
    exp2 = sorted(itertools.combinations(sorted(set(vals)), 2))
    assert got2 == exp2


def test_product_df(spark):
    from polars_ds_extension_spark.functions.iters import product_df
    df = spark.createDataFrame([(1, 4), (2, 5), (None, 6)], ["a", "b"])
    got = sorted(tuple(r) for r in product_df(df, "a", "b").collect())
    assert got == sorted((x, y) for x in (1, 2) for y in (4, 5, 6))
