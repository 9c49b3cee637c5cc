"""Time-series features vs numpy ground truth."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.functions import ts as TS

RNG = np.random.default_rng(3)
V = RNG.normal(100, 25, 300)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(pd.DataFrame({"i": range(len(V)), "v": V}))


def test_agg_features(spark, df):
    row = df.agg(
        TS.query_mid_range("v").alias("mr"),
        TS.query_abs_energy("v").alias("ae"),
        TS.query_cv("v").alias("cv"),
        TS.query_range_count("v", 80, 120).alias("rc"),
        TS.query_mean_n_abs_max("v", 5).alias("m5"),
        TS.query_symm_ratio("v").alias("sr"),
    ).first()
    assert row["mr"] == pytest.approx((V.max() - V.min()) / 2, rel=1e-9)
    assert row["ae"] == pytest.approx(float((V ** 2).sum()), rel=1e-9)
    assert row["cv"] == pytest.approx(V.std(ddof=1) / V.mean(), rel=1e-9)
    assert row["rc"] == int(((V >= 80) & (V <= 120)).sum())
    assert row["m5"] == pytest.approx(
        float(np.sort(np.abs(V))[-5:].mean()), rel=1e-9)
    assert row["sr"] == pytest.approx(
        abs(V.mean() - np.median(V)) / (V.max() - V.min()), rel=1e-9)


def test_ordered_features(spark, df):
    mac = TS.query_mean_abs_change(df, "v", "i").first()["mean_abs_change"]
    assert mac == pytest.approx(float(np.abs(np.diff(V)).mean()), rel=1e-9)

    c3 = TS.query_c3_stats(df, "v", 2, "i").first()["c3"]
    want = float((V[4:] * V[2:-2] * V[:-4]).sum() / (len(V) - 4))
    assert c3 == pytest.approx(want, rel=1e-9)

    cid = TS.query_cid_ce(df, "v", "i").first()["cid_ce"]
    assert cid == pytest.approx(float(np.sqrt((np.diff(V) ** 2).sum())), rel=1e-9)

    ac = TS.query_auto_corr(df, "v", 1, "i", ddof=0).first()["auto_corr"]
    xm = V - V.mean()
    want_ac = float((xm[:-1] * xm[1:]).sum() / ((len(V) - 1) * V.var()))
    assert ac == pytest.approx(want_ac, rel=1e-9)


def test_streaks(spark):
    seq = [1, 1, 0, 1, 1, 1, 0, 0, 1]
    pdf = pd.DataFrame({"i": range(len(seq)), "c": [bool(s) for s in seq]})
    sdf = spark.createDataFrame(pdf)
    longest = TS.query_longest_streak(sdf, "c", "i").first()["longest_streak"]
    avg = TS.query_avg_streak(sdf, "c", "i").first()["avg_streak"]
    assert longest == 3
    assert avg == pytest.approx((2 + 3 + 1) / 3)
    per_row = TS.query_streak(sdf, "c", "i").orderBy("i").select("streak").toPandas()
    assert per_row["streak"].tolist() == [1, 2, 1, 1, 2, 3, 1, 2, 1]


def test_entropy(spark):
    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    sdf = spark.createDataFrame(pd.DataFrame({"x": vals, "y": [v == "a" for v in vals]}))
    got = TS.query_entropy(sdf, "x").first()["entropy"]
    p = np.array([0.5, 0.3, 0.2])
    assert got == pytest.approx(float(-(p * np.log(p)).sum()), rel=1e-9)

    # H(x|y): y == (x=='a') → within y=True, x is constant → contributes 0;
    # within y=False: p(b)=0.6, p(c)=0.4 over half the mass
    got_c = TS.query_cond_entropy(sdf, "x", "y").first()["cond_entropy"]
    want = 0.5 * -(0.6 * np.log(0.6) + 0.4 * np.log(0.4))
    assert got_c == pytest.approx(float(want), rel=1e-9)


def test_benford_first_digit(spark):
    vals = [1.5, 19.0, 2.3, 0.031, 95.0, 111.0, 3.7, 1.01, 0.92]
    sdf = spark.createDataFrame(pd.DataFrame({"x": vals}))
    cnts = sdf.agg(TS.query_first_digit_cnt("x").alias("c")).first()["c"]
    # first digits: 1,1,2,3,9,1,3,1,9
    assert list(cnts) == [4, 1, 2, 0, 0, 0, 0, 0, 2]


def test_count_uniques(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"x": [1, 1, 2, 3, 3, 4]}))
    got = TS.query_count_uniques(sdf, "x").first()["n_unique"]
    assert got == 2  # 2 and 4 appear exactly once
