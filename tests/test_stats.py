"""Stats vs numpy ground truth (reference strategy: tests/test_many.py
compares against scipy; scipy is unavailable here so expected values are
computed with numpy formulas or hardcoded from published tables)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.functions import stats as S

RNG = np.random.default_rng(42)
X = RNG.normal(10, 3, 500)
Y = X * 0.5 + RNG.normal(0, 1, 500)
W = RNG.uniform(0.1, 2.0, 500)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(pd.DataFrame({"x": X, "y": Y, "w": W}))


def test_weighted_moments(spark, df):
    row = df.agg(
        S.weighted_mean("x", "w").alias("wm"),
        S.weighted_var("x", "w").alias("wv"),
        S.weighted_cov("x", "y", "w").alias("wc"),
        S.weighted_corr("x", "y", "w").alias("wr"),
    ).first()
    wm = np.average(X, weights=W)
    wv = np.average((X - wm) ** 2, weights=W)
    my = np.average(Y, weights=W)
    wc = np.average((X - wm) * (Y - my), weights=W)
    wvy = np.average((Y - my) ** 2, weights=W)
    assert row["wm"] == pytest.approx(wm, rel=1e-9)
    assert row["wv"] == pytest.approx(wv, rel=1e-9)
    assert row["wc"] == pytest.approx(wc, rel=1e-9)
    assert row["wr"] == pytest.approx(wc / math.sqrt(wv * wvy), rel=1e-9)


def test_means(spark, df):
    row = df.agg(
        S.hmean("x").alias("h"), S.gmean("x").alias("g"),
        S.cosine_sim("x", "y").alias("c"),
    ).first()
    assert row["h"] == pytest.approx(len(X) / np.sum(1 / X), rel=1e-9)
    assert row["g"] == pytest.approx(float(np.exp(np.mean(np.log(X)))), rel=1e-9)
    assert row["c"] == pytest.approx(
        float(np.dot(X, Y) / np.sqrt(np.dot(X, X) * np.dot(Y, Y))), rel=1e-9
    )


def test_ttest_stats(spark, df):
    row = df.agg(
        S.ttest_1samp_stat("x", 10.0).alias("t1"),
        S.ttest_ind_stat("x", "y", equal_var=False).alias("tw"),
        S.ttest_ind_stat("x", "y", equal_var=True).alias("ts"),
    ).first()
    n = len(X)
    t1 = (X.mean() - 10.0) / (X.std(ddof=1) / math.sqrt(n))
    vx, vy = X.var(ddof=1), Y.var(ddof=1)
    tw = (X.mean() - Y.mean()) / math.sqrt(vx / n + vy / n)
    sp = ((n - 1) * vx + (n - 1) * vy) / (2 * n - 2)
    ts = (X.mean() - Y.mean()) / math.sqrt(sp * 2 / n)
    assert row["t1"] == pytest.approx(t1, rel=1e-9)
    assert row["tw"] == pytest.approx(tw, rel=1e-9)
    assert row["ts"] == pytest.approx(ts, rel=1e-9)


def _normaltest_numpy(x: np.ndarray) -> tuple[float, float]:
    """Independent numpy impl of D'Agostino-Pearson K² (the formulas scipy
    implements: D'Agostino 1970 skewtest + Anscombe-Glynn 1983 kurtosistest)."""
    n = float(len(x))
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    b1 = ((x - m) ** 3).mean() / m2 ** 1.5
    b2 = ((x - m) ** 4).mean() / m2 ** 2
    # skewtest
    yy = b1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = 3 * (n ** 2 + 27 * n - 70) * (n + 1) * (n + 3) / (
        (n - 2) * (n + 5) * (n + 7) * (n + 9))
    w2 = -1 + math.sqrt(2 * (beta2 - 1))
    delta = 1 / math.sqrt(0.5 * math.log(w2))
    alpha = math.sqrt(2 / (w2 - 1))
    zs = delta * math.log(yy / alpha + math.sqrt((yy / alpha) ** 2 + 1))
    # kurtosistest
    e = 3 * (n - 1) / (n + 1)
    var_b2 = 24 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    xk = (b2 - e) / math.sqrt(var_b2)
    sqrt_b1 = 6 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9)) * math.sqrt(
        6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    a = 6 + 8 / sqrt_b1 * (2 / sqrt_b1 + math.sqrt(1 + 4 / sqrt_b1 ** 2))
    term = (1 - 2 / a) / (1 + xk * math.sqrt(2 / (a - 4)))
    zk = ((1 - 2 / (9 * a)) - np.sign(term) * abs(term) ** (1 / 3)) / math.sqrt(2 / (9 * a))
    k2 = zs * zs + zk * zk
    return k2, math.exp(-k2 / 2)


def test_normal_test_matches_published_formulas(spark):
    data = np.array([float(v) for v in range(1, 21)] + [100.0])
    want_k2, want_p = _normaltest_numpy(data)
    sdf = spark.createDataFrame(pd.DataFrame({"x": data}))
    row = sdf.agg(S.normal_test("x").alias("nt")).first()["nt"]
    assert row["statistic"] == pytest.approx(want_k2, rel=1e-9)
    assert row["pvalue"] == pytest.approx(want_p, rel=1e-6)


def test_corr_methods(spark, df):
    p = S.corr(df, "x", "y", method="pearson").first()["corr"]
    assert p == pytest.approx(float(np.corrcoef(X, Y)[0, 1]), rel=1e-9)
    sp = S.corr(df, "x", "y", method="spearman").first()["corr"]
    rx = pd.Series(X).rank().values
    ry = pd.Series(Y).rank().values
    assert sp == pytest.approx(float(np.corrcoef(rx, ry)[0, 1]), rel=1e-9)
    kt = S.corr(df, "x", "y", method="kendall").first()["corr"]

    # brute-force O(n^2) tau-b reference (pandas' kendall needs scipy)
    def _tau_brute(x, y):
        n = len(x)
        con = dis = xtie = ytie = 0
        for i in range(n):
            dx = np.sign(x[i] - x[i + 1:])
            dy = np.sign(y[i] - y[i + 1:])
            con += int(np.sum((dx != 0) & (dx == dy)))
            dis += int(np.sum((dx != 0) & (dy != 0) & (dx != dy)))
            xtie += int(np.sum(dx == 0))
            ytie += int(np.sum(dy == 0))
        tot = n * (n - 1) // 2
        return (con - dis) / np.sqrt(float(tot - xtie)) / np.sqrt(float(tot - ytie))

    assert kt == pytest.approx(_tau_brute(np.asarray(X, float), np.asarray(Y, float)), rel=1e-9)


def test_ks_mann_whitney(spark):
    a = RNG.normal(0, 1, 300)
    b = RNG.normal(0.5, 1, 200)
    pdf = pd.DataFrame({
        "v": np.concatenate([a, b]),
        "g": ["a"] * 300 + ["b"] * 200,
    })
    sdf = spark.createDataFrame(pdf)
    ks = S.ks_2samp(sdf, "v", "g").first()["statistic"]
    # manual two-sample KS
    allv = np.sort(pdf["v"].values)
    ca = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    cb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    assert ks == pytest.approx(float(np.max(np.abs(ca - cb))), rel=1e-9)

    mw = S.mann_whitney_u(sdf, "v", "g").first()
    ranks = pd.Series(pdf["v"]).rank().values
    r1 = ranks[:300].sum()
    u1 = r1 - 300 * 301 / 2
    u2 = 300 * 200 - u1
    assert mw["u1"] == pytest.approx(u1)
    assert mw["u2"] == pytest.approx(u2)


def test_random_generators(spark):
    df = spark.range(20000)
    row = df.select(
        S.random(5, 10, seed=1).alias("u"),
        S.random_int(0, 10, seed=2).alias("i"),
        S.random_normal(3, 2, seed=3).alias("n"),
        S.random_exp(0.5, seed=4).alias("e"),
        S.random_str(3, 6, seed=5).alias("s"),
    )
    pdf = row.toPandas()
    assert pdf["u"].between(5, 10).all()
    assert pdf["i"].between(0, 9).all()
    assert pdf["n"].mean() == pytest.approx(3, abs=0.1)
    assert pdf["e"].mean() == pytest.approx(2.0, abs=0.15)
    assert pdf["s"].str.len().between(3, 6).all()
    assert pdf["s"].str.match(r"^[a-zA-Z0-9]+$").all()


def test_winsorize(spark, df):
    out = df.select(S.winsorize("x", 0.05, 0.95).alias("w")).toPandas()["w"]
    lo, hi = np.percentile(X, [5, 95], method="linear")
    assert out.min() == pytest.approx(lo, rel=1e-9)
    assert out.max() == pytest.approx(hi, rel=1e-9)


def test_pvalues_present_and_sane(spark):
    rng = np.random.default_rng(9)
    a = rng.normal(0, 1, 300)
    b = rng.normal(0, 1, 300)  # same distribution → non-significant
    pdf = pd.DataFrame({"v": np.concatenate([a, b]),
                        "g": ["a"] * 300 + ["b"] * 300})
    sdf = spark.createDataFrame(pdf)
    ks = S.ks_2samp(sdf, "v", "g", groups=("a", "b")).first()
    assert 0.0 <= ks["pvalue"] <= 1.0 and ks["pvalue"] > 0.01
    mw = S.mann_whitney_u(sdf, "v", "g", groups=("a", "b")).first()
    assert 0.0 <= mw["pvalue"] <= 1.0 and mw["pvalue"] > 0.01
    ft = S.f_test(sdf, "v", "g").first()
    assert 0.0 <= ft["pvalue"] <= 1.0
    sdf2 = sdf.withColumn("vb", F.col("v") > 0)
    c2 = S.chi2(sdf2, "g", "vb").first()
    assert 0.0 <= c2["pvalue"] <= 1.0
    # shifted distribution → highly significant
    c = rng.normal(2.0, 1, 300)
    pdf2 = pd.DataFrame({"v": np.concatenate([a, c]),
                         "g": ["a"] * 300 + ["b"] * 300})
    sdf3 = spark.createDataFrame(pdf2)
    assert S.ks_2samp(sdf3, "v", "g", groups=("a", "b")).first()["pvalue"] < 1e-6
    tt = S.ttest_ind(spark.createDataFrame(pd.DataFrame({"x": a, "y": c})), "x", "y").first()
    assert tt["pvalue"] < 1e-10 and tt["dof"] > 100


def test_kaplan_meier_branches_agree(spark):
    """The adaptive single-window branch and the forced two-pass
    range-bucket branch produce identical survival curves; both match a
    numpy reference."""
    rng = np.random.default_rng(7)
    t = rng.integers(0, 40, 300)
    d = (rng.random(300) < 0.4).astype(int)
    sdf = spark.createDataFrame(pd.DataFrame({"t": t, "d": d}))
    small = {r["t"]: r["survival"]
             for r in S.kaplan_meier(sdf, "t", "d").collect()}
    big = {r["t"]: r["survival"]
           for r in S.kaplan_meier(sdf, "t", "d", small_threshold=0).collect()}
    assert small.keys() == big.keys()
    for k in small:
        assert small[k] == pytest.approx(big[k], abs=1e-12)
    # numpy reference
    times = np.sort(np.unique(t))
    surv, s = {}, 1.0
    for tt in times:
        n_at_risk = int((t >= tt).sum())
        deaths = int(d[t == tt].sum())
        if deaths < n_at_risk:
            s *= 1.0 - deaths / n_at_risk
            surv[int(tt)] = s
    assert small.keys() == surv.keys()
    for k in surv:
        assert small[k] == pytest.approx(surv[k], rel=1e-9)
