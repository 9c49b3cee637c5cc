"""Tests: linear models vs numpy, special functions vs quadrature."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.functions import _special as sp
from polars_ds_extension_spark.functions import linear as L

RNG = np.random.default_rng(0)
N = 2000
X1 = RNG.normal(size=N)
X2 = RNG.normal(size=N)
Y = 2.0 * X1 - 1.5 * X2 + 0.7 + RNG.normal(0, 0.5, N)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(pd.DataFrame({"x1": X1, "x2": X2, "y": Y}))


def test_lin_reg_matches_numpy(df):
    beta = L.lin_reg(df, ["x1", "x2"], "y")
    X = np.column_stack([X1, X2, np.ones(N)])
    want = np.linalg.lstsq(X, Y, rcond=None)[0]
    assert np.allclose(beta, want, atol=1e-9)
    # ridge shrinks feature coefs toward zero but not the bias
    ridged = L.lin_reg(df, ["x1", "x2"], "y", l2=100.0)
    assert abs(ridged[0]) < abs(beta[0]) and abs(ridged[1]) < abs(beta[1])


def test_lin_reg_report(df):
    rep = L.lin_reg_report(df, ["x1", "x2"], "y").toPandas().set_index("feature")
    X = np.column_stack([X1, X2, np.ones(N)])
    beta = np.linalg.lstsq(X, Y, rcond=None)[0]
    resid = Y - X @ beta
    sigma2 = resid @ resid / (N - 3)
    se = np.sqrt(np.diag(np.linalg.inv(X.T @ X) * sigma2))
    assert rep.loc["x1", "coef"] == pytest.approx(beta[0], rel=1e-9)
    assert rep.loc["x1", "std_err"] == pytest.approx(se[0], rel=1e-9)
    assert rep.loc["__bias__", "t_value"] == pytest.approx(beta[2] / se[2], rel=1e-9)
    assert 0.0 <= rep["p_value"].min() and rep["p_value"].max() <= 1.0


def test_logistic_matches_numpy_irls(df):
    yb = (Y > np.mean(Y)).astype(float)
    sdf = df.withColumn("yb", (F.col("y") > float(np.mean(Y))).cast("double"))
    got = np.array(L.logistic_reg(sdf, ["x1", "x2"], "yb", n_iters=12))
    X = np.column_stack([X1, X2, np.ones(N)])
    b = np.zeros(3)
    for _ in range(60):
        p = 1.0 / (1.0 + np.exp(-(X @ b)))
        w = p * (1 - p)
        step = np.linalg.solve(X.T @ (X * w[:, None]), X.T @ (yb - p))
        b += step
        if np.max(np.abs(step)) < 1e-12:
            break
    assert np.allclose(got, b, atol=1e-6)


def test_rolling_and_recursive(spark):
    n = 120
    x = RNG.normal(size=n)
    y = 3.0 * x + RNG.normal(0, 0.1, n)
    pdf = pd.DataFrame({"i": range(n), "x": x, "y": y})
    sdf = spark.createDataFrame(pdf)
    out = (L.rolling_lin_reg(sdf, "x", "y", "i", 30)
           .orderBy("i").toPandas())
    # manual rolling slope at the last row
    xs, ys = x[-30:], y[-30:]
    want = np.cov(xs, ys, ddof=1)[0, 1] / np.var(xs, ddof=1)
    assert out["rolling_slope"].iloc[-1] == pytest.approx(want, rel=1e-9)
    rec = (L.recursive_lin_reg(sdf, "x", "y", "i").orderBy("i").toPandas())
    want_full = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    assert rec["recursive_slope"].iloc[-1] == pytest.approx(want_full, rel=1e-9)


# ------------------------------------------------------- special functions

def _t_sf_quad(t, df):
    x = np.linspace(t, t + 300, 1_000_001)
    c = math.exp(math.lgamma((df + 1) / 2) - math.lgamma(df / 2)) / math.sqrt(df * math.pi)
    return float(np.trapz(c * (1 + x ** 2 / df) ** (-(df + 1) / 2), x))


def _chi2_sf_quad(x0, k):
    x = np.linspace(x0, x0 + 400, 1_000_001)
    y = x ** (k / 2 - 1) * np.exp(-x / 2) / (2 ** (k / 2) * math.exp(math.lgamma(k / 2)))
    return float(np.trapz(y, x))


def test_special_functions_vs_quadrature():
    assert sp.t_sf(2.0, 10) == pytest.approx(_t_sf_quad(2.0, 10), abs=1e-6)
    assert sp.t_sf(-1.5, 20) == pytest.approx(1 - _t_sf_quad(1.5, 20), abs=1e-6)
    assert sp.chi2_sf(3.841459, 1) == pytest.approx(0.05, abs=1e-6)
    assert sp.chi2_sf(10.0, 4) == pytest.approx(_chi2_sf_quad(10.0, 4), abs=1e-6)
    assert sp.norm_sf(1.959964) == pytest.approx(0.025, abs=1e-6)
    # F via the beta identity at a point with known symmetry
    assert sp.f_sf(1.0, 5, 5) == pytest.approx(0.5, abs=1e-9)
    assert sp.betainc_reg(2.0, 3.0, 0.0) == 0.0
    assert sp.betainc_reg(2.0, 3.0, 1.0) == 1.0


def test_elastic_net_limits(df):
    # l1=0, l2=0 → OLS
    beta = np.array(L.elastic_net(df, ["x1", "x2"], "y", l1=0.0, l2=0.0))
    X = np.column_stack([X1, X2, np.ones(N)])
    want = np.linalg.lstsq(X, Y, rcond=None)[0]
    assert np.allclose(beta, want, atol=1e-7)
    # l1=0 → ridge closed form (bias unpenalized)
    lam = 0.5
    ridge = np.array(L.elastic_net(df, ["x1", "x2"], "y", l1=0.0, l2=lam))
    reg = np.diag([N * lam, N * lam, 0.0])
    want_r = np.linalg.solve(X.T @ X + reg, X.T @ Y)
    assert np.allclose(ridge, want_r, atol=1e-7)
    # l1 shrinks coefficients toward zero
    lasso = np.array(L.elastic_net(df, ["x1", "x2"], "y", l1=1.0, l2=0.0))
    assert abs(lasso[0]) < abs(want[0])
    # pinv variant agrees with solve on full-rank data
    pv = np.array(L.lin_reg_rcond(df, ["x1", "x2"], "y"))
    assert np.allclose(pv, want, atol=1e-9)


def test_glm_families(spark):
    # poisson: y ~ Poisson(exp(0.8*x + 0.2))
    rng = np.random.default_rng(4)
    x = rng.normal(size=4000)
    lam = np.exp(0.8 * x + 0.2)
    y = rng.poisson(lam).astype(float)
    sdf = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    beta = L.glm(sdf, ["x"], "y", family="poisson")
    # numpy IRLS mirror
    X = np.column_stack([x, np.ones(len(x))])
    b = np.zeros(2)
    for _ in range(50):
        mu = np.exp(X @ b)
        step = np.linalg.solve(X.T @ (X * mu[:, None]), X.T @ (y - mu))
        b += step
        if np.max(np.abs(step)) < 1e-12:
            break
    assert np.allclose(beta, b, atol=1e-6)
    assert abs(beta[0] - 0.8) < 0.05 and abs(beta[1] - 0.2) < 0.05
    # binomial == logistic_reg
    yb = (rng.uniform(size=len(x)) < 1 / (1 + np.exp(-x))).astype(float)
    sdf2 = spark.createDataFrame(pd.DataFrame({"x": x, "yb": yb}))
    g = L.glm(sdf2, ["x"], "yb", family="binomial")
    lr = L.logistic_reg(sdf2, ["x"], "yb")
    assert np.allclose(g, lr, atol=1e-8)
    # gaussian == OLS
    assert np.allclose(L.glm(sdf, ["x"], "y", family="gaussian"),
                       L.lin_reg(sdf, ["x"], "y"), atol=1e-12)


def test_model_classes(spark, df):
    from polars_ds_extension_spark.functions import models as MD

    lr = MD.LR(["x1", "x2"], "y").fit(df)
    X = np.column_stack([X1, X2, np.ones(N)])
    want = np.linalg.lstsq(X, Y, rcond=None)[0]
    assert np.allclose(lr.coef_, want, atol=1e-9)
    pred = lr.predict(df).toPandas()["pred"].values
    assert np.allclose(np.sort(pred), np.sort(X @ want), atol=1e-9)

    # online LR over two halves == batch LR over the whole frame
    h1 = df.limit(1000)
    h2 = df.subtract(h1)
    ol = MD.OnlineLR(["x1", "x2"], "y")
    ol.partial_fit(h1).partial_fit(h2)
    assert np.allclose(ol.coef_, want, atol=1e-6)

    glm = MD.GLM(["x1", "x2"], "y", family="gaussian").fit(df)
    assert np.allclose(glm.coef_, want, atol=1e-9)

    logit = MD.LogisticRegression(["x1"], "yb")
    sdf = df.withColumn("yb", (F.col("y") > 0).cast("double"))
    p = logit.fit(sdf).predict(sdf).toPandas()["pred"]
    assert p.between(0, 1).all()

    from polars_ds_extension_spark.functions.sample import random_cols
    cols = [f"c{i}" for i in range(10)]
    pick = random_cols(cols, 4, seed=1)
    assert len(pick) == 4 and pick == sorted(pick, key=cols.index)
    assert random_cols(cols, 4, seed=1) == pick  # deterministic


def test_null_policy_variants(spark):
    import numpy as np
    import pytest as _pt
    from polars_ds_extension_spark.functions import linear as L

    rng = np.random.default_rng(3)
    n = 120
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = 2.0 * x1 - 1.0 * x2 + 0.5 + rng.normal(0, 0.1, n)
    rows = []
    nullmask = rng.random(n) < 0.15
    for i in range(n):
        rows.append((None if nullmask[i] else float(x1[i]),
                     float(x2[i]), float(y[i])))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")

    # skip == listwise deletion (numpy on complete rows only)
    keep = ~nullmask
    A = np.column_stack([x1[keep], x2[keep], np.ones(keep.sum())])
    want = np.linalg.lstsq(A, y[keep], rcond=None)[0]
    got = L.lin_reg(df, ["x1", "x2"], "y")  # default skip
    assert got == _pt.approx(list(want), rel=1e-9)

    # zero-fill == numpy with nulls replaced by 0
    x1f = np.where(nullmask, 0.0, x1)
    Af = np.column_stack([x1f, x2, np.ones(n)])
    wantf = np.linalg.lstsq(Af, y, rcond=None)[0]
    gotf = L.lin_reg(df, ["x1", "x2"], "y", null_policy="zero")
    assert gotf == _pt.approx(list(wantf), rel=1e-9)

    # numeric fill
    got2 = L.lin_reg(df, ["x1", "x2"], "y", null_policy=0.0)
    assert got2 == _pt.approx(gotf, rel=1e-12)

    # raise
    with _pt.raises(ValueError, match="null"):
        L.lin_reg(df, ["x1", "x2"], "y", null_policy="raise")
    # clean data passes under raise
    clean = df.where("x1 IS NOT NULL")
    L.lin_reg(clean, ["x1", "x2"], "y", null_policy="raise")
