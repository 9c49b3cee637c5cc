"""sklearn/numpy compat layer (ref compat/_compat.py,
SKLEARN_COMPATIBILITY.md): numpy-in/numpy-out expression calls and the
sklearn estimator protocol on transforms/models."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_compat_elementwise_and_agg(spark):
    import polars_ds_extension_spark as pds

    x = np.array([0.0, 1.0, -2.0, 3.5])
    got = pds.compat.expit(x)
    assert np.allclose(got, 1 / (1 + np.exp(-x)))

    w = np.array([1.0, 2.0, 3.0, 4.0])
    wm = pds.compat.weighted_mean(x, w)
    assert wm == pytest.approx(float((x * w).sum() / w.sum()))


def test_compat_refuses_dataframe_level(spark):
    import polars_ds_extension_spark as pds

    with pytest.raises(ValueError, match="DataFrame-level"):
        pds.compat.ks_2samp(np.ones(3))
    with pytest.raises(AttributeError):
        pds.compat.not_a_real_function


class _MiniPipeline:
    """Duck-typed sklearn.Pipeline: same get_params/set_params/fit/
    transform contract, driving Spark-backed steps. (sklearn itself is
    not in this container; import-gated below when it is.)"""

    def __init__(self, steps):
        self.steps = steps

    def fit(self, X, y=None):
        for _, step in self.steps[:-1]:
            X = step.fit_transform(X, y)
        self.steps[-1][1].fit(X, y)
        return self

    def transform(self, X):
        for _, step in self.steps[:-1]:
            X = step.transform(X)
        return X

    def predict(self, X):
        return self.steps[-1][1].predict(self.transform(X))


def test_sklearn_protocol_pipeline(spark):
    from polars_ds_extension_spark.functions.models import LR
    from polars_ds_extension_spark.pipeline.transforms import Impute, Scale

    rng = np.random.RandomState(5)
    x1 = rng.normal(10, 2, 400)
    x2 = rng.normal(-3, 5, 400)
    y = 2.0 * x1 - 0.5 * x2 + 1.0 + rng.normal(0, 0.01, 400)
    rows = [(float(a) if i % 7 else None, float(b), float(t))
            for i, (a, b, t) in enumerate(zip(x1, x2, y))]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")

    sc = Scale(["x1", "x2"], method="standard")
    assert sc.get_params() == {"cols": ["x1", "x2"], "method": "standard"}
    sc.set_params(method="minmax")
    assert sc.get_params()["method"] == "minmax"
    with pytest.raises(ValueError, match="invalid parameters"):
        sc.set_params(bogus=1)
    sc.set_params(method="standard")

    pipe = _MiniPipeline([
        ("impute", Impute(["x1"], strategy="mean")),
        ("scale", sc),
        ("lr", LR(["x1", "x2"], "y")),
    ])
    pipe.fit(df)
    out = pipe.predict(df)
    resid = out.agg(
        F.avg(F.abs(F.col("pred") - F.col("y"))).alias("mae")).first()["mae"]
    # imputation perturbs 1/7 of x1 — fit still close on the clean rows
    assert resid < 1.0

    # sklearn proper, when present
    try:
        from sklearn.pipeline import Pipeline
    except ImportError:
        return
    skp = Pipeline([
        ("impute", Impute(["x1"], strategy="mean")),
        ("scale", Scale(["x1", "x2"])),
        ("lr", LR(["x1", "x2"], "y")),
    ])
    skp.fit(df)
    assert skp.predict(df).count() == 400
