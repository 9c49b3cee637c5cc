"""Eager model classes — sklearn-flavored wrappers over the functional
fits (ref linear_models.py:127 LR, :343 ElasticNet, :553 OnlineLR,
:698 GLM).

Each `fit` runs the corresponding distributed sufficient-statistics
aggregation; `predict`/`transform` attach pure Column expressions with
the learned coefficients as literals (scan-speed scoring, streams
included). OnlineLR keeps (X'X, X'y) as state so `partial_fit` merges
new batches exactly — the online analogue of the one-pass normal
equations.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import linear as L
from .._utils import to_col

__all__ = ["LR", "LogisticRegression", "ElasticNet", "OnlineLR", "GLM"]


class _LinearBase:
    def __init__(self, features: Sequence[str], target: str,
                 add_bias: bool = True):
        self.features = list(features)
        self.target = target
        self.add_bias = add_bias
        self.coef_: list[float] | None = None

    def _linpred(self) -> Column:
        pred = F.lit(float(self.coef_[-1])) if self.add_bias else F.lit(0.0)
        for i, f in enumerate(self.features):
            pred = pred + F.lit(float(self.coef_[i])) * to_col(f).cast("double")
        return pred

    def predict(self, df: DataFrame, out_name: str = "pred") -> DataFrame:
        if self.coef_ is None:
            raise RuntimeError("predict before fit")
        return df.withColumn(out_name, self._transform_pred())

    def _transform_pred(self) -> Column:
        return self._linpred()


class LR(_LinearBase):
    """OLS / ridge. Ref linear_models.py:127."""

    def __init__(self, features, target, add_bias: bool = True, l2: float = 0.0):
        super().__init__(features, target, add_bias)
        self.l2 = l2

    def fit(self, df: DataFrame, y=None) -> "LR":
        self.coef_ = L.lin_reg(df, self.features, self.target,
                               self.add_bias, self.l2)
        return self


class LogisticRegression(_LinearBase):
    """IRLS logistic regression; predict emits probabilities."""

    def __init__(self, features, target, add_bias: bool = True,
                 n_iters: int = 8, l2: float = 0.0):
        super().__init__(features, target, add_bias)
        self.n_iters, self.l2 = n_iters, l2

    def fit(self, df: DataFrame, y=None) -> "LogisticRegression":
        self.coef_ = L.logistic_reg(df, self.features, self.target,
                                    self.add_bias, self.n_iters, self.l2)
        return self

    def _transform_pred(self) -> Column:
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-self._linpred()))


class ElasticNet(_LinearBase):
    """Coordinate descent on sufficient statistics. Ref
    linear_models.py:343."""

    def __init__(self, features, target, l1: float = 0.1, l2: float = 0.1,
                 add_bias: bool = True):
        super().__init__(features, target, add_bias)
        self.l1, self.l2 = l1, l2

    def fit(self, df: DataFrame, y=None) -> "ElasticNet":
        self.coef_ = L.elastic_net(df, self.features, self.target,
                                   self.l1, self.l2, self.add_bias)
        return self


class GLM(_LinearBase):
    """IRLS GLM with canonical link. Ref linear_models.py:698."""

    def __init__(self, features, target, family: str = "gaussian",
                 add_bias: bool = True, n_iters: int = 12, l2: float = 0.0):
        super().__init__(features, target, add_bias)
        self.family, self.n_iters, self.l2 = family, n_iters, l2

    def fit(self, df: DataFrame, y=None) -> "GLM":
        self.coef_ = L.glm(df, self.features, self.target, self.family,
                           self.add_bias, self.n_iters, self.l2)
        return self

    def _transform_pred(self) -> Column:
        eta = self._linpred()
        if self.family == "binomial":
            return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        if self.family == "poisson":
            return F.exp(eta)
        return eta


class OnlineLR(_LinearBase):
    """Online least squares: (X'X, X'y) accumulate across partial_fit
    batches (exact merge — sums are associative), solve on demand.
    Ref linear_models.py:553."""

    def __init__(self, features, target, add_bias: bool = True, l2: float = 0.0):
        super().__init__(features, target, add_bias)
        self.l2 = l2
        k = len(self.features) + (1 if add_bias else 0)
        self._xtx = np.zeros((k, k))
        self._xty = np.zeros(k)
        self.n_seen = 0.0

    def partial_fit(self, df: DataFrame, y=None) -> "OnlineLR":
        xtx, xty, n = L._suffstats(df, self.features, self.target, self.add_bias)
        self._xtx += xtx
        self._xty += xty
        self.n_seen += n
        reg = np.eye(self._xtx.shape[0]) * self.l2
        if self.add_bias:
            reg[-1, -1] = 0.0
        self.coef_ = np.linalg.solve(self._xtx + reg, self._xty).tolist()
        return self

    fit = partial_fit
