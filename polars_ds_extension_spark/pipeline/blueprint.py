"""Blueprint — the reference's chainable pipeline builder
(ref python/polars_ds/pipeline/pipeline.py:250 class Blueprint).

A Blueprint records steps lazily against a frame; nothing fits until
``materialize()``, which runs the sequential fit (each learned step
fits on the previous steps' output, exactly like Pipeline.fit) and
returns a fitted, JSON-serializable Pipeline. Method names mirror the
reference so a polars_ds user can port a pipeline definition nearly
verbatim:

    pipe = (Blueprint(df, target="y")
            .impute(["a", "b"], method="median")
            .scale(["a", "b"], method="standard")
            .filter("a > 0")
            .group_by_agg(["seg"], ["AVG(a) AS avg_a"])
            .materialize())
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from .pipeline import Pipeline
from .steps import (CastBoolsStep, DropStep, ExprStep, GroupByAggStep,
                    GroupByDynAggStep, IntToFloatStep, NanToNullStep,
                    RenameStep, SortStep, SQLStep)
from .transforms import (ConditionalImpute, FitFuncStep, Impute, IvEncode,
                         LinearImpute, OneHot, Ordinal, Polynomial, RankHot,
                         Scale, SelectByStd, TargetEncode, Transform,
                         Winsorize, WoeEncode)

__all__ = ["Blueprint"]


class Blueprint:
    def __init__(self, df: DataFrame, name: str = "blueprint",
                 target: str | None = None):
        self._df = df
        self.name = name
        self.target = target
        self.feature_names_in_ = list(df.columns)
        self._steps: list[Transform] = []

    def _append(self, step: Transform) -> "Blueprint":
        self._steps.append(step)
        return self

    def _target(self, target: str | None) -> str:
        t = target if target is not None else self.target
        if t is None:
            raise ValueError("target not given and Blueprint has no target")
        return t

    # ------------------------------------------------ learned (fit) steps

    def impute(self, cols: Sequence[str], method: str = "mean"):
        return self._append(Impute(cols, strategy=method))

    def conditional_impute(self, cols: Sequence[str], condition: str,
                           method: str = "mean"):
        return self._append(ConditionalImpute(cols, condition,
                                              strategy=method))

    def scale(self, cols: Sequence[str], method: str = "standard"):
        return self._append(Scale(cols, method=method))

    def robust_scale(self, cols: Sequence[str], q_low: float = 0.25,
                     q_high: float = 0.75):
        # the reference's robust_scale IS Scale(method='robust') with
        # configurable quantiles; our Scale pins the IQR quartiles
        if (q_low, q_high) != (0.25, 0.75):
            raise NotImplementedError(
                "Scale(method='robust') uses the 0.25/0.75 quartiles")
        return self._append(Scale(cols, method="robust"))

    def center(self, cols: Sequence[str]):
        return self._append(Scale(cols, method="center"))

    def winsorize(self, cols: Sequence[str], lower: float = 0.05,
                  upper: float = 0.95):
        return self._append(Winsorize(cols, lower, upper))

    def polynomial_features(self, cols: Sequence[str],
                            interaction_only: bool = False):
        return self._append(Polynomial(cols,
                                       interaction_only=interaction_only))

    def one_hot_encode(self, cols: Sequence[str],
                       drop_first: bool = False):
        return self._append(OneHot(cols, drop_first=drop_first))

    def ordinal_encode(self, cols: Sequence[str]):
        return self._append(Ordinal(cols))

    def rank_hot_encode(self, cols: Sequence[str]):
        return self._append(RankHot(cols))

    def target_encode(self, cols: Sequence[str],
                      target: str | None = None,
                      smoothing: float = 20.0):
        return self._append(TargetEncode(cols, self._target(target),
                                         smoothing=smoothing))

    def woe_encode(self, cols: Sequence[str], target: str | None = None):
        return self._append(WoeEncode(cols, self._target(target)))

    def iv_encode(self, cols: Sequence[str], target: str | None = None):
        return self._append(IvEncode(cols, self._target(target)))

    def linear_impute(self, features: Sequence[str],
                      target: str | None = None, add_bias: bool = False):
        """Regression imputation of ``target`` from ``features`` — ref
        pipeline.py:438."""
        return self._append(LinearImpute(features, self._target(target),
                                         add_bias=add_bias))

    def select_by_std(self, min_: float, max_: float = float("inf")):
        """Keep numeric columns with std in [min_, max_]; non-numeric
        columns and the Blueprint's target always survive — ref
        pipeline.py:524."""
        keep = [self.target] if self.target else []
        return self._append(SelectByStd(min_, max_, keep=keep))

    def append_step(self, step: Transform):
        """Any Transform (custom fit steps included) — ref
        append_fit_func's escape hatch."""
        return self._append(step)

    def append_fit_func(self, func, cols: Sequence[str], **kwargs):
        """Custom learned step — ref pipeline.py:975. ``func(df, cols,
        **kwargs)`` runs at fit time and returns (name, Column) pairs /
        a dict name→Column applied as withColumns. If func's signature
        has a ``target`` parameter and none is passed, the Blueprint's
        target is injected (reference behavior). Pipelines holding one
        do not JSON-serialize."""
        import inspect

        if ("target" in inspect.signature(func).parameters
                and "target" not in kwargs):
            kwargs["target"] = self._target(None)
        return self._append(FitFuncStep(func, cols, **kwargs))

    def append_step_from_dict(self, dictionary: dict):
        """Append a step named by dict — ref pipeline.py:1015: keys
        ``name`` (a public Blueprint method), ``args`` (list), and
        ``kwargs`` (dict)."""
        name = dictionary.get("name")
        args = dictionary.get("args", []) or []
        kwargs = dictionary.get("kwargs", {}) or {}
        if (not isinstance(name, str) or name.startswith("_")
                or not callable(getattr(self, name, None))):
            raise ValueError(f"Unknown or invalid method name {name!r}.")
        if not isinstance(args, (list, tuple)) or not isinstance(kwargs, dict):
            raise ValueError("args must be a list and kwargs a dict")
        return getattr(self, name)(*args, **kwargs)

    # --------------------------------------------------- stateless steps

    def filter(self, by: str):
        return self._append(ExprStep("filter", by))

    def select(self, *cols: str):
        return self._append(ExprStep("select", list(cols)))

    def with_columns(self, *exprs: str):
        return self._append(ExprStep("with_columns", list(exprs)))

    def explode(self, col: str):
        return self._append(ExprStep("explode", col))

    def sql_transform(self, sql: str):
        return self._append(SQLStep(sql))

    def sort(self, by: str | Sequence[str],
             descending: bool | Sequence[bool] = False):
        return self._append(SortStep(by, descending))

    def group_by_agg(self, by: str | Sequence[str], aggs: Sequence[str]):
        return self._append(GroupByAggStep(by, aggs))

    def group_by_dynamic_agg(self, index_column: str, aggs: Sequence[str],
                             every: str, period: str | None = None,
                             group_by: str | Sequence[str] | None = None):
        return self._append(GroupByDynAggStep(index_column, aggs, every,
                                              period=period,
                                              group_by=group_by))

    def cast_bools(self, dtype: str = "int"):
        return self._append(CastBoolsStep(dtype))

    def nan_to_null(self):
        return self._append(NanToNullStep())

    def int_to_float(self):
        return self._append(IntToFloatStep())

    def rename(self, mapping: dict):
        return self._append(RenameStep(mapping))

    def drop(self, cols: str | Sequence[str]):
        return self._append(DropStep(cols))

    # -------------------------------------------------------- materialize

    def with_features_out(self, features: Sequence[str],
                          ensure_features_out: bool = True):
        """Declare the pipeline's output features — applied to the
        materialized Pipeline (ref pipeline.py:125)."""
        self._features_out = (list(features), bool(ensure_features_out))
        return self

    def ensure_features_io(self, ensure_in: bool = True,
                           ensure_out: bool = True):
        """Opt the materialized Pipeline into feature-name checks at
        transform time (ref pipeline.py:189)."""
        self._ensure_io = (bool(ensure_in), bool(ensure_out))
        return self

    def materialize(self) -> Pipeline:
        """Fit every learned step sequentially on the attached frame and
        return the fitted Pipeline (ref pipeline.py:1027)."""
        pipe = Pipeline(self._steps)
        pipe.fit(self._df)
        if getattr(self, "_ensure_io", None) is not None:
            pipe.ensure_features_io(*self._ensure_io)
        if getattr(self, "_features_out", None) is not None:
            pipe.with_features_out(*self._features_out)
        return pipe

    def fit(self, X=None, y=None) -> Pipeline:
        """Alias for materialize (sklearn flavor)."""
        return self.materialize()

    def transform(self, df: DataFrame | None = None) -> DataFrame:
        """Materialize and apply — to the given frame, or the attached
        one."""
        return self.materialize().transform(
            df if df is not None else self._df)
