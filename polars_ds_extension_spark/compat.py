"""sklearn/numpy compatibility layer — the Spark analogue of the
reference's compat module (ref python/polars_ds/compat/_compat.py,
SKLEARN_COMPATIBILITY.md).

Two pieces:

* ``compat`` — numpy-in / numpy-out access to every expression function:
  ``compat.haversine(lat1, lon1, lat2, lon2)`` with numpy arrays builds a
  temporary local DataFrame, evaluates the Column expression on the JVM,
  and returns a numpy array. This is an INTEROP convenience for
  driver-side arrays (feature engineering inside an sklearn pipeline on
  a sample, unit tests, notebooks) — by construction the data lives on
  the driver, so it is NOT a big-data path and caps input length.

* model/transform classes already implement the sklearn estimator
  protocol (get_params / set_params / fit / transform / predict with an
  ignored ``y``) — see pipeline.transforms.Transform and
  functions.models; any duck-typed sklearn Pipeline composes them over
  Spark DataFrames.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

__all__ = ["compat"]

# expression modules searched for functions, in resolution order
_MODULES = ("num", "stats", "string_", "metrics", "ts")

# names that are DataFrame-level (take a DataFrame first) or otherwise
# unusable on bare arrays — refuse with a clear error instead of failing
# deep inside Spark
_CANNOT_CALL = {
    "winsorize_df", "ks_2samp", "mann_whitney_u", "chi2", "f_test",
    "corr", "xi_corr", "bicor", "kendall_tau", "ttest_ind",
}

_MAX_ROWS = 2_000_000  # driver-side arrays only — this is an interop path


class _Compat:
    """``compat.<fn>(np_array, ...)`` → numpy. Mirrors the reference's
    _Compat.__getattr__ wrapper (ref compat/_compat.py:42)."""

    @staticmethod
    def _is_arraylike(x: Any) -> bool:
        return isinstance(x, np.ndarray) or (
            hasattr(x, "__array__") and not np.isscalar(x))

    def __getattr__(self, name: str) -> Callable:
        if name.startswith("_"):
            raise AttributeError(name)
        if name in _CANNOT_CALL:
            raise ValueError(
                f"`{name}` is DataFrame-level and doesn't work in compat "
                f"mode — call it on a Spark DataFrame directly.")
        import importlib

        func = None
        for m in _MODULES:
            mod = importlib.import_module(f".functions.{m}", __package__)
            if hasattr(mod, name):
                func = getattr(mod, name)
                break
        if func is None:
            raise AttributeError(f"no expression function named {name!r}")

        def wrapper(*args, **kwargs):
            from pyspark.sql import SparkSession
            from pyspark.sql import functions as F

            spark = SparkSession.getActiveSession()
            if spark is None:
                from .session import get_spark

                spark = get_spark()
            cols: dict[str, np.ndarray] = {}

            def _sub(x: Any, tag: str):
                if self._is_arraylike(x):
                    arr = np.asarray(x)
                    cols[tag] = arr
                    return F.col(tag)
                return x

            new_args = [_sub(x, f"_{i}") for i, x in enumerate(args)]
            new_kwargs = {k: _sub(v, f"_k_{k}") for k, v in kwargs.items()}
            if not cols:
                raise ValueError("at least one argument must be an array")
            n = {len(v) for v in cols.values()}
            if len(n) != 1:
                raise ValueError(f"array arguments differ in length: {n}")
            if n.pop() > _MAX_ROWS:
                raise ValueError(
                    f"compat caps inputs at {_MAX_ROWS} rows — use the "
                    f"DataFrame API for data this size")
            names = list(cols)
            pdf = None
            import pandas as pd

            pdf = pd.DataFrame({k: list(v) for k, v in cols.items()})
            df = spark.createDataFrame(pdf)
            expr = func(*new_args, **new_kwargs)
            try:
                out = df.select(expr.alias("__out__"))
                rows = out.collect()
            except Exception:
                # aggregate expressions need an agg context
                out = df.agg(expr.alias("__out__"))
                rows = out.collect()
            vals = [r["__out__"] for r in rows]
            if len(vals) == 1 and len(names) >= 1 and len(cols[names[0]]) != 1:
                return vals[0]  # aggregated scalar
            return np.asarray(vals)

        return wrapper


compat = _Compat()
