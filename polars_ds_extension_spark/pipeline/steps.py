"""Stateless Blueprint-style pipeline steps (reference:
python/polars_ds/pipeline/_step.py — SQLStep, SortStep, GroupByAggStep,
ExprStep with select / with_columns / filter / explode contexts).

Unlike the fit/transform steps in transforms.py these carry no learned
state — fit is a no-op — so they serialize as their constructor kwargs
and re-materialize from JSON verbatim. Expressions are stored as SQL
strings (the engine-portable serialization the reference uses) and
parsed with ``F.expr`` at apply time, so every step stays a pure
Catalyst plan transformation: filters keep pushing down through them,
aggregations keep their map-side partial phase, and nothing leaves the
JVM.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transforms import Transform, _REGISTRY

__all__ = ["SQLStep", "SortStep", "GroupByAggStep", "ExprStep"]


class _StatelessStep(Transform):
    """fit() is a no-op — the step is fully defined by its kwargs."""

    def fit(self, df: DataFrame, y=None):
        self.params = {}
        return self


class SQLStep(_StatelessStep):
    """Run a SQL statement against the current frame, which is visible
    as table ``df`` (ref _step.py SQLStep: ``pl.SQLContext(df=df)``)."""

    name = "sql_step"

    def __init__(self, sql: str):
        super().__init__(sql=sql)

    def transform(self, df: DataFrame) -> DataFrame:
        # The view must literally be named "df" (the SQL contract), but
        # registering it must not clobber or leak a session-level view
        # of that name: capture any pre-existing "df" (its resolved
        # plan), register ours, and restore/drop in finally. Safe
        # because spark.sql() resolves the view into the returned
        # frame's plan at analysis time, not at action time.
        spark = df.sparkSession
        prev = None
        if spark.catalog.tableExists("df"):
            try:
                prev = spark.table("df")
            except Exception:
                prev = None
        df.createOrReplaceTempView("df")
        try:
            return spark.sql(self.kwargs["sql"])
        finally:
            if prev is not None:
                prev.createOrReplaceTempView("df")
            else:
                spark.catalog.dropTempView("df")


class SortStep(_StatelessStep):
    """Global sort (ref _step.py SortStep). In Spark this is a range
    shuffle — meaningful before a limit / write / window that consumes
    the order; Catalyst drops it when nothing downstream needs it."""

    name = "sort_step"

    def __init__(self, by: str | Sequence[str],
                 descending: bool | Sequence[bool] = False):
        by = [by] if isinstance(by, str) else list(by)
        desc = ([descending] * len(by) if isinstance(descending, bool)
                else list(descending))
        if len(desc) != len(by):
            raise ValueError("descending must match by in length")
        super().__init__(by=by, descending=desc)

    def transform(self, df: DataFrame) -> DataFrame:
        cols = [F.col(c).desc() if d else F.col(c).asc()
                for c, d in zip(self.kwargs["by"], self.kwargs["descending"])]
        return df.orderBy(*cols)


class GroupByAggStep(_StatelessStep):
    """groupBy().agg() with SQL aggregate expression strings, e.g.
    ``GroupByAggStep(["k"], ["SUM(x) AS sum_x", "AVG(y) AS avg_y"])``
    (ref _step.py GroupByAggStep)."""

    name = "group_by_agg_step"

    def __init__(self, by: str | Sequence[str], aggs: Sequence[str]):
        by = [by] if isinstance(by, str) else list(by)
        super().__init__(by=by, aggs=list(aggs))

    def transform(self, df: DataFrame) -> DataFrame:
        aggs = [F.expr(a) for a in self.kwargs["aggs"]]
        return df.groupBy(*self.kwargs["by"]).agg(*aggs)


class ExprStep(_StatelessStep):
    """Expression step in one of the reference's four contexts
    (ref _step.py ExprStep / PLContext): ``select`` / ``with_columns``
    / ``filter`` / ``explode``, each taking SQL expression strings."""

    name = "expr_step"
    _CONTEXTS = ("select", "with_columns", "filter", "explode")

    def __init__(self, context: str, exprs: str | Sequence[str]):
        if context not in self._CONTEXTS:
            raise ValueError(f"context must be one of {self._CONTEXTS}")
        exprs = [exprs] if isinstance(exprs, str) else list(exprs)
        if context in ("filter", "explode") and len(exprs) != 1:
            raise ValueError(f"{context} takes exactly one expression")
        super().__init__(context=context, exprs=exprs)

    def transform(self, df: DataFrame) -> DataFrame:
        ctx = self.kwargs["context"]
        exprs = self.kwargs["exprs"]
        if ctx == "select":
            return df.select(*[F.expr(e) for e in exprs])
        if ctx == "with_columns":
            return df.select("*", *[F.expr(e) for e in exprs])
        if ctx == "filter":
            return df.where(F.expr(exprs[0]))
        # explode: replace the column with its exploded rows, matching
        # polars df.explode(col) semantics (other columns repeated)
        col = exprs[0]
        others = [c for c in df.columns if c != col]
        return df.select(*others, F.explode(F.col(col)).alias(col))


_REGISTRY.update({t.name: t for t in
                  [SQLStep, SortStep, GroupByAggStep, ExprStep]})


class CastBoolsStep(_StatelessStep):
    """Cast every boolean column to the given numeric type
    (ref pipeline.py Blueprint.cast_bools; schema resolved at apply)."""

    name = "cast_bools_step"

    def __init__(self, dtype: str = "int"):
        super().__init__(dtype=dtype)

    def transform(self, df: DataFrame) -> DataFrame:
        dt = self.kwargs["dtype"]
        cols = [f.name for f in df.schema.fields
                if f.dataType.simpleString() == "boolean"]
        return df.select(*[
            F.col(c).cast(dt).alias(c) if c in cols else F.col(c)
            for c in df.columns])


class NanToNullStep(_StatelessStep):
    """float NaN → null on every float/double column
    (ref Blueprint.nan_to_null)."""

    name = "nan_to_null_step"

    def transform(self, df: DataFrame) -> DataFrame:
        fl = {f.name for f in df.schema.fields
              if f.dataType.simpleString() in ("float", "double")}
        return df.select(*[
            F.when(F.isnan(F.col(c)), None).otherwise(F.col(c)).alias(c)
            if c in fl else F.col(c) for c in df.columns])


class IntToFloatStep(_StatelessStep):
    """Integer columns → double (ref Blueprint.int_to_float; Spark
    computes in doubles, so the f32 flag maps to double)."""

    name = "int_to_float_step"

    def transform(self, df: DataFrame) -> DataFrame:
        ints = {f.name for f in df.schema.fields
                if f.dataType.simpleString() in
                ("tinyint", "smallint", "int", "bigint")}
        return df.select(*[
            F.col(c).cast("double").alias(c) if c in ints else F.col(c)
            for c in df.columns])


class RenameStep(_StatelessStep):
    """Column renames from a mapping (ref Blueprint.rename)."""

    name = "rename_step"

    def __init__(self, mapping: dict):
        super().__init__(mapping=dict(mapping))

    def transform(self, df: DataFrame) -> DataFrame:
        m = self.kwargs["mapping"]
        return df.select(*[F.col(c).alias(m.get(c, c)) for c in df.columns])


class DropStep(_StatelessStep):
    """Drop columns (ref Blueprint.drop)."""

    name = "drop_step"

    def __init__(self, cols: str | Sequence[str]):
        cols = [cols] if isinstance(cols, str) else list(cols)
        super().__init__(cols=cols)

    def transform(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.kwargs["cols"])


class GroupByDynAggStep(_StatelessStep):
    """Time-bucketed aggregation — the reference's group_by_dynamic
    (ref pipeline.py:930) as Spark's F.window: ``every`` is the stride,
    ``period`` the bucket length (defaults to every ⇒ tumbling; longer ⇒
    sliding/overlapping). The window start rides out as ``index_column``
    (polars label='left'). Durations are Spark interval strings
    ("1 hour", "30 minutes"). This is the same watermark-compatible
    window streaming uses, so a Blueprint with this step applies to a
    readStream frame unchanged."""

    name = "group_by_dyn_agg_step"

    def __init__(self, index_column: str, aggs: Sequence[str], every: str,
                 period: str | None = None,
                 group_by: str | Sequence[str] | None = None):
        gb = ([group_by] if isinstance(group_by, str)
              else list(group_by or []))
        super().__init__(index_column=index_column, aggs=list(aggs),
                         every=every, period=period, group_by=gb)

    def transform(self, df: DataFrame) -> DataFrame:
        k = self.kwargs
        w = (F.window(k["index_column"], k["period"], k["every"])
             if k["period"] else F.window(k["index_column"], k["every"]))
        out = (df.groupBy(w.alias("__w"), *k["group_by"])
               .agg(*[F.expr(a) for a in k["aggs"]]))
        return out.select(
            F.col("__w.start").alias(k["index_column"]),
            *k["group_by"],
            *[c for c in out.columns if c not in ("__w", *k["group_by"])])


_REGISTRY.update({t.name: t for t in
                  [CastBoolsStep, NanToNullStep, IntToFloatStep,
                   RenameStep, DropStep, GroupByDynAggStep]})
