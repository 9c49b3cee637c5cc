"""DIA — dataframe diagnostics (ref eda/diagnosis.py:39 `class DIA`).

Spark-first re-design: where the reference builds one lazy frame per
column and concats, every report here is ONE combined aggregation pass
(all columns' statistics in a single scan → map-side partials), and the
"infer_*" helpers are one-row boolean aggregations. The only driver
round-trips are single aggregate rows; nothing row-level is collected.

Plotting methods are intentionally data-only: this environment has no
plotting backend, so `plot_*` return the PRE-PLOT data frames (binned
histograms, corr matrices, dependency edge lists) for any charting
library to render.
"""

from __future__ import annotations

import math
from itertools import combinations
from typing import Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["DIA"]

_INT_T = ("tinyint", "smallint", "int", "bigint")
_FLOAT_T = ("float", "double")


class DIA:
    """Diagnostics for an (unaggregated) DataFrame. Ref diagnosis.py:39."""

    def __init__(self, df: DataFrame):
        self._df = df
        types = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        self.columns: List[str] = [n for n, _ in types]
        self.ints = [n for n, t in types if t in _INT_T]
        self.floats = [n for n, t in types if t in _FLOAT_T or t.startswith("decimal")]
        self.numerics = self.ints + self.floats
        self.strs = [n for n, t in types if t == "string"]
        self.bools = [n for n, t in types if t == "boolean"]
        self.list_floats = [
            n for n, t in types if t in ("array<float>", "array<double>")
        ]

    # ------------------------------------------------------------- reports

    def special_values_report(self) -> DataFrame:
        """Null/NaN/Inf counts and rates per numeric column — one scan.
        Ref diagnosis.py:102."""
        df, spark = self._df, self._df.sparkSession
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in self.numerics:
            cc = F.col(c).cast("double")
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
                F.sum(F.isnan(cc).cast("long")).alias(f"{c}__nan"),
                F.sum(((~F.isnan(cc)) & (F.abs(cc) == float("inf")))
                      .cast("long")).alias(f"{c}__inf"),
            ]
        row = df.agg(*aggs).first()
        n = max(int(row["__n"]), 1)
        out = [
            (c, int(row[f"{c}__null"]), row[f"{c}__null"] / n,
             int(row[f"{c}__nan"]), row[f"{c}__nan"] / n,
             int(row[f"{c}__inf"]), row[f"{c}__inf"] / n)
            for c in self.numerics
        ]
        return spark.createDataFrame(
            out, "column string, null_count long, null_pct double, "
                 "nan_count long, nan_pct double, inf_count long, inf_pct double")

    def numeric_profile(self, iqr_multiplier: float = 1.5) -> DataFrame:
        """Quantile profile + IQR-fence outlier counts. Two scans: one
        for the quantiles (their fences become literals), one for the
        outlier counts. Ref diagnosis.py:122."""
        from .._utils import spread
        from ..plans.ranks import (
            exact_quantiles, quantile_sketch_aggs, quantile_sketch_parse,
        )

        # spread: the percentile_approx boundary sketch is the CPU-heavy
        # term of the stats agg; on a small-file scan (3 partitions at
        # sf0.1) it otherwise runs 3-way parallel. No-op on real scans.
        df, spark = spread(self._df), self._df.sparkSession
        cols = self.numerics
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            cc = F.col(c).cast("double")
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
                F.avg(cc).alias(f"{c}__mean"), F.stddev_samp(cc).alias(f"{c}__std"),
                F.min(cc).alias(f"{c}__min"), F.max(cc).alias(f"{c}__max"),
            ]
        # boundary sketch rides the stats scan for free
        aggs += quantile_sketch_aggs(cols)
        row = {**df.agg(*aggs).first().asDict()}
        # exact quantiles via the distributed-selection plan — NOT
        # F.percentile, whose physical agg buffers every value and
        # merges them in one reducer (single-node sort at scale)
        qs = exact_quantiles(df, {c: [0.25, 0.5, 0.75] for c in cols},
                             presketch=quantile_sketch_parse(row, cols))
        for c in cols:
            row[f"{c}__q"] = qs[c]
        n = max(int(row["__n"]), 1)
        fences = {}
        for c in cols:
            q = row[f"{c}__q"]
            if q and q[0] is not None:
                iqr = q[2] - q[0]
                fences[c] = (q[0] - iqr_multiplier * iqr, q[2] + iqr_multiplier * iqr)
        out_aggs = [
            F.sum(((F.col(c).cast("double") < fences[c][0])
                   | (F.col(c).cast("double") > fences[c][1])).cast("long"))
            .alias(c)
            for c in fences
        ]
        orow = df.agg(*out_aggs).first() if out_aggs else None
        out = []
        for c in cols:
            q = row[f"{c}__q"] or [None, None, None]
            out.append((
                c, row[f"{c}__null"] / n, row[f"{c}__mean"], row[f"{c}__std"],
                row[f"{c}__min"], q[0], q[1], q[2], row[f"{c}__max"],
                int(orow[c]) if (orow is not None and c in fences
                                 and orow[c] is not None) else None,
            ))
        return spark.createDataFrame(
            out, "column string, null_pct double, mean double, std double, "
                 "min double, q25 double, median double, q75 double, "
                 "max double, outlier_cnt long")

    def str_stats(self) -> DataFrame:
        """Length/cardinality/mode stats per string column. One agg scan
        for lengths + one melted groupBy for the modes (all columns share
        a single shuffle). Ref diagnosis.py:408."""
        df, spark = self._df, self._df.sparkSession
        cols = self.strs
        if not cols:
            return spark.createDataFrame(
                [], "column string, null_count long, n_unique long, "
                    "most_freq string, most_freq_cnt long, min_len long, "
                    "avg_len double, max_len long, p05_len double, p95_len double")
        aggs = []
        for c in cols:
            ln = F.length(F.col(c)).cast("double")
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
                F.count_distinct(F.col(c)).alias(f"{c}__nu"),
                F.min(ln).alias(f"{c}__minl"), F.avg(ln).alias(f"{c}__avgl"),
                F.max(ln).alias(f"{c}__maxl"),
            ]
        row = df.agg(*aggs).first()
        # length tail quantiles via the distributed selection plan —
        # F.percentile's global agg buffers every length in one reducer
        from ..plans.ranks import exact_quantiles

        lens = df.select(*[F.length(F.col(c)).cast("double")
                           .alias(f"__len_{c}") for c in cols])
        qls = exact_quantiles(lens, {f"__len_{c}": [0.05, 0.95]
                                     for c in cols})
        # modes: melt (column, value) → count → per-column max; ONE shuffle
        melted = df.select(F.explode(F.array(*[
            F.struct(F.lit(c).alias("col"), F.col(c).alias("val")) for c in cols
        ])).alias("m")).select("m.col", "m.val").where(F.col("val").isNotNull())
        w = Window.partitionBy("col").orderBy(F.col("cnt").desc(), F.col("val").asc())
        modes = {
            r["col"]: (r["val"], int(r["cnt"]))
            for r in melted.groupBy("col", "val").agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
            .collect()
        }
        out = []
        for c in cols:
            mf, mfc = modes.get(c, (None, None))
            pl_ = qls.get(f"__len_{c}") or [None, None]
            out.append((
                c, int(row[f"{c}__null"]), int(row[f"{c}__nu"]), mf, mfc,
                int(row[f"{c}__minl"]) if row[f"{c}__minl"] is not None else None,
                row[f"{c}__avgl"],
                int(row[f"{c}__maxl"]) if row[f"{c}__maxl"] is not None else None,
                pl_[0], pl_[1],
            ))
        return spark.createDataFrame(
            out, "column string, null_count long, n_unique long, "
                 "most_freq string, most_freq_cnt long, min_len long, "
                 "avg_len double, max_len long, p05_len double, p95_len double")

    def null_corr(self, cols: Sequence[str] | None = None) -> DataFrame:
        """Pearson correlation between is-null indicators of all column
        pairs (pairs that are all-null / never-null are skipped) — one
        aggregation for every pair. Ref diagnosis.py:342."""
        df, spark = self._df, self._df.sparkSession
        cols = list(cols) if cols else self.columns
        # validity pre-pass: an all-null or never-null column has a
        # zero-variance indicator (corr is undefined — and an ANSI-mode
        # divide-by-zero); mirror the reference's `invalid` set
        nrow = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols],
        ).first()
        n = int(nrow["__n"])
        cols = [c for c in cols if 0 < int(nrow[c]) < n]
        pairs = list(combinations(cols, 2))
        ind = {c: F.col(c).isNull().cast("double") for c in cols}
        aggs = [F.corr(ind[a], ind[b]).alias(f"{i}") for i, (a, b) in enumerate(pairs)]
        if not aggs:
            return spark.createDataFrame(
                [], "column_1 string, column_2 string, null_corr double")
        row = df.agg(*aggs).first()
        out = [
            (a, b, float(row[f"{i}"]))
            for i, (a, b) in enumerate(pairs)
            if row[f"{i}"] is not None and not math.isnan(row[f"{i}"])
        ]
        out.sort(key=lambda t: -abs(t[2]))
        return spark.createDataFrame(
            out, "column_1 string, column_2 string, null_corr double")

    def corr(self, subset: Sequence[str], method: str = "pearson") -> DataFrame:
        """Correlation of each subset column vs every numeric column.
        Pearson runs as one aggregation; other methods delegate to
        functions.stats.corr per pair. Ref diagnosis.py:437."""
        df, spark = self._df, self._df.sparkSession
        subset = list(subset)
        if method == "pearson":
            aggs = [
                F.corr(F.col(x).cast("double"), F.col(y).cast("double"))
                .alias(f"{x}__{y}")
                for x in subset for y in self.numerics
            ]
            row = df.agg(*aggs).first()
            out = [
                tuple([x] + [row[f"{x}__{y}"] for y in self.numerics])
                for x in subset
            ]
            schema = "column string, " + ", ".join(f"{y} double" for y in self.numerics)
            return spark.createDataFrame(out, schema)
        from . import stats as S
        rows = []
        for x in subset:
            vals = []
            for y in self.numerics:
                v = S.corr(df, x, y, method=method).first()["corr"]
                vals.append(float(v) if v is not None else None)
            rows.append(tuple([x] + vals))
        schema = "column string, " + ", ".join(f"{y} double" for y in self.numerics)
        return spark.createDataFrame(rows, schema)

    def infer_corr(self, method: str = "pearson") -> DataFrame:
        """All-pairs correlation over numeric (and boolean, cast u8)
        columns, long format sorted by |corr| desc — ref
        diagnosis.py:675 infer_corr. Pearson computes every pair in ONE
        aggregation pass; other methods delegate per pair."""
        import itertools

        df, spark = self._df, self._df.sparkSession
        cols = self.numerics + getattr(self, "bools", [])
        for b in getattr(self, "bools", []):
            df = df.withColumn(b, F.col(b).cast("int"))
        pairs = list(itertools.combinations(cols, 2))
        if method == "pearson":
            aggs = [F.corr(F.col(x).cast("double"), F.col(y).cast("double"))
                    .alias(f"c{i}") for i, (x, y) in enumerate(pairs)]
            row = df.agg(*aggs).first()
            vals = [row[f"c{i}"] for i in range(len(pairs))]
        else:
            from . import stats as S
            vals = [S.corr(df, x, y, method=method).first()["corr"]
                    for x, y in pairs]
        out = [(x, y, float(v) if v is not None else None)
               for (x, y), v in zip(pairs, vals)]
        return (spark.createDataFrame(out, "x string, y string, corr double")
                .orderBy(F.abs(F.col("corr")).desc_nulls_last()))

    # -------------------------------------------------------------- infer_*

    def _bool_row(self, exprs: dict) -> List[str]:
        if not exprs:
            return []
        row = self._df.agg(*[e.alias(c) for c, e in exprs.items()]).first()
        return [c for c in exprs if row[c] is True]

    def infer_prob(self) -> List[str]:
        """Float columns in [0,1]; array<float> columns that look like
        class-probability vectors. Ref diagnosis.py:492."""
        exprs = {}
        for c in self.floats:
            cc = F.col(c).cast("double")
            exprs[c] = F.every((cc >= 0.0) & (cc <= 1.0))
        for c in self.list_floats:
            arr = F.col(c)
            all_pos = F.forall(arr, lambda v: v.cast("double") >= 0.0)
            ssum = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v.cast("double"))
            exprs[c] = F.every(
                all_pos & (F.abs(ssum - 1.0) < 1e-6)
            ) & (F.min(F.size(arr)) == F.max(F.size(arr)))
        return self._bool_row(exprs)

    def infer_high_null(self, threshold: float = 0.75) -> List[str]:
        return self._bool_row({
            c: (F.sum(F.col(c).isNull().cast("long"))
                >= F.count(F.lit(1)) * threshold)
            for c in self.columns
        })

    def infer_discrete(self, threshold: float = 0.1,
                       max_val_cnt: int = 100) -> List[str]:
        pre = self.bools[:]
        rest = self._bool_row({
            c: ((F.count_distinct(F.col(c)) < max_val_cnt)
                | (F.count_distinct(F.col(c)) < F.count(F.lit(1)) * threshold))
            for c in self.ints + self.floats + self.strs
        })
        return pre + rest

    def infer_const(self, include_null: bool = False) -> List[str]:
        return self.infer_k_distinct(1, include_null)

    def infer_binary(self, include_null: bool = False) -> List[str]:
        return self.infer_k_distinct(2, include_null)

    def infer_k_distinct(self, k: int, include_null: bool = False) -> List[str]:
        """k non-null distinct values; with include_null, nulls may
        additionally be present (mirrors the reference, whose n_unique
        counts null as one extra value). Ref diagnosis.py:638."""
        if k < 1:
            raise ValueError("`k` must be >= 1")
        def e(c):
            nu = F.count_distinct(F.col(c))  # nulls excluded in Spark
            no_null = F.sum(F.col(c).isNull().cast("long")) == 0
            if include_null:
                return nu == k
            return (nu == k) & no_null
        return self._bool_row({c: e(c) for c in self.columns})

    def infer_dependency(self, cols: Sequence[str] | None = None) -> DataFrame:
        """Functional-dependency scan via conditional entropy H(x|y) over
        discrete-typed column pairs (low H(x|y) ⇒ y determines x).
        Per-pair aggregations over joint value counts — cardinality-sized
        frames, never row-level collects. Ref diagnosis.py:704."""
        from .ts import query_cond_entropy

        df, spark = self._df, self._df.sparkSession
        valid = [c for c in (cols or self.columns)
                 if c in self.ints + self.strs + self.bools]
        nu = df.agg(*[F.count_distinct(F.col(c)).alias(c) for c in valid]).first() \
            if valid else None
        check = [c for c in valid if nu[c] > 1] if valid else []
        rows = []
        for x, y in combinations(check, 2):
            ce = query_cond_entropy(df, x, y).first()["cond_entropy"]
            rows.append((x, y, abs(float(ce)) if ce is not None else None))
        rows.sort(key=lambda t: (t[2] is None, t[2]))
        return spark.createDataFrame(
            rows, "column string, by string, cond_entropy double")

    # --------------------------------------------------------- validation

    def col_validation(self, *rules) -> DataFrame:
        """Column-level data-quality report — ref eda/diagnosis.py:236.

        ``rules`` are ``(Column, message)`` pairs where the Column is an
        AGGREGATE boolean (one value for the whole frame, e.g.
        ``F.min("x") >= 0``). All rules evaluate in ONE aggregation pass
        (map-side partials; a single one-row driver round-trip). Output:
        (column, __reason__) for every failing rule — empty when the
        frame is clean. The rule's output name is the ``column`` value,
        so alias each rule to the column it checks (the reference keeps
        the expression's root-column name the same way).
        """
        rules = list(rules)
        if not rules:
            return self._df.sparkSession.createDataFrame(
                [], "column string, __reason__ string")
        exprs = [r for r, _ in rules]
        msgs = [m for _, m in rules]
        agg = self._df.agg(*exprs)
        names = [f.name for f in agg.schema.fields]
        row = agg.first()
        out = [(n, m) for n, m, v in zip(names, msgs, row)
               if v is not True]
        return self._df.sparkSession.createDataFrame(
            out, "column string, __reason__ string")

    def row_validation(self, *rules, id_col: str | None = None,
                       columns_to_keep: Sequence[str] | None = None,
                       all_reasons: bool = False) -> DataFrame:
        """Row-level data-quality report — ref eda/diagnosis.py:268.

        ``rules`` are ``(Column, name)`` pairs where the Column is a
        per-ROW boolean; a False marks the row a violator of that named
        rule. Pure scan-side plan: one filter over the conjunction, no
        shuffle, nothing collected — violating rows stream out with
        either the FIRST failed rule name (``__reason__`` string,
        declared order) or all failed rule names sorted
        (``all_reasons=True``, array<string>). ``id_col=None`` falls
        back to ``monotonically_increasing_id`` (stable within a run,
        NOT contiguous — pass a real key column for reproducible ids,
        the distributed analogue of the reference's row index).
        """
        from functools import reduce

        rules = list(rules)
        names = [n for _, n in rules]
        if len(set(names)) != len(names):
            dup = next(n for i, n in enumerate(names) if n in names[:i])
            raise ValueError(f"Rule name {dup} is duplicate. Please rename it.")
        if id_col is None:
            df = self._df.withColumn(
                "__index__", F.monotonically_increasing_id())
            to_keep = ["__index__"]
        else:
            df, to_keep = self._df, [id_col]
        if columns_to_keep:
            to_keep = to_keep + list(columns_to_keep)
        tmp = df.select(*to_keep, *[r.alias(n) for r, n in rules])
        tmp = tmp.where(~reduce(lambda a, b: a & b,
                                [F.col(n) for n in names]))
        if all_reasons:
            reason = F.array_sort(F.filter(
                F.array(*[
                    F.when(F.col(n), F.lit(None).cast("string"))
                    .otherwise(F.lit(n)) for n in names
                ]), lambda v: v.isNotNull()))
        else:
            reason = F.coalesce(
                *[F.when(~F.col(n), F.lit(n)) for n in names],
                F.lit(None).cast("string"))
        return tmp.select(*to_keep, reason.alias("__reason__"))

    # ----------------------------------------------------------------- misc

    def meta(self) -> Dict:
        out = self.__dict__.copy()
        out.pop("_df")
        return out

    # --------------------------------------------------------- plot data
    # No plotting backend exists in this environment, so plot_* return the
    # PRE-PLOT data frames (exactly what the reference hands to
    # Altair/GT — ref diagnosis.py:465 plot_corr, :773 plot_dependency,
    # :819 plot_feature_distr). Render with any charting library.

    def plot_corr(self, subset: Sequence[str] | None = None,
                  method: str = "pearson") -> DataFrame:
        """Correlation-heatmap data: the pairwise corr matrix (the
        reference styles this same frame with a [-1, 1] color domain)."""
        return self.corr(subset if subset is not None else self.numerics, method)

    def plot_dependency(self, subset: Sequence[str] | None = None) -> DataFrame:
        """Dependency-graph data: the conditional-entropy edge list the
        reference renders as a graphviz diagram."""
        return self.infer_dependency(subset)

    def plot_feature_distr(self, feature: str, n_bins: int = 30,
                           density: bool = False,
                           min_: float | None = None,
                           max_: float | None = None,
                           over: str | None = None) -> DataFrame:
        """Histogram data for a numeric feature: one row per (bin[, over])
        with [lo, hi) edges (last bin closed) and count — the pre-plot
        frame of ref diagnosis.py:819. ONE range aggregation + ONE
        grouped count; rows never leave the executors.

        Output: bin int, lo double, hi double, count long[, density
        double][, over]. Matches DuckDB
        ``width_bucket(x, min, max, n_bins)`` bucketing (its bins 1..n;
        the max value folds into the last bin).
        """
        if feature not in self.numerics:
            raise ValueError("feature must be numeric")
        x = F.col(feature).cast("double")
        df = self._df.where(x.isNotNull() & ~F.isnan(x) & (F.abs(x) != float("inf")))
        if min_ is not None:
            df = df.where(x >= float(min_))
        if max_ is not None:
            df = df.where(x <= float(max_))
        if min_ is None or max_ is None:
            row = df.agg(F.min(x).alias("mn"), F.max(x).alias("mx")).first()
            mn = float(min_) if min_ is not None else float(row["mn"])
            mx = float(max_) if max_ is not None else float(row["mx"])
        else:
            mn, mx = float(min_), float(max_)
        w = (mx - mn) / n_bins if mx > mn else 1.0
        bucket = F.least(
            F.lit(n_bins - 1),
            F.floor((x - F.lit(mn)) / F.lit(w)).cast("int")).alias("bin")
        keys = ([F.col(over)] if over else []) + [bucket]
        out = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("count"))
            .withColumn("lo", F.lit(mn) + F.col("bin") * F.lit(w))
            .withColumn("hi", F.lit(mn) + (F.col("bin") + 1) * F.lit(w))
        )
        if density:
            tot = F.sum("count").over(
                Window.partitionBy(*( [over] if over else [] )))
            out = out.withColumn(
                "density", F.col("count") / (tot * F.lit(w)))
        cols = (["bin", "lo", "hi", "count"]
                + (["density"] if density else [])
                + ([over] if over else []))
        return out.select(*cols).orderBy(*((([over]) if over else []) + ["bin"]))
