"""Time-series features — Spark-native re-expression of the reference's
ts_features module (reference: python/polars_ds/exprs/ts_features.py).

Polars series are ordered; Spark DataFrames are not. Order-dependent
features therefore take an explicit ``order_by`` column and partition
keys ``by``, and are DataFrame-level: one sort-shuffle on (by, order_by)
feeds every lag/lead, then a single groupBy aggregates. Order-free
features stay pure aggregate Column expressions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .._utils import to_col, group_window, ordered_window, with_global_totals

__all__ = [
    "query_mid_range", "query_symm_ratio", "query_abs_energy", "query_cv",
    "query_range_count", "query_mean_n_abs_max", "query_first_digit_cnt",
    "query_benford",
    "query_count_uniques", "query_entropy", "query_cond_entropy",
    "query_mean_abs_change", "query_c3_stats", "query_cid_ce",
    "query_time_reversal_asymmetry_stats", "query_auto_corr",
    "query_longest_streak", "query_avg_streak", "query_streak",
]


# ------------------------------------------------------- agg Column exprs

def query_mid_range(x) -> Column:
    """(max - min)/2 (agg). Ref ts_features.py:51."""
    xx = to_col(x)
    return (F.max(xx) - F.min(xx)) / 2


def query_symm_ratio(x) -> Column:
    """|mean - median| / (max - min) (agg). Ref ts_features.py:59."""
    xx = to_col(x)
    return F.abs(F.mean(xx) - F.median(xx)) / (F.max(xx) - F.min(xx))


def query_abs_energy(x) -> Column:
    """Σ x² (agg). Ref ts_features.py:68."""
    xx = to_col(x)
    return F.sum(xx * xx)


def query_cv(x, ddof: int = 1) -> Column:
    """std/mean (agg). Ref ts_features.py:92."""
    xx = to_col(x)
    std = F.stddev_samp(xx) if ddof == 1 else F.stddev_pop(xx)
    return std / F.mean(xx)


def query_range_count(x, lower: float, upper: float) -> Column:
    """Count of values in [lower, upper] (agg). Ref ts_features.py:114."""
    xx = to_col(x)
    return F.sum(((xx >= lower) & (xx <= upper)).cast("long"))


def query_mean_n_abs_max(x, n_maxima: int) -> Column:
    """Mean of the top n |x| (agg). Ref ts_features.py:83.

    No top-k aggregate exists in Spark SQL; uses sort_array over a
    collected group — intended for per-group series that fit an executor
    (same contract as the reference's per-group kernel).
    """
    if n_maxima <= 0:
        raise ValueError("n_maxima must be > 0")
    arr = F.slice(
        F.sort_array(F.collect_list(F.abs(to_col(x))), asc=False), 1, n_maxima
    )
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v) / F.size(arr)


def _first_digit(x) -> Column:
    xx = F.abs(to_col(x).cast("double"))
    return F.floor(xx / F.pow(F.lit(10.0), F.floor(F.log10(xx)))).cast("int")


def query_first_digit_cnt(x) -> Column:
    """Counts of leading digits 1..9 as an array (agg).
    Ref ts_features.py:209."""
    d = _first_digit(x)
    return F.array(*[F.sum((d == i).cast("long")) for i in range(1, 10)])


def query_benford(x) -> Column:
    """First-digit distribution (fractions) for Benford's-law checks
    (agg). Ref ts_features.py:231."""
    d = _first_digit(x)
    n = F.count(d).cast("double")
    return F.array(*[(F.sum((d == i).cast("long")) / n) for i in range(1, 10)])


# ------------------------------------------------ DataFrame-level features

def query_count_uniques(df: DataFrame, x: str,
                        by: Sequence[str] | None = None) -> DataFrame:
    """Count of values occurring exactly once (polars `is_unique().sum()`
    semantics). Ref ts_features.py:107. Two groupBys, both map-side
    combinable."""
    keys = list(by) if by else []
    vc = df.groupBy(*keys, to_col(x).alias("__v")).agg(F.count(F.lit(1)).alias("__c"))
    agg = F.sum((F.col("__c") == 1).cast("long")).alias("n_unique")
    return vc.groupBy(*keys).agg(agg) if keys else vc.agg(agg)


def query_entropy(df: DataFrame, x: str, base: float | None = None,
                  by: Sequence[str] | None = None) -> DataFrame:
    """Shannon entropy of the value distribution (natural log by default,
    matching polars `.entropy()`). Ref ts_features.py:484."""
    import math as _m

    keys = list(by) if by else []
    vc = df.groupBy(*keys, to_col(x).alias("__v")).agg(F.count(F.lit(1)).alias("__c"))
    if keys:
        p = F.col("__c") / F.sum("__c").over(group_window(keys))
    else:
        # distinct-value frame is unbounded for continuous x: scalar agg +
        # broadcast join, not an empty-partition window
        vc = with_global_totals(vc, __tot=F.sum("__c"))
        p = F.col("__c") / F.col("__tot")
    step = vc.select(*keys, (-p * F.log(p)).alias("__e"))
    e = F.sum("__e")
    if base is not None:
        e = e / F.lit(_m.log(base))
    agg = e.alias("entropy")
    return step.groupBy(*keys).agg(agg) if keys else step.agg(agg)


def query_cond_entropy(df: DataFrame, x: str, y: str,
                       by: Sequence[str] | None = None) -> DataFrame:
    """Conditional entropy H(x|y) (agg over joint value counts).
    Ref ts_features.py:500."""
    keys = list(by) if by else []
    joint = df.groupBy(*keys, to_col(x).alias("__x"), to_col(y).alias("__y")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    wy = Window.partitionBy(*(keys + ["__y"])) if keys else Window.partitionBy("__y")
    if keys:
        p_xy = F.col("__c") / F.sum("__c").over(group_window(keys))
    else:
        joint = with_global_totals(joint, __tot=F.sum("__c"))
        p_xy = F.col("__c") / F.col("__tot")
    p_x_given_y = F.col("__c") / F.sum("__c").over(wy)
    step = joint.select(*keys, (-p_xy * F.log(p_x_given_y)).alias("__e"))
    agg = F.sum("__e").alias("cond_entropy")
    return step.groupBy(*keys).agg(agg) if keys else step.agg(agg)


def query_mean_abs_change(df: DataFrame, x: str, order_by,
                          by: Sequence[str] | None = None) -> DataFrame:
    """mean |x_i - x_{i-1}| along order_by. Ref ts_features.py:76."""
    keys = list(by) if by else []
    w = ordered_window(order_by, keys or None)
    xx = to_col(x)
    d = F.abs(xx - F.lag(xx).over(w))
    step = df.select(*keys, d.alias("__d"))
    agg = F.avg("__d").alias("mean_abs_change")
    return step.groupBy(*keys).agg(agg) if keys else step.agg(agg)


def query_c3_stats(df: DataFrame, x: str, lag: int, order_by,
                   by: Sequence[str] | None = None) -> DataFrame:
    """c3 non-linearity: Σ x_i·x_{i-lag}·x_{i-2lag} / (n - 2lag).
    Ref ts_features.py:336."""
    keys = list(by) if by else []
    w = ordered_window(order_by, keys or None)
    xx = to_col(x)
    prod = xx * F.lag(xx, lag).over(w) * F.lag(xx, 2 * lag).over(w)
    step = df.select(*keys, prod.alias("__p"))
    agg = (F.sum("__p") / (F.count(F.lit(1)) - 2 * lag)).alias("c3")
    return step.groupBy(*keys).agg(agg) if keys else step.agg(agg)


def query_cid_ce(df: DataFrame, x: str, order_by,
                 by: Sequence[str] | None = None,
                 normalize: bool = False) -> DataFrame:
    """Complexity estimate sqrt(Σ (x_i - x_{i+1})²), optionally on the
    z-normalized series. Ref ts_features.py:356."""
    keys = list(by) if by else []
    xx = to_col(x).cast("double")
    if normalize:
        gw = group_window(keys or None)
        xx = (xx - F.mean(xx).over(gw)) / F.stddev_samp(xx).over(gw)
        df = df.select(*keys, xx.alias("__z"), to_col(order_by).alias("__o"))
        xx, order_by = F.col("__z"), "__o"
    w = ordered_window(order_by, keys or None)
    d = xx - F.lead(xx).over(w)
    step = df.select(*keys, (d * d).alias("__d2"))
    agg = F.sqrt(F.sum("__d2")).alias("cid_ce")
    return step.groupBy(*keys).agg(agg) if keys else step.agg(agg)


def query_time_reversal_asymmetry_stats(df: DataFrame, x: str, n_lags: int,
                                        order_by,
                                        by: Sequence[str] | None = None) -> DataFrame:
    """mean(L(x)·(L²(x)+x)·(L²(x)-x)) with leads of n_lags.
    Ref ts_features.py:382."""
    keys = list(by) if by else []
    w = ordered_window(order_by, keys or None)
    xx = to_col(x)
    one = F.lead(xx, n_lags).over(w)
    two = F.lead(xx, 2 * n_lags).over(w)
    cell = one * (two + xx) * (two - xx)
    step = df.select(*keys, cell.alias("__c"))
    agg = F.avg("__c").alias("time_reversal_asymmetry")
    return step.groupBy(*keys).agg(agg) if keys else step.agg(agg)


def query_auto_corr(df: DataFrame, x: str, lag: int, order_by,
                    by: Sequence[str] | None = None, ddof: int = 0,
                    normalize: bool = True) -> DataFrame:
    """Autocorrelation at the given lag: dot(x_m, lead(x_m, lag)) /
    ((n-lag)·var). Ref ts_features.py:393."""
    keys = list(by) if by else []
    gw = group_window(keys or None)
    xx = to_col(x).cast("double")
    xm = xx - F.mean(xx).over(gw)
    var = F.var_samp(xx).over(gw) if ddof == 1 else F.var_pop(xx).over(gw)
    step = df.select(*keys, to_col(order_by).alias("__o"), xm.alias("__xm"),
                     var.alias("__var"), xx.alias("__x"))
    w = ordered_window("__o", keys or None)
    if normalize:
        prod = F.col("__xm") * F.lead("__xm", lag).over(w)
        step2 = step.select(*keys, prod.alias("__p"), F.col("__var"))
        agg = (F.sum("__p") / ((F.count(F.lit(1)) - lag) * F.first("__var"))).alias("auto_corr")
    else:
        prod = F.col("__x") * F.lead("__x", lag).over(w)
        step2 = step.select(*keys, prod.alias("__p"))
        agg = F.avg("__p").alias("auto_corr")
    return step2.groupBy(*keys).agg(agg) if keys else step2.agg(agg)


def _streak_lengths(df: DataFrame, where, order_by,
                    keys: list[str]) -> DataFrame:
    """Run-length encode the boolean `where` along order_by: classic
    gaps-and-islands (row_number - conditional row_number)."""
    cond = to_col(where).cast("boolean")
    w = ordered_window(order_by, keys or None)
    rn = F.row_number().over(w)
    step = df.select(*keys, cond.alias("__c"), rn.alias("__rn"))
    wc = (
        Window.partitionBy(*keys, "__c") if keys else Window.partitionBy("__c")
    ).orderBy("__rn")
    island = F.col("__rn") - F.row_number().over(wc)
    runs = step.select(*keys, F.col("__c"), island.alias("__i"))
    return runs.groupBy(*keys, "__c", "__i").agg(F.count(F.lit(1)).alias("len"))


def query_longest_streak(df: DataFrame, where, order_by,
                         by: Sequence[str] | None = None) -> DataFrame:
    """Longest run where the condition holds. Ref ts_features.py:121."""
    keys = list(by) if by else []
    runs = _streak_lengths(df, where, order_by, keys).where(F.col("__c"))
    agg = F.max("len").alias("longest_streak")
    return runs.groupBy(*keys).agg(agg) if keys else runs.agg(agg)


def query_avg_streak(df: DataFrame, where, order_by,
                     by: Sequence[str] | None = None) -> DataFrame:
    """Average true-run length. Ref ts_features.py:152."""
    keys = list(by) if by else []
    runs = _streak_lengths(df, where, order_by, keys).where(F.col("__c"))
    agg = F.avg("len").alias("avg_streak")
    return runs.groupBy(*keys).agg(agg) if keys else runs.agg(agg)


def query_streak(df: DataFrame, where, order_by,
                 by: Sequence[str] | None = None) -> DataFrame:
    """Per-row current streak length of the condition (gaps-and-islands
    cumulative count). Ref ts_features.py:184."""
    keys = list(by) if by else []
    cond = to_col(where).cast("boolean")
    w = ordered_window(order_by, keys or None)
    rn = F.row_number().over(w)
    step = df.select("*", cond.alias("__c"), rn.alias("__rn"))
    wc = (
        Window.partitionBy(*keys, "__c") if keys else Window.partitionBy("__c")
    ).orderBy("__rn")
    step = step.withColumn("__island", F.col("__rn") - F.row_number().over(wc))
    wi = (
        Window.partitionBy(*keys, "__c", "__island")
        if keys else Window.partitionBy("__c", "__island")
    ).orderBy("__rn")
    return step.withColumn("streak", F.row_number().over(wi)).drop(
        "__c", "__rn", "__island"
    )


# ----------------------------------------------------------- model features

def query_ar_coeffs(df: DataFrame, x: str, order_by, p: int,
                    by: Sequence[str] | None = None) -> DataFrame:
    """AR(p) coefficients via Yule-Walker. Ref ts_features.py:419.

    Distributed shape: autocovariances c_0..c_p from lagged products
    (one sort-shuffle), then the p×p Toeplitz solve runs per group on
    the TINY aggregated frame (applyInPandas over G rows — the series
    itself never leaves the executors).
    Output: ``by`` + phi_1..phi_p.
    """
    import numpy as np
    import pandas as pd

    keys = list(by) if by else []
    xx = to_col(x).cast("double")
    gw = group_window(keys or None)
    dx = (xx - F.mean(xx).over(gw)).alias("__dx")
    step = df.select(*keys, to_col(order_by).alias("__o"), dx)
    wo = ordered_window("__o", keys or None)
    step2 = step.select(*keys, "__dx",
                        *[F.lag("__dx", k).over(wo).alias(f"__l{k}")
                          for k in range(p + 1)])
    aggs = [
        (F.sum(F.col("__dx") * F.col(f"__l{k}")) / F.count(F.lit(1))).alias(f"__c{k}")
        for k in range(p + 1)
    ]
    cov = step2.groupBy(*keys).agg(*aggs) if keys else step2.agg(*aggs)

    key_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (", ".join(f"{k} {key_types[k]}" for k in keys)
              + (", " if keys else "")
              + ", ".join(f"phi_{i} double" for i in range(1, p + 1)))

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: pdf[k] for k in keys}
        c = pdf[[f"__c{k}" for k in range(p + 1)]].to_numpy(dtype="float64")
        phis = np.full((len(pdf), p), np.nan)
        for i in range(len(pdf)):
            r = c[i] / c[i][0]
            toep = np.array([[r[abs(a - b)] for b in range(p)] for a in range(p)])
            try:
                phis[i] = np.linalg.solve(toep, r[1:p + 1])
            except np.linalg.LinAlgError:
                pass
        for j in range(p):
            out[f"phi_{j + 1}"] = phis[:, j]
        return pd.DataFrame(out)

    if keys:
        return cov.groupBy(*keys).applyInPandas(_solve, schema)
    return cov.withColumn("__g", F.lit(1)).groupBy("__g") \
        .applyInPandas(lambda pdf: _solve(pdf.drop(columns="__g")), schema)


def _series_apply(df: DataFrame, x: str, order_by,
                  by: Sequence[str] | None, fn, out_cols: str) -> DataFrame:
    """Run a numpy kernel per ordered series group (executor-sized
    groups — documented constraint shared with the reference's
    whole-series kernels)."""
    import pandas as pd

    keys = list(by) if by else []
    key_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (", ".join(f"{k} {key_types[k]}" for k in keys)
              + (", " if keys else "") + out_cols)

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__o")
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out.update(fn(pdf["__x"].to_numpy(dtype="float64")))
        return pd.DataFrame(out)

    step = df.select(*keys, to_col(order_by).alias("__o"),
                     to_col(x).cast("double").alias("__x"))
    if keys:
        return step.groupBy(*keys).applyInPandas(_apply, schema)
    return step.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(
        lambda pdf: _apply(pdf.drop(columns="__g")), schema)


def _cheb_within(xv, m: int, r: float, s0: int, s1: int):
    """Boolean (s1-s0, n_t) block: Chebyshev distance ≤ r between
    template rows [s0, s1) and ALL templates — vectorized over the m
    window offsets (m numpy ops per block) instead of a Python loop
    over the n templates (measured ~8x on the 2k-sample kernels)."""
    import numpy as np

    n_t = xv.size - m + 1
    D = None
    for k in range(m):
        diff = np.abs(xv[s0 + k:s1 + k, None] - xv[None, k:k + n_t])
        D = diff if D is None else np.maximum(D, diff)
    return D <= r


_CHEB_BLOCK_BYTES = 256 * 1024 * 1024  # per-offset diff block budget


def _cheb_chunk(n_t: int, chunk) -> int:
    """Chunk rows so the (chunk, n_t) float64 diff block stays bounded
    in BYTES, not rows — a fixed 4096-row chunk is ~3.2 GB transient at
    a 100k-point series, enough to OOM an executor."""
    if chunk is not None:
        return chunk
    return max(256, _CHEB_BLOCK_BYTES // (8 * max(1, n_t)))


def _entropy_counts(xv, m: int, r: float, chunk: "int | None" = None) -> int:
    """#template pairs (i<j) of length m within Chebyshev distance r.
    Byte-budget row chunking keeps the pairwise block bounded
    regardless of series length."""
    n = xv.size - m + 1
    if n <= 1:
        return 0
    chunk = _cheb_chunk(n, chunk)
    total = 0
    for s0 in range(0, n, chunk):
        s1 = min(s0 + chunk, n)
        total += int(_cheb_within(xv, m, r, s0, s1).sum())
    # the full symmetric matrix counts each i<j pair twice and every
    # self-pair once (D_ii = 0 <= r always)
    return (total - n) // 2


def query_sample_entropy(df: DataFrame, x: str, order_by,
                         by: Sequence[str] | None = None,
                         m: int = 2, r_factor: float = 0.2) -> DataFrame:
    """Sample entropy −ln(A/B) with r = r_factor·std (Richman & Moorman
    2000). Ref ts_features.py:519. Whole-series numpy kernel per group.
    Output: ``by`` + sample_entropy."""
    import math

    import numpy as np

    def _kernel(xv: "np.ndarray") -> dict:
        if xv.size < m + 2:
            return {"sample_entropy": [float("nan")]}
        r = r_factor * float(np.std(xv, ddof=0))
        b = _entropy_counts(xv, m, r)
        a = _entropy_counts(xv, m + 1, r)
        if a == 0 or b == 0:
            return {"sample_entropy": [float("nan")]}
        return {"sample_entropy": [-math.log(a / b)]}

    return _series_apply(df, x, order_by, by, _kernel, "sample_entropy double")


def query_approx_entropy(df: DataFrame, x: str, order_by,
                         by: Sequence[str] | None = None,
                         m: int = 2, r_factor: float = 0.2) -> DataFrame:
    """Approximate entropy Φ_m − Φ_{m+1} (Pincus 1991, self-matches
    included). Ref ts_features.py:571. Output: ``by`` + approx_entropy."""
    import numpy as np

    def _phi(xv, mm, r, chunk=None):
        # self-matches included (Pincus 1991); same k-vectorized
        # byte-budget chunking as _entropy_counts
        n = xv.size - mm + 1
        chunk = _cheb_chunk(n, chunk)
        tot = 0.0
        for s0 in range(0, n, chunk):
            s1 = min(s0 + chunk, n)
            cnt = _cheb_within(xv, mm, r, s0, s1).sum(axis=1)
            tot += float(np.log(cnt / n).sum())
        return tot / n

    def _kernel(xv: "np.ndarray") -> dict:
        if xv.size < m + 2:
            return {"approx_entropy": [float("nan")]}
        r = r_factor * float(np.std(xv, ddof=0))
        return {"approx_entropy": [_phi(xv, m, r) - _phi(xv, m + 1, r)]}

    return _series_apply(df, x, order_by, by, _kernel, "approx_entropy double")


def query_lempel_ziv(df: DataFrame, x: str, order_by,
                     by: Sequence[str] | None = None,
                     as_ratio: bool = True) -> DataFrame:
    """LZ76 complexity of the series binarized at its median
    (Lempel & Ziv 1976). Ref ts_features.py:314.
    Output: ``by`` + lempel_ziv (count, or count/n when as_ratio)."""
    import numpy as np

    def _kernel(xv: "np.ndarray") -> dict:
        if xv.size == 0:
            return {"lempel_ziv": [float("nan")]}
        s = bytes((xv > np.median(xv)).astype(np.uint8))
        n = len(s)
        seen: set[bytes] = set()
        ind, inc = 0, 1
        while ind + inc <= n:
            sub = s[ind:ind + inc]
            if sub in seen:
                inc += 1
            else:
                seen.add(sub)
                ind += inc
                inc = 1
        out = len(seen) / n if as_ratio else float(len(seen))
        return {"lempel_ziv": [out]}

    return _series_apply(df, x, order_by, by, _kernel, "lempel_ziv double")


def query_series_entropies(df: DataFrame, x: str, order_by,
                           by: Sequence[str] | None = None,
                           m: int = 2, r_factor: float = 0.2,
                           as_ratio: bool = True) -> DataFrame:
    """Sample entropy, approximate entropy and LZ76 complexity in ONE
    grouped pass (refs ts_features.py:519/:571/:314) — same math as the
    three single-metric kernels above, value-identical by construction:

    * one chunked Chebyshev sweep per template length serves BOTH
      estimators: ``block.sum(axis=1)`` is the per-template match count
      (self-matches included), whose total feeds SampEn's pair count
      ``(Σcnt − n)/2`` and whose ``Σ log(cnt/n)/n`` is ApEn's Φ — so the
      fused kernel does 2 sweeps (m, m+1) where the separate kernels do
      4, and the series shuffles to the executors ONCE instead of three
      times (plus a fourth for the group-size count this also returns);
    * the LZ76 loop is query_lempel_ziv's, inlined verbatim so that
      kernel's covering code is untouched.

    Output: ``by`` + n_used (group size) + sample_entropy +
    approx_entropy + lempel_ziv. NaN semantics match the single-metric
    kernels (entropies need ≥ m+2 points; SampEn NaN when either pair
    count is zero; LZ NaN only on empty input).
    """
    import math

    import numpy as np

    def _sweep(xv, mm: int, r: float):
        # shared Chebyshev pass: pair count for SampEn + Φ for ApEn
        n = xv.size - mm + 1
        chunk = _cheb_chunk(n, None)
        pairs = 0
        log_sum = 0.0
        for s0 in range(0, n, chunk):
            s1 = min(s0 + chunk, n)
            cnt = _cheb_within(xv, mm, r, s0, s1).sum(axis=1)
            pairs += int(cnt.sum())
            log_sum += float(np.log(cnt / n).sum())
        return (pairs - n) // 2, log_sum / n

    def _kernel(xv: "np.ndarray") -> dict:
        nan = float("nan")
        out = {"n_used": [int(xv.size)], "sample_entropy": [nan],
               "approx_entropy": [nan], "lempel_ziv": [nan]}
        if xv.size:
            s = bytes((xv > np.median(xv)).astype(np.uint8))
            n = len(s)
            seen: set[bytes] = set()
            ind, inc = 0, 1
            while ind + inc <= n:
                sub = s[ind:ind + inc]
                if sub in seen:
                    inc += 1
                else:
                    seen.add(sub)
                    ind += inc
                    inc = 1
            out["lempel_ziv"] = [len(seen) / n if as_ratio
                                 else float(len(seen))]
        if xv.size >= m + 2:
            r = r_factor * float(np.std(xv, ddof=0))
            b, phi_m = _sweep(xv, m, r)
            a, phi_m1 = _sweep(xv, m + 1, r)
            if a > 0 and b > 0:
                out["sample_entropy"] = [-math.log(a / b)]
            out["approx_entropy"] = [phi_m - phi_m1]
        return out

    return _series_apply(
        df, x, order_by, by, _kernel,
        "n_used bigint, sample_entropy double, approx_entropy double, "
        "lempel_ziv double")


def query_permute_entropy(df: DataFrame, x: str, order_by,
                          by: Sequence[str] | None = None,
                          m: int = 3) -> DataFrame:
    """Permutation entropy (Bandt & Pompe 2002): −Σ p(π)·ln p(π) over
    ordinal patterns of m consecutive values. Ref ts_features.py:734
    (any n_dims > 1; tau fixed at 1 here).

    m=3 (the common case) is fully JVM: two lags encode the pattern via
    pairwise comparisons (stable tie-break by position, matching
    argsort), then a tiny pattern-frequency aggregation — no
    whole-series kernel. Other m auto-route through the per-group
    numpy kernel (stable-argsort codes over a sliding window view;
    entropy depends only on the pattern partition, so any injective
    encoding agrees with the JVM path). Output: ``by`` +
    permute_entropy.
    """
    if m < 2:
        raise ValueError("m must be > 1")
    if m != 3:
        import numpy as np

        def _kernel(xv: "np.ndarray") -> dict:
            if xv.size < m:
                return {"permute_entropy": [float("nan")]}
            W = np.lib.stride_tricks.sliding_window_view(xv, m)
            P = np.argsort(W, axis=1, kind="stable")
            codes = (P * (m ** np.arange(m))).sum(1)
            _, counts = np.unique(codes, return_counts=True)
            p = counts / counts.sum()
            return {"permute_entropy": [float(-(p * np.log(p)).sum())]}

        return _series_apply(df, x, order_by, by, _kernel,
                             "permute_entropy double")
    keys = list(by) if by else []
    xx = to_col(x).cast("double")
    w = ordered_window(order_by, keys or None)
    b = F.lead(xx, 1).over(w)
    c = F.lead(xx, 2).over(w)
    # stable-argsort pattern id from pairwise strict comparisons
    pat = (
        (b < xx).cast("int") * 4 + (c < xx).cast("int") * 2 + (c < b).cast("int")
    )
    # drop the last two positions of each series (incomplete triples)
    step = df.select(*keys, pat.alias("__p"), c.alias("__c")) \
        .where(F.col("__c").isNotNull())
    cnt = step.groupBy(*keys, "__p").agg(F.count(F.lit(1)).cast("double").alias("__n"))
    if keys:
        p = F.col("__n") / F.sum("__n").over(Window.partitionBy(*keys))
    else:
        cnt = with_global_totals(cnt, __tot=F.sum("__n"))
        p = F.col("__n") / F.col("__tot")
    ent = cnt.select(*keys, (-p * F.log(p)).alias("__e"))
    agg = [F.sum("__e").alias("permute_entropy")]
    return ent.groupBy(*keys).agg(*agg) if keys else ent.agg(*agg)


def query_similar_count(df: DataFrame, x: str, order_by,
                        by: Sequence[str] | None = None,
                        window: int = 6, threshold: float = 0.5,
                        metric: str = "l2") -> DataFrame:
    """Count of sliding windows within ``threshold`` of the SERIES'
    LEADING window (self-similarity count). Ref ts_features.py:239.
    Whole-series numpy kernel per group.
    Output: ``by`` + similar_count."""
    import numpy as np

    def _kernel(xv: "np.ndarray") -> dict:
        if xv.size < window:
            return {"similar_count": [0]}
        t = np.lib.stride_tricks.sliding_window_view(xv, window)
        ref = t[0]
        if metric == "l2":
            d = np.sqrt(((t - ref) ** 2).sum(1))
        else:
            d = np.max(np.abs(t - ref), axis=1)
        return {"similar_count": [int((d[1:] <= threshold).sum())]}

    return _series_apply(df, x, order_by, by, _kernel, "similar_count bigint")


def query_knn_entropy(df: DataFrame, x: str, order_by,
                      by: Sequence[str] | None = None,
                      k: int = 3) -> DataFrame:
    """Differential entropy of the value distribution via the 1-D
    Kozachenko-Leonenko k-NN estimator:
    H ≈ ψ(n) − ψ(k) + (1/n)·Σ ln(2·r_k(i)). Ref ts_features.py
    (knn_entropy). Whole-series kernel: sorted values make the k-NN
    search a 2k-window scan. Output: ``by`` + knn_entropy."""
    import numpy as np

    from ._special import digamma

    def _kernel(xv: "np.ndarray") -> dict:
        n = xv.size
        if n <= k:
            return {"knn_entropy": [float("nan")]}
        s = np.sort(xv)
        # kth smallest |diff| among the k sorted neighbors on each side
        cands = np.full((n, 2 * k), np.inf)
        for j in range(1, k + 1):
            cands[j:, j - 1] = s[j:] - s[:-j]
            cands[:-j, k + j - 1] = s[j:] - s[:-j]
        r = np.partition(cands, k - 1, axis=1)[:, k - 1]
        r = np.maximum(r, 1e-300)
        h = digamma(n) - digamma(k) + float(np.log(2.0 * r).mean())
        return {"knn_entropy": [h]}

    return _series_apply(df, x, order_by, by, _kernel, "knn_entropy double")


def _equal_width_bin(v: Column, vmin: Column, vmax: Column, bins: int) -> Column:
    span = vmax - vmin
    raw = F.floor((v - vmin) / span * bins).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))


def query_transfer_entropy(df: DataFrame, x: str, y: str, order_by,
                           by: Sequence[str] | None = None,
                           bins: int = 5) -> DataFrame:
    """Discretized transfer entropy TE(y→x) (Schreiber 2000):
    H(x_{t+1}|x_t) − H(x_{t+1}|x_t, y_t) over equal-width bins.
    Ref ts_features.py (transfer_entropy; reference uses a KNN estimator —
    this is the standard binned estimator, fully JVM).

    Counts-only: TE = (1/N)·Σ n_abc·ln(n_abc·n_b / (n_bc·n_ab)) over the
    (next, cur, driver) joint histogram — one lag window + one groupBy on
    ≤ bins³ states + window margins on that tiny frame.
    Output: ``by`` + transfer_entropy.
    """
    keys = list(by) if by else []
    gw = group_window(keys or None)
    w = ordered_window(order_by, keys or None)
    xx, yy = to_col(x).cast("double"), to_col(y).cast("double")
    bx = _equal_width_bin(xx, F.min(xx).over(gw), F.max(xx).over(gw), bins)
    by_ = _equal_width_bin(yy, F.min(yy).over(gw), F.max(yy).over(gw), bins)
    step = df.select(*keys,
                     F.lead(bx, 1).over(w).alias("__a"),
                     bx.alias("__b"), by_.alias("__c"))
    step = step.where(F.col("__a").isNotNull())
    joint = step.groupBy(*keys, "__a", "__b", "__c").agg(
        F.count(F.lit(1)).cast("double").alias("__n"))
    wb = Window.partitionBy(*keys, "__b") if keys else Window.partitionBy("__b")
    wbc = Window.partitionBy(*keys, "__b", "__c") if keys \
        else Window.partitionBy("__b", "__c")
    wab = Window.partitionBy(*keys, "__a", "__b") if keys \
        else Window.partitionBy("__a", "__b")
    wall = group_window(keys or None)
    n = F.col("__n")
    term = n * F.log(n * F.sum(n).over(wb) /
                     (F.sum(n).over(wbc) * F.sum(n).over(wab)))
    cells = joint.select(*keys, term.alias("__t"), n.alias("__n"))
    aggs = [(F.sum("__t") / F.sum("__n")).alias("transfer_entropy")]
    return cells.groupBy(*keys).agg(*aggs) if keys else cells.agg(*aggs)


def query_copula_entropy(df: DataFrame, x: str, y: str,
                         by: Sequence[str] | None = None,
                         bins: int = 10) -> DataFrame:
    """Copula entropy = −MI of the rank-transformed pair (Ma & Sun 2011),
    estimated on a bins×bins grid of rank quantiles. Ref ts_features.py
    (copula_entropy; reference estimates via KNN).

    Ranks: partitioned windows when grouped; the scale-safe two-pass
    plan (plans/ranks.py) for the global case. The MI itself is a tiny
    bins² count aggregation. Output: ``by`` + copula_entropy.
    """
    keys = list(by) if by else []
    if keys:
        wx = Window.partitionBy(*keys).orderBy(to_col(x))
        wy = Window.partitionBy(*keys).orderBy(to_col(y))
        step = df.select(*keys, F.rank().over(wx).cast("double").alias("__rx"),
                         F.rank().over(wy).cast("double").alias("__ry"))
    else:
        # fused two-column rank plan (r15): one boundary agg + one pin
        # + one offsets-grid collect for both min-rank columns
        from ..plans.ranks import global_rank_pair
        pre = df.select(to_col(x).alias("__x"), to_col(y).alias("__y"))
        step = global_rank_pair(pre, "__x", "__y", "__rx", "__ry",
                                avg_ties=False)
    if keys:
        nrow = F.count(F.lit(1)).over(group_window(keys)).cast("double")
    else:
        step = with_global_totals(step, __nrow=F.count(F.lit(1)).cast("double"))
        nrow = F.col("__nrow")
    bx = F.least(F.ceil(F.col("__rx") / nrow * bins).cast("int"), F.lit(bins))
    bny = F.least(F.ceil(F.col("__ry") / nrow * bins).cast("int"), F.lit(bins))
    binned = step.select(*keys, bx.alias("__i"), bny.alias("__j"))
    joint = binned.groupBy(*keys, "__i", "__j").agg(
        F.count(F.lit(1)).cast("double").alias("__n"))
    wi = Window.partitionBy(*keys, "__i") if keys else Window.partitionBy("__i")
    wj = Window.partitionBy(*keys, "__j") if keys else Window.partitionBy("__j")
    n = F.col("__n")
    if keys:
        tot = F.sum(n).over(group_window(keys))
    else:
        joint = with_global_totals(joint, __tot=F.sum("__n"))
        tot = F.col("__tot")
    term = n * F.log(n * tot / (F.sum(n).over(wi) * F.sum(n).over(wj)))
    cells = joint.select(*keys, term.alias("__t"), n.alias("__n"))
    aggs = [(-F.sum("__t") / F.sum("__n")).alias("copula_entropy")]
    return cells.groupBy(*keys).agg(*aggs) if keys else cells.agg(*aggs)


def query_cond_indep(df: DataFrame, x: str, y: str, z: str,
                     by: Sequence[str] | None = None,
                     bins: int = 5) -> DataFrame:
    """Conditional mutual information I(x;y|z) over equal-width bins —
    the test statistic of a conditional-independence check (≈0 ⟺ x ⊥ y
    given z). Ref ts_features.py (cond_indep; reference uses a KNN
    estimator, this is the standard binned one).

    CMI = (1/N)·Σ n_xyz·ln(n_xyz·n_z / (n_xz·n_yz)) — one groupBy on
    ≤ bins³ states + window margins on the tiny frame, fully JVM.
    Output: ``by`` + cmi.
    """
    keys = list(by) if by else []
    xx, yy, zz = [to_col(c).cast("double") for c in (x, y, z)]
    sel = df.select(*keys, xx.alias("__xv"), yy.alias("__yv"), zz.alias("__zv"))
    if keys:
        gw = group_window(keys)
        lims = {c: (F.min(c).over(gw), F.max(c).over(gw))
                for c in ("__xv", "__yv", "__zv")}
    else:
        sel = with_global_totals(
            sel,
            **{f"__mn{c}": F.min(c) for c in ("__xv", "__yv", "__zv")},
            **{f"__mx{c}": F.max(c) for c in ("__xv", "__yv", "__zv")},
        )
        lims = {c: (F.col(f"__mn{c}"), F.col(f"__mx{c}"))
                for c in ("__xv", "__yv", "__zv")}
    bx = _equal_width_bin(F.col("__xv"), *lims["__xv"], bins)
    by2 = _equal_width_bin(F.col("__yv"), *lims["__yv"], bins)
    bz = _equal_width_bin(F.col("__zv"), *lims["__zv"], bins)
    step = sel.select(*keys, bx.alias("__x"), by2.alias("__y"), bz.alias("__z"))
    joint = step.groupBy(*keys, "__x", "__y", "__z").agg(
        F.count(F.lit(1)).cast("double").alias("__n"))
    wz = Window.partitionBy(*keys, "__z") if keys else Window.partitionBy("__z")
    wxz = Window.partitionBy(*keys, "__x", "__z") if keys \
        else Window.partitionBy("__x", "__z")
    wyz = Window.partitionBy(*keys, "__y", "__z") if keys \
        else Window.partitionBy("__y", "__z")
    n = F.col("__n")
    term = n * F.log(n * F.sum(n).over(wz) /
                     (F.sum(n).over(wxz) * F.sum(n).over(wyz)))
    cells = joint.select(*keys, term.alias("__t"), n.alias("__n"))
    aggs = [(F.sum("__t") / F.sum("__n")).alias("cmi")]
    return cells.groupBy(*keys).agg(*aggs) if keys else cells.agg(*aggs)
