"""Plot-DATA builders mirroring the reference's eda/plots.py
(plot_lin_reg, plot_pca, plot_prob_calibration, plot_roc_auc).

The reference returns Altair charts; charting libraries are a frontend
concern, so here each function returns the exact DataFrame payload the
corresponding chart consumes (same columns, same aggregation) plus the
scalar annotations (fit equation, AUC) the reference renders as text.
Feeding these frames to any plotting frontend reproduces the reference
figures.

Scale shapes: fits reduce to sufficient statistics; calibration bins
come from one percentile_approx pass embedded as literals (no global
sort); the ROC payload reuses metrics.tpr_fpr's two-pass cumsum plan;
scatter payloads are SAMPLED to max_points scan-side, exactly like the
reference's max_points contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._utils import to_col

__all__ = ["plot_lin_reg_data", "plot_pca_data",
           "plot_prob_calibration_data", "plot_roc_auc_data"]


def plot_lin_reg_data(df: DataFrame, x: str, target: str,
                      add_bias: bool = False, weights: str | None = None,
                      max_points: int = 20_000):
    """(points_df, info) for the reference's plot_lin_reg (ref
    eda/plots.py:199): fit on ALL rows via one sufficient-statistics
    aggregation, scatter payload sampled to ``max_points``. ``points_df``
    has (x, target, y_pred); ``info`` = {beta, alpha, r2, n}."""
    from .linear import _apply_null_policy

    # listwise-skip like the linear fitters: every sufficient statistic
    # (including sw and n) sees the SAME rows — a pairwise mix would
    # solve inconsistent normal equations on null-bearing inputs
    feats = [x] + ([weights] if weights else [])
    df = _apply_null_policy(df, feats, target, "skip")
    xx, yy = to_col(x).cast("double"), to_col(target).cast("double")
    w = to_col(weights).cast("double") if weights else F.lit(1.0)
    row = df.agg(
        F.sum(w).alias("sw"), F.sum(w * xx).alias("sx"),
        F.sum(w * yy).alias("sy"), F.sum(w * xx * xx).alias("sxx"),
        F.sum(w * xx * yy).alias("sxy"), F.count(F.lit(1)).alias("n"),
    ).first()
    sw, sx, sy, sxx, sxy = (float(row[k]) for k in
                            ("sw", "sx", "sy", "sxx", "sxy"))
    if add_bias:
        beta = (sxy - sx * sy / sw) / (sxx - sx * sx / sw)
        alpha = sy / sw - beta * sx / sw
    else:
        beta, alpha = sxy / sxx, 0.0
    pred = xx * F.lit(beta) + F.lit(alpha)
    # weighted r2 via the two-aggregate identity (no window needed) —
    # the same weights as the fit, SST around the weighted mean
    r2_row = df.agg(
        F.sum(w * (yy - pred) * (yy - pred)).alias("sse"),
        (F.sum(w * yy * yy) - F.sum(w * yy) * F.sum(w * yy) / F.sum(w))
        .alias("sst")).first()
    r2 = 1.0 - float(r2_row["sse"]) / float(r2_row["sst"])
    n = int(row["n"])
    points = df.select(xx.alias(x), yy.alias(target), pred.alias("y_pred"))
    if n > max_points:
        points = points.sample(fraction=min(1.0, max_points / n), seed=42)
    return points, {"beta": beta, "alpha": alpha, "r2": r2, "n": n}


def plot_pca_data(df: DataFrame, features: Sequence[str], by: str,
                  center: bool = True, dim: int = 2,
                  max_points: int = 10_000) -> DataFrame:
    """2-D PCA scatter payload (ref eda/plots.py:299): projections onto
    the top-``dim`` principal components, colored by ``by``. Columns:
    (pc1..pcK, by)."""
    if len(features) < 2:
        raise ValueError("You must pass >= 2 features.")
    if dim not in (2, 3):
        raise ValueError("Dim must be 2 or 3.")
    if not center:
        raise NotImplementedError(
            "principal_components always centers (covariance PCA)")
    from .num import principal_components

    proj = principal_components(df, features, k=dim)
    proj = proj.select(*[f"pc{i + 1}" for i in range(dim)], by)
    n = proj.count()
    if n > max_points:
        proj = proj.sample(fraction=min(1.0, max_points / n), seed=42)
    return proj


def plot_prob_calibration_data(df: DataFrame, target: str,
                               scores: Sequence[str],
                               n_bins: int = 10) -> DataFrame:
    """Calibration-curve payload (ref eda/plots.py:349): each score
    column is quantile-binned into ``n_bins`` and per bin the mean
    predicted probability and observed positive fraction are aggregated.
    Columns: (score, bin, mean_predicted_prob, fraction_of_positives).

    The reference's qcut becomes one approx-quantile pass per score with
    the breaks embedded as literals — bin assignment is then a scan-side
    expression and the aggregation is one map-side-combinable groupBy.
    """
    a = to_col(target).cast("double")
    outs = []
    probs = [i / n_bins for i in range(1, n_bins)]
    for s in scores:
        sc = to_col(s).cast("double")
        breaks = df.agg(F.percentile_approx(sc, probs, 10_000)
                        .alias("b")).first()["b"]
        bin_expr = F.lit(0)
        for b in breaks:
            bin_expr = bin_expr + (sc > F.lit(float(b))).cast("int")
        outs.append(
            df.select(sc.alias("__s"), a.alias("__a"),
                      bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(F.avg("__s").alias("mean_predicted_prob"),
                 F.avg("__a").alias("fraction_of_positives"))
            .select(F.lit(s).alias("score"), "bin",
                    "mean_predicted_prob", "fraction_of_positives"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def plot_roc_auc_data(df: DataFrame, target: str,
                      preds: Sequence[str]):
    """ROC-curve payload (ref eda/plots.py:457): per prediction column
    the (threshold, tpr, fpr) staircase from metrics.tpr_fpr (two-pass
    cumsum plan — no single-partition window) plus the AUC annotation
    per curve. Returns (curves_df with a ``name`` column, {name: auc}).
    """
    from .metrics import roc_auc, tpr_fpr

    curves, aucs = [], {}
    for p in preds:
        cur = tpr_fpr(df, target, p).select(
            F.lit(p).alias("name"), "threshold", "tpr", "fpr")
        curves.append(cur)
        aucs[p] = float(roc_auc(df, target, p).first()["roc_auc"])
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out, aucs
