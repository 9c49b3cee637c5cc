"""Embedding-column utilities for training-data pipelines.

Normalization, scalar quantization, and per-vector statistics as pure
JVM higher-order expressions over `array<float/double>` columns —
scan-side, zero shuffle, composable with the knn/ANN operators at any
scale. Storage math: fp32 -> int8 scalar quantization cuts an embedding
lake 4x with ~equal top-k recall when vectors are normalized first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .knn import norm


def _v(c) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def l2_normalize(vec) -> Column:
    """vec / ||vec||2 (zero vectors pass through unchanged)."""
    v = _v(vec)
    n = norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def quantize_int8(vec, scale: float | None = None) -> Column:
    """Symmetric int8 scalar quantization: round(x * 127 / s), clamped
    to [-127, 127]. ``scale`` defaults to the vector's max |x| (per-row
    scale — store it alongside via :func:`quantize_scale`)."""
    v = _v(vec)
    s = F.lit(float(scale)) if scale is not None else quantize_scale(vec)
    q = lambda x: F.greatest(  # noqa: E731
        F.lit(-127),
        F.least(F.lit(127), F.round(x * 127.0 / s).cast("int")))
    return F.when(s > 0, F.transform(v, q)) \
        .otherwise(F.transform(v, lambda x: F.lit(0)))


def quantize_scale(vec) -> Column:
    """Per-vector max |x| — the dequantization scale for quantize_int8."""
    v = _v(vec)
    return F.aggregate(v, F.lit(0.0),
                       lambda acc, x: F.greatest(acc, F.abs(x)))


def dequantize_int8(qvec, scale) -> Column:
    s = scale if isinstance(scale, Column) else F.col(scale)
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    return F.transform(q, lambda x: x.cast("double") * s / 127.0)


def vector_stats(vec) -> Column:
    """Struct of per-vector norm/mean/min/max — the EDA pass that flags
    zero vectors, clipped dims, and scale drift in an embedding lake."""
    v = _v(vec)
    d = F.size(v)
    mean = F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / d
    return F.struct(
        d.alias("dim"),
        norm(v).alias("norm"),
        mean.alias("mean"),
        F.array_min(v).alias("min"),
        F.array_max(v).alias("max"),
    )
