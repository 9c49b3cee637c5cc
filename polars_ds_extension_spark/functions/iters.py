"""Iterator-style combinatorics over column values (reference:
python/polars_ds/exprs/expr_iter.py — ``product``, ``combinations``).

The reference materializes the full cartesian product / n-choose-k in
one in-memory series, so these are small-n-by-contract operators. The
Spark shapes keep the same contract but stay distributed: a cross join
of two narrow single-column frames (product) and rank-indexed
self-joins (combinations) — Catalyst broadcasts the smaller side, and
nothing is ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._utils import to_col

__all__ = ["product_df", "combinations_df"]


def product_df(df: DataFrame, s1: str, s2: str,
               df2: DataFrame | None = None) -> DataFrame:
    """Cartesian product of the non-null values of two columns — the
    reference's ``product`` (ref expr_iter.py:13), one output row per
    ordered pair, duplicates preserved.

    ``s2`` is taken from ``df2`` when given, else from ``df`` (the
    reference's two-series form). Output columns: (s1, s2).
    """
    a = df.select(to_col(s1).alias(s1)).where(F.col(s1).isNotNull())
    right = df2 if df2 is not None else df
    b = right.select(to_col(s2).alias(s2)).where(F.col(s2).isNotNull())
    return a.crossJoin(b)


def combinations_df(df: DataFrame, source: str, k: int = 2,
                    unique: bool = False) -> DataFrame:
    """All k-combinations of the non-null values of ``source`` (ref
    expr_iter.py:85). ``unique`` dedups values first (the reference's
    ``.unique()`` flag); without it duplicate values contribute
    positionally-distinct combinations, disambiguated by a value-ranked
    index exactly like the reference's row order after sort.

    Output columns: v1..vk with v1 < v2 < ... in value-rank order.
    Like the reference, this is O(n choose k) — small-n by contract;
    the self-joins are rank-banded hash-free nested-loop joins that
    Catalyst broadcasts (the input is a narrow value list).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    vals = df.select(to_col(source).alias("__v")).where(
        F.col("__v").isNotNull())
    if unique:
        # r15: distinct values are totally ordered by VALUE, so the
        # rank-banded positional index is redundant — pair directly on
        # v1 < v2 < ... (identical output: the index was value-ranked).
        # Skips the whole two-pass rank plan (3 jobs + a pin) that only
        # the duplicate-disambiguation path below needs.
        vals = vals.distinct()
        out = vals.select(F.col("__v").alias("v1"))
        for j in range(2, k + 1):
            nxt = vals.select(F.col("__v").alias(f"v{j}"))
            out = out.join(nxt, F.col(f"v{j - 1}") < F.col(f"v{j}"))
        return out.select(*[f"v{j}" for j in range(1, k + 1)])
    # value-ranked positional index: ties (duplicate values) get distinct
    # consecutive indexes, so duplicates pair exactly once per position
    from pyspark.sql.window import Window
    from ..plans.ranks import global_min_rank
    ranked = global_min_rank(vals, "__v", out_name="__r")
    w = Window.partitionBy("__v").orderBy(F.monotonically_increasing_id())
    ranked = ranked.withColumn(
        "__i", (F.col("__r") + F.row_number().over(w) - 1).cast("long"))
    out = ranked.select(F.col("__v").alias("v1"), F.col("__i").alias("__i1"))
    for j in range(2, k + 1):
        nxt = ranked.select(F.col("__v").alias(f"v{j}"),
                            F.col("__i").alias(f"__i{j}"))
        out = out.join(nxt, F.col(f"__i{j - 1}") < F.col(f"__i{j}"))
    return out.select(*[f"v{j}" for j in range(1, k + 1)])
