"""Concise expression expansion — the Spark analogue of the reference's
`pds.E` (ref expander.py:6): expand (columns × aggregate names) into a
flat list of aliased Columns for `groupBy().agg(*E(...))`.

Everything stays a built-in JVM aggregate (whole-stage codegen,
map-side partials); this is purely naming sugar.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .._utils import to_col

__all__ = ["E"]

# polars method name -> pyspark.sql.functions aggregate
_RENAMES = {
    "mean": F.avg,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "n_unique": F.count_distinct,
    "null_count": lambda c: F.count(F.lit(1)) - F.count(c),
    "first": F.first,
    "last": F.last,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "median": F.median,
    "skew": F.skewness,
    "kurtosis": F.kurtosis,
    "implode": F.collect_list,
    "unique": F.collect_set,
}


def E(
    cols: str | Sequence[str],
    mappings: str | Sequence[str],
    *,
    separator: str = "_",
    len_alias: str = "__len__",
    customizer: Dict[str, Callable[[Column], Column]] | None = None,
) -> list[Column]:
    """Expand columns × aggregate-method names into aliased Columns.

    >>> df.groupBy("g").agg(*E(["a", "b"], ["min", "max", "n_unique", "len"]))
    # -> a_min, b_min, a_max, b_max, a_n_unique, b_n_unique, __len__

    ``len``/``count`` emit a single row-count column; ``null_rate`` is
    per-column null fraction. ``customizer`` maps extra names to
    ``Column -> Column`` functions applied per input column.
    """
    columns = [cols] if isinstance(cols, str) else list(cols)
    if any(not isinstance(c, str) for c in columns):
        raise TypeError("`cols` must be a column name or a list of names")
    mappings_ = [mappings] if isinstance(mappings, str) else list(mappings)
    customizer = customizer or {}

    out: list[Column] = []
    for m in mappings_:
        if m in ("len", "count"):
            out.append(F.count(F.lit(1)).alias(len_alias))
        elif m == "null_rate":
            out.extend(
                ((F.count(F.lit(1)) - F.count(to_col(c))) / F.count(F.lit(1)))
                .alias(f"{c}{separator}null_rate")
                for c in columns
            )
        elif m in customizer:
            out.extend(
                customizer[m](to_col(c)).alias(f"{c}{separator}{m}")
                for c in columns
            )
        elif m in _RENAMES:
            out.extend(
                _RENAMES[m](to_col(c)).alias(f"{c}{separator}{m}")
                for c in columns
            )
        elif hasattr(F, m):
            out.extend(
                getattr(F, m)(to_col(c)).alias(f"{c}{separator}{m}")
                for c in columns
            )
        else:
            raise ValueError(
                f"`{m}` is not a known aggregate, special mapping, or "
                "customizer key"
            )
    return out
