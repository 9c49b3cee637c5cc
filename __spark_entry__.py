"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship query on sf0.001 (TPC-H Q1-flavored rollup).
queries()        — every implemented operator as (spark, sf_dir) -> DataFrame.
oracle_sql()     — DuckDB-equivalent SQL per query (same column names,
                   same 6-dp rounding) for the t2 correctness gate.

The catalog lives in polars_ds_extension_spark.queries; this module is a
thin adapter so the package stays importable on its own.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from polars_ds_extension_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
