"""Parquet source registry for the synthetic TPC-H-ish test tables.

Columnar parquet scans get predicate pushdown + column pruning for free
as long as callers select/filter before wide transforms — every operator
in this repo takes DataFrames, so Catalyst prunes through them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The testdata writes TIMESTAMP(NANOS) which Spark rejects unless this
    # runtime-settable conf is on. Set it here (not only in session.py) so an
    # externally-constructed SparkSession — e.g. the driver's — can read too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # nanos timestamps surface as long when legacy.parquet.nanosAsLong is
    # on — normalize to a proper timestamp column.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer `div`, not float /: nanos ~1.7e18 exceed double's 53-bit
        # mantissa, so a float division is off by ±256ns → ±1µs after cast
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def load_csv(spark: SparkSession, path: str, schema: str | None = None,
             header: bool = True, **options) -> DataFrame:
    """CSV scan with an EXPLICIT schema when known — inferSchema costs a
    full extra pass over the data, which at scale doubles ingest."""
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.csv(path)


def load_json(spark: SparkSession, path: str, schema: str | None = None,
              **options) -> DataFrame:
    """JSON-lines scan; same explicit-schema guidance as load_csv (schema
    inference reads everything once before the real scan)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.json(path)
