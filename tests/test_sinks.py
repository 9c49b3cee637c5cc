"""Sink helpers: size-aware parquet writes and the streaming file sink."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.sources import (estimate_row_bytes,
                                               stream_to_parquet,
                                               write_parquet)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="pds_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_write_parquet_file_sizing(spark, outdir):
    df = spark.range(0, 200_000).select(
        F.col("id"), (F.col("id") % 4).alias("bucket"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    # ~200k rows * ~80B ≈ 16MB raw → 2MB files ⇒ a handful of files,
    # not one-per-shuffle-partition (32) and not a single giant file
    path = os.path.join(outdir, "flat")
    write_parquet(df, path, target_file_mb=2, n_rows=200_000)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert 1 < len(files) < 16
    back = spark.read.parquet(path)
    assert back.count() == 200_000

    # partitioned write: hive layout per bucket, rows intact
    p2 = os.path.join(outdir, "parts")
    write_parquet(df, p2, partition_by=["bucket"], target_file_mb=2,
                  n_rows=200_000)
    assert len(glob.glob(os.path.join(p2, "bucket=*"))) == 4
    assert spark.read.parquet(p2).count() == 200_000


def test_estimate_row_bytes(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("h"))
    est = estimate_row_bytes(df)
    assert 40 < est < 200  # ~64-char hash + long + overhead


def test_stream_to_parquet(spark, outdir):
    src = os.path.join(outdir, "src")
    spark.range(0, 1000).withColumn("v", F.col("id") * 2.0) \
        .coalesce(1).write.parquet(src)
    s = spark.readStream.schema("id long, v double").parquet(src)
    q = stream_to_parquet(s.where(F.col("id") % 2 == 0),
                          os.path.join(outdir, "out"),
                          os.path.join(outdir, "ckpt"), trigger_once=True)
    q.awaitTermination(120)
    got = spark.read.parquet(os.path.join(outdir, "out"))
    assert got.count() == 500
