"""Structured-Streaming operator tests: file source → memory sink with
availableNow trigger, asserting against the batch equivalents."""

import os
import shutil
import tempfile
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark import streaming as STR


@pytest.fixture(scope="module")
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="pds_stream_")
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=100, freq="30s"),
        "user": [f"u{i % 5}" for i in range(100)],
        "text": [f"doc {i % 20}" for i in range(100)],  # 5 dups per text
        "value": [float(i) for i in range(100)],
    })
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, out_df, name, mode="append"):
    q = (out_df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _read_stream(spark, d):
    schema = "ts timestamp, user string, text string, value double"
    return spark.readStream.schema(schema).parquet(d)


def test_stream_windowed_agg(spark, stream_dir):
    s = _read_stream(spark, stream_dir)
    out = STR.stream_windowed_agg(
        s, "ts", "10 minutes",
        {"n": F.count(F.lit(1)), "sum_v": F.sum("value")},
        by=["user"], watermark="0 seconds",
    )
    name = f"m{uuid.uuid4().hex[:8]}"
    got = (_run_stream(spark, out, name)
           .select(F.col("window.start").alias("ws"), "user", "n", "sum_v")
           .toPandas())
    # 100 rows * 30s = 50 min → 5 windows × 5 users; append mode emits
    # only closed windows (watermark passed) → at least the first 4
    assert len(got) >= 20
    batch = (spark.read.parquet(stream_dir)
             .groupBy(F.window("ts", "10 minutes").alias("window"), "user")
             .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
             .select(F.col("window.start").alias("ws"), "user", "n", "sum_v"))
    bp = batch.toPandas()
    merged = got.merge(bp, on=["ws", "user"], suffixes=("_s", "_b"))
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (merged["sum_v_s"] == merged["sum_v_b"]).all()


def test_stream_dedup(spark, stream_dir):
    s = _read_stream(spark, stream_dir)
    out = STR.stream_dedup(s, ["text"], "ts", watermark="1 hour")
    name = f"m{uuid.uuid4().hex[:8]}"
    got = _run_stream(spark, out, name).toPandas()
    assert len(got) == 20            # 20 distinct texts
    assert got["text"].nunique() == 20


def test_stream_sessionize(spark, stream_dir):
    s = _read_stream(spark, stream_dir)
    # per-user events are 150s apart > 1min gap → every event is its own
    # session; append mode emits sessions once the watermark passes their
    # end, i.e. all but the trailing ones
    out = STR.stream_sessionize(s, "ts", "1 minute", ["user"],
                                watermark="0 seconds")
    name = f"m{uuid.uuid4().hex[:8]}"
    got = _run_stream(spark, out, name).toPandas()
    assert got["user"].nunique() == 5
    assert len(got) >= 90
    assert (got["n_events"] == 1).all()


def test_stream_running_stats(spark, stream_dir):
    s = _read_stream(spark, stream_dir)
    out = STR.stream_running_stats(s, "user", "value", "ts")
    name = f"m{uuid.uuid4().hex[:8]}"
    got = _run_stream(spark, out, name, mode="update").toPandas()
    # final state per user must equal the batch moments
    batch = (spark.read.parquet(stream_dir).groupBy("user")
             .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("mean"),
                  F.stddev_samp("value").alias("std")).toPandas())
    last = got.groupby("user").last().reset_index()
    merged = last.merge(batch, on="user", suffixes=("_s", "_b"))
    assert (merged["n_s"] == merged["n_b"]).all()
    assert merged["mean_s"].values == pytest.approx(merged["mean_b"].values)
    assert merged["std_s"].values == pytest.approx(merged["std_b"].values)


def test_stream_quality_gate_matches_batch(spark, stream_dir):
    # stateless scan-side exprs on a stream: streaming output must equal
    # the same filter run in batch over the same files
    from polars_ds_extension_spark.operators import text as T

    s = _read_stream(spark, stream_dir)
    gated = s.select("user", "text",
                     T.quality_score("text").alias("q")) \
        .where(F.col("q") >= 0.25)
    name = f"g{uuid.uuid4().hex[:8]}"
    got = _run_stream(spark, gated, name).toPandas()
    batch = (spark.read.parquet(stream_dir)
             .select("user", "text", T.quality_score("text").alias("q"))
             .where(F.col("q") >= 0.25).toPandas())
    assert len(got) == len(batch)
    assert sorted(got["text"]) == sorted(batch["text"])


def test_stream_interval_join_matches_batch(spark, stream_dir):
    out = STR.stream_interval_join(
        _read_stream(spark, stream_dir).select("user", "ts", "value"),
        _read_stream(spark, stream_dir).select("user", "ts", "value"),
        key="user", ts_left="ts", ts_right="ts",
        lower="INTERVAL 2 MINUTES", upper="INTERVAL 0 SECONDS",
        watermark="10 minutes")
    name = f"ij{uuid.uuid4().hex[:8]}"
    got = _run_stream(spark, out, name).toPandas()
    b = spark.read.parquet(stream_dir).select("user", "ts", "value")
    r = b.select(F.col("user").alias("r_user"), F.col("ts").alias("r_ts"),
                 F.col("value").alias("r_value"))
    exp = b.join(r, (F.col("user") == F.col("r_user"))
                 & (F.col("r_ts") >= F.expr("ts - INTERVAL 2 MINUTES"))
                 & (F.col("r_ts") <= F.col("ts"))).count()
    assert len(got) == exp and exp > 0


def test_stream_near_dup_flags_planted(spark):
    """Planted contamination: stream docs 1,3 are near-copies of
    reference docs, 2,4 are unique — exactly {1,3} must emit, once
    each, from a REAL stream run."""
    import tempfile

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    other = ("completely different content about distributed systems "
             "and columnar execution engines with vectorized kernels")
    ref = spark.createDataFrame(
        [(10, base), (11, other)], "doc_id long, text string")
    d = tempfile.mkdtemp(prefix="pds_nd_stream_")
    spark.createDataFrame(
        [(1, base + " zz"), (2, "u1 u2 u3 u4 u5 u6 u7 u8 totally new"),
         (3, other + " yy"), (4, "qqq www eee rrr ttt yyy uuu iii ooo")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("overwrite").parquet(d)
    s = spark.readStream.schema("doc_id long, text string").parquet(d)
    out = STR.stream_near_dup_flags(s, ref, "doc_id", "text",
                                    threshold=0.6)
    name = f"nd{uuid.uuid4().hex[:8]}"
    got = sorted(r["doc_id"] for r in
                 _run_stream(spark, out, name).collect())
    assert got == [1, 3]
