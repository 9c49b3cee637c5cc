"""Structured-Streaming catalog queries (SURVEY §2.12).

Each query drives a REAL stream to completion inside the call —
parquet `readStream` → streaming operator → availableNow trigger →
memory sink — and returns the materialized result as a batch DataFrame,
so the driver's oracle harness hashes actual Structured-Streaming
output against ANSI SQL. On a static source a complete-mode watermarked
tumbling window equals the batch GROUP BY time-bucket, which is exactly
the invariant the oracle pins down.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from . import streaming as STR
from .queries import _r, query
from .sources import load_table


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming DataFrame with the same ts
    normalization as sources.load_table (nanos → timestamp)."""
    load_table(spark, sf_dir, "events")  # sets nanosAsLong for the raw read
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # the file-stream source wants a directory: stream the sf dir with a
    # glob pinning it to the events file
    s = (spark.readStream.schema(raw)
         .option("pathGlobFilter", "events.parquet")
         .parquet(sf_dir))
    if isinstance(s.schema["ts"].dataType, LongType):
        s = s.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return s


def _run_to_table(spark: SparkSession, out: DataFrame, mode: str) -> DataFrame:
    name = f"pds_stream_{uuid.uuid4().hex[:12]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.table(name)


@query("stream_windowed_agg", """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
""")
def stream_windowed_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup per event_type executed as a genuine
    Structured-Streaming job (streaming/ops.stream_windowed_agg:
    watermark + F.window state, bounded by the watermark horizon at
    scale). Complete mode emits every window, so the result equals the
    batch/SQL time-bucket aggregation on the same static input."""
    s = _events_stream(spark, sf_dir)
    out = STR.stream_windowed_agg(
        s, "ts", "1 hour",
        {"n": F.count(F.lit(1)), "sum_value": F.sum("value")},
        by=["event_type"], watermark="1 minute",
    )
    got = _run_to_table(spark, out, "complete")
    return got.select(
        F.col("window.start").cast("long").alias("ws"),
        "event_type",
        "n",
        _r(F.col("sum_value")).alias("sum_value"),
    )


@query("stream_dedup", """
SELECT CAST(COUNT(*) AS BIGINT) AS n_unique
FROM (SELECT DISTINCT user_id, event_type FROM events)
""")
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup on (user_id, event_type): first arrival in
    the watermark horizon wins (dropDuplicatesWithinWatermark keeps one
    8-byte key per distinct value in state). WHICH row survives depends
    on arrival order, so the oracle checks the engine-independent part:
    the surviving count equals SQL DISTINCT. The horizon covers the
    whole static input, mirroring an unbounded-horizon batch dedup."""
    s = _events_stream(spark, sf_dir)
    out = STR.stream_dedup(s, ["user_id", "event_type"], "ts",
                           watermark="100 days")
    got = _run_to_table(spark, out, "append")
    return got.agg(F.count(F.lit(1)).cast("long").alias("n_unique"))
