"""Parquet sink helpers: size-aware batch writes and streaming writes.

The batch writer right-sizes output files — the #1 operational failure
of naive `df.write.parquet` at scale is thousands of tiny files (one
per shuffle partition) or a handful of huge ones. Target file size is
controlled explicitly and the repartition count derives from a cheap
sampled row-size estimate, not a full materialization.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_row_bytes(df: DataFrame, sample_rows: int = 1_000) -> float:
    """Rough uncompressed bytes/row from a bounded sample (one tiny job).

    Parquet compresses ~3-4x on typical mixed columns; callers of
    write_parquet get that folded into the default ratio there.
    """
    sample = df.limit(sample_rows)
    agg = [
        F.avg(F.length(F.col(f.name).cast("string"))).alias(f.name)
        for f in df.schema.fields
    ]
    row = sample.agg(*agg).first()
    return float(sum((row[f.name] or 8.0) + 4.0 for f in df.schema.fields))


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    target_file_mb: int = 128,
    compression_ratio: float = 3.0,
    n_rows: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet with ~``target_file_mb`` files.

    Row count: pass ``n_rows`` if known (skips the count job). Files per
    partition-by bucket follow from estimated bytes; un-partitioned
    writes repartition round-robin (uniform file sizes), partitioned
    writes repartition on the partition columns plus a bounded salt so
    one hive bucket never funnels through one task.
    """
    rows = n_rows if n_rows is not None else df.count()
    row_b = estimate_row_bytes(df)
    total_mb = rows * row_b / compression_ratio / 1e6
    n_files = max(1, math.ceil(total_mb / target_file_mb))
    if partition_by:
        salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns]))
                % max(1, n_files))
        out = df.repartition(max(n_files, 1),
                             *[F.col(c) for c in partition_by], salt)
        (out.write.mode(mode).partitionBy(*partition_by).parquet(path))
    else:
        out = df.repartition(n_files)
        out.write.mode(mode).parquet(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Globally shuffle ``df`` into ``n_shards`` training shards and
    write one SORTED parquet file per shard under ``path/shard=K/`` —
    the last mile of a training-data pipeline: after mixture assembly
    the corpus is grouped by source, and the trainer wants shards whose
    concatenation reads in IID-looking order.

    The order is `sample.shuffle_key` (deterministic, engine- and
    rerun-reproducible — a re-run of the pipeline writes bit-identical
    shards, which `rand()` ordering cannot promise). ONE sort-shuffle:
    repartition on the shard id co-locates each shard in a single task
    (several shards may share a task; each still writes its own file
    under its own hive directory), and sortWithinPartitions orders rows
    by (shard, key, id) so every shard file is written in final order.
    """
    from ..functions.sample import shuffle_key

    key = shuffle_key(id_col, seed)
    out = (
        df.withColumn("__key", key)
        .withColumn("shard", F.pmod(F.col("__key"), F.lit(n_shards)))
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(F.col("shard").asc(), F.col("__key").asc(),
                              F.col(id_col).asc())
        .drop("__key")
    )
    out.write.mode(mode).partitionBy("shard").parquet(path)


def stream_to_parquet(out: DataFrame, path: str, checkpoint: str,
                      trigger_once: bool = False):
    """writeStream → parquet files with exactly-once file-sink semantics
    (checkpointed offsets + file manifest). Returns the StreamingQuery;
    callers own awaitTermination/stop."""
    w = (out.writeStream.format("parquet")
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append"))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int = 64,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table: every join or aggregation keyed on ``bucket_by`` against
    another table bucketed the same way then runs WITHOUT a shuffle —
    the co-location is baked into the files once, at write time. This is
    the standard answer for a 100 TB fact table that joins on the same
    key every day: pay one shuffle at ingest, never again.

    Bucket pruning also kicks in for point predicates on the bucket
    column. ``n_buckets`` should be sized so one bucket ≈ one task's
    worth of data at read time.
    """
    w = df.write.mode(mode).format("parquet") \
        .bucketBy(n_buckets, *list(bucket_by))
    if sort_by:
        w = w.sortBy(*list(sort_by))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16):
    """Z-order (Morton) sort key over 2+ numeric columns: min-max
    normalize each to ``bits``-bit integers (one tiny agg for the
    bounds), then bit-interleave — pure JVM integer expressions.

    Sorting/range-partitioning by this key clusters rows so every file
    covers a tight hyper-rectangle in ALL the named dimensions at once;
    parquet min/max stats then prune multi-column predicates, where a
    plain sort only prunes its leading column. Returns (key Column,
    bounds dict) — reuse bounds to keep append batches on the same
    curve.
    """
    from .._utils import to_col
    from ..partition import zorder_key as _interleave

    row = df.agg(*[f(to_col(c)).alias(f"{n}_{c}")
                   for c in cols
                   for n, f in (("mn", F.min), ("mx", F.max))]).first()
    bounds = {c: (float(row[f"mn_{c}"]), float(row[f"mx_{c}"])) for c in cols}
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = bounds[c]
        span = (hi - lo) or 1.0
        scaled.append(F.least(F.lit(top), F.greatest(F.lit(0), F.floor(
            (to_col(c).cast("double") - F.lit(lo)) / F.lit(span) * top
        ).cast("long"))))
    # the interleave itself (and its bits*k <= 63 sign-bit guard) is
    # the shared raw-integer primitive in partition.zorder_key — whose
    # per-group significance is LAST-column-highest, the reverse of
    # this function's documented-and-shipped layout (cols[0] most
    # significant). Reversing the operand order preserves the exact
    # historical key, so files written before the consolidation stay
    # comparable/mergeable with new ones.
    return _interleave(list(reversed(scaled)), bits), bounds


def write_zordered(
    df: DataFrame, path: str, cols: Sequence[str],
    n_files: int = 16, bits: int = 16, mode: str = "overwrite",
) -> None:
    """Write parquet range-partitioned + sorted on the Z-order key of
    ``cols`` — the Delta/Iceberg OPTIMIZE ZORDER layout with plain
    files: multi-dimensional clustering so min/max row-group stats
    prune predicates on ANY of the named columns."""
    from ..partition import cluster_by_zorder

    key, _ = zorder_key(df, cols, bits)
    cluster_by_zorder(df, cols, n_files, bits, key=key) \
        .write.mode(mode).parquet(path)
