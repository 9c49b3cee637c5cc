"""Shared helpers for the PySpark-native polars_ds engine.

Parallels reference python/polars_ds/_utils.py:1-58 (str_to_expr /
to_expr coercion), re-expressed for pyspark Columns.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

ColumnLike = "str | Column"


def to_col(x) -> Column:
    """Coerce a str column name / Column / numeric literal to a Column."""
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    if isinstance(x, (int, float, bool)):
        return F.lit(x)
    raise TypeError(f"expected str | Column | numeric, got {type(x)}")


def to_cols(xs: Iterable) -> list[Column]:
    return [to_col(x) for x in xs]


def group_window(by: Sequence | None) -> WindowSpec:
    """A Window partitioned by ``by`` (global single partition if None).

    A global window on a 100 TB table collapses to one partition — every
    function that accepts ``by=None`` documents this; benchmark queries
    always pass a grouping.
    """
    if by:
        return Window.partitionBy(*to_cols(by))
    return Window.partitionBy()


def with_global_totals(df, **aggs: Column):
    """Attach global scalar aggregates as literal-like columns via one
    agg + broadcast cross-join.

    The scale-safe replacement for ``F.sum(c).over(Window.partitionBy())``
    on an unbounded frame: the aggregate is map-side combinable (partial
    per partition, one tiny merge), whereas the empty window funnels every
    row through a SinglePartition exchange before summing.
    """
    tot = df.agg(*[a.alias(n) for n, a in aggs.items()])
    return df.crossJoin(F.broadcast(tot))


def ordered_window(order_by, by: Sequence | None = None, desc: bool = False) -> WindowSpec:
    ob = to_col(order_by)
    ob = ob.desc() if desc else ob.asc()
    if by:
        return Window.partitionBy(*to_cols(by)).orderBy(ob)
    return Window.partitionBy().orderBy(ob)


def spread(df, min_ratio: int = 2):
    """Round-robin repartition a narrow input up to the session's default
    parallelism before CPU-heavy per-row work (shingling, vector math,
    signature UDFs).

    At 100 TB this is a no-op: big scans arrive with thousands of file
    splits, so the condition never fires and no shuffle is added. It
    fires only when the scan yields far fewer partitions than cores
    (small files / single-row-group parquet) — there, shuffling a few MB
    once unlocks an N-core speedup on everything downstream.
    """
    if df.isStreaming:  # partitioning is the source's concern on streams
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_ratio <= target:
        return df.repartition(target)
    return df


# ------------------------------------------------------------------ pinning

# Frames persisted by operators whose consumers act AFTER the operator
# returns (two-pass rank plans, minhash shingle frames, ...), oldest
# first. A long session would otherwise accumulate cached RDDs forever;
# we keep a small LRU window (the active query plus a couple of
# predecessors) and unpersist the rest. Unpersisting a finished query's
# pin is always safe — Spark recomputes lineage if it is ever re-read.
_PINNED: list = []
# 8, not 4 (r15): the composed index-lifecycle queries (build → update
# → probe in one plan) legitimately hold 5 live pins at once — three
# minhash bases plus the two bucket artifacts; a window of 4 evicted a
# pin that was still feeding the final action, silently recomputing
# the Arrow banding pass it existed to avoid.
_MAX_PINNED = 8


def pin(df):
    """persist(MEMORY_AND_DISK) + register for LRU eviction/release."""
    from pyspark.storagelevel import StorageLevel

    pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PINNED.append(pinned)
    while len(_PINNED) > _MAX_PINNED:
        try:
            _PINNED.pop(0).unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to release
            pass
    return pinned


def release_pins() -> None:
    """Unpersist every registered pin (e.g. at the end of a query batch)."""
    while _PINNED:
        try:
            _PINNED.pop().unpersist(blocking=False)
        except Exception:
            pass


def unpin(df) -> None:
    """Unpersist ONE pinned frame and drop it from the registry —
    for library code that pins internally and cleans up after itself
    (diagnostics, bounded two-pass plans). release_pins() is a global
    sweep for harness boundaries; calling it from inside an operator
    would evict every OTHER live pin in the session too."""
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass
    try:
        _PINNED.remove(df)
    except ValueError:
        pass


def release_checkpoint(df) -> None:
    """Drop a localCheckpoint's materialized storage NOW.

    ``DataFrame.unpersist()`` is a silent no-op on a checkpointed frame
    — it only consults the CacheManager, while localCheckpoint storage
    lives on the underlying RDD (measured r12: an iterative loop's
    superseded per-round checkpoints survived df.unpersist and
    accumulated until a JVM GC let the ContextCleaner reap them). The
    frame is UNUSABLE afterwards (lineage is truncated, storage gone)
    — call only on frames that are provably never referenced again."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # plan shape moved — leave it to the ContextCleaner
