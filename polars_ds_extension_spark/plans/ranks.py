"""Scale-safe global ranks / cumulative sums / lags.

`Window.partitionBy().orderBy(x)` funnels EVERY row through one
partition — a one-executor sort that dies at scale. These helpers give
the same semantics with the classic two-pass distributed prefix plan:

  1. range-bucket rows on x with boundaries from ONE `percentile_approx`
     aggregation, embedded as literals — deterministic across jobs
     (`repartitionByRange` would re-sample different boundaries in the
     offsets job vs the final job) and tie-preserving (equal x ⇒ equal
     bucket);
  2. per-bucket local rank/cumsum/lag via a window keyed on the bucket
     id (parallel across buckets — a hash shuffle on ~n_parts keys);
  3. per-(bucket, group) totals — a tiny P×G frame — collected to the
     driver, prefix-summed, and broadcast-joined back as offsets.

The only driver round-trips are O(n_parts × groups) scalars. No stage
ever holds more than one bucket's rows in one task.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


from .._utils import pin as _shared_pin
from .._utils import release_pins  # noqa: F401  (re-export for callers)


def _pin(df: DataFrame) -> DataFrame:
    """Materialize the per-bucket pass once (memory, spill to disk).

    The offsets collect AND every downstream job replay this frame's
    lineage; without pinning, each consumer re-runs the scan + bucket
    window (measured 1.8x-2x whole-query cost). This is the classic
    materialization point of the two-pass prefix plan — the pinned frame
    is the narrow projected input, never wider, and disk-spillable.
    Registered with the shared LRU pin registry (_utils.pin) so old
    queries' caches are evicted instead of accumulating for the session.
    """
    return _shared_pin(df)

from .._utils import to_col

_PID = "__pds_pid"


def _ranged(df: DataFrame, order_col, by: Sequence[str] | None,
            n_parts: int | None) -> DataFrame:
    """Deterministic range bucketing: boundaries = approx quantiles of
    order_col (one tiny collect), bucket id = #boundaries ≤ x as a pure
    Column expression. Equal values always share a bucket."""
    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    oc = to_col(order_col)
    probs = [(i + 1) / n for i in range(n - 1)]
    if probs:
        row = df.agg(F.percentile_approx(oc.cast("double"), probs, 10000)
                     .alias("b")).first()
        bounds = sorted({float(b) for b in (row["b"] or []) if b is not None})
    else:
        bounds = []
    pid = F.lit(0)
    for b in bounds:
        pid = pid + (oc.cast("double") >= F.lit(b)).cast("int")
    # Null order values get bucket -1: they sort before every real bucket,
    # mirroring Spark's nulls-first ASC window order, and keep the pid
    # column non-null so the driver-side prefix sort never compares None.
    pid = F.when(oc.isNull(), F.lit(-1)).otherwise(pid)
    return df.withColumn(_PID, pid)


def _offsets(part: DataFrame, by: Sequence[str] | None,
             agg_cols: dict[str, object]) -> DataFrame:
    """Collect per-(pid, by) totals, prefix-sum per group on the driver,
    return a small offsets DataFrame to broadcast-join back."""
    keys = list(by or [])
    totals = (
        part.groupBy(_PID, *keys)
        .agg(*[expr.alias(name) for name, expr in agg_cols.items()])
        .collect()
    )
    rows = {}
    for r in sorted(totals, key=lambda r: r[_PID]):
        gkey = tuple(r[k] for k in keys)
        acc = rows.setdefault(gkey, {"run": {n: 0.0 for n in agg_cols}, "out": []})
        acc["out"].append((r[_PID], dict(acc["run"])))
        for n in agg_cols:
            acc["run"][n] += float(r[n] or 0.0)
    out_rows = []
    for gkey, acc in rows.items():
        for pid, offs in acc["out"]:
            out_rows.append(tuple([pid, *gkey] + [offs[n] for n in agg_cols]))
    schema_keys = ", ".join(
        f"{k} {dict((f.name, f.dataType.simpleString()) for f in part.schema.fields)[k]}"
        for k in keys
    )
    schema = (
        f"{_PID} int" + (", " + schema_keys if keys else "")
        + ", " + ", ".join(f"__off_{n} double" for n in agg_cols)
    )
    spark = part.sparkSession
    return F.broadcast(spark.createDataFrame(out_rows, schema))


def global_cumsum(df: DataFrame, order_col, value_cols: Sequence[str],
                  by: Sequence[str] | None = None,
                  n_parts: int | None = None) -> DataFrame:
    """Adds `cum_<c>` = sum of c over all rows with order_col ≤ this
    row's (range frame — ties all included), per group. Parallel."""
    keys = list(by or [])
    part = _ranged(df, order_col, keys, n_parts)
    w_local = Window.partitionBy(_PID, *keys).orderBy(to_col(order_col)) \
        .rangeBetween(Window.unboundedPreceding, 0)
    for c in value_cols:
        part = part.withColumn(f"__loc_{c}", F.sum(F.col(c)).over(w_local))
    part = _pin(part)
    offs = _offsets(part, keys, {c: F.sum(F.col(c)) for c in value_cols})
    joined = part.join(offs, [_PID, *keys])
    for c in value_cols:
        joined = joined.withColumn(
            f"cum_{c}", F.col(f"__loc_{c}") + F.col(f"__off_{c}")
        ).drop(f"__loc_{c}", f"__off_{c}")
    return joined.drop(_PID)


def global_min_rank(df: DataFrame, order_col,
                    by: Sequence[str] | None = None,
                    out_name: str = "rank",
                    n_parts: int | None = None) -> DataFrame:
    """SQL rank() (min rank, ties share) over the WHOLE frame / group —
    without a single-partition sort."""
    keys = list(by or [])
    part = _ranged(df, order_col, keys, n_parts)
    w_local = Window.partitionBy(_PID, *keys).orderBy(to_col(order_col))
    part = part.withColumn("__loc_r", F.rank().over(w_local).cast("double"))
    part = _pin(part)
    offs = _offsets(part, keys, {"n": F.count(F.lit(1)).cast("double")})
    joined = part.join(offs, [_PID, *keys])
    return joined.withColumn(
        out_name, F.col("__loc_r") + F.col("__off_n")
    ).drop("__loc_r", "__off_n", _PID)


def global_avg_rank(df: DataFrame, order_col,
                    by: Sequence[str] | None = None,
                    out_name: str = "avg_rank",
                    n_parts: int | None = None) -> DataFrame:
    """Tie-averaged ranks (scipy `rankdata(average)`) at scale: min rank
    via the two-pass plan + tie counts via a hash-partitioned window on
    the value (parallel)."""
    keys = list(by or [])
    ranked = global_min_rank(df, order_col, keys, "__min_r", n_parts)
    w_ties = Window.partitionBy(*keys, to_col(order_col))
    return ranked.withColumn(
        out_name,
        F.col("__min_r") + (F.count(F.lit(1)).over(w_ties) - 1) / 2.0,
    ).drop("__min_r")


def global_lag(df: DataFrame, order_col, col: str,
               by: Sequence[str] | None = None,
               out_name: str = "lag",
               n_parts: int | None = None) -> DataFrame:
    """lag(col) over the global (or per-group) order of order_col.

    Local lag per range partition; each partition's first row takes the
    previous partition's last value from a collected P×G boundary map.
    NB: with duplicate order_col values the choice of "previous row" is
    tie-ordered by the range partitioner exactly like the
    single-partition window would be (equal keys colocate).
    """
    keys = list(by or [])
    part = _ranged(df, order_col, keys, n_parts)
    w_local = Window.partitionBy(_PID, *keys).orderBy(to_col(order_col))
    part = part.withColumn("__loc_lag", F.lag(F.col(col)).over(w_local))
    part = _pin(part)
    # last value of (pid, group) — max_by over the local order
    lasts = (
        part.groupBy(_PID, *keys)
        .agg(F.max_by(F.col(col), to_col(order_col)).alias("__last"))
        .collect()
    )
    prev: dict[tuple, dict[int, float]] = {}
    for r in sorted(lasts, key=lambda r: r[_PID]):
        gkey = tuple(r[k] for k in keys)
        prev.setdefault(gkey, {})[r[_PID]] = r["__last"]
    # map: (pid, group) -> previous pid's last value
    rows = []
    for gkey, by_pid in prev.items():
        pids = sorted(by_pid)
        for i, pid in enumerate(pids):
            if i > 0:
                rows.append(tuple([pid, *gkey, by_pid[pids[i - 1]]]))
    spark = part.sparkSession
    field_types = {f.name: f.dataType.simpleString() for f in part.schema.fields}
    schema_keys = ", ".join(f"{k} {field_types[k]}" for k in keys)
    schema = (f"{_PID} int" + (", " + schema_keys if keys else "")
              + f", __prev {field_types[col]}")
    if rows:
        bmap = F.broadcast(spark.createDataFrame(rows, schema))
        part = part.join(bmap, [_PID, *keys], "left")
    else:
        part = part.withColumn("__prev", F.lit(None).cast(field_types[col]))
    w_first = Window.partitionBy(_PID, *keys).orderBy(to_col(order_col))
    is_first = F.row_number().over(w_first) == 1
    out = part.withColumn(
        out_name,
        F.when(is_first, F.col("__prev")).otherwise(F.col("__loc_lag")),
    )
    return out.drop("__loc_lag", "__prev", _PID)
