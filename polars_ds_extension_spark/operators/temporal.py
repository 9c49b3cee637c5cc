"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval) join, re-expressed as shuffle-bounded DataFrame plans.

Both avoid the trap of writing the predicate directly — a non-equi
join condition plans as BroadcastNestedLoopJoin (all-pairs per
partition), which is exactly the O(n·m) cliff these operators exist to
avoid:

  * as-of join: ONE union + per-key ordered window. Every row moves
    once (hash shuffle on the join keys), each key's timeline sorts in
    parallel, and the "most recent right row" is last_value(ignorenulls)
    over an unbounded-preceding frame — the same merge-scan an
    in-memory asof does, distributed by key.
  * range join: bucketize the value axis, explode each interval to the
    buckets it covers, equi-join on the bucket, refine with the exact
    predicate. Shuffle is keyed on (bucket), size ~|points| +
    |intervals|·(avg_len/bucket_width); no nested loop anywhere.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .._utils import to_col


def asof_join(
    left: DataFrame, right: DataFrame,
    on: str, by: Sequence[str],
    right_cols: Sequence[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For every left row: attach the matching right row within the
    same ``by`` key(s) — the trade-to-quote join of time-series work,
    with the full polars join_asof strategy set:

    * ``backward`` (default): most recent right with r.on <= l.on;
    * ``forward``: earliest right with r.on >= l.on;
    * ``nearest``: whichever of the two is closer in time (exact ties
      prefer the backward match — deterministic, matching pandas
      merge_asof).

    Plan: tag both sides, union them, and per direction ONE window per
    key — last_value(ignorenulls) over unbounded-preceding for
    backward, first_value over unbounded-following for forward (tie
    order flips so an equal timestamp stays inclusive on both sides);
    nearest runs both frames over the SAME partitioning (one hash
    shuffle on ``by``, two in-partition sorts) and picks per row.
    ``tolerance`` (same units as ``on``) nulls out matches farther
    than it in the match direction.

    ``by`` is required: a keyless global as-of would funnel the union
    through one sort partition — partition the timeline first if you
    genuinely need it.
    """
    if not by:
        raise ValueError("asof_join requires at least one `by` key")
    if direction not in {"backward", "forward", "nearest"}:
        raise ValueError("direction must be backward|forward|nearest")
    keys = list(by)
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != on]
    t = to_col(on)

    lt = left.withColumn("__side", F.lit(1))
    # The whole right row rides as ONE struct so last(ignorenulls) picks
    # an entire row atomically: a NULL inside a payload column must not
    # make that field fall back to an OLDER right row while the
    # timestamp comes from the newer one (polars/DuckDB attach the
    # newest row including its NULLs). The struct itself is non-null for
    # every right row, null for left rows — ignorenulls skips exactly
    # the left rows.
    rt = right.select(
        *keys, t.alias(on), F.lit(0).alias("__side"),
        F.struct(t.alias("__ts"),
                 *[F.col(c).alias(c) for c in rcols]).alias("__r"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # DUPLICATE right timestamps need a deterministic tiebreak: with
    # only (on, side) in the sort, the winner among equal-t right rows
    # depended on partition order (an r8 hypothesis test caught it).
    # Both directions order the payload struct so the match is the
    # GREATEST payload among equal-t rights — engine-stable (struct
    # comparison is field-lexicographic; payloads must stay orderable,
    # i.e. no map columns in right_cols).
    if direction in ("backward", "nearest"):
        # right-before-left on ties -> equal timestamps match inclusively
        wb = Window.partitionBy(*keys) \
            .orderBy(F.col(on).asc(), F.col("__side").asc(),
                     F.col("__r").asc()) \
            .rowsBetween(Window.unboundedPreceding, 0)
        u = u.withColumn("__mb", F.last(F.col("__r"), ignorenulls=True)
                         .over(wb))
    if direction in ("forward", "nearest"):
        # left-before-right on ties (side DESC) -> inclusive forward
        wf = Window.partitionBy(*keys) \
            .orderBy(F.col(on).asc(), F.col("__side").desc(),
                     F.col("__r").desc()) \
            .rowsBetween(0, Window.unboundedFollowing)
        u = u.withColumn("__mf", F.first(F.col("__r"), ignorenulls=True)
                         .over(wf))
    out = u.where(F.col("__side") == 1)
    if direction == "backward":
        m = F.col("__mb")
    elif direction == "forward":
        m = F.col("__mf")
    else:
        db = t - F.col("__mb").getField("__ts")
        df_ = F.col("__mf").getField("__ts") - t
        m = (F.when(F.col("__mb").isNull(), F.col("__mf"))
             .when(F.col("__mf").isNull(), F.col("__mb"))
             .when(df_ < db, F.col("__mf"))
             .otherwise(F.col("__mb")))  # exact ties -> backward
    out = out.withColumn("__m", m)
    if tolerance is not None:
        dist = F.abs(to_col(on) - F.col("__m").getField("__ts"))
        out = out.withColumn(
            "__m", F.when(dist <= F.lit(tolerance), F.col("__m")))
    sel = [c for c in left.columns] + \
        [F.col("__m").getField(c).alias(f"{c}{suffix}") for c in rcols] + \
        [F.col("__m").getField("__ts").alias(f"{on}{suffix}")]
    return out.select(*sel)


def range_join(
    points: DataFrame, value: str,
    intervals: DataFrame, start: str, end: str,
    bucket_width: float | None = None,
    closed: str = "left",
) -> DataFrame:
    """Join each point row to every interval row whose [start, end)
    contains ``value`` (``closed``: 'left' | 'both' | 'right' |
    'neither') — without the BroadcastNestedLoopJoin a raw non-equi
    condition plans to.

    Bucketize: intervals explode to the integer buckets they cover
    (sequence(floor(s/w), floor(e/w))), points map to one bucket, the
    join is a plain hash equi-join on the bucket id, and the exact
    predicate refines. ``bucket_width`` defaults to the average
    interval length (one tiny agg) — the explode factor is then ~2 per
    interval; degenerate huge intervals only widen their own explode,
    never a nested loop.
    """
    v = to_col(value).cast("double")
    s, e = to_col(start).cast("double"), to_col(end).cast("double")
    if bucket_width is None:
        row = intervals.agg(F.avg(e - s).alias("w")).first()
        bucket_width = float(row["w"] or 1.0) or 1.0
    w = float(bucket_width)

    iv = intervals.withColumn(
        "__b",
        F.explode(F.sequence(F.floor(s / F.lit(w)).cast("long"),
                             F.floor(e / F.lit(w)).cast("long"))))
    pt = points.withColumn("__b", F.floor(v / F.lit(w)).cast("long"))
    lo_ok = {"left": v >= s, "both": v >= s,
             "right": v > s, "neither": v > s}[closed]
    hi_ok = {"left": v < e, "both": v <= e,
             "right": v <= e, "neither": v < e}[closed]
    return pt.join(iv, "__b").where(lo_ok & hi_ok).drop("__b")


def rollup_hypertable(
    df: DataFrame, ts_col: str,
    measures: "dict[str, tuple[str, str]]",
    levels: Sequence[str] = ("1 hour", "1 day"),
    by: Sequence[str] | None = None,
) -> "dict[str, DataFrame]":
    """Multi-resolution time rollup (the TimescaleDB continuous-
    aggregate / Druid rollup shape): the finest level aggregates from
    raw, every COARSER level re-aggregates the level below it — the raw
    table is scanned exactly ONCE no matter how many resolutions are
    materialized. At 100 TB that is the whole point: hourly→daily→
    monthly chains touch hourly-sized data, not the corpus.

    ``measures``: out_name -> (fn, col) with fn in sum|count|min|max|
    avg. Everything decomposes to re-aggregatable partials (avg rides
    as sum+count and finalizes per level); levels must be coarsening
    multiples for the bucket nesting to be exact (1 hour into 1 day,
    etc.). Output: level string -> DataFrame(bucket, *by, *measures).
    """
    keys = list(by or [])
    ok_fns = {"sum", "count", "min", "max", "avg"}
    for name, (fn, _) in measures.items():
        if fn not in ok_fns:
            raise ValueError(f"unsupported fn {fn!r} for {name!r}")

    # partial aggregates from RAW at the finest level
    partial_aggs, parts = [], {}
    for name, (fn, col) in measures.items():
        c = to_col(col).cast("double")
        if fn in ("sum", "avg"):
            partial_aggs.append(F.sum(c).alias(f"__s_{name}"))
            parts.setdefault(name, []).append(f"__s_{name}")
        if fn in ("count", "avg"):
            partial_aggs.append(F.count(c).cast("long").alias(f"__c_{name}"))
            parts.setdefault(name, []).append(f"__c_{name}")
        if fn == "min":
            partial_aggs.append(F.min(c).alias(f"__mn_{name}"))
            parts.setdefault(name, []).append(f"__mn_{name}")
        if fn == "max":
            partial_aggs.append(F.max(c).alias(f"__mx_{name}"))
            parts.setdefault(name, []).append(f"__mx_{name}")

    fine = df.groupBy(
        F.window(to_col(ts_col), levels[0]).getField("start").alias("bucket"),
        *keys).agg(*partial_aggs)

    # coarser levels: re-aggregate the partials of the level below
    reagg = []
    for name, (fn, _) in measures.items():
        for p in parts[name]:
            if p.startswith("__s_"):
                reagg.append(F.sum(F.col(p)).alias(p))
            elif p.startswith("__c_"):
                reagg.append(F.sum(F.col(p)).cast("long").alias(p))
            elif p.startswith("__mn_"):
                reagg.append(F.min(F.col(p)).alias(p))
            else:
                reagg.append(F.max(F.col(p)).alias(p))

    def _finalize(lvl_df: DataFrame) -> DataFrame:
        out = lvl_df
        sel = [F.col("bucket"), *[F.col(k) for k in keys]]
        for name, (fn, _) in measures.items():
            if fn == "sum":
                sel.append(F.col(f"__s_{name}").alias(name))
            elif fn == "count":
                sel.append(F.col(f"__c_{name}").alias(name))
            elif fn == "min":
                sel.append(F.col(f"__mn_{name}").alias(name))
            elif fn == "max":
                sel.append(F.col(f"__mx_{name}").alias(name))
            else:  # avg
                sel.append((F.col(f"__s_{name}")
                            / F.col(f"__c_{name}")).alias(name))
        return out.select(*sel)

    out, cur = {levels[0]: _finalize(fine)}, fine
    for lvl in levels[1:]:
        cur = cur.groupBy(
            F.window(F.col("bucket"), lvl).getField("start").alias("bucket"),
            *keys).agg(*reagg)
        out[lvl] = _finalize(cur)
    return out


def fill_time_gaps(
    df: DataFrame, ts_col: str, step: int,
    by: Sequence[str], value_cols: Sequence[str],
    how: str = "null",
) -> DataFrame:
    """Regularize an irregular time series: emit one row per ``step``
    tick on each key's [min, max] span (the polars upsample /
    TimescaleDB time_bucket_gapfill shape). ``ts_col`` must be numeric
    (epoch micros etc.); observed rows keep their values, synthetic
    ticks carry NULL (``how='null'``) or the most recent observed value
    (``how='ffill'`` — locf). Rows not on the grid are preserved.

    Scale plan: the grid explodes from ONE tiny per-key (min, max) agg
    — sequence() costs (span/step) rows per key, the same cardinality
    the output must have, so there is no avoidable inflation. The union
    + per-key window shares one hash shuffle on ``by``; the forward
    fill is last_value(ignorenulls) over the time order — the as-of
    join machinery applied to gap filling.

    Output: (*by, ts_col, *value_cols, is_gap boolean).
    """
    if how not in {"null", "ffill"}:
        raise ValueError("how must be 'null' or 'ffill'")
    if step <= 0:
        raise ValueError("step must be positive")
    keys = list(by)
    t = to_col(ts_col)

    span = df.groupBy(*keys).agg(F.min(t).alias("__mn"),
                                 F.max(t).alias("__mx"))
    grid = span.select(
        *keys,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"),
                             F.lit(step))).alias(ts_col))
    obs = df.select(*keys, t.alias(ts_col),
                    *[F.col(c) for c in value_cols],
                    F.lit(False).alias("__gap"))
    # grid ticks that collide with an observed timestamp are dropped —
    # the observed row wins; anti-join keyed on (by, ts)
    gaps = grid.join(obs.select(*keys, ts_col), [*keys, ts_col],
                     "left_anti") \
        .select(*keys, F.col(ts_col),
                *[F.lit(None).cast(df.schema[c].dataType).alias(c)
                  for c in value_cols],
                F.lit(True).alias("__gap"))
    u = obs.unionByName(gaps)
    if how == "ffill":
        w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(),
                                              F.col("__gap").asc()) \
            .rowsBetween(Window.unboundedPreceding, 0)
        # carry the whole observed row as ONE struct (atomicity — same
        # rule as asof_join): NULLs inside an observed row must ride
        # along, not fall back to an older row per-column
        pay = F.when(~F.col("__gap"),
                     F.struct(*[F.col(c) for c in value_cols]))
        u = u.withColumn("__m", F.last(pay, ignorenulls=True).over(w))
        u = u.select(
            *keys, F.col(ts_col),
            *[F.when(F.col("__gap"), F.col("__m").getField(c))
              .otherwise(F.col(c)).alias(c) for c in value_cols],
            F.col("__gap").alias("is_gap"))
        return u
    return u.withColumnRenamed("__gap", "is_gap")


def sessionize(
    df: DataFrame, ts_col: str, by: Sequence[str], gap: int,
    out_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): rows of a key belong to
    the same session while consecutive timestamps are within ``gap``
    (same units as the numeric ``ts_col``); a larger silence starts a
    new session. ``out_col`` is the 0-based session index per key —
    deterministic, layout-independent.

    The batch twin of streaming/ops.stream_sessionize (F.session_window
    needs a streaming-style timestamp; this works on any numeric time
    axis). ONE hash shuffle on ``by``; both window passes (lag +
    running sum) share the partitioning.
    """
    if gap < 0:
        raise ValueError("gap must be >= 0")
    keys = [to_col(k) for k in by]
    t = to_col(ts_col)
    w = Window.partitionBy(*keys).orderBy(t.asc())
    new_s = F.when(
        F.lag(t).over(w).isNull() | ((t - F.lag(t).over(w)) > gap),
        F.lit(1)).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(t.asc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("__n", new_s) \
        .withColumn(out_col, (F.sum("__n").over(run) - 1).cast("long")) \
        .drop("__n")


def funnel(
    df: DataFrame, user_col: str, type_col: str, ts_col: str,
    stages: Sequence[str], max_span: int | None = None,
) -> DataFrame:
    """Ordered funnel conversion over an event stream: a user reaches
    stage ``i`` at the earliest ``stages[i]`` event at-or-after their
    stage ``i-1`` time (classic product-analytics funnel — the ordered
    semantics a naive per-stage min-timestamp pivot gets wrong when a
    later stage fires before an earlier one). ``max_span`` additionally
    requires every stage to land within that many seconds of the user's
    stage-0 time.

    Plan shape: the event table is scanned ONCE with
    `type IN stages` pushed to the source, then k-1 per-user hash joins
    chain the stage times — every join keyed on the user id, so at
    100 TB the stream shuffles by user once per stage with filters
    already applied (each stage's frame only carries users still in the
    funnel, so the frames shrink monotonically down the funnel).

    Returns one row per stage: (stage_idx, stage, n_users,
    frac_of_first, frac_of_prev).
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    u, ty, t = to_col(user_col), to_col(type_col), to_col(ts_col)
    ev = df.where(ty.isin(list(stages))).select(
        u.alias("__u"), ty.alias("__ty"), t.alias("__t"))
    # span gate stays in the ts column's native domain (an interval add
    # for timestamps, a numeric add otherwise) — no epoch casts, so
    # sub-second timestamps keep exact boundary semantics
    ts_type = dict(ev.dtypes)["__t"]
    if max_span is not None:
        if ts_type.startswith("timestamp"):
            span_hi = F.col("__t0") + F.expr(
                f"INTERVAL '{int(max_span)}' SECOND")
        else:
            span_hi = F.col("__t0") + F.lit(float(max_span))

    reached = (ev.where(F.col("__ty") == stages[0])
                 .groupBy("__u").agg(F.min("__t").alias("__t0"))
                 .withColumn("__tprev", F.col("__t0")))
    frames = [reached]
    for st in stages[1:]:
        nxt = (
            ev.where(F.col("__ty") == st)
            .join(frames[-1].select("__u", "__t0", "__tprev"), "__u")
            .where(F.col("__t") >= F.col("__tprev"))
        )
        if max_span is not None:
            nxt = nxt.where(F.col("__t") <= span_hi)
        frames.append(
            nxt.groupBy("__u")
            .agg(F.first("__t0").alias("__t0"),
                 F.min("__t").alias("__tprev")))

    counts = None
    for i, fr in enumerate(frames):
        c = fr.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage_idx"),
            F.lit(stages[i]).alias("stage"), "n_users")
        counts = c if counts is None else counts.unionByName(c)
    w_first = Window.orderBy("stage_idx") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = Window.orderBy("stage_idx")
    # k rows total — the single-partition windows here run on the
    # k-row result, never on event data. Empty upstream stages make the
    # ratios 0/0 — an empty funnel converts nobody, so both read 0.0
    # (ANSI mode would otherwise raise DIVIDE_BY_ZERO).
    first_n = F.first("n_users").over(w_first)
    prev_n = F.coalesce(F.lag("n_users").over(w_prev), F.col("n_users"))
    return counts.select(
        "stage_idx", "stage", "n_users",
        F.when(first_n > 0, F.col("n_users") / first_n)
        .otherwise(F.lit(0.0)).alias("frac_of_first"),
        F.when(prev_n > 0, F.col("n_users") / prev_n)
        .otherwise(F.lit(0.0)).alias("frac_of_prev"),
    )


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str,
    period_days: int = 7, max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period (epoch
    days // period_days) of their FIRST event; retention at offset k is
    the fraction of the cohort active in cohort_period + k — the
    standard growth-analytics rollup.

    Plan shape: one per-user min-ts aggregation (hash shuffle on user),
    one join of (user, period) activity back to the user's cohort
    (keyed on user — co-partitioned with the first shuffle), and one
    (cohort, offset) count-distinct. No windows over event data, no
    driver loops; every stage is a keyed hash aggregate, so the 100 TB
    stream moves at most three times and always pre-aggregated.

    Returns (cohort_period, cohort_start, week_offset, n_active,
    cohort_size, retention).
    """
    if period_days <= 0:
        raise ValueError("period_days must be positive")
    u, t = to_col(user_col), to_col(ts_col)
    # floor division (NOT a truncating cast): pre-epoch timestamps have
    # negative datediff, and -2 // 7 must be -1 to match the oracle
    per = F.floor(F.datediff(F.to_date(t), F.lit("1970-01-01"))
                  / period_days).cast("long")
    act = df.select(u.alias("__u"), per.alias("__p")).distinct()
    first = act.groupBy("__u").agg(F.min("__p").alias("__c"))
    sizes = first.groupBy("__c").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    joined = act.join(first, "__u").select(
        "__c", (F.col("__p") - F.col("__c")).alias("week_offset"))
    if max_offset is not None:
        joined = joined.where(F.col("week_offset") <= int(max_offset))
    ret = joined.groupBy("__c", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active"))
    return (
        ret.join(sizes, "__c")
        .select(
            F.col("__c").alias("cohort_period"),
            F.date_add(F.lit("1970-01-01"),
                       (F.col("__c") * period_days).cast("int"))
            .alias("cohort_start"),
            "week_offset", "n_active", "cohort_size",
            (F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
    )
