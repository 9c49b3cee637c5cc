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

import math as _math


def _finite_bounds(raw) -> "list[float]":
    """Sorted, deduped, FINITE bucket boundaries. ±inf/NaN boundaries
    are dropped: Spark's string→double cast needs 'Infinity'/'NaN' (a
    repr()'d 'inf' literal casts to NULL and every bucket id goes NULL),
    and as boundaries they add nothing — non-finite values simply pile
    into the edge buckets, which the exact per-bucket counting already
    handles (Spark orders NaN greatest, so bucketing by `x >= b` over
    finite b keeps ties and order exact)."""
    return sorted({float(b) for b in (raw or [])
                   if b is not None and _math.isfinite(float(b))})


def _dlit(b: float) -> str:
    """A SQL double literal Java's Double.parseDouble accepts — repr()
    for finite values, the Java spellings for non-finite ones."""
    if _math.isnan(b):
        return "CAST('NaN' AS DOUBLE)"
    if _math.isinf(b):
        return f"CAST('{'Infinity' if b > 0 else '-Infinity'}' AS DOUBLE)"
    return f"CAST('{b!r}' AS DOUBLE)"


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
        bounds = _finite_bounds(row["b"])
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
             agg_cols: dict[str, object],
             with_totals: bool = False) -> DataFrame:
    """Collect per-(pid, by) totals, prefix-sum per group on the driver,
    return a small offsets DataFrame to broadcast-join back.
    ``with_totals`` additionally emits ``__tot_<n>`` (the group's full
    sum — the running sum after the LAST bucket) on every row, so
    callers that need the group size get it from the same collect
    instead of a separate count() scan."""
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
        tot = acc["run"]
        for pid, offs in acc["out"]:
            vals = [offs[n] for n in agg_cols]
            if with_totals:
                vals += [tot[n] for n in agg_cols]
            out_rows.append(tuple([pid, *gkey] + vals))
    schema_keys = ", ".join(
        f"{k} {dict((f.name, f.dataType.simpleString()) for f in part.schema.fields)[k]}"
        for k in keys
    )
    schema = (
        f"{_PID} int" + (", " + schema_keys if keys else "")
        + ", " + ", ".join(f"__off_{n} double" for n in agg_cols)
    )
    if with_totals:
        schema += ", " + ", ".join(f"__tot_{n} double" for n in agg_cols)
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
                    n_parts: int | None = None,
                    total_name: str | None = None) -> DataFrame:
    """SQL rank() (min rank, ties share) over the WHOLE frame / group —
    without a single-partition sort. ``total_name`` additionally
    attaches the group's row count (free — the per-bucket counts the
    offsets pass already collects sum to it), saving callers that need
    rank AND size a separate count() scan."""
    keys = list(by or [])
    part = _ranged(df, order_col, keys, n_parts)
    w_local = Window.partitionBy(_PID, *keys).orderBy(to_col(order_col))
    part = part.withColumn("__loc_r", F.rank().over(w_local).cast("double"))
    part = _pin(part)
    offs = _offsets(part, keys, {"n": F.count(F.lit(1)).cast("double")},
                    with_totals=total_name is not None)
    joined = part.join(offs, [_PID, *keys])
    out = joined.withColumn(out_name, F.col("__loc_r") + F.col("__off_n"))
    if total_name is not None:
        out = out.withColumn(total_name, F.col("__tot_n")) \
            .drop("__tot_n")
    return out.drop("__loc_r", "__off_n", _PID)


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


def quantile_sketch_aggs(cols: Sequence[str],
                         n_parts: int = 32) -> "list":
    """Aggregate expressions a caller can FOLD INTO ITS OWN stats agg to
    prefund exact_quantiles' pass 1 (boundary sketch + non-null count)
    for free on a scan it was already paying for. Parse the result row
    with quantile_sketch_parse."""
    bprobs = [(i + 1) / n_parts for i in range(n_parts - 1)]
    aggs = []
    for c in cols:
        cc = to_col(c).cast("double")
        aggs.append(F.count(cc).alias(f"__qs_n_{c}"))
        if bprobs:
            aggs.append(F.percentile_approx(cc, bprobs, 1000)
                        .alias(f"__qs_b_{c}"))
    return aggs


def quantile_sketch_parse(row, cols: Sequence[str]):
    """(bounds, counts) presketch from a row produced with
    quantile_sketch_aggs — pass to exact_quantiles(presketch=...)."""
    bounds, counts = {}, {}
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    for c in cols:
        counts[c] = int(d[f"__qs_n_{c}"])
        bounds[c] = _finite_bounds(d.get(f"__qs_b_{c}"))
    return bounds, counts


def exact_quantiles(df: DataFrame, probs_by_col: "dict[str, Sequence[float]]",
                    n_parts: int | None = None,
                    presketch=None) -> "dict[str, list]":
    """EXACT `quantile_cont` values for several columns in three scans —
    the scale-safe replacement for ``F.percentile``/``F.median`` (whose
    physical agg buffers every value per partition and merges them all
    in ONE final reducer: exactly the single-node sort this module
    exists to avoid).

    Distributed selection: (1) ONE aggregation collects every column's
    approx bucket boundaries + non-null count; (2) ONE scan counts rows
    per (column, bucket) via literal comparisons — map-side combinable,
    no shuffle; the driver prefix-sums the P×C counts and locates which
    bucket holds each target order statistic; (3) ONE pass filters to
    those target buckets only (scan-side predicate), sorts each *within
    its bucket* (hash shuffle on ~|targets| bucket keys, each ~n/P
    rows), and one final agg picks the order statistics. Interpolation
    happens driver-side with the same lower + frac·(upper−lower) rule
    as Spark's Percentile and DuckDB's quantile_cont.

    Driver state: O(P × columns) scalars. No task ever sorts more than
    one bucket.
    """
    import math

    cols = {c: sorted(set(ps)) for c, ps in probs_by_col.items()}
    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    bprobs = [(i + 1) / n for i in range(n - 1)]

    # pass 1: boundaries + non-null counts, one agg for every column —
    # skipped entirely when the caller prefunded it on its own stats agg
    if presketch is not None:
        bounds, counts_n = presketch
        bounds = {c: _finite_bounds(bounds[c]) for c in cols}
        counts_n = {c: int(counts_n[c]) for c in cols}
    else:
        aggs = []
        for c in cols:
            cc = to_col(c).cast("double")
            aggs.append(F.count(cc).alias(f"__n_{c}"))
            if bprobs:
                # low accuracy on purpose: boundaries only balance
                # buckets (±1% size skew is harmless); sketch cost
                # scales with it
                aggs.append(F.percentile_approx(cc, bprobs, 1000)
                            .alias(f"__b_{c}"))
        row = df.agg(*aggs).first()
        bounds, counts_n = {}, {}
        for c in cols:
            counts_n[c] = int(row[f"__n_{c}"])
            bounds[c] = _finite_bounds(row[f"__b_{c}"] if bprobs else [])

    # ONE narrow projection computing each bucket id ONCE, as a single
    # parsed SQL expression per column (a 31-term chained Column build
    # costs ~100 py4j round-trips per column per call; the string parses
    # in one).
    def _pid_sql(c):
        if not bounds[c]:
            terms = "0"
        else:
            terms = " + ".join(
                f"CAST(__v_{c} >= {_dlit(b)} AS INT)"
                for b in bounds[c])
        return (f"CASE WHEN __v_{c} IS NULL THEN -1 ELSE {terms} END")

    proj = df.select(*[to_col(c).cast("double").alias(f"__v_{c}")
                       for c in cols])
    for c in cols:
        proj = proj.withColumn(f"__p_{c}", F.expr(_pid_sql(c)))

    # which order statistics do we need, and which buckets could hold
    # them? The sketch already tells us: boundary i of the RAW list has
    # rank ~ (i+1)/P·n with error ≤ n/accuracy ≪ the n/P bucket size,
    # so position k lives in the sketch-predicted bucket ± 1. Pass 2
    # then only counts the few candidate buckets + one prefix per
    # position (O(#targets) agg terms), never P×C.
    need_of: "dict[str, list[int]]" = {}
    cand_of: "dict[str, dict[int, list[int]]]" = {}
    for c, ps in cols.items():
        nn = counts_n[c]
        need = set()
        for q in ps:
            if nn == 0:
                continue
            p = q * (nn - 1)
            need.add(math.floor(p) + 1)
            need.add(math.ceil(p) + 1)
        need_of[c] = sorted(need)
        # deduped boundaries are ~evenly spaced in rank by construction
        # (they are the P-quantiles); heavy ties skew the estimate, but
        # the exact-count verification below catches any miss and the
        # _full_counts fallback re-locates it correctly
        n_b = len(bounds[c])
        approx_rank = {}
        for j, b in enumerate(bounds[c]):
            approx_rank[j] = (j + 1) / (n_b + 1) * nn if n_b else 0
        cands = {}
        for k in need_of[c]:
            pred = sum(1 for j in range(n_b) if approx_rank[j] <= k)
            cands[k] = [p for p in range(max(0, pred - 1),
                                         min(n_b, pred + 1) + 1)]
        cand_of[c] = cands

    # pass 2: exact counts for candidate buckets + exact prefix below
    # each candidate range — a handful of conditional sums over the
    # precomputed int bucket ids
    terms = []
    seen = set()
    for c in cols:
        allb = sorted({b for bs in cand_of[c].values() for b in bs})
        for b in allb:
            if (c, "cnt", b) not in seen:
                seen.add((c, "cnt", b))
                terms.append(F.sum((F.col(f"__p_{c}") == b).cast("long"))
                             .alias(f"__c_{c}_{b}"))
        for k, bs in cand_of[c].items():
            bmin = min(bs) if bs else 0
            if (c, "pre", bmin) not in seen:
                seen.add((c, "pre", bmin))
                terms.append(
                    F.sum(((F.col(f"__p_{c}") >= 0)
                           & (F.col(f"__p_{c}") < bmin)).cast("long"))
                    .alias(f"__pre_{c}_{bmin}"))
    crow = proj.agg(*terms).first().asDict() if terms else {}

    # driver: locate (bucket, local position); if a position falls
    # outside its candidate window (sketch failure — shouldn't happen,
    # but correctness must not depend on a sketch), fall back to a full
    # per-bucket count pass for that locate
    full_counts: "dict[str, list[int]] | None" = None

    def _full_counts():
        nonlocal full_counts
        if full_counts is None:
            tag_of_l = {c: i for i, c in enumerate(cols)}
            stacked_all = proj.select(F.explode(F.array(*[
                F.struct(F.lit(tag_of_l[c]).alias("tag"),
                         F.col(f"__p_{c}").alias("pid"))
                for c in cols])).alias("s")).select("s.tag", "s.pid")
            cc = {(r["tag"], r["pid"]): r["count"] for r in
                  stacked_all.groupBy("tag", "pid").count().collect()}
            full_counts = {
                c: [int(cc.get((tag_of_l[c], p), 0))
                    for p in range(len(bounds[c]) + 1)] for c in cols}
        return full_counts

    targets: "dict[str, dict[int, tuple[int, int]]]" = {}
    for c in cols:
        located = {}
        for k in need_of[c]:
            bs = cand_of[c][k]
            bmin = min(bs) if bs else 0
            cum = int(crow.get(f"__pre_{c}_{bmin}", 0) or 0)
            found = False
            for b in bs:
                cnt = int(crow.get(f"__c_{c}_{b}", 0) or 0)
                if cum < k <= cum + cnt:
                    located[k] = (b, k - cum)
                    found = True
                    break
                cum += cnt
            if not found:
                per_bucket = _full_counts()[c]
                cum2 = 0
                for b, cnt in enumerate(per_bucket):
                    if cum2 < k <= cum2 + cnt:
                        located[k] = (b, k - cum2)
                        break
                    cum2 += cnt
        targets[c] = located
    tag_of = {c: i for i, c in enumerate(cols)}

    # pass 3: long format (column tag, bucket, value), filtered to the
    # target buckets only — ONE window sorts exactly the rows that can
    # hold a target statistic, each row once, parallel across
    # (column, bucket) partitions
    tb_conds = []
    for c in cols:
        tb = {b for (b, _) in targets[c].values()}
        if tb:
            tb_conds.append((c, tb))
    values: "dict[str, dict[int, float]]" = {c: {} for c in cols}
    if tb_conds:
        # build each row's array with ONLY its target-bucket entries
        # (scan-side), so the explode emits ~|target rows|, not
        # rows x columns
        elems = []
        for c, tb in tb_conds:
            elems.append(F.when(
                F.col(f"__p_{c}").isin(*tb),
                F.struct(F.lit(tag_of[c]).alias("tag"),
                         F.col(f"__p_{c}").alias("pid"),
                         F.col(f"__v_{c}").alias("v"))))
        stacked = proj.select(F.explode(
            F.filter(F.array(*elems), lambda s: s.isNotNull())
        ).alias("s")).select("s.tag", "s.pid", "s.v")
        w = Window.partitionBy("tag", "pid").orderBy("v")
        ranked = stacked.withColumn("r", F.row_number().over(w))
        sel, names = [], []
        for c, _ in tb_conds:
            for k, (b, k_loc) in targets[c].items():
                sel.append(F.max(F.when(
                    (F.col("tag") == tag_of[c]) & (F.col("pid") == b)
                    & (F.col("r") == k_loc), F.col("v")))
                    .alias(f"__s_{tag_of[c]}_{k}"))
        srow = ranked.agg(*sel).first()
        for c, _ in tb_conds:
            for k in targets[c]:
                values[c][k] = srow[f"__s_{tag_of[c]}_{k}"]

    out: "dict[str, list]" = {}
    for c, ps_sorted in cols.items():
        nn = counts_n[c]
        res = {}
        for q in ps_sorted:
            if nn == 0:
                res[q] = None
                continue
            p = q * (nn - 1)
            lo = values[c].get(math.floor(p) + 1)
            hi = values[c].get(math.ceil(p) + 1)
            if lo is None or hi is None:
                res[q] = None
            else:
                res[q] = lo + (p - math.floor(p)) * (hi - lo)
        out[c] = [res[q] for q in probs_by_col[c]]
    return out
