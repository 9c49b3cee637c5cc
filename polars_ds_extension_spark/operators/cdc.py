"""Change-data-capture compaction — the merge/upsert shapes every
lakehouse pipeline runs before analytics: latest-wins key compaction
(the Delta/Hudi/Iceberg MERGE "upsert" read path) and type-2
slowly-changing-dimension history (valid_from/valid_to intervals).

Beyond the reference's surface (it is a single-node frame library);
first-class here because a 100 TB training corpus is APPENDED to, not
rewritten — recrawls, re-scores, and metadata fixes arrive as new rows
and every downstream operator wants exactly one current row per key.

Scale design: both operators are ONE hash shuffle on the key columns
followed by per-key windows — no global window, no driver state. SCD2's
optional change-collapse runs two window passes over the SAME
partitioning, so Catalyst reuses the one exchange.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .._utils import to_col

__all__ = ["latest_by_key", "scd2", "snapshot_diff"]


def _desc_cols(order_by: Sequence[str]) -> list:
    return [to_col(c).desc() for c in order_by]


def latest_by_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Latest-wins compaction: keep the single newest row per ``keys``,
    newest = greatest ``order_by`` tuple (pass a unique tiebreaker last
    — e.g. ``["ts", "event_id"]`` — so the winner is deterministic under
    any partition layout; task retries then always re-pick the same
    row).

    ``delete_col``: boolean tombstone marker — if the WINNING row is a
    tombstone the key disappears from the output (CDC delete semantics);
    older live rows must not resurrect, which is why the filter runs
    after the window, not before.

    Plan: one hash shuffle on ``keys``, one per-key ``row_number``
    window. Skewed keys are per-key bounded (a hot key costs its own
    sort only); AQE splits oversized partitions.
    """
    if not keys:
        raise ValueError("latest_by_key requires at least one key column")
    if not order_by:
        raise ValueError("latest_by_key requires at least one order column")
    w = Window.partitionBy(*[to_col(k) for k in keys]) \
        .orderBy(*_desc_cols(order_by))
    out = (df.withColumn("__rn", F.row_number().over(w))
           .where(F.col("__rn") == 1).drop("__rn"))
    if delete_col is not None:
        out = out.where(~F.coalesce(to_col(delete_col), F.lit(False)))
    return out


def scd2(
    df: DataFrame, keys: Sequence[str], ts_col: str,
    tiebreak: Sequence[str] = (),
    attr_cols: Sequence[str] | None = None,
    collapse_unchanged: bool = False,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: every version row gets
    ``valid_from`` (its own ``ts_col``), ``valid_to`` (the NEXT
    version's timestamp, NULL for the current version) and
    ``is_current``.

    ``collapse_unchanged``: drop rows whose ``attr_cols`` equal the
    previous version's (null-safe) before computing validity — repeated
    identical snapshots then merge into one interval, the standard SCD2
    change-detection. Both window passes share one partitioning, so the
    collapse costs no extra shuffle.
    """
    if not keys:
        raise ValueError("scd2 requires at least one key column")
    order = [to_col(ts_col).asc()] + [to_col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*[to_col(k) for k in keys]).orderBy(*order)

    out = df
    if collapse_unchanged:
        attrs = list(attr_cols if attr_cols is not None else
                     [c for c in df.columns
                      if c not in set(keys) | {ts_col} | set(tiebreak)])
        if not attrs:
            raise ValueError("collapse_unchanged requires attr_cols")
        cur = F.struct(*[to_col(c) for c in attrs])
        same = cur.eqNullSafe(F.lag(cur).over(w))
        out = (out.withColumn("__same", same)
               .where(~F.coalesce(F.col("__same"), F.lit(False)))
               .drop("__same"))

    out = out.withColumn("valid_from", to_col(ts_col)) \
             .withColumn("valid_to", F.lead(to_col(ts_col)).over(w)) \
             .withColumn("is_current", F.col("valid_to").isNull())
    return out


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str,
    classify_reformat: bool = True,
) -> DataFrame:
    """Crawl-to-crawl corpus delta: classify every document id across
    two snapshots as ``added`` (new only), ``removed`` (old only),
    ``unchanged`` (byte-identical text), ``reformatted`` (differs only
    by the C4 canonicalization — casing / combining form / whitespace;
    `dedup.normalize_for_dedup`), or ``modified`` (real content
    change). The triage step of an incremental pipeline: only
    added+modified docs need re-scoring, re-embedding, and
    `near_dup_against_prebuilt`; reformatted docs keep their derived
    artifacts.

    Scale shape: each side reduces scan-side to (id, 8-byte raw hash,
    8-byte normalized hash) — text never shuffles — then ONE full outer
    hash join on the id. With both snapshots stored bucketed on the id
    (sources.sinks.write_bucketed) even that shuffle disappears.

    Output: (id_col, status). With ``classify_reformat=False`` the NFC
    Arrow pass is skipped and reformatted collapses into modified.
    """
    from .dedup import normalize_for_dedup

    def side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(id_col).alias("__id"),
                F.xxhash64(text_col).alias(f"__h_{tag}")]
        if classify_reformat:
            cols.append(F.xxhash64(normalize_for_dedup(text_col))
                        .alias(f"__n_{tag}"))
        else:
            cols.append(F.lit(None).cast("long").alias(f"__n_{tag}"))
        return df.select(*cols)

    j = side(old, "o").join(side(new, "n"), "__id", "full_outer")
    status = (
        F.when(F.col("__h_o").isNull(), F.lit("added"))
        .when(F.col("__h_n").isNull(), F.lit("removed"))
        .when(F.col("__h_o") == F.col("__h_n"), F.lit("unchanged"))
        .when(F.col("__n_o").eqNullSafe(F.col("__n_n"))
              & F.col("__n_o").isNotNull(), F.lit("reformatted"))
        .otherwise(F.lit("modified"))
    )
    return j.select(F.col("__id").alias(id_col), status.alias("status"))
