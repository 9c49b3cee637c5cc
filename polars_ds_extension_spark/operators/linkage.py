"""Blocked fuzzy record linkage (entity resolution) between two
frames.

The classic two-phase design every production linker uses (Fellegi &
Sunter framing; the blocking trick of dedupe/splink/recordlinkage):

  1. BLOCK: a cheap deterministic key (a substring, a phonetic code, a
     sorted-token prefix) equi-joins the two sides — Catalyst plans it
     as an ordinary hash join, so the 100 TB side shuffles ONCE on the
     block key and only same-block pairs ever materialize. Without
     this, fuzzy matching is an all-pairs cross join — the O(n·m)
     cliff.
  2. VERIFY: the expensive string similarity (Jaro-Winkler / OSA /
     Levenshtein from functions/string_ — Arrow-batch numpy kernels,
     never per-row Python) runs only inside blocks, and a threshold
     keeps the matches.

Recall is exactly "do true matches share a block key" — choose the
block so the fields you expect to be corrupted stay OUT of it.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .._utils import to_col
from ..functions import string_ as STR

__all__ = ["blocked_fuzzy_join"]

_METRICS: dict[str, Callable[..., Column]] = {
    "jaro_winkler": lambda a, b: STR.str_jw(a, b),
    "jaro": lambda a, b: STR.str_jaro(a, b),
    "levenshtein": lambda a, b: STR.str_leven(a, b, return_sim=True),
    "osa": lambda a, b: STR.str_osa(a, b, return_sim=True),
}


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    block: Callable[[Column], Column],
    threshold: float = 0.9,
    metric: str = "jaro_winkler",
    top1: bool = False,
) -> DataFrame:
    """Match ``left`` records to ``right`` records whose ``block`` key
    is equal and whose text similarity clears ``threshold``.

    ``block`` maps a text Column to a block-key Column (applied to both
    sides). ``top1=True`` keeps only each left record's best match
    (similarity desc, right id asc — deterministic).

    Returns (left_id, right_id, sim) with sim rounded by the caller.
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {sorted(_METRICS)}")
    lt, rt = to_col(left_text), to_col(right_text)
    l = left.select(to_col(left_id).alias("__lid"), lt.alias("__ltxt"),
                    block(lt).alias("__b"))
    r = right.select(to_col(right_id).alias("__rid"), rt.alias("__rtxt"),
                     block(rt).alias("__b"))
    sim = _METRICS[metric](F.col("__ltxt"), F.col("__rtxt"))
    cand = (l.join(r, "__b")
             .select("__lid", "__rid", sim.alias("sim"))
             .where(F.col("sim") >= float(threshold)))
    if top1:
        w = Window.partitionBy("__lid").orderBy(
            F.col("sim").desc(), F.col("__rid").asc())
        cand = (cand.withColumn("__rk", F.row_number().over(w))
                    .where(F.col("__rk") == 1).drop("__rk"))
    return (cand.withColumnRenamed("__lid", left_id)
                .withColumnRenamed("__rid", right_id))


def fuzzy_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Callable[[Column], Column],
    threshold: float = 0.9,
    metric: str = "jaro_winkler",
    max_iters: int = 25,
) -> DataFrame:
    """Entity resolution within ONE frame: blocked fuzzy self-join →
    similarity pair graph → connected components → canonical id (the
    smallest id reachable). The full dedupe/splink pipeline composed
    from this module's verify kernel and dedup.connected_components.

    Same scale contract as blocked_fuzzy_join (one block-key shuffle,
    string kernels only inside blocks, `id_a < id_b` halves the
    self-join) plus the CC tiers (driver union-find ≤100k edges →
    broadcast loop → shuffle loop). Blocking keys must separate
    entities: records of DIFFERENT entities sharing a block AND
    clearing the threshold will merge — that is the (standard) recall/
    precision dial of blocked ER, not a bug.

    Requires an INTEGRAL id column: connected_components labels by
    numeric min-reduction, and under ANSI mode a string id would crash
    mid-job (with ANSI off it would null out and silently return every
    record as a singleton) — so non-integral ids raise here instead;
    hash or factorize string ids first (e.g. xxhash64, or a join
    against a generated dense id).

    Returns every input row as (id_col, canonical) — singletons map to
    themselves.
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {sorted(_METRICS)}")
    # resolve the dtype through the analyzed schema so a Column id —
    # which to_col supports everywhere else — validates by its actual
    # type instead of always failing the str-only dict(df.dtypes) lookup
    id_field = df.select(to_col(id_col)).schema[0]
    if id_field.dataType.simpleString() not in (
            "tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"fuzzy_dedup needs an integral id column (got "
            f"{id_field.name}: {id_field.dataType.simpleString()}); "
            "hash or factorize string ids first")
    id_name = id_col if isinstance(id_col, str) else id_field.name
    t = to_col(text_col)
    side = df.select(to_col(id_col).alias("__id"), t.alias("__txt"),
                     block(t).alias("__b"))
    l = side.select(F.col("__id").alias("__lid"),
                    F.col("__txt").alias("__ltxt"), "__b")
    r = side.select(F.col("__id").alias("__rid"),
                    F.col("__txt").alias("__rtxt"), "__b")
    sim = _METRICS[metric](F.col("__ltxt"), F.col("__rtxt"))
    pairs = (l.join(r, "__b")
              .where(F.col("__lid") < F.col("__rid"))
              .select(F.col("__lid").alias("id_a"),
                      F.col("__rid").alias("id_b"), sim.alias("sim"))
              .where(F.col("sim") >= float(threshold))
              .select("id_a", "id_b"))

    from .dedup import connected_components

    comp = connected_components(pairs, "id_a", "id_b",
                                max_iters=max_iters, assume_unique=True)
    out = df.select(to_col(id_col).alias(id_name)).join(
        comp.withColumnRenamed("id", id_name), id_name, "left")
    return out.select(
        id_name,
        F.coalesce(F.col("comp"), F.col(id_name)).alias("canonical"))
