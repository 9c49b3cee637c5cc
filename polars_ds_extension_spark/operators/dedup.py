"""Large-scale document deduplication operators.

The reference repo has no dedup module; these are the training-data
pipeline operators the brief names as first-class. Every design here is
shaped for the 100 TB case:

  * exact dedup shuffles 8-byte hashes, never text;
  * minhash signatures are computed scan-side (zero shuffle), candidate
    generation is ONE shuffle on (band, band_hash), and bucket size is
    capped so a degenerate bucket (all-identical spam) cannot produce an
    O(n²) pair explosion on one executor;
  * the hash function never leaks into results — candidates are always
    re-verified with exact Jaccard, so output is engine-independent and
    oracle-checkable;
  * there is NO all-pairs join anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------- exact dedup

def exact_dedup(df: DataFrame, cols: Sequence[str], id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct value of ``cols``.

    Shuffles on xxhash64(cols) — 8 bytes per row regardless of text width.
    A final equality check within hash groups guards against the ~2^-64
    collision case without ever comparing across groups.
    """
    h = F.xxhash64(*[F.col(c) for c in cols])
    w = df.withColumn("__h", h)
    keep = w.groupBy("__h", *cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), id_col, "left_semi")


def duplicate_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-row summary: total rows, distinct values of ``cols``, dupe rows.

    distinct is counted exactly via the same hash-group trick (one
    shuffle); at extreme scale swap count_distinct for approx_count_distinct.
    """
    h = F.xxhash64(*[F.col(c) for c in cols])
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(h).alias("n_distinct"),
        (F.count(F.lit(1)) - F.count_distinct(h)).alias("n_dupes"),
    )


# ----------------------------------------------------------------- shingling

def char_shingles(text, k: int = 12) -> Column:
    """Distinct character k-grams of ``text`` — the MinHash token set.

    Pure JVM higher-order functions; computed scan-side, never shuffled.
    """
    t = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
            lambda i: F.substring(t, i, k),
        )
    )


def word_shingles(text, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of whitespace-tokenized text."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(t), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two array columns (order-insensitive)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


# ------------------------------------------------------------------- minhash

def minhash_signature(shingles: Column, n_hashes: int = 96) -> Column:
    """MinHash signature: array of n_hashes longs.

    min over shingles of xxhash64(shingle, seed) for each seed — one nested
    higher-order expression, fully JVM-side, O(n_hashes · |shingles|) per
    row with zero shuffle. The plan stays constant-size (the seed loop is a
    runtime sequence, not unrolled Python).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, i))),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    bands: int = 32,
    rows_per_band: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Candidate near-dup id pairs from banded MinHash signatures.

    ONE shuffle on (band, band_hash). Pairs are generated inside each
    bucket with a JVM nested-transform over the collected id array —
    buckets larger than ``max_bucket`` are dropped (at 100 TB a giant
    bucket means degenerate boilerplate; cap + log, don't explode).
    Output: (id_a, id_b) with id_a < id_b, distinct.
    """
    band = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda j: F.struct(
                j.alias("band"),
                F.xxhash64(F.slice(F.col(sig_col), j * rows_per_band + 1,
                                   rows_per_band)).alias("bh"),
            ),
        )
    )
    exploded = df.select(F.col(id_col).alias("__id"), band.alias("__b"))
    buckets = (
        exploded.groupBy("__b")
        .agg(F.collect_set("__id").alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
        .select(F.array_sort("ids").alias("ids"))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2,
                                F.greatest(F.size("ids") - i - 1, F.lit(0))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle_k: int = 12,
    n_hashes: int = 96,
    bands: int = 32,
    max_bucket: int = 200,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    Pipeline: shingle+sign scan-side → banded LSH (one shuffle) →
    candidate pairs → join back for shingle sets (shuffle joins on id) →
    exact Jaccard filter. The hash function only generates candidates;
    the output is defined purely by Jaccard ≥ threshold, so it is
    engine-independent (the SQL oracle computes the same set exactly).
    Output: (id_a, id_b, jaccard).
    """
    rows_per_band = n_hashes // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        char_shingles(text_col, shingle_k).alias("__sh"),
    )
    with_sig = base.withColumn("__sig", minhash_signature(F.col("__sh"), n_hashes))
    cand = lsh_candidate_pairs(with_sig, "__id", "__sig", bands, rows_per_band,
                               max_bucket)
    sh = base.select(F.col("__id"), F.col("__sh"))
    joined = (
        cand.join(sh.withColumnRenamed("__id", "id_a")
                    .withColumnRenamed("__sh", "__sh_a"), "id_a")
            .join(sh.withColumnRenamed("__id", "id_b")
                    .withColumnRenamed("__sh", "__sh_b"), "id_b")
    )
    return (
        joined.select(
            "id_a", "id_b",
            jaccard(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------------- simhash

def simhash(text, k_shingle: int = 0) -> Column:
    """64-bit SimHash fingerprint of text (long).

    Tokens (whitespace, or char k-grams when k_shingle>0) are hashed to 64
    bits; each bit position accumulates +1/-1 across tokens; the sign
    vector packs back into one long. Entirely JVM higher-order expressions
    — scan-side, zero shuffle, O(64·tokens) per row.
    """
    t = F.col(text) if isinstance(text, str) else text
    toks = char_shingles(t, k_shingle) if k_shingle else F.split(F.trim(t), r"\s+")
    hashes = F.transform(toks, lambda s: F.xxhash64(s))
    # 64 independent per-bit vote aggregates, unrolled with int shift
    # amounts (shiftright requires a literal count). Plan size is linear
    # in 64 — each term is a flat aggregate, no self-reference.
    # NB: factory closure, not default-arg capture — pyspark's lambda
    # wrapper counts default args as lambda variables and would shadow j.
    def _vote_merge(j):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    fp = F.lit(0).cast("long")
    for j in range(64):
        votes = F.aggregate(hashes, F.lit(0), _vote_merge(j))
        fp = fp.bitwiseOR(
            F.when(votes > 0, F.lit(1 << j if j < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return fp


def hamming64(a: Column, b: Column) -> Column:
    """Bit-level Hamming distance between two long fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle_k: int = 12,
    n_tables: int = 8,
) -> DataFrame:
    """SimHash-blocked near-dup pairs, exact-Jaccard verified.

    The 64-bit fingerprint splits into ``n_tables`` bands; docs sharing any
    band are candidates (catches pairs within ~n_tables-1 differing bits
    spread across bands). Same one-shuffle + verify shape as MinHash-LSH;
    simhash blocking is cheaper (64 bits/doc vs n_hashes·8 bytes) at some
    recall cost. Output: (id_a, id_b, jaccard).
    """
    width = 64 // n_tables
    base = df.select(
        F.col(id_col).alias("__id"),
        char_shingles(text_col, shingle_k).alias("__sh"),
        simhash(F.col(text_col), shingle_k).alias("__sim"),
    )
    band = F.explode(
        F.array(*[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftright(F.col("__sim"), j * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("bh"),
            )
            for j in range(n_tables)
        ])
    )
    exploded = base.select("__id", band.alias("__b"))
    buckets = (
        exploded.groupBy("__b")
        .agg(F.collect_set("__id").alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= 200))
        .select(F.array_sort("ids").alias("ids"))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2,
                                F.greatest(F.size("ids") - i - 1, F.lit(0))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()
    sh = base.select("__id", "__sh")
    joined = (
        pairs.join(sh.withColumnRenamed("__id", "id_a")
                     .withColumnRenamed("__sh", "__sh_a"), "id_a")
             .join(sh.withColumnRenamed("__id", "id_b")
                     .withColumnRenamed("__sh", "__sh_b"), "id_b")
    )
    return (
        joined.select(
            "id_a", "id_b",
            jaccard(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------- blocked n-gram jaccard

def blocked_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n_gram: int = 3,
) -> DataFrame:
    """All-pairs word-n-gram Jaccard WITHIN a blocking key.

    The blocking key bounds the join (shuffle on block_col, pairs only
    inside blocks) — the classic entity-resolution shape. Output:
    (id_a, id_b, jaccard).
    """
    base = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        word_shingles(text_col, n_gram).alias("__sh"),
    )
    a = base.select("__blk", F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = base.select("__blk", F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    return (
        a.join(b, "__blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jaccard(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"))
    )
