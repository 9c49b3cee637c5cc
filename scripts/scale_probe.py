"""Scale probe: measure T(sf1.0) / T(sf0.1) for the most expensive
catalog queries on a 10x-inflated copy of the sf0.1 tables.

The sf0.1 bench verifies speed at test scale; this probe verifies the
SHAPE — a query whose plan is 100TB-ready should scale ~linearly in
rows (ratio ~10 for scan-bound work, lower for sample-bounded kernels,
higher only where a documented quadratic term lives). Inflation unions
10 id-shifted copies of each base table (foreign keys shifted together
so join integrity holds) and materializes them as parquet under
.probe_data/ (gitignored; built lazily, reused after).

Two variants control DUP-CLUSTER DENSITY in the text corpus:

* default (sf1.0, constant density): copy k's text goes through a
  LENGTH-PRESERVING character rotation cipher (a-z, A-Z, 0-9 each
  rotated by k; k=0 identity), so the 10 copies carry disjoint token
  AND char-shingle vocabularies while every within-copy pairwise
  Jaccard — word or char-shingle — is EXACTLY the base corpus's (a
  char-wise bijection maps each 12-shingle bijectively). Each copy
  keeps the base dup structure: same absolute cluster sizes, 10x as
  many clusters — what a 10x-bigger real corpus looks like, and the
  shape the probe grades. (The previous per-token digit-SUFFIX
  transform was NOT Jaccard-preserving for the low-similarity
  background: the inserted digits lengthen the character runs shared
  around common short tokens, so 12-char windows collide across
  unrelated docs far more often — measured: max LSH bucket 16 at base
  vs 116 at 10x, 42x distinct candidate pairs for 10x docs. That made
  near_dup_minhash look super-linear (r8's 5.0x) when the operator's
  own growth was linear — a probe-data artifact, not a plan property.)
* --dense (sf1.0-dense): text copied VERBATIM — every base-corpus dup
  cluster fuses across copies into one 10x-bigger cluster, so pair
  emission inside clusters grows ~100x by construction (the r6 probe's
  confound: near_dup_minhash's corpus is docs ∪ one perturbed copy, so
  base clusters have size 2 and dense inflation makes them size 20 =
  190 pairs instead of 1). Kept as the adversarial hot-cluster
  stress, not the linearity gauge.

Usage: python scripts/scale_probe.py [--rebuild] [--dense] [query ...]
Prints one JSON line: {"probe": {q: {"t_small": s, "t_large": s,
"ratio": r}}, "factor": 10, "variant": "const-density"|"dense"}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_PROBE_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".probe_data")
# v3: text cipher + per-copy ORTHOGONAL embedding rotation (dir name
# versions the transform so a cached build from an older transform can
# never be silently reused). v2 inflated embeddings VERBATIM — every
# vector-side probe measured a 10x-fused hot cluster instead of a
# 10x-bigger vector population (r11 verdict #5); the rotation is the
# vector analogue of the text cipher: within-copy cosines and norms
# are preserved exactly (orthogonality), cross-copy similarity
# collapses to chance.
PROBE_DIR = os.path.join(_PROBE_ROOT, "sf1.0v3")
PROBE_DIR_DENSE = os.path.join(_PROBE_ROOT, "sf1.0-dense")
# 100x spot set (documents+embeddings only — the tables the
# scale-critical dedup/ANN/ngram family reads): one datapoint per round
# at a scale where 10x-ratio compounding would be visible. Uses a
# seeded PERMUTATION cipher per copy (not rotation: rotation keys
# collide mod 26, so copies 0/26/52/78 of a 100x build would carry
# IDENTICAL text and fuse dup clusters across copies — the exact
# artifact class the v2 cipher fixed at 10x).
# v3: permutation cipher for EVERY copy k >= 1 (v2) + the orthogonal
# embedding rotation (see PROBE_DIR; same per-copy seeds)
PROBE_DIR_SPOT = os.path.join(_PROBE_ROOT, "sf10v3-perm")
SPOT_FACTOR = 100
SPOT_TABLES = ("documents", "embeddings")
SPOT_QUERIES = ["near_dup_minhash", "near_dup_cluster_dedup",
                "ann_ivf_search", "top_ngrams",
                # r11: the DAILY-LOOP family — the recurring production
                # cost at 100 TB is the incremental path (fold a batch
                # into a persisted index / dedup a batch against the
                # corpus / cut a leakage-safe eval split), not the
                # one-shot mine the first four cover
                "index_update", "prebuilt_index_dedup",
                "incremental_dedup", "leakage_safe_split"]
FACTOR = 10

# (table, columns shifted by k * (max+1) per copy k) — FK pairs shift by
# the PARENT's stride so joins keep matching across copies. Dimension
# keys (supplier/part/customer) shift WITH their fact FKs: leaving them
# fixed while facts inflate 10x piles 10x the joint-order weight onto
# the SAME entity pairs, so co-occurrence graphs get 10x DENSER instead
# of 10x BIGGER (the r8 triangle_count 15x probe artifact) — real
# TPC-H growth scales the entity populations with SF.
_SHIFTS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
}
# child FK column -> parent key column (shares the parent's stride)
_FK = {
    "l_orderkey": "o_orderkey",
    "l_suppkey": "s_suppkey",
    "l_partkey": "p_partkey",
    "o_custkey": "c_custkey",
}
_COPY = ["region", "nation"]

# the 10 most expensive / scale-shape-critical catalog queries (r5
# bench ordering) — each exercises a distinct plan family
DEFAULT_QUERIES = [
    "eda_describe", "corr_family", "xi_corr", "glm_poisson",
    "mase_full", "near_dup_minhash", "near_dup_cluster_dedup",
    "knn_cosine", "ivf_ann", "series_entropy",
    # round 6 additions: the new heavy queries + the exact-quantile plan
    "dia_profile", "semantic_dedup", "dup_spans",
    # round 7: the temporal joins (watch the range-join explode factor)
    "asof_join", "range_join", "hypertable_rollup",
    # round 7b: CDC window plan, iterative graph plan, vocab-sized count
    # shuffles, the LM-gate composition, and the pandas-UDF scan family
    "upsert_latest", "pagerank", "top_ngrams", "perplexity_gate",
    "unicode_clean",
    # round 8: the ANN tiers' scale path, the wedge-counting graph plan,
    # and the sufficient-statistics iteration
    "ivfpq_search", "triangle_count", "kmeans",
    # round 9: the routed two-frame IVF search (knn_join route="auto"'s
    # delegate), the rebuilt SRP-LSH bucket plan, and the keep-k soft
    # dedup (pairs + CC + component window)
    "ann_ivf_search", "lsh_recall", "dup_cluster_downsample",
    # round 10: the brute→IVF handoff itself (knn_join route='auto'
    # actually routing) — the 100 TB path past the broadcast cap
    "knn_auto_route",
    # round 10b: incremental batch-vs-index dedup (asymmetric band
    # join), the weak-label ridge-IRLS classifier (8 fixed one-pass
    # scans — must stay linear), and the global shard shuffle (one
    # sort-shuffle of the corpus)
    "incremental_dedup", "quality_classifier", "shuffle_shards",
    # round 10b: the cross-source n-gram overlap matrix (corpus-wide
    # distinct + gram self-join bounded by |sources|²)
    "source_overlap",
    # round 10c: boilerplate-line census+strip (two line-set shuffles +
    # reassembly — must stay linear in exploded lines) and the
    # persisted-index probe path (build + band join + pruned verify)
    "strip_boilerplate", "prebuilt_index_dedup",
    # round 10d: the persisted-index UPDATE (build day1 → fold day2 →
    # probe both generations — the merge aggregation and the skinny
    # member/th join must stay linear in |kept members| + |batch|)
    "index_update",
    # round 11: the leakage-safe split (deterministic cut + asymmetric
    # near-dup scan with the tiny eval side as the index) and the
    # persisted-vector-index daily loop (frozen-quantizer assignment
    # must stay linear in |corpus|; probe work in |queries|·cells)
    "leakage_safe_split", "vector_index_update",
    # round 12b: the Bloom-prefiltered decontamination (the scan-side
    # bitset prune must keep the gram stream linear), the broadcast
    # DSIR ratio table (vocab-sized — the corpus-side shuffle is only
    # (id, ratio) pairs), and the two event-stream analytics (chained
    # user-keyed joins / three keyed aggregates — no windows over data)
    "bloom_decontaminate", "dsir_sample",
    "event_funnel", "cohort_retention",
]

# ---- probe rotation (r12 verdict #3) -------------------------------
# The full symmetric fresh-JVM min-of-3 matrix grew to ~44 probes ×
# both sides — enough that the official bench stopped fitting the
# driver's wall budget (BENCH_r12 died at rc=124 with every number
# lost). Like the correctness prefix, the probe set now ROTATES:
#   * ALWAYS_PROBES run every round — the SPOT_QUERIES' 10x legs feed
#    the 100x two-point fits, and knn_auto_route is the r11 weak row
#    awaiting its official re-pin;
#   * NEW_PROBES (edited per round, like queries._STALE) — queries
#    whose covering code changed this round;
#   * the remainder rotates in thirds by stable DEFAULT_QUERIES index,
#    so every probe re-measures within 3 rounds.
ALWAYS_PROBES = list(SPOT_QUERIES) + ["knn_auto_route"]
# round 15: semantic_dedup's default max_cell engaged the salting
# (plan gains the cell-count broadcast + salt key) and
# series_entropy's catalog query repartitions the grouped input —
# both probe-set members re-measure
NEW_PROBES = ["semantic_dedup", "series_entropy"]

# ---- 100x spot rotation (r13 verdict #1) ----------------------------
# All 8 spots no longer fit the driver's 2400 s budget on a degraded
# host (BENCH_r13 carried 2 of 8). Like the 10x probe matrix, the spot
# set rotates: the ALWAYS members run EVERY round, the rest alternate
# in halves by stable index, so every spot re-measures within 2 rounds
# and each round carries >= 4. near_dup_minhash graduated its
# <=2.0x-of-fit criterion in BENCH_r14 but stays ALWAYS (the headline
# spot); near_dup_cluster_dedup joined r15 with GUARANTEED min-of-3
# reps (r14 verdict #5: its 3rd rep yielded to the budget gate two
# rounds running, leaving a single-shot official wall) — bench.py's
# rep-yield gate exempts ALWAYS_SPOTS members.
ALWAYS_SPOTS = ["near_dup_minhash", "near_dup_cluster_dedup"]


def spot_rotation(round_no: int) -> list:
    # cohort by the query's STABLE index in SPOT_QUERIES, not in the
    # ALWAYS-filtered remainder (r15 review — the same re-classing
    # failure probe_rotation fixed in r13: growing ALWAYS_SPOTS by one
    # shifted every later spot's parity and would have left the r14
    # cohort unmeasured for 3 rounds). With stable indices the old
    # cadence is preserved exactly: r15 (odd) runs top_ngrams /
    # prebuilt_index_dedup / leakage_safe_split, r16 (even) runs
    # ann_ivf_search / index_update / incremental_dedup.
    sel = [q for i, q in enumerate(SPOT_QUERIES)
           if q in ALWAYS_SPOTS or i % 2 == round_no % 2]
    return ([q for q in sel if q in ALWAYS_SPOTS]
            + [q for q in sel if q not in ALWAYS_SPOTS])


def probe_rotation(round_no: int, names=None) -> list:
    names = list(names if names is not None else DEFAULT_QUERIES)
    keep = set(ALWAYS_PROBES) | set(NEW_PROBES)
    # cohort by the query's STABLE position in `names` — indexing the
    # keep-filtered remainder instead would re-class every query after
    # an edit point whenever NEW_PROBES changes size between rounds
    # (r13 review finding: simulated rotations left queries unmeasured
    # for 5 rounds), silently breaking the promised 3-round union.
    # ALWAYS/NEW run FIRST: the wall-budget gate truncates the TAIL of
    # this list, and losing a rotation member costs one round of a
    # 3-round cycle while losing a spot-fit leg costs the 100× fit
    # itself (r13: leakage_safe_split's fit leg fell to the gate).
    sel = [n for i, n in enumerate(names)
           if n in keep or i % 3 == round_no % 3]
    return ([n for n in sel if n in keep]
            + [n for n in sel if n not in keep])


# the adversarial hot-cluster stress (--dense: text copied verbatim so
# base dup clusters fuse 10x bigger): measured EVERY round beside the
# constant-density number — the bucket/cell caps are the defense, and a
# defense measured once is a defense that silently rots
DENSE_QUERIES = [
    "near_dup_minhash", "near_dup_cluster_dedup", "semantic_dedup",
    "top_ngrams",
    # round 10: the keep-k soft dedup under fused clusters — its base
    # is bounded (even ids < 2000) so this grades the bound holding
    # under the hot-cluster stress, not pair mining at large
    "dup_cluster_downsample",
    # round 10b: batch-vs-index dedup under verbatim-copy clusters —
    # every new doc hits a fused index bucket; the max_bucket cap is
    # the defense being measured
    "incremental_dedup",
]


def _cipher_maps(k: int, rotate_below_26: bool = True) -> "tuple[str, str]":
    """Length-preserving per-copy text cipher: each character class
    (a-z, A-Z, 0-9) maps bijectively within itself, so tokenization,
    char-window counts, n_chars, and every WITHIN-copy Jaccard are
    exactly the base corpus's while distinct copies share (essentially)
    no shingle vocabulary.

    ``rotate_below_26`` (10x build): k < 26 is rotation by k —
    byte-identical to the established cached v2 build, INCLUDING its
    digit-identity quirk for k >= 10 (digits[k:]+digits[:k] is the
    identity there; harmless at factor 10 where k <= 9). The SPOT build
    passes False so every copy k >= 1 gets a seeded random permutation
    per class — at factor 100 the rotation family both collides mod 26
    AND leaves digit-only/letter-free windows unmapped for 10<=k<=25,
    either of which fuses dup clusters across copies (the current
    corpus has zero letter-free 12-char windows, verified, but the
    cipher must not depend on that). Distinct seeds collide with
    probability ~1/26!."""
    import random
    import string as _s

    src = _s.ascii_lowercase + _s.ascii_uppercase + _s.digits
    if k < 26 and rotate_below_26:
        dst = (_s.ascii_lowercase[k:] + _s.ascii_lowercase[:k]
               + _s.ascii_uppercase[k:] + _s.ascii_uppercase[:k]
               + _s.digits[k:] + _s.digits[:k])
    else:
        rng = random.Random(0xC1FE00 + k)
        parts = []
        for cls in (_s.ascii_lowercase, _s.ascii_uppercase, _s.digits):
            chars = list(cls)
            rng.shuffle(chars)
            parts.append("".join(chars))
        dst = "".join(parts)
    return src, dst


def _rotated_embeddings(cp, k: int, d: int):
    """Apply copy-k's seeded random ORTHOGONAL rotation to the
    ``embedding`` column — the vector analogue of the text cipher
    (r11 verdict #5): Q_k is orthogonal, so every WITHIN-copy cosine
    and norm is preserved exactly (up to float32 re-rounding) while
    cross-copy similarity collapses to chance in 64 dims. Q_k comes
    from the QR of a seeded Gaussian with the R-diagonal sign fix, so
    the build is deterministic. k = 0 is the identity (the base copy,
    like the text cipher)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(0x0077A7E + k)
    A = rng.standard_normal((d, d))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))

    @pandas_udf("array<float>")
    def _rot(v: pd.Series) -> pd.Series:
        X = np.array([list(x) for x in v], dtype=np.float64)
        out = (X @ Q.T).astype(np.float32)
        return pd.Series(list(out))

    return cp.withColumn("embedding", _rot(F.col("embedding")))


def build_probe_data(spark, rebuild: bool = False,
                     dense: bool = False) -> str:
    from pyspark.sql import functions as F

    probe_dir = PROBE_DIR_DENSE if dense else PROBE_DIR
    if os.path.isdir(probe_dir):
        # dir existence is NOT build completeness: a crash mid-build
        # (r12: the rotation UDF raised during the embeddings table)
        # leaves a partial dir that, reused, fails every downstream
        # probe with path-not-found. The sentinel is written LAST.
        if not rebuild and os.path.exists(
                os.path.join(probe_dir, "_COMPLETE")):
            return probe_dir
        shutil.rmtree(probe_dir)
    os.makedirs(probe_dir, exist_ok=True)
    # strides come from the PARENT's own key column (a parent row with
    # no fact children would otherwise collide across copies if the
    # stride were derived from the child FK's max)
    strides = {}
    for t, cols in _SHIFTS.items():
        own = [c for c in cols if c not in _FK]
        if not own:
            continue
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        row = df.agg(*[F.max(F.col(c)).alias(c) for c in own]).first()
        for c in own:
            strides[c] = int(row[c]) + 1
    for t, cols in _SHIFTS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        emb_d = (len(df.select("embedding").first()[0])
                 if t == "embeddings" else 0)
        parts = []
        for k in range(FACTOR):
            cp = df
            for c in cols:
                key = _FK.get(c, c)
                cp = cp.withColumn(
                    c, (F.col(c) + k * strides[key]).cast(
                        dict(df.dtypes)[c]))
            if t == "documents" and not dense and k > 0:
                # constant-density text: per-copy cipher (see
                # _cipher_maps and the module docstring for why the old
                # token-suffix transform was wrong)
                src, dst = _cipher_maps(k)
                cp = cp.withColumn("text", F.translate("text", src, dst))
            if t == "embeddings" and not dense and k > 0:
                # constant-density vectors: per-copy orthogonal
                # rotation (the dense build keeps verbatim copies —
                # fused clusters ARE its adversarial point)
                cp = _rotated_embeddings(cp, k, emb_d)
            parts.append(cp)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{probe_dir}/{t}.parquet")
    for t in _COPY:
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{probe_dir}/{t}.parquet")
    with open(os.path.join(probe_dir, "_COMPLETE"), "w"):
        pass
    return probe_dir


def build_spot_data(spark, rebuild: bool = False) -> str:
    """100x documents+embeddings for the per-round spot probe: a 10x
    const-density ratio near 3 compounds to ~9x at 100x if truly
    polynomial — one 100x absolute per round distinguishes super-linear
    constants from asymptotes. Only the two tables the spot queries
    read (~75 MB total); lazily built, reused after."""
    from pyspark.sql import functions as F

    if os.path.isdir(PROBE_DIR_SPOT):
        # sentinel guard, same rationale as build_probe_data
        if not rebuild and os.path.exists(
                os.path.join(PROBE_DIR_SPOT, "_COMPLETE")):
            return PROBE_DIR_SPOT
        shutil.rmtree(PROBE_DIR_SPOT)
    os.makedirs(PROBE_DIR_SPOT, exist_ok=True)
    # key column -> owning table, so FK strides resolve from the
    # PARENT's parquet even when the parent is not in SPOT_TABLES
    # (e.g. adding lineitem here must read orders/supplier/part maxima,
    # not KeyError into bench's probe-skipped handler)
    key_owner = {c: t for t, cs in _SHIFTS.items()
                 for c in cs if c not in _FK}
    for t in SPOT_TABLES:
        cols = _SHIFTS[t]
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        emb_d = (len(df.select("embedding").first()[0])
                 if t == "embeddings" else 0)
        strides = {}
        for c in cols:
            key = _FK.get(c, c)
            pdf = (df if key_owner[key] == t else
                   spark.read.parquet(f"{BASE}/{key_owner[key]}.parquet"))
            strides[key] = int(pdf.agg(F.max(F.col(key))).first()[0]) + 1
        parts = []
        for k in range(SPOT_FACTOR):
            cp = df
            for c in cols:
                cp = cp.withColumn(
                    c, (F.col(c) + k * strides[_FK.get(c, c)]).cast(
                        dict(df.dtypes)[c]))
            if t == "documents" and k > 0:
                src, dst = _cipher_maps(k, rotate_below_26=False)
                cp = cp.withColumn("text", F.translate("text", src, dst))
            if t == "embeddings" and k > 0:
                cp = _rotated_embeddings(cp, k, emb_d)
            parts.append(cp)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(64).write.mode("overwrite").parquet(
            f"{PROBE_DIR_SPOT}/{t}.parquet")
    with open(os.path.join(PROBE_DIR_SPOT, "_COMPLETE"), "w"):
        pass
    return PROBE_DIR_SPOT


def run_probe(spark, names=None, runs: int = 2,
              dense: bool = False) -> dict:
    from polars_ds_extension_spark import queries as catalog

    qs = catalog.queries()
    names = list(names) if names else DEFAULT_QUERIES
    probe_dir = build_probe_data(spark, dense=dense)
    out = {}
    for n in names:
        if n not in qs:
            continue
        ts = {}
        for label, d in (("t_small", BASE), ("t_large", probe_dir)):
            samples = []
            for _ in range(runs):
                t0 = time.time()
                qs[n](spark, d).count()
                samples.append(time.time() - t0)
            # min, not median: JIT/codegen warmup lands in run 1 on
            # both sides; min compares warmed plans
            ts[label] = round(min(samples), 3)
        ts["ratio"] = round(ts["t_large"] / max(ts["t_small"], 1e-9), 2)
        out[n] = ts
        print(f"  {n}: {ts['t_small']}s -> {ts['t_large']}s "
              f"(x{ts['ratio']})", file=sys.stderr)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--rebuild", "--dense")]
    rebuild = "--rebuild" in sys.argv[1:]
    dense = "--dense" in sys.argv[1:]

    from polars_ds_extension_spark.session import get_spark

    spark = get_spark(app="pds-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if rebuild:
        build_probe_data(spark, rebuild=True, dense=dense)
    probe = run_probe(spark, args or None, dense=dense)
    print(json.dumps({"probe": probe, "factor": FACTOR,
                      "variant": "dense" if dense else "const-density"}))


if __name__ == "__main__":
    main()
