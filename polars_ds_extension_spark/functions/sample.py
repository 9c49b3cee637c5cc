"""Sampling & splitting — ref sample_and_split.py:15 (sample), :140
(volume_neutral), :238 (downsample), :416 (split_by_ratio).

Two flavors:
  * `*_random`: Spark's native Bernoulli sampling (fast, seedable, not
    reproducible across engines);
  * deterministic variants keyed on an id column via modulus buckets —
    reproducible everywhere (the driver's DuckDB oracle included) and
    stable across reruns/appends, which is what a 100 TB training-data
    pipeline actually wants for train/val/test splits.
All are scan-side filters — no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .._utils import to_col

__all__ = [
    "sample_random", "sample_deterministic", "downsample", "volume_neutral",
    "split_by_ratio", "stratified_sample", "split_col", "random_cols",
    "mixture_sample", "filter_by_global_quantile", "sample_exact_n",
    "group_bucket", "group_split_col", "split_by_group",
    "sample_exact_n_per_group", "kfold_col", "kfold_split",
    "weighted_sample_n", "token_mixture_sample",
    "shuffle_key", "shuffle_shards",
]

_BUCKETS = 10_000


def _bucket(id_col) -> Column:
    # Fibonacci-hash scramble keeps sequential ids uniform across buckets
    # while staying a one-line integer expression any engine reproduces.
    # The id is reduced mod _BUCKETS BEFORE the multiply: (id % m)·a % m
    # == id·a % m (a is coprime to m), but the product stays < 2^45, so
    # ids ≥ ~3.5e9 can't hit ANSI-mode ARITHMETIC_OVERFLOW.
    return F.pmod(
        F.pmod(to_col(id_col).cast("long"), F.lit(_BUCKETS))
        * F.lit(2654435761), F.lit(_BUCKETS))


def sample_random(df: DataFrame, fraction: float, seed: int | None = None) -> DataFrame:
    """Bernoulli row sample (Spark-native). Ref sample_and_split.py:15."""
    return df.sample(fraction=fraction, seed=seed)


def sample_deterministic(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep rows whose scrambled id bucket < fraction — reproducible
    sampling keyed on data, not on RNG state."""
    return df.where(_bucket(id_col) < int(fraction * _BUCKETS))


def downsample(df: DataFrame, condition: Column, id_col: str,
               fraction: float) -> DataFrame:
    """Keep all rows failing ``condition``; deterministically thin the
    rows matching it to ``fraction``. Ref sample_and_split.py:238
    (classic majority-class downsampling)."""
    return df.where(
        (~condition) | (_bucket(id_col) < int(fraction * _BUCKETS))
    )


def volume_neutral(df: DataFrame, class_col: str, id_col: str,
                   target: int | None = None) -> DataFrame:
    """Equalize class volumes: keep the first ``target`` rows per class
    (by id order); default target = size of the smallest class.
    Ref sample_and_split.py:140.

    One groupBy for class counts (tiny collect) + one parallel window
    partitioned by class — no global sort.
    """
    if target is None:
        counts = df.groupBy(class_col).count().collect()
        target = min(r["count"] for r in counts)
    w = Window.partitionBy(class_col).orderBy(to_col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= target)
        .drop("__rn")
    )


def split_col(id_col, ratios: Sequence[float],
              names: Sequence[str] | None = None) -> Column:
    """Label column assigning each row to a split by its id bucket —
    deterministic, engine-independent. Ref sample_and_split.py:416."""
    names = list(names) if names else [f"split_{i}" for i in range(len(ratios))]
    assert len(names) == len(ratios)
    b = _bucket(id_col)
    acc = 0.0
    expr = None
    for name, r in zip(names, ratios):
        acc += r
        cond = b < int(acc * _BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(names[-1]))


def split_by_ratio(df: DataFrame, id_col: str, ratios: Sequence[float],
                   names: Sequence[str] | None = None) -> dict[str, DataFrame]:
    """Materialize the splits as a dict of DataFrames (each a pushdown
    filter on the same scan)."""
    names = list(names) if names else [f"split_{i}" for i in range(len(ratios))]
    lab = split_col(id_col, ratios, names)
    return {n: df.where(lab == n) for n in names}


def leakage_safe_split(docs: DataFrame, id_col: str, text_col: str,
                       eval_frac: float = 0.05, seed: int = 42,
                       threshold: float = 0.6, shingle_k: int = 12,
                       n_hashes: int = 96, bands: int = 32,
                       max_bucket: int = 200) -> DataFrame:
    """Deterministic eval-holdout carve-out with a near-dup LEAKAGE
    guard — the reverse of benchmark decontamination: after the
    engine-reproducible `shuffle_key` cut assigns each doc to eval
    (key < eval_frac·P) or train, any TRAIN doc whose exact char-
    shingle Jaccard against some eval doc reaches ``threshold`` is
    marked ``dropped`` (keeping it would leak the held-out set into
    training; re-splitting can't fix what near-dups straddle).

    Output: input columns + ``split`` ∈ {'eval','train','dropped'} +
    ``leaked_to`` (the best-matching eval doc id for dropped rows,
    NULL otherwise — the audit trail). Membership is exact-Jaccard
    defined (MinHash banding only generates candidates), so the whole
    split is engine-reproducible and SQL-oracle-checkable.

    Scale shape: the split itself is a scan-side key filter (no
    shuffle); the leakage scan is the asymmetric batch-vs-index probe
    (`near_dup_against_index`) with the SMALL eval side as the index —
    its band table broadcasts, the 95% train side streams past it, and
    the verify join touches candidate ids only. One broadcastable join
    marks the dropped rows back onto the corpus.
    """
    from ..operators.dedup import near_dup_against_index

    if not 0.0 < eval_frac < 1.0:
        raise ValueError("eval_frac must be in (0, 1)")
    cut = int(eval_frac * _SHUFFLE_P)
    base = docs.withColumn("__k", shuffle_key(id_col, seed))
    ev = base.where(F.col("__k") < cut)
    tr = base.where(F.col("__k") >= cut)
    leaked = near_dup_against_index(
        tr.select(id_col, text_col), ev.select(id_col, text_col),
        id_col, text_col, threshold=threshold, shingle_k=shingle_k,
        n_hashes=n_hashes, bands=bands, max_bucket=max_bucket)
    marks = leaked.select(F.col("new_id").alias("__lid"),
                          F.col("index_id").alias("leaked_to"))
    # no forced broadcast: the dropped set is usually tiny (near-dups
    # straddling the cut) and AQE broadcasts it; a pathological corpus
    # where it ISN'T tiny must not OOM the driver
    out = base.join(marks, to_col(id_col) == F.col("__lid"), "left")
    split = (F.when(F.col("__k") < cut, F.lit("eval"))
             .when(F.col("leaked_to").isNotNull(), F.lit("dropped"))
             .otherwise(F.lit("train")))
    return out.withColumn("split", split).drop("__k", "__lid")


def stratified_sample(df: DataFrame, strata: Sequence[str], id_col: str,
                      fraction: float) -> DataFrame:
    """Deterministic per-stratum sampling: the bucket hash mixes the
    stratum so each stratum gets an independent ~fraction. Ref
    sample_and_split.py (stratified)."""
    b = F.pmod(
        F.xxhash64(*[F.col(s) for s in strata], to_col(id_col)), F.lit(_BUCKETS)
    )
    return df.where(b < int(fraction * _BUCKETS))


def random_cols(cols: Sequence[str], k: int, seed: int = 42,
                keep_first: bool = False) -> list[str]:
    """Deterministically pick k of the given columns (driver-side helper,
    ref sample_and_split.py random_cols)."""
    import random as _random

    pool = list(cols)
    first = pool[:1] if keep_first else []
    rest = pool[1:] if keep_first else pool
    rng = _random.Random(seed)
    chosen = rng.sample(rest, min(k, len(rest)))
    return first + sorted(chosen, key=pool.index)


def mixture_sample(df: DataFrame, id_col: str, group_col: str,
                   alpha: float = 0.5,
                   target_rows: int | None = None) -> DataFrame:
    """Temperature-based mixture resampling across sources — the
    data-mixing step of LLM corpus assembly (sample source s with
    probability ∝ count_s^alpha, alpha<1 upweights small sources, the
    multilingual-sampling rule of mBERT/XLM-R and friends).

    Per-source keep-rate r_s = min(1, target·w_s / count_s) with
    w_s = count_s^α / Σ count^α and target = target_rows (default: the
    corpus size — pure re-balancing). Selection is the deterministic id
    scramble (same as sample_deterministic), so the sample is
    engine-reproducible and append-stable.

    Plan: ONE tiny groupBy collects per-source counts (sources ≪ rows)
    to the driver, keep-rates come back as a broadcast literal map, and
    the filter runs scan-side — no shuffle of the corpus at any point.

    Output: the sampled rows (original schema).
    """
    import math

    # sorted by group key so the float accumulation order (and therefore
    # every rate, bit-for-bit) is independent of partition arrival order;
    # the total-order key keeps NULL / mixed-type group keys sortable
    counts = dict(sorted(
        ((r[0], r[1]) for r in
         df.groupBy(group_col).agg(F.count(F.lit(1))).collect()),
        key=lambda kv: (kv[0] is None, str(kv[0]))))
    total = sum(counts.values())
    target = float(target_rows if target_rows is not None else total)
    # math.sqrt is correctly rounded (pow(x, .5) need not be) — keeps the
    # α=0.5 default reproducible against any other engine's SQRT
    pw = (lambda c: math.sqrt(c)) if alpha == 0.5 else (lambda c: c ** alpha)
    wsum = sum(pw(float(c)) for c in counts.values())
    rates = {g: min(1.0, target * (pw(float(c)) / wsum) / c)
             for g, c in counts.items()}
    rate_col = F.lit(None).cast("double")
    for g, r in rates.items():
        # eqNullSafe so a NULL source group matches its own rate instead
        # of null-comparing its rows straight out of the sample
        rate_col = F.when(to_col(group_col).eqNullSafe(F.lit(g)), F.lit(r)) \
            .otherwise(rate_col)
    return df.where(_bucket(id_col) < rate_col * _BUCKETS)


def token_mixture_sample(df: DataFrame, id_col: str, group_col: str,
                         token_col, target_weights: dict,
                         token_budget: float | None = None) -> DataFrame:
    """TOKEN-budget mixture sampling across sources — the data-mixing
    step specified the way LLM training actually consumes corpora: a
    target mixture in TOKENS (``target_weights``, normalized
    internally) and a total ``token_budget`` (default: the corpus
    token count — pure re-balancing). ``mixture_sample`` balances
    document COUNTS; with heterogeneous doc lengths that is the wrong
    knob — a source of 10x-longer documents eats 10x its intended
    share of the compute budget.

    Per-source keep-rate r_s = min(1, w_s·B / T_s) over per-source
    token totals T_s; selection is the deterministic id scramble, so
    the EXPECTED sampled token mass per source is w_s·B (capped by
    availability) and the sample is engine-reproducible and
    append-stable. Sources missing from ``target_weights`` get weight
    0 (dropped).

    Plan: ONE tiny groupBy collects per-source token totals (sources ≪
    rows) to the driver, rates come back as a scan-side literal CASE —
    no shuffle of the corpus at any point.
    Output: the sampled rows (original schema).
    """
    totals = dict(sorted(
        ((r[0], float(r[1])) for r in
         df.groupBy(group_col).agg(F.sum(to_col(token_col))).collect()),
        key=lambda kv: (kv[0] is None, str(kv[0]))))
    corpus_tokens = sum(totals.values())
    budget = float(token_budget if token_budget is not None
                   else corpus_tokens)
    wsum = float(sum(target_weights.values()))
    if wsum <= 0:
        raise ValueError("target_weights must sum to a positive value")
    rates = {}
    for g, t in totals.items():
        w = float(target_weights.get(g, 0.0)) / wsum
        rates[g] = min(1.0, (w * budget / t) if t > 0 else 0.0)
    rate_col = F.lit(None).cast("double")
    for g, r in rates.items():
        rate_col = F.when(to_col(group_col).eqNullSafe(F.lit(g)), F.lit(r)) \
            .otherwise(rate_col)
    return df.where(_bucket(id_col) < rate_col * _BUCKETS)


def filter_by_global_quantile(df: DataFrame, value_col: str,
                              q: float = 0.75,
                              keep: str = "top") -> DataFrame:
    """Keep the rows above (``keep="top"``) or below (``"bottom"``) the
    EXACT global q-quantile of ``value_col`` — the quality-threshold
    filter of training-data pipelines, with rank semantics that every
    engine reproduces (no approximate percentile in the cut).

    The exact global rank AND the row count both come from the two-pass
    range-bucket plan (plans/ranks.global_min_rank with total_name —
    the per-bucket counts of the offsets pass sum to n for free, no
    separate count() scan; no single-partition sort anywhere). A row
    survives when its min-rank clears floor(q·n) (ties at the threshold
    value share a rank, so the whole tied group lands on one side — the
    only engine-stable choice).
    """
    from ..plans import global_min_rank

    ranked = global_min_rank(df, to_col(value_col), out_name="__qr",
                             total_name="__qn")
    # floor(q·n) == int(q·n) for the non-negative product; both sides
    # are IEEE doubles so the cut matches a driver-side int(q * count)
    cut = F.floor(F.lit(float(q)) * F.col("__qn"))
    if keep == "top":
        out = ranked.where(F.col("__qr") > cut)
    else:
        out = ranked.where(F.col("__qr") <= cut)
    return out.drop("__qr", "__qn")


def sample_exact_n(df: DataFrame, id_col: str, n: int) -> DataFrame:
    """EXACTLY ``n`` rows, deterministically — the rows whose scrambled
    id ranks smallest (ties by id). Fraction-based sampling gives a
    binomial-sized result; training pipelines often need the exact
    count ("take 10M docs"). The global rank runs on the two-pass
    range-bucket plan (plans/ranks.global_min_rank) — no single-
    partition sort — and the scramble makes the pick uniform yet
    append-stable and engine-reproducible.
    """
    from ..plans import global_min_rank

    # rank = (min-rank of this row's scramble bucket) + (row_number
    # within the bucket by id) - 1. The bucket rank runs on the two-pass
    # plan over a 10k-value column (no precision games with a combined
    # arithmetic sort key — a bucket*K + id double loses id bits once
    # ids pass 2^53/K); the within-bucket window is hash-partitioned on
    # the bucket (parallel, ~n/10k rows per task).
    b = df.withColumn("__bk", _bucket(id_col))
    ranked = global_min_rank(b, "__bk", out_name="__br")
    w = Window.partitionBy("__bk").orderBy(to_col(id_col))
    ranked = ranked.withColumn(
        "__rnk", F.col("__br") + F.row_number().over(w) - 1)
    return ranked.where(F.col("__rnk") <= n).drop("__bk", "__br", "__rnk")


_SHUFFLE_P = 2_147_483_647  # Mersenne prime 2^31-1: products stay < 2^48
# ((p-1)·69621 ≈ 1.5e14 < 2^48 ≈ 2.8e14) — exact in int64 and in doubles


def _shuffle_consts(seed: int) -> tuple[int, int, int]:
    """Seed-derived offsets for `shuffle_key` — plain Python ints so the
    DuckDB oracle can inline the identical literals."""
    return ((seed * 2654435761) % _SHUFFLE_P,
            (seed * 1013904223 + 12345) % _SHUFFLE_P,
            (seed * 1664525 + 1013904223) % _SHUFFLE_P)


def shuffle_key(id_col, seed: int = 42) -> Column:
    """Deterministic pseudo-random sort key for GLOBAL training-data
    shuffling: two chained affine-congruential rounds (classic MCG
    multipliers 48271 / 69621) over the Mersenne prime 2^31−1. Every
    product stays < 2^47, so the arithmetic is exact int64 in any
    engine — the shuffle order is reproducible across Spark, DuckDB,
    and reruns/appends, unlike `rand()`-keyed shuffles.

    Sequential ids scatter across the 31-bit key space; sorting by
    (key, id) yields the IID-looking batch order LLM training wants
    after mixture assembly groups documents by source. Non-negative
    ids assumed (Spark's pmod and SQL's % agree there).
    """
    s, b1, b2 = _shuffle_consts(seed)
    # reduce the id mod p BEFORE adding the seed offset: (id%p + s) % p
    # == (id+s) % p, but the sum stays < 2^32 so ids near 2^63 can't
    # hit ANSI ARITHMETIC_OVERFLOW (same guard as `_bucket`)
    h = F.pmod(F.pmod(to_col(id_col).cast("long"), F.lit(_SHUFFLE_P))
               + F.lit(s), F.lit(_SHUFFLE_P))
    h = F.pmod(h * F.lit(48271) + F.lit(b1), F.lit(_SHUFFLE_P))
    return F.pmod(h * F.lit(69621) + F.lit(b2), F.lit(_SHUFFLE_P))


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int,
                   seed: int = 42) -> DataFrame:
    """Assign every row a training shard and its position within the
    shard's globally-shuffled order: shard = shuffle_key % n_shards,
    position = rank of (key, id) inside the shard. One sort-shuffle on
    the shard key; the companion writer `sinks.write_training_shards`
    materializes one sorted file per shard from the same plan.
    Output: input columns + (shard, pos).
    """
    key = shuffle_key(id_col, seed)
    out = df.withColumn("__key", key) \
            .withColumn("shard", F.pmod(F.col("__key"), F.lit(n_shards)))
    w = Window.partitionBy("shard").orderBy(
        F.col("__key").asc(), to_col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w)).drop("__key")


def group_bucket(group_col, buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket for a STRING group key: polynomial ascii
    hash (acc*31 + ascii(c), mod 1000003) scrambled through the same
    Fibonacci multiply as `_bucket`. A one-expression integer pipeline
    any engine reproduces (DuckDB: list_reduce over string_split), so
    group-keyed splits stay oracle-checkable and append-stable.
    """
    chars = F.filter(F.split(to_col(group_col).cast("string"), ""),
                     lambda c: c != "")
    h = F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(1_000_003))
    return F.pmod(F.pmod(h, F.lit(buckets)) * F.lit(2654435761),
                  F.lit(buckets))


def group_split_col(group_col, ratios: Sequence[float],
                    labels: Sequence[str]) -> Column:
    """Split label keyed on the GROUP hash, not the row id: every row of
    a group lands in the same split. This is the leakage-safe
    train/val/test split of dedup-aware pipelines — near-duplicate
    clusters, hosts, or users must not straddle the boundary, or eval
    leaks training text. Pure scan-side expression; no shuffle.
    """
    if abs(sum(ratios) - 1.0) > 1e-9:
        raise ValueError("ratios must sum to 1")
    if len(ratios) != len(labels):
        raise ValueError("one label per ratio")
    b = group_bucket(group_col)
    expr, cum = F.lit(None).cast("string"), 0.0
    cuts = []
    for r in ratios[:-1]:
        cum += r
        cuts.append(int(cum * _BUCKETS))
    out = F.when(b < F.lit(cuts[0]), F.lit(labels[0])) if cuts else None
    for i, c in enumerate(cuts[1:], start=1):
        out = out.when(b < F.lit(c), F.lit(labels[i]))
    return (out.otherwise(F.lit(labels[-1]))
            if out is not None else F.lit(labels[-1]))


def split_by_group(df: DataFrame, group_col: str, ratios: Sequence[float],
                   labels: Sequence[str] | None = None,
                   out_col: str = "split") -> DataFrame:
    """Attach a leakage-safe split label (see `group_split_col`)."""
    labels = list(labels) if labels is not None else [
        f"split_{i}" for i in range(len(ratios))]
    return df.withColumn(out_col, group_split_col(group_col, ratios, labels))


def sample_exact_n_per_group(df: DataFrame, id_col: str, group_col: str,
                             n: int) -> DataFrame:
    """EXACTLY ``n`` rows per group (fewer if the group is smaller),
    deterministically: the rows whose scrambled id ranks lowest within
    the group, ties by id — the per-domain quota sampling of mixture
    building ("200k docs per source"), uniform-per-group yet append-
    stable and engine-reproducible.

    One window hash-partitioned on the group: groups sort in parallel,
    a hot group costs only its own sort (AQE splits oversized
    partitions). Contrast with sample_exact_n's GLOBAL budget, which
    needs the two-pass rank plan; per-group the partitioned window IS
    the scale-safe shape.
    """
    w = Window.partitionBy(to_col(group_col)) \
        .orderBy(_bucket(id_col), to_col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n).drop("__rn"))


def kfold_col(id_col, k: int) -> Column:
    """Deterministic fold id in [0, k): scrambled-id bucket mod k —
    uniform, append-stable, engine-reproducible (the cross-validation
    analogue of `split_col`). Pure scan-side expression."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return F.pmod(_bucket(id_col), F.lit(k))


def kfold_split(df: DataFrame, id_col: str, k: int,
                out_col: str = "fold") -> DataFrame:
    """Attach the k-fold assignment column (see `kfold_col`)."""
    return df.withColumn(out_col, kfold_col(id_col, k))


def weighted_sample_n(df: DataFrame, id_col: str, weight_col,
                      n: int) -> DataFrame:
    """EXACTLY ``n`` rows drawn without replacement with probability
    proportional to ``weight_col`` — quality-weighted corpus draws
    ("sample 1M docs, favor high quality"), deterministic and
    append-stable.

    Efraimidis-Spirakis exponential-sort keys: u = deterministic
    per-row uniform from the scrambled id ((bucket + 0.5) / 10000 —
    never 0 or 1), key = -ln(u) / w, keep the n SMALLEST keys. The key
    is rounded to 9 dp BEFORE ranking (ties then break by id) so the
    cut is engine-replayable; at 10k distinct u values the weighting is
    exact in distribution over the id scramble. Rows with weight <= 0
    or NULL are excluded (zero probability).

    Scale plan: the key is a scan-side expression; the global top-n
    runs on the two-pass range-bucket rank plan (plans/ranks.
    global_min_rank) — no single-partition sort, same shape as
    sample_exact_n.
    """
    from ..plans import global_min_rank

    w = to_col(weight_col).cast("double")
    u = (_bucket(id_col).cast("double") + F.lit(0.5)) / F.lit(float(_BUCKETS))
    key = F.round(-F.log(u) / w, 9)
    cand = df.where(w.isNotNull() & (w > 0)).withColumn("__wk", key)
    ranked = global_min_rank(cand, "__wk", out_name="__wr")
    win = Window.partitionBy("__wk").orderBy(to_col(id_col))
    ranked = ranked.withColumn(
        "__rnk", F.col("__wr") + F.row_number().over(win) - 1)
    return ranked.where(F.col("__rnk") <= n).drop("__wk", "__wr", "__rnk")
