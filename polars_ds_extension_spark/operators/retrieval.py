"""Corpus-level retrieval / lexical-statistics operators.

TF-IDF keyword extraction, BM25 scoring, and n-gram language-model
cross-entropy — the lexical workhorses of training-data curation
(keyword tagging, relevance filtering, KenLM-style quality scoring).

All three share the same 100 TB shape:

* term statistics (document frequency, n-gram counts) come from ONE
  groupBy over exploded tokens — a hash shuffle on the term key whose
  output is vocabulary-sized, orders of magnitude smaller than the
  corpus;
* per-document scoring joins the stats back BY TERM (hash join that
  AQE broadcast-converts when the vocabulary is small) and aggregates
  per document — no driver round-trip carries more than one scalar.

Everything is built-in JVM expressions; no Python UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _t

__all__ = [
    "word_tokens", "doc_frequency", "tfidf_topk", "bm25_score",
    "bigram_lm_score", "word_ngram_terms", "ngrams_from_tokens", "top_terms", "pmi_bigrams",
]


def word_tokens(text, lowercase: bool = True) -> Column:
    """Whitespace word tokens (optionally lowercased) — the shared
    tokenizer for the lexical operators, chosen because every engine
    (Spark, DuckDB, the reference's str.split) reproduces it exactly."""
    t = F.trim(_t(text))
    if lowercase:
        t = F.lower(t)
    return F.split(t, r"\s+")


def doc_frequency(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, df) — number of documents containing each distinct term.

    One explode of the DISTINCT terms per document (bounded by document
    length) + one groupBy on term: the single vocabulary-sized shuffle
    every lexical statistic here derives from.
    """
    return (
        docs.select(F.explode(F.array_distinct(word_tokens(text_col)))
                    .alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )


def tfidf_topk(docs: DataFrame, id_col: str, text_col: str,
               k: int = 3, rank_scale: int | None = None) -> DataFrame:
    """Top-k TF-IDF keywords per document.

    tf = term count / doc token count; idf = ln((N+1)/(df+1)) + 1 (the
    smoothed sklearn formulation). Ties break lexicographically so the
    result is engine-reproducible. ``rank_scale`` rounds the score to
    that many decimals BEFORE ranking — different engines' ln() can
    disagree in the last ulp, and rounding pins near-ties to the same
    side everywhere (the catalog oracle uses 9).

    Plan: term counts per (doc, term) via one explode+groupBy, document
    frequency joined BY TERM (second hash shuffle, vocabulary-sized
    build side), then a per-document top-k window (shuffle on doc id —
    groups are document-sized, never skewed).

    Output: (id_col, term, tfidf) — k rows per document.
    """
    from pyspark.sql.window import Window

    n_docs = docs.count()  # one scalar; pinned as a literal in idf
    toks = docs.select(F.col(id_col).alias("__id"),
                       word_tokens(text_col).alias("__w"))
    tf = (
        toks.select("__id", F.size("__w").alias("__len"),
                    F.explode("__w").alias("term"))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("__tc"), F.first("__len").alias("__len"))
    )
    dfreq = doc_frequency(docs, id_col, text_col)
    idf = F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) + F.lit(1.0)
    scored = tf.join(dfreq, "term").select(
        "__id", "term",
        ((F.col("__tc") / F.col("__len")) * idf).alias("tfidf"),
    )
    rank_key = (F.round(F.col("tfidf"), rank_scale)
                if rank_scale is not None else F.col("tfidf"))
    w = Window.partitionBy("__id").orderBy(rank_key.desc(),
                                           F.col("term").asc())
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .select(F.col("__id").alias(id_col), "term", "tfidf")
    )


def bm25_score(docs: DataFrame, id_col: str, text_col: str,
               query_terms: list[str], k1: float = 1.2,
               b: float = 0.75) -> DataFrame:
    """Okapi BM25 score of every document against a bag of query terms.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); the document-length
    normalizer uses the corpus mean token count. Documents matching no
    query term score 0 and are omitted (filter scan-side BEFORE the
    shuffle — at 100 TB the explode only emits tokens in the query set).

    Output: (id_col, bm25) for documents with ≥1 matching term.
    """
    qlit = F.array(*[F.lit(t) for t in query_terms])
    toks = docs.select(F.col(id_col).alias("__id"),
                       word_tokens(text_col).alias("__w"))
    # N and avgdl ride as a broadcast 1-row scalar (r15 — the house
    # with_global_totals shape) instead of a driver .first(): the
    # .first() ran the full tokenize scan as a separate blocking job
    # just to embed two literals. Same doubles either way.
    stats = F.broadcast(toks.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg(F.size("__w")).alias("__avgdl")))
    hits = (
        toks.select("__id", F.size("__w").alias("__len"),
                    F.explode(F.array_intersect(F.array_distinct("__w"), qlit))
                    .alias("term"),
                    F.col("__w"))
        .select("__id", "__len", "term",
                F.size(F.filter("__w", lambda x: x == F.col("term")))
                .alias("__tc"))
    )
    dfreq = (
        hits.groupBy("term").agg(F.count_distinct("__id").alias("df"))
    )
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_norm = (F.col("__tc") * (k1 + 1)) / (
        F.col("__tc") + k1 * (1 - b + b * F.col("__len") / F.col("__avgdl")))
    return (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(stats)
        .groupBy("__id").agg(F.sum(idf * tf_norm).alias("bm25"))
        .select(F.col("__id").alias(id_col), "bm25")
    )


def bigram_lm_score(docs: DataFrame, id_col: str, text_col: str,
                    add_k: float = 0.5,
                    vocab_size: int | None = 65536,
                    unk_token: str = "<unk>") -> DataFrame:
    """Per-document cross-entropy under an add-k-smoothed bigram LM
    trained on the corpus itself — the KenLM-style perplexity quality
    filter of training-data pipelines (low = fluent/common, high =
    garbled/rare).

    P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V), V = distinct LM
    vocabulary entries. Cross-entropy = -mean ln P over the document's
    bigrams.

    ``vocab_size`` caps the LM vocabulary at the top-K unigrams by
    (count DESC, token ASC); everything else maps to ``unk_token``
    before bigram counting — the standard KenLM/UNK treatment, and the
    piece that makes this 100 TB-safe: an UNCAPPED web-corpus
    vocabulary is ~O(corpus) distinct tokens, so the bigram count
    shuffle and the per-doc scoring joins would grow with corpus size
    instead of being bounded by K². With the cap, the vocab selection
    is one TakeOrdered over the unigram counts, the token→kept mapping
    is a BROADCAST join applied scan-side to the bigram stream, and
    both count tables are ≤ (K+1)² / ≤ K+1 rows. ``vocab_size=None``
    restores the uncapped model. Corpora whose vocabulary is already
    below the cap score identically with or without it (nothing maps
    to UNK).

    Plan: 2 bounded count shuffles (unigrams, mapped bigrams) train
    the model; scoring explodes each document's bigrams once, maps
    through the broadcast vocab, and joins the two count tables by key
    — pure hash joins on term keys, partial aggregation does the
    per-document mean. Documents with < 2 tokens are omitted (no
    bigrams).

    Output: (id_col, cross_entropy, n_bigrams).
    """
    toks = docs.select(F.col(id_col).alias("__id"),
                       word_tokens(text_col).alias("__w"))
    big = toks.select(
        "__id",
        F.explode(F.zip_with(
            F.slice("__w", 1, F.greatest(F.size("__w") - 1, F.lit(0))),
            F.slice("__w", 2, F.greatest(F.size("__w") - 1, F.lit(0))),
            lambda a, b2: F.struct(a.alias("w1"), b2.alias("w2")),
        )).alias("bg"),
    ).select("__id", "bg.w1", "bg.w2")
    uni_raw = (
        toks.select(F.explode("__w").alias("w1"))
        .groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    )
    if vocab_size is not None:
        # top-K unigrams via TakeOrdered (k per task, driver merge —
        # no global sort); deterministic (count DESC, token ASC) cut
        kept = F.broadcast(uni_raw
                           .orderBy(F.col("c1").desc(), F.col("w1").asc())
                           .limit(vocab_size)
                           .select("w1", F.lit(True).alias("__in")))
        # map the bigram stream scan-side through the broadcast vocab
        big = (big
               .join(kept.withColumnRenamed("w1", "w1k")
                     .withColumnRenamed("__in", "__in1"),
                     F.col("w1") == F.col("w1k"), "left")
               .join(kept.withColumnRenamed("w1", "w2k")
                     .withColumnRenamed("__in", "__in2"),
                     F.col("w2") == F.col("w2k"), "left")
               .select(
                   "__id",
                   F.when(F.col("__in1").isNotNull(), F.col("w1"))
                   .otherwise(F.lit(unk_token)).alias("w1"),
                   F.when(F.col("__in2").isNotNull(), F.col("w2"))
                   .otherwise(F.lit(unk_token)).alias("w2")))
        # mapped unigram counts: fold the raw (vocab-sized) count table
        # through the same mapping — an agg over counts, never a second
        # pass over the corpus
        uni_counts = (uni_raw
                      .join(kept, "w1", "left")
                      .select(F.when(F.col("__in").isNotNull(),
                                     F.col("w1"))
                              .otherwise(F.lit(unk_token)).alias("w1"),
                              "c1")
                      .groupBy("w1").agg(F.sum("c1").alias("c1")))
    else:
        uni_counts = uni_raw
    # V rides as a broadcast 1-row scalar instead of a driver .count() —
    # the count() action executed the whole unigram shuffle a SECOND
    # time (once for the literal, once inside the join)
    vocab = F.broadcast(uni_counts.agg(
        F.count(F.lit(1)).cast("double").alias("__v")))
    bi_counts = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # r15 (guide §2.3/§2.4): attach the model to the COUNT TABLES, not
    # the occurrence stream. log P is a per-bigram-TYPE value, so fold
    # uni_counts (≤ K+1 rows — broadcast by the same contract as the
    # `kept` vocab map above) and the V scalar into bi_counts first,
    # then join the corpus-sized bigram stream ONCE on (w1, w2). The
    # old shape joined the stream twice — the second join re-shuffled
    # every bigram occurrence by w1; this one reuses the (w1, w2)
    # exchange the bi_counts agg already paid (ReusedExchange in the
    # plan) and moves the stream just once before the per-doc agg.
    # Value-identical: log((c12+k)/(c1+k·V)) on the same doubles,
    # evaluated per type instead of per occurrence.
    log_p = F.log((F.col("c12") + F.lit(add_k))
                  / (F.col("c1") + F.lit(add_k) * F.col("__v")))
    # the broadcast hint is only SAFE under the vocab cap (uni_counts
    # ≤ K+1 rows by construction); with vocab_size=None it is the full
    # corpus unigram table — unbounded at scale — so let Catalyst pick
    # the join there (r15 advice)
    uni_probe = (F.broadcast(uni_counts) if vocab_size is not None
                 else uni_counts)
    probs = (bi_counts.join(uni_probe, "w1")
             .crossJoin(vocab)
             .select("w1", "w2", log_p.alias("__lp")))
    return (
        big.join(probs, ["w1", "w2"])
        .groupBy("__id")
        .agg((-F.avg("__lp")).alias("cross_entropy"),
             F.count(F.lit(1)).alias("n_bigrams"))
        .select(F.col("__id").alias(id_col), "cross_entropy", "n_bigrams")
    )


def ngrams_from_tokens(w: Column, n: int = 1) -> Column:
    """Space-joined n-grams from an ALREADY-MATERIALIZED token-array
    column. Callers that explode n-grams should project the token
    array into a named column first and pass the attribute here:
    expressions inside higher-order lambdas are NOT common-subexpr
    eliminated, so passing the raw `split(...)` tree re-tokenizes the
    whole document once per n-gram position (measured 10× on the
    top_terms bigram explode at sf0.1)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return w
    # Short docs (< n tokens) must map to an EMPTY index: sequence(1, 0)
    # would otherwise default its step to -1 and yield [1, 0], and
    # slice(w, 0, n) then throws INVALID_PARAMETER_VALUE.START — one bad
    # one-word document would abort the whole job.
    idx = F.when(F.size(w) >= n,
                 F.sequence(F.lit(1), F.size(w) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))


def word_ngram_terms(text, n: int = 1) -> Column:
    """Space-joined word n-grams of the shared tokenizer (n=1 = the
    tokens themselves). One JVM expression — composable anywhere a
    Column fits, but see ngrams_from_tokens for the explode hot path
    (this form re-evaluates the tokenizer per position inside the
    transform lambda)."""
    return ngrams_from_tokens(word_tokens(text), n)


def top_terms(docs: DataFrame, text_col: str, n: int = 1, k: int = 10,
              by: str | None = None) -> DataFrame:
    """Exact heavy hitters: the ``k`` most frequent word n-grams,
    globally or per ``by`` group — vocabulary truncation, stop-list
    mining, per-domain content profiling.

    Ties break by term ASC so the result is total-ordered and engine-
    reproducible.

    Scale plan: explode + ONE map-side-combinable count on (term[, by]).
    The global top-k then runs as orderBy().limit(k) — Spark plans
    TakeOrderedAndProject: each task keeps its own k, the driver merges
    k·tasks candidates, nothing global ever sorts. The per-group form is
    TWO-PHASE: a partial top-k per (group, term-hash salt) window cuts
    each group's vocabulary-sized count set down to k·n_salts rows
    BEFORE the final per-group window — a single window partitioned
    only by the group would sort the whole vocabulary inside at most
    |groups| partitions (tens of sources × millions of n-grams = a
    handful of giant sorts, the r8 10×-probe's 5.5× term). Each term
    appears exactly once per group in the count set, so the per-salt
    top-k provably contains the group's true top-k. Output:
    ([group,] term, cnt, rank).
    """
    from pyspark.sql.window import Window

    # tokenize ONCE per row into a materialized column, THEN expand —
    # n-grams built straight off the split() tree re-tokenize per
    # position inside the transform lambda (no CSE in HOF lambdas)
    terms = (docs.select(*([F.col(by)] if by else []),
                         word_tokens(text_col).alias("__w"))
             .select(*([F.col(by)] if by else []),
                     F.explode(ngrams_from_tokens(F.col("__w"), n))
                     .alias("term")))
    keys = ([F.col(by)] if by else []) + [F.col("term")]
    counts = terms.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    order = [F.col("cnt").desc(), F.col("term").asc()]
    if by is None:
        # TakeOrderedAndProject caps the sort at k per task; the rank
        # window then runs over a frame PROVEN <= k rows (counted-small
        # pattern — the single partition is bounded by construction).
        out = counts.orderBy(*order).limit(k)
        return out.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)))
    n_salts = docs.sparkSession.sparkContext.defaultParallelism
    wp = Window.partitionBy(F.col(by),
                            F.pmod(F.xxhash64("term"), F.lit(n_salts))
                            ).orderBy(*order)
    pruned = (counts.withColumn("__pr", F.row_number().over(wp))
              .where(F.col("__pr") <= k).drop("__pr"))
    w = Window.partitionBy(by).orderBy(*order)
    return (pruned.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def pmi_bigrams(docs: DataFrame, text_col: str, k: int = 20,
                min_count: int = 5) -> DataFrame:
    """Top-k word associations by pointwise mutual information over
    adjacent-bigram statistics — collocation mining ("new york",
    "machine learning") for tokenizer vocab seeding and phrase-aware
    dedup.

        pmi(w1, w2) = ln( c12 · T / (c1 · c2) )

    with T = total bigram occurrences; unigram counts here are counts
    of the word as a bigram POSITION (left for c1, right for c2), the
    convention that makes the probabilities normalize over the same
    event space. ``min_count`` floors c12 (rare pairs otherwise
    dominate PMI — the classic sparsity artifact).

    Plan: one explode + TWO vocabulary-sized count shuffles (bigram,
    word-position marginals derived from the bigram counts — the
    corpus is read ONCE); top-k via TakeOrderedAndProject on the
    (rounded) score with (w1, w2) tie order. Output: (w1, w2, c12,
    pmi, rank).
    """
    from pyspark.sql.window import Window

    toks = docs.select(word_tokens(text_col).alias("__w"))
    big = toks.select(
        F.explode(F.zip_with(
            F.slice("__w", 1, F.greatest(F.size("__w") - 1, F.lit(0))),
            F.slice("__w", 2, F.greatest(F.size("__w") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )).alias("bg")).select("bg.w1", "bg.w2")
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c12 = c12.localCheckpoint(eager=False)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    tot = c12.agg(F.sum("c12").alias("__t"))
    scored = (c12.where(F.col("c12") >= min_count)
              .join(c1, "w1").join(c2, "w2")
              .crossJoin(F.broadcast(tot))
              .select("w1", "w2", "c12",
                      F.round(F.log(F.col("c12") * F.col("__t")
                                    / (F.col("c1") * F.col("c2"))), 6)
                      .alias("pmi")))
    order = [F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()]
    out = scored.orderBy(*order).limit(k)
    return out.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)))
