"""Catalog queries for the LLM-training-data-pipeline operators
(dedup / similarity search / text analysis) over the `documents` and
`embeddings` tables.

Oracle notes:
  * hash functions (xxhash64) never appear in outputs — LSH/IVF only
    generate candidates, results are exact-verified (Jaccard / cosine),
    so DuckDB can compute the identical set;
  * the near-dup oracles use a sparse similarity join (unnest shingles →
    join on shingle → count) instead of all-pairs list_intersect — same
    result, ~150× faster;
  * duplicate pairs are injected in-query (docs ∪ perturbed copies) since
    the synthetic corpus has no natural dups — both engines build the
    same union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import knn as K
from .operators import retrieval as R
from .functions import sample as SMP
from .operators import text as T
from .queries import _r, query
from .sources import load_table


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies shifted by 100000 — exact-dup corpus."""
    docs = load_table(spark, sf_dir, "documents")
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    return docs.select("doc_id", "text").unionByName(dup)


def _docs_with_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ one-suffix-perturbed copies — near-dup corpus."""
    docs = load_table(spark, sf_dir, "documents")
    pert = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz dup marker")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(pert)


_SQL_DUP_UNION = """
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents
"""

_SQL_NEAR_DUP_UNION = """
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000 AS doc_id, text || ' zz dup marker' AS text
  FROM documents
"""


# ------------------------------------------------------------------- dedup

@query("dedup_stats", f"""
WITH u AS ({_SQL_DUP_UNION})
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT text) AS n_distinct,
       COUNT(*) - COUNT(DISTINCT text) AS n_dupes
FROM u
""")
def dedup_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate summary via 8-byte hash shuffle (operators/dedup.py
    duplicate_stats) on documents ∪ exact copies."""
    return D.duplicate_stats(_docs_with_dups(spark, sf_dir), ["text"])


@query("exact_dedup", f"""
WITH u AS ({_SQL_DUP_UNION})
SELECT MIN(doc_id) AS doc_id FROM u GROUP BY text
""")
def exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping min doc_id per distinct text."""
    return D.exact_dedup(_docs_with_dups(spark, sf_dir), ["text"], "doc_id").select("doc_id")


@query("near_dup_minhash", f"""
WITH u AS ({_SQL_NEAR_DUP_UNION}), shl AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM u
), sh AS (
  SELECT doc_id, unnest(s) AS g FROM shl
), ln AS (
  SELECT doc_id, len(s) AS n FROM shl
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(c::DOUBLE / (la.n + lb.n - c), 6) AS jaccard
FROM shared JOIN ln la ON la.doc_id = id_a JOIN ln lb ON lb.doc_id = id_b
WHERE c::DOUBLE / (la.n + lb.n - c) >= 0.6
""")
def near_dup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (char-12 shingles, 96 hashes, 32×3
    bands), exact-Jaccard verified at 0.6 — LSH recall on this corpus is
    exactly 1, checked against the all-pairs oracle."""
    u = _docs_with_near_dups(spark, sf_dir)
    nd = D.near_dup_pairs(u, "doc_id", "text", threshold=0.6)
    return nd.select("id_a", "id_b", _r(F.col("jaccard")).alias("jaccard"))


@query("incremental_dedup", """
WITH nw AS (
  SELECT doc_id + 200000 AS doc_id, text || ' zz dup marker' AS text
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, reverse(text) AS text
  FROM documents WHERE doc_id % 3 = 1
), shn AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM nw
), shi AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM documents
), nn AS (
  SELECT doc_id, len(s) AS n FROM shn
), ni AS (
  SELECT doc_id, len(s) AS n FROM shi
), ns AS (
  SELECT doc_id, unnest(s) AS g FROM shn
), ig AS (
  SELECT doc_id, unnest(s) AS g FROM shi
), shared AS (
  SELECT n.doc_id AS nid, i.doc_id AS iid, COUNT(*) AS c
  FROM ns n JOIN ig i ON n.g = i.g GROUP BY 1, 2
), j AS (
  SELECT nid, iid, c::DOUBLE / (a.n + b.n - c) AS jac
  FROM shared JOIN nn a ON a.doc_id = nid JOIN ni b ON b.doc_id = iid
  WHERE c::DOUBLE / (a.n + b.n - c) >= 0.6
), best AS (
  SELECT nid, iid, jac,
    ROW_NUMBER() OVER (PARTITION BY nid ORDER BY jac DESC, iid ASC) AS rn
  FROM j
)
SELECT nid AS new_id, iid AS index_id, ROUND(jac, 6) AS jaccard
FROM best WHERE rn = 1
""")
def incremental_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch against the existing corpus
    (dedup.near_dup_against_index): new = perturbed copies of every
    3rd doc (must flag, best-match = the source) ∪ reversed texts of
    every 3rd+1 doc (fresh content — must NOT flag); index = the
    documents table. The index side moves only band hashes; output is
    exact-Jaccard defined, so the oracle replays it with a sparse
    shingle join."""
    docs = load_table(spark, sf_dir, "documents")
    new = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 200000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz dup marker")).alias("text"))
        .unionByName(
            docs.where(F.col("doc_id") % 3 == 1)
            .select((F.col("doc_id") + 300000).alias("doc_id"),
                    F.reverse(F.col("text")).alias("text")))
    )
    out = D.near_dup_against_index(
        new, docs.select("doc_id", "text"), "doc_id", "text", threshold=0.6)
    return out.select("new_id", "index_id", _r(F.col("jaccard")).alias("jaccard"))


@query("prebuilt_index_dedup", """
WITH idx AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
), nw AS (
  SELECT doc_id + 400000 AS doc_id, text || ' zz dup marker' AS text
  FROM documents WHERE doc_id % 4 = 1
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, reverse(text) AS text
  FROM documents WHERE doc_id % 4 = 0
), shn AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM nw
), shi AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM idx
), nn AS (
  SELECT doc_id, len(s) AS n FROM shn
), ni AS (
  SELECT doc_id, len(s) AS n FROM shi
), ns AS (
  SELECT doc_id, unnest(s) AS g FROM shn
), ig AS (
  SELECT doc_id, unnest(s) AS g FROM shi
), shared AS (
  SELECT n.doc_id AS nid, i.doc_id AS iid, COUNT(*) AS c
  FROM ns n JOIN ig i ON n.g = i.g GROUP BY 1, 2
), j AS (
  SELECT nid, iid, c::DOUBLE / (a.n + b.n - c) AS jac
  FROM shared JOIN nn a ON a.doc_id = nid JOIN ni b ON b.doc_id = iid
  WHERE c::DOUBLE / (a.n + b.n - c) >= 0.6
), best AS (
  SELECT nid, iid, jac,
    ROW_NUMBER() OVER (PARTITION BY nid ORDER BY jac DESC, iid ASC) AS rn
  FROM j
)
SELECT nid AS new_id, iid AS index_id, ROUND(jac, 6) AS jaccard
FROM best WHERE rn = 1
""")
def prebuilt_index_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup through the PERSISTED-index path
    (dedup.build_near_dup_index → near_dup_against_prebuilt): index =
    odd docs, new batch = perturbed copies of odd docs (must flag, best
    match = source) ∪ reversed even docs (fresh — must not). The
    build/probe split shares `_probe_index` with the one-shot
    `near_dup_against_index`, and the parquet write→read round trip is
    pinned by a parity pytest; this oracle pins the split path's
    exact-Jaccard output end to end."""
    docs = load_table(spark, sf_dir, "documents")
    index = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    new = (
        docs.where(F.col("doc_id") % 4 == 1)
        .select((F.col("doc_id") + 400000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz dup marker")).alias("text"))
        .unionByName(
            docs.where(F.col("doc_id") % 4 == 0)
            .select((F.col("doc_id") + 500000).alias("doc_id"),
                    F.reverse(F.col("text")).alias("text")))
    )
    # r16 (guide §2.6): index + probe-batch banding scans are
    # independent — materialize both pinned bases concurrently
    bi, bn = D._overlap_minhash_bases(
        [(index, "doc_id", "text"), (new, "doc_id", "text")])
    buckets, shingles = D.build_near_dup_index(index, "doc_id", "text",
                                               _base=bi)
    out = D.near_dup_against_prebuilt(
        new, buckets, shingles, "doc_id", "text", threshold=0.6, _base=bn)
    return out.select("new_id", "index_id", _r(F.col("jaccard")).alias("jaccard"))


@query("index_update", """
WITH idx AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 3
  UNION ALL
  SELECT doc_id + 600000 AS doc_id, text
  FROM documents WHERE doc_id % 8 = 2
), nw AS (
  SELECT doc_id + 700000 AS doc_id, text || ' zz dup marker' AS text
  FROM documents WHERE doc_id % 8 = 3
  UNION ALL
  SELECT doc_id + 800000 AS doc_id, text || ' zz dup marker' AS text
  FROM documents WHERE doc_id % 8 = 2
  UNION ALL
  SELECT doc_id + 900000 AS doc_id, reverse(text) AS text
  FROM documents WHERE doc_id % 8 = 1
), shn AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM nw
), shi AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM idx
), nn AS (
  SELECT doc_id, len(s) AS n FROM shn
), ni AS (
  SELECT doc_id, len(s) AS n FROM shi
), ns AS (
  SELECT doc_id, unnest(s) AS g FROM shn
), ig AS (
  SELECT doc_id, unnest(s) AS g FROM shi
), shared AS (
  SELECT n.doc_id AS nid, i.doc_id AS iid, COUNT(*) AS c
  FROM ns n JOIN ig i ON n.g = i.g GROUP BY 1, 2
), j AS (
  SELECT nid, iid, c::DOUBLE / (a.n + b.n - c) AS jac
  FROM shared JOIN nn a ON a.doc_id = nid JOIN ni b ON b.doc_id = iid
  WHERE c::DOUBLE / (a.n + b.n - c) >= 0.6
), best AS (
  SELECT nid, iid, jac,
    ROW_NUMBER() OVER (PARTITION BY nid ORDER BY jac DESC, iid ASC) AS rn
  FROM j
)
SELECT nid AS new_id, iid AS index_id, ROUND(jac, 6) AS jaccard
FROM best WHERE rn = 1
""")
def index_update_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full daily-crawl index lifecycle (dedup.build_near_dup_index
    → update_near_dup_index → near_dup_against_prebuilt): build the
    index on the %4==3 docs, FOLD IN a second-day batch (%8==2 docs
    under shifted ids — the old corpus is never rescanned), then probe
    perturbed copies of docs from BOTH generations (must flag, best
    match = their own generation's source — matches against the folded
    batch prove the update is live) plus reversed %8==1 texts (fresh —
    must not flag). The oracle replays exact shingle Jaccard + best
    match over the UNION index, which is exactly what update ≡ rebuild
    (also pinned frame-for-frame by a parity pytest) promises."""
    docs = load_table(spark, sf_dir, "documents")
    day1 = docs.where(F.col("doc_id") % 4 == 3).select("doc_id", "text")
    day2 = (docs.where(F.col("doc_id") % 8 == 2)
            .select((F.col("doc_id") + 600000).alias("doc_id"), "text"))
    new = (
        docs.where(F.col("doc_id") % 8 == 3)
        .select((F.col("doc_id") + 700000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz dup marker")).alias("text"))
        .unionByName(
            docs.where(F.col("doc_id") % 8 == 2)
            .select((F.col("doc_id") + 800000).alias("doc_id"),
                    F.concat(F.col("text"),
                             F.lit(" zz dup marker")).alias("text")))
        .unionByName(
            docs.where(F.col("doc_id") % 8 == 1)
            .select((F.col("doc_id") + 900000).alias("doc_id"),
                    F.reverse(F.col("text")).alias("text")))
    )
    # r16 (guide §2.6): the three banding scans (day1 / day2 / probe
    # batch) are data-independent — materialize their pinned bases
    # concurrently instead of serializing three eager counts
    b1, b2, b3 = D._overlap_minhash_bases(
        [(day1, "doc_id", "text"), (day2, "doc_id", "text"),
         (new, "doc_id", "text")])
    buckets, shingles = D.build_near_dup_index(day1, "doc_id", "text",
                                               _base=b1)
    buckets, shingles = D.update_near_dup_index(
        day2, buckets, shingles, "doc_id", "text", _base=b2)
    out = D.near_dup_against_prebuilt(
        new, buckets, shingles, "doc_id", "text", threshold=0.6, _base=b3)
    return out.select("new_id", "index_id", _r(F.col("jaccard")).alias("jaccard"))


@query("blocked_jaccard", r"""
WITH t AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS sp
  FROM documents
), g AS (
  SELECT doc_id, source, list_distinct(list_transform(
    range(1, greatest(len(sp) - 2, 1) + 1),
    i -> array_to_string(list_slice(sp, i, i + 2), ' '))) AS s
  FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  ROUND(len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
""")
def blocked_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard for all doc pairs sharing a `source` block —
    the classic blocked entity-resolution join (shuffle on block key,
    pairs only inside blocks)."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.blocked_jaccard_pairs(docs, "doc_id", "text", "source", n_gram=3)
    return out.select("id_a", "id_b", _r(F.col("jaccard")).alias("jaccard"))


@query("near_dup_simhash", f"""
WITH u AS ({_SQL_DUP_UNION}),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM u a JOIN u b ON a.text = b.text AND a.doc_id < b.doc_id
)
SELECT COUNT(*)::BIGINT AS n_planted, COUNT(*)::BIGINT AS n_recovered,
       1.0::DOUBLE AS recall
FROM p
""")
def near_dup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-exact dup recall, as a HARD planted-recovery row
    (operators/dedup.simhash_near_dup_pairs; Manku et al. WWW'07,
    4x16-bit pigeonhole banding over 64-bit fingerprints).

    Fingerprint values are hash-defined and not SQL-expressible, but the
    RECALL CONTRACT is: identical text ⇒ identical fingerprint ⇒
    hamming 0, and any pair within hamming ≤ 3 shares an intact band —
    so every same-text pair in the corpus (documents ∪ exact copies)
    MUST surface with hamming = 0. The query counts the same-text pairs
    it recovers; the oracle computes the same pair set by text equality
    and pins recall = 1. A banding, fingerprint-determinism, or
    bucket-cap regression drops n_recovered below n_planted and fails
    the hash. Pair-level output stays covered in tests/test_operators.py."""
    u = _docs_with_dups(spark, sf_dir)
    sd = D.simhash_near_dup_pairs(u, "doc_id", "text", max_hamming=3)
    a = u.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    b = u.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    planted = (a.join(b, F.col("__ta") == F.col("__tb"))
               .where(F.col("id_a") < F.col("id_b"))
               .select("id_a", "id_b"))
    hits = (sd.where(F.col("hamming") == 0)
            .select("id_a", "id_b").withColumn("__hit", F.lit(1)))
    return (planted.join(hits, ["id_a", "id_b"], "left")
            .agg(F.count(F.lit(1)).alias("n_planted"),
                 F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                 .cast("bigint").alias("n_recovered"))
            .select("n_planted", "n_recovered",
                    _r(F.col("n_recovered") / F.col("n_planted"))
                    .alias("recall")))


# ------------------------------------------------------------ text analysis

@query("token_stats", r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS sp FROM documents
)
SELECT doc_id,
  len(sp) AS n_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpeish,
  len(text) AS n_chars,
  ROUND(len(list_distinct(sp))::DOUBLE / len(sp), 6) AS distinct_ratio
FROM t
""")
def token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.bpeish_token_count("text").alias("n_bpeish"),
        T.char_count("text").alias("n_chars"),
        _r(T.distinct_token_ratio("text")).alias("distinct_ratio"),
    )


_SW_SQL = "'" + "','".join(T._STOPWORDS) + "'"

@query("text_quality", rf"""
WITH t AS (
  SELECT doc_id, text, len(text) AS n,
         string_split_regex(trim(text), '\s+') AS sp
  FROM documents
), m AS (
  SELECT doc_id, n,
    len(list_filter(sp, x -> lower(x) IN ({_SW_SQL})))::DOUBLE / len(sp) AS swr,
    list_aggregate(list_transform(sp, x -> len(x)), 'sum')::DOUBLE / len(sp) AS mtl,
    (n - len(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE / n AS pr
  FROM t
)
SELECT doc_id,
  ROUND(swr, 6) AS stopword_ratio,
  ROUND(mtl, 6) AS mean_token_len,
  ROUND(pr, 6) AS punct_ratio,
  ROUND((
    (CASE WHEN n >= 100 AND n <= 20000 THEN 1.0 WHEN n >= 30 THEN 0.5 ELSE 0.0 END)
    + (CASE WHEN swr >= 0.1 AND swr <= 0.7 THEN 1.0 ELSE 0.0 END)
    + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.0 END)
    + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)
  ) / 4.0, 6) AS quality
FROM m
""")
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _r(T.stopword_ratio("text")).alias("stopword_ratio"),
        _r(T.mean_token_length("text")).alias("mean_token_len"),
        _r(T.punct_ratio("text")).alias("punct_ratio"),
        _r(T.quality_score("text")).alias("quality"),
    )


def _lang_sql() -> str:
    score_cols = []
    for lang, words in T.LANG_MARKERS.items():
        in_list = "'" + "','".join(words) + "'"
        score_cols.append(
            f"len(list_filter(tk, x -> x IN ({in_list}))) AS {lang}"
        )
    langs = list(T.LANG_MARKERS.keys())
    best = "greatest(" + ", ".join(langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN {lang} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return rf"""
WITH t AS (
  SELECT doc_id,
    list_transform(string_split_regex(trim(text), '\s+'), x -> lower(x)) AS tk
  FROM documents
), s AS (
  SELECT doc_id, {", ".join(score_cols)} FROM t
)
SELECT doc_id, {case} AS lid FROM s
"""


@query("language_id", _lang_sql())
def language_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID; deterministic argmax with fixed tie
    order, expressed identically in the SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.language_id("text").alias("lid"))


@query("fingerprints", r"""
WITH t AS (
  SELECT doc_id, text,
    list_transform(string_split_regex(trim(text), '\s+'), x -> lower(x)) AS tk
  FROM documents
), v AS (
  SELECT doc_id, text,
    list_transform(tk, tok -> list_reduce(
      list_prepend(0::BIGINT,
        list_transform(range(1, len(tok) + 1), i -> ascii(substr(tok, i, 1))::BIGINT)),
      (a, c) -> (a * 31 + c) % 1000003)) AS vals
  FROM t
)
SELECT doc_id,
  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_fp,
  list_min(list_transform(
    range(1, greatest(len(vals) - 3, 1) + 1),
    i -> list_reduce(list_prepend(0::BIGINT, list_slice(vals, i, i + 3)),
                     (a, v) -> (a * 37 + v) % 1000003))) AS rolling_fp
FROM v
""")
def fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content (md5-canonical) + winnowing rolling-hash fingerprints —
    pure integer/md5 arithmetic, reproduced exactly in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.content_fingerprint("text").alias("content_fp"),
        T.rolling_fingerprint("text").alias("rolling_fp"),
    )


# ------------------------------------------------------- similarity search

@query("knn_cosine", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)::INT AS rank
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 50
) WHERE rank <= 3
""")
def knn_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 (broadcast index, window top-k) for the
    first 50 query vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    nn = K.knn_join(emb.where(F.col("vec_id") < 50), "vec_id", "embedding",
                    emb, "vec_id", "embedding", k=3, metric="cosine")
    return nn.select("vec_id", "neighbor_id", _r(F.col("cosine")).alias("cosine"), "rank")


@query("knn_avg_label", """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id, ROUND(AVG(label), 6) AS knn_avg_label FROM (
  SELECT a.vec_id, b.label,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id) AS rank
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
) WHERE rank <= 5 GROUP BY vec_id
""")
def knn_avg_label_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean neighbor label over each vector's 5 cosine-NN
    (ref expr_knn.py:265 knn_avg)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = K.knn_avg(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
                    "label", k=5, metric="cosine")
    return out.select("vec_id", _r(F.col("knn_avg_label")).alias("knn_avg_label"))


@query("radius_nb_cnt", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id, COUNT(*) AS nb_cnt
FROM e a JOIN e b ON a.vec_id <> b.vec_id
WHERE list_distance(a.v, b.v) <= 1.3
GROUP BY a.vec_id
""")
def radius_nb_cnt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor count within l2 radius 1.3 (ref expr_knn.py:601 nb_cnt)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return K.radius_count(emb, "vec_id", "embedding", emb, "vec_id", "embedding",
                          radius=1.3, metric="l2")


@query("knn_freq", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
r AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                     b.vec_id) AS rank
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 50
)
SELECT 'knn' AS kind, neighbor_id, COUNT(*) AS freq_cnt
FROM r WHERE rank <= 3 GROUP BY neighbor_id
UNION ALL
SELECT 'radius' AS kind, b.vec_id AS neighbor_id, COUNT(*) AS freq_cnt
FROM e a JOIN e b ON a.vec_id <> b.vec_id
WHERE a.vec_id < 100 AND list_distance(a.v, b.v) <= 1.3
GROUP BY b.vec_id
""")
def knn_freq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor frequency counts (ref expr_knn.py:203 query_knn_freq_cnt,
    :566 query_radius_freq_cnt): how often each vector is chosen as a
    3-NN of the first 50 queries / appears within l2 radius 1.3 of the
    first 100. Both are map-side-combinable groupBys over the broadcast
    GEMM join output."""
    emb = load_table(spark, sf_dir, "embeddings")
    kf = K.knn_freq_cnt(emb.where(F.col("vec_id") < 50), "vec_id",
                        "embedding", emb, "vec_id", "embedding",
                        k=3, metric="cosine")
    rf = K.radius_freq_cnt(emb.where(F.col("vec_id") < 100), "vec_id",
                           "embedding", emb, "vec_id", "embedding",
                           radius=1.3, metric="l2")
    return (kf.select(F.lit("knn").alias("kind"), "neighbor_id", "freq_cnt")
            .unionByName(rf.select(F.lit("radius").alias("kind"),
                                   "neighbor_id", "freq_cnt")))


@query("ivf_ann", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM e))))),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)::INT AS rank
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
) WHERE rank <= 3
""")
def ivf_ann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate self-KNN: bucket by nearest seed centroid
    (broadcast scan), search only within buckets — the n²/C scale path.
    n_centroids scales as ~sqrt(N) (the docstring's own 100x
    prescription; fixed C let the within-cell quadratic term grow
    linearly with N — the 10x scale probe measured 25x before this),
    deterministic first-id seeds so the oracle reproduces it exactly."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n_cent = max(16, math.ceil(math.sqrt(emb.count())))
    out = K.ivf_knn_join(emb, "vec_id", "embedding",
                         n_centroids=n_cent, k=3)
    return out.select("vec_id", "neighbor_id", _r(F.col("cosine")).alias("cosine"), "rank")


@query("ann_ivf_search", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM e))))),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
),
q AS (SELECT vec_id, v FROM e WHERE vec_id < 100),
qasg AS (
  SELECT vec_id, v, cid FROM (
    SELECT q.vec_id, q.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY list_distance(q.v, c.cv), c.cid) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 2
)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)::INT AS rank
  FROM qasg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
) WHERE rank <= 3
""")
def ann_ivf_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-frame IVF search (operators/knn.ivf_search — the scale path
    knn_join(route='auto') delegates to): the first 100 vectors query a
    sqrt(N)-centroid inverted file over the whole table with nprobe=2.
    Index rows bucket scan-side to one cell, queries to their two
    nearest cells, ONE cogroup shuffle runs the per-cell GEMM top-k,
    and a per-query window merges the probes. Deterministic first-id
    seed centroids so the oracle replays the full machinery — cell
    assignment, multi-probe, tie-breaks — in SQL."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n_cent = max(16, math.ceil(math.sqrt(emb.count())))
    out = K.ivf_search(emb.where(F.col("vec_id") < 100), "vec_id",
                       "embedding", emb, "vec_id", "embedding",
                       k=3, n_centroids=n_cent, nprobe=2,
                       centroids="first")
    return out.select("vec_id", "neighbor_id",
                      _r(F.col("cosine")).alias("cosine"), "rank")


@query("knn_auto_route", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM e))))),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
),
q AS (SELECT vec_id, v FROM e WHERE vec_id % 5 = 0),
qasg AS (
  SELECT vec_id, v, cid FROM (
    SELECT q.vec_id, q.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY list_distance(q.v, c.cv), c.cid) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 2
)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)::INT AS rank
  FROM qasg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
) WHERE rank <= 2
""")
def knn_auto_route_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The brute→IVF HANDOFF itself (operators/knn.knn_join
    route='auto'): every fifth vector queries the whole embeddings
    table with a route_threshold the index always exceeds, so the call
    DELEGATES to ivf_search (sqrt(N) centroids, nprobe=2) instead of
    broadcasting — the exact path a 100 TB index takes past the 5M-row
    broadcast cap, now bench-visible in the scale probe.
    route_centroids='first' keeps the routed machinery SQL-replayable
    end to end (cell assignment, multi-probe, tie-breaks — the
    ann_ivf_search contract); production auto-routing defaults to
    balanced kmeans centroids instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = K.knn_join(emb.where(F.col("vec_id") % 5 == 0), "vec_id",
                     "embedding", emb, "vec_id", "embedding",
                     k=2, route="auto", route_threshold=15,
                     route_centroids="first")
    return out.select("vec_id", "neighbor_id",
                      _r(F.col("cosine")).alias("cosine"), "rank")


@query("vector_index_build", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM e))))),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
)
SELECT cid AS centroid_id, COUNT(*) AS n_vecs FROM asg GROUP BY cid
""")
def vector_index_build_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF-index BUILD census (operators/knn.
    build_vector_index): the one assignment pass that amortizes
    ivf_search's per-call Θ(N·√N) index-assignment term across query
    batches. Output = the inverted file's per-cell occupancy (the
    index health report that decides nprobe/retrain policy); the
    oracle replays the full 'first'-centroid assignment — distance
    expression, lowest-cid tie-break — and the groupBy. The cells
    frame itself (centroid_id, vec_id, vec) is what persists; the
    census hash-pins every vector's cell."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n_cent = max(16, math.ceil(math.sqrt(emb.count())))
    _, cells = K.build_vector_index(emb, "vec_id", "embedding",
                                    n_centroids=n_cent,
                                    centroids="first")
    return cells.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_vecs"))


@query("vector_index_search", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM e))))),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
),
q AS (SELECT vec_id, v FROM e WHERE vec_id % 7 = 0),
qasg AS (
  SELECT vec_id, v, cid FROM (
    SELECT q.vec_id, q.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY list_distance(q.v, c.cv), c.cid) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 2
)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)::INT AS rank
  FROM qasg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
) WHERE rank <= 4
""")
def vector_index_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe a PREBUILT vector index (operators/knn.
    search_vector_index — the read half of the embedding daily loop):
    every seventh vector queries the persisted cells frame with
    nprobe=2, k=4; the indexed corpus is never re-assigned. Result-
    identical to ivf_search with the same centroid frame (pinned by
    pytest); the oracle replays assignment, multi-probe, cosine
    re-rank, and both tie-breaks in SQL."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n_cent = max(16, math.ceil(math.sqrt(emb.count())))
    cents, cells = K.build_vector_index(emb, "vec_id", "embedding",
                                        n_centroids=n_cent,
                                        centroids="first")
    out = K.search_vector_index(
        emb.where(F.col("vec_id") % 7 == 0), "vec_id", "embedding",
        cents, cells, k=4, nprobe=2)
    return out.select("vec_id", "neighbor_id",
                      _r(F.col("cosine")).alias("cosine"), "rank")


@query("vector_index_update", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
d1 AS (SELECT vec_id, v FROM e WHERE vec_id % 3 != 0),
c AS (SELECT vec_id AS cid, v AS cv FROM d1
      WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM d1))))),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
),
q AS (SELECT vec_id, v FROM e WHERE vec_id < 50),
qasg AS (
  SELECT vec_id, v, cid FROM (
    SELECT q.vec_id, q.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY list_distance(q.v, c.cv), c.cid) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 2
)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)::INT AS rank
  FROM qasg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
) WHERE rank <= 3
""")
def vector_index_update_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector daily loop END TO END (operators/knn.
    update_vector_index): build the index on day 1 (vec_id % 3 != 0),
    fold in the day-2 batch (% 3 == 0) against the FROZEN quantizer —
    update ≡ rebuild frame-for-frame, only the batch pays assignment —
    then probe the first 50 vectors against the UPDATED index. The
    oracle replays day-1 'first' centroids, assignment of the FULL
    union, multi-probe, and the re-rank: day-2 vectors surfacing as
    neighbors proves the fold actually landed in the cells."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    day1 = emb.where(F.col("vec_id") % 3 != 0)
    day2 = emb.where(F.col("vec_id") % 3 == 0)
    n_cent = max(16, math.ceil(math.sqrt(day1.count())))
    cents, cells = K.build_vector_index(day1, "vec_id", "embedding",
                                        n_centroids=n_cent,
                                        centroids="first")
    cents, cells = K.update_vector_index(day2, "vec_id", "embedding",
                                         cents, cells)
    out = K.search_vector_index(
        emb.where(F.col("vec_id") < 50), "vec_id", "embedding",
        cents, cells, k=3, nprobe=2)
    return out.select("vec_id", "neighbor_id",
                      _r(F.col("cosine")).alias("cosine"), "rank")


@query("vector_index_stats", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM e))))),
asg AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT e.vec_id, c.cid,
      list_sum(list_transform(list_zip(e.v, c.cv),
               x -> (x[1] - x[2]) ^ 2)) AS d2,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
)
SELECT cid AS centroid_id, COUNT(*) AS n_vecs,
       ROUND(SUM(d2), 4) AS sse, ROUND(MAX(d2), 6) AS max_d2
FROM asg GROUP BY cid
""")
def vector_index_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-health report (operators/knn.vector_index_stats — the
    when-to-retrain statistic completing the persisted-IVF lifecycle:
    build / search / update / STATS): per occupied cell, occupancy +
    within-cell squared-distance mass + worst assignment, one
    broadcast join + combinable agg over the inverted file. The oracle
    replays assignment AND the per-row d² into both aggregates (sse at
    4 dp — a float64 sum over hundreds of rows differs across engines
    in the last ulp, the kmeans_inertia precedent; max at 6 dp)."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n_cent = max(16, math.ceil(math.sqrt(emb.count())))
    cents, cells = K.build_vector_index(emb, "vec_id", "embedding",
                                        n_centroids=n_cent,
                                        centroids="first")
    out = K.vector_index_stats(cents, cells)
    return out.select("centroid_id", "n_vecs",
                      F.round("sse", 4).alias("sse"),
                      _r(F.col("max_d2")).alias("max_d2"))


@query("lsh_recall", """
SELECT (2 * LEAST(500, COUNT(*)))::BIGINT AS n_queries,
       (2 * LEAST(500, COUNT(*)))::BIGINT AS n_perfect,
       1.0::DOUBLE AS recall
FROM embeddings
""")
def lsh_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH planted-recovery hard row (operators/knn.ann_lsh_join —
    the multi-table random-hyperplane scale path): the corpus is
    embeddings ∪ a BOUNDED sample of IDENTICAL copies (the 500 lowest
    vec_ids, +100000 id offset), and an identical vector shares every
    table's signature by construction, so each of the 2·min(500, N)
    planted rows MUST surface its partner at rank 1 with cosine ~1
    (the max natural pairwise cosine in this table is ~0.6 — measured
    headroom, not hope). The recall assertion filters to the planted
    rows; the rest of the corpus rides along as realistic LSH load
    without doubling the table (the r8 full-duplication form made this
    the most expensive catalog row at 7.2 s for no extra contract).
    Signature hashes never reach the output; a banding, signature-
    determinism, or bucket-cap regression drops n_perfect below
    n_queries and fails the hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.where(F.col("vec_id") < 500)
    u = emb.select("vec_id", "embedding").unionByName(
        planted.select((F.col("vec_id") + 100000).alias("vec_id"),
                       "embedding"))
    out = K.ann_lsh_join(u, "vec_id", "embedding", k=1,
                         n_tables=4, n_planes=12)
    top1 = out.where((F.col("rank") == 1)
                     & ((F.col("vec_id") < 500)
                        | (F.col("vec_id") >= 100000)))
    return top1.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum((F.col("cosine") > 0.999999).cast("int")).cast("bigint")
        .alias("n_perfect"),
        _r(F.sum((F.col("cosine") > 0.999999).cast("int"))
           / F.count(F.lit(1))).alias("recall"))


@query("ivf_recall", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM e))))),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
),
approx AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT a.vec_id, b.vec_id AS neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY a.vec_id
                         ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id) AS rank
    FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
  ) WHERE rank <= 3
),
ex AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT a.vec_id, b.vec_id AS neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY a.vec_id
                         ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id) AS rk
    FROM e a JOIN e b ON a.vec_id <> b.vec_id
  ) WHERE rk <= 3
),
per AS (
  SELECT ex.vec_id,
    SUM(CASE WHEN ap.neighbor_id IS NULL THEN 0 ELSE 1 END)::DOUBLE
      / COUNT(*) AS r
  FROM ex LEFT JOIN approx ap
    ON ex.vec_id = ap.vec_id AND ex.neighbor_id = ap.neighbor_id
  GROUP BY ex.vec_id
)
SELECT COUNT(*)::BIGINT AS n_queries, ROUND(AVG(r), 6) AS mean_recall,
       ROUND(MIN(r), 6) AS min_recall
FROM per
""")
def ivf_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality diagnostic (operators/knn.ann_recall): recall@3 of
    the IVF tier against the exact brute-force neighbors, averaged over
    every vector as a query. The oracle recomputes BOTH result sets
    (the ivf_ann replay + a brute ROW_NUMBER ranking) and the recall
    join in SQL — so the measurement machinery itself is hash-checked,
    not just the searches it measures. The measured recall is LOW by
    design: 'first'-id seed centroids are the SQL-replayable mode, and
    on unclustered synthetic embeddings they make poor cells — exactly
    the failure this diagnostic exists to expose before a production
    run picks the kmeans-trained centroids instead
    (tests/test_operators.py pins kmeans-mode recall beating this)."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n_cent = max(16, math.ceil(math.sqrt(emb.count())))
    approx = K.ivf_knn_join(emb, "vec_id", "embedding",
                            n_centroids=n_cent, k=3)
    exact = K.knn_join(emb, "vec_id", "embedding",
                       emb, "vec_id", "embedding", k=3, metric="cosine")
    out = K.ann_recall(approx, exact, "vec_id", "neighbor_id")
    return out.select("n_queries", _r(F.col("mean_recall")).alias("mean_recall"),
                      _r(F.col("min_recall")).alias("min_recall"))


@query("multimodal_blobs", """
WITH b AS (
  SELECT doc_id,
    unhex(CASE doc_id % 3 WHEN 0 THEN '89504E47' WHEN 1 THEN 'FFD8FFE0'
          ELSE '494433' END) || encode(text) AS c
  FROM documents
), h AS (
  SELECT doc_id, c, hex(c) AS hx, octet_length(c)::BIGINT AS n_bytes FROM b
), e AS (
  SELECT doc_id, n_bytes,
    CASE WHEN starts_with(hx, '89504E47') THEN 'image/png'
         WHEN starts_with(hx, 'FFD8FF') THEN 'image/jpeg'
         WHEN starts_with(hx, '494433') THEN 'audio/mpeg'
         ELSE 'application/octet-stream' END AS mime,
    list_transform(range(1, n_bytes + 1),
                   i -> substr(hx, (i - 1) * 2 + 1, 2)) AS bl
  FROM h
)
SELECT doc_id, n_bytes, mime,
  ROUND(-list_sum(list_transform(list_distinct(bl),
    bb -> (len(list_filter(bl, x -> x = bb))::DOUBLE / len(bl))
          * log2(len(list_filter(bl, x -> x = bb))::DOUBLE / len(bl)))), 6)
    AS byte_entropy
FROM e
""")
def multimodal_blobs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media-column plumbing over synthesized blobs (magic header
    by doc_id%3 + utf-8 text): size + container sniffing (pure JVM) and
    byte entropy (Arrow-batched numpy over mapInPandas) — the codec-free
    slice of operators/multimodal.py, mirrored exactly in SQL."""
    from .operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(bytes.fromhex("89504E47")))
        .when(F.col("doc_id") % 3 == 1, F.lit(bytes.fromhex("FFD8FFE0")))
        .otherwise(F.lit(bytes.fromhex("494433")))
    )
    blobs = docs.select(
        "doc_id", F.concat(magic, F.encode("text", "utf-8")).alias("content"))
    withent = MM.byte_entropy(blobs, "content")
    return withent.select(
        "doc_id",
        F.length("content").cast("long").alias("n_bytes"),
        MM.sniff_mime("content").alias("mime"),
        _r(F.col("byte_entropy")).alias("byte_entropy"),
    )


_TARGET64 = [1.0] + [0.0] * 63
_TARGET64_SQL = "[" + ", ".join(str(v) for v in _TARGET64) + "]"


@query("within_radius_target", f"""
SELECT COUNT(*)::BIGINT AS n_within
FROM embeddings
WHERE list_distance(embedding::DOUBLE[], {_TARGET64_SQL}) <= 1.40
""")
def within_radius_target_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows within l2 radius 1.40 of a fixed query vector (ref
    expr_knn.py within_dist_from) — a pure scan-side filter, no join;
    at scale this is a predicate the optimizer pushes into the scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    hits = K.within_dist_from(emb, "vec_id", "embedding", _TARGET64,
                              radius=1.40, metric="l2")
    return hits.agg(F.count(F.lit(1)).alias("n_within"))


@query("knn_from_target", f"""
SELECT vec_id, ROUND(dist, 6) AS dist FROM (
  SELECT vec_id, list_distance(embedding::DOUBLE[], {_TARGET64_SQL}) AS dist
  FROM embeddings
) ORDER BY dist ASC, vec_id ASC LIMIT 10
""")
def knn_from_target_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 rows nearest a fixed query vector (ref expr_knn.py
    is_knn_from): scan + TakeOrdered top-k — per-partition heaps then a
    driver merge of 10-row samples, never a full sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = K.is_knn_from(emb, "vec_id", "embedding", _TARGET64, k=10)
    return out.select("vec_id", _r(F.col("__d")).alias("dist"))


# ------------------------------------------- round-3 pipeline operators

@query("near_dup_cluster_dedup", f"""
WITH RECURSIVE u AS ({_SQL_NEAR_DUP_UNION}), shl AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM u
), sh AS (
  SELECT doc_id, unnest(s) AS g FROM shl
), ln AS (
  SELECT doc_id, len(s) AS n FROM shl
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM shared JOIN ln la ON la.doc_id = id_a JOIN ln lb ON lb.doc_id = id_b
  WHERE c::DOUBLE / (la.n + lb.n - c) >= 0.6
), e AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s
), comp AS (
  SELECT s AS id, LEAST(s, MIN(d)) AS comp FROM reach GROUP BY s
)
SELECT u.doc_id FROM u LEFT JOIN comp ON u.doc_id = comp.id
WHERE comp.id IS NULL OR comp.comp = u.doc_id
""")
def near_dup_cluster_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup corpus dedup via the PRODUCTION ordering
    (operators/dedup.near_dup_canonical_dedup): exact dedup first,
    minhash pair mining over distinct texts only, CC over rep-pairs ∪
    member→rep edges, keep the smallest-id member per component.
    Provably component-identical to mining all raw pairs (identical
    texts share shingle sets), so the oracle — a recursive-CTE
    transitive closure over the RAW exact-Jaccard pair set — is
    unchanged; what changes is the quadratic term a duplicated text
    contributes: m·(m−1)/2 candidate pairs collapse to m−1 hash edges
    (r10 dense stress: 25.6 → ~10.5 s)."""
    u = _docs_with_near_dups(spark, sf_dir)
    return D.near_dup_canonical_dedup(
        u, "doc_id", "text", threshold=0.6).select("doc_id")


@query("dup_cluster_downsample", """
WITH RECURSIVE base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0 AND doc_id < 2000
), u AS (
  SELECT doc_id, text FROM base
  UNION ALL SELECT doc_id + 100000 AS doc_id, text || ' zz dup marker' AS text
  FROM base
  UNION ALL SELECT doc_id + 200000 AS doc_id, text || ' qq dup marker two' AS text
  FROM base
), shl AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM u
), sh AS (
  SELECT doc_id, unnest(s) AS g FROM shl
), ln AS (
  SELECT doc_id, len(s) AS n FROM shl
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM shared JOIN ln la ON la.doc_id = id_a JOIN ln lb ON lb.doc_id = id_b
  WHERE c::DOUBLE / (la.n + lb.n - c) >= 0.6
), e AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s
), comp AS (
  SELECT s AS id, LEAST(s, MIN(d)) AS comp FROM reach GROUP BY s
), rk AS (
  SELECT id, ROW_NUMBER() OVER (PARTITION BY comp ORDER BY id) AS r
  FROM comp
)
SELECT u.doc_id FROM u LEFT JOIN rk ON u.doc_id = rk.id
WHERE rk.id IS NULL OR rk.r <= 2
""")
def dup_cluster_downsample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup (operators/dedup.cluster_downsample): near-dup pairs →
    connected components → keep the TWO smallest-id members per cluster
    (the keep-a-few-representatives middle ground between keep-all and
    canonical keep-one). The corpus plants 3-member clusters (base doc
    + two distinct-marker perturbations), so k=2 is distinguishable
    from both keep-one and keep-all; the oracle replays the exact-
    Jaccard pair set, a recursive-CTE transitive closure, and the
    per-cluster rank cut. BOUNDED base (even ids < 2000, ≤1000 docs at
    any SF — the lsh_recall precedent): the planted-cluster contract is
    id-independent, and full-corpus minhash pair mining already has its
    own probed rows (near_dup_minhash / near_dup_cluster_dedup) — this
    query grades the keep-k cut, not pair mining, and was the heaviest
    catalog row (7.9 s) when it tripled the half corpus.

    r11: routes through near_dup_downsample — the production-ordered
    composite (shared adaptive edge set with near_dup_canonical_dedup:
    banded pairs + exact-hash edges, no per-pair jaccard materialized)
    — cluster-identical to near_dup_pairs → cluster_downsample, which
    the unchanged all-pairs oracle still replays."""
    docs = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 2000))
    u = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" zz dup marker"))
                    .alias("text"))
    ).unionByName(
        docs.select((F.col("doc_id") + 200000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" qq dup marker two"))
                    .alias("text")))
    out = D.near_dup_downsample(u, "doc_id", "text", threshold=0.6,
                                keep_per_cluster=2)
    return out.select("doc_id")


@query("dup_cluster_sizes", """
WITH RECURSIVE base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 2000
), u AS (
  SELECT doc_id, text FROM base
  UNION ALL SELECT doc_id + 100000 AS doc_id, text || ' zz dup marker' AS text
  FROM base WHERE doc_id % 2 = 0
  UNION ALL SELECT doc_id + 200000 AS doc_id, text || ' qq dup marker two' AS text
  FROM base WHERE doc_id % 4 = 0
), shl AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM u
), sh AS (
  SELECT doc_id, unnest(s) AS g FROM shl
), ln AS (
  SELECT doc_id, len(s) AS n FROM shl
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM shared JOIN ln la ON la.doc_id = id_a JOIN ln lb ON lb.doc_id = id_b
  WHERE c::DOUBLE / (la.n + lb.n - c) >= 0.6
), e AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s
), comp AS (
  SELECT s AS id, LEAST(s, MIN(d)) AS comp FROM reach GROUP BY s
), sz AS (
  SELECT comp, COUNT(*) AS cluster_size FROM comp GROUP BY comp
)
SELECT cluster_size, COUNT(*) AS n_clusters
FROM sz GROUP BY cluster_size ORDER BY cluster_size
""")
def dup_cluster_sizes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram (operators/dedup.
    dup_cluster_sizes) — the pre-dedup curation report: CC over the
    near-dup pair graph, per-component counts, then a size histogram,
    with the corpus never touched past pair mining. The bounded base
    plants a MIXED size distribution (ids ≡ 0 mod 4 → 3-member
    clusters, other even ids → 2-member), so the histogram has two
    distinguishable rows and the oracle replays pair mining, the
    recursive-CTE closure, and both groupBys.

    r11: routes through near_dup_cluster_sizes — the report sibling of
    the shared adaptive edge set (component-identical to
    near_dup_pairs → dup_cluster_sizes, which the unchanged all-pairs
    oracle still replays; the pairs-contract's per-pair jaccard verify
    is skipped — the histogram needs connectivity only)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 2000)
    u = docs.select("doc_id", "text").unionByName(
        docs.where(F.col("doc_id") % 2 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz dup marker"))
                .alias("text"))
    ).unionByName(
        docs.where(F.col("doc_id") % 4 == 0)
        .select((F.col("doc_id") + 200000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq dup marker two"))
                .alias("text")))
    return D.near_dup_cluster_sizes(u, "doc_id", "text", threshold=0.6)


@query("decontaminate", r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0
), bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
), bg AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1) + 1),
    i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i, i + 2), ' ')
  ))) AS g FROM bench
), dg AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1) + 1),
    i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i, i + 2), ' ')
  ))) AS g FROM corpus
), hits AS (
  SELECT dg.doc_id, COUNT(*) AS n FROM dg JOIN bg USING (g) GROUP BY 1
)
SELECT c.doc_id,
       COALESCE(hits.n, 0) AS n_contaminated_grams,
       COALESCE(hits.n, 0) >= 1 AS contaminated
FROM corpus c LEFT JOIN hits ON c.doc_id = hits.doc_id
""")
def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word-3-gram
    with the held-out 'benchmark' tenth of documents get flagged —
    broadcast the benchmark gram set, semi-join scan-side."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    out = T.decontaminate(corpus, "doc_id", "text", bench, "text",
                          n_gram=3, min_overlap=1)
    return out.select("doc_id", "n_contaminated_grams", "contaminated")


@query("token_budget_sample", r"""
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS tokens,
         (doc_id % 2147483647 * 2654435761) % 2147483647 AS ord
  FROM documents
), c AS (
  SELECT doc_id, tokens, SUM(tokens) OVER (ORDER BY ord) AS cum
  FROM t
)
SELECT doc_id, tokens::BIGINT AS tokens, cum::BIGINT AS cum_tokens
FROM c WHERE cum <= 20000
""")
def token_budget_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20k-token corpus subset: engine-reproducible id
    scramble orders the docs, the two-pass range-bucket cumsum
    (plans/ranks) accumulates tokens, prefix under budget survives."""
    docs = load_table(spark, sf_dir, "documents")
    out = T.sample_to_token_budget(docs, "doc_id", "text", budget=20000)
    return out.select("doc_id", "tokens", "cum_tokens")


@query("repetition_signals", r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)),
                     l -> len(trim(l)) > 0) AS lines,
         string_split_regex(trim(text), '\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, lines,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)),
                          i -> array_to_string(toks[i:i+1], ' '))
         ELSE [] END AS g2,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(range(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+2], ' '))
         ELSE [] END AS g3
  FROM t
)
SELECT doc_id,
  ROUND(CASE WHEN len(lines) > 0
    THEN (len(lines) - len(list_distinct(lines)))::DOUBLE / len(lines)
    ELSE 0.0 END, 6) AS dup_line_frac,
  ROUND(CASE WHEN len(g2) > 0
    THEN (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2)
    ELSE 0.0 END, 6) AS dup_2gram_frac,
  ROUND(CASE WHEN len(g3) > 0
    THEN (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3)
    ELSE 0.0 END, 6) AS dup_3gram_frac
FROM g
""")
def repetition_signals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: fraction of
    repeated non-empty lines and of duplicated word 2-/3-grams. All pure
    JVM array expressions — scan-side, zero shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _r(T.dup_line_fraction("text")).alias("dup_line_frac"),
        _r(T.dup_ngram_fraction("text", 2)).alias("dup_2gram_frac"),
        _r(T.dup_ngram_fraction("text", 3)).alias("dup_3gram_frac"),
    )


@query("embedding_ops", """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
  FROM e
)
SELECT vec_id,
  ROUND(nrm, 6) AS norm,
  ROUND(CASE WHEN nrm > 0 THEN sqrt(list_aggregate(
      list_transform(v, x -> (x/nrm)*(x/nrm)), 'sum')) ELSE 0 END, 6)
    AS unit_norm,
  list_aggregate(list_transform(v, x -> CASE WHEN scale > 0 THEN
      greatest(-127, least(127, round(x * 127.0 / scale)::INT))
      ELSE 0 END), 'sum')::BIGINT AS q8_sum,
  list_aggregate(list_transform(v, x -> CASE WHEN scale > 0 THEN
      greatest(-127, least(127, round(x * 127.0 / scale)::INT))
      ELSE 0 END), 'min')::BIGINT AS q8_min,
  ROUND(scale, 6) AS scale
FROM s
""")
def embedding_ops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding utilities: l2 norm, normalize (checked via unit norm),
    int8 scalar quantization (compared via per-vector sum/min — raw
    arrays don't string-compare across engines) + its scale — all JVM
    array expressions (operators/embedding.py) vs DuckDB list math."""
    from .operators import embedding as EMB
    emb = load_table(spark, sf_dir, "embeddings")
    unit = EMB.l2_normalize("embedding")
    return emb.select(
        "vec_id",
        _r(K.norm(EMB._v("embedding"))).alias("norm"),
        _r(K.norm(unit)).alias("unit_norm"),
        F.aggregate(EMB.quantize_int8("embedding"), F.lit(0),
                    lambda a, x: a + x).cast("long").alias("q8_sum"),
        F.array_min(EMB.quantize_int8("embedding")).cast("long")
        .alias("q8_min"),
        _r(EMB.quantize_scale("embedding")).alias("scale"),
    )


@query("pii_scrub", r"""
WITH t AS (
  SELECT doc_id,
    concat(text, ' reach me: u', doc_id % 50, '@example.org or +1 415 555 ',
           1000 + doc_id % 9000, ' host 10.0.', doc_id % 256, '.1') AS text
  FROM documents WHERE doc_id % 5 = 0
), r AS (
  SELECT doc_id,
    len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
    len(regexp_extract_all(text,
        '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ipv4,
    regexp_replace(regexp_replace(regexp_replace(text,
        '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IPV4]', 'g'),
        '\+?[0-9][0-9()\-\s]{7,}[0-9]', '[PHONE]', 'g'),
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g')
      AS scrubbed
  FROM t
)
SELECT doc_id, n_email, n_ipv4, md5(scrubbed) AS scrub_md5 FROM r
""")
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over docs salted with synthetic emails/phones/IPs (the
    corpus itself has none — the salt makes the test discriminating).
    Redacted text is md5-compared so multi-KB strings hash instead of
    string-compare; counts audit the extractor. Patterns are
    lookbehind-free by design: the same regexes run on Java regex and
    RE2 (text.py:PII_PATTERNS)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    salted = F.concat(
        F.col("text"), F.lit(" reach me: u"), (F.col("doc_id") % 50),
        F.lit("@example.org or +1 415 555 "),
        (F.lit(1000) + F.col("doc_id") % 9000),
        F.lit(" host 10.0."), (F.col("doc_id") % 256), F.lit(".1"))
    t = docs.select("doc_id", salted.alias("text"))
    counts = T.pii_counts("text")
    return t.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(T.pii_redact("text")).alias("scrub_md5"),
    )


@query("line_dedup", r"""
WITH corpus AS (
  SELECT doc_id,
    text || chr(10) || 'boilerplate variant ' || (doc_id % 7)::VARCHAR
         || chr(10) || 'shared footer line' AS text
  FROM documents
), l AS (
  SELECT doc_id, u.i AS i, u.ln AS ln FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, len(string_split(text, chr(10))) + 1),
      i -> {'i': i, 'ln': string_split(text, chr(10))[i]})) AS u
    FROM corpus)
  WHERE trim(ln) != ''
), k AS (
  SELECT doc_id, i, ln,
         ROW_NUMBER() OVER (PARTITION BY ln ORDER BY doc_id, i) AS rn
  FROM l
)
SELECT doc_id, string_agg(ln, chr(10) ORDER BY i) AS text
FROM k WHERE rn = 1 GROUP BY doc_id
""")
def line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup over a corpus salted with shared
    boilerplate/footer lines (each survives once, in its first (doc,
    position) occurrence; dedup.py:line_dedup). One shuffle on the line
    hash + one reassembly groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit("\nboilerplate variant "),
                 (F.col("doc_id") % 7).cast("string"),
                 F.lit("\nshared footer line")).alias("text"))
    return D.line_dedup(corpus, "doc_id", "text")


@query("strip_boilerplate", r"""
WITH corpus AS (
  SELECT doc_id, source,
    'site header for ' || source || chr(10) || text
    || chr(10) || 'promo variant ' || (doc_id % 3)::VARCHAR
    || CASE WHEN doc_id % 13 = 0
            THEN chr(10) || 'rare sweepstakes line' ELSE '' END AS text
  FROM documents
), l AS (
  SELECT doc_id, source, u.i AS i, trim(u.ln) AS line, u.ln AS ln FROM (
    SELECT doc_id, source, unnest(list_transform(
      range(1, len(string_split(text, chr(10))) + 1),
      i -> {'i': i, 'ln': string_split(text, chr(10))[i]})) AS u
    FROM corpus)
), freq AS (
  SELECT source, line, COUNT(DISTINCT doc_id) AS doc_freq
  FROM l WHERE line != '' GROUP BY 1, 2
), tot AS (
  SELECT source, COUNT(DISTINCT doc_id) AS group_docs FROM corpus GROUP BY 1
), bp AS (
  SELECT f.source, f.line FROM freq f JOIN tot t USING (source)
  WHERE doc_freq >= 3 AND doc_freq >= 0.5 * group_docs
), m AS (
  SELECT l.doc_id, l.i, l.ln, (bp.line IS NOT NULL) AS is_bp
  FROM l LEFT JOIN bp ON l.source = bp.source AND l.line = bp.line
)
SELECT doc_id,
  coalesce(string_agg(ln, chr(10) ORDER BY i) FILTER (WHERE NOT is_bp),
           '') AS text,
  SUM(is_bp::INT)::BIGINT AS n_removed
FROM m GROUP BY doc_id
""")
def strip_boilerplate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-line removal (dedup.strip_boilerplate,
    the RefinedWeb/CCNet frequency rule): a planted per-source header
    (frequency 1.0 — stripped), a promo line on a third of each
    source's docs (doc_freq ≥ 3 but below the 0.5 fraction floor —
    kept), and a rare line on doc_id % 13 (below the 3-doc floor —
    kept). Oracle replays the census, both floors, and the ordered
    reassembly."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id", "source",
        F.concat(
            F.lit("site header for "), F.col("source"), F.lit("\n"),
            F.col("text"),
            F.lit("\npromo variant "), (F.col("doc_id") % 3).cast("string"),
            F.when(F.col("doc_id") % 13 == 0,
                   F.lit("\nrare sweepstakes line")).otherwise(F.lit("")),
        ).alias("text"))
    return D.strip_boilerplate(corpus, "doc_id", "text",
                               group_col="source", min_docs=3, min_frac=0.5)


@query("pack_sequences", r"""
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS tokens,
         (doc_id % 2147483647 * 2654435761) % 2147483647 AS ord
  FROM documents
), c AS (
  SELECT doc_id, tokens, SUM(tokens) OVER (ORDER BY ord) AS cum FROM t
), b AS (
  SELECT doc_id, tokens,
         GREATEST(CEIL(cum / 2048.0) - 1, 0)::BIGINT AS bin
  FROM c
)
SELECT bin, COUNT(*) AS n_docs, SUM(tokens)::BIGINT AS bin_tokens
FROM b GROUP BY bin
""")
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: docs → contiguous 2048-token bins via
    the two-pass prefix plan (text.py:pack_sequences); result rolled up
    per bin so the oracle pins every bin's membership and token sum."""
    docs = load_table(spark, sf_dir, "documents")
    packed = T.pack_sequences(docs, "doc_id", "text", seq_tokens=2048)
    return packed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("long").alias("bin_tokens"))


@query("chunk_documents", """
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS txt FROM documents
), n AS (
  SELECT doc_id, txt,
         CAST(GREATEST(1, CEIL((LENGTH(txt) - 16)::DOUBLE / 80)) AS INT)
           AS n_chunks
  FROM t
), e AS (
  SELECT doc_id, txt, n_chunks, UNNEST(range(0, n_chunks)) AS cid FROM n
)
SELECT doc_id, CAST(cid AS INT) AS chunk_id,
       substr(txt, CAST(cid * 80 + 1 AS INT), 96) AS chunk, n_chunks
FROM e
""")
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunking (text.py:chunk_documents — the
    embedding/RAG prep step): 96-char windows with 16-char overlap
    (stride 80), 0-based chunk ids, every doc ≥1 chunk. Pure scan-side
    sequence→transform→posexplode (zero shuffles); the oracle replays
    count + every window substring, so boundaries are hash-pinned
    character for character."""
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_documents(docs, "doc_id", "text",
                             chunk_chars=96, overlap=16)


@query("chunk_by_tokens", r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(COALESCE(text, '')), '\s+') AS w
  FROM documents
), n AS (
  SELECT doc_id, w, len(w) AS n,
         GREATEST(CAST(CEIL((len(w) - 16)::DOUBLE / 48) AS INT), 1) AS nc
  FROM t
), e AS (
  SELECT doc_id, w, n, UNNEST(range(0, nc)) AS cid FROM n
)
SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
       array_to_string(list_slice(w, CAST(cid * 48 + 1 AS INT),
                                   CAST(cid * 48 + 64 AS INT)), ' ')
         AS chunk_text,
       CAST(LEAST(n - cid * 48, 64) AS BIGINT) AS chunk_n_tokens
FROM e
""")
def chunk_by_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget chunking (text.py:chunk_documents_by_tokens — the
    char-window sibling of chunk_documents): 64-token windows with
    16-token overlap (stride 48), 0-based chunk ids, every doc ≥1
    chunk, last chunk short. Same zero-shuffle scan-side plan; the
    oracle replays tokenization, chunk count, every window's token
    slice, and the per-chunk token count."""
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_documents_by_tokens(docs, "doc_id", "text",
                                       chunk_tokens=64, overlap=16)


# --------------------------------------------------------- retrieval / lexical

@query("tfidf_topk", r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tc, ANY_VALUE(dlen) AS dlen FROM (
    SELECT doc_id, len(w) AS dlen, unnest(w) AS term FROM toks
  ) GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM (
    SELECT DISTINCT doc_id, term
    FROM (SELECT doc_id, unnest(w) AS term FROM toks)
  ) GROUP BY term
), n AS (SELECT COUNT(*) AS n FROM documents
), scored AS (
  SELECT doc_id, term, (tc / dlen) * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY ROUND(tfidf, 9) DESC, term ASC) AS r
  FROM scored
)
SELECT doc_id, term, ROUND(tfidf, 6) AS tfidf FROM ranked WHERE r <= 3
""")
def tfidf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (operators/retrieval.tfidf_topk;
    ref python/polars_ds — the keyword-extraction workhorse). Scores are
    rounded to 9 dp BEFORE ranking on both engines so ln() ulp noise can't
    flip a near-tie across the top-k boundary."""
    docs = load_table(spark, sf_dir, "documents")
    out = R.tfidf_topk(docs, "doc_id", "text", k=3, rank_scale=9)
    return out.select("doc_id", "term", _r(F.col("tfidf")).alias("tfidf"))


@query("bm25_score", r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
), stats AS (
  SELECT COUNT(*) AS n, AVG(len(w)) AS avgdl FROM toks
), hits AS (
  SELECT doc_id, len(w) AS dlen, term, len(list_filter(w, x -> x = term)) AS tc
  FROM (SELECT doc_id, w,
               unnest(list_intersect(list_distinct(w),
                      ['spark', 'join', 'window', 'hash'])) AS term
        FROM toks)
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY term
)
SELECT doc_id,
       ROUND(SUM(ln(1.0 + (n - df + 0.5) / (df + 0.5))
                 * (tc * 2.2) / (tc + 1.2 * (0.25 + 0.75 * dlen / avgdl))), 6)
       AS bm25
FROM hits JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY doc_id
""")
def bm25_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) of every document against the query bag
    {spark, join, window, hash} (operators/retrieval.bm25_score). Only
    documents with >=1 matching term appear — the scan-side intersect
    filter both engines share."""
    docs = load_table(spark, sf_dir, "documents")
    out = R.bm25_score(docs, "doc_id", "text",
                       ["spark", "join", "window", "hash"])
    return out.select("doc_id", _r(F.col("bm25")).alias("bm25"))


@query("bigram_lm", r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
), big AS (
  SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM (
    SELECT doc_id, unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg FROM toks
  )
), uni AS (
  SELECT w1, COUNT(*) AS c1 FROM (SELECT unnest(w) AS w1 FROM toks) GROUP BY w1
), v AS (SELECT COUNT(*) AS v FROM uni
), bi AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
)
SELECT doc_id,
       ROUND(-AVG(ln((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS cross_entropy,
       COUNT(*) AS n_bigrams
FROM big JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
GROUP BY doc_id
""")
def bigram_lm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under an add-0.5-smoothed bigram LM
    trained on the corpus itself (operators/retrieval.bigram_lm_score) —
    the KenLM-style perplexity quality filter."""
    docs = load_table(spark, sf_dir, "documents")
    out = R.bigram_lm_score(docs, "doc_id", "text", add_k=0.5)
    return out.select("doc_id", _r(F.col("cross_entropy")).alias("cross_entropy"),
                      "n_bigrams")


@query("multimodal_decode", """
WITH b AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 4 ELSE 3 END
           + octet_length(encode(text)) AS n,
         CASE doc_id % 3 WHEN 0 THEN 137 WHEN 1 THEN 255 ELSE 73 END AS fb,
         ascii(substr(text, length(text), 1)) AS lb
  FROM documents
)
SELECT doc_id, (1 + (n + fb) % 64)::INT AS height,
       (1 + (7 * n + lb) % 64)::INT AS width, 3 AS channels
FROM b
""")
def multimodal_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_image plumbing over synthesized blobs with the
    DETERMINISTIC fake decoder (operators/multimodal.py decode_image —
    dims derived from blob length and first/last byte, reproduced
    exactly in SQL). With Pillow installed the same call decodes for
    real; the fake keeps the mapInPandas schema/batch path
    driver-verifiable in codec-less environments."""
    from .operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(bytes.fromhex("89504E47")))
        .when(F.col("doc_id") % 3 == 1, F.lit(bytes.fromhex("FFD8FFE0")))
        .otherwise(F.lit(bytes.fromhex("494433")))
    )
    blobs = docs.select(
        "doc_id", F.concat(magic, F.encode("text", "utf-8")).alias("content"))
    dec = MM.decode_image(blobs, "content", fake=True)
    return dec.select("doc_id",
                      F.col("decoded.height").alias("height"),
                      F.col("decoded.width").alias("width"),
                      F.col("decoded.channels").alias("channels"))


@query("curation_pipeline", rf"""
WITH u AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL SELECT doc_id + 100000 AS doc_id, text, lang FROM documents
), d AS (
  SELECT MIN(doc_id) AS doc_id, text, arg_min(lang, doc_id) AS lang
  FROM u GROUP BY text
), t AS (
  SELECT lang, text, len(text) AS n,
         string_split_regex(trim(text), '\s+') AS sp
  FROM d
), m AS (
  SELECT lang, len(sp) AS ntok,
    len(list_filter(sp, x -> lower(x) IN ({_SW_SQL})))::DOUBLE / len(sp) AS swr,
    list_aggregate(list_transform(sp, x -> len(x)), 'sum')::DOUBLE
      / len(sp) AS mtl,
    (n - len(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE / n AS pr, n
  FROM t
), q AS (
  SELECT lang, ntok,
    ((CASE WHEN n >= 100 AND n <= 20000 THEN 1.0
           WHEN n >= 30 THEN 0.5 ELSE 0.0 END)
     + (CASE WHEN swr >= 0.1 AND swr <= 0.7 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
  FROM m
)
SELECT lang, COUNT(*) AS n_docs, SUM(ntok)::BIGINT AS total_tokens,
       ROUND(AVG(quality), 6) AS avg_quality
FROM q WHERE quality >= 0.75 GROUP BY lang
""")
def curation_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation chain — the composition a training-data
    pipeline actually runs, as ONE Catalyst plan: exact dedup (8-byte
    hash shuffle, min-id keeper) → quality gate (scan-side JVM exprs)
    → per-language corpus accounting. Each piece is individually
    oracled elsewhere (`exact_dedup`, `text_quality`, `token_stats`);
    this query pins their composition."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"),
                      "text", "lang")
    corpus = docs.unionByName(dup)
    kept = D.exact_dedup(corpus, ["text"], "doc_id")
    scored = kept.select(
        "lang",
        T.quality_score("text").alias("__q"),
        T.token_count("text").alias("__tok"))
    return (scored.where(F.col("__q") >= 0.75)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__tok").cast("long").alias("total_tokens"),
                 _r(F.avg("__q")).alias("avg_quality")))


@query("multimodal_resize", """
WITH px AS (
  SELECT doc_id, text, length(text) AS n FROM documents
), s AS (
  SELECT doc_id,
    -- nearest-neighbor 4x4x3 -> 2x2x3 keeps source pixels (1,1),(1,3),
    -- (3,1),(3,3); their flat byte positions (1-based) in the 48-byte
    -- buffer are 16..18, 22..24, 40..42, 46..48; zero beyond the text
    (CASE WHEN n >= 16 THEN ascii(substr(text, 16, 1)) ELSE 0 END
   + CASE WHEN n >= 17 THEN ascii(substr(text, 17, 1)) ELSE 0 END
   + CASE WHEN n >= 18 THEN ascii(substr(text, 18, 1)) ELSE 0 END
   + CASE WHEN n >= 22 THEN ascii(substr(text, 22, 1)) ELSE 0 END
   + CASE WHEN n >= 23 THEN ascii(substr(text, 23, 1)) ELSE 0 END
   + CASE WHEN n >= 24 THEN ascii(substr(text, 24, 1)) ELSE 0 END
   + CASE WHEN n >= 40 THEN ascii(substr(text, 40, 1)) ELSE 0 END
   + CASE WHEN n >= 41 THEN ascii(substr(text, 41, 1)) ELSE 0 END
   + CASE WHEN n >= 42 THEN ascii(substr(text, 42, 1)) ELSE 0 END
   + CASE WHEN n >= 46 THEN ascii(substr(text, 46, 1)) ELSE 0 END
   + CASE WHEN n >= 47 THEN ascii(substr(text, 47, 1)) ELSE 0 END
   + CASE WHEN n >= 48 THEN ascii(substr(text, 48, 1)) ELSE 0 END
    ) AS pixel_sum
  FROM px
)
SELECT doc_id, 2 AS height, 2 AS width, 3 AS channels,
       pixel_sum::BIGINT AS pixel_sum
FROM s
""")
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize_image end-to-end with REAL resampling (operators/
    multimodal.py resize_image): a deterministic 4x4x3 'decoded' frame
    is synthesized from each document's leading 48 utf-8 bytes
    (zero-padded), nearest-neighbor-resized to 2x2, and checksummed.
    The oracle recomputes the four surviving source pixels' byte
    positions in SQL — the resample index math is content-verified,
    not just shape-verified. Codec-free: resampling needs pixel access,
    not a codec."""
    from .operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    dec = docs.select(
        "doc_id",
        F.struct(
            F.lit(4).alias("height"), F.lit(4).alias("width"),
            F.lit(3).alias("channels"),
            F.expr("substring(encode(text, 'utf-8'), 1, 48)")
            .alias("pixels"),
        ).alias("decoded"))
    rs = MM.resize_image(dec, "decoded", width=2, height=2)
    # byte sum JVM-side: latin-1 decode maps bytes 1:1 to codepoints
    return rs.select(
        "doc_id",
        F.col("resized.height").alias("height"),
        F.col("resized.width").alias("width"),
        F.col("resized.channels").alias("channels"),
        F.expr(
            "aggregate(transform(sequence(1, length(resized.pixels)), "
            "i -> ascii(substring(decode(resized.pixels, 'ISO-8859-1'),"
            " i, 1))), 0L, (a, x) -> a + x)"
        ).alias("pixel_sum"))


@query("semantic_dedup", """
WITH RECURSIVE e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), u AS (
  SELECT vec_id, v FROM e0
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(v, (x, i) -> CASE WHEN i = 1 THEN x * 1.05
                                          ELSE x END)
  FROM e0 WHERE vec_id % 7 = 0
), c AS (
  SELECT vec_id AS cid, v AS cv FROM u
  WHERE vec_id < GREATEST(16, CEIL(SQRT((SELECT COUNT(*) FROM u))))
), asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT u.vec_id, u.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY u.vec_id
                         ORDER BY list_distance(u.v, c.cv), c.cid) AS rn
    FROM u CROSS JOIN c
  ) WHERE rn = 1
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.9
), ed AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(s, d) AS (
  SELECT s, d FROM ed
  UNION
  SELECT r.s, ed.d FROM reach r JOIN ed ON r.d = ed.s
), comp AS (
  SELECT s AS id, LEAST(s, MIN(d)) AS comp FROM reach GROUP BY s
)
SELECT u.vec_id FROM u LEFT JOIN comp ON u.vec_id = comp.id
WHERE comp.id IS NULL OR comp.comp = u.vec_id
""")
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup end-to-end (operators/dedup.py
    semantic_dedup): every 7th embedding gets a perturbed duplicate
    (component 0 scaled 1.05x — cosine ~0.999 vs a ~0.49 natural
    within-cell max, so the pair set is exactly the planted dups), then
    IVF cells (~sqrt(N) first-id centroids) -> within-cell cosine
    pairs -> connected components -> smallest-id survivor. Oracle
    replays assignment, thresholding, and a recursive-CTE closure."""
    import math

    from .operators import dedup as D

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    dup = emb.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == 0, x * 1.05).otherwise(x)
        ).alias("v"))
    u = emb.unionByName(dup)
    n_cent = max(16, math.ceil(math.sqrt(u.count())))
    out = D.semantic_dedup(u, "vec_id", "v", min_cosine=0.9,
                           n_centroids=n_cent)
    return out.select("vec_id")


@query("dup_spans", r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
  FROM documents
), wins AS (
  SELECT doc_id, array_to_string(w[i : i + 12], ' ') AS g
  FROM toks, UNNEST(range(1, len(w) - 11)) AS t(i)
  WHERE len(w) >= 13
), dup AS (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM wins)
  GROUP BY g HAVING COUNT(*) >= 2
), marked AS (
  SELECT w.doc_id, CASE WHEN d.g IS NULL THEN 0 ELSE 1 END AS isdup
  FROM wins w LEFT JOIN dup d USING (g)
)
SELECT doc_id, COUNT(*) AS n_windows,
       SUM(isdup)::BIGINT AS n_dup_windows,
       ROUND(SUM(isdup)::DOUBLE / COUNT(*), 4) AS dup_frac
FROM marked GROUP BY doc_id
""")
def dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-span signal (operators/text.py
    dup_span_stats — the Lee et al. 2022 ExactSubstr criterion at word
    granularity, re-expressed as a window-hash shuffle instead of a
    single-machine suffix array). The Spark side groups on xxhash64 of
    each 13-word window (8-byte shuffle keys); the oracle groups on the
    window text itself — identical results absent 64-bit collisions."""
    docs = load_table(spark, sf_dir, "documents")
    return T.dup_span_stats(docs, "doc_id", "text", n=13)


@query("dup_char_spans", r"""
WITH u AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substr(text, 11, 90) AS text
  FROM documents WHERE doc_id < 40
), w AS (
  SELECT doc_id, substr(lower(text), i, 40) AS g
  FROM u, UNNEST(range(1, length(text) - 40 + 2)) AS t(i)
  WHERE length(text) >= 40
), dup AS (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM w)
  GROUP BY g HAVING COUNT(*) >= 2
), marked AS (
  SELECT w.doc_id, CASE WHEN d.g IS NULL THEN 0 ELSE 1 END AS isdup
  FROM w LEFT JOIN dup d USING (g)
)
SELECT doc_id, COUNT(*) AS n_windows,
       SUM(isdup)::BIGINT AS n_dup_windows,
       ROUND(SUM(isdup)::DOUBLE / COUNT(*), 4) AS dup_frac
FROM marked GROUP BY doc_id
""")
def dup_char_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAR-granular ExactSubstr tier (operators/text.py
    dup_char_span_stats) on a corpus with PLANTED char-level overlaps:
    40 docs contribute a 90-char substring copy, so every 40-char
    window inside the copied span is duplicated — spans the word-13-gram
    tier can miss entirely (the copy starts mid-word and covers < 13
    whole words for short docs). Spark groups on xxhash64 of each
    window (8-byte shuffle keys); the oracle groups on the window text
    itself — identical results absent 64-bit collisions, same contract
    the word-tier `dup_spans` query already pins."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 300).select("doc_id", "text")
    planted = docs.where(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring("text", 11, 90).alias("text"))
    return T.dup_char_span_stats(base.unionByName(planted),
                                 "doc_id", "text", n=40)


@query("mixture_resample", """
WITH cnt AS (
  SELECT lang, COUNT(*)::DOUBLE AS c FROM documents GROUP BY lang
), ws AS (
  SELECT SUM(SQRT(c)) AS wsum, SUM(c) AS total FROM cnt
), rates AS (
  SELECT lang, LEAST(1.0, total * (SQRT(c) / wsum) / c) AS r
  FROM cnt, ws
)
SELECT d.lang, COUNT(*) AS n_kept, SUM(d.doc_id)::BIGINT AS sum_id
FROM documents d JOIN rates USING (lang)
WHERE (d.doc_id * 2654435761) % 10000 < r * 10000
GROUP BY d.lang
""")
def mixture_resample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source-mixture resampling (functions/sample.py
    mixture_sample, the count^alpha multilingual-sampling rule of
    mBERT/XLM-R data recipes) at alpha=0.5 over the language column:
    small languages are upweighted, the majority thinned. ONE tiny
    groupBy (|langs| rows) to the driver, keep-rates return as literal
    filters — the corpus never shuffles. Selection is the deterministic
    id-scramble bucket, so kept rows are engine-reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    out = SMP.mixture_sample(docs, "doc_id", "lang", alpha=0.5)
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_id"))


@query("source_overlap", r"""
WITH t AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS sp
  FROM documents
), g AS (
  SELECT source, list_distinct(list_transform(
    range(1, greatest(len(sp) - 2, 1) + 1),
    i -> array_to_string(list_slice(sp, i, i + 2), ' '))) AS s
  FROM t
), sg AS (
  SELECT DISTINCT source, g FROM (SELECT source, unnest(s) AS g FROM g)
), c AS (
  SELECT source, COUNT(*)::BIGINT AS n FROM sg GROUP BY source
), sh AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*)::BIGINT AS shared
  FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, ca.n AS grams_a, cb.n AS grams_b, shared,
  ROUND(shared::DOUBLE / (ca.n + cb.n - shared), 6) AS jaccard
FROM sh JOIN c ca ON ca.source = source_a JOIN c cb ON cb.source = source_b
""")
def source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level word-3-gram overlap matrix (text.
    source_overlap_matrix) — which corpus sources duplicate each
    other's content wholesale; grams shuffle as 8-byte hashes, the
    oracle replays on raw strings (distinct counts agree at the
    documented ~n²/2⁶⁴ hash-collision odds)."""
    docs = load_table(spark, sf_dir, "documents")
    out = T.source_overlap_matrix(docs, "source", "text", n=3)
    return out.select("source_a", "source_b", "grams_a", "grams_b",
                      "shared", _r(F.col("jaccard")).alias("jaccard"))


def _ridge_logistic_quality_sql(l2: float = 1.0, n_iters: int = 8) -> str:
    """Unrolled ridge-IRLS on (stopword_ratio, mean_token_len) vs the
    weak label lang='en', mirroring functions/linear.logistic_reg's
    ridge handling exactly (H + λI off the bias, g − λβ off the bias),
    then scan-side scoring and a per-source report. Same 3×3 Cramer
    algebra as `queries_linear._logistic_irls_sql`; Newton with ridge
    converges to |step|<1e-10 well inside 8 iterations, so both engines
    land on the same fixpoint to far beyond 6 dp."""
    sw = "['the','a','an','and','or','of','to','in','is','was','for'," \
         "'on','with','as','at','by','it','be','are','this','that']"
    ctes = [f"""d AS (
  SELECT doc_id, source,
    list_sum(list_transform(w, t -> CASE WHEN list_contains({sw}, lower(t))
      THEN 1 ELSE 0 END))::DOUBLE / len(w) AS x1,
    list_sum(list_transform(w, t -> length(t)))::DOUBLE / len(w) AS x2,
    (lang = 'en')::INT::DOUBLE AS y
  FROM (SELECT doc_id, source, lang,
        string_split_regex(trim(text), '\\s+') AS w FROM documents
        WHERE trim(text) <> ''))""",
            "b0 AS (SELECT 0.0 AS b1, 0.0 AS b2, 0.0 AS b3)"]
    lam = float(l2)
    for i in range(1, n_iters + 1):
        p = "(1.0 / (1.0 + EXP(-(b.b1*x1 + b.b2*x2 + b.b3))))"
        ctes.append(f"""a{i} AS (
  SELECT SUM({p}*(1-{p})*x1*x1) + {lam} AS h11, SUM({p}*(1-{p})*x1*x2) AS h12,
         SUM({p}*(1-{p})*x1) AS h13, SUM({p}*(1-{p})*x2*x2) + {lam} AS h22,
         SUM({p}*(1-{p})*x2) AS h23, SUM({p}*(1-{p})) AS h33,
         SUM((y-{p})*x1) - {lam}*MAX(b.b1) AS g1,
         SUM((y-{p})*x2) - {lam}*MAX(b.b2) AS g2, SUM(y-{p}) AS g3,
         MAX(b.b1) AS b1, MAX(b.b2) AS b2, MAX(b.b3) AS b3
  FROM d, b{i-1} b)""")
        ctes.append(f"""b{i} AS (
  SELECT b1 + ( g1*(h22*h33-h23*h23) - h12*(g2*h33-h23*g3) + h13*(g2*h23-h22*g3))
            / (h11*(h22*h33-h23*h23) - h12*(h12*h33-h23*h13) + h13*(h12*h23-h22*h13)) AS b1,
         b2 + (h11*(g2*h33-h23*g3) - g1*(h12*h33-h23*h13) + h13*(h12*g3-g2*h13))
            / (h11*(h22*h33-h23*h23) - h12*(h12*h33-h23*h13) + h13*(h12*h23-h22*h13)) AS b2,
         b3 + (h11*(h22*g3-g2*h23) - h12*(h12*g3-g2*h13) + g1*(h12*h23-h22*h13))
            / (h11*(h22*h33-h23*h23) - h12*(h12*h33-h23*h13) + h13*(h12*h23-h22*h13)) AS b3
  FROM a{i})""")
    ctes.append(f"""scored AS (
  SELECT source, 1.0 / (1.0 + EXP(-(b.b1*x1 + b.b2*x2 + b.b3))) AS p
  FROM d, b{n_iters} b)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT source, COUNT(*)::BIGINT AS n_docs, ROUND(AVG(p), 6) AS mean_score,
  COUNT(CASE WHEN ROUND(p, 6) >= 0.5 THEN 1 END)::BIGINT AS n_flagged
FROM scored GROUP BY source""")


@query("quality_classifier", _ridge_logistic_quality_sql())
def quality_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision quality classifier (text.
    quality_classifier_scores): weak label lang='en', two scan-side
    fluency features, ridge-logistic IRLS fit (8 one-pass iterations),
    then scan-side scoring — per-source mean score + flagged count.
    The oracle replays features, the full ridge-Newton unroll, AND the
    scoring, so the fit itself is correctness-gated, not just the
    report. Thresholding happens on the ROUNDED score (engine-stable
    cut, same discipline as perplexity_gate)."""
    docs = load_table(spark, sf_dir, "documents")
    _, scored = T.quality_classifier_scores(
        docs, "doc_id", "text", (F.col("lang") == "en"),
        keep_cols=["source"], l2=1.0, n_iters=8)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _r(F.avg("score")).alias("mean_score"),
        F.count(F.when(F.round(F.col("score"), 6) >= 0.5, 1))
         .alias("n_flagged"))


_SHUF7 = SMP._shuffle_consts(7)


@query("shuffle_shards", f"""
WITH k AS (
  SELECT doc_id,
    (69621 * ((48271 * ((doc_id + {_SHUF7[0]}) % 2147483647)
               + {_SHUF7[1]}) % 2147483647)
     + {_SHUF7[2]}) % 2147483647 AS key
  FROM documents
), s AS (
  SELECT doc_id, key, key % 8 AS shard,
    ROW_NUMBER() OVER (PARTITION BY key % 8 ORDER BY key, doc_id) AS pos
  FROM k
)
SELECT shard, COUNT(*)::BIGINT AS n_docs,
  SUM(pos * doc_id)::BIGINT AS order_checksum,
  MIN_BY(doc_id, pos) AS first_doc,
  MAX_BY(doc_id, pos) AS last_doc
FROM s GROUP BY shard
""")
def shuffle_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle (functions/sample.
    shuffle_shards): every doc gets a shard (shuffle_key % 8) and its
    position in the shard's shuffled order; the per-shard
    position-weighted checksum pins the EXACT order cross-engine, so
    the oracle verifies the shuffle itself, not just the partition
    counts. The same key feeds sinks.write_training_shards (one sorted
    file per shard)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = SMP.shuffle_shards(docs.select("doc_id"), "doc_id", 8, seed=7)
    return sh.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum"),
        F.min_by("doc_id", "pos").alias("first_doc"),
        F.max_by("doc_id", "pos").alias("last_doc"))


@query("leakage_safe_split", f"""
WITH c AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 250000 AS doc_id, text || ' zz dup marker' AS text
  FROM documents WHERE doc_id % 5 = 0
), k AS (
  SELECT doc_id, text,
    (69621 * ((48271 * ((doc_id + {_SHUF7[0]}) % 2147483647)
               + {_SHUF7[1]}) % 2147483647)
     + {_SHUF7[2]}) % 2147483647 AS key
  FROM c
), ev AS (
  SELECT doc_id, text FROM k WHERE key < 107374182
), tr AS (
  SELECT doc_id, text FROM k WHERE key >= 107374182
), shn AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM tr
), shi AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(text) - 11, 1) + 1), i -> substr(text, i, 12))) AS s
  FROM ev
), nn AS (SELECT doc_id, len(s) AS n FROM shn),
ni AS (SELECT doc_id, len(s) AS n FROM shi),
ns AS (SELECT doc_id, unnest(s) AS g FROM shn),
ig AS (SELECT doc_id, unnest(s) AS g FROM shi),
shared AS (
  SELECT n.doc_id AS nid, i.doc_id AS iid, COUNT(*) AS cnt
  FROM ns n JOIN ig i ON n.g = i.g GROUP BY 1, 2
), j AS (
  SELECT nid, iid, cnt::DOUBLE / (a.n + b.n - cnt) AS jac
  FROM shared JOIN nn a ON a.doc_id = nid JOIN ni b ON b.doc_id = iid
  WHERE cnt::DOUBLE / (a.n + b.n - cnt) >= 0.6
), leak AS (
  SELECT nid, iid FROM (
    SELECT nid, iid,
      ROW_NUMBER() OVER (PARTITION BY nid ORDER BY jac DESC, iid ASC) AS rn
    FROM j) WHERE rn = 1
)
SELECT k.doc_id,
  CASE WHEN k.key < 107374182 THEN 'eval'
       WHEN leak.iid IS NOT NULL THEN 'dropped'
       ELSE 'train' END AS split,
  leak.iid AS leaked_to
FROM k LEFT JOIN leak ON k.doc_id = leak.nid
""")
def leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval holdout (functions/sample.
    leakage_safe_split — reverse decontamination): corpus = documents ∪
    perturbed copies of every 5th doc, split 5%/95% by the
    engine-reproducible shuffle_key(seed=7) cut, then every train doc
    near-dupping an eval doc at ≥0.6 exact shingle Jaccard is
    'dropped' with its best-matching eval id as the audit column.
    Planted pairs straddle the cut deterministically (copy-in-train/
    source-in-eval and vice versa both occur), so the oracle replays
    the key, the cut, the all-pairs Jaccard, and the best-match
    tie-break — the whole split is hash-pinned per doc."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.where(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 250000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz dup marker"))
                .alias("text")))
    out = SMP.leakage_safe_split(corpus, "doc_id", "text",
                                 eval_frac=0.05, seed=7)
    return out.select("doc_id", "split", "leaked_to")


@query("token_mixture", r"""
WITH d AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tok
  FROM documents
), t AS (
  SELECT source, SUM(n_tok)::DOUBLE AS tt FROM d GROUP BY source
), r AS (
  SELECT source, CASE source
    WHEN 'src0' THEN LEAST(1.0, 0.5 * 1500 / tt)
    WHEN 'src1' THEN LEAST(1.0, 0.25 * 1500 / tt)
    WHEN 'src2' THEN LEAST(1.0, 0.25 * 1500 / tt)
    ELSE 0.0 END AS rate
  FROM t
), s AS (
  SELECT d.*, r.rate FROM d JOIN r USING (source)
  WHERE (doc_id % 10000 * 2654435761) % 10000 < rate * 10000
)
SELECT source, COUNT(*)::BIGINT AS n_docs, SUM(n_tok)::BIGINT AS kept_tokens
FROM s GROUP BY source
""")
def token_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (functions/sample.
    token_mixture_sample): a 1500-token budget split 50/25/25 across
    three sources — the mixture knob specified in TOKENS, the unit LLM
    training actually consumes (mixture_resample balances doc counts;
    with heterogeneous doc lengths that over-serves long-doc sources).
    One tiny per-source token-total groupBy to the driver, literal
    keep-rates back, deterministic id-scramble selection — the corpus
    never shuffles, and the oracle replays rates and buckets exactly."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long"))
    out = SMP.token_mixture_sample(
        docs, "doc_id", "source", "n_tok",
        {"src0": 0.5, "src1": 0.25, "src2": 0.25}, token_budget=1500)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("kept_tokens"))


@query("quality_quantile_filter", """
WITH r AS (
  SELECT doc_id, n_chars, RANK() OVER (ORDER BY n_chars) AS rk
  FROM documents
), c AS (SELECT COUNT(*) AS n FROM documents)
SELECT COUNT(*) AS n_kept, SUM(n_chars)::BIGINT AS sum_chars,
       MIN(n_chars) AS min_chars
FROM r, c WHERE rk > FLOOR(0.75 * n)
""")
def quality_quantile_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents above the exact global 75th percentile of length
    (functions/sample.py filter_by_global_quantile) — the quality-
    threshold gate of curation pipelines with engine-stable tie
    semantics (min-rank: the whole tied group lands on one side). The
    exact global rank is the two-pass range-bucket plan
    (plans/ranks.global_min_rank) — no single-partition sort at any
    scale; the oracle is a plain RANK() window."""
    docs = load_table(spark, sf_dir, "documents")
    out = SMP.filter_by_global_quantile(docs, "n_chars", q=0.75, keep="top")
    return out.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"))


@query("pq_encode", """
WITH cb AS (
  SELECT vec_id AS code, embedding FROM embeddings WHERE vec_id < 16
), v AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
), sub AS (SELECT s FROM UNNEST(range(0, 8)) t(s)),
d AS (
  SELECT v.vec_id, sub.s, cb.code,
    list_sum(list_transform(
      list_zip(v.embedding[sub.s * 8 + 1 : sub.s * 8 + 8],
               cb.embedding[sub.s * 8 + 1 : sub.s * 8 + 8]),
      x -> (x[1]::DOUBLE - x[2]::DOUBLE)^2)) AS d2
  FROM v, sub, cb
), a AS (
  SELECT vec_id, s, code,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s
                            ORDER BY d2, code) AS rn
  FROM d
)
SELECT vec_id, s AS subspace, code FROM a WHERE rn = 1
""")
def pq_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (operators/embedding.py pq_train/
    pq_encode): 64-dim embeddings -> 8 subspace codes against a
    DETERMINISTIC first-16-subvector codebook (method='first' — the
    oracle replays the same argmin in SQL; the kmeans codebooks used in
    production follow the identical encode path, recall-tested in
    pytest). The encode is the distributed part — one vectorized numpy
    pass per Arrow batch over a broadcast codebook, turning a raw fp32
    embedding lake into m small codes per row (16-64x smaller), which is
    what makes exhaustive ADC scans of a 100 TB corpus feasible."""
    from .operators import embedding as EMB

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    books = EMB.pq_train(emb.orderBy("vec_id"), "v", m=8, k=16,
                         sample_rows=16, method="first")
    enc = EMB.pq_encode(emb.where(F.col("vec_id") < 300), "vec_id", "v",
                        books)
    return enc.select(
        "vec_id", F.posexplode("codes").alias("subspace", "code"))


@query("pq_search", """
WITH cb AS (
  SELECT vec_id AS code, embedding FROM embeddings WHERE vec_id < 16
), v AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
), q AS (
  SELECT vec_id AS q_id, embedding FROM embeddings
  WHERE vec_id >= 300 AND vec_id < 310
), sub AS (SELECT s FROM UNNEST(range(0, 8)) t(s)),
d AS (
  SELECT v.vec_id, sub.s, cb.code,
    list_sum(list_transform(
      list_zip(v.embedding[sub.s * 8 + 1 : sub.s * 8 + 8],
               cb.embedding[sub.s * 8 + 1 : sub.s * 8 + 8]),
      x -> (x[1]::DOUBLE - x[2]::DOUBLE)^2)) AS d2
  FROM v, sub, cb
), codes AS (
  SELECT vec_id, s, code FROM (
    SELECT vec_id, s, code, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                               ORDER BY d2, code) AS rn
    FROM d) WHERE rn = 1
), lut AS (
  SELECT q.q_id, sub.s, cb.code,
    list_sum(list_transform(
      list_zip(q.embedding[sub.s * 8 + 1 : sub.s * 8 + 8],
               cb.embedding[sub.s * 8 + 1 : sub.s * 8 + 8]),
      x -> (x[1]::DOUBLE - x[2]::DOUBLE)^2)) AS d2
  FROM q, sub, cb
), adc AS (
  SELECT l.q_id, c.vec_id AS neighbor_id,
         list_sum(list(l.d2 ORDER BY l.s)) AS adc
  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
  GROUP BY 1, 2
), r AS (
  SELECT q_id, neighbor_id, adc, ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY adc, neighbor_id) AS "rank"
  FROM adc
)
SELECT q_id, neighbor_id, ROUND(adc, 6) AS adc_dist, "rank" AS rank
FROM r WHERE "rank" <= 3
""")
def pq_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k search over PQ codes (operators/embedding.py
    pq_knn_join): per query ONE m x K lookup table of exact
    query-to-centroid distances, every index row scored by m table
    lookups — no decode, no full-dim math against the corpus. Same
    deterministic 'first' codebooks as pq_encode so the oracle replays
    the encode argmin AND the ADC sum in SQL (production kmeans
    codebooks follow the identical search path, recall-tested in
    pytest)."""
    from .operators import embedding as EMB

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    books = EMB.pq_train(emb.orderBy("vec_id"), "v", m=8, k=16,
                         sample_rows=16, method="first")
    codes = EMB.pq_encode(emb.where(F.col("vec_id") < 300), "vec_id", "v",
                          books)
    qs = emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 310)) \
        .select(F.col("vec_id").alias("q_id"), "v")
    out = EMB.pq_knn_join(qs, "q_id", "v", codes, "vec_id", "codes",
                          books, k=3)
    return out.select("q_id", "neighbor_id",
                      _r(F.col("adc_dist")).alias("adc_dist"), "rank")


@query("contamination_report", r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0
), bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
), bg AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1) + 1),
    i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i, i + 2), ' ')
  ))) AS g FROM bench
), dgl AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1) + 1),
    i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i, i + 2), ' ')
  )) AS gs FROM corpus
), dg AS (
  SELECT doc_id, unnest(gs) AS g FROM dgl
), hits AS (
  SELECT dg.doc_id, COUNT(*) AS n FROM dg JOIN bg USING (g) GROUP BY 1
), per AS (
  SELECT dgl.doc_id, len(gs)::BIGINT AS n_grams,
         COALESCE(hits.n, 0)::BIGINT AS n_hit
  FROM dgl LEFT JOIN hits ON dgl.doc_id = hits.doc_id
)
SELECT CAST(FLOOR(ROUND(n_hit::DOUBLE / n_grams, 4) * 10) AS INT) AS band,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(AVG(n_hit::DOUBLE / n_grams), 6) AS mean_frac
FROM per GROUP BY 1
""")
def contamination_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded contamination profile (operators/text.
    contamination_report): per-doc benchmark-overlap fractions,
    summarized into tenth-bands (band = floor(frac·10)) with doc counts
    and mean fraction — the report that separates incidental 2% overlap
    from wholesale eval leakage before choosing a gate threshold."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    rep = T.contamination_report(corpus, "doc_id", "text", bench, "text",
                                 n_gram=3)
    frac = F.col("n_contaminated_grams") / F.col("n_grams")
    return (rep.groupBy(F.floor(F.col("overlap_frac") * 10).cast("int")
                        .alias("band"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 _r(F.avg(frac)).alias("mean_frac")))


@query("semantic_decontaminate", """
WITH bench AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20
), corpus AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings WHERE vec_id >= 20
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(list_zip(embedding,
                                 range(1, len(embedding) + 1)),
                        x -> CASE WHEN x[2] = 1
                                  THEN x[1]::DOUBLE * 1.05
                                  ELSE x[1]::DOUBLE END) AS v
  FROM embeddings WHERE vec_id < 20
), sims AS (
  SELECT c.vec_id,
    list_sum(list_transform(list_zip(c.v, b.embedding),
             x -> x[1] * x[2]::DOUBLE))
    / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
       * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x))))
      AS cos
  FROM corpus c, bench b
)
SELECT vec_id, ROUND(MAX(cos), 6) AS max_sim
FROM sims GROUP BY vec_id HAVING MAX(cos) >= 0.5
""")
def semantic_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: flag corpus items whose embedding is
    too close to any benchmark item — catches the paraphrased test-set
    leakage that exact n-gram decontamination (the `decontaminate`
    query) misses. Composition of the existing ANN machinery
    (operators/knn.radius_join, cosine metric, broadcast benchmark
    index): benchmark sets are tiny by nature, so the scan is one
    broadcast pass over the corpus — the same shape at 100 TB. The
    oracle is the exact all-pairs max-cosine (affordable at test
    scale)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    bench = emb.where(F.col("vec_id") < 20)
    # corpus = the rest + PLANTED paraphrase-level contamination
    # (benchmark vectors with component 0 scaled 1.05x, cosine ~0.999 —
    # the leakage exact n-gram matching cannot see)
    planted = bench.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda x, i: F.when(i == 0, x * 1.05)
                    .otherwise(x)).alias("v"))
    corpus = emb.where(F.col("vec_id") >= 20).unionByName(planted)
    pairs = K.radius_join(corpus, "vec_id", "v", bench, "vec_id", "v",
                          radius=0.5, metric="cosine")
    # cosine DISTANCE <= 0.5  <=>  similarity >= 0.5
    return pairs.groupBy("vec_id").agg(
        _r(F.max(F.lit(1.0) - F.col("dist"))).alias("max_sim"))


@query("bpe_tokenize_oracle", """
SELECT * FROM (VALUES
  (1, 3, 'low est</w> low</w>'),
  (2, 2, 'newest</w> newest</w>'),
  (3, 6, 'n ew </w> w i dest</w>'),
  (4, 11, 'u n s e e n </w> x y z </w>')
) AS t(case_id, n_tokens, tokens)
""")
def bpe_tokenize_oracle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE tokenization pinned to hand-derived literals
    (operators/bpe.py): merges trained on the Sennrich et al. (2016)
    textbook corpus (low/lower/newest/widest), then the distributed
    encode applied to held-out strings — subword reuse ('lowest' =
    low + est</w>), whole-word merges, character fallback for unseen
    words. Training is driver-side on a bounded sample (how production
    tokenizers are built); ENCODING is the corpus-scale part: broadcast
    rank table, one Arrow pass, per-batch word memoization riding
    Zipf's law."""
    import pandas as pd

    from .operators import bpe as B

    corpus = (["low "] * 5 + ["lower "] * 2 + ["newest "] * 6
              + ["widest "] * 3)
    train = spark.createDataFrame(
        pd.DataFrame({"id": range(len(corpus)), "text": corpus}))
    merges = B.bpe_train(train.orderBy("id"), "text", n_merges=10)
    test = spark.createDataFrame(pd.DataFrame({
        "case_id": [1, 2, 3, 4],
        "text": ["lowest low", "newest newest", "new widest",
                 "unseen xyz"]}))
    enc = B.bpe_encode(test, "case_id", "text", merges, with_tokens=True)
    return enc.select(
        "case_id", "n_tokens",
        F.array_join("tokens", " ").alias("tokens"))


@query("curation_pipeline_v2", rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
  FROM documents
), wins AS (
  SELECT doc_id, array_to_string(w[i : i + 12], ' ') AS g
  FROM toks, UNNEST(range(1, len(w) - 11)) AS t(i)
  WHERE len(w) >= 13
), dupg AS (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM wins)
  GROUP BY g HAVING COUNT(*) >= 2
), perdoc AS (
  SELECT w.doc_id, COUNT(*) AS nw,
         SUM(CASE WHEN d.g IS NULL THEN 0 ELSE 1 END) AS nd
  FROM wins w LEFT JOIN dupg d USING (g) GROUP BY w.doc_id
), tq AS (
  SELECT doc_id, len(text) AS n,
         string_split_regex(trim(text), '\s+') AS sp
  FROM documents
), m AS (
  SELECT doc_id, n,
    len(list_filter(sp, x -> lower(x) IN ({_SW_SQL})))::DOUBLE / len(sp) AS swr,
    list_aggregate(list_transform(sp, x -> len(x)), 'sum')::DOUBLE / len(sp) AS mtl,
    (n - len(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE / n AS pr
  FROM tq
), q AS (
  SELECT doc_id, (
    (CASE WHEN n >= 100 AND n <= 20000 THEN 1.0 WHEN n >= 30 THEN 0.5 ELSE 0.0 END)
    + (CASE WHEN swr >= 0.1 AND swr <= 0.7 THEN 1.0 ELSE 0.0 END)
    + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.0 END)
    + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)
  ) / 4.0 AS quality FROM m
), keep0 AS (
  SELECT d.doc_id, d.lang, d.text
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  LEFT JOIN perdoc p ON p.doc_id = d.doc_id
  WHERE q.quality >= 0.75
    AND COALESCE(p.nd::DOUBLE / p.nw, 0.0) < 0.5
), cnt AS (
  SELECT lang, COUNT(*)::DOUBLE AS c FROM keep0 GROUP BY lang
), ws AS (
  SELECT SUM(SQRT(c)) AS wsum, SUM(c) AS total FROM cnt
), rates AS (
  SELECT lang, LEAST(1.0, total * (SQRT(c) / wsum) / c) AS r
  FROM cnt, ws
), kept AS (
  SELECT k.doc_id, k.lang, k.text FROM keep0 k JOIN rates USING (lang)
  WHERE (k.doc_id * 2654435761) % 10000 < r * 10000
)
SELECT lang, COUNT(*) AS n_docs,
       SUM(len(string_split_regex(trim(text), '\s+')))::BIGINT AS n_tokens
FROM kept GROUP BY lang
""")
def curation_pipeline_v2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 curation chain as ONE composed plan: duplicated-span
    gate (dup_span_stats — drop documents that are mostly cross-corpus
    repeated spans) → quality gate → temperature mixture resample on
    language (mixture_sample, alpha=0.5 over the post-filter counts) →
    per-language token accounting. Every stage is individually oracled
    (`dup_spans`, `text_quality`, `mixture_resample`, `token_stats`);
    this pins their composition, including the operator-boundary
    subtleties (docs shorter than the span window pass the gate with
    dup fraction 0)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    # filter on the RAW count ratio, not the 4-dp display rounding —
    # a 0.49997 document must land on the same side in both engines
    spans = T.dup_span_stats(docs, "doc_id", "text", n=13) \
        .select("doc_id",
                (F.col("n_dup_windows") / F.col("n_windows"))
                .alias("__ratio"))
    from ._utils import pin

    gated = (docs
             .join(spans, "doc_id", "left")
             .where(F.coalesce(F.col("__ratio"), F.lit(0.0)) < 0.5)
             .where(T.quality_score("text") >= 0.75))
    # mixture_sample's rate-fit collects per-language counts, then the
    # final agg re-reads the gate — pin so the span join runs once
    gated = pin(gated)
    mixed = SMP.mixture_sample(gated, "doc_id", "lang", alpha=0.5)
    return mixed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).cast("long").alias("n_tokens"))


# =============================================== vocab mining / splits / LM gate

@query("top_ngrams", r"""
WITH t AS (
  SELECT source, unnest(list_transform(
           range(1, greatest(len(w) - 1, 0) + 1),
           i -> array_to_string(w[i:i+1], ' '))) AS term
  FROM (SELECT source, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents)
), c AS (
  SELECT source, term, COUNT(*) AS cnt FROM t GROUP BY source, term
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY cnt DESC, term) AS rank
  FROM c
)
SELECT source, term, cnt, rank FROM r WHERE rank <= 5
""")
def top_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (operators/retrieval.top_terms): the 5 most
    frequent word bigrams per source — vocabulary truncation and
    per-domain content profiling. The n-gram expansion is one JVM
    transform (no UDF), the count is ONE map-side-combinable shuffle on
    (source, term), the top-k a window hash-partitioned on source.
    Ties break by term ASC so the result is total-ordered."""
    docs = load_table(spark, sf_dir, "documents")
    return R.top_terms(docs, "text", n=2, k=5, by="source")


@query("group_split", f"""
WITH h AS (
  SELECT source, n_chars,
         (list_reduce(list_prepend(0, list_transform(
            string_split(source, ''), c -> ascii(c))),
            (a, b) -> (a * 31 + b) % 1000003) % 10000 * 2654435761) % 10000
         AS gb
  FROM documents
), lab AS (
  SELECT CASE WHEN gb < 8000 THEN 'train'
              WHEN gb < 9000 THEN 'val' ELSE 'test' END AS split,
         source, n_chars
  FROM h
)
SELECT split, COUNT(*) AS n, COUNT(DISTINCT source) AS n_groups,
       SUM(n_chars)::BIGINT AS sum_chars
FROM lab GROUP BY split
""")
def group_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (functions/sample.
    split_by_group): the split is keyed on the GROUP (source) hash, so
    every document of a host lands on the same side — near-dup clusters
    and hosts must not straddle the eval boundary or the eval set leaks
    training text. Pure scan-side expression (no shuffle before the
    audit agg); the polynomial ascii hash + Fibonacci scramble is
    engine-reproducible, which is what the oracle replays."""
    docs = load_table(spark, sf_dir, "documents")
    out = SMP.split_by_group(docs, "source", [0.8, 0.1, 0.1],
                             ["train", "val", "test"])
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("source").alias("n_groups"),
        F.sum("n_chars").alias("sum_chars"))


@query("perplexity_gate", r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
  FROM documents
), big AS (
  SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM (
    SELECT doc_id, unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg
    FROM toks)
), uni AS (
  SELECT w1, COUNT(*) AS c1 FROM (SELECT unnest(w) AS w1 FROM toks)
  GROUP BY w1
), v AS (SELECT COUNT(*) AS v FROM uni
), bi AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
), ce AS (
  SELECT doc_id,
         ROUND(-AVG(ln((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS ce
  FROM big JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
  GROUP BY doc_id
), r AS (
  SELECT doc_id, ce, RANK() OVER (ORDER BY ce) AS rk,
         COUNT(*) OVER () AS n
  FROM ce
)
SELECT COUNT(*) AS n_kept, ROUND(AVG(ce), 6) AS avg_ce,
       ROUND(MAX(ce), 6) AS max_ce
FROM r WHERE rk <= FLOOR(0.9 * n)
""")
def perplexity_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style perplexity quality gate: score every document's
    cross-entropy under the corpus-trained bigram LM (operators/
    retrieval.bigram_lm_score), then keep the most fluent 90% by EXACT
    global quantile (functions/sample.filter_by_global_quantile — the
    two-pass range-bucket rank plan, no single-partition sort). The
    cross-entropy is rounded to 6 dp BEFORE ranking so the cut point is
    engine-stable (ranking a raw double would let a last-ulp divergence
    flip rows at the boundary)."""
    from ._utils import pin

    docs = load_table(spark, sf_dir, "documents")
    # pin the LM scores: the global-quantile rank plan reads its input
    # twice (range sketch + ranked pass) and would re-train/re-score the
    # whole bigram pipeline each time
    scored = pin(R.bigram_lm_score(docs, "doc_id", "text", add_k=0.5)
                 .select("doc_id", F.round("cross_entropy", 6).alias("ce")))
    kept = SMP.filter_by_global_quantile(scored, "ce", q=0.9,
                                         keep="bottom")
    return kept.agg(F.count(F.lit(1)).alias("n_kept"),
                    _r(F.avg("ce")).alias("avg_ce"),
                    _r(F.max("ce")).alias("max_ce"))


@query("kmeans", """
WITH v AS (
  SELECT vec_id, list_transform(embedding, y -> y::DOUBLE) AS ve
  FROM embeddings WHERE vec_id < 300
), c0 AS (
  SELECT vec_id::INT AS c, ve AS ce FROM v WHERE vec_id < 8
), a0 AS (
  SELECT vec_id, c FROM (
    SELECT v.vec_id, c0.c, ROW_NUMBER() OVER (PARTITION BY v.vec_id
      ORDER BY list_sum(list_transform(list_zip(v.ve, c0.ce),
                        x -> (x[1] - x[2]) ^ 2)), c0.c) AS rn
    FROM v CROSS JOIN c0) WHERE rn = 1
), c1 AS (
  SELECT c0.c, COALESCE(n.ce, c0.ce) AS ce FROM c0 LEFT JOIN (
    SELECT c, list(m ORDER BY pos) AS ce FROM (
      SELECT a0.c, t.pos, AVG(v.ve[t.pos]) AS m
      FROM a0 JOIN v USING (vec_id) CROSS JOIN unnest(range(1, 65)) t(pos)
      GROUP BY a0.c, t.pos) GROUP BY c) n USING (c)
), a1 AS (
  SELECT vec_id, c FROM (
    SELECT v.vec_id, c1.c, ROW_NUMBER() OVER (PARTITION BY v.vec_id
      ORDER BY list_sum(list_transform(list_zip(v.ve, c1.ce),
                        x -> (x[1] - x[2]) ^ 2)), c1.c) AS rn
    FROM v CROSS JOIN c1) WHERE rn = 1
), c2 AS (
  SELECT c1.c, COALESCE(n.ce, c1.ce) AS ce FROM c1 LEFT JOIN (
    SELECT c, list(m ORDER BY pos) AS ce FROM (
      SELECT a1.c, t.pos, AVG(v.ve[t.pos]) AS m
      FROM a1 JOIN v USING (vec_id) CROSS JOIN unnest(range(1, 65)) t(pos)
      GROUP BY a1.c, t.pos) GROUP BY c) n USING (c)
), a2 AS (
  SELECT vec_id, c FROM (
    SELECT v.vec_id, c2.c, ROW_NUMBER() OVER (PARTITION BY v.vec_id
      ORDER BY list_sum(list_transform(list_zip(v.ve, c2.ce),
                        x -> (x[1] - x[2]) ^ 2)), c2.c) AS rn
    FROM v CROSS JOIN c2) WHERE rn = 1
)
SELECT vec_id, c AS cluster FROM a2
""")
def kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (operators/cluster.kmeans_fit/kmeans_assign):
    k=8, TWO full Lloyd iterations over the embeddings, then the score
    pass — assignment is a vectorized numpy argmin per Arrow batch
    against broadcast centroids (no shuffle), the update is per-batch
    partial sufficient statistics + one O(k·dim·partitions) groupBy.
    Deterministic by construction (init='first' = the 8 lowest-id
    vectors, argmin ties to the lowest cluster), so the oracle replays
    init, both iterations (empty clusters COALESCE to their previous
    centroid), and the final argmin entirely in SQL."""
    from .operators import cluster as CL

    emb = load_table(spark, sf_dir, "embeddings") \
        .where(F.col("vec_id") < 300) \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    C = CL.kmeans_fit(emb, "vec_id", "v", k=8, n_iter=2, init="first")
    out = CL.kmeans_assign(emb, "vec_id", "v", C)
    return out.select("vec_id", "cluster")


@query("unicode_clean", """
WITH p AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' ma' || chr(195) || chr(177) || 'ana'
                      WHEN doc_id % 7 = 3 THEN chr(65533)
                      ELSE '' END AS raw,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' cafe' || chr(769) ELSE '' END AS dec
  FROM documents
), t AS (
  SELECT doc_id, raw, dec, nfc_normalize(dec) AS norm,
         CASE WHEN doc_id % 7 = 0
              THEN replace(raw, chr(195) || chr(177), chr(241))
              ELSE raw END AS fixed,
         length(regexp_extract_all(raw,
                chr(194) || '|' || chr(195))) AS moji,
         length(regexp_extract_all(raw, chr(65533))) AS rep
  FROM p
)
SELECT COUNT(*) AS n_docs,
       COUNT(CASE WHEN norm <> dec THEN 1 END) AS n_norm_changed,
       SUM(length(norm))::BIGINT AS sum_norm_len,
       COUNT(CASE WHEN fixed <> raw THEN 1 END) AS n_repaired,
       SUM(length(fixed))::BIGINT AS sum_fixed_len,
       SUM(moji)::BIGINT AS n_mojibake, SUM(rep)::BIGINT AS n_replacement
FROM t
""")
def unicode_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode corpus hygiene (operators/text.py normalize_unicode /
    fix_double_encoded / encoding_artifact_counts): the corpus gets
    planted decomposed sequences (e + combining acute, doc_id%5) and
    mojibake / replacement-char damage (doc_id%7 classes, disjoint);
    NFC normalization and the latin-1->utf-8 re-decode repair must fix
    exactly the planted rows and fix-point everything else. Artifact
    counts are pure JVM regexp_count (no UDF); the two repairs are
    Arrow-batch pandas UDFs (Spark has no ICU normalizer). The oracle
    replays NFC natively (DuckDB nfc_normalize) and the re-decode as
    the literal byte-sequence replacement it performs on this corpus
    (base text is ASCII — verified: zero non-ASCII rows)."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" ma\u00c3\u00b1ana"))
         .when(F.col("doc_id") % 7 == 3, F.lit("\ufffd"))
         .otherwise(F.lit("")))
    dec = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" cafe\u0301"))
         .otherwise(F.lit("")))
    t = docs.select(
        raw.alias("raw"), dec.alias("dec"),
        T.normalize_unicode(dec, "NFC").alias("norm"),
        T.fix_double_encoded(raw).alias("fixed"),
        T.encoding_artifact_counts(raw).alias("arts"))
    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("norm") != F.col("dec"), 1))
         .alias("n_norm_changed"),
        F.sum(F.length("norm")).alias("sum_norm_len"),
        F.count(F.when(F.col("fixed") != F.col("raw"), 1))
         .alias("n_repaired"),
        F.sum(F.length("fixed")).alias("sum_fixed_len"),
        F.sum(F.col("arts.mojibake_lead")).alias("n_mojibake"),
        F.sum(F.col("arts.replacement")).alias("n_replacement"))



@query("gopher_gate", r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w,
         string_split(text, chr(10)) AS ls
  FROM documents
), m AS (
  SELECT doc_id,
    len(w) AS nw,
    list_sum(list_transform(w, x -> length(x)))::DOUBLE
      / len(w) AS mwl,
    len(regexp_extract_all(text, '#'))
      + len(regexp_extract_all(text, '\.\.\.'))
      + len(regexp_extract_all(text, '\x{2026}')) AS sym,
    len(ls) AS nl,
    len(list_filter(ls, x -> regexp_matches(x,
        '^\s*[-*\x{2022}]'))) AS bullet,
    len(list_filter(ls, x -> regexp_matches(x,
        '(\.\.\.|\x{2026})\s*$'))) AS ell,
    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
    len(list_filter(list_transform(w, x -> lower(x)), x -> list_contains(
        ['the','and','of','to','is','in','that','it','for','was'], x)))
      AS swh
  FROM w
), r AS (
  SELECT doc_id,
    nw >= 50 AND nw <= 100000 AS r_wc,
    mwl >= 3.0 AND mwl <= 10.0 AS r_mwl,
    CASE WHEN nw > 0 THEN sym::DOUBLE / nw <= 0.1 ELSE FALSE END AS r_sym,
    CASE WHEN nl > 0 THEN bullet::DOUBLE / nl <= 0.9 ELSE TRUE END AS r_bul,
    CASE WHEN nl > 0 THEN ell::DOUBLE / nl <= 0.3 ELSE TRUE END AS r_ell,
    CASE WHEN nw > 0 THEN alpha::DOUBLE / nw >= 0.8 ELSE FALSE END AS r_alpha,
    swh >= 2 AS r_sw
  FROM m
)
SELECT COUNT(*) AS n_docs,
  COUNT(CASE WHEN r_wc THEN 1 END) AS n_wc,
  COUNT(CASE WHEN r_mwl THEN 1 END) AS n_mwl,
  COUNT(CASE WHEN r_sym THEN 1 END) AS n_sym,
  COUNT(CASE WHEN r_bul THEN 1 END) AS n_bul,
  COUNT(CASE WHEN r_ell THEN 1 END) AS n_ell,
  COUNT(CASE WHEN r_alpha THEN 1 END) AS n_alpha,
  COUNT(CASE WHEN r_sw THEN 1 END) AS n_sw,
  COUNT(CASE WHEN r_wc AND r_mwl AND r_sym AND r_bul AND r_ell
              AND r_alpha AND r_sw THEN 1 END) AS n_pass
FROM r
""")
def gopher_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based Gopher quality gate (operators/text.gopher_rules —
    the Rae et al. 2021 heuristics): seven named boolean rules per
    document as pure JVM expressions (the gate runs at scan speed and
    pushes into the parquet read), aggregated to per-rule pass counts +
    the AND gate. The oracle re-derives every rule in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(T.gopher_rules("text").alias("g"))
    f = lambda n: F.count(F.when(F.col("g").getField(n), 1))  # noqa: E731
    return g.agg(
        F.count(F.lit(1)).alias("n_docs"),
        f("word_count").alias("n_wc"), f("mean_word_len").alias("n_mwl"),
        f("symbol_to_word").alias("n_sym"), f("bullet_start").alias("n_bul"),
        f("ellipsis_end").alias("n_ell"), f("alpha_word").alias("n_alpha"),
        f("stopword_hits").alias("n_sw"), f("pass").alias("n_pass"))


@query("script_profile", r"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 1
              THEN chr(1087) || chr(1088) || chr(1080) || chr(1074)
                   || chr(1077) || chr(1090) || ' 123'
              WHEN doc_id % 3 = 2
              THEN chr(20320) || chr(22909) || chr(19990) || ' ok'
              ELSE text END AS t
  FROM documents
), c AS (
  SELECT doc_id,
    len(regexp_extract_all(t, '[A-Za-z\x{00c0}-\x{024f}]')) AS latin,
    len(regexp_extract_all(t, '[\x{0400}-\x{04ff}]')) AS cyrillic,
    len(regexp_extract_all(t, '[\x{0370}-\x{03ff}]')) AS greek,
    len(regexp_extract_all(t, '[\x{0600}-\x{06ff}]')) AS arabic,
    len(regexp_extract_all(t,
        '[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]')) AS cjk,
    len(regexp_extract_all(t, '[0-9]')) AS digit
  FROM p
), d AS (
  SELECT *, CASE
    WHEN latin >= greatest(cyrillic, greek, arabic, cjk) THEN 'latin'
    WHEN cyrillic >= greatest(greek, arabic, cjk) THEN 'cyrillic'
    WHEN greek >= greatest(arabic, cjk) THEN 'greek'
    WHEN arabic >= cjk THEN 'arabic' ELSE 'cjk' END AS dominant
  FROM c
)
SELECT dominant, COUNT(*) AS n, SUM(latin)::BIGINT AS sum_latin,
       SUM(cyrillic)::BIGINT AS sum_cyr, SUM(cjk)::BIGINT AS sum_cjk,
       SUM(digit)::BIGINT AS sum_digit
FROM d GROUP BY dominant
""")
def script_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script profiling (operators/text.script_profile): planted
    Cyrillic / CJK documents on disjoint doc classes (replacing the
    text so the planted script genuinely dominates), per-script char
    counts as pure JVM regexp_count, dominant-script argmax with fixed
    tie order. The base corpus stays latin-dominant; the planted rows
    must classify by their script counts (the oracle replays the same
    RE2-class counts — every base doc has latin text, so 'und' never
    appears and the CASE ladder is the exact tie rule)."""
    docs = load_table(spark, sf_dir, "documents")
    t = (F.when(F.col("doc_id") % 3 == 1, F.lit("привет 123"))
         .when(F.col("doc_id") % 3 == 2, F.lit("你好世 ok"))
         .otherwise(F.col("text")))
    s = docs.select(T.script_profile(t).alias("s"))
    g = lambda n: F.col("s").getField(n)  # noqa: E731
    return s.groupBy(g("dominant").alias("dominant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(g("latin")).alias("sum_latin"),
        F.sum(g("cyrillic")).alias("sum_cyr"),
        F.sum(g("cjk")).alias("sum_cjk"),
        F.sum(g("digit")).alias("sum_digit"))



@query("curation_pipeline_v3", r"""
WITH p AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0
              THEN replace(text || ' ma' || chr(195) || chr(177) || 'ana',
                           chr(195) || chr(177), chr(241))
              ELSE text END AS t
  FROM documents
), w0 AS (
  SELECT doc_id, source, t, string_split_regex(trim(t), '\s+') AS w,
         string_split(t, chr(10)) AS ls
  FROM p
), m AS (
  SELECT doc_id, source, t, w, len(w) AS nw,
    list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w) AS mwl,
    len(regexp_extract_all(t, '#'))
      + len(regexp_extract_all(t, '\.\.\.'))
      + len(regexp_extract_all(t, '\x{2026}')) AS sym,
    len(ls) AS nl,
    len(list_filter(ls, x -> regexp_matches(x, '^\s*[-*\x{2022}]'))) AS bul,
    len(list_filter(ls, x -> regexp_matches(x,
        '(\.\.\.|\x{2026})\s*$'))) AS ell,
    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
    len(list_filter(list_transform(w, x -> lower(x)), x -> list_contains(
        ['the','and','of','to','is','in','that','it','for','was'], x)))
      AS swh
  FROM w0
), g AS (
  SELECT doc_id, source, t FROM m
  WHERE nw >= 50 AND nw <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
    AND sym::DOUBLE / nw <= 0.1 AND bul::DOUBLE / nl <= 0.9
    AND ell::DOUBLE / nl <= 0.3 AND alpha::DOUBLE / nw >= 0.8
    AND swh >= 2
), toks AS (
  SELECT doc_id, string_split_regex(trim(lower(t)), '\s+') AS w FROM g
), big AS (
  SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM (
    SELECT doc_id, unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg
    FROM toks)
), uni AS (
  SELECT w1, COUNT(*) AS c1 FROM (SELECT unnest(w) AS w1 FROM toks)
  GROUP BY w1
), v AS (SELECT COUNT(*) AS v FROM uni
), bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
), ce AS (
  SELECT doc_id, ROUND(-AVG(ln((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS ce
  FROM big JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
  GROUP BY doc_id
), r AS (
  SELECT doc_id, RANK() OVER (ORDER BY ce) AS rk, COUNT(*) OVER () AS n
  FROM ce
), kept AS (
  SELECT g.doc_id, g.source, g.t FROM g JOIN r USING (doc_id)
  WHERE rk <= FLOOR(0.9 * n)
), lab AS (
  SELECT CASE WHEN gb < 8000 THEN 'train'
              WHEN gb < 9000 THEN 'val' ELSE 'test' END AS split, t
  FROM (
    SELECT t,
      (list_reduce(list_prepend(0, list_transform(
         string_split(source, ''), c -> ascii(c))),
         (a, b) -> (a * 31 + b) % 1000003) % 10000 * 2654435761) % 10000
      AS gb
    FROM kept)
)
SELECT split, COUNT(*) AS n_docs,
       SUM(len(string_split_regex(trim(t), '\s+')))::BIGINT AS n_tokens
FROM lab GROUP BY split
""")
def curation_pipeline_v3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 curation chain as ONE composed plan: mojibake repair
    (fix_double_encoded on planted damage) → Gopher rule gate
    (gopher_rules.pass, scan-side) → perplexity gate (bigram LM trained
    on the GATED corpus, exact bottom-90% global-quantile cut on the
    6dp-rounded cross-entropy) → leakage-safe group split on source →
    per-split doc/token accounting. Every stage is individually oracled
    (`unicode_clean`, `gopher_gate`, `perplexity_gate`, `group_split`);
    this pins their composition — including that the LM trains on the
    post-gate corpus, not the raw one, and that repaired text flows
    through the token statistics."""
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "source", "text")
    raw = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" maÃ±ana"))
         .otherwise(F.lit("")))
    base = docs.select("doc_id", "source",
                       T.fix_double_encoded(raw).alias("t"))
    # the gated frame feeds the LM train, the score join, and the final
    # accounting — pin it so the repair UDF + rule gate run ONCE, not
    # once per consumer (functions/_utils.pin, LRU-released by bench)
    from ._utils import pin

    g = pin(base.where(T.gopher_rules("t").getField("pass")))
    # pin the LM scores too (r16, §5 — the same fix perplexity_gate
    # carries): the global-quantile rank plan reads its input twice
    # (range sketch + ranked pass) and re-trained/re-scored the whole
    # bigram pipeline each time — measured 3.6 s → ~2.1 s for the
    # lm+cut phase at sf0.1. The pinned frame is (doc_id, ce) — narrow,
    # per-doc, disk-spillable.
    scored = pin(R.bigram_lm_score(g, "doc_id", "t", add_k=0.5)
                 .select("doc_id", F.round("cross_entropy", 6).alias("ce")))
    kept_ids = SMP.filter_by_global_quantile(
        scored, "ce", q=0.9, keep="bottom").select("doc_id")
    kept = g.join(kept_ids, "doc_id")
    out = kept.withColumn(
        "split", SMP.group_split_col("source", [0.8, 0.1, 0.1],
                                     ["train", "val", "test"]))
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("t")).cast("long").alias("n_tokens"))



@query("ivfpq_search", """
WITH cb AS (
  SELECT vec_id AS code, embedding FROM embeddings WHERE vec_id < 16
), cents AS (
  SELECT vec_id AS cell, list_transform(embedding, y -> y::DOUBLE) AS ce
  FROM embeddings WHERE vec_id < 4
), v AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
), q AS (
  SELECT vec_id AS q_id, embedding FROM embeddings
  WHERE vec_id >= 300 AND vec_id < 310
), vc AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, cents.cell, ROW_NUMBER() OVER (PARTITION BY v.vec_id
      ORDER BY list_sum(list_transform(list_zip(v.embedding, cents.ce),
               x -> (x[1]::DOUBLE - x[2]) ^ 2)), cents.cell) AS rn
    FROM v CROSS JOIN cents) WHERE rn = 1
), sub AS (SELECT s FROM UNNEST(range(0, 8)) t(s)),
d AS (
  SELECT v.vec_id, sub.s, cb.code,
    list_sum(list_transform(
      list_zip(v.embedding[sub.s * 8 + 1 : sub.s * 8 + 8],
               cb.embedding[sub.s * 8 + 1 : sub.s * 8 + 8]),
      x -> (x[1]::DOUBLE - x[2]::DOUBLE)^2)) AS d2
  FROM v, sub, cb
), codes AS (
  SELECT vec_id, s, code FROM (
    SELECT vec_id, s, code, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                               ORDER BY d2, code) AS rn
    FROM d) WHERE rn = 1
), qc AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, cents.cell, ROW_NUMBER() OVER (PARTITION BY q.q_id
      ORDER BY list_sum(list_transform(list_zip(q.embedding, cents.ce),
               x -> (x[1]::DOUBLE - x[2]) ^ 2)), cents.cell) AS rn
    FROM q CROSS JOIN cents) WHERE rn <= 2
), lut AS (
  SELECT q.q_id, sub.s, cb.code,
    list_sum(list_transform(
      list_zip(q.embedding[sub.s * 8 + 1 : sub.s * 8 + 8],
               cb.embedding[sub.s * 8 + 1 : sub.s * 8 + 8]),
      x -> (x[1]::DOUBLE - x[2]::DOUBLE)^2)) AS d2
  FROM q, sub, cb
), adc AS (
  SELECT qc.q_id, vc.vec_id AS neighbor_id,
         list_sum(list(l.d2 ORDER BY l.s)) AS adc
  FROM qc JOIN vc USING (cell)
  JOIN codes c ON c.vec_id = vc.vec_id
  JOIN lut l ON l.q_id = qc.q_id AND l.s = c.s AND l.code = c.code
  GROUP BY 1, 2
), r AS (
  SELECT q_id, neighbor_id, adc, ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY adc, neighbor_id) AS "rank"
  FROM adc
)
SELECT q_id, neighbor_id, ROUND(adc, 6) AS adc_dist, "rank" AS rank
FROM r WHERE "rank" <= 3
""")
def ivfpq_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search (operators/embedding.ivfpq_knn_join — the FAISS
    IVFADC architecture without residual encoding): queries coarse-
    route to their 2 nearest of 4 'first' centroids, then ADC-score
    only the PQ codes in those cells and take top-3. Every stage is
    deterministic ('first' centroids + 'first' codebooks), so the
    oracle replays cell assignment, encode argmin, query routing, and
    the ADC sum entirely in SQL. The composition is what makes a
    100 TB embedding lake searchable: ~nprobe/C of the corpus touched
    per query, over codes 32x smaller than the raw vectors."""
    from .operators import embedding as EMB
    from .operators import knn as K

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    idx = emb.where(F.col("vec_id") < 300)
    cents = K.ivf_centroids(emb, "vec_id", "v", n_centroids=4,
                            method="first")
    books = EMB.pq_train(emb.orderBy("vec_id"), "v", m=8, k=16,
                         sample_rows=16, method="first")
    qs = emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 310)) \
        .select(F.col("vec_id").alias("q_id"), "v")
    out = EMB.ivfpq_knn_join(qs, "q_id", "v", idx, "vec_id", "v",
                             books, cents, nprobe=2, k=3)
    return out.select("q_id", "neighbor_id",
                      _r(F.col("adc_dist")).alias("adc_dist"), "rank")



@query("pmi_collocations", r"""
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
), big AS (
  SELECT bg[1] AS w1, bg[2] AS w2 FROM (
    SELECT unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg FROM toks)
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
), c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY w1
), c2 AS (SELECT w2, SUM(c12) AS c2 FROM c12 GROUP BY w2
), t AS (SELECT SUM(c12) AS t FROM c12
), s AS (
  SELECT w1, w2, c12,
         ROUND(ln(c12 * t / (c1 * c2)), 6) AS pmi
  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN t
  WHERE c12 >= 5
), r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM s
)
SELECT w1, w2, c12, pmi, rank FROM r WHERE rank <= 20
""")
def pmi_collocations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information
    (operators/retrieval.pmi_bigrams): top-20 adjacent word pairs by
    PMI with a min-count floor of 5 — the phrase-vocabulary seed pass.
    Corpus read once; marginals derive from the bigram counts; global
    top-k is TakeOrderedAndProject on the 6dp-ROUNDED score (ranking a
    raw double would let last-ulp divergence reorder the boundary)."""
    docs = load_table(spark, sf_dir, "documents")
    return R.pmi_bigrams(docs, "text", k=20, min_count=5)



@query("normalized_dedup", r"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000,
         upper(substr(text, 1, 1)) || substr(text, 2) || '  '
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 400000, text || ' extra tail words here'
  FROM documents WHERE doc_id % 5 = 0
), n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
         AS norm
  FROM u
), keep AS (
  SELECT MIN(doc_id) AS doc_id FROM n GROUP BY norm
)
SELECT COUNT(*) AS n_kept, SUM(doc_id)::BIGINT AS sum_id
FROM keep
""")
def normalized_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style fuzzy-exact dedup (operators/dedup.normalized_dedup):
    the corpus is unioned with case/whitespace-perturbed copies (must
    dedup away, min id wins) and genuinely-extended copies (must
    survive). Canonicalization = NFC + lowercase + whitespace collapse
    riding the scan; dedup is the usual 8-byte hash shuffle. The
    oracle replays the same normalization with DuckDB natives."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pert = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.upper(F.substring("text", 1, 1)),
                 F.expr("substr(text, 2)"), F.lit("  ")).alias("text"))
    ext = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail words here"))
        .alias("text"))
    u = docs.unionByName(pert).unionByName(ext)
    kept = D.normalized_dedup(u, "text", "doc_id")
    return kept.agg(F.count(F.lit(1)).alias("n_kept"),
                    F.sum("doc_id").alias("sum_id"))



@query("kmeans_inertia", """
WITH v AS (
  SELECT vec_id, list_transform(embedding, y -> y::DOUBLE) AS ve
  FROM embeddings WHERE vec_id < 300
), c0 AS (
  SELECT vec_id::INT AS c, ve AS ce FROM v WHERE vec_id < 8
), a0 AS (
  SELECT vec_id, c FROM (
    SELECT v.vec_id, c0.c, ROW_NUMBER() OVER (PARTITION BY v.vec_id
      ORDER BY list_sum(list_transform(list_zip(v.ve, c0.ce),
                        x -> (x[1] - x[2]) ^ 2)), c0.c) AS rn
    FROM v CROSS JOIN c0) WHERE rn = 1
), c1 AS (
  SELECT c0.c, COALESCE(n.ce, c0.ce) AS ce FROM c0 LEFT JOIN (
    SELECT c, list(m ORDER BY pos) AS ce FROM (
      SELECT a0.c, t.pos, AVG(v.ve[t.pos]) AS m
      FROM a0 JOIN v USING (vec_id) CROSS JOIN unnest(range(1, 65)) t(pos)
      GROUP BY a0.c, t.pos) GROUP BY c) n USING (c)
), a1 AS (
  SELECT vec_id, c FROM (
    SELECT v.vec_id, c1.c, ROW_NUMBER() OVER (PARTITION BY v.vec_id
      ORDER BY list_sum(list_transform(list_zip(v.ve, c1.ce),
                        x -> (x[1] - x[2]) ^ 2)), c1.c) AS rn
    FROM v CROSS JOIN c1) WHERE rn = 1
), c2 AS (
  SELECT c1.c, COALESCE(n.ce, c1.ce) AS ce FROM c1 LEFT JOIN (
    SELECT c, list(m ORDER BY pos) AS ce FROM (
      SELECT a1.c, t.pos, AVG(v.ve[t.pos]) AS m
      FROM a1 JOIN v USING (vec_id) CROSS JOIN unnest(range(1, 65)) t(pos)
      GROUP BY a1.c, t.pos) GROUP BY c) n USING (c)
), a2 AS (
  SELECT vec_id, c, d2 FROM (
    SELECT v.vec_id, c2.c,
      list_sum(list_transform(list_zip(v.ve, c2.ce),
               x -> (x[1] - x[2]) ^ 2)) AS d2,
      ROW_NUMBER() OVER (PARTITION BY v.vec_id
        ORDER BY list_sum(list_transform(list_zip(v.ve, c2.ce),
                          x -> (x[1] - x[2]) ^ 2)), c2.c) AS rn
    FROM v CROSS JOIN c2) WHERE rn = 1
)
SELECT c AS cluster, COUNT(*) AS n, ROUND(SUM(d2), 4) AS inertia
FROM a2 GROUP BY c
""")
def kmeans_inertia_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster inertia (operators/cluster.kmeans_inertia — the
    elbow statistic for choosing k): same deterministic 2-iteration fit
    as the `kmeans` query, then size + summed within-cluster squared
    distance per cluster, one combinable agg over the assign pass. The
    oracle extends the kmeans replay by carrying each row's winning
    distance into the final aggregate (rounded at 4 dp — the sum of
    ~40 float64 distances differs across engines in the last ulp)."""
    from .operators import cluster as CL

    emb = load_table(spark, sf_dir, "embeddings") \
        .where(F.col("vec_id") < 300) \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    C = CL.kmeans_fit(emb, "vec_id", "v", k=8, n_iter=2, init="first")
    stats = CL.kmeans_inertia(CL.kmeans_assign(emb, "vec_id", "v", C))
    return stats.select("cluster", "n",
                        F.round("inertia", 4).alias("inertia"))


@query("bloom_decontaminate", r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 7 != 0
), bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
), bg AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1) + 1),
    i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i, i + 2), ' ')
  ))) AS g FROM bench
), dg AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1) + 1),
    i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i, i + 2), ' ')
  ))) AS g FROM corpus
), hits AS (
  SELECT dg.doc_id, COUNT(*) AS n FROM dg JOIN bg USING (g) GROUP BY 1
)
SELECT c.doc_id,
       COALESCE(hits.n, 0) AS n_contaminated_grams,
       COALESCE(hits.n, 0) >= 1 AS contaminated
FROM corpus c LEFT JOIN hits ON c.doc_id = hits.doc_id
""")
def bloom_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (operators/text.py
    bloom_decontaminate): the benchmark gram set folds into a 16 KB
    bitset literal tested scan-side, so only Bloom-positive grams reach
    the exact semi-join — no false negatives + exact confirm means the
    output is row-identical to plain `decontaminate`, hence the same
    exact-overlap oracle (on a % 7 split so the two queries don't alias
    each other's result)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    bench = docs.where(F.col("doc_id") % 7 == 0)
    out = T.bloom_decontaminate(corpus, "doc_id", "text", bench, "text",
                                n_gram=3, min_overlap=1)
    return out.select("doc_id", "n_contaminated_grams", "contaminated")


@query("dsir_sample", r"""
WITH tok AS (
  SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\s+'))) AS w
  FROM documents
), tgt AS (
  SELECT lower(unnest(string_split_regex(trim(text), '\s+'))) AS w
  FROM documents WHERE lang = 'en'
), rc AS (
  SELECT w, COUNT(*) AS cr FROM tok GROUP BY 1
), tc AS (
  SELECT w, COUNT(*) AS ct FROM tgt GROUP BY 1
), vocab AS (
  SELECT COALESCE(rc.w, tc.w) AS w,
         COALESCE(cr, 0) AS cr, COALESCE(ct, 0) AS ct
  FROM rc FULL OUTER JOIN tc ON rc.w = tc.w
), tot AS (
  SELECT SUM(cr)::DOUBLE AS nr, SUM(ct)::DOUBLE AS nt,
         COUNT(*)::DOUBLE AS v
  FROM vocab
), lr AS (
  SELECT w, LN((ct + 1.0) / (nt + v)) - LN((cr + 1.0) / (nr + v)) AS lr
  FROM vocab CROSS JOIN tot
), dw AS (
  SELECT d.doc_id, COALESCE(w.n_tokens, 0) AS n_tokens,
         ROUND(COALESCE(w.log_weight, 0.0), 6) AS log_weight
  FROM documents d LEFT JOIN (
    SELECT tok.doc_id, COUNT(*) AS n_tokens, SUM(lr.lr) AS log_weight
    FROM tok JOIN lr USING (w) GROUP BY 1) w USING (doc_id)
)
SELECT doc_id, n_tokens, log_weight
FROM dw ORDER BY log_weight DESC, doc_id LIMIT 50
""")
def dsir_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/text.py dsir_log_weights;
    Xie et al. 2023): raw corpus = all documents, target domain = the
    English slice; keep the 50 docs whose smoothed unigram-LM
    log-ratio is highest. The vocab log-ratio table broadcasts; the
    oracle replays the same estimator relationally. Both engines rank
    on the ROUNDED weight (the rank-on-computed-double rule — a
    last-ulp difference at the rank-50 cut must not flip membership);
    the raw-weight `dsir_sample` top-n wrapper is pytest-pinned."""
    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    w = T.dsir_log_weights(docs, "doc_id", "text", target, "text")
    return (w.select("doc_id", "n_tokens",
                     _r(F.col("log_weight")).alias("log_weight"))
             .orderBy(F.col("log_weight").desc(), F.col("doc_id"))
             .limit(50))


@query("ngram_diversity", r"""
WITH toks AS (
  SELECT source, lower(unnest(string_split_regex(trim(text), '\s+'))) AS tok
  FROM documents
), t AS (
  SELECT source, COUNT(*) AS total_tokens,
         COUNT(DISTINCT tok) AS distinct_tokens
  FROM toks GROUP BY 1
), gr AS (
  SELECT source, unnest(list_transform(
    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
    i -> array_to_string(list_slice(string_split_regex(trim(text), '\s+'), i, i + 2), ' ')
  )) AS g FROM documents
), g2 AS (
  SELECT source, COUNT(*) AS total_ngrams, COUNT(DISTINCT g) AS distinct_ngrams
  FROM gr GROUP BY 1
), d AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
)
SELECT d.source, n_docs, total_tokens, distinct_tokens,
       ROUND(distinct_tokens::DOUBLE / total_tokens, 6) AS token_ttr,
       total_ngrams, distinct_ngrams,
       ROUND(distinct_ngrams::DOUBLE / total_ngrams, 6) AS ngram_diversity
FROM d JOIN t USING (source) JOIN g2 USING (source)
""")
def ngram_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus diversity profile (operators/text.py
    corpus_ngram_diversity): distinct-vs-total token and 3-gram ratios
    — the source-triage scan that flags template/synthetic sources
    before mixing."""
    docs = load_table(spark, sf_dir, "documents")
    out = T.corpus_ngram_diversity(docs, "source", "text", n=3)
    return out.select(
        "source", "n_docs", "total_tokens", "distinct_tokens",
        _r(F.col("token_ttr")).alias("token_ttr"),
        "total_ngrams", "distinct_ngrams",
        _r(F.col("ngram_diversity")).alias("ngram_diversity"))
