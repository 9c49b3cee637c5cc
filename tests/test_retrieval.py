"""Unit tests for operators/retrieval.py (TF-IDF / BM25 / bigram LM)
against straight-line numpy/pure-Python reimplementations on a tiny
hand-readable corpus."""

import math

import pytest

from polars_ds_extension_spark.operators import retrieval as R

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cats and dogs and cats"),
    (4, "spark shuffles the big table"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _toks():
    return {i: t.lower().split() for i, t in CORPUS}


def test_doc_frequency(spark, docs):
    got = {r["term"]: r["df"] for r in
           R.doc_frequency(docs, "doc_id", "text").collect()}
    toks = _toks()
    for term in {w for ws in toks.values() for w in ws}:
        assert got[term] == sum(term in ws for ws in toks.values()), term


def test_tfidf_topk_matches_reference_formula(spark, docs):
    toks = _toks()
    n = len(toks)
    df_ = {t: sum(t in ws for ws in toks.values())
           for ws in toks.values() for t in ws}
    expected = {}
    for i, ws in toks.items():
        scored = sorted(
            (((ws.count(t) / len(ws))
              * (math.log((n + 1) / (df_[t] + 1)) + 1.0)), t)
            for t in set(ws))
        # top-1: highest score, ties lexicographically smallest term
        best = sorted(scored, key=lambda p: (-p[0], p[1]))[0]
        expected[i] = best
    got = R.tfidf_topk(docs, "doc_id", "text", k=1).collect()
    assert len(got) == n
    for r in got:
        exp_score, exp_term = expected[r["doc_id"]]
        assert r["term"] == exp_term
        assert r["tfidf"] == pytest.approx(exp_score, rel=1e-12)


def test_bm25_matches_reference_formula(spark, docs):
    k1, b = 1.2, 0.75
    toks = _toks()
    n = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    q = ["cat", "sat", "table"]
    expected = {}
    for i, ws in toks.items():
        s = 0.0
        for t in q:
            tc = ws.count(t)
            if tc == 0:
                continue
            dfq = sum(t in w2 for w2 in toks.values())
            idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
            s += idf * tc * (k1 + 1) / (tc + k1 * (1 - b + b * len(ws) / avgdl))
        if s > 0:
            expected[i] = s
    got = {r["doc_id"]: r["bm25"]
           for r in R.bm25_score(docs, "doc_id", "text", q).collect()}
    assert set(got) == set(expected)
    for i, s in expected.items():
        assert got[i] == pytest.approx(s, rel=1e-12)


def test_bigram_lm_cross_entropy(spark, docs):
    add_k = 0.5
    toks = _toks()
    uni, bi = {}, {}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b2 in zip(ws, ws[1:]):
            bi[(a, b2)] = bi.get((a, b2), 0) + 1
    v = len(uni)
    expected = {}
    for i, ws in toks.items():
        lps = [math.log((bi[(a, b2)] + add_k) / (uni[a] + add_k * v))
               for a, b2 in zip(ws, ws[1:])]
        expected[i] = (-sum(lps) / len(lps), len(lps))
    got = {r["doc_id"]: (r["cross_entropy"], r["n_bigrams"])
           for r in R.bigram_lm_score(docs, "doc_id", "text",
                                      add_k=add_k).collect()}
    assert set(got) == set(expected)
    for i, (ce, nb) in expected.items():
        assert got[i][1] == nb
        assert got[i][0] == pytest.approx(ce, rel=1e-12)


def test_bigram_lm_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens here")], ["doc_id", "text"])
    got = {r["doc_id"] for r in
           R.bigram_lm_score(docs, "doc_id", "text").collect()}
    assert got == {2}


def test_bigram_lm_vocab_cap_unk(spark, docs):
    """vocab_size=K: top-K unigrams by (count DESC, token ASC) survive,
    everything else maps to <unk> BEFORE bigram counting — checked
    against a straight-line reimplementation of the capped model."""
    add_k, K = 0.5, 3
    toks = _toks()
    uni_raw = {}
    for ws in toks.values():
        for w in ws:
            uni_raw[w] = uni_raw.get(w, 0) + 1
    kept = {w for w, _ in sorted(uni_raw.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:K]}
    mapped = {i: [w if w in kept else "<unk>" for w in ws]
              for i, ws in toks.items()}
    uni, bi = {}, {}
    for ws in mapped.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b2 in zip(ws, ws[1:]):
            bi[(a, b2)] = bi.get((a, b2), 0) + 1
    v = len(uni)
    expected = {}
    for i, ws in mapped.items():
        lps = [math.log((bi[(a, b2)] + add_k) / (uni[a] + add_k * v))
               for a, b2 in zip(ws, ws[1:])]
        expected[i] = -sum(lps) / len(lps)
    got = {r["doc_id"]: r["cross_entropy"]
           for r in R.bigram_lm_score(docs, "doc_id", "text", add_k=add_k,
                                      vocab_size=K).collect()}
    assert set(got) == set(expected)
    for i, ce in expected.items():
        assert got[i] == pytest.approx(ce, rel=1e-12)


def test_bigram_lm_cap_above_vocab_is_identity(spark, docs):
    base = {r["doc_id"]: r["cross_entropy"]
            for r in R.bigram_lm_score(docs, "doc_id", "text",
                                       vocab_size=None).collect()}
    capped = {r["doc_id"]: r["cross_entropy"]
              for r in R.bigram_lm_score(docs, "doc_id", "text",
                                         vocab_size=65536).collect()}
    # identity up to float-sum merge order: the capped plan joins the
    # broadcast vocab, so its per-doc ln-P partial sums can combine in
    # a different order than the uncapped plan's (last-ulp wobble that
    # surfaces when AQE coalesces differently, e.g. under load)
    assert set(base) == set(capped)
    for k, v in base.items():
        assert capped[k] == pytest.approx(v, rel=1e-12, abs=1e-12)
