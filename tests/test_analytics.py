"""Tests for the round-12b additions: bloom decontamination, DSIR
importance resampling, corpus diversity, funnel / cohort analytics,
blocked fuzzy linkage, and the key-skew diagnostic."""

import datetime
import math

import pytest
from pyspark.sql import Row, functions as F

from polars_ds_extension_spark.operators import linkage as L
from polars_ds_extension_spark.operators import temporal as TP
from polars_ds_extension_spark.operators import text as T
from polars_ds_extension_spark.partition import key_skew_profile


# ------------------------------------------------- bloom decontamination

def _mini_corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "one two three four five six"),
        (3, "alpha beta gamma zeta eta"),       # shares 'alpha beta gamma'
        (4, "totally unrelated words here now"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bench(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta nothing")], ["bid", "btext"])


def test_bloom_decontaminate_matches_exact(spark):
    corpus, bench = _mini_corpus(spark), _bench(spark)
    exact = T.decontaminate(corpus, "doc_id", "text", bench, "btext") \
        .select("doc_id", "n_contaminated_grams", "contaminated")
    bloom = T.bloom_decontaminate(corpus, "doc_id", "text", bench, "btext") \
        .select("doc_id", "n_contaminated_grams", "contaminated")
    assert sorted(map(tuple, exact.collect())) == \
        sorted(map(tuple, bloom.collect()))


def test_bloom_decontaminate_tiny_filter_still_exact(spark):
    # 64 bits with 2 hashes over ~6 grams -> heavy false-positive rate;
    # the exact confirm join must still produce the exact answer.
    corpus, bench = _mini_corpus(spark), _bench(spark)
    exact = T.decontaminate(corpus, "doc_id", "text", bench, "btext") \
        .select("doc_id", "n_contaminated_grams").collect()
    bloom = T.bloom_decontaminate(
        corpus, "doc_id", "text", bench, "btext", num_bits=64) \
        .select("doc_id", "n_contaminated_grams").collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, bloom))


def test_bloom_decontaminate_rejects_unaligned_bits(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        T.bloom_decontaminate(_mini_corpus(spark), "doc_id", "text",
                              _bench(spark), "btext", num_bits=100)


def test_bloom_words_bit_layout():
    words = T._bloom_words([0, 63, 64, 127], 128)
    # both words carry bit 0 and bit 63; bit 63 flips the Java long sign
    expected = (1 | (1 << 63)) - (1 << 64)
    assert words == [expected, expected]


# --------------------------------------------------------------------- DSIR

def test_dsir_log_weights_hand_computed(spark):
    corpus = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "fish fish fish")], ["doc_id", "text"])
    target = spark.createDataFrame([(9, "cat cat cat dog")], ["tid", "ttext"])
    out = {r["doc_id"]: r for r in
           T.dsir_log_weights(corpus, "doc_id", "text",
                              target, "ttext").collect()}
    # vocab = {cat, dog, fish}; raw counts 2/1/3 (N=6); target 3/1/0 (N=4)
    v, nr, nt = 3.0, 6.0, 4.0
    lr = {w: math.log((ct + 1) / (nt + v)) - math.log((cr + 1) / (nr + v))
          for w, cr, ct in [("cat", 2, 3), ("dog", 1, 1), ("fish", 3, 0)]}
    exp1 = 2 * lr["cat"] + lr["dog"]
    exp2 = 3 * lr["fish"]
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 3
    assert abs(out[1]["log_weight"] - exp1) < 1e-9
    assert abs(out[2]["log_weight"] - exp2) < 1e-9
    # doc 1 looks like the target; doc 2 does not
    assert out[1]["log_weight"] > 0 > out[2]["log_weight"]


def test_dsir_sample_top_n_deterministic(spark):
    corpus = spark.createDataFrame(
        [(i, "cat dog" if i % 2 else "fish fish") for i in range(10)],
        ["doc_id", "text"])
    target = spark.createDataFrame([(0, "cat dog cat")], ["tid", "ttext"])
    picked = [r["doc_id"] for r in
              T.dsir_sample(corpus, "doc_id", "text", target, "ttext",
                            n=3).collect()]
    assert picked == [1, 3, 5]  # equal weights tie-break on id


# --------------------------------------------------------- corpus diversity

def test_corpus_ngram_diversity_counts(spark):
    docs = spark.createDataFrame(
        [("a", "x y z x y z"), ("a", "x y z w p q"), ("b", "u v w t s r")],
        ["source", "text"])
    out = {r["source"]: r for r in
           T.corpus_ngram_diversity(docs, "source", "text", n=3).collect()}
    # source a: 12 tokens, 6 distinct; grams: doc1 has 4 (x y z, y z x,
    # z x y, x y z) -> 3 distinct; doc2 has 4 distinct; 'x y z' shared
    a = out["a"]
    assert (a["n_docs"], a["total_tokens"], a["distinct_tokens"]) == (2, 12, 6)
    assert (a["total_ngrams"], a["distinct_ngrams"]) == (8, 6)
    assert abs(a["ngram_diversity"] - 6 / 8) < 1e-12
    b = out["b"]
    assert (b["total_ngrams"], b["distinct_ngrams"]) == (4, 4)
    assert abs(b["token_ttr"] - 1.0) < 1e-12


# ---------------------------------------------------------------- funnel

def _ts(day, sec=0):
    return datetime.datetime(2024, 1, day, 0, 0, sec)


def test_funnel_ordered_semantics(spark):
    rows = [
        # u1 completes in order
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "buy", _ts(3)),
        # u2: buy BEFORE click -> reaches click only
        (2, "view", _ts(1)), (2, "buy", _ts(2)), (2, "click", _ts(3)),
        # u3: click only after view, no buy
        (3, "view", _ts(1)), (3, "click", _ts(5)),
        # u4: click with no prior view -> not even stage 0
        (4, "click", _ts(1)),
    ]
    ev = spark.createDataFrame(rows, ["u", "t", "ts"])
    out = {r["stage"]: r for r in
           TP.funnel(ev, "u", "t", "ts", ["view", "click", "buy"]).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 3
    assert out["buy"]["n_users"] == 1
    assert abs(out["buy"]["frac_of_first"] - 1 / 3) < 1e-12
    assert abs(out["buy"]["frac_of_prev"] - 1 / 3) < 1e-12
    assert out["view"]["frac_of_first"] == 1.0


def test_funnel_same_timestamp_counts(spark):
    ev = spark.createDataFrame(
        [(1, "a", _ts(1)), (1, "b", _ts(1))], ["u", "t", "ts"])
    out = {r["stage"]: r["n_users"]
           for r in TP.funnel(ev, "u", "t", "ts", ["a", "b"]).collect()}
    assert out == {"a": 1, "b": 1}  # >= allows equal-ts progression


def test_funnel_max_span_gates_late_stages(spark):
    ev = spark.createDataFrame(
        [(1, "a", _ts(1)), (1, "b", _ts(10)),
         (2, "a", _ts(1)), (2, "b", _ts(2))], ["u", "t", "ts"])
    out = {r["stage"]: r["n_users"]
           for r in TP.funnel(ev, "u", "t", "ts", ["a", "b"],
                              max_span=2 * 86400).collect()}
    assert out == {"a": 2, "b": 1}


def test_funnel_numeric_ts_and_validation(spark):
    ev = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 11.0), (2, "a", 10.0), (2, "b", 40.0)],
        ["u", "t", "ts"])
    out = {r["stage"]: r["n_users"]
           for r in TP.funnel(ev, "u", "t", "ts", ["a", "b"],
                              max_span=5).collect()}
    assert out == {"a": 2, "b": 1}
    with pytest.raises(ValueError, match="at least 2"):
        TP.funnel(ev, "u", "t", "ts", ["a"])


# ------------------------------------------------------------------ cohort

def test_cohort_retention_matrix(spark):
    rows = [
        (1, _ts(1)), (1, _ts(9)),            # cohort w0, active w0+w1
        (2, _ts(2)),                          # cohort w0, only w0
        (3, _ts(9)), (3, _ts(10)),            # cohort w1, only w1
    ]
    ev = spark.createDataFrame(rows, ["u", "ts"])
    out = {(r["cohort_period"], r["week_offset"]): r
           for r in TP.cohort_retention(ev, "u", "ts", 7).collect()}
    periods = sorted({c for c, _ in out})
    w0, w1 = periods
    assert out[(w0, 0)]["n_active"] == 2
    assert out[(w0, 0)]["cohort_size"] == 2
    assert out[(w0, 1)]["n_active"] == 1
    assert abs(out[(w0, 1)]["retention"] - 0.5) < 1e-12
    assert out[(w1, 0)]["n_active"] == 1
    assert (w1, 1) not in out
    with pytest.raises(ValueError, match="positive"):
        TP.cohort_retention(ev, "u", "ts", 0)


def test_cohort_retention_max_offset(spark):
    ev = spark.createDataFrame(
        [(1, _ts(1)), (1, _ts(9)), (1, _ts(23))], ["u", "ts"])
    out = TP.cohort_retention(ev, "u", "ts", 7, max_offset=1).collect()
    assert sorted(r["week_offset"] for r in out) == [0, 1]


# ----------------------------------------------------------------- linkage

def test_blocked_fuzzy_join_top1_and_threshold(spark):
    right = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "jonathan smyth"), (3, "zz zz")],
        ["rid", "rname"])
    left = spark.createDataFrame([(10, "jonathan smith")], ["lid", "lname"])
    block = lambda c: F.substring(c, 1, 4)  # noqa: E731
    allm = L.blocked_fuzzy_join(left, right, "lid", "rid", "lname", "rname",
                                block=block, threshold=0.9)
    got = {(r["lid"], r["rid"]) for r in allm.collect()}
    assert got == {(10, 1), (10, 2)}  # rid 3 blocked away
    top = L.blocked_fuzzy_join(left, right, "lid", "rid", "lname", "rname",
                               block=block, threshold=0.9, top1=True).collect()
    assert len(top) == 1 and top[0]["rid"] == 1 and top[0]["sim"] == 1.0
    with pytest.raises(ValueError, match="metric"):
        L.blocked_fuzzy_join(left, right, "lid", "rid", "lname", "rname",
                             block=block, metric="nope")


def test_blocked_fuzzy_join_levenshtein_metric(spark):
    right = spark.createDataFrame([(1, "abcd")], ["rid", "rname"])
    left = spark.createDataFrame([(10, "abcx")], ["lid", "lname"])
    out = L.blocked_fuzzy_join(
        left, right, "lid", "rid", "lname", "rname",
        block=lambda c: F.substring(c, 1, 2), threshold=0.5,
        metric="levenshtein").collect()
    assert len(out) == 1 and abs(out[0]["sim"] - 0.75) < 1e-12


# ---------------------------------------------------------------- key skew

def test_key_skew_profile_known_distribution(spark):
    rows = [(k,) for k, n in [("a", 6), ("b", 2), ("c", 2)] for _ in range(n)]
    out = key_skew_profile(spark.createDataFrame(rows, ["k"]), "k").collect()[0]
    assert out["n_keys"] == 3 and out["n_rows"] == 10
    assert out["max_cnt"] == 6
    assert abs(out["mean_cnt"] - 10 / 3) < 1e-12
    assert out["p50_cnt"] == 2.0
    assert abs(out["top1_share"] - 0.6) < 1e-12
    assert abs(out["skew_ratio"] - 1.8) < 1e-12


# ------------------------------------------------------- property tests

def test_bloom_decontaminate_equals_exact_property(spark):
    """Hypothesis over the Bloom prefilter contract: for RANDOM corpora
    and benchmark subsets, any filter size (down to a saturated 64-bit
    one) and hash count, bloom_decontaminate ≡ decontaminate row for
    row — no false negatives survive the exact confirm join."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    doc = st.lists(st.sampled_from(vocab), min_size=3, max_size=8) \
        .map(" ".join)

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(doc, min_size=2, max_size=8),
           bench=st.lists(doc, min_size=1, max_size=3),
           bits=st.sampled_from([64, 256, 4096]),
           hashes=st.integers(min_value=1, max_value=3))
    def check(docs, bench, bits, hashes):
        c = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
        b = spark.createDataFrame(list(enumerate(bench)), ["bid", "btext"])
        exact = T.decontaminate(c, "doc_id", "text", b, "btext") \
            .select("doc_id", "n_contaminated_grams").collect()
        bloom = T.bloom_decontaminate(
            c, "doc_id", "text", b, "btext",
            num_bits=bits, num_hashes=hashes) \
            .select("doc_id", "n_contaminated_grams").collect()
        assert sorted(map(tuple, exact)) == sorted(map(tuple, bloom))

    check()


def _funnel_brute(rows, stages, max_span=None):
    """Pure-python replay of funnel semantics: stage i = earliest
    stage-i event at-or-after stage i-1's time, within span of t0."""
    by_user = {}
    for u, ty, ts in rows:
        by_user.setdefault(u, []).append((ts, ty))
    counts = [0] * len(stages)
    for evs in by_user.values():
        t_prev = t0 = None
        for i, stg in enumerate(stages):
            cand = [ts for ts, ty in evs if ty == stg
                    and (t_prev is None or ts >= t_prev)
                    and (i == 0 or max_span is None or ts <= t0 + max_span)]
            if not cand:
                break
            t_prev = min(cand)
            if i == 0:
                t0 = t_prev
            counts[i] += 1
    return counts


def test_funnel_matches_brute_force_property(spark):
    """Hypothesis: the chained-join funnel equals a per-user python
    fold for random event streams (timestamp collisions included)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ev = st.tuples(st.integers(min_value=1, max_value=4),
                   st.sampled_from(["a", "b", "c"]),
                   st.integers(min_value=0, max_value=12).map(float))

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(ev, min_size=1, max_size=24),
           span=st.sampled_from([None, 3, 6]))
    def check(rows, span):
        df = spark.createDataFrame(rows, "u bigint, t string, ts double")
        got = {r["stage_idx"]: r["n_users"]
               for r in TP.funnel(df, "u", "t", "ts", ["a", "b", "c"],
                                  max_span=span).collect()}
        exp = _funnel_brute(rows, ["a", "b", "c"], span)
        assert [got[i] for i in range(3)] == exp

    check()


def test_cohort_retention_matches_replay_property(spark):
    """Hypothesis: the three-aggregate cohort matrix equals a python
    replay for random (user, day) activity."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ev = st.tuples(st.integers(min_value=1, max_value=5),
                   st.integers(min_value=1, max_value=27))

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(ev, min_size=1, max_size=30))
    def check(rows):
        data = [(u, datetime.datetime(2024, 1, d)) for u, d in rows]
        df = spark.createDataFrame(data, "u bigint, ts timestamp")
        got = {(r["cohort_period"], r["week_offset"]):
               (r["n_active"], r["cohort_size"])
               for r in TP.cohort_retention(df, "u", "ts", 7).collect()}
        # replay
        epoch = datetime.date(1970, 1, 1)
        per = {}
        for u, d in rows:
            p = (datetime.date(2024, 1, d) - epoch).days // 7
            per.setdefault(u, set()).add(p)
        first = {u: min(ps) for u, ps in per.items()}
        sizes = {}
        for u, c in first.items():
            sizes[c] = sizes.get(c, 0) + 1
        exp = {}
        for u, ps in per.items():
            for p in ps:
                key = (first[u], p - first[u])
                a, _ = exp.get(key, (0, 0))
                exp[key] = (a + 1, sizes[first[u]])
        assert got == exp

    check()


def test_dsir_weights_match_numpy_replay_property(spark):
    """Hypothesis: the broadcast-ratio-table DSIR weights equal a
    direct python computation of the smoothed unigram log-ratio."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vocab = ["u", "v", "w", "x"]
    doc = st.lists(st.sampled_from(vocab), min_size=1, max_size=6) \
        .map(" ".join)

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(doc, min_size=1, max_size=6),
           tgt=st.lists(doc, min_size=1, max_size=3))
    def check(docs, tgt):
        c = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
        t = spark.createDataFrame(list(enumerate(tgt)), ["tid", "ttext"])
        got = {r["doc_id"]: r["log_weight"]
               for r in T.dsir_log_weights(c, "doc_id", "text",
                                           t, "ttext").collect()}
        cr, ct = {}, {}
        for d in docs:
            for w in d.split():
                cr[w] = cr.get(w, 0) + 1
        for d in tgt:
            for w in d.split():
                ct[w] = ct.get(w, 0) + 1
        vocab_all = set(cr) | set(ct)
        nr, nt, v = sum(cr.values()), sum(ct.values()), len(vocab_all)
        lr = {w: math.log((ct.get(w, 0) + 1) / (nt + v))
              - math.log((cr.get(w, 0) + 1) / (nr + v)) for w in vocab_all}
        for i, d in enumerate(docs):
            exp = sum(lr[w] for w in d.split())
            assert abs(got[i] - exp) < 1e-9

    check()


# ------------------------------------------------------------------ zorder

def _z_ref(xs, bits=16):
    z = 0
    k = len(xs)
    for i in range(bits):
        for j, x in enumerate(xs):
            z |= ((x >> i) & 1) << (i * k + j)
    return z


def test_zorder_key_matches_reference(spark):
    from polars_ds_extension_spark.partition import zorder_key
    rows = [(0, 0), (3, 1), (7, 7), (65535, 0), (0, 65535),
            (12345, 54321), (1, 2)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _z_ref([x, y])
    # hand case: x=0b11 (even bits), y=0b01 (odd bits) -> 0b0111
    assert _z_ref([3, 1]) == 7
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([])


def test_zorder_three_columns_and_locality(spark):
    from polars_ds_extension_spark.partition import zorder_key
    rows = [(i, j, k) for i in range(4) for j in range(4) for k in range(2)]
    df = spark.createDataFrame(rows, "x bigint, y bigint, w bigint")
    got = {(r["x"], r["y"], r["w"]): r["z"] for r in df.select(
        "x", "y", "w", zorder_key(["x", "y", "w"], bits=4).alias("z"))
        .collect()}
    assert all(got[t] == _z_ref(list(t), bits=4) for t in got)
    # locality: all 8 cells of the (x<2, y<2, w<2) octant sort before
    # any cell with x>=2 and y>=2 (prefix bits dominate)
    octant = [got[(x, y, w)] for x in range(2) for y in range(2)
              for w in range(2)]
    far = [got[(x, y, w)] for x in range(2, 4) for y in range(2, 4)
           for w in range(2)]
    assert max(octant) < min(far)


def test_cluster_by_zorder_sorts_within_partitions(spark):
    from polars_ds_extension_spark.partition import (cluster_by_zorder,
                                                     zorder_key)
    rows = [(i % 37, (i * 7) % 41) for i in range(500)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    out = cluster_by_zorder(df, ["x", "y"], n_partitions=4)
    assert out.columns == ["x", "y"]  # helper column dropped
    assert out.count() == 500
    # every partition holds a contiguous, internally sorted z-range
    zs = out.select(zorder_key(["x", "y"]).alias("z")) \
        .rdd.glom().map(lambda p: [r["z"] for r in p]).collect()
    parts = [p for p in zs if p]
    for p in parts:
        assert p == sorted(p)
    bounds = sorted((min(p), max(p)) for p in parts)
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2


# ------------------------------------------------------- embedding drift

def test_embedding_group_stats_two_groups(spark):
    import numpy as np
    from polars_ds_extension_spark.operators import embedding as EMB
    rows = [(0, [1.0, 0.0]), (0, [1.0, 0.0]),
            (1, [0.0, 1.0]), (1, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "label bigint, v array<double>")
    out = {r["label"]: r for r in
           EMB.embedding_group_stats(df, "label", "v").collect()}
    glob = np.array([0.75, 0.5])
    c0, c1 = np.array([1.0, 0.0]), np.array([0.5, 1.0])
    gn = np.linalg.norm
    assert abs(out[0]["centroid_norm"] - 1.0) < 1e-9
    assert abs(out[1]["centroid_norm"] - gn(c1)) < 1e-9
    assert abs(out[0]["cos_centroid_global"]
               - glob[0] / (gn(glob) * 1.0)) < 1e-9
    assert abs(out[1]["cos_centroid_global"]
               - c1 @ glob / (gn(c1) * gn(glob))) < 1e-9
    exp_mcg0 = np.mean([np.array(v) @ glob / (gn(v) * gn(glob))
                        for v in ([1, 0], [1, 0])])
    assert abs(out[0]["mean_cos_global"] - exp_mcg0) < 1e-9
    assert out[0]["n"] == 2 and out[1]["n"] == 2
    with pytest.raises(ValueError, match="empty"):
        EMB.embedding_group_stats(df.where(F.col("label") > 9),
                                  "label", "v")


def test_fuzzy_dedup_clusters_and_singletons(spark):
    rows = [(1, "acme corp ltd"), (2, "acmi corp ltd"),   # one sub @ pos 4
            (3, "zz totally other"), (4, "acme corp ltd")]  # 4 = exact dup
    df = spark.createDataFrame(rows, "eid bigint, name string")
    # block on the stable suffix (" corp ltd"): 1/2/4 share it, 3 alone
    out = {r["eid"]: r["canonical"] for r in
           L.fuzzy_dedup(df, "eid", "name",
                         block=lambda c: F.substring(c, 5, 9),
                         threshold=0.9).collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 1}
    # block on the CORRUPTED prefix instead -> 2 lands in its own block
    # and stays singleton despite clearing the threshold: the documented
    # recall dial of blocked ER
    out2 = {r["eid"]: r["canonical"] for r in
            L.fuzzy_dedup(df, "eid", "name",
                          block=lambda c: F.substring(c, 1, 4),
                          threshold=0.9).collect()}
    assert out2 == {1: 1, 2: 2, 3: 3, 4: 1}


# --------------------------------------------- review-finding regressions

def test_word_ngrams_short_docs_empty_not_crash(spark):
    # sub-n-token docs used to make sequence(1,0) descend and
    # slice(w, 0, n) raise INVALID_PARAMETER_VALUE.START
    df = spark.createDataFrame(
        [("s", "one two"), ("s", "a"), ("s", "x y z w")],
        ["source", "text"])
    rows = {tuple(r["g"]) for r in
            df.select(T.word_ngrams_of("text", 3).alias("g")).collect()}
    assert () in rows and ("x y z", "y z w") in rows
    out = T.corpus_ngram_diversity(df, "source", "text", n=3).collect()
    assert out[0]["total_ngrams"] == 2  # only the 4-token doc contributes


def test_zorder_key_rejects_sign_bit_and_wraps(spark):
    from polars_ds_extension_spark.partition import zorder_key
    with pytest.raises(ValueError, match="sign bit"):
        zorder_key(["a", "b", "c", "d"])          # 16*4 = 64 > 63
    with pytest.raises(ValueError, match="sign bit"):
        zorder_key(["a", "b"], bits=32)           # 64 > 63
    zorder_key(["a", "b", "c", "d"], bits=15)     # 60 <= 63: fine


def test_fuzzy_dedup_rejects_string_ids(spark):
    df = spark.createDataFrame(
        [("a1", "acme corp"), ("a2", "acme corp")], ["eid", "name"])
    with pytest.raises(ValueError, match="integral id"):
        L.fuzzy_dedup(df, "eid", "name",
                      block=lambda c: F.substring(c, 1, 4))


def test_bloom_decontaminate_rejects_zero_hashes(spark):
    with pytest.raises(ValueError, match="num_hashes"):
        T.bloom_decontaminate(_mini_corpus(spark), "doc_id", "text",
                              _bench(spark), "btext", num_hashes=0)


def test_dsir_keeps_empty_token_docs(spark):
    corpus = spark.createDataFrame(
        [(1, "cat dog"), (2, None), (3, "   ")],
        "doc_id bigint, text string")
    target = spark.createDataFrame([(0, "cat")], ["tid", "ttext"])
    out = {r["doc_id"]: r for r in
           T.dsir_log_weights(corpus, "doc_id", "text",
                              target, "ttext").collect()}
    assert set(out) == {1, 2, 3}  # one row per corpus doc, always
    assert out[2]["n_tokens"] == 0 and out[2]["log_weight"] == 0.0


def test_cohort_retention_pre_epoch_floor(spark):
    ev = spark.createDataFrame(
        [(1, datetime.datetime(1969, 12, 30)),   # datediff -2 -> period -1
         (2, datetime.datetime(1970, 1, 2))],    # period 0
        "u bigint, ts timestamp")
    out = {r["cohort_period"]: r for r in
           TP.cohort_retention(ev, "u", "ts", 7).collect()}
    assert set(out) == {-1, 0}
    assert str(out[-1]["cohort_start"]) == "1969-12-25"


def test_embedding_group_stats_rejects_null_and_ragged(spark):
    from polars_ds_extension_spark.operators import embedding as EMB
    df_null = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None)], "label bigint, v array<double>")
    with pytest.raises(ValueError, match="NULL vectors"):
        EMB.embedding_group_stats(df_null, "label", "v")
    df_ragged = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0, 0.0])],
        "label bigint, v array<double>")
    with pytest.raises(ValueError, match="ragged"):
        EMB.embedding_group_stats(df_ragged, "label", "v")


def test_embedding_group_stats_rejects_null_elements(spark):
    # element-level NULLs (a dimension NULL in some rows) must raise
    # the descriptive error, not crash on float(None) (r12 advice)
    from polars_ds_extension_spark.operators import embedding as EMB
    df = spark.createDataFrame(
        [(0, [1.0, None]), (1, [0.5, None])],
        "label bigint, v array<double>")
    with pytest.raises(ValueError, match="NULL elements"):
        EMB.embedding_group_stats(df, "label", "v")


def test_fuzzy_dedup_accepts_column_id(spark):
    # a Column id — supported by to_col everywhere else — must pass the
    # integral-id validation via the analyzed schema (r12 advice: the
    # str-only dict(df.dtypes) lookup always raised)
    from polars_ds_extension_spark.operators import linkage as LK
    df = spark.createDataFrame(
        [(1, "alpha corp"), (2, "alpha corp."), (3, "zeta llc")],
        "rid bigint, nm string")
    out = LK.fuzzy_dedup(df, F.col("rid"), "nm",
                         block=lambda c: F.substring(c, 1, 2),
                         threshold=0.9)
    got = {r["rid"]: r["canonical"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 3}
