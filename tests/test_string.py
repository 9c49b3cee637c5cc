"""String similarity vs known values (mirrors reference tests/test_string.py
which checks against python reference impls / published examples)."""

import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.functions import string_ as S


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


CASES = [
    ("kitten", "sitting"),
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("apple", "aple"),
    ("", "abc"),
    ("identical", "identical"),
    ("ca", "abc"),
]


def test_levenshtein_and_friends(spark):
    df = _pairs(spark, CASES)
    rows = df.select(
        "a", "b",
        S.str_leven("a", "b").alias("lev"),
        S.str_d_leven("a", "b").alias("dlev"),
        S.str_osa("a", "b").alias("osa"),
        S.str_jaro("a", "b").alias("jaro"),
        S.str_jw("a", "b").alias("jw"),
        S.str_lcs_subseq("a", "b").alias("lcs"),
    ).collect()
    by = {(r["a"], r["b"]): r for r in rows}
    assert by[("kitten", "sitting")]["lev"] == 3
    # classic: full damerau('ca','abc') = 2, OSA = 3
    assert by[("ca", "abc")]["dlev"] == 2
    assert by[("ca", "abc")]["osa"] == 3
    assert by[("martha", "marhta")]["jaro"] == pytest.approx(0.9444444444, rel=1e-8)
    assert by[("martha", "marhta")]["jw"] == pytest.approx(0.9611111111, rel=1e-8)
    assert by[("dixon", "dicksonx")]["jw"] == pytest.approx(0.8133333333, rel=1e-8)
    assert by[("", "abc")]["jaro"] == 0.0
    assert by[("identical", "identical")]["jw"] == 1.0
    assert by[("kitten", "sitting")]["lcs"] == 4


def test_ngram_sims(spark):
    df = _pairs(spark, [("apple", "aple")])
    row = df.select(
        S.str_jaccard("a", "b", 2).alias("jac"),
        S.str_sorensen_dice("a", "b", 2).alias("dice"),
        S.str_overlap_coeff("a", "b", 2).alias("ov"),
        S.str_tversky_sim("a", "b", 0.5, 0.5, 2).alias("tv"),
    ).first()
    # apple: {ap,pp,pl,le}; aple: {ap,pl,le} → inter=3, union=4
    assert row["jac"] == pytest.approx(3 / 4)
    assert row["dice"] == pytest.approx(2 * 3 / 7)
    assert row["ov"] == pytest.approx(1.0)
    assert row["tv"] == pytest.approx(3 / (3 + 0.5 * 1 + 0.5 * 0))


def test_hamming(spark):
    df = _pairs(spark, [("karolin", "kathrin"), ("abc", "ab")])
    rows = df.select("a", S.str_hamming("a", "b").alias("h"),
                     S.str_hamming("a", "b", pad=True).alias("hp")).collect()
    by = {r["a"]: r for r in rows}
    assert by["karolin"]["h"] == 3
    assert by["abc"]["h"] is None
    assert by["abc"]["hp"] == 1


def test_case_conversions(spark):
    df = spark.range(1)
    row = df.select(
        S.to_snake_case(F.lit("someCamelCase")).alias("s"),
        S.to_camel_case(F.lit("some_snake_case")).alias("c"),
        S.to_pascal_case(F.lit("some_snake_case")).alias("p"),
        S.to_constant_case(F.lit("someCamelCase")).alias("k"),
    ).first()
    assert row["s"] == "some_camel_case"
    assert row["c"] == "someSnakeCase"
    assert row["p"] == "SomeSnakeCase"
    assert row["k"] == "SOME_CAMEL_CASE"


def test_cleaning(spark):
    df = spark.range(1)
    row = df.select(
        S.replace_non_ascii(F.lit("héllo wörld")).alias("ascii"),
        S.remove_diacritics(F.lit("café naïve")).alias("dia"),
        S.normalize_whitespace(F.lit("a   b\t\tc")).alias("ws"),
        S.map_words(F.lit("the cat sat"), {"cat": "dog"}).alias("mw"),
        S.extract_numbers(F.lit("x1 y2.5"), join_by="|").alias("nums"),
    ).first()
    assert row["ascii"] == "hllo wrld"
    assert row["dia"] == "cafe naive"
    assert row["ws"] == "a b c"
    assert row["mw"] == "the dog sat"
    assert row["nums"] == "1|2.5"


def test_fuzz_and_vocab(spark):
    df = _pairs(spark, [("apple", "apples"), ("zzz", "apple")])
    rows = df.select("a", S.str_fuzz("a", "b").alias("f")).collect()
    by = {r["a"]: r["f"] for r in rows}
    assert by["apple"] == pytest.approx(1 - 1 / 11)  # one insertion
    assert by["zzz"] < 0.3

    near = S.str_nearest(df, "a", ["apples", "zebra"]).collect()
    byn = {r["a"]: r["nearest"] for r in near}
    assert byn["apple"] == "apples"


def test_vocab_metrics_match_scalar_kernels(spark):
    """similar_to_vocab / str_nearest with dlv/jw/osa/hamming agree with
    the per-row scalar reference kernels over a random corpus."""
    import random

    from polars_ds_extension_spark.functions.string_ import (
        _dleven, _jw, _osa)

    rng = random.Random(7)
    vocab = ["spark", "batch", "query", "table"]
    words = ["spark", "sprak", "quary", "tabel", "zzz", "batching",
             "a", "", "qu"]
    for _ in range(40):
        words.append("".join(rng.choice("abqrstk")
                             for _ in range(rng.randint(0, 9))))
    df = spark.createDataFrame([(w,) for w in words], "a string")

    def sim(metric, a, v):
        if metric == "jw":
            return _jw(a, v)
        d = _dleven(a, v) if metric == "dlv" else _osa(a, v)
        return 1.0 - d / max(len(a), len(v), 1)

    for metric in ("dlv", "jw", "osa"):
        got = {r["a"]: r["nearest"] for r in S.str_nearest(
            df, "a", vocab, metric=metric).collect()}
        thr = {r["a"]: r["ok"] for r in df.select("a", S.similar_to_vocab(
            "a", vocab, 0.5, metric=metric, strategy="any").alias("ok"))
            .collect()}
        for w in words:
            sims = [(sim(metric, w, v), v) for v in vocab]
            assert got[w] == max(sims)[1], (metric, w, sims)
            assert thr[w] == (max(s for s, _ in sims) >= 0.5), (metric, w)

    # hamming nearest: pad=True totalizes unequal lengths
    def ham(a, v):
        n = min(len(a), len(v))
        return sum(x != y for x, y in zip(a, v)) + abs(len(a) - len(v))

    got = {r["a"]: r["nearest"] for r in S.str_nearest(
        df, "a", vocab, metric="hamming").collect()}
    for w in words:
        dists = [(ham(w, v), v) for v in vocab]
        assert got[w] == min(dists)[1], (w, dists)


def test_dleven_batch_matches_scalar_and_differs_from_osa(spark):
    """Batch Lowrance-Wagner == per-row reference kernel, including the
    CA/ABC case where full DL (2) differs from OSA (3)."""
    import random

    from polars_ds_extension_spark.functions import string_ as S
    from polars_ds_extension_spark.functions.string_ import _dleven, _lcs_substr

    rng = random.Random(11)
    pairs = [("CA", "ABC"), ("", ""), ("", "abc"), ("ab", "ba"),
             ("abcdef", "abcfad")]
    for _ in range(60):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        a = "".join(rng.choice("abcd") for _ in range(n1))
        b = "".join(rng.choice("abcd") for _ in range(n2))
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a string, b string")
    from pyspark.sql import functions as F
    got = df.select("a", "b", S.str_d_leven("a", "b").alias("d"),
                    S.str_lcs_substr("a", "b").alias("sub")).collect()
    for r in got:
        assert r["d"] == _dleven(r["a"], r["b"]), (r["a"], r["b"])
        assert r["sub"] == _lcs_substr(r["a"], r["b"]), (r["a"], r["b"])
    by_pair = {(r["a"], r["b"]): r["d"] for r in got}
    assert by_pair[("CA", "ABC")] == 2  # OSA would say 3
