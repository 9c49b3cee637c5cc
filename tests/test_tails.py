"""Tests for ts/num tail operators: ar_coeffs, entropies, lempel_ziv,
pca, isotonic, rfft, nextafter, sampling, eda."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.functions import eda as E
from polars_ds_extension_spark.functions import num as N
from polars_ds_extension_spark.functions import sample as SMP
from polars_ds_extension_spark.functions import ts as TS

RNG = np.random.default_rng(11)


def _series_df(spark, x):
    return spark.createDataFrame(
        pd.DataFrame({"i": range(len(x)), "x": x}))


def test_ar_coeffs_recovers_ar2(spark):
    # simulate AR(2) with known phi
    n, phi1, phi2 = 4000, 0.5, -0.3
    x = np.zeros(n)
    eps = RNG.normal(0, 1, n)
    for t in range(2, n):
        x[t] = phi1 * x[t - 1] + phi2 * x[t - 2] + eps[t]
    out = TS.query_ar_coeffs(_series_df(spark, x), "x", "i", p=2).first()
    # numpy Yule-Walker mirror
    dx = x - x.mean()
    c = [np.sum(dx[k:] * dx[:n - k]) / n for k in range(3)]
    r1, r2 = c[1] / c[0], c[2] / c[0]
    want1 = r1 * (1 - r2) / (1 - r1 ** 2)
    want2 = (r2 - r1 ** 2) / (1 - r1 ** 2)
    assert out["phi_1"] == pytest.approx(want1, abs=1e-9)
    assert out["phi_2"] == pytest.approx(want2, abs=1e-9)
    assert abs(out["phi_1"] - phi1) < 0.1 and abs(out["phi_2"] - phi2) < 0.1


def test_sample_entropy_brute(spark):
    x = RNG.normal(size=200)
    out = TS.query_sample_entropy(_series_df(spark, x), "x", "i").first()
    # brute-force reference
    m, r = 2, 0.2 * np.std(x)

    def count(mm):
        t = np.lib.stride_tricks.sliding_window_view(x, mm)
        c = 0
        for i in range(len(t)):
            for j in range(i + 1, len(t)):
                if np.max(np.abs(t[i] - t[j])) <= r:
                    c += 1
        return c

    want = -math.log(count(m + 1) / count(m))
    assert out["sample_entropy"] == pytest.approx(want, rel=1e-12)


def test_lempel_ziv_known(spark):
    # alternating series binarizes to 0101...: complexity grows ~log n
    x = [float(i % 2) for i in range(16)]
    out = TS.query_lempel_ziv(_series_df(spark, x), "x", "i", as_ratio=False).first()
    # dictionary parse of 0101...: {0,1,01,010,1...} — verify vs direct parse
    s = bytes(int(v > 0.5) for v in x)
    seen, ind, inc = set(), 0, 1
    while ind + inc <= len(s):
        sub = s[ind:ind + inc]
        if sub in seen:
            inc += 1
        else:
            seen.add(sub)
            ind += inc
            inc = 1
    assert out["lempel_ziv"] == float(len(seen))


def test_series_entropies_fused_parity(spark):
    # the fused single-pass kernel must agree exactly with the three
    # single-metric kernels (it shares their Chebyshev/LZ76 math)
    x = np.concatenate([RNG.normal(size=150), RNG.normal(2.0, 0.5, 80)])
    df = _series_df(spark, x).withColumn(
        "g", (F.col("i") % 2).cast("string"))
    fused = (TS.query_series_entropies(df, "x", "i", by=["g"])
             .orderBy("g").toPandas())
    se = TS.query_sample_entropy(df, "x", "i", by=["g"]).orderBy("g").toPandas()
    ae = TS.query_approx_entropy(df, "x", "i", by=["g"]).orderBy("g").toPandas()
    lz = TS.query_lempel_ziv(df, "x", "i", by=["g"]).orderBy("g").toPandas()
    assert list(fused["n_used"]) == [115, 115]
    assert fused["sample_entropy"].values == pytest.approx(
        se["sample_entropy"].values, rel=1e-15)
    assert fused["approx_entropy"].values == pytest.approx(
        ae["approx_entropy"].values, rel=1e-15)
    assert fused["lempel_ziv"].values == pytest.approx(
        lz["lempel_ziv"].values, rel=1e-15)
    # NaN semantics on a too-short group: entropies NaN, LZ defined
    tiny = TS.query_series_entropies(
        _series_df(spark, [1.0, 2.0, 3.0]), "x", "i").first()
    assert tiny["n_used"] == 3
    # kernel NaN surfaces as null through Arrow, like the single-metric
    # kernels
    assert tiny["sample_entropy"] is None
    assert tiny["approx_entropy"] is None
    assert tiny["lempel_ziv"] > 0


def test_pca_matches_numpy(spark):
    X = RNG.normal(size=(500, 3)) @ np.array(
        [[2.0, 0.3, 0.0], [0.0, 1.0, 0.1], [0.0, 0.0, 0.2]])
    sdf = spark.createDataFrame(pd.DataFrame(X, columns=["a", "b", "c"]))
    out = N.pca(sdf, ["a", "b", "c"]).toPandas()
    want = np.linalg.eigvalsh(np.cov(X.T, ddof=1))[::-1]
    assert out["explained_variance"].values == pytest.approx(want, rel=1e-9)
    sv = N.singular_values(sdf, ["a", "b", "c"]).toPandas()
    Xc = X - X.mean(0)
    want_sv = np.linalg.svd(Xc, compute_uv=False)
    assert sv["singular_value"].values == pytest.approx(want_sv, rel=1e-9)
    proj = N.principal_components(sdf, ["a", "b", "c"], k=2).toPandas()
    # projected variance equals the top eigenvalues
    assert np.var(proj["pc1"], ddof=1) == pytest.approx(want[0], rel=1e-9)


def test_isotonic_pava(spark):
    y = np.array([1.0, 3.0, 2.0, 4.0, 3.5, 5.0])
    out = (N.isotonic_regression(_series_df(spark, y), "x", "i")
           .orderBy("__o").toPandas())
    fit = out["isotonic"].values
    assert (np.diff(fit) >= -1e-12).all()          # monotone
    assert fit.sum() == pytest.approx(y.sum())     # projection preserves sum
    assert fit[1] == pytest.approx(2.5) and fit[2] == pytest.approx(2.5)
    dec = (N.isotonic_regression(_series_df(spark, y[::-1].copy()), "x", "i",
                                 increasing=False).orderBy("__o").toPandas())
    assert (np.diff(dec["isotonic"].values) <= 1e-12).all()


def test_rfft_matches_numpy(spark):
    x = RNG.normal(size=128)
    out = (N.rfft(_series_df(spark, x), "x", "i", n_coeffs=10)
           .orderBy("freq_idx").toPandas())
    want = np.fft.rfft(x)[:10]
    assert out["re"].values == pytest.approx(want.real, rel=1e-12)
    assert out["im"].values == pytest.approx(want.imag, rel=1e-12, abs=1e-12)


def test_nextafter(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"x": [1.0, 0.0, -2.5]}))
    out = sdf.select(N.next_up("x").alias("u"), N.next_down("x").alias("d")).toPandas()
    assert out["u"].values == pytest.approx(np.nextafter([1.0, 0.0, -2.5], np.inf))
    assert out["d"].values == pytest.approx(np.nextafter([1.0, 0.0, -2.5], -np.inf))
    assert (out["u"].values > [1.0, 0.0, -2.5]).all()


def test_sampling(spark):
    pdf = pd.DataFrame({"id": range(1000),
                        "cls": ["a"] * 700 + ["b"] * 300})
    sdf = spark.createDataFrame(pdf)
    s = SMP.sample_deterministic(sdf, "id", 0.3)
    assert 200 < s.count() < 400
    # deterministic: same result twice
    assert s.count() == SMP.sample_deterministic(sdf, "id", 0.3).count()
    vn = SMP.volume_neutral(sdf, "cls", "id")
    counts = {r["cls"]: r["count"] for r in vn.groupBy("cls").count().collect()}
    assert counts == {"a": 300, "b": 300}
    splits = SMP.split_by_ratio(sdf, "id", [0.8, 0.2], ["tr", "te"])
    n_tr, n_te = splits["tr"].count(), splits["te"].count()
    assert n_tr + n_te == 1000 and 700 < n_tr < 900
    ds = SMP.downsample(sdf, F.col("cls") == "a", "id", 0.5)
    assert ds.where(F.col("cls") == "b").count() == 300
    assert 250 < ds.where(F.col("cls") == "a").count() < 450
    st = SMP.stratified_sample(sdf, ["cls"], "id", 0.5)
    assert 400 < st.count() < 600


def test_eda(spark):
    pdf = pd.DataFrame({
        "a": [1.0, 2.0, None, 4.0],
        "const": [7, 7, 7, 7],
        "id": [1, 2, 3, 4],
    })
    sdf = spark.createDataFrame(pdf)
    d = E.describe(sdf, ["a"]).first()
    assert d["null_cnt"] == 1 and d["n_distinct"] == 3
    assert d["mean"] == pytest.approx(7 / 3)
    nr = {r["column"]: r["null_pct"] for r in E.null_report(sdf).collect()}
    assert nr["a"] == 0.25 and nr["const"] == 0.0
    fl = {r["column"]: (r["is_constant"], r["is_id_like"])
          for r in E.column_flags(sdf).collect()}
    assert fl["const"] == (True, False)
    assert fl["id"] == (False, True)


def test_permute_entropy(spark):
    # strictly increasing series → single pattern → entropy 0
    inc = _series_df(spark, [float(i) for i in range(50)])
    assert TS.query_permute_entropy(inc, "x", "i").first()["permute_entropy"] == 0.0
    # random series → entropy near ln(6)
    rnd = _series_df(spark, RNG.normal(size=3000))
    e = TS.query_permute_entropy(rnd, "x", "i").first()["permute_entropy"]
    assert abs(e - math.log(6)) < 0.05


def test_permute_entropy_arbitrary_m(spark):
    """m != 3 auto-routes through the numpy kernel; parity vs a brute
    Bandt-Pompe reference and vs the m=3 JVM path (incl. ties)."""
    import itertools

    def brute(xs, m):
        pats = {}
        for j in range(len(xs) - m + 1):
            w = xs[j:j + m]
            perm = tuple(sorted(range(m), key=lambda i: (w[i], i)))
            pats[perm] = pats.get(perm, 0) + 1
        tot = sum(pats.values())
        return -sum(c / tot * math.log(c / tot) for c in pats.values())

    xs = list(RNG.normal(size=400))
    # tie mass: repeated values exercise the stable tie-break
    xs[50:60] = [1.5] * 10
    df = _series_df(spark, xs)
    for m in (2, 4, 5):
        got = TS.query_permute_entropy(df, "x", "i", m=m) \
            .first()["permute_entropy"]
        assert abs(got - brute(xs, m)) < 1e-9, m
    # m=3: JVM path == brute == kernel partition
    got3 = TS.query_permute_entropy(df, "x", "i", m=3) \
        .first()["permute_entropy"]
    assert abs(got3 - brute(xs, 3)) < 1e-9
    # increasing series: zero entropy at any m
    inc = _series_df(spark, [float(i) for i in range(30)])
    assert TS.query_permute_entropy(inc, "x", "i", m=4) \
        .first()["permute_entropy"] == 0.0


def test_similar_count(spark):
    x = np.concatenate([np.zeros(6), RNG.normal(10, 1, 50), np.zeros(6)])
    out = TS.query_similar_count(_series_df(spark, x), "x", "i",
                                 window=6, threshold=0.5).first()
    # the trailing zero-window matches the leading one
    assert out["similar_count"] >= 1


def test_knn_extras(spark):
    pdf = pd.DataFrame({
        "id": [0, 1, 2, 3],
        "v": [[0.0, 0.0], [1.0, 0.0], [0.0, 2.0], [5.0, 5.0]],
    })
    from polars_ds_extension_spark.operators import knn as K
    sdf = spark.createDataFrame(pdf)
    kd = K.dist_from_kth_nb(sdf, "id", "v", k=2, metric="l2").toPandas()
    got = dict(zip(kd["id"], kd["kth_dist"]))
    assert got[0] == pytest.approx(2.0)       # 2nd-nearest of origin is (0,2)
    w = K.within_dist_from(sdf, "id", "v", [0.0, 0.0], 2.1, metric="l2").toPandas()
    assert set(w["id"]) == {0, 1, 2}
    topk = K.is_knn_from(sdf, "id", "v", [0.0, 0.0], 2, metric="l2").toPandas()
    assert set(topk["id"]) == {0, 1}


def test_add_at(spark):
    pdf = pd.DataFrame({"i": [0, 1, 0, 2, 1], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    from polars_ds_extension_spark.functions import num as N2
    out = N2.add_at(spark.createDataFrame(pdf), "i", "v").toPandas()
    assert dict(zip(out["idx"], out["sum"])) == {0: 4.0, 1: 7.0, 2: 4.0}


def test_knn_entropy(spark):
    from polars_ds_extension_spark.functions._special import digamma
    # digamma sanity: psi(1) = -gamma, psi(2) = 1 - gamma
    assert digamma(1.0) == pytest.approx(-0.5772156649, abs=1e-9)
    assert digamma(2.0) == pytest.approx(1 - 0.5772156649, abs=1e-9)
    # KL estimator on uniform(0,1): H = 0; on N(0,1): H = 0.5*ln(2*pi*e)
    u = RNG.uniform(0, 1, 4000)
    hu = TS.query_knn_entropy(_series_df(spark, u), "x", "i", k=3).first()["knn_entropy"]
    assert abs(hu - 0.0) < 0.1
    g = RNG.normal(0, 1, 4000)
    hg = TS.query_knn_entropy(_series_df(spark, g), "x", "i", k=3).first()["knn_entropy"]
    assert abs(hg - 0.5 * math.log(2 * math.pi * math.e)) < 0.1


def test_smooth_spline(spark):
    x = np.linspace(0, 4 * np.pi, 300)
    y = np.sin(x) + RNG.normal(0, 0.3, 300)
    sdf = _series_df(spark, y)
    out = (N.smooth_spline(sdf, "x", "i", lam=50.0)
           .orderBy("__o").toPandas())
    f = out["smoothed"].values
    # smoother is closer to the clean signal than the noisy input
    assert np.mean((f - np.sin(x)) ** 2) < np.mean((y - np.sin(x)) ** 2) / 2
    # lambda→0 interpolates
    f0 = (N.smooth_spline(sdf, "x", "i", lam=1e-9).orderBy("__o")
          .toPandas()["smoothed"].values)
    assert np.allclose(f0, y, atol=1e-6)
    # lambda→inf approaches the OLS line
    finf = (N.smooth_spline(sdf, "x", "i", lam=1e9).orderBy("__o")
            .toPandas()["smoothed"].values)
    t = np.arange(300.0)
    coef = np.polyfit(t, y, 1)
    assert np.allclose(finf, np.polyval(coef, t), atol=5e-3)


def test_expander_E(spark):
    from polars_ds_extension_spark.functions.expander import E as expand

    sdf = spark.createDataFrame(
        [("A", 1.0, 4.0), ("A", 2.0, 1.0), ("B", 3.0, 99.0),
         ("B", 4.0, 12.0), ("A", 5.0, 33.0)], "g string, a double, b double")
    out = sdf.groupBy("g").agg(*expand(["a", "b"], ["min", "max", "n_unique", "len"]))
    assert set(out.columns) == {"g", "a_min", "b_min", "a_max", "b_max",
                                "a_n_unique", "b_n_unique", "__len__"}
    row = {r["g"]: r for r in out.collect()}
    assert row["A"]["a_min"] == 1.0 and row["B"]["b_max"] == 99.0
    assert row["A"]["__len__"] == 3 and row["B"]["a_n_unique"] == 2

    custom = expand("a", ["null_rate", "q90"],
                    customizer={"q90": lambda c: F.percentile(c, 0.9)})
    got = sdf.agg(*custom).first()
    assert got["a_null_rate"] == 0.0 and got["a_q90"] == pytest.approx(4.6)

    with pytest.raises(ValueError):
        expand("a", ["not_a_method"])


def test_partition_helper(spark):
    from polars_ds_extension_spark import PartitionHelper

    sdf = spark.createDataFrame(
        [("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0)],
        "g string, h string, v double")
    ph = PartitionHelper(sdf, by=["g", "h"])
    assert ph.names() == ["A|x", "A|y", "B|x"]
    assert ph.get("B|x").count() == 1
    assert ph.get("nope") is None
    sums = ph.apply(lambda name, d: d.agg(F.sum("v")).first()[0])
    assert sums == {"A|x": 1.0, "A|y": 2.0, "B|x": 3.0}
    whole = PartitionHelper(sdf, by=None)
    assert whole.names() == ["df"] and whole.get("df").count() == 3
    with pytest.raises(ValueError):
        PartitionHelper(sdf, by=["v"])


def test_dia(spark):
    from polars_ds_extension_spark.functions.diagnosis import DIA

    sdf = spark.createDataFrame(
        [(1, 0.5, None, "aa", "x", [0.2, 0.8]),
         (2, 0.25, 2.0, "bbb", "x", [0.5, 0.5]),
         (3, float("nan"), None, "aa", "y", [1.0, 0.0]),
         (4, 0.75, 4.0, None, "y", [0.3, 0.7])],
        "i int, p double, v double, s string, g string, arr array<double>")
    dia = DIA(sdf)
    assert dia.ints == ["i"] and dia.strs == ["s", "g"]
    assert dia.list_floats == ["arr"]

    sv = {r["column"]: r for r in dia.special_values_report().collect()}
    assert sv["v"]["null_count"] == 2 and sv["p"]["nan_count"] == 1
    assert sv["i"]["null_pct"] == 0.0

    prof = {r["column"]: r for r in dia.numeric_profile().collect()}
    assert prof["i"]["min"] == 1.0 and prof["i"]["max"] == 4.0
    assert prof["i"]["median"] == 2.5 and prof["v"]["null_pct"] == 0.5

    ss = {r["column"]: r for r in dia.str_stats().collect()}
    assert ss["s"]["most_freq"] == "aa" and ss["s"]["most_freq_cnt"] == 2
    assert ss["s"]["null_count"] == 1 and ss["g"]["n_unique"] == 2
    assert ss["s"]["min_len"] == 2 and ss["s"]["max_len"] == 3

    nc = dia.null_corr().collect()
    pairs = {(r["column_1"], r["column_2"]): r["null_corr"] for r in nc}
    assert ("v", "s") in pairs or ("s", "v") in pairs  # both have nulls

    # p in [0,1] (NaN breaks it? NaN >= 0 is false → p excluded);
    # arr rows sum to 1 with equal lengths
    probs = dia.infer_prob()
    assert "arr" in probs

    assert dia.infer_high_null(0.5) == ["v"]
    assert "g" in dia.infer_discrete(threshold=0.9)
    assert dia.infer_binary() == ["g"]  # 2 distinct, no nulls
    assert dia.infer_binary(include_null=True) == ["v", "s", "g"]
    assert dia.infer_const() == []

    dep = dia.infer_dependency().collect()
    assert {(r["column"], r["by"]) for r in dep} == {("i", "s"), ("i", "g"), ("s", "g")}

    c = dia.corr(["p"], method="pearson").collect()[0]
    assert c["column"] == "p"

    # plot_corr now returns the pre-plot data frame (see test_dia_plot_data)
    assert "column" in dia.plot_corr(["p"]).columns


def test_dia_plot_data(spark):
    """plot_* return pre-plot data frames; histogram bins match DuckDB
    width_bucket on the same data."""
    import duckdb
    import numpy as np

    from polars_ds_extension_spark.functions.diagnosis import DIA

    rng = np.random.RandomState(9)
    vals = rng.normal(50, 12, 3000)
    sdf = spark.createDataFrame([(float(v), "g%d" % (i % 2))
                                 for i, v in enumerate(vals)],
                                "x double, g string")
    dia = DIA(sdf)
    n_bins = 20
    hist = dia.plot_feature_distr("x", n_bins=n_bins).collect()
    mn, mx = float(vals.min()), float(vals.max())
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"x": vals}))
    w = (mx - mn) / n_bins
    oracle = con.execute(f"""
        SELECT LEAST({n_bins} - 1, CAST(FLOOR((x - {mn}) / {w}) AS INT)) AS b,
               COUNT(*) AS n
        FROM t GROUP BY 1 ORDER BY 1
    """).fetchall()
    got = {r["bin"]: r["count"] for r in hist}
    exp = {int(b): int(n) for b, n in oracle}
    assert got == exp
    assert sum(got.values()) == 3000
    # edges tile [mn, mx]
    h = sorted(hist, key=lambda r: r["bin"])
    assert h[0]["lo"] == pytest.approx(mn)
    assert h[-1]["hi"] == pytest.approx(mx)

    # density integrates to 1
    dens = dia.plot_feature_distr("x", n_bins=n_bins, density=True).collect()
    area = sum(r["density"] * (r["hi"] - r["lo"]) for r in dens)
    assert area == pytest.approx(1.0)

    # over= gives per-group histograms
    over = dia.plot_feature_distr("x", n_bins=10, over="g").collect()
    assert {r["g"] for r in over} == {"g0", "g1"}
    assert sum(r["count"] for r in over) == 3000

    # corr / dependency payloads are DataFrames now, not raises
    assert "column" in dia.plot_corr(["x"]).columns
    assert dia.plot_dependency(["x", "g"]).count() >= 0


def test_smooth_spline_natural(spark):
    """Reinsch banded solve == dense (I + λK)⁻¹y with K = Q R⁻¹ Qᵀ
    (maths/smooth_spline.md), plus the λ limits, on uneven x."""
    import numpy as np

    from polars_ds_extension_spark.functions import num as N

    rng = np.random.RandomState(4)
    n = 60
    x = np.sort(rng.uniform(0, 10, n))
    x += np.arange(n) * 1e-6  # strictly increasing
    y = np.sin(x) + rng.normal(0, 0.15, n)
    sdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double")

    lam = 2.5
    got = (N.smooth_spline_natural(sdf, "x", "y", lam=lam)
           .orderBy("__x").toPandas()["smoothed"].to_numpy())

    # dense oracle
    h = np.diff(x)
    m = n - 2
    R = np.zeros((m, m))
    for k in range(m):
        R[k, k] = (h[k] + h[k + 1]) / 3
        if k + 1 < m:
            R[k, k + 1] = R[k + 1, k] = h[k + 1] / 6
    Q = np.zeros((n, m))
    for k in range(m):
        Q[k, k] = 1 / h[k]
        Q[k + 1, k] = -(1 / h[k] + 1 / h[k + 1])
        Q[k + 2, k] = 1 / h[k + 1]
    K = Q @ np.linalg.solve(R, Q.T)
    expect = np.linalg.solve(np.eye(n) + lam * K, y)
    assert np.allclose(got, expect, atol=1e-8)

    # λ→0 interpolates
    f0 = (N.smooth_spline_natural(sdf, "x", "y", lam=0.0)
          .orderBy("__x").toPandas()["smoothed"].to_numpy())
    assert np.allclose(f0, y)

    # λ→∞ → least-squares line
    finf = (N.smooth_spline_natural(sdf, "x", "y", lam=1e12)
            .orderBy("__x").toPandas()["smoothed"].to_numpy())
    A = np.vstack([x, np.ones(n)]).T
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert np.allclose(finf, A @ coef, atol=1e-3)

    # grouped path
    sdf2 = sdf.withColumn("g", (F.col("x") > 5).cast("int"))
    out2 = N.smooth_spline_natural(sdf2, "x", "y", by=["g"], lam=lam)
    assert out2.count() == n


def test_dia_infer_corr(spark):
    import duckdb
    import pandas as pd
    from polars_ds_extension_spark.functions.diagnosis import DIA

    pdf = pd.DataFrame({
        "a": [1.0, 2.0, 3.0, 4.0, 5.0],
        "b": [2.0, 4.1, 5.9, 8.2, 10.0],
        "c": [5.0, 1.0, 4.0, 2.0, 3.0],
    })
    out = DIA(spark.createDataFrame(pdf)).infer_corr().toPandas()
    assert list(out.columns) == ["x", "y", "corr"]
    assert len(out) == 3  # 3 choose 2
    con = duckdb.connect()
    con.register("t", pdf)
    for _, r in out.iterrows():
        exp = con.sql(f"SELECT corr({r['x']}, {r['y']}) FROM t").fetchone()[0]
        assert r["corr"] == pytest.approx(exp, rel=1e-9)
    # sorted by |corr| descending; (a,b) is the near-perfect pair
    assert (out.iloc[0]["x"], out.iloc[0]["y"]) == ("a", "b")
    assert out["corr"].abs().is_monotonic_decreasing


def test_dia_validation(spark):
    """col/row validation vs a duckdb oracle on the same little frame.
    Ref eda/diagnosis.py:236 (col_validation), :268 (row_validation)."""
    import duckdb
    from pyspark.sql import functions as F

    from polars_ds_extension_spark.functions.diagnosis import DIA

    rows = [(1, 10.0, "a"), (2, -3.0, "bb"), (3, 7.0, "zz"),
            (4, 0.0, "c"), (5, 25.0, None)]
    sdf = spark.createDataFrame(rows, "id int, x double, s string")
    dia = DIA(sdf)

    # ---- col_validation: one agg pass, failures out as (column, reason)
    out = dia.col_validation(
        ((F.min("x") >= 0).alias("x"), "x must be non-negative"),
        ((F.max("x") <= 100).alias("x_hi"), "x must be <= 100"),
        (F.every(F.length("s") <= 2).alias("s"), "s must be short"),
    ).collect()
    got = {(r["column"], r["__reason__"]) for r in out}
    assert got == {("x", "x must be non-negative")}
    # empty rules / clean frame -> empty report
    assert dia.col_validation().count() == 0
    assert dia.col_validation(
        ((F.max("x") <= 100).alias("x"), "hi")).count() == 0

    # ---- row_validation, first-reason mode, vs duckdb
    rep = dia.row_validation(
        (F.col("x") > 0, "x_positive"),
        (F.length("s") <= 1, "s_short"),
        id_col="id",
    ).toPandas().sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", sdf.toPandas())
    want = con.sql("""
        SELECT id, CASE WHEN NOT r1 THEN 'x_positive'
                        WHEN NOT r2 THEN 's_short' END AS __reason__
        FROM (SELECT id, x > 0 AS r1, LENGTH(s) <= 1 AS r2 FROM t)
        WHERE NOT (r1 AND r2) ORDER BY id
    """).df()
    assert rep["id"].tolist() == want["id"].tolist()
    assert rep["__reason__"].tolist() == want["__reason__"].tolist()

    # ---- all_reasons mode: sorted array of every failed rule
    rep2 = {r["id"]: list(r["__reason__"]) for r in dia.row_validation(
        (F.col("x") > 0, "x_positive"),
        (F.length("s") <= 1, "s_short"),
        id_col="id", all_reasons=True,
    ).collect()}
    assert rep2[2] == ["s_short", "x_positive"]  # fails both, sorted
    assert rep2[3] == ["s_short"]
    assert 1 not in rep2  # passes all

    # columns_to_keep rides through; duplicate rule names rejected
    kept = dia.row_validation(
        (F.col("x") > 0, "r"), id_col="id", columns_to_keep=["s"])
    assert set(kept.columns) == {"id", "s", "__reason__"}
    with pytest.raises(ValueError):
        dia.row_validation((F.col("x") > 0, "r"),
                           (F.col("x") < 9, "r"), id_col="id")


def test_exact_quantiles_last_run_diagnostics(spark):
    """plans/ranks.LAST_RUN must record the selection branch after a
    call — the diagnostic the r9 eda_describe verdict item is answered
    with (sort_array branch, zero sketch misses at 10x); this consumer
    pins the keys so the bookkeeping cannot silently drift from the
    branches it describes."""
    from pyspark.sql import functions as F

    from polars_ds_extension_spark.plans import ranks

    df = spark.range(10_000).select(
        (F.col("id") % 977).cast("double").alias("v"))
    out = ranks.exact_quantiles(df, {"v": [0.25, 0.5, 0.75]})
    assert out["v"][1] is not None
    lr = ranks.LAST_RUN
    assert lr["selection"] == "sort_array"  # far below the 20M cut
    assert lr["sketch_misses"] == 0 and not lr["full_counts_pass"]
    assert lr["pinned_rows"] > 0 and lr["n_targets"] >= 3
    assert lr["max_bucket"] > 0


def test_shuffle_key_matches_reference_and_handles_huge_ids(spark):
    """shuffle_key must equal the pure-int reference (the contract the
    DuckDB oracle relies on) including at ids near 2^63, where a naive
    (id + offset) % p would ANSI-overflow before the mod."""
    p = SMP._SHUFFLE_P
    s, b1, b2 = SMP._shuffle_consts(9)

    def ref(i):
        h = (i % p + s) % p
        h = (h * 48271 + b1) % p
        return (h * 69621 + b2) % p

    ids = [0, 1, 2, p - 1, p, p + 1, 2**40, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["k"]
           for r in df.select("doc_id",
                              SMP.shuffle_key("doc_id", seed=9).alias("k")
                              ).collect()}
    assert got == {i: ref(i) for i in ids}
    # the affine rounds are invertible mod p, so distinct residues give
    # distinct keys — no funnelling into a few shards
    many = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    n_keys = many.select(
        SMP.shuffle_key("doc_id").alias("k")).distinct().count()
    assert n_keys == 5000
