"""Reference-name alias layer: every live name the reference's
exprs/*.py __all__ exports must resolve in aliases.py, and a sample of
renamed entry points must round-trip a real call."""

import math

import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark import aliases as A

# The reference's live export surface (exprs/*.py __all__ union, the
# four commented-out names excluded — they are dead in the reference
# too). Pinned as a literal so the test never reads /root/reference.
REF_EXPORTS = [
    'add_at', 'add_noise', 'arr_dot', 'arr_l1_dist', 'arr_sql2_dist',
    'bicor', 'center', 'chi2', 'combinations', 'convolve', 'corr',
    'cosine_sim', 'detrend', 'digamma', 'exp2', 'expit',
    'extract_numbers', 'f_test', 'filter_by_hamming',
    'filter_by_levenshtein', 'fract', 'gamma', 'gcd', 'gmean',
    'haversine', 'hmean', 'info_value', 'info_value_discrete',
    'integrate_trapz', 'is_decreasing', 'is_increasing', 'is_knn_from',
    'isotonic_regression', 'jaccard_col', 'jaccard_row', 'jitter',
    'kendall_tau', 'ks_2samp', 'l1_horizontal', 'l2_sq_horizontal',
    'l_inf_horizontal', 'lcm', 'lin_reg', 'lin_reg_report',
    'lin_reg_w_rcond', 'list_amax', 'list_dot', 'list_l1_dist',
    'list_sql2_dist', 'logistic_reg', 'logit', 'mann_whitney_u',
    'map_words', 'next_down', 'next_up', 'normal_test',
    'normalize_whitespace', 'pca', 'perturb', 'principal_components',
    'product', 'psi', 'psi_discrete', 'psi_w_breakpoints',
    'query_abs_energy', 'query_adj_r2', 'query_approx_entropy',
    'query_ar_coeffs', 'query_auto_corr', 'query_avg_streak',
    'query_binary_metrics', 'query_c3_stats', 'query_cat_cross_entropy',
    'query_cid_ce', 'query_cond_entropy', 'query_cond_indep',
    'query_confusion_matrix', 'query_copula_entropy',
    'query_count_uniques', 'query_cv', 'query_dcg_score',
    'query_dist_from_kth_nb', 'query_entropy', 'query_first_digit_cnt',
    'query_hubor_loss', 'query_kaplan_meier_prob', 'query_knn_avg',
    'query_knn_entropy', 'query_knn_freq_cnt', 'query_knn_ptwise',
    'query_l1', 'query_l2', 'query_l_inf', 'query_lempel_ziv',
    'query_log_cosh', 'query_log_loss', 'query_longest_streak',
    'query_mad', 'query_mape', 'query_mase', 'query_mcc',
    'query_mean_abs_change', 'query_mean_n_abs_max', 'query_mid_range',
    'query_msle', 'query_multi_roc_auc', 'query_nb_cnt',
    'query_ndcg_score', 'query_permute_entropy', 'query_r2',
    'query_radius_freq_cnt', 'query_radius_ptwise',
    'query_radius_ptwise_null_safe', 'query_range_count',
    'query_roc_auc', 'query_sample_entropy', 'query_similar_count',
    'query_smape', 'query_streak', 'query_symm_ratio',
    'query_time_reversal_asymmetry_stats', 'query_tpr_fpr',
    'query_transfer_entropy', 'random', 'random_binomial', 'random_exp',
    'random_int', 'random_normal', 'random_null', 'random_str',
    'recursive_lin_reg', 'remove_diacritics', 'replace_non_ascii',
    'rfft', 'rolling_lin_reg', 'similar_to_vocab', 'simple_lin_reg',
    'singular_values', 'smooth_spline', 'softmax', 'str_d_leven',
    'str_fuzz', 'str_hamming', 'str_jaccard', 'str_jaro', 'str_jw',
    'str_lcs_subseq', 'str_lcs_subseq_dist', 'str_lcs_substr',
    'str_leven', 'str_nearest', 'str_osa', 'str_sorensen_dice',
    'str_tversky_sim', 'to_camel_case', 'to_constant_case',
    'to_pascal_case', 'to_snake_case', 'trunc', 'ttest_1samp',
    'ttest_ind', 'ttest_ind_from_stats', 'weighted_corr',
    'weighted_cosine_sim', 'weighted_cov', 'weighted_gmean',
    'weighted_hmean', 'weighted_mean', 'weighted_var',
    'within_dist_from', 'woe', 'woe_discrete', 'xi_corr', 'xlogy',
    'z_normalize',
]


def test_every_reference_export_resolves():
    missing = [n for n in REF_EXPORTS if not hasattr(A, n)]
    assert missing == [], f"alias layer missing: {missing}"
    assert all(callable(getattr(A, n)) for n in REF_EXPORTS)


def test_renamed_aliases_round_trip(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
         (3, [0.1, 0.9])], "id bigint, v array<double>")
    nn = A.query_knn_ptwise(emb, "id", "v", emb, "id", "v", k=1,
                            metric="l2")
    got = {r["id"]: r["neighbor_id"] for r in nn.collect()}
    assert got == {0: 1, 1: 0, 2: 3, 3: 2}
    cnt = A.query_nb_cnt(emb, "id", "v", emb, "id", "v", radius=0.2)
    assert {r["id"]: r["nb_cnt"] for r in cnt.collect()} == {
        0: 1, 1: 1, 2: 1, 3: 1}

    prod = A.product(
        spark.createDataFrame([(1,), (2,)], "a int"), "a", "a")
    assert prod.count() == 4
    comb = A.combinations(
        spark.createDataFrame([(1,), (2,), (3,)], "a int"), "a", 2)
    assert comb.count() == 3

    df = spark.createDataFrame(
        [(1.0, 1.1), (2.0, 2.2), (3.0, 2.7), (4.0, 4.4)],
        "y double, p double")
    row = df.agg(A.query_hubor_loss("y", "p", delta=1.0).alias("h")).first()
    assert row["h"] == pytest.approx(
        sum(0.5 * e * e if abs(e) <= 1 else abs(e) - 0.5
            for e in (0.1, 0.2, 0.3, 0.4)) / 4)


def test_psi_breakpoint_modes_agree_small(spark):
    """psi's default (percentile_approx cuts) vs exact_breakpoints=True
    (selection-plan cuts): below the sketch accuracy percentile_approx
    IS exact, so both modes must produce the identical PSI — pins the
    r8 approx-default migration as a pure perf change, not a semantic
    one, at test scale."""
    from polars_ds_extension_spark.functions import num as N

    base = spark.createDataFrame(
        [(float(i % 17),) for i in range(200)], "x double")
    new = spark.createDataFrame(
        [(float((i * 3) % 23),) for i in range(200)], "x double")
    approx = N.psi(new, base, "x", n_bins=5).first()["psi"]
    exact = N.psi(new, base, "x", n_bins=5,
                  exact_breakpoints=True).first()["psi"]
    assert approx == pytest.approx(exact, abs=0)
    assert approx > 0


def test_psi_w_breakpoints_oracle(spark):
    """Per-bin PSI report vs a hand/duckdb computation (ref num.py:651,
    src/num_ext/psi.rs:77): right-closed custom bins, all bins present,
    pct floored at 1e-4."""
    import duckdb

    base = spark.createDataFrame(
        [(v,) for v in [0.05, 0.2, 0.4, 0.6, 0.8, 1.5, 2.5]], "x double")
    new = spark.createDataFrame(
        [(v,) for v in [0.1, 0.15, 0.3, 0.9, 1.1, 1.2,
                        float("nan"), float("inf")]], "x double")
    out = A.psi_w_breakpoints(new, base, "x", [0.1, 0.5, 1.0]).toPandas()
    assert list(out.columns) == ["<=", "baseline_pct", "actual_pct",
                                 "psi_bin"]
    assert out["<="].tolist()[:3] == [0.1, 0.5, 1.0]
    assert math.isinf(out["<="].tolist()[3])
    con = duckdb.connect()
    exp = con.sql("""
      WITH b(bin, cb) AS (VALUES (0, 1), (1, 2), (2, 2), (3, 2)),
           n(bin, cn) AS (VALUES (0, 1), (1, 2), (2, 1), (3, 2))
      SELECT GREATEST(cb / 7.0, 0.0001) bp, GREATEST(cn / 6.0, 0.0001) ap
      FROM b JOIN n USING (bin) ORDER BY bin
    """).df()
    for i in range(4):
        assert out["baseline_pct"][i] == pytest.approx(exp["bp"][i])
        assert out["actual_pct"][i] == pytest.approx(exp["ap"][i])
        bp, ap = exp["bp"][i], exp["ap"][i]
        assert out["psi_bin"][i] == pytest.approx(
            (bp - ap) * math.log(bp / ap))


def test_frame_fixture(spark):
    """pds.frame twin (reference __init__.py:13): index-only frame."""
    out = A.frame(spark, size=5, index_name="row_num").toPandas()
    assert list(out.columns) == ["row_num"]
    assert out["row_num"].tolist() == [0, 1, 2, 3, 4]
    assert A.frame(spark).count() == 2_000
