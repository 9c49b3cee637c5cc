"""Catalog queries for the fit/transform pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import Pipeline
from .pipeline.transforms import Impute, OneHot, Scale, TargetEncode, Winsorize, WoeEncode
from .queries import _r, query
from .sources import load_table


@query("pipeline_transform", """
WITH s AS (
  SELECT quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
  FROM events
), w AS (
  SELECT event_id, event_type,
    CASE WHEN value < lo THEN lo WHEN value > hi THEN hi ELSE value END AS v
  FROM events, s
), m AS (
  SELECT AVG(v) AS a, STDDEV_SAMP(v) AS b FROM w
)
SELECT event_id, ROUND((v - a) / b, 6) AS value,
  (event_type = 'click')::INT AS event_type_click,
  (event_type = 'error')::INT AS event_type_error,
  (event_type = 'purchase')::INT AS event_type_purchase,
  (event_type = 'signup')::INT AS event_type_signup,
  (event_type = 'view')::INT AS event_type_view
FROM w, m
""")
def pipeline_transform_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """impute → winsorize → standard-scale → one-hot, fitted sequentially
    (each step fits on the previous step's output — the oracle mirrors
    that order). Scoring is pure Column expressions."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    pipe = Pipeline([
        Impute(["value"], strategy="mean"),
        Winsorize(["value"], 0.05, 0.95),
        Scale(["value"], method="standard"),
        OneHot(["event_type"]),
    ]).fit(ev)
    out = pipe.transform(ev)
    cols = ["event_id", _r(F.col("value")).alias("value")] + [
        F.col(f"event_type_{v}")
        for v in ["click", "error", "purchase", "signup", "view"]
    ]
    return out.select(*cols)


@query("pipeline_encode", """
WITH t AS (
  SELECT event_id, event_type, ((value > 100)::INT)::DOUBLE AS y FROM events
), g AS (
  SELECT AVG(y) AS gm, SUM(y) AS pt, SUM(1 - y) AS nt FROM t
), s AS (
  SELECT event_type, COUNT(*) AS n, AVG(y) AS m,
         SUM(y) AS p, SUM(1 - y) AS nn
  FROM t GROUP BY event_type
)
SELECT t.event_id,
  ROUND((s.n * s.m + 20 * g.gm) / (s.n + 20), 6) AS te,
  ROUND(LN((s.p / g.pt) / (s.nn / g.nt)), 6) AS woe
FROM t JOIN s USING (event_type) CROSS JOIN g
""")
def pipeline_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding + weight-of-evidence encoding of
    event_type against the binary target value>100 (ref
    transforms.py:503, :562)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("event_type").alias("te"),
        F.col("event_type").alias("woe"),
        (F.col("value") > 100).cast("int").cast("double").alias("y"),
    )
    pipe = Pipeline([
        TargetEncode(["te"], "y", smoothing=20.0),
        WoeEncode(["woe"], "y"),
    ]).fit(ev)
    out = pipe.transform(ev)
    return out.select("event_id", _r(F.col("te")).alias("te"),
                      _r(F.col("woe")).alias("woe"))


@query("pipeline_poly_impute", """
WITH base AS (
  SELECT event_type,
         CASE WHEN value < 5 THEN NULL ELSE value END AS v
  FROM events
),
m AS (SELECT AVG(v) AS mv FROM base WHERE event_type = 'click'),
f AS (SELECT event_type, COALESCE(v, (SELECT mv FROM m)) AS v FROM base)
SELECT event_type,
       ROUND(AVG(v), 6) AS mean_v,
       ROUND(AVG(v*v), 6) AS mean_v_sq
FROM f GROUP BY event_type
""")
def pipeline_poly_impute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConditionalImpute (fill nulls with the mean of the 'click' subset)
    + Polynomial degree-2 features, run through a fitted Pipeline that is
    serialized to JSON and re-materialized before transform — proving a
    fitted pipeline is a pure function of scalar params (ref
    transforms.py conditional_impute/polynomial_features, pipeline.py)."""
    from .pipeline.transforms import ConditionalImpute, Polynomial

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("value") < 5, None).otherwise(F.col("value")).alias("v"))
    pipe = Pipeline([
        ConditionalImpute(["v"], "event_type = 'click'", "mean"),
        Polynomial(["v"]),
    ]).fit(ev)
    out = Pipeline.from_json(pipe.to_json()).transform(ev)
    return out.groupBy("event_type").agg(
        _r(F.avg("v")).alias("mean_v"),
        _r(F.avg("v_sq")).alias("mean_v_sq"))


@query("pipeline_iv_rankhot", """
WITH t AS (
  SELECT l_returnflag, l_linestatus,
         CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS flag
  FROM lineitem
),
tot AS (SELECT SUM(flag) AS pt, SUM(1-flag) AS nt FROM t),
iv AS (
  SELECT l_returnflag AS k,
         (SUM(flag)/(SELECT pt FROM tot) - SUM(1-flag)/(SELECT nt FROM tot))
         * LN((SUM(flag)/(SELECT pt FROM tot))
              / (SUM(1-flag)/(SELECT nt FROM tot))) AS iv_val
  FROM t GROUP BY 1
)
SELECT ROUND(iv.iv_val, 6) AS rf_iv,
       CASE WHEN t.l_linestatus = 'O' THEN 1 ELSE 0 END AS ge_o,
       COUNT(*)::BIGINT AS cnt
FROM t JOIN iv ON t.l_returnflag = iv.k
GROUP BY 1, 2
""")
def pipeline_iv_rankhot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-value encoding of l_returnflag against the binary
    target quantity>25, plus rank-hot (thermometer) encoding of
    l_linestatus (ref transforms.py iv_encode/rank_hot_encode). Both fit
    passes aggregate to category-count frames; scoring is a literal map
    lookup at scan speed."""
    from .pipeline.transforms import IvEncode, RankHot

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "flag", (F.col("l_quantity") > 25).cast("double"))
    enc = IvEncode(["l_returnflag"], "flag").fit(li)
    rh = RankHot(["l_linestatus"], drop_original=False).fit(li)
    out = rh.transform(enc.transform(li))
    return out.groupBy(
        _r(F.col("l_returnflag")).alias("rf_iv"),
        F.col("l_linestatus_ge_O").alias("ge_o"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


@query("pipeline_blueprint", """
WITH m AS (
  SELECT AVG(value) AS mv FROM events
), f AS (
  SELECT event_type, user_id, COALESCE(value, mv) AS v
  FROM events, m
  WHERE COALESCE(value, mv) > 50
)
SELECT event_type,
       ROUND(SUM(v), 6) AS sum_v,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users
FROM f GROUP BY event_type
""")
def pipeline_blueprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed Blueprint: learned step (mean impute) + stateless steps
    (SQL filter, groupBy-agg, sort) — ref pipeline/_step.py SQLStep /
    GroupByAggStep / SortStep. The pipeline is serialized to JSON and
    RE-MATERIALIZED before scoring, so the oracle also pins the
    round-trip."""
    from .pipeline import ExprStep, GroupByAggStep, SortStep, SQLStep
    from .pipeline.transforms import Impute

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value")
    pipe = Pipeline([
        Impute(["value"], strategy="mean"),
        SQLStep("SELECT event_type, user_id, value AS v FROM df "
                "WHERE value > 50"),
        GroupByAggStep(["event_type"],
                       ["SUM(v) AS sum_v", "COUNT(*) AS n",
                        "COUNT(DISTINCT user_id) AS n_users"]),
        SortStep("event_type"),
    ]).fit(ev)
    rehydrated = Pipeline.from_json(pipe.to_json())
    out = rehydrated.transform(ev)
    return out.select("event_type", _r(F.col("sum_v")).alias("sum_v"),
                      "n", "n_users")


@query("blueprint_lin_impute", """
WITH coef AS (
  SELECT REGR_SLOPE(value, user_id) AS b,
         REGR_INTERCEPT(value, user_id) AS a
  FROM events
)
SELECT COUNT(*) AS n,
       ROUND(AVG(COALESCE(value, a + b * user_id)), 6) AS avg_v,
       SUM((COALESCE(value, a + b * user_id) IS NULL)::INT)::BIGINT
         AS null_cnt,
       ROUND(ANY_VALUE(b), 6) AS slope, ROUND(ANY_VALUE(a), 6) AS intercept
FROM events, coef
""")
def blueprint_lin_impute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blueprint.linear_impute (r9 parity tail, ref pipeline.py:438):
    regression-impute `value` from user_id via the chainable builder,
    serialized to JSON and RE-MATERIALIZED before scoring. The oracle
    replays the OLS fit with REGR_SLOPE/REGR_INTERCEPT (the 1-feature
    normal equations are the same algebra) and pins both the learned
    coefficients and the imputed column's mean."""
    from .pipeline import Blueprint

    ev = load_table(spark, sf_dir, "events")
    pipe = (Blueprint(ev.select("user_id", "value"), target="value")
            .linear_impute(["user_id"], add_bias=True)
            .materialize())
    rehydrated = Pipeline.from_json(pipe.to_json())
    out = rehydrated.transform(ev.select("user_id", "value"))
    beta = rehydrated.steps[0].params["beta"]
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        _r(F.avg("value")).alias("avg_v"),
        F.sum(F.col("value").isNull().cast("int")).cast("bigint")
        .alias("null_cnt"),
        F.round(F.lit(float(beta[0])), 6).alias("slope"),
        F.round(F.lit(float(beta[1])), 6).alias("intercept"))


@query("blueprint_dyn_agg", """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events
WHERE value > 10
GROUP BY 1, 2
""")
def blueprint_dyn_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blueprint chain ending in the group_by_dynamic step (ref
    pipeline.py:930 group_by_dynamic_agg → Spark F.window tumbling
    bucket): filter → 1-hour rollup per event_type, built with the
    chainable Blueprint API and re-materialized from JSON before
    scoring."""
    from .pipeline import Blueprint

    ev = load_table(spark, sf_dir, "events")
    pipe = (Blueprint(ev)
            .filter("value > 10")
            .group_by_dynamic_agg(
                "ts", ["COUNT(*) AS n", "ROUND(SUM(value), 6) AS sum_value"],
                every="1 hour", group_by="event_type")
            .materialize())
    out = Pipeline.from_json(pipe.to_json()).transform(ev)
    # window start is TIMESTAMP_NTZ (µs testdata); pin the UTC reading
    # before the epoch cast so it matches the oracle's naive epoch()
    ws = F.to_utc_timestamp(F.col("ts"), "UTC").cast("long")
    return out.select(ws.alias("ws"), "event_type", "n", "sum_value")



@query("pipeline_qbin", """
WITH q AS (
  SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS c
  FROM lineitem
), b AS (
  SELECT (l_extendedprice > c[1])::INT + (l_extendedprice > c[2])::INT
         + (l_extendedprice > c[3])::INT AS bin,
         l_extendedprice AS x
  FROM lineitem CROSS JOIN q
)
SELECT bin, COUNT(*) AS n, ROUND(MIN(x), 2) AS lo, ROUND(MAX(x), 2) AS hi
FROM b GROUP BY bin
""")
def pipeline_qbin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quartile binning (pipeline/transforms.
    QuantileBin): cut points are EXACT global quantiles from the
    distributed selection plan, the bin is a branch-free sum of
    comparisons against literal cuts (scan-speed transform). The oracle
    recomputes the cuts with quantile_cont — exact_quantiles is
    measured value-identical — and replays the same comparison sum."""
    from .pipeline.transforms import QuantileBin

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    t = QuantileBin(["l_extendedprice"], n_bins=4).fit(li)
    out = t.transform(li)
    return out.groupBy(F.col("l_extendedprice_bin").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"))
