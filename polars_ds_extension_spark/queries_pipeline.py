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
