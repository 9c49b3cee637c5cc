"""Smoke-level integration: a subset of the driver-facing query catalog
runs at sf0.001 and matches its DuckDB oracle (full sweep lives in
scripts/check_oracles.py; this keeps CI fast)."""

import duckdb
import pytest

from polars_ds_extension_spark import queries as catalog

SUBSET = ["pricing_summary", "roc_auc", "ts_streaks", "string_similarity",
          "psi", "kaplan_meier"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, con, name):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.check_oracles import canon, values_match

    spark_pdf = catalog.queries()[name](spark, sf_dir).toPandas()
    duck_pdf = con.sql(catalog.oracle_sql()[name]).df()
    ok, why = values_match(canon(spark_pdf), canon(duck_pdf))
    assert ok, why


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
