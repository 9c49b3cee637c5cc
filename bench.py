"""Benchmark harness: runs every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a count() (no driver-side materialization of
full results — the metric is engine time, not toPandas transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from polars_ds_extension_spark.session import get_spark
    from polars_ds_extension_spark import queries as catalog

    spark = get_spark(app="pds-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + parquet-footer warmup (excluded from timings)
    from polars_ds_extension_spark.sources import load_table
    load_table(spark, sf_dir, "lineitem").count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name, fn in catalog.queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
        except Exception as ex:  # pragma: no cover
            print(f"bench error in {name}: {ex}", file=sys.stderr)
            dt = float("nan")
        per_query[name] = round(dt, 4)
        total += dt if dt == dt else 0.0

    print(json.dumps({
        "metric": "catalog_total_runtime",
        "value": round(total, 4),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
