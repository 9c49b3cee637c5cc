"""Scale probe: measure T(sf1.0) / T(sf0.1) for the most expensive
catalog queries on a 10x-inflated copy of the sf0.1 tables.

The sf0.1 bench verifies speed at test scale; this probe verifies the
SHAPE — a query whose plan is 100TB-ready should scale ~linearly in
rows (ratio ~10 for scan-bound work, lower for sample-bounded kernels,
higher only where a documented quadratic term lives). Inflation unions
10 id-shifted copies of each base table (foreign keys shifted together
so join integrity holds; text/vector payloads copied verbatim, which
also stresses dedup cluster sizes 10x) and materializes them as parquet
under .probe_data/sf1.0 (gitignored; built lazily, reused after).

Usage: python scripts/scale_probe.py [--rebuild] [query ...]
Prints one JSON line: {"probe": {q: {"t_small": s, "t_large": s,
"ratio": r}}, "factor": 10}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".probe_data", "sf1.0")
FACTOR = 10

# (table, columns shifted by k * (max+1) per copy k) — FK pairs shift by
# the PARENT's stride so joins keep matching across copies
_SHIFTS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
}
_COPY = ["region", "nation", "customer", "supplier", "part"]

# the 10 most expensive / scale-shape-critical catalog queries (r5
# bench ordering) — each exercises a distinct plan family
DEFAULT_QUERIES = [
    "eda_describe", "corr_family", "xi_corr", "glm_poisson",
    "mase_full", "near_dup_minhash", "near_dup_cluster_dedup",
    "knn_cosine", "ivf_ann", "series_entropy",
    # round 6 additions: the new heavy queries + the exact-quantile plan
    "dia_profile", "semantic_dedup", "dup_spans",
]


def build_probe_data(spark, rebuild: bool = False) -> str:
    from pyspark.sql import functions as F

    if os.path.isdir(PROBE_DIR):
        if not rebuild:
            return PROBE_DIR
        shutil.rmtree(PROBE_DIR)
    os.makedirs(PROBE_DIR, exist_ok=True)
    strides = {}
    for t, cols in _SHIFTS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        for c in cols:
            key = c.replace("l_orderkey", "o_orderkey")  # share FK stride
            if key not in strides:
                strides[key] = int(
                    df.agg(F.max(F.col(c))).first()[0]) + 1
        parts = []
        for k in range(FACTOR):
            cp = df
            for c in cols:
                key = c.replace("l_orderkey", "o_orderkey")
                cp = cp.withColumn(
                    c, (F.col(c) + k * strides[key]).cast(
                        dict(df.dtypes)[c]))
            parts.append(cp)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{PROBE_DIR}/{t}.parquet")
    for t in _COPY:
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{PROBE_DIR}/{t}.parquet")
    return PROBE_DIR


def run_probe(spark, names=None, runs: int = 2) -> dict:
    import statistics

    from polars_ds_extension_spark import queries as catalog

    qs = catalog.queries()
    names = list(names) if names else DEFAULT_QUERIES
    build_probe_data(spark)
    out = {}
    for n in names:
        if n not in qs:
            continue
        ts = {}
        for label, d in (("t_small", BASE), ("t_large", PROBE_DIR)):
            samples = []
            for _ in range(runs):
                t0 = time.time()
                qs[n](spark, d).count()
                samples.append(time.time() - t0)
            ts[label] = round(statistics.median(samples), 3)
        ts["ratio"] = round(ts["t_large"] / max(ts["t_small"], 1e-9), 2)
        out[n] = ts
        print(f"  {n}: {ts['t_small']}s -> {ts['t_large']}s "
              f"(x{ts['ratio']})", file=sys.stderr)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--rebuild"]
    rebuild = "--rebuild" in sys.argv[1:]

    from polars_ds_extension_spark.session import get_spark

    spark = get_spark(app="pds-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if rebuild:
        build_probe_data(spark, rebuild=True)
    probe = run_probe(spark, args or None)
    print(json.dumps({"probe": probe, "factor": FACTOR}))


if __name__ == "__main__":
    main()
