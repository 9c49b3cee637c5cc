"""Sink helpers: size-aware parquet writes and the streaming file sink."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polars_ds_extension_spark.sources import (estimate_row_bytes,
                                               stream_to_parquet,
                                               write_parquet,
                                               write_training_shards)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="pds_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_write_parquet_file_sizing(spark, outdir):
    df = spark.range(0, 200_000).select(
        F.col("id"), (F.col("id") % 4).alias("bucket"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    # ~200k rows * ~80B ≈ 16MB raw → 2MB files ⇒ a handful of files,
    # not one-per-shuffle-partition (32) and not a single giant file
    path = os.path.join(outdir, "flat")
    write_parquet(df, path, target_file_mb=2, n_rows=200_000)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert 1 < len(files) < 16
    back = spark.read.parquet(path)
    assert back.count() == 200_000

    # partitioned write: hive layout per bucket, rows intact
    p2 = os.path.join(outdir, "parts")
    write_parquet(df, p2, partition_by=["bucket"], target_file_mb=2,
                  n_rows=200_000)
    assert len(glob.glob(os.path.join(p2, "bucket=*"))) == 4
    assert spark.read.parquet(p2).count() == 200_000


def test_write_training_shards_sorted_and_complete(spark, outdir):
    from polars_ds_extension_spark.functions.sample import shuffle_key

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id") \
        .withColumn("payload", F.col("doc_id") * 2)
    path = os.path.join(outdir, "shards")
    write_training_shards(df, path, "doc_id", n_shards=4, seed=7)
    dirs = sorted(os.path.basename(d) for d in glob.glob(path + "/shard=*"))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(500))
    # each shard file is written in (shuffle_key, id) order and matches
    # the shard assignment of the key itself
    for shard in range(4):
        files = glob.glob(f"{path}/shard={shard}/*.parquet")
        assert len(files) == 1
        rows = spark.read.parquet(files[0]) \
            .withColumn("__k", shuffle_key("doc_id", seed=7)).collect()
        keys = [(r["__k"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
        assert all(r["__k"] % 4 == shard for r in rows)


def test_shuffle_shards_positions_are_dense_ranks(spark):
    from polars_ds_extension_spark.functions.sample import shuffle_shards

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, "doc_id", 5, seed=3).toPandas()
    assert sorted(out["doc_id"]) == list(range(300))
    for shard, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # deterministic: a second run produces the identical assignment
    again = shuffle_shards(df, "doc_id", 5, seed=3).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_estimate_row_bytes(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("h"))
    est = estimate_row_bytes(df)
    assert 40 < est < 200  # ~64-char hash + long + overhead


def test_stream_to_parquet(spark, outdir):
    src = os.path.join(outdir, "src")
    spark.range(0, 1000).withColumn("v", F.col("id") * 2.0) \
        .coalesce(1).write.parquet(src)
    s = spark.readStream.schema("id long, v double").parquet(src)
    q = stream_to_parquet(s.where(F.col("id") % 2 == 0),
                          os.path.join(outdir, "out"),
                          os.path.join(outdir, "ckpt"), trigger_once=True)
    q.awaitTermination(120)
    got = spark.read.parquet(os.path.join(outdir, "out"))
    assert got.count() == 500


def test_write_bucketed_join_has_no_shuffle(spark, outdir):
    import pandas as pd
    from polars_ds_extension_spark.sources import write_bucketed

    facts = spark.createDataFrame(pd.DataFrame({
        "k": list(range(1000)) * 2, "v": range(2000)}))
    dims = spark.createDataFrame(pd.DataFrame({
        "k": range(1000), "name": [f"n{i}" for i in range(1000)]}))
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")
    write_bucketed(facts, "t_facts", ["k"], n_buckets=8, sort_by=["k"],
                   path=f"{outdir}/t_facts")
    write_bucketed(dims, "t_dims", ["k"], n_buckets=8, sort_by=["k"],
                   path=f"{outdir}/t_dims")
    j = spark.table("t_facts").join(spark.table("t_dims"), "k")
    # disable broadcast so the co-located sort-merge path is what's
    # planned; a bucketed-bucketed equi-join must not add an Exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_facts").join(spark.table("t_dims"), "k")
        assert j.count() == 2000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_facts")
        spark.sql("DROP TABLE IF EXISTS t_dims")


def test_load_csv_json_roundtrip(spark, outdir):
    import pandas as pd
    from polars_ds_extension_spark.sources import load_csv, load_json

    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.mode("overwrite").option("header", "true") \
        .csv(f"{outdir}/c")
    sdf.coalesce(1).write.mode("overwrite").json(f"{outdir}/j")
    c = load_csv(spark, f"{outdir}/c", schema="a int, b string")
    assert sorted(r["a"] for r in c.collect()) == [1, 2, 3]
    jj = load_json(spark, f"{outdir}/j", schema="a int, b string")
    assert sorted(r["b"] for r in jj.collect()) == ["x", "y", "z"]


def test_zorder_layout_clusters_both_dims(spark, outdir):
    import numpy as np
    import pandas as pd
    from polars_ds_extension_spark.sources.sinks import write_zordered, zorder_key

    rng = np.random.default_rng(13)
    pdf = pd.DataFrame({"x": rng.uniform(0, 1, 20000),
                        "y": rng.uniform(0, 1, 20000)})
    sdf = spark.createDataFrame(pdf)
    write_zordered(sdf, f"{outdir}/z", ["x", "y"], n_files=16)
    # per-partition bounding boxes: z-order must shrink BOTH dims;
    # a plain sort on x would leave every partition spanning ~full y
    key, _ = zorder_key(sdf, ["x", "y"])
    parts = (sdf.withColumn("__zk", key)
             .repartitionByRange(16, "__zk")
             .groupBy(F.spark_partition_id().alias("p"))
             .agg((F.max("x") - F.min("x")).alias("sx"),
                  (F.max("y") - F.min("y")).alias("sy"))
             .toPandas())
    # average bounding-box AREA far below the full domain (1.0): with 16
    # z-tiles each should cover ~1/16 of the plane (+slack for boundary
    # tiles)
    area = (parts["sx"] * parts["sy"]).mean()
    assert area < 0.45, area
    # and the files actually landed
    back = spark.read.parquet(f"{outdir}/z")
    assert back.count() == 20000


def test_zorder_key_rejects_sign_bit_overflow(spark):
    import pandas as pd
    import pytest
    from polars_ds_extension_spark.sources.sinks import zorder_key

    sdf = spark.createDataFrame(
        pd.DataFrame({"a": [1.0], "b": [2.0], "c": [3.0], "d": [4.0]}))
    # 16 bits x 4 cols = 64 > 63: the top interleaved bit would land in
    # the sign bit and wrap the curve negative
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(sdf, ["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(sdf, ["a", "b"], bits=32)
    # 15 bits x 4 = 60 fits
    key, _ = zorder_key(sdf, ["a", "b", "c", "d"], bits=15)
    assert key is not None


def test_sinks_zorder_key_keeps_pre_consolidation_layout(spark):
    # the shared partition.zorder_key primitive is LAST-column-most-
    # significant per group; the sinks wrapper must keep its original
    # cols[0]-most-significant layout (files written before the
    # consolidation stay comparable) — r12 advice
    from pyspark.sql import functions as F
    from polars_ds_extension_spark.sources.sinks import zorder_key

    rows = [(x, y) for x in range(4) for y in range(4)]
    sdf = spark.createDataFrame(rows, "x int, y int")
    key, bounds = zorder_key(sdf, ["x", "y"], bits=2)
    got = {(r["x"], r["y"]): r["z"]
           for r in sdf.select("x", "y", key.alias("z")).collect()}
    for (x, y), z in got.items():
        # original loop: b=1: x-bit, y-bit; b=0: x-bit, y-bit
        want = (((x >> 1) & 1) << 3) | (((y >> 1) & 1) << 2) \
            | ((x & 1) << 1) | (y & 1)
        assert z == want, ((x, y), z, want)
    assert bounds == {"x": (0.0, 3.0), "y": (0.0, 3.0)}
