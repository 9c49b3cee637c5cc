"""Round-3 training-pipeline operators: connected-component canonical
dedup, benchmark decontamination, token-budget sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_connected_components_and_canonical_dedup(spark):
    from polars_ds_extension_spark.operators.dedup import (
        canonical_dedup, connected_components)

    # components: {1,2,3,4} (chain), {7,9}, {5} isolated (not in pairs)
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (9, 7)], "id_a long, id_b long")
    cc = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}

    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 4, 5, 7, 9]],
        "doc_id long, text string")
    kept = sorted(r["doc_id"]
                  for r in canonical_dedup(docs, "doc_id", pairs).collect())
    assert kept == [1, 5, 7]  # min of each cluster + untouched isolate


def test_connected_components_long_chain(spark):
    from polars_ds_extension_spark.operators.dedup import connected_components

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long")
    cc = connected_components(pairs).collect()
    assert {r["comp"] for r in cc} == {0}
    assert len(cc) == n + 1


def test_connected_components_deep_chain_converges(spark):
    """A chain DEEPER than max_iters must still label fully in BOTH
    loop branches — pointer jumping gives O(log diameter) rounds (r12:
    min-label alone silently returned non-converged labels here; the
    driver tier would mask the loop in auto, so both are forced)."""
    from polars_ds_extension_spark.operators.dedup import (
        connected_components)

    n = 200  # diameter 200 >> max_iters=25; log2(200) ≈ 8 rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long")
    for branch in (True, False):
        cc = connected_components(
            pairs, small_graph=branch).collect()
        assert {r["comp"] for r in cc} == {0}, f"branch={branch}"
        assert len(cc) == n + 1


def test_connected_components_branch_parity(spark):
    """The adaptive small-graph gate's two branches (broadcast+coalesce
    vs shuffle — the 100 TB path) must label IDENTICALLY on one graph
    (r10 adaptive-gate lesson: test branches against each other at the
    boundary; r11 verdict #3: the shuffle branch was unforceable)."""
    from polars_ds_extension_spark.operators.dedup import (
        connected_components)

    import random

    rng = random.Random(7)
    # mixed shapes: chains, stars, triangles, isolated pairs
    edges = [(i, i + 1) for i in range(0, 40, 1)]          # long chain
    edges += [(100, 100 + i) for i in range(1, 9)]          # star
    edges += [(200, 201), (201, 202), (202, 200)]           # triangle
    edges += [(rng.randrange(300, 400), rng.randrange(300, 400))
              for _ in range(60)]                           # random blob
    rows = [(a, b) for a, b in edges if a != b]
    # null endpoints are not nodes — dropped identically in every tier
    # (the driver tier's union-find would otherwise crash on None)
    rows += [(500, None), (None, 501), (None, None)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    small = {(r["id"], r["comp"])
             for r in connected_components(pairs,
                                           small_graph=True).collect()}
    big = {(r["id"], r["comp"])
           for r in connected_components(pairs,
                                         small_graph=False).collect()}
    driver = {(r["id"], r["comp"])
              for r in connected_components(
                  pairs, small_graph="driver").collect()}
    auto = {(r["id"], r["comp"])
            for r in connected_components(pairs).collect()}
    assert small == big == driver == auto
    assert not {n for n, _ in auto} & {500, 501}  # null-edge endpoints


def test_decontaminate(spark):
    from polars_ds_extension_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a quick brown fox ran away"),      # shares "quick brown fox"
         (2, "totally unrelated sentence here now"),
         (3, "the quick brown fox jumps again")],  # shares 3 trigrams
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in decontaminate(
        docs, "doc_id", "text", bench, "text", n_gram=3).collect()}
    assert out[1]["contaminated"] and out[1]["n_contaminated_grams"] == 1
    assert not out[2]["contaminated"] and out[2]["n_contaminated_grams"] == 0
    assert out[3]["n_contaminated_grams"] == 3


def test_sample_to_token_budget(spark):
    from polars_ds_extension_spark.operators.text import (
        order_scramble, sample_to_token_budget)

    rng = np.random.RandomState(2)
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * int(rng.randint(5, 50)))) for i in range(200)],
        "doc_id long, text string")
    budget = 1000
    out = sample_to_token_budget(docs, "doc_id", "text", budget).collect()
    assert out
    assert max(r["cum_tokens"] for r in out) <= budget
    # deterministic: same subset on rerun
    out2 = sample_to_token_budget(docs, "doc_id", "text", budget).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)
    # cum matches a driver-side replay of the scramble order
    toks = {r["doc_id"]: r["tokens"] for r in
            docs.select("doc_id", F.size(F.split(F.trim("text"), r"\s+"))
                        .alias("tokens")).collect()}
    order = sorted(toks, key=lambda i: (i % 2147483647) * 2654435761 % 2147483647)
    cum, keep = 0, set()
    for i in order:
        cum += toks[i]
        if cum > budget:
            break
        keep.add(i)
    assert {r["doc_id"] for r in out} == keep


def test_sql_step_view_hygiene(spark):
    """SQLStep must not leak its 'df' view nor clobber a pre-existing
    session view of that name."""
    from pyspark.sql import functions as F

    from polars_ds_extension_spark.pipeline.steps import SQLStep

    other = spark.createDataFrame([(99,)], "marker int")
    other.createOrReplaceTempView("df")
    frame = spark.createDataFrame([(1,), (2,)], "x int")
    out = SQLStep("SELECT x * 2 AS y FROM df").transform(frame)
    assert sorted(r["y"] for r in out.collect()) == [2, 4]
    # pre-existing view restored, not clobbered
    assert spark.table("df").first()["marker"] == 99
    spark.catalog.dropTempView("df")
    # with no pre-existing view, nothing leaks
    out2 = SQLStep("SELECT COUNT(*) AS n FROM df").transform(frame)
    assert out2.first()["n"] == 2
    assert not spark.catalog.tableExists("df")


def test_cluster_downsample(spark):
    """keep_per_cluster=k keeps the k smallest ids of each component;
    k=1 equals canonical_dedup; unpaired rows always pass."""
    import pytest
    from pyspark.sql import functions as F
    from polars_ds_extension_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 10)], "id bigint, text string")
    # clusters: {1,2,3,4} (chain), {6,7}; 5, 8, 9 unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "id_a bigint, id_b bigint")
    got2 = sorted(r["id"] for r in
                  D.cluster_downsample(df, "id", pairs, 2).collect())
    assert got2 == [1, 2, 5, 6, 7, 8, 9]
    got1 = sorted(r["id"] for r in
                  D.cluster_downsample(df, "id", pairs, 1).collect())
    canon = sorted(r["id"] for r in
                   D.canonical_dedup(df, "id", pairs).collect())
    assert got1 == canon == [1, 5, 6, 8, 9]
    got9 = sorted(r["id"] for r in
                  D.cluster_downsample(df, "id", pairs, 9).collect())
    assert got9 == list(range(1, 10))
    with pytest.raises(ValueError):
        D.cluster_downsample(df, "id", pairs, 0)


def test_cluster_downsample_matches_union_find_property(spark):
    """Hypothesis sweep (r9 verdict #9): cluster_downsample must equal
    a driver-side union-find reference — components, then keep the k
    SMALLEST ids per component, pass-through for unpaired rows — on
    random CHAINED graphs (a guaranteed path through a shuffled node
    subset forces multi-round label propagation, plus random extra
    edges for merged components) across the k>2 boundary. One Spark
    session, bounded examples: the CC fixpoint runs per example."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from polars_ds_extension_spark.operators import dedup as D

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def run(data):
        rng_ids = data.draw(st.permutations(list(range(1, 25))))
        n_nodes = data.draw(st.integers(min_value=4, max_value=16))
        nodes = rng_ids[:n_nodes]
        chain_len = data.draw(st.integers(min_value=3,
                                          max_value=n_nodes))
        edges = {tuple(sorted((nodes[i], nodes[i + 1])))
                 for i in range(chain_len - 1)}
        extra = data.draw(st.lists(
            st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)),
            max_size=8))
        edges |= {tuple(sorted(e)) for e in extra if e[0] != e[1]}
        keep = data.draw(st.integers(min_value=1, max_value=4))

        # union-find reference
        parent = {v: v for v in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        comps = {}
        for v in nodes:
            comps.setdefault(find(v), []).append(v)
        expect = set()
        for members in comps.values():
            expect |= set(sorted(members)[:keep])

        df = spark.createDataFrame([(v,) for v in nodes], "id bigint")
        pairs = spark.createDataFrame(
            sorted(edges), "id_a bigint, id_b bigint")
        got = {r["id"] for r in
               D.cluster_downsample(df, "id", pairs, keep).collect()}
        assert got == expect, (sorted(edges), keep, got, expect)

    run()


def test_near_dup_canonical_dedup_both_branches(spark):
    """The adaptive exact-dup collapse must be invisible in results:
    a mostly-distinct corpus (raw branch) and a heavily-duplicated one
    (collapse branch) both match the raw near_dup_pairs→canonical_dedup
    composition exactly."""
    from pyspark.sql import functions as F

    from polars_ds_extension_spark.operators import dedup as D
    from polars_ds_extension_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text").limit(60)
    near = docs.select((F.col("doc_id") + 1000).alias("doc_id"),
                       F.concat("text", F.lit(" zz tail")).alias("text"))
    distinct_u = docs.unionByName(near)          # 0% exact dups -> raw
    dup_u = distinct_u.unionByName(               # ~33% exact dups
        docs.select((F.col("doc_id") + 2000).alias("doc_id"), "text"))
    for u in (distinct_u, dup_u):
        ref = set(r[0] for r in D.canonical_dedup(
            u, "doc_id", D.near_dup_pairs(u, "doc_id", "text", 0.6))
            .select("doc_id").collect())
        got = set(r[0] for r in D.near_dup_canonical_dedup(
            u, "doc_id", "text", 0.6).select("doc_id").collect())
        assert got == ref


def test_near_dup_downsample_matches_pairs_composition(spark):
    """near_dup_downsample (the shared-edge-set keep-k composite) must
    keep exactly the rows near_dup_pairs → cluster_downsample keeps —
    on BOTH gate branches and for k=1 (≡ canonical) and k=2."""
    from pyspark.sql import functions as F

    from polars_ds_extension_spark.operators import dedup as D
    from polars_ds_extension_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text").limit(60)
    near = docs.select((F.col("doc_id") + 1000).alias("doc_id"),
                       F.concat("text", F.lit(" zz tail")).alias("text"))
    far = docs.select((F.col("doc_id") + 3000).alias("doc_id"),
                      F.concat("text", F.lit(" qq mark")).alias("text"))
    distinct_u = docs.unionByName(near).unionByName(far)  # 3-clusters
    dup_u = distinct_u.unionByName(                        # collapse gate
        docs.select((F.col("doc_id") + 2000).alias("doc_id"), "text"))
    for u in (distinct_u, dup_u):
        for k in (1, 2):
            ref = set(r[0] for r in D.cluster_downsample(
                u, "doc_id", D.near_dup_pairs(u, "doc_id", "text", 0.6),
                keep_per_cluster=k).select("doc_id").collect())
            got = set(r[0] for r in D.near_dup_downsample(
                u, "doc_id", "text", 0.6, keep_per_cluster=k)
                .select("doc_id").collect())
            assert got == ref, k
            if k == 1:  # keep-one must equal the canonical composite
                canon = set(r[0] for r in D.near_dup_canonical_dedup(
                    u, "doc_id", "text", 0.6).select("doc_id").collect())
                assert got == canon
        # the histogram sibling shares the components too
        ref_h = sorted(tuple(r) for r in D.dup_cluster_sizes(
            D.near_dup_pairs(u, "doc_id", "text", 0.6)).collect())
        got_h = sorted(tuple(r) for r in D.near_dup_cluster_sizes(
            u, "doc_id", "text", 0.6).collect())
        assert got_h == ref_h


def test_near_dup_canonical_dedup_degenerate_corpora(spark):
    """Boundary cases of the adaptive collapse: an ALL-IDENTICAL corpus
    (dup rate (n-1)/n — one representative, n-1 hash edges, exactly one
    survivor) and a single-doc corpus (no pairs, passes through)."""
    from pyspark.sql import functions as F

    from polars_ds_extension_spark.operators import dedup as D

    same = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("the exact same document text repeated many times over "
              "and over again in every row").alias("text"))
    out = D.near_dup_canonical_dedup(same, "doc_id", "text", 0.6)
    assert [r["doc_id"] for r in out.collect()] == [0]

    one = same.limit(1)
    assert D.near_dup_canonical_dedup(one, "doc_id", "text", 0.6) \
        .count() == 1


def test_near_dup_dedup_oversized_exact_cluster_both_branches(spark):
    """An exact-dup cluster LARGER than max_bucket must dedupe to one
    survivor in BOTH gate branches: its LSH buckets are all dropped by
    the size cap, so only the unconditional 8-byte-hash member->rep
    edges can catch it (the code-review r10 finding: the raw branch
    previously missed it entirely, making the gate flip results)."""
    from pyspark.sql import functions as F

    from polars_ds_extension_spark.operators import dedup as D
    from polars_ds_extension_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text").limit(40)
    big = spark.range(300).select(
        (F.col("id") + 50_000).alias("doc_id"),
        F.lit("identical oversized cluster text that repeats in "
              "three hundred rows and overflows every lsh bucket")
        .alias("text"))
    # ~40 distinct + 300 copies -> dup rate ~88% -> collapse branch
    collapse_u = docs.unionByName(big)
    out = D.near_dup_canonical_dedup(collapse_u, "doc_id", "text", 0.6,
                                     max_bucket=200)
    assert out.where(F.col("doc_id") >= 50_000).count() == 1
    # pad with 3000 synthetic DISTINCT docs so the dup rate lands ~9%
    # -> RAW branch, same cap (sf-table pads are too small: 500 rows
    # left the rate at 36% and both assertions took the collapse path)
    pad = spark.range(3000).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat(F.lit("distinct pad document number "),
                 F.col("id").cast("string"),
                 F.lit(" with enough unique words to shingle"))
        .alias("text"))
    raw_u = collapse_u.unionByName(pad)
    out2 = D.near_dup_canonical_dedup(raw_u, "doc_id", "text", 0.6,
                                      max_bucket=200)
    assert out2.where(F.col("doc_id") >= 50_000).count() == 1
