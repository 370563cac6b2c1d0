"""connected_components semantics: transitive closure, min-id labeling,
direction independence, multi-hop convergence."""

from __future__ import annotations

from pagopa_ecommerce_cdc_service_spark.operators.graph import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: 4 hops from 5 to 1 — needs several iterations
    got = _components(spark, [(2, 1), (2, 3), (4, 3), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_separate_components_stay_separate(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_direction_and_duplicates_irrelevant(spark):
    a = _components(spark, [(3, 1), (1, 3), (3, 2), (2, 3), (3, 2)])
    b = _components(spark, [(1, 3), (2, 3)])
    assert a == b == {1: 1, 2: 1, 3: 1}


def test_keep_one_per_cluster_idiom(spark):
    # the dedup pipeline's terminal step: representatives are node==component
    df = spark.createDataFrame([(5, 9), (9, 12), (30, 31)], ["src", "dst"])
    comp = connected_components(df)
    keep = comp.filter("node = component").select("node").collect()
    assert sorted(r["node"] for r in keep) == [5, 30]


def test_superseded_checkpoints_released(spark):
    # a long chain forces many iterations; superseded label tables must be
    # unpersisted as the loop advances, not accumulate O(iterations) blocks
    n_before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    chain = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    result = connected_components(df)
    assert result.count() == 12
    n_after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    # only the FINAL labels checkpoint (backing the returned DF) may remain
    assert n_after - n_before <= 1
