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


# --- triangle_census ------------------------------------------------------

from itertools import combinations

from pagopa_ecommerce_cdc_service_spark.operators.graph import triangle_census


def _census_brute(edges):
    """Pure-Python reference: per-node degree / wedges / triangles."""
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    nbrs = {n: {b for a, b in es if a == n} | {a for a, b in es if b == n}
            for n in nodes}
    tri = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {
        n: (len(nbrs[n]), len(nbrs[n]) * (len(nbrs[n]) - 1) // 2, tri[n])
        for n in nodes
    }


def _census_spark(spark, edges):
    df = spark.createDataFrame(
        [tuple(sorted(e)) for e in edges], ["doc_a", "doc_b"]
    ).distinct()
    rows = triangle_census(df).collect()
    return {r["doc_id"]: (r["degree"], r["n_wedges"], r["n_triangles"])
            for r in rows}


def test_triangle_census_clique_and_chain(spark):
    # K4 (every node: deg 3, 3 wedges, 3 triangles) plus a pendant chain
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    assert _census_spark(spark, edges) == _census_brute(edges)


def test_triangle_census_random_graphs(spark):
    # deterministic pseudo-random edge sets across densities; Spark result
    # must equal the brute-force census exactly
    import random

    rng = random.Random(20260814)
    for n_nodes, n_edges in ((6, 5), (8, 12), (10, 25), (12, 40)):
        pool = list(combinations(range(n_nodes), 2))
        edges = rng.sample(pool, min(n_edges, len(pool)))
        assert _census_spark(spark, edges) == _census_brute(edges), edges


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------
def _sym(spark, pairs):
    from pyspark.sql import functions as F

    e = spark.createDataFrame(pairs, "u bigint, v bigint")
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def test_lpa_bridge_keeps_dense_sides_apart(spark):
    # two triangles {1,2,3} and {4,5,6} joined by the single bridge 3-4:
    # CC merges them into one component; LPA must not — a lone bridge
    # vote never outvotes two in-triangle neighbors.
    from pagopa_ecommerce_cdc_service_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    edges = _sym(
        spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    )
    cc = connected_components(edges, src="u", dst="v")
    assert {r["component"] for r in cc.collect()} == {1}

    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, rounds=3).collect()
    }
    left = {got[n] for n in (1, 2, 3)}
    right = {got[n] for n in (4, 5, 6)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_lpa_tie_breaks_to_min_label_deterministically(spark):
    # node 3's neighbors 1 and 2 tie at one vote each → min label wins;
    # re-running on a different partitioning must give identical labels.
    from pagopa_ecommerce_cdc_service_spark.operators.graph import (
        label_propagation,
    )

    edges = _sym(spark, [(1, 3), (2, 3)])
    one = {
        (r["node"], r["community"])
        for r in label_propagation(edges, rounds=1).collect()
    }
    assert (3, 1) in one
    again = {
        (r["node"], r["community"])
        for r in label_propagation(edges.repartition(7), rounds=1).collect()
    }
    assert one == again


def test_long_chain_converges_logarithmically(spark):
    # a 301-node path (diameter 300) — plain one-hop min-label needs 300
    # rounds and the pre-doubling operator RAISED here (cap 25); with
    # pointer doubling the label distance halves per round, so the cap
    # comfortably covers it and every node lands on the chain minimum
    chain = [(i, i + 1) for i in range(1, 301)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {i: 1 for i in range(1, 302)}


def test_density_clusters_taxonomy(spark):
    """DBSCAN taxonomy on a hand graph (min_pts=2):
    1-2-3 triangle (all core) + pendant 4 on 3 (border) + isolated edge
    5-6 (both degree 1: noise) + star center 7 with leaves 8,9 (7 core,
    8/9 border), 7's component is itself (no core neighbor)."""
    from pagopa_ecommerce_cdc_service_spark.operators.graph import (
        density_clusters,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6), (7, 8), (7, 9)],
        "src long, dst long",
    )
    rows = {r.node: (r.cluster_id, r.is_core)
            for r in density_clusters(edges, min_pts=2).collect()}
    assert rows[1] == (1, True) and rows[2] == (1, True) and rows[3] == (1, True)
    assert rows[4] == (1, False)          # border attaches to the triangle
    assert 5 not in rows and 6 not in rows  # noise
    assert rows[7] == (7, True)           # lone core = own cluster
    assert rows[8] == (7, False) and rows[9] == (7, False)
