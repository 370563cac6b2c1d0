"""Connected components over an edge list — duplicate-cluster resolution.

The step a dedup pipeline needs between "near-duplicate PAIRS" (MinHash/LSH,
SimHash, cosine buckets) and "keep one document per duplicate CLUSTER":
transitively close the pair graph and name each component by its minimum
member id (deterministic under any partitioning — min is order-free).

Spark-first shape: iterative min-label propagation PLUS pointer doubling
(shortcutting). Each iteration is one neighbor-min join + groupBy and one
label-table self-join (comp(u) <- comp(comp(u))), all on the node key;
lineage is truncated per iteration with an eager ``localCheckpoint`` so
plans stay O(1) deep. The doubling step halves the distance any label
still has to travel, so iterations needed = O(log2 diameter) instead of
diameter — a 2000-hop chain converges in ~11 rounds where plain one-hop
propagation needs 2000 (and would blow the iteration cap: the pre-doubling
version of this operator RAISED on any graph with diameter > 25). Dup
clusters are near-cliques where both variants converge in 2-3 rounds; the
doubling is what makes the operator safe for adversarial chain topologies
at 100 TB.

No driver-side data loops: the driver only runs the convergence check
(a count aggregate per iteration), exactly like any iterative algorithm on
Spark (e.g. GraphX/Pregel supersteps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_local_checkpoint(df: DataFrame) -> None:
    """Eagerly drop a localCheckpoint's cached blocks.

    ``DataFrame.unpersist`` only touches ``persist()`` cache-manager entries;
    a localCheckpoint's data lives in the RDD behind the plan's LogicalRDD
    node. Without this, an iterative loop accumulates one superseded label
    table per iteration until the ContextCleaner gets around to it."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 - best effort; GC/ContextCleaner fallback
        pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Edge list (undirected; direction of input rows irrelevant) →
    ``(node, component)`` with ``component`` = min node id in the component.

    Nodes are whatever appears in the edge list; isolated nodes (no edges)
    are the caller's business — a dedup pipeline left-joins the result back
    onto the corpus, absent ⇒ singleton cluster.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # one physical copy of the symmetrized edges, reused every iteration
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    changed = -1
    for _ in range(max_iterations):
        # hop: each node adopts min(own label, neighbors' labels)
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # the doubling step references the hop table TWICE (left side +
        # parent lookup), so pin it — unpinned, the join+groupBy above
        # re-executes on both sides of the self-join every round
        hop = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        # shortcut (pointer doubling): comp(u) <- comp(comp(u)). Labels are
        # always node ids of the same component (invariant: init comp=node;
        # hop takes mins of labels; this step takes a label's label), so the
        # lookup is a self-join of the label table — monotone non-increasing,
        # and it halves the remaining label-propagation distance per round.
        parents = hop.select(
            F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
        )
        new_labels = (
            hop.join(parents, hop["comp"] == parents["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("p_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        _release_local_checkpoint(hop)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        # the superseded label table is dead once the convergence count ran:
        # release its blocks now, don't hold O(iterations) copies
        _release_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    _release_local_checkpoint(sym)
    if changed != 0:
        # returning unconverged labels would silently split one transitive
        # cluster into several — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (log2(diameter) exceeds the bound — a pathological "
            "graph); raise max_iterations"
        )

    return labels.select("node", F.col("comp").alias("component"))


def triangle_census(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Per-node degree / wedge / triangle counts over a canonical edge list.

    ``edges`` must be canonically oriented (src < dst, one row per
    undirected edge, no duplicates) — exactly what the LSH/SimHash pair
    pipelines emit. Output: one row per node appearing in the graph with
    ``doc_id, degree, n_wedges (= C(degree, 2)), n_triangles`` — the
    ingredients of the local clustering coefficient, all integer-exact.

    Shape (the scale contract, asserted by plan tests at the query layer):
    the edge relation is referenced exactly TWICE — once to build per-node
    sorted neighbor arrays (one explode + one groupBy), once as the closure
    probe — never once per consumer. Per-node triangle membership = closed
    wedges CENTERED at the node (each node centers exactly one wedge per
    triangle it belongs to: its two incident edges), so there is no
    per-triangle 3-way explosion and no third join. Wedge pairs come from
    the sorted neighbor array, so x < y matches the canonical edge
    orientation; ``explode_outer`` keeps degree-1 nodes in the output.
    Cost is O(sum of degree^2) wedge rows — the standard bound for exact
    triangle counting — against the (small) pair graph, never the corpus.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("_s").alias("n"), F.col("_d").alias("m")),
                F.struct(F.col("_d").alias("n"), F.col("_s").alias("m")),
            )
        ).alias("x")
    ).select("x.n", "x.m")
    adj = sym.groupBy("n").agg(F.sort_array(F.collect_list("m")).alias("nbrs"))
    wedge_pairs = F.expr(
        "flatten(transform(nbrs, (x, i) -> "
        "transform(slice(nbrs, i + 2, size(nbrs)), y -> struct(x, y))))"
    )
    wedges = adj.select(
        F.col("n").alias("doc_id"),
        F.size("nbrs").alias("degree"),
        F.explode_outer(wedge_pairs).alias("w"),
    )
    closed = wedges.join(
        e,
        (F.col("w.x") == F.col("_s")) & (F.col("w.y") == F.col("_d")),
        "left",
    )
    return closed.groupBy("doc_id").agg(
        F.first("degree").alias("degree"),
        (F.first("degree") * (F.first("degree") - 1) / 2)
        .cast("long")
        .alias("n_wedges"),
        F.count("_s").alias("n_triangles"),
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over a
    symmetric edge list → ``(node, community)`` after a FIXED number of
    rounds.

    Every node starts labeled with its own id; each round all nodes
    simultaneously adopt the most frequent label among their neighbors,
    ties broken by MINIMUM label — both rules order-free, so the result
    is deterministic under any partitioning (unlike the randomized
    asynchronous variant). A fixed unroll (no convergence check) keeps
    the plan static: each round is one keyed join + one (node, label)
    count + one per-node top-1 window — all narrow keyed shuffles on the
    pair graph, never the corpus. Complements ``connected_components``:
    CC merges everything reachable; LPA keeps densely-connected regions
    separate when they touch through a thin bridge.

    ``edges`` must already contain both directions of every undirected
    edge (the ``_simhash_band_edges`` contract). The caller is expected
    to have the edge subtree lazily persisted if it is expensive — the
    unroll references it ``rounds + 1`` times.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    labels = e.select("u").distinct().withColumn("lbl", F.col("u"))
    from pyspark.sql import Window

    top1 = Window.partitionBy("u").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(rounds):
        neighbor_labels = e.join(
            labels.select(F.col("u").alias("v"), "lbl"), "v"
        ).select("u", "lbl")
        labels = (
            neighbor_labels.groupBy("u", "lbl")
            .agg(F.count("*").alias("c"))
            .withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("u", "lbl")
        )
    return labels.select(
        F.col("u").alias("node"), F.col("lbl").alias("community")
    )


def density_clusters(edges: DataFrame, min_pts: int = 2,
                     src: str = "src", dst: str = "dst") -> DataFrame:
    """DBSCAN-style density clustering over a NEAR-DUP graph (PRE-BUILT for
    round 9): the edge list plays the role of the eps-neighborhood
    relation (candidate generation stays banded/blocked — the quadratic
    eps-scan never happens), so the classic DBSCAN taxonomy falls out of
    pure graph ops:

    - CORE nodes have >= ``min_pts`` distinct neighbors;
    - clusters = connected components of the CORE-CORE subgraph
      (:func:`connected_components` — min-label, pointer-doubled);
    - BORDER nodes are non-core neighbors of a core, attached to their
      minimum adjacent core cluster (deterministic, order-free);
    - everything else is noise (absent from the output — the caller
      left-joins the corpus, absent => unclustered).

    Returns (node, cluster_id, is_core). 100 TB: degree census and the
    border attach are one exchange each on the edge list; the CC runs on
    the (smaller) core-core subgraph only.
    """
    # r14 optimization: materialize the symmetrized edge list ONCE (the
    # same eager-localCheckpoint discipline connected_components applies to
    # its own copy). The taxonomy references sym from three branches (degree
    # census, core-core subgraph, border attach) and both union legs embed
    # the caller's full pair-derivation plan — unpinned, that pair plan
    # re-executes per branch. The pair graph is the bounded dedup artifact
    # a real pipeline materializes anyway; this operator is already
    # runtime-classified (iterative CC), so the pin adds no new class.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.countDistinct("v").alias("deg"))
    core = deg.filter(F.col("deg") >= min_pts).select(F.col("u").alias("node"))
    cc_edges = (
        sym.join(core.withColumnRenamed("node", "u"), "u", "left_semi")
        .join(core.withColumnRenamed("node", "v"), "v", "left_semi")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    comp = connected_components(cc_edges)  # (node, component) for cores w/ core nbrs
    # a core with NO core neighbor is its own cluster
    cores_labeled = (
        core.join(comp, "node", "left")
        .select("node", F.coalesce("component", "node").alias("cluster_id"))
    )
    border = (
        sym.join(core.withColumnRenamed("node", "v"), "v", "left_semi")
        .join(core.withColumnRenamed("node", "u"), "u", "left_anti")
        .join(
            cores_labeled.select(
                F.col("node").alias("v"), F.col("cluster_id")
            ),
            "v",
        )
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    return cores_labeled.withColumn("is_core", F.lit(True)).unionByName(
        border.withColumn("is_core", F.lit(False))
    )
