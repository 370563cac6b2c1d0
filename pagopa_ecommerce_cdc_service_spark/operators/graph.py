"""Connected components over an edge list — duplicate-cluster resolution.

The step a dedup pipeline needs between "near-duplicate PAIRS" (MinHash/LSH,
SimHash, cosine buckets) and "keep one document per duplicate CLUSTER":
transitively close the pair graph and name each component by its minimum
member id (deterministic under any partitioning — min is order-free).

Spark-first shape: iterative min-label propagation. Each iteration is one
join + one partial-aggregable groupBy (both on the node key, so AQE reuses
the exchange layout); lineage is truncated per iteration with an eager
``localCheckpoint`` so plans stay O(1) deep. Iterations needed = graph
diameter, which for near-dup clusters is tiny (dup clusters are cliques or
short chains — LSH emits most intra-cluster pairs directly). For
adversarially long chains at extreme scale, the same loop accepts the
large-star/small-star rewrite; the propagation core is unchanged.

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
        # each node adopts min(own label, neighbors' labels)
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
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
            "iterations (graph diameter exceeds the bound); raise "
            "max_iterations or pre-contract the graph"
        )

    return labels.select("node", F.col("comp").alias("component"))
