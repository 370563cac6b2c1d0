"""k ∝ n SemDeDup decade measurement (VERDICT r9 item #5).

SCALING.md's round-9 decomposition showed e_semdedup_pairs at FIXED k=8
exploding ~quadratically on the replicated decade (10x rows -> ~100x
within-cluster candidate pairs -> 152.8 s at sf1): a property of fixed-k
bucketing, not of the operator — production SemDeDup scales the Lloyd's
cluster count with the corpus so per-cluster size (and candidate pairs
per vector) stays constant. This tool MEASURES that prescription:

  - sf0.1, k=8   (the certified operating point)
  - sf1,   k=80  (k ∝ n: 10x vectors, 10x clusters)

reporting wall seconds, within-cluster candidate-pair count, candidate
pairs PER VECTOR (the flatness claim), and the anchor-sampled pair recall
at the scaled k (the audit from e_semdedup_pair_recall_sampled, with its
k-override seam). Replica corpus: tools/scaling.py's manifest-guarded
sf1 at /tmp/spark_graft_sf1 (built on demand).

Usage: python tools/semdedup_kscale.py [--out /tmp/spark_graft_sf1]
Prints one JSON line per (sf, k) cell.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _candidate_count(spark, sf_dir: str, k: int) -> int:
    """Within-cluster candidate pairs (pre-threshold) at cluster count k —
    the quantity k ∝ n holds flat per vector. Same assignment chain as
    e_semdedup_pairs (kmeans_plan at k), pairs counted on the narrow
    (vec_id, cid) rows only."""
    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.operators.clustering import kmeans_plan
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read, spread
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import quantize

    emb = (
        spread(read(spark, sf_dir, "embeddings"), spark)
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
    )
    sizes = kmeans_plan(emb, k=k).groupBy("cid").count()
    row = sizes.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long").alias("pairs"),
        F.sum("count").cast("long").alias("n_vec"),
    ).collect()[0]
    return int(row["pairs"]), int(row["n_vec"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from tools.scaling import build_sf1

    from pagopa_ecommerce_cdc_service_spark.plans import vector_queries as vq
    from pagopa_ecommerce_cdc_service_spark.session import build_session

    spark = build_session(
        app_name="semdedup-kscale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    build_sf1(spark, "/root/testdata/sf0.1", args.out)
    sf1 = args.out
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    cells = [("/root/testdata/sf0.1", 0.1, 8), (sf1, 1.0, 80)]
    for sf_dir, sf, k in cells:
        n_cand, n_vec = _candidate_count(spark, sf_dir, k)
        t0 = time.time()
        n_pairs = vq.e_semdedup_pairs(spark, sf_dir, k=k).count()
        secs = round(time.time() - t0, 2)
        # sampled pair recall at THIS k (the audit's k-override seam)
        vq._SEMDEDUP_K_OVERRIDE = k if k != 8 else None
        try:
            rec = vq.e_semdedup_pair_recall_sampled(spark, sf_dir).collect()[0]
        finally:
            vq._SEMDEDUP_K_OVERRIDE = None
        print(
            json.dumps(
                {
                    "sf": sf,
                    "k": k,
                    "n_vectors": n_vec,
                    "cand_pairs": n_cand,
                    "cand_per_vector": round(n_cand / n_vec, 2),
                    "pairs_secs": secs,
                    "n_dup_pairs": n_pairs,
                    "sampled_recall": {
                        "n_exact": rec["n_exact"],
                        "n_found": rec["n_found"],
                        "pair_recall": round(rec["pair_recall"], 4)
                        if rec["pair_recall"] is not None
                        else None,
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
