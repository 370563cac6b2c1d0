"""Flat vs pivot-pruned adaptive-k Lloyd's at the sf1 decade, k swept.

SCALING.md's e_semdedup_kn decomposition claims the pruned variant's
advantage WIDENS as k grows (flat assignment is O(n*k); pruned is
O(n*(P + k/P))). This tool measures exactly that: the full fit chain
(seeds -> 2 updates -> final assignment, forced via a count of the
assignment) at the sf1 corpus for a sweep of KN_CAP values, both
variants, warm-min of --runs runs. The registered queries stay at
KN_CAP=256; this is measurement-only (no plan changes).

Usage: python tools/kn_pruned_study.py [--sf-dir /tmp/spark_graft_sf1]
       [--caps 64,256,1024] [--runs 2]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--caps", default="64,256,1024")
    ap.add_argument(
        "--pivots",
        default=None,
        help="comma list: sweep the pruned variant's pivot count P at the "
        "LARGEST cap instead of racing flat vs pruned (the P ∝ √k knob)",
    )
    ap.add_argument(
        "--pivots-regret",
        default=None,
        help="comma list: QUALITY sweep — per pivot count P at the largest "
        "cap, the assignment disagreement and exact distance regret vs the "
        "flat (true-argmin) chain; deterministic, so timing runs are "
        "irrelevant (the e_kn_pruned_vs_flat_delta law, swept over P)",
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        kmeans_kn_fit,
        kmeans_kn_pruned_fit,
    )
    from pagopa_ecommerce_cdc_service_spark.operators.similarity import quantize
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read, spread
    from pagopa_ecommerce_cdc_service_spark.session import build_session

    spark = build_session(master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    emb = (
        spread(read(spark, args.sf_dir, "embeddings"), spark)
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .repartition(args.cpus, "vec_id")
    )
    n = emb.count()
    if args.pivots_regret:
        # same-centroids regret (the e_kn_pruned_vs_flat_delta law): at each
        # P, the pruned chain's OWN final centroids adjudicate — pruned
        # (pivot-restricted) assignment vs the exact k-way argmin over the
        # same set, so regret >= 0 per vector by construction. Racing the
        # pruned chain against the flat chain end-to-end instead mixes in
        # centroid drift across iterations and loses the sign.
        from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
            kmeans_assign,
        )

        cap = max(int(c) for c in args.caps.split(","))
        k = max(1, min(cap, n // 64))
        for p in (int(x) for x in args.pivots_regret.split(",")):
            cent, pruned = kmeans_kn_pruned_fit(emb, cap=cap, p=p)
            exact = kmeans_assign(emb, cent).select(
                "vec_id",
                F.col("cid").alias("cid_exact"),
                F.col("dist").alias("dist_exact"),
            )
            j = exact.join(
                pruned.select(
                    "vec_id",
                    F.col("cid").alias("cid_pruned"),
                    F.col("dist").alias("dist_pruned"),
                ),
                "vec_id",
            )
            diffc = F.when(F.col("cid_exact") != F.col("cid_pruned"), 1).otherwise(0)
            row = j.agg(
                F.count("*").alias("n"),
                F.sum(diffc).alias("n_diff"),
                F.sum(F.col("dist_pruned") - F.col("dist_exact")).alias("regret"),
                F.max(F.col("dist_pruned") - F.col("dist_exact")).alias("max_regret"),
            ).collect()[0]
            print(
                json.dumps(
                    {"variant": "same_centroids_regret", "cap": cap, "k": k, "n": n,
                     "pivots": p, "n_diff": row["n_diff"],
                     "frac_diff": round(row["n_diff"] / row["n"], 4),
                     "total_regret": row["regret"],
                     "max_regret": row["max_regret"]}
                ),
                flush=True,
            )
        return
    if args.pivots:
        cap = max(int(c) for c in args.caps.split(","))
        k = max(1, min(cap, n // 64))
        for p in (int(x) for x in args.pivots.split(",")):
            best = None
            for _ in range(args.runs):
                t0 = time.time()
                _, assigned = kmeans_kn_pruned_fit(emb, cap=cap, p=p)
                assigned.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(
                json.dumps(
                    {"variant": "pruned", "cap": cap, "k": k, "n": n,
                     "pivots": p, "sec": round(best, 2)}
                ),
                flush=True,
            )
        return
    for cap in (int(c) for c in args.caps.split(",")):
        k = max(1, min(cap, n // 64))
        for label, fit in (("flat", kmeans_kn_fit), ("pruned", kmeans_kn_pruned_fit)):
            best = None
            for _ in range(args.runs):
                t0 = time.time()
                _, assigned = fit(emb, cap=cap)
                assigned.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(
                json.dumps(
                    {"variant": label, "cap": cap, "k": k, "n": n,
                     "sec": round(best, 2)}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
