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
