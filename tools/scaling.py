"""Scale-up study: replicate testdata 10x (sf0.1 -> "sf1") and measure how
the headline plans' wall-clock grows vs the data.

The driver ships sf0.001/0.01/0.1 only; the 100 TB claim rests on plan
shape. This tool adds MEASURED evidence: it synthesizes an sf1-equivalent
dataset by replicating sf0.1 with key offsets (event/user/vector ids shifted
per replica so keyed structure — sessions per user, top-k candidates,
fold groups — replicates instead of collapsing), then times a
representative query slice at all three scales on the same local[N] session.

Replication choices:
- events: event_id and user_id offset per replica; timestamps unchanged, so
  the corpus keeps its 30-day span at 10x density — windows/sessions see 10x
  groups of identical per-group size, the scale-up shape a cluster sees.
- lineitem: l_orderkey offset (q1 never joins; the scan/agg is the subject).
- embeddings: vec_id offset; vectors repeat, which leaves top-k scan cost
  intact (scoring dominates; duplicate scores are fine for timing).
- documents are NOT replicated: copying text verbatim would make every
  replica an exact near-dup cluster and quadratically inflate the LSH pair
  graph — a different workload, not a scale-up of the same one. The dedup
  family's scale evidence stays plan-shape-based (banded candidates only).

Usage:
    python tools/scaling.py --out /tmp/spark_graft_sf1 [--runs 2]
Prints one JSON line per (query, sf) with warm seconds.
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

REPLICAS = 10
OFFSET = 10_000_000  # beyond every real key in sf0.1

QUERIES = (
    "cdc_transactions_view",   # CDC fold: window + 20-field groupBy, 1 shuffle
    "q1_pricing_summary",      # pure scan + hash agg
    "w_session_windows",       # native session_window groupBy
    "w_hist_quantiles",        # bounded-grid quantile sketch
    "e_mips_topk",             # map-only scoring + TakeOrderedAndProject
)


def build_sf1(spark, src: str, dest: str) -> None:
    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read

    os.makedirs(dest, exist_ok=True)

    def replicate(name: str, keys: dict[str, str]) -> None:
        out = f"{dest}/{name}.parquet"
        # require the commit marker: a bare exists() would silently reuse a
        # truncated dataset left by a killed earlier run
        if os.path.exists(f"{out}/_SUCCESS"):
            return
        df = read(spark, src, name)
        k = F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias("_r")
        rep = df.select("*", k)
        for col in keys.values():
            rep = rep.withColumn(col, F.col(col) + F.col("_r") * F.lit(OFFSET))
        rep.drop("_r").write.mode("overwrite").parquet(out)

    replicate("events", {"e": "event_id", "u": "user_id"})
    replicate("lineitem", {"o": "l_orderkey"})
    replicate("embeddings", {"v": "vec_id"})
    # small dims used by some queries: plain copies
    for name in ("orders", "customer", "part", "supplier", "nation", "region",
                 "documents"):
        out = f"{dest}/{name}.parquet"
        if not os.path.exists(f"{out}/_SUCCESS"):
            read(spark, src, name).write.mode("overwrite").parquet(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    def positive(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--runs must be >= 1")
        return n

    ap.add_argument("--runs", type=positive, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pagopa_ecommerce_cdc_service_spark.session import build_session

    spark = build_session(master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    import __spark_entry__ as entry

    build_sf1(spark, "/root/testdata/sf0.1", args.out)

    qs = entry.queries()
    results: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in (
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", args.out),
    ):
        for name in QUERIES:
            best = None
            for _ in range(args.runs):
                # noop sink = full computation (count() would let Catalyst
                # prune the aggregate/measure expressions under a count(1))
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[sf_label] = round(best, 3)
            print(json.dumps({"query": name, "sf": sf_label, "sec": round(best, 3)}),
                  flush=True)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
