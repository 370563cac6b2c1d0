"""3-run warm-protocol measurement for individual suite queries.

The bench regression gate and drift audits use this protocol (established
round 4, e_pq_topk precedent): 3 consecutive noop-sink runs of each query
in ONE session at sf0.1 local[32]; the minimum is the WARM floor, with the
first run reported separately as the cold number. Host variance on
sub-second entries shows up as cold≈warm≫baseline; a real plan regression
shows up as a warm floor well above baseline.

Usage: python tools/warm_measure.py q1 q2 ...  [--sf-dir DIR] [--runs 3]
Prints one JSON line per query: {"query", "cold", "warm_floor", "runs"}.
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
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pagopa_ecommerce_cdc_service_spark.session import build_session

    import __spark_entry__ as entry_mod

    spark = build_session(
        app_name="cdc-spark-warm",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    qs = entry_mod.queries()
    # session bring-up warm-up (JVM codegen + Python worker pool), as bench.py
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(100).toDF("doc_id").selectExpr(
        "doc_id", "'x' AS text"
    ).mapInPandas(lambda it: it, "doc_id bigint, text string").write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args.queries:
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "cold": times[0],
                    "warm_floor": min(times[1:]) if len(times) > 1 else times[0],
                    "runs": times,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
