"""Capture ``.explain("formatted")`` output for a set of queries.

Round-14 optimization deliverable: ``plans/r14/<query>_before.txt`` /
``..._after.txt`` — the physical-plan evidence for every query an
optimization touched. Runs the query function (so RUNTIME queries capture
their final DataFrame's plan) and writes the formatted explain string.

Usage:
    python tools/explain_capture.py --suffix before q1 q2 ...
    python tools/explain_capture.py --suffix after --names-file changed.txt
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--names-file")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=str(_REPO / "plans" / "r14"))
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    args = ap.parse_args()

    names = list(args.queries)
    if args.names_file:
        names += [
            line.strip()
            for line in Path(args.names_file).read_text().splitlines()
            if line.strip()
        ]

    from pagopa_ecommerce_cdc_service_spark.session import build_session

    import __spark_entry__ as entry_mod

    spark = build_session(
        app_name="cdc-spark-explain",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    qs = entry_mod.queries()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"skip (unknown): {name}", file=sys.stderr)
            continue
        df = qs[name](spark, args.sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{args.suffix}.txt").write_text(text)
        print(f"wrote {name}_{args.suffix}.txt ({len(text)} bytes)", flush=True)


if __name__ == "__main__":
    main()
