"""Prefix-only replica of the driver's correctness gate.

The driver certifies exactly the FIRST 50 registered queries each round
(Spark vs DuckDB oracle at sf0.01, row count + sorted-column values).
tests/test_oracle_parity.py covers all 262 queries (~14 min at sf0.01);
this tool runs ONLY the 50-slot prefix — the rows that actually land in
CORRECTNESS_r{N}.json — and prints one CORRECTNESS-style JSON line per
query plus a summary, in a few minutes. Use it as the fast end-of-round
preflight after any prefix rotation.

Usage: python tools/gate_preflight.py [--sf-dir /root/testdata/sf0.01]
       [--limit 50] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# the one comparison function, shared verbatim with
# tests/test_oracle_parity.py (round-13 ADVICE: the preflight briefly
# carried a Decimal→float coercion the parity suite did not — the shared
# module keeps the STRICT no-coercion semantics, see tools/compare.py)
from tools.compare import kind_diff as _kind_diff  # noqa: E402
from tools.compare import normalize as _normalize  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    args = ap.parse_args()

    import duckdb

    from pagopa_ecommerce_cdc_service_spark.session import build_session

    import __spark_entry__ as entry_mod

    spark = build_session(
        app_name="cdc-spark-preflight",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    prefix = list(queries)[: args.limit]

    bad = []
    for name in prefix:
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "err": None,
        }
        try:
            spark_pd = queries[name](spark, args.sf_dir).toPandas()
            s_cols, s_rows = _normalize(spark_pd)
            rec["spark_rows"] = len(s_rows)
            if name in oracles:
                oracle_pd = con.execute(oracles[name]).fetchdf()
                o_cols, o_rows = _normalize(oracle_pd)
                rec["oracle_rows"] = len(o_rows)
                rec["rows_match"] = len(s_rows) == len(o_rows)
                rec["schema_match"] = s_cols == o_cols
                # element-wise tuple equality over canonicalized cells plus
                # the dtype-KIND check — both from tools/compare.py, the
                # SAME code path tests/test_oracle_parity.py asserts
                rec["hash_match"] = (
                    not _kind_diff(spark_pd, oracle_pd) and s_rows == o_rows
                )
            else:
                # runtime-only check (no oracle): rows-only, like the driver
                rec["rows_match"] = True
                rec["schema_match"] = True
                rec["hash_match"] = None
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        finally:
            # release any relation a query persist()ed for its own multi-arm
            # re-reads (t_corpus_pipeline_chunked / t_pack_capacity_train
            # discipline) — queries are independent, so nothing may outlive
            # its own invocation in this long-lived session
            spark.catalog.clearCache()
        ok = rec["rows_match"] and rec["schema_match"] and (
            rec["hash_match"] is not False
        ) and rec["err"] is None
        if not ok:
            bad.append(name)
        print(json.dumps({name: rec}), flush=True)

    print(
        json.dumps(
            {"preflight": {"checked": len(prefix), "failed": bad}}
        )
    )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
