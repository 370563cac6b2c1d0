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
import decimal
import json
import math
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


def _norm_cell(v):
    # Match tests/test_oracle_parity.py's comparison semantics: DuckDB can
    # hand back decimal.Decimal where Spark's toPandas gives float64 (and
    # vice versa), and IEEE -0.0 vs 0.0 repr-differ while comparing equal.
    # Canonicalize BEFORE sorting/comparing so the preflight verdict cannot
    # diverge from the gate on dtype cosmetics.
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


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
                # element-wise tuple equality over canonicalized cells —
                # the same comparison tests/test_oracle_parity.py performs
                # (repr-equality would re-introduce the dtype cosmetics
                # _norm_cell just erased) — plus the parity suite's
                # dtype-KIND check: Python's 1 == 1.0 would otherwise hide
                # an int column coming back float from one engine
                def _kind(dt):
                    s = str(dt)
                    if "int" in s:
                        return "int"
                    if "float" in s or "double" in s:
                        return "float"
                    if "datetime" in s:
                        return "ts"
                    return "other"

                kind_ok = all(
                    _kind(spark_pd[c].dtype) == _kind(oracle_pd[c].dtype)
                    for c in spark_pd.columns
                    if c in oracle_pd.columns
                )
                rec["hash_match"] = kind_ok and s_rows == o_rows
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
