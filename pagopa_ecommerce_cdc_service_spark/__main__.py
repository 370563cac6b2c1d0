"""Command-line surface: run any suite query, its DuckDB oracle, or both.

A user of the reference service interacts with a running daemon; a user of
this engine interacts with queries. This CLI makes every registered query
runnable without writing a driver script:

    python -m pagopa_ecommerce_cdc_service_spark list
    python -m pagopa_ecommerce_cdc_service_spark run cdc_transactions_view \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m pagopa_ecommerce_cdc_service_spark check t_minhash_lsh_pairs \
        --sf-dir /root/testdata/sf0.01

``run`` executes the Spark plan and prints rows; ``check`` also runs the
query's DuckDB oracle over the same parquet tables and reports whether the
(sorted-column, order-insensitive) results match — the same comparison the
correctness gate performs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from .plans.helpers import TABLES


def _suite():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def _session(cpus: int):
    from .session import build_session

    return build_session(
        app_name="cdc-spark-cli", master=f"local[{cpus}]", shuffle_partitions=cpus
    )


def cmd_list() -> int:
    queries, oracles = _suite()
    for name in queries:
        tag = "oracle" if name in oracles else "rows-only"
        print(f"{name}\t{tag}")
    return 0


def cmd_run(name: str, sf_dir: str, cpus: int, limit: int) -> int:
    queries, _ = _suite()
    if name not in queries:
        print(f"unknown query {name!r} — see `list`", file=sys.stderr)
        return 2
    spark = _session(cpus)
    df = queries[name](spark, sf_dir)
    df.show(limit, truncate=False)
    return 0


def _normalize(df_pandas):
    """The correctness gate's comparison (tests/test_oracle_parity.py):
    typed values under sorted column names, NaN normalized — NOT a string
    compare, which would diverge on -0.0 vs 0.0 or Decimal scale."""
    import math

    def cell(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return v

    cols = sorted(df_pandas.columns)
    rows = [
        tuple(cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


def cmd_check(name: str, sf_dir: str, cpus: int) -> int:
    import duckdb

    queries, oracles = _suite()
    if name not in queries:
        print(f"unknown query {name!r} — see `list`", file=sys.stderr)
        return 2
    if name not in oracles:
        print(f"{name} has no oracle (rows-only query)", file=sys.stderr)
        return 2
    spark = _session(cpus)
    got = queries[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = con.execute(oracles[name]).df()
    a_cols, a_rows = _normalize(got)
    b_cols, b_rows = _normalize(want)
    if a_cols != b_cols:
        print(f"MISMATCH: columns {a_cols} != {b_cols}")
        return 1
    if a_rows != b_rows:
        print(f"MISMATCH: spark {len(a_rows)} rows vs oracle {len(b_rows)}")
        # equal cardinality ≠ equal content: show the first differing rows
        # from each side so the user has something to debug with
        # repr keys: cells may be unhashable (array/struct columns)
        b_set = {repr(r) for r in b_rows}
        a_set = {repr(r) for r in a_rows}
        only_spark = [r for r in a_rows if repr(r) not in b_set]
        only_oracle = [r for r in b_rows if repr(r) not in a_set]
        for label, rows in (("spark", only_spark), ("oracle", only_oracle)):
            for r in rows[:5]:
                print(f"  only-in-{label}: {dict(zip(a_cols, r))}")
            if len(rows) > 5:
                print(f"  ... and {len(rows) - 5} more only-in-{label} rows")
        return 1
    print(f"OK: {name} matches oracle ({len(a_rows)} rows) at {sf_dir}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pagopa_ecommerce_cdc_service_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for verb in ("run", "check"):
        p = sub.add_parser(verb)
        p.add_argument("name")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        p.add_argument("--cpus", type=int, default=4)
        if verb == "run":
            p.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)
    if args.cmd == "list":
        return cmd_list()
    if args.cmd == "run":
        return cmd_run(args.name, args.sf_dir, args.cpus, args.limit)
    return cmd_check(args.name, args.sf_dir, args.cpus)


if __name__ == "__main__":
    sys.exit(main())
