"""Recall sweep for the semantic-decontamination prune (round 13).

e_decontaminate_semantic compares each train vector against the eval
items probing its IVF list.  The prune trades RECALL — the one quantity
a decontamination pass exists to maximize — so the registered nprobe
default is set by this measurement, not by convention (SCALING.md
records the round-13 table: 2/8 captured only 0.33-0.55 of true
contamination pairs on this near-orthogonal corpus; the default moved
to the 6/8 knee, 0.87-0.94).

Both arms run in DuckDB over the registered membership/threshold law:
the exhaustive arm is the full train × eval threshold scan (linear —
the eval set is fixed-size), the pruned arm restricts eval items to
their nprobe nearest lists.  Pair recall = pruned hits / exhaustive
hits.

Usage: python tools/decon_recall_sweep.py [--nprobes 2,3,4,6,8]
       [--dirs sf0.001:...,sf0.01:...,...]
Prints one line per scale with the recall at each nprobe.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

_DEFAULT_DIRS = (
    "sf0.001:/root/testdata/sf0.001/embeddings.parquet,"
    "sf0.01:/root/testdata/sf0.01/embeddings.parquet,"
    "sf0.1:/root/testdata/sf0.1/embeddings.parquet,"
    "sf1:/tmp/spark_graft_sf1/embeddings.parquet/*.parquet"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprobes", default="2,3,4,6,8")
    ap.add_argument("--dirs", default=_DEFAULT_DIRS)
    args = ap.parse_args()

    import duckdb

    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long_sql
    from pagopa_ecommerce_cdc_service_spark.operators.similarity import (
        dist2_sql,
        dot_sql,
        quantize_sql,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _ED_COS,
        _ED_TARGET,
        _N_PIVOTS,
    )

    qv = quantize_sql("embedding")
    member = md5_long_sql("'ed:' || CAST(vec_id AS VARCHAR)")
    cos = (
        f"CAST({dot_sql('t.q', 'ev.q')} AS DOUBLE) / "
        f"(sqrt(CAST(t.n2 AS DOUBLE)) * sqrt(CAST(ev.n2 AS DOUBLE)))"
    )
    for pair in args.dirs.split(","):
        name, path = pair.split(":", 1)
        con = duckdb.connect()
        try:
            con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        except duckdb.IOException:
            print(name, "SKIP (no data at", path + ")")
            continue
        base = f"""
          WITH e0 AS (
            SELECT vec_id, {qv} AS q, {member} % tot0.dd AS m
            FROM embeddings CROSS JOIN
                 (SELECT (count(*) + {_ED_TARGET - 1}) // {_ED_TARGET} AS dd
                  FROM embeddings) tot0
          ),
          en AS (SELECT vec_id, q, m, {dot_sql("q", "q")} AS n2 FROM e0),
          piv AS (SELECT vec_id AS pid, q AS pv FROM e0
                  WHERE vec_id BETWEEN 1 AND {_N_PIVOTS}),
          assign AS (
            SELECT en.vec_id, en.q, en.n2, en.m, p.pid,
                   ROW_NUMBER() OVER (PARTITION BY en.vec_id
                                      ORDER BY {dist2_sql("en.q", "p.pv")}, p.pid) AS rn
            FROM en, piv p),
          t AS (SELECT vec_id, q, n2, pid FROM assign WHERE rn = 1 AND m <> 1),
          ev AS (SELECT vec_id AS eval_id, q, n2 FROM en WHERE m = 1),
          evp AS (
            SELECT ev.eval_id, p.pid,
                   ROW_NUMBER() OVER (PARTITION BY ev.eval_id
                                      ORDER BY {dist2_sql("ev.q", "p.pv")}, p.pid) AS prn
            FROM ev, piv p)
        """
        exact = con.execute(
            base + f"SELECT count(*) FROM t, ev WHERE {cos} >= {_ED_COS}"
        ).fetchone()[0]
        out = [name, "exact_pairs", exact]
        for np_ in (int(x) for x in args.nprobes.split(",")):
            got = con.execute(
                base
                + f"""
              SELECT count(*)
              FROM t JOIN evp ON t.pid = evp.pid AND evp.prn <= {np_}
                   JOIN ev ON ev.eval_id = evp.eval_id
              WHERE {cos} >= {_ED_COS}
            """
            ).fetchone()[0]
            out += [f"np{np_}:", round(got / exact, 3) if exact else None]
        print(*out)


if __name__ == "__main__":
    main()
