"""Skew study for the weighted-MinHash CANDIDATE join (round-13 queue item).

t_wminhash_pairs generates candidates by self-joining the banded
signature table on (band_idx, bkey).  A hot band bucket — one large
verbatim-duplicate cluster — concentrates that join on a single key.
This tool measures three semantically identical candidate-stage shapes
at the sf1 decade, on the uniform corpus AND on a hot-cluster variant
(a ~0.33% slice of documents rewritten to one shared template, i.e. one
band bucket of ~2k docs against a typical bucket of 2-5):

- join  (registered): bands self-join + distinct (AQE skew-join eligible)
- inrow: groupBy bucket -> collect_list -> in-row sorted pair explode
         (one exchange, but a hot bucket materializes as ONE row)
- split: inrow for buckets <= CAP, self-join restricted to hot buckets
         (bounded key count) — the salting-discipline hybrid

All three emit the same (doc_a < doc_b) candidate pair multiset before
distinct; the study times candidates-through-distinct with a noop sink
(verification cost is pair-count-bound and identical across shapes).

Usage: python tools/wminhash_skew_study.py [--sf1 /tmp/spark_graft_sf1]
       [--runs 2] [--cpus 32] [--hot-mod 300]
Prints one JSON line per (corpus, shape, run).
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

from pyspark.sql import functions as F  # noqa: E402

_CAP = 64  # split shape: buckets larger than this take the join path


def _bands(spark, docs_dir):
    """The registered query's chain up to the banded signature table
    (constants and expressions mirror plans/text_queries.py)."""
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import MINHASH_PERMS
    from pagopa_ecommerce_cdc_service_spark.operators.text import MERSENNE31
    from pagopa_ecommerce_cdc_service_spark.operators.text import shingle_hashes31
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import spread
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _B,
        _K,
        _R,
        _WMH_MAX_W,
        _WMH_REP_A,
        _WMH_REP_B,
        band_key,
    )

    docs = spread(
        spark.read.parquet(f"{docs_dir}/documents.parquet"), spark
    ).select("doc_id", shingle_hashes31(F.col("text")).alias("sh"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    sh = docs.select("doc_id", F.explode("sh").alias("h"))
    dfreq = sh.groupBy("h").agg(F.count("*").cast("long").alias("df"))
    hi = (
        dfreq.crossJoin(F.broadcast(n))
        .filter(F.col("df") * F.lit(1 << _WMH_MAX_W).cast("long") > F.col("n_docs"))
        .select("h", "df")
    )
    shw = (
        sh.join(F.broadcast(hi), "h", "left")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "w",
            F.when(F.col("df").isNull(), F.lit(_WMH_MAX_W).cast("long")).otherwise(
                F.least(
                    F.lit(_WMH_MAX_W).cast("long"),
                    F.greatest(
                        F.lit(1).cast("long"),
                        (F.length(F.bin(F.expr("n_docs div df"))) - 1).cast("long"),
                    ),
                )
            ),
        )
        .select("doc_id", "h", "w")
    )
    rep = shw.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.col("w") - 1),
                lambda j: (F.col("h") * F.lit(_WMH_REP_A) + j * F.lit(_WMH_REP_B))
                % MERSENNE31,
            )
        ).alias("rh"),
    )
    sigs = rep.groupBy("doc_id").agg(
        *[
            F.min((F.col("rh") * MINHASH_PERMS[i][0] + MINHASH_PERMS[i][1]) % MERSENNE31).alias(f"_s{i}")
            for i in range(_K)
        ]
    ).select("doc_id", F.array(*[f"_s{i}" for i in range(_K)]).alias("sig"))
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[band_key(F.col("sig"), bi, _R) for bi in range(_B)])
        ).alias("band_idx", "bkey"),
    )


def _cand_join(bands):
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _pairs_inrow(buckets):
    ds = F.array_sort(F.col("ds"))
    return buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ds,
                    lambda x, i: F.transform(
                        F.slice(ds, i + 2, F.size(ds)), lambda y: F.struct(
                            x.alias("doc_a"), y.alias("doc_b")
                        )
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")


def _cand_inrow(bands):
    buckets = (
        bands.groupBy("band_idx", "bkey")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    return _pairs_inrow(buckets).distinct()


def _cand_split(bands):
    sizes = bands.groupBy("band_idx", "bkey").agg(F.count("*").alias("bs"))
    hot_keys = sizes.filter(F.col("bs") > _CAP).select("band_idx", "bkey")
    cold = (
        bands.join(F.broadcast(hot_keys), ["band_idx", "bkey"], "left_anti")
        .groupBy("band_idx", "bkey")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    hot = bands.join(F.broadcast(hot_keys), ["band_idx", "bkey"])
    return _pairs_inrow(cold).unionByName(_cand_join(hot)).distinct()


SHAPES = {"join": _cand_join, "inrow": _cand_inrow, "split": _cand_split}


def _stage_hot(spark, sf1_dir, out_dir, hot_mod):
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long

    if os.path.exists(f"{out_dir}/documents.parquet/_SUCCESS"):
        return
    docs = spark.read.parquet(f"{sf1_dir}/documents.parquet")
    template = (
        "spark graft hot cluster template row the quick brown fox jumps over "
        "the lazy dog while the weighted minhash study measures candidate "
        "join skew under one giant verbatim duplicate bucket of documents "
    ) * 4
    hot = md5_long(F.concat(F.lit("wsk:"), F.col("doc_id").cast("string"))) % hot_mod == 0
    docs.withColumn(
        "text", F.when(hot, F.lit(template)).otherwise(F.col("text"))
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/spark_graft_sf1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--hot-mod", type=int, default=300)
    ap.add_argument("--hot-dir", default="/tmp/spark_graft_sf1_hotdocs")
    ap.add_argument("--shapes", default="join,inrow,split")
    ap.add_argument("--corpora", default="uniform,hot")
    args = ap.parse_args()

    from pagopa_ecommerce_cdc_service_spark.session import build_session

    spark = build_session(
        app_name="wminhash-skew-study",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    _stage_hot(spark, args.sf1, args.hot_dir, args.hot_mod)
    corpora = {"uniform": args.sf1, "hot": args.hot_dir}

    for corpus in args.corpora.split(","):
        for shape in args.shapes.split(","):
            for run in range(args.runs):
                t0 = time.perf_counter()
                df = SHAPES[shape](_bands(spark, corpora[corpus]))
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 2)
                print(
                    json.dumps(
                        {"corpus": corpus, "shape": shape, "run": run, "sec": dt}
                    ),
                    flush=True,
                )
                spark.catalog.clearCache()
    # pair-set equality spot check (cheap corpus: uniform at sf0.1)
    small = "/root/testdata/sf0.1"
    base = None
    for shape in args.shapes.split(","):
        got = SHAPES[shape](_bands(spark, small)).count()
        print(json.dumps({"equality_check": shape, "n_pairs": got}), flush=True)
        if base is None:
            base = got
        elif got != base:
            print(json.dumps({"MISMATCH": shape}), flush=True)
            sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
