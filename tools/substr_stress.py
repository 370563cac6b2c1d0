"""ExactSubstr stress on a TRULY duplicated corpus.

The standard scaling decade perturbs every second token, which breaks
8-gram matches — good for the dedup-pair studies, but it understates the
ExactSubstr posting pipeline's real workload. This study builds a corpus
where every 5th document splices a shared 40-token passage (pool of 50)
into unique filler, so duplicated-window volume scales WITH the corpus,
and times t_exact_substr_spans' operator at 1x and 10x. Span counts are
exact ground truth (one 40-token span per spliced doc), so the run is a
correctness check at volume too.

Usage: python tools/substr_stress.py
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from pyspark.sql import functions as F
from pagopa_ecommerce_cdc_service_spark.session import build_session
from pagopa_ecommerce_cdc_service_spark.operators.text import exact_substr_spans

spark = build_session(master="local[32]", shuffle_partitions=32)
spark.range(100).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

def corpus(n):
    # 200 unique filler tokens per doc; every 5th doc splices a shared
    # 40-token passage (pool of 50 passages) after token 80 — all
    # generated JVM-side, deterministic from id
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat_ws(" ", F.transform(F.sequence(F.lit(1), F.lit(80)),
                lambda i: F.concat(F.lit("w"), F.col("id"), F.lit("_"), i))),
            F.when(
                F.col("id") % 5 == 0,
                F.concat_ws(" ", F.transform(F.sequence(F.lit(1), F.lit(40)),
                    lambda j: F.concat(F.lit("p"), F.col("id") % 50, F.lit("_"), j))),
            ).otherwise(
                F.concat_ws(" ", F.transform(F.sequence(F.lit(1), F.lit(40)),
                    lambda j: F.concat(F.lit("x"), F.col("id"), F.lit("_"), j)))
            ),
            F.concat_ws(" ", F.transform(F.sequence(F.lit(81), F.lit(160)),
                lambda i: F.concat(F.lit("w"), F.col("id"), F.lit("_"), i))),
        ).alias("text"),
    )

for n in (5_000, 50_000):
    path = f"/tmp/substr_stress_{n}"
    corpus(n).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    best = None
    for _ in range(2):
        t0 = time.time()
        exact_substr_spans(docs, w=8).write.format("noop").mode("overwrite").save()
        best = min(best or 9e9, time.time() - t0)
    spans = exact_substr_spans(docs, w=8)
    agg = spans.agg(F.count("*").alias("n_spans"), F.sum("span_tokens").alias("dup_tokens")).collect()[0]
    print(f"n_docs={n} tokens={n*200} wall={round(best,2)}s spans={agg.n_spans} dup_tokens={agg.dup_tokens}")
spark.stop()
