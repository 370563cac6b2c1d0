"""Keep-one ExactSubstr rewrite on a TRULY duplicated corpus: correctness
at volume.

Reuses substr_stress's corpus: every 5th doc splices a shared 40-token
passage chosen by id%50 — and id%5==0 constrains id%50 to multiples of
5, so the EFFECTIVE pool is 10 passages, each spliced by n/50 docs.
Ground truth for the keep-first policy: per passage exactly ONE doc
(the lowest doc_id) keeps its 40 tokens; every other splicing doc loses
its whole 40-token span. Docs are 200 tokens each. So across n docs:
    keepone kept = n*200 - (n/5 - 10) * 40
    cut-all kept = n*200 - (n/5) * 40
The run checks both identities at 1x and 10x and times the keep-one
plan — correctness at duplicated-volume, not just wall-clock.

Usage: python tools/keepone_stress.py
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from pyspark.sql import functions as F
from pagopa_ecommerce_cdc_service_spark.session import build_session
from pagopa_ecommerce_cdc_service_spark.operators.text import (
    exact_substr_keepone_rewrite,
    exact_substr_rewrite,
)

spark = build_session(master="local[32]", shuffle_partitions=32)
spark.range(100).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

for n in (5_000, 50_000):
    path = f"/tmp/substr_stress_{n}"
    docs = spark.read.parquet(path)
    best = None
    for _ in range(2):
        t0 = time.time()
        exact_substr_keepone_rewrite(docs, w=8).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best or 9e9, time.time() - t0)
    k = exact_substr_keepone_rewrite(docs, w=8).agg(
        F.sum("kept_tokens").alias("kept"), F.sum("n_tokens").alias("total")
    ).collect()[0]
    c = exact_substr_rewrite(docs, w=8).agg(
        F.sum("kept_tokens").alias("kept")
    ).collect()[0]
    expect_keepone = n * 200 - (n // 5 - 10) * 40
    expect_cutall = n * 200 - (n // 5) * 40
    print(
        f"n_docs={n} wall={round(best, 2)}s keepone_kept={k.kept} "
        f"(expect {expect_keepone}, match={k.kept == expect_keepone}) "
        f"cutall_kept={c.kept} (expect {expect_cutall}, "
        f"match={c.kept == expect_cutall})"
    )

# ---------------------------------------------------------------------------
# chunk-level keep-one accounting at volume (round 9): on the real corpus
# at sf0.1 and the 10x decade replica, verify the EXACT mass identity
#   sum(rebuilt_len) == total_chars - sum(droppable_chars from stats)
# for BOTH rewrite policies (they drop the same (n_occ-1)*len mass per
# duplicated group; only the survivors differ), and time the keep-one
# plan. Run AFTER tools/scaling.py has built /tmp/spark_graft_sf1.
# ---------------------------------------------------------------------------
import os

from pagopa_ecommerce_cdc_service_spark.plans.text_queries import QUERIES as _TQ

for sf_dir in ("/root/testdata/sf0.1", "/tmp/spark_graft_sf1"):
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        print(f"chunk-keepone: {sf_dir} absent, skipped")
        continue
    total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.sum(F.length("text")))
        .collect()[0][0]
    )
    droppable = (
        _TQ["t_chunk_dedup_stats"](spark, sf_dir)
        .agg(F.sum("droppable_chars"))
        .collect()[0][0]
        or 0
    )
    t0 = time.time()
    keepone = (
        _TQ["t_chunk_keepone_rewrite"](spark, sf_dir)
        .agg(F.sum("rebuilt_len"))
        .collect()[0][0]
    )
    wall = time.time() - t0
    cutall = (
        _TQ["t_chunk_dedup_rewrite"](spark, sf_dir)
        .agg(F.sum("rebuilt_len"))
        .collect()[0][0]
    )
    expect = total - droppable
    print(
        f"chunk-keepone {sf_dir}: total={total} droppable={droppable} "
        f"keepone_kept={keepone} (match={keepone == expect}) "
        f"cutall_kept={cutall} (match={cutall == expect}) wall={round(wall, 2)}s"
    )

spark.stop()
