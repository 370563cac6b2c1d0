"""Quality-adjudicated keep-one chunk rewrite (t_chunk_keepone_rewrite).

Laws pinned (the sf0.01 oracle-parity gate certifies values; these pin the
POLICY semantics and the exact token/char accounting, keepone_stress-style):

1. MASS identity: both rewrite policies (cut-non-first, quality keep-one)
   drop exactly (n_occ - 1) * chunk_len chars per duplicated eligible
   group, so their TOTAL rebuilt mass is identical and equals
   total_chars - sum(droppable_chars from t_chunk_dedup_stats). Verified
   on the violently self-duplicated mixed corpus (long docs inflated by
   whole-text repetition — the worst case for the dedup window).
2. POLICY divergence: when the shared chunk's highest-quality host is NOT
   the first occurrence, keep-one preserves it in the high-quality doc
   and cuts it from the low-quality one — the opposite of cut-non-first.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
    QUERIES,
    _CHUNK_DEDUP_MIN_LEN,
    _chunk_rows,
)


def test_keepone_total_mass_matches_stats(spark, sf_dir):
    total_chars = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.sum(F.length("text")))
        .collect()[0][0]
    )
    droppable = (
        QUERIES["t_chunk_dedup_stats"](spark, sf_dir)
        .agg(F.sum("droppable_chars"))
        .collect()[0][0]
        or 0
    )
    keepone = (
        QUERIES["t_chunk_keepone_rewrite"](spark, sf_dir)
        .agg(F.sum("rebuilt_len"))
        .collect()[0][0]
    )
    cutfirst = (
        QUERIES["t_chunk_dedup_rewrite"](spark, sf_dir)
        .agg(F.sum("rebuilt_len"))
        .collect()[0][0]
    )
    assert keepone == total_chars - droppable
    assert cutfirst == keepone  # same dropped MASS, different survivors


def _rewrite_keepone(spark, docs):
    # drive the policy on an in-memory corpus through the same operators
    from pyspark.sql import Window

    from pagopa_ecommerce_cdc_service_spark.operators.text import tokens
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _rebuild_dropping,
    )

    q = docs.select(
        "doc_id",
        F.size(F.array_distinct(tokens(F.col("text")))).cast("long").alias("nd"),
        F.length("text").cast("long").alias("nc"),
    )
    c = (
        _chunk_rows(docs)
        .select("doc_id", "chunk_idx", "chunk_len", "chunk_hash")
        .join(q, "doc_id")
    )
    rn = F.row_number().over(
        Window.partitionBy("chunk_hash", "chunk_len").orderBy(
            F.col("nd").desc(), F.col("nc").desc(), "doc_id", "chunk_idx"
        )
    )
    drops = (
        c.withColumn("rn", rn)
        .filter((F.col("chunk_len") >= _CHUNK_DEDUP_MIN_LEN) & (F.col("rn") > 1))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("chunk_idx")).alias("dropped_idx"))
    )
    return {
        r["doc_id"]: r.asDict()
        for r in _rebuild_dropping(docs, drops).collect()
    }


@pytest.fixture(scope="module")
def shared_passage_corpus(spark):
    # doc 1 (low quality): exactly the shared passage — few distinct tokens.
    # doc 2 (high quality): the same passage + a distinct-token-rich tail.
    # Interior chunks of the passage coincide (content-defined boundaries
    # are shift-invariant), so the shared groups' highest-quality host is
    # doc 2 — the LATER doc_id, which cut-non-first would cut.
    # varied (non-periodic) content so the content-defined chunker actually
    # cuts (~every 64 chars); a periodic string can visit no hash residue
    # ≡ 0 mod 64 and collapse to a single chunk
    passage = " ".join(f"w{(i * 7) % 97}q{i % 13}z{i}" for i in range(120))
    tail = " " + " ".join(f"uniq{i}token" for i in range(80))
    return spark.createDataFrame(
        [(1, passage), (2, passage + tail)], "doc_id long, text string"
    )


def test_keepone_prefers_high_quality_host(spark, shared_passage_corpus):
    out = _rewrite_keepone(spark, shared_passage_corpus)
    docs = {r["doc_id"]: r["text"] for r in shared_passage_corpus.collect()}
    # the high-quality doc keeps its full text
    assert out[2]["rebuilt_text"] == docs[2]
    # the low-quality doc lost the shared interior chunks
    assert out[1]["rebuilt_len"] < len(docs[1])
    assert out[1]["n_kept"] < out[2]["n_kept"]


def test_cut_non_first_is_the_opposite_policy(spark, shared_passage_corpus):
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _chunk_rewrite,
    )

    out = {
        r["doc_id"]: r.asDict()
        for r in _chunk_rewrite(shared_passage_corpus).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in shared_passage_corpus.collect()}
    # global-first keeps doc 1 intact and cuts the shared chunks from doc 2
    assert out[1]["rebuilt_text"] == docs[1]
    assert out[2]["rebuilt_len"] < len(docs[2])
