"""Multimodal pipeline queries (rows-only driver check — the byte-level
feature extraction runs through Arrow-batched ``mapInPandas``, which has no
practical ANSI-SQL twin; correctness is pytest-golden-tested against a pure
Python recomputation instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import documents_as_media, extract_features, frame_sample
from .helpers import read

QUERIES = {}
ORACLES: dict[str, str] = {}


def mm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return extract_features(media).select(
        "media_id",
        "media_type",
        "n_bytes",
        "mean_byte",
        F.element_at("byte_hist", 7).alias("hist_bucket_6"),
        "fake_width",
        "fake_height",
    )


def mm_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read(spark, sf_dir, "documents")
    return frame_sample(documents_as_media(docs), n_frames=4).select(
        "media_id",
        "payload_bytes",
        F.element_at("frame_offsets", 3).alias("frame2_offset"),
    )


QUERIES["mm_media_features"] = mm_media_features
QUERIES["mm_frame_offsets"] = mm_frame_offsets

# mm_frame_offsets is actually SQL-expressible — give it an oracle.
ORACLES["mm_frame_offsets"] = """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           2 * CAST(octet_length(encode(text)) // 4 AS BIGINT) AS frame2_offset
    FROM documents
"""
