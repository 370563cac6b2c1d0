"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payload columns + typed metadata structs
and implements the Spark-side machinery a 100 TB media pipeline needs:
Arrow-batched ``mapInPandas`` decode/feature stages with explicit schemas,
per-partition batching, and no driver-side collection.

The actual codec step is STUBBED: this container ships no image/audio
libraries, so ``decode_image`` raises ``NotImplementedError`` unless PIL is
importable, and the pipeline uses :func:`fake_decode_meta` — a deterministic
byte-level "decode" — to keep every seam (schema, batch shape, partitioning)
real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HIST_BUCKETS = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_hist", T.ArrayType(T.LongType())),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def decode_image(payload: bytes):
    """Real decode — requires an imaging library (not in this image)."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires PIL/pillow; use fake_decode_meta for "
            "pipeline plumbing tests"
        ) from exc


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a codec header parse: derives a fake
    (width, height) from the first payload bytes."""
    if not payload:
        return (0, 0)
    w = 16 + payload[0] % 240
    h = 16 + (payload[len(payload) // 2] if len(payload) > 1 else payload[0]) % 240
    return (w, h)


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched per-partition feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload: bytes = bytes(r["payload"]) if r["payload"] is not None else b""
                meta = r["meta"] or {}
                arr = np.frombuffer(payload, dtype=np.uint8)
                # 256/N_HIST_BUCKETS = 16-wide buckets → arr >> 4
                hist = np.bincount(arr >> 4, minlength=N_HIST_BUCKETS).tolist()
                total = int(arr.sum())
                w, h = fake_decode_meta(payload)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "media_type": meta.get("media_type"),
                        "n_bytes": len(payload),
                        "mean_byte": (total / len(payload)) if payload else None,
                        "byte_hist": hist,
                        "fake_width": w,
                        "fake_height": h,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media_df.mapInPandas(run, schema=FEATURES_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table in-flight from ``documents`` (payload = utf-8
    bytes) so the plumbing is exercised without binary fixtures on disk."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain;fake-image").alias("media_type"),
            F.col("n_chars").cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def frame_sample(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling stub: emit n evenly-spaced byte offsets per
    payload ('frame' boundaries) — pure Spark, the decode itself is stubbed."""
    chunk = (F.length("payload") / n_frames).cast("long")
    offsets = F.transform(F.sequence(F.lit(0), F.lit(n_frames - 1)), lambda i: i * chunk)
    return media_df.select(
        "media_id",
        F.length("payload").cast("long").alias("payload_bytes"),
        offsets.alias("frame_offsets"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("orig_width", T.LongType()),
        T.StructField("orig_height", T.LongType()),
        T.StructField("target_width", T.LongType()),
        T.StructField("target_height", T.LongType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
        T.StructField("resized_payload", T.BinaryType()),
    ]
)


def resize_media(media_df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Arrow-batched resize stage. The geometry (aspect-preserving fit into
    target, scale factors) is real; the pixel resample is STUBBED — it
    requires the decoder, so the "resized payload" is a deterministic
    truncation sized like the real output would be."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload: bytes = bytes(r["payload"]) if r["payload"] is not None else b""
                ow, oh = fake_decode_meta(payload)
                if ow == 0 or oh == 0:
                    tw = th = 0
                else:
                    # aspect-preserving fit
                    s = min(target_w / ow, target_h / oh)
                    tw, th = max(1, int(ow * s)), max(1, int(oh * s))
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "orig_width": ow,
                        "orig_height": oh,
                        "target_width": tw,
                        "target_height": th,
                        "scale_x": (tw / ow) if ow else None,
                        "scale_y": (th / oh) if oh else None,
                        # stub: sized like a real tw*th single-channel output
                        "resized_payload": (payload * ((tw * th) // max(1, len(payload)) + 1))[: tw * th],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media_df.mapInPandas(run, schema=RESIZE_SCHEMA)
