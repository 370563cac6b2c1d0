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


def _payload_geometry(payloads: list[bytes]):
    """Columnar twin of :func:`fake_decode_meta` over a whole Arrow batch:
    returns (lens, buf, starts, width, height) numpy arrays, where ``buf`` is
    every payload concatenated and ``starts`` its per-row offsets."""
    import numpy as np

    n = len(payloads)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens[:-1]))).astype(np.int64)
    nonempty = lens > 0
    width = np.zeros(n, dtype=np.int64)
    height = np.zeros(n, dtype=np.int64)
    if nonempty.any():
        first = buf[starts[nonempty]]
        mid = buf[(starts + lens // 2)[nonempty]]
        width[nonempty] = 16 + first % 240
        height[nonempty] = 16 + mid % 240
    return lens, buf, starts, width, height


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched per-partition feature extraction over binary payloads.

    Fully columnar inside each batch: payloads are concatenated into one
    uint8 buffer and the per-row histograms/sums come from two ``bincount``
    calls over (row-index, bucket) keys — no per-row Python loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in FEATURES_SCHEMA.fields]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(columns=cols)
                continue
            payloads = [b"" if p is None else bytes(p) for p in pdf["payload"]]
            lens, buf, starts, width, height = _payload_geometry(payloads)
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            totals = np.bincount(row_idx, weights=buf, minlength=n)
            # 256/N_HIST_BUCKETS = 16-wide buckets → byte >> 4; one flat
            # bincount over row*16+bucket yields every row's histogram
            flat = row_idx * N_HIST_BUCKETS + (buf >> 4)
            hist = np.bincount(flat, minlength=n * N_HIST_BUCKETS).reshape(
                n, N_HIST_BUCKETS
            )
            metas = [m if isinstance(m, dict) else {} for m in pdf["meta"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": [m.get("media_type") for m in metas],
                    "n_bytes": lens,
                    # NaN → Arrow null for the empty-payload rows
                    "mean_byte": np.where(
                        lens > 0, totals / np.maximum(lens, 1), np.nan
                    ),
                    "byte_hist": list(hist),
                    "fake_width": width,
                    "fake_height": height,
                },
                columns=cols,
            )

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
        import numpy as np

        cols = [f.name for f in RESIZE_SCHEMA.fields]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(columns=cols)
                continue
            payloads = [b"" if p is None else bytes(p) for p in pdf["payload"]]
            _, _, _, ow, oh = _payload_geometry(payloads)
            # aspect-preserving fit, vectorized; empty payloads → 0×0
            valid = (ow > 0) & (oh > 0)
            s = np.minimum(
                target_w / np.maximum(ow, 1), target_h / np.maximum(oh, 1)
            )
            tw = np.where(valid, np.maximum(1, (ow * s).astype(np.int64)), 0)
            th = np.where(valid, np.maximum(1, (oh * s).astype(np.int64)), 0)
            sizes = tw * th
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "orig_width": ow,
                    "orig_height": oh,
                    "target_width": tw,
                    "target_height": th,
                    "scale_x": np.where(ow > 0, tw / np.maximum(ow, 1), np.nan),
                    "scale_y": np.where(oh > 0, th / np.maximum(oh, 1), np.nan),
                    # stub: sized like a real tw*th single-channel output; the
                    # byte tiling is the one inherently per-row step left
                    "resized_payload": [
                        (p * (sz // max(1, len(p)) + 1))[:sz]
                        for p, sz in zip(payloads, sizes.tolist())
                    ],
                },
                columns=cols,
            )

    return media_df.mapInPandas(run, schema=RESIZE_SCHEMA)
