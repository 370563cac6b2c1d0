"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payload columns + typed metadata structs
and implements the Spark-side machinery a 100 TB media pipeline needs:
Arrow-batched ``mapInPandas`` decode/feature stages with explicit schemas,
per-partition batching, and no driver-side collection.

Codec status: 8-bit BMP is REAL — a pure-Python encoder/decoder
(:func:`encode_bmp_gray8` / :func:`decode_bmp_gray8`) handles the standard
container (file+DIB headers, palette, 4-byte row stride, bottom-up order),
and :func:`resize_bmp_media` / :func:`image_decode_stats` move actual
pixels through Arrow batches under the value-hash gate. Other formats
(PNG/JPEG/audio/video) still need external libraries this container does
not ship: ``decode_image`` dispatches BMP natively, uses PIL when present,
and raises ``NotImplementedError`` otherwise; those pipelines fall back to
:func:`fake_decode_meta` — a deterministic byte-level "decode" — keeping
every seam (schema, batch shape, partitioning) real and testable.
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


BMP_DATA_OFFSET = 14 + 40 + 256 * 4  # file header + BITMAPINFOHEADER + palette
_BMP_PALETTE = b"".join(bytes((i, i, i, 0)) for i in range(256))


def encode_bmp_gray8(pixels) -> bytes:
    """Encode a 2-D uint8 array (rows top-down) as a real 8-bit grayscale BMP:
    BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry palette + BI_RGB pixel
    rows stored bottom-up and padded to 4-byte boundaries — the standard
    on-disk container, parseable by any image tool."""
    import struct

    import numpy as np

    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = pixels.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = pixels
    body = rows[::-1].tobytes()  # bottom-up row order
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_DATA_OFFSET + len(body), 0, 0, BMP_DATA_OFFSET
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, 256, 0
    )
    return header + info + _BMP_PALETTE + body


def decode_bmp_gray8(payload: bytes):
    """Pure-Python BMP decode (8-bit uncompressed): parses the file header,
    DIB header, row stride and bottom-up ordering, returning a 2-D uint8
    array in top-down row-major order. Raises ValueError on a non-BMP
    signature and NotImplementedError for depths/compressions outside the
    8-bit BI_RGB profile this pipeline writes."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    _size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 8 or comp != 0:
        raise NotImplementedError(f"only 8-bit BI_RGB supported, got {bpp}/{comp}")
    bottom_up, h = h > 0, abs(h)
    stride = (w + 3) & ~3
    arr = (
        np.frombuffer(payload, np.uint8, stride * h, data_offset)
        .reshape(h, stride)[:, :w]
    )
    return arr[::-1] if bottom_up else arr


def decode_image(payload: bytes):
    """Decode an image payload to a 2-D uint8 grayscale array.

    BMP payloads decode through the pure-Python parser above (no external
    libs needed); anything else goes through PIL when available and raises
    ``NotImplementedError`` otherwise (PNG/JPEG codecs are not in this
    container)."""
    if payload[:2] == b"BM":
        return decode_bmp_gray8(payload)
    try:
        from PIL import Image
        import io

        import numpy as np

        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "non-BMP decoding requires PIL/pillow; BMP decodes natively"
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


BMP_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("pos_checksum", T.LongType()),
    ]
)


def _synth_pixels(media_id: int):
    """Deterministic test-card image for ``media_id``: geometry and every
    pixel are pure integer functions of the id, so an oracle can recompute
    the decoded stats from first principles without any codec."""
    import numpy as np

    w = 8 + media_id % 9
    h = 8 + media_id % 7
    i = np.arange(w * h, dtype=np.int64)
    return ((media_id * 31 + 7 * i) % 256).astype(np.uint8).reshape(h, w)


def synthesize_bmp_media(docs: DataFrame) -> DataFrame:
    """documents → (media_id, payload) where payload is a REAL encoded BMP
    of the deterministic test card — Arrow-batched binary-column producer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        encode_bmp_gray8(_synth_pixels(int(m))) for m in ids
                    ],
                },
                columns=["media_id", "payload"],
            )

    return docs.select("doc_id").mapInPandas(run, schema=BMP_MEDIA_SCHEMA)


def image_decode_stats(media_df: DataFrame) -> DataFrame:
    """Decode BMP payloads (real container parse: header offsets, stride
    padding, bottom-up flip) and emit integer pixel stats per image.

    ``pos_checksum`` = Σ (i+1)·pᵢ over the TOP-DOWN row-major pixel order is
    position-sensitive: a decoder that mishandles row padding or vertical
    flip cannot hash-match the oracle, unlike order-invariant sums. All
    outputs are exact integers → engine-portable. Map-only stage: zero
    shuffles at any scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in DECODE_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                h, w = px.shape
                flat = px.astype(np.int64).ravel()
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["pixel_sum"].append(int(flat.sum()))
                rows["pos_checksum"].append(
                    int(((np.arange(flat.size, dtype=np.int64) + 1) * flat).sum())
                )
            yield pd.DataFrame(rows, columns=cols)

    return media_df.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


def encode_wav_pcm16(samples, sample_rate: int = 16000) -> bytes:
    """Encode a 1-D int16 array as a real RIFF/WAVE file (PCM, mono,
    16-bit little-endian): RIFF header + fmt chunk + data chunk — the
    standard container, playable by any audio tool."""
    import struct

    import numpy as np

    samples = np.ascontiguousarray(samples, dtype="<i2")
    body = samples.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, byte_rate, 2, 16)
    data = struct.pack("<4sI", b"data", len(body)) + body
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav_pcm16(payload: bytes):
    """Pure-Python WAV decode (PCM16 mono): walks the RIFF chunk list (fmt
    may be followed by optional chunks like LIST before data), validates the
    PCM16 profile, and returns (samples int16 array, sample_rate). Raises
    ValueError on a non-RIFF payload, NotImplementedError outside the
    16-bit PCM profile this pipeline writes."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    sample_rate, bits, channels, audio_format = None, None, None, None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_format, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, pos
            )
            bits = struct.unpack_from("<H", payload, pos + 14)[0]
        elif cid == b"data":
            if audio_format != 1 or bits != 16 or channels != 1:
                raise NotImplementedError(
                    f"only mono PCM16 supported, got fmt={audio_format} "
                    f"bits={bits} ch={channels}"
                )
            samples = np.frombuffer(payload, "<i2", size // 2, pos)
            return samples, sample_rate
        pos += size + (size & 1)  # RIFF chunks are word-aligned
    raise ValueError("no data chunk")


def _synth_samples(media_id: int):
    """Deterministic test waveform: every sample is an integer function of
    the id, so an oracle recomputes decoded stats from first principles."""
    import numpy as np

    n = 64 + media_id % 129
    i = np.arange(n, dtype=np.int64)
    return (((media_id * 17 + 3 * i * i) % 4001) - 2000).astype(np.int16)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("pos_checksum", T.LongType()),
    ]
)


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """documents → (media_id, payload) where payload is a REAL encoded WAV
    of the deterministic test waveform."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        encode_wav_pcm16(_synth_samples(int(m))) for m in ids
                    ],
                },
                columns=["media_id", "payload"],
            )

    return docs.select("doc_id").mapInPandas(run, schema=BMP_MEDIA_SCHEMA)


def audio_decode_stats(media_df: DataFrame) -> DataFrame:
    """Decode WAV payloads (real RIFF chunk walk) and emit integer sample
    stats. ``pos_checksum`` = Σ (i+1)·sᵢ is order-sensitive — an endianness
    or offset bug cannot hash-match. Map-only: zero shuffles at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in AUDIO_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav_pcm16(bytes(payload))
                s = samples.astype(np.int64)
                rows["media_id"].append(int(mid))
                rows["n_samples"].append(int(s.size))
                rows["sample_rate"].append(int(rate))
                rows["sample_sum"].append(int(s.sum()))
                rows["peak_abs"].append(int(np.abs(s).max()) if s.size else 0)
                rows["pos_checksum"].append(
                    int(((np.arange(s.size, dtype=np.int64) + 1) * s).sum())
                )
            yield pd.DataFrame(rows, columns=cols)

    return media_df.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


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


def resize_pixels_nearest(pixels, target_w: int, target_h: int):
    """Nearest-neighbor resample of a 2-D uint8 array, pure integer source
    mapping (``src = ((2·dst+1)·n_src) // (2·n_dst)``, the pixel-center
    rule) — deterministic across platforms, vectorized via index fancy-
    indexing, no interpolation arithmetic to drift."""
    import numpy as np

    h, w = pixels.shape
    ys = ((2 * np.arange(target_h, dtype=np.int64) + 1) * h) // (2 * target_h)
    xs = ((2 * np.arange(target_w, dtype=np.int64) + 1) * w) // (2 * target_w)
    return pixels[ys[:, None], xs[None, :]]


def resize_bmp_media(
    media_df: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """REAL resize stage over BMP payloads: decode → aspect-preserving
    nearest-neighbor resample → re-encode, all inside Arrow batches.

    The codec-less :func:`resize_media` remains for payloads that are not
    decodable in this environment; this variant is the production shape —
    pixels actually move. Map-only: zero shuffles at any scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RESIZE_SCHEMA.fields]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                oh, ow = px.shape
                s = min(target_w / ow, target_h / oh)
                tw = max(1, int(ow * s))
                th = max(1, int(oh * s))
                out = resize_pixels_nearest(px, tw, th)
                rows["media_id"].append(int(mid))
                rows["orig_width"].append(ow)
                rows["orig_height"].append(oh)
                rows["target_width"].append(tw)
                rows["target_height"].append(th)
                rows["scale_x"].append(tw / ow)
                rows["scale_y"].append(th / oh)
                rows["resized_payload"].append(encode_bmp_gray8(out))
            yield pd.DataFrame(rows, columns=cols)

    return media_df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_start", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
    ]
)

FRAME_LEN = 32  # samples per analysis frame (non-overlapping)


def audio_frame_energy(media_df: DataFrame, frame_len: int = FRAME_LEN) -> DataFrame:
    """Decode WAV payloads and emit one row per fixed-length analysis frame
    with integer energy (Σ sᵢ²) and peak — the windowed feature-extraction
    stage of an audio training pipeline (VAD/loudness filtering), kept
    integer-exact so the gate can hash it against the waveform formula.
    Map-only fan-out: each payload yields ⌈n/frame_len⌉ rows, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in FRAME_ENERGY_SCHEMA.fields]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = decode_wav_pcm16(bytes(payload))
                s = samples.astype(np.int64)
                for f_idx in range(0, (s.size + frame_len - 1) // frame_len):
                    start = f_idx * frame_len
                    frame = s[start : start + frame_len]
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(f_idx)
                    rows["frame_start"].append(start)
                    rows["frame_len"].append(int(frame.size))
                    rows["energy"].append(int((frame * frame).sum()))
                    rows["peak_abs"].append(
                        int(np.abs(frame).max()) if frame.size else 0
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media_df.mapInPandas(run, schema=FRAME_ENERGY_SCHEMA)


PATCH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("patch_row", T.LongType()),
        T.StructField("patch_col", T.LongType()),
        T.StructField("patch_h", T.LongType()),
        T.StructField("patch_w", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("pos_checksum", T.LongType()),
    ]
)

PATCH_SIZE = 4  # pixels per patch side (non-overlapping grid, ragged edges)


def image_patches(media_df: DataFrame, patch: int = PATCH_SIZE) -> DataFrame:
    """Decode images and emit one row per non-overlapping patch with integer
    pixel stats — the ViT-style patchification stage of an image training
    pipeline, kept integer-exact (per-patch position-weighted checksum over
    the patch's row-major order catches orientation/stride bugs inside the
    patch extraction, not just the decode). Ragged border patches keep
    their true patch_h/patch_w. Map-only fan-out, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in PATCH_SCHEMA.fields]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload)).astype(np.int64)
                h, w = px.shape
                for pr in range(0, (h + patch - 1) // patch):
                    for pc in range(0, (w + patch - 1) // patch):
                        tile = px[
                            pr * patch : (pr + 1) * patch,
                            pc * patch : (pc + 1) * patch,
                        ]
                        flat = tile.ravel()
                        rows["media_id"].append(int(mid))
                        rows["patch_row"].append(pr)
                        rows["patch_col"].append(pc)
                        rows["patch_h"].append(tile.shape[0])
                        rows["patch_w"].append(tile.shape[1])
                        rows["pixel_sum"].append(int(flat.sum()))
                        rows["pos_checksum"].append(
                            int(
                                (
                                    (np.arange(flat.size, dtype=np.int64) + 1)
                                    * flat
                                ).sum()
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    return media_df.mapInPandas(run, schema=PATCH_SCHEMA)


VIDEO_FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_start", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def video_frame_energies(media_df: DataFrame, n_frames: int = 8) -> DataFrame:
    """Per-frame byte energy for the video-style payload: the payload is
    split into ``n_frames`` chunks at the same boundaries ``frame_sample``
    emits (chunk = len // n, the LAST frame absorbs the remainder) and each
    frame's energy is the sum of its bytes. Arrow ``mapInPandas``,
    vectorized per batch with ONE ``np.add.reduceat`` over the concatenated
    payload buffer — no per-byte Python loop; map-only at any scale. The
    actual video codec is out of scope (no AV libs in the image); the frame
    geometry, batch shape and downstream selection logic are the real
    plumbing a keyframe sampler needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in VIDEO_FRAME_ENERGY_SCHEMA.fields]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(columns=cols)
                continue
            raw = [
                (int(m), b"" if p is None else bytes(p))
                for m, p in zip(pdf["media_id"], pdf["payload"])
            ]
            mids, fidx, fstart, flen, energy = [], [], [], [], []
            # empty payloads get their single zero frame directly — they
            # must not enter the reduceat index math (a [0,0) bound at the
            # buffer end is out of range for reduceat)
            nonempty = []
            for mid, p in raw:
                if len(p) == 0:
                    mids.append(mid)
                    fidx.append(0)
                    fstart.append(0)
                    flen.append(0)
                    energy.append(0)
                else:
                    nonempty.append((mid, p))
            if nonempty:
                lens = np.array([len(p) for _, p in nonempty], dtype=np.int64)
                buf = np.frombuffer(
                    b"".join(p for _, p in nonempty), dtype=np.uint8
                ).astype(np.int64)
                doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                bounds, meta = [], []
                for r, (mid, _) in enumerate(nonempty):
                    ln = int(lens[r])
                    chunk = ln // n_frames
                    if chunk == 0:
                        starts = [0]  # short payload: one frame holds it all
                    else:
                        starts = [i * chunk for i in range(n_frames)]
                    ends = starts[1:] + [ln]
                    for i, (s, e) in enumerate(zip(starts, ends)):
                        meta.append((mid, i, s, e - s))
                        bounds.append(int(doc_starts[r]) + s)
                sums = np.add.reduceat(buf, np.array(bounds, dtype=np.int64))
                for (mid, i, s, ln_f), en in zip(meta, sums):
                    mids.append(mid)
                    fidx.append(i)
                    fstart.append(s)
                    flen.append(ln_f)
                    energy.append(int(en))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": fidx,
                    "frame_start": fstart,
                    "frame_len": flen,
                    "energy": energy,
                },
                columns=cols,
            )

    return media_df.select("media_id", "payload").mapInPandas(
        run, schema=VIDEO_FRAME_ENERGY_SCHEMA
    )


def synthesize_bmp_media_twins(docs: DataFrame, twin_mod: int = 5) -> DataFrame:
    """documents → BMP corpus with NEAR-DUP twins: every document yields its
    base test card (media_id = 2·doc_id) and every ``twin_mod``-th document
    additionally yields a perturbed twin (media_id = 2·doc_id + 1) — the
    same card with its LAST pixel bumped by one (mod 256), i.e. one changed
    patch out of 4–16. The pairs an image near-dup stage must recover are
    therefore known by construction. Arrow-batched producer, map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                px = _synth_pixels(d)
                ids.append(2 * d)
                payloads.append(encode_bmp_gray8(px))
                if d % twin_mod == 0:
                    tw = px.copy().ravel()
                    tw[-1] = (int(tw[-1]) + 1) % 256
                    ids.append(2 * d + 1)
                    payloads.append(encode_bmp_gray8(tw.reshape(px.shape)))
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads},
                columns=["media_id", "payload"],
            )

    return docs.select("doc_id").mapInPandas(run, schema=BMP_MEDIA_SCHEMA)


def synthesize_wav_media_twins(docs: DataFrame, twin_mod: int = 5) -> DataFrame:
    """documents → WAV corpus with NEAR-DUP twins: every document yields its
    base test waveform (media_id = 2·doc_id) and every ``twin_mod``-th
    document additionally yields a perturbed twin (media_id = 2·doc_id + 1)
    — the same waveform with its LAST sample bumped by one, which changes
    exactly one analysis frame's energy (Δ = 2s+1 ≠ 0 for integer s). The
    pairs an audio near-dup stage must recover are therefore known by
    construction. Arrow-batched producer, map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                s = _synth_samples(d)
                ids.append(2 * d)
                payloads.append(encode_wav_pcm16(s))
                if d % twin_mod == 0:
                    tw = s.copy()
                    tw[-1] = tw[-1] + 1
                    ids.append(2 * d + 1)
                    payloads.append(encode_wav_pcm16(tw))
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads},
                columns=["media_id", "payload"],
            )

    return docs.select("doc_id").mapInPandas(run, schema=BMP_MEDIA_SCHEMA)
