"""Golden tests for the multimodal plumbing: the mapInPandas feature stage
must match a pure-Python recomputation byte-for-byte."""

from __future__ import annotations

from pagopa_ecommerce_cdc_service_spark.operators.multimodal import (
    N_HIST_BUCKETS,
    documents_as_media,
    extract_features,
    fake_decode_meta,
)


def test_features_match_python_golden(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = documents_as_media(docs)
    feats = {r["media_id"]: r.asDict() for r in extract_features(media).collect()}

    for row in docs.collect():
        payload = row["text"].encode("utf-8")
        hist = [0] * N_HIST_BUCKETS
        total = 0
        for b in payload:
            hist[b * N_HIST_BUCKETS // 256] += 1
            total += b
        w, h = fake_decode_meta(payload)
        got = feats[row["doc_id"]]
        assert got["n_bytes"] == len(payload)
        assert got["byte_hist"] == hist
        assert got["mean_byte"] == total / len(payload)
        assert (got["fake_width"], got["fake_height"]) == (w, h)
        assert got["media_type"] == "text/plain;fake-image"


def test_decode_image_non_bmp_needs_pil():
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")


def test_bmp_round_trip_including_padding_and_flip():
    """encode → decode must reproduce every pixel for widths that exercise
    all four stride paddings (w % 4 ∈ {0,1,2,3}) and non-square shapes."""
    import numpy as np

    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import (
        decode_bmp_gray8,
        decode_image,
        encode_bmp_gray8,
    )

    rng = np.random.default_rng(7)
    for w in (1, 2, 3, 4, 5, 8, 13, 16, 127):
        for h in (1, 3, 8, 31):
            px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            payload = encode_bmp_gray8(px)
            assert payload[:2] == b"BM"
            got = decode_bmp_gray8(payload)
            assert got.shape == (h, w)
            assert np.array_equal(got, px), (w, h)
            # decode_image dispatches BMP to the native parser
            assert np.array_equal(decode_image(payload), px)


def test_bmp_decode_golden_bytes():
    """Decode a hand-assembled BMP (not produced by our encoder): 3×2,
    bottom-up rows padded to 4 bytes — guards against an encoder/decoder
    pair that agrees with itself but not with the format."""
    import struct

    import numpy as np

    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import (
        BMP_DATA_OFFSET,
        decode_bmp_gray8,
    )

    # top-down image [[1,2,3],[4,5,6]] → bottom-up padded rows: 4,5,6,0 then 1,2,3,0
    body = bytes([4, 5, 6, 0, 1, 2, 3, 0])
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_DATA_OFFSET + len(body), 0, 0, BMP_DATA_OFFSET
    )
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(body), 0, 0, 256, 0)
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    got = decode_bmp_gray8(header + info + palette + body)
    assert np.array_equal(got, np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8))


def test_image_decode_stats_matches_pixel_formula(spark, sf_dir):
    """The full Spark stage (synthesize BMP → decode → stats) must equal the
    first-principles per-pixel computation, including the position-weighted
    checksum that detects stride/flip mistakes."""
    import numpy as np

    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import (
        _synth_pixels,
        image_decode_stats,
        synthesize_bmp_media,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read

    docs = read(spark, sf_dir, "documents").limit(50)
    rows = {
        r["media_id"]: r.asDict()
        for r in image_decode_stats(synthesize_bmp_media(docs)).collect()
    }
    assert len(rows) == 50
    for mid, got in rows.items():
        px = _synth_pixels(mid).astype(np.int64)
        h, w = px.shape
        flat = px.ravel()
        assert (got["width"], got["height"], got["n_pixels"]) == (w, h, w * h)
        assert got["pixel_sum"] == int(flat.sum())
        assert got["pos_checksum"] == int(
            ((np.arange(flat.size) + 1) * flat).sum()
        )


def test_resize_geometry_and_payload_shape(spark, sf_dir):
    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import (
        documents_as_media,
        fake_decode_meta,
        resize_media,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read

    media = documents_as_media(read(spark, sf_dir, "documents").limit(20))
    out = resize_media(media, target_w=224, target_h=224).collect()
    payloads = {r.media_id: r for r in media.collect()}
    assert len(out) == 20
    for r in out:
        ow, oh = fake_decode_meta(bytes(payloads[r.media_id].payload))
        assert (r.orig_width, r.orig_height) == (ow, oh)
        # aspect preserved within integer truncation; fits in target box
        assert r.target_width <= 224 and r.target_height <= 224
        assert max(r.target_width, r.target_height) in (224, 223)
        assert len(r.resized_payload) == r.target_width * r.target_height


def test_resize_bmp_media_actually_resamples(spark, sf_dir):
    """The BMP resize stage decodes, resamples and re-encodes real pixels:
    decoding each output payload must equal the numpy nearest-neighbor
    reference of the input test card (pixel-center integer rule)."""
    import numpy as np

    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import (
        _synth_pixels,
        decode_image,
        resize_bmp_media,
        resize_pixels_nearest,
        synthesize_bmp_media,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read

    docs = read(spark, sf_dir, "documents").limit(20)
    out = {
        r["media_id"]: r
        for r in resize_bmp_media(
            synthesize_bmp_media(docs), target_w=8, target_h=6
        ).collect()
    }
    assert len(out) == 20
    for mid, row in out.items():
        src = _synth_pixels(mid)
        oh, ow = src.shape
        s = min(8 / ow, 6 / oh)
        tw, th = max(1, int(ow * s)), max(1, int(oh * s))
        assert (row["target_width"], row["target_height"]) == (tw, th)
        got = decode_image(bytes(row["resized_payload"]))
        assert got.shape == (th, tw)
        assert np.array_equal(got, resize_pixels_nearest(src, tw, th)), mid


def test_wav_round_trip_and_golden_bytes():
    """encode → decode reproduces every sample; a hand-assembled WAV with an
    extra chunk before data (not produced by our encoder) also decodes —
    the parser walks the RIFF chunk list rather than assuming offsets."""
    import struct

    import numpy as np

    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(11)
    for n in (0, 1, 7, 128, 1001):
        s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        got, rate = decode_wav_pcm16(encode_wav_pcm16(s, sample_rate=8000))
        assert rate == 8000
        assert np.array_equal(got, s), n

    # golden: RIFF + fmt + a LIST chunk the decoder must skip + data
    samples = struct.pack("<3h", 1, -2, 300)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 16000, 32000, 2, 16)
    lst = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    data = struct.pack("<4sI", b"data", len(samples)) + samples
    body = fmt + lst + data
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    got, rate = decode_wav_pcm16(wav)
    assert rate == 16000 and got.tolist() == [1, -2, 300]


def test_audio_decode_stats_matches_waveform_formula(spark, sf_dir):
    import numpy as np

    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import (
        _synth_samples,
        audio_decode_stats,
        synthesize_wav_media,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read

    docs = read(spark, sf_dir, "documents").limit(40)
    rows = {
        r["media_id"]: r.asDict()
        for r in audio_decode_stats(synthesize_wav_media(docs)).collect()
    }
    assert len(rows) == 40
    for mid, got in rows.items():
        s = _synth_samples(mid).astype(np.int64)
        assert got["n_samples"] == s.size
        assert got["sample_sum"] == int(s.sum())
        assert got["peak_abs"] == int(np.abs(s).max())
        assert got["pos_checksum"] == int(((np.arange(s.size) + 1) * s).sum())


def test_image_near_dup_recovers_every_twin_pair(spark):
    """Pigeonhole guarantee: a twin differs from its base card in exactly
    one patch, so with 2 exact-match bands every (2d, 2d+1) pair MUST
    surface — recall 1.0 on the synthesized near-dups by construction, at
    similarity (n-1)/n ≥ 0.75."""
    from pagopa_ecommerce_cdc_service_spark.plans.multimodal_queries import (
        mm_image_near_dup,
    )

    pairs = {
        (r["media_a"], r["media_b"]): r["sim"]
        for r in mm_image_near_dup(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    doc_ids = [
        r[0]
        for r in duckdb.sql(
            "SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet' "
            "WHERE doc_id % 5 = 0"
        ).fetchall()
    ]
    assert doc_ids
    for d in doc_ids:
        key = (2 * d, 2 * d + 1)
        assert key in pairs, f"twin pair for doc {d} missed"
        assert pairs[key] >= 0.75


def test_audio_near_dup_recovers_every_twin_pair(spark):
    """Pigeonhole guarantee, audio flavor: a twin differs from its base
    waveform in exactly one frame (the bumped last sample moves that
    frame's energy by 2s+1 != 0), so with 2 exact-match bands and the
    at-most-one-differing-frame verdict every (2d, 2d+1) pair MUST
    surface. A 70% ratio threshold would miss every <= 3-frame waveform
    (1 differing frame of 2-3 is 50-67% similarity) — the bug this test
    pins against."""
    from pagopa_ecommerce_cdc_service_spark.plans.multimodal_queries import (
        mm_audio_near_dup,
    )

    rows = mm_audio_near_dup(spark, "/root/testdata/sf0.001").collect()
    pairs = {(r["media_a"], r["media_b"]): r["n_match"] for r in rows}
    assert any(r["n_frames"] <= 3 for r in rows), (
        "corpus no longer exercises the short-waveform regime"
    )
    import duckdb

    doc_ids = [
        r[0]
        for r in duckdb.sql(
            "SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet' "
            "WHERE doc_id % 5 = 0"
        ).fetchall()
    ]
    assert doc_ids
    for d in doc_ids:
        key = (2 * d, 2 * d + 1)
        assert key in pairs, f"twin pair for doc {d} missed"


def test_stream_audio_near_dup_equals_batch_across_restart(spark):
    """Round-9 pre-build: the streaming audio near-dup twin (band-store
    dedup-on-ingest, two incarnations on one checkpoint) must equal the
    batch pigeonhole query exactly — including the cross-batch twin pairs
    the media_id % 3 slicing forces across the restart boundary."""
    from pagopa_ecommerce_cdc_service_spark.plans.multimodal_queries import (
        mm_audio_near_dup,
        mm_stream_audio_near_dup,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.media_a, r.media_b, r.n_frames, r.n_match)
        for r in mm_stream_audio_near_dup(spark, sf).collect()
    }
    expect = {
        (r.media_a, r.media_b, r.n_frames, r.n_match)
        for r in mm_audio_near_dup(spark, sf).collect()
    }
    assert got == expect and expect, "stream twin diverged from batch"
