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


def test_decode_image_is_stubbed():
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    from pagopa_ecommerce_cdc_service_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")


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
