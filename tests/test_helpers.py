"""Unit tests for plan helpers: Spark size-string parsing and the spread()
split estimate's packing behavior."""

from __future__ import annotations

from pagopa_ecommerce_cdc_service_spark.plans.helpers import _parse_bytes, spread


def test_parse_bytes_suffixes():
    assert _parse_bytes("134217728", default=0) == 134217728
    assert _parse_bytes("134217728b", default=0) == 134217728
    assert _parse_bytes("128m", default=0) == 128 * 1024 * 1024
    assert _parse_bytes("128MB", default=0) == 128 * 1024 * 1024
    assert _parse_bytes("1g", default=0) == 1024**3
    assert _parse_bytes("64k", default=0) == 64 * 1024
    assert _parse_bytes("garbage", default=42) == 42


def test_spread_packs_small_files_like_spark(spark, tmp_path):
    # 8 tiny files still pack into ~1 actual scan partition → spread must
    # repartition (the old per-file >=1-split estimate would skip it)
    df = spark.range(0, 800)
    df.repartition(8).write.parquet(str(tmp_path / "t"))
    scan = spark.read.parquet(str(tmp_path / "t"))
    out = spread(scan, spark, min_parts=8)
    assert "Repartition" in out._jdf.queryExecution().logical().toString() or (
        "RepartitionByExpression" in out._jdf.queryExecution().logical().toString()
    )


def test_spread_noop_when_estimate_reaches_target(spark):
    # single ~11MB file = one genuine split: target 1 is already met
    big = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    assert spread(big, spark, min_parts=1) is big  # no extra shuffle
    # but a single file can never satisfy a multi-core target → fan out
    assert spread(big, spark, min_parts=2) is not big
