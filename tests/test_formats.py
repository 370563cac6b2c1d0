"""Multi-format IO: round-trips are value-stable, schemas are enforced,
malformed rows quarantine instead of killing the job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagopa_ecommerce_cdc_service_spark.plans.helpers import read
from pagopa_ecommerce_cdc_service_spark.sources.formats import (
    read_table,
    write_table,
)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double"
)


def _events(spark, sf_dir):
    return read(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip_value_stable(spark, sf_dir, tmp_path, fmt):
    src = _events(spark, sf_dir)
    dest = str(tmp_path / f"events_{fmt}")
    write_table(src, dest, fmt=fmt)
    back = read_table(spark, dest, SCHEMA, fmt=fmt)
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    a = sorted(map(tuple, src.select(cols).collect()))
    b = sorted(map(tuple, back.select(cols).collect()))
    assert a == b


def test_csv_malformed_rows_quarantine_not_abort(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text(
        "event_id,ts,user_id,event_type,value\n"
        "1,2024-01-01 10:00:00.000000,7,click,1.5\n"
        "not-a-number,garbage,x,y,z\n"
        "2,2024-01-02 11:00:00.000000,8,purchase,2.5\n"
    )
    df = read_table(spark, str(p), SCHEMA, fmt="csv").cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.select("_corrupt_record").first()[0].startswith("not-a-number")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/nowhere", SCHEMA, fmt="avro")


def test_csv_reordered_header_fails_loudly(spark, tmp_path):
    # enforceSchema=false: a header whose column order disagrees with the
    # declared schema must error, not silently bind by position
    p = tmp_path / "swapped"
    p.mkdir()
    (p / "part.csv").write_text(
        "user_id,event_id,ts,event_type,value\n"
        "7,1,2024-01-01 10:00:00.000000,click,1.5\n"
    )
    df = read_table(spark, str(p), SCHEMA, fmt="csv")
    with pytest.raises(Exception, match="(?i)header|schema"):
        df.collect()


def test_csv_round_trip_distinguishes_null_from_empty_string(spark, tmp_path):
    """Spark's CSV defaults conflate NULL and '' (both write as an empty
    field); the pinned \\N sentinel keeps them distinct through a
    write+read round-trip."""
    from pagopa_ecommerce_cdc_service_spark.sources.formats import (
        read_table,
        write_table,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id int, s string"
    )
    dest = str(tmp_path / "t")
    write_table(df, dest, fmt="csv")
    back = read_table(spark, dest, "id int, s string", fmt="csv")
    got = {r["id"]: r["s"] for r in back.collect()}
    assert got == {1: None, 2: "", 3: "x"}
