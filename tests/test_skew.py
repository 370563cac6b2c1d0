"""Salted aggregation: result-identical to plain groupBy, two exchanges,
hot key spread over multiple phase-1 groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagopa_ecommerce_cdc_service_spark.operators.skew import (
    count_agg,
    max_agg,
    min_agg,
    salted_agg,
    sum_agg,
)


def _skewed_df(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(0, 9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).alias("v")
    )
    tail = spark.range(0, 1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 31).alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed_df(spark)
    aggs = [
        sum_agg("v", "total"),
        count_agg("n"),
        min_agg("v", "vmin"),
        max_agg("v", "vmax"),
    ]
    plain = df.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count("*").alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    salted = salted_agg(df, ["k"], aggs, n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_actually_spreads_hot_key(spark):
    df = _skewed_df(spark)
    phase1_groups = (
        df.withColumn("_s", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8)))
        .groupBy("k", "_s")
        .count()
        .filter(F.col("k") == "hot")
        .count()
    )
    assert phase1_groups > 1  # the hot key occupies multiple reduce slots
