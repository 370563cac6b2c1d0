"""Shared conventions for the oracle-checked query suite.

The driver compares Spark results against DuckDB by row-count + schema +
order-insensitive value hash, so every float-valued aggregate must be
bit-identical across engines. Discipline:

- Source doubles in the testdata are exact 2-decimal values (verified), so
  ``CAST(x AS DECIMAL(p,s))`` is lossless in both engines.
- All sums/products run in decimal (exact, order-independent) and only the
  FINAL value is cast to double → identical IEEE doubles everywhere.
- Averages are ``CAST(SUM(decimal) AS DOUBLE) / COUNT`` — double division of
  identical operands, never engine-specific decimal-division scale rules.
- Every computed column is aliased identically in Spark and SQL (the driver
  sorts columns by name before hashing).
- LIMIT/top-k queries always order by a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table, normalizing timestamp encodings.

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS), which Spark refuses
    by default; with ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as
    a long we floor-convert to a micros timestamp — exactly what DuckDB does
    when it reads TIMESTAMP_NS, so oracle comparisons stay bit-identical.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — double math would lose 1µs at ~1.7e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, spark: SparkSession, min_parts: int | None = None) -> DataFrame:
    """Fan a narrow scan out across all cores before CPU-heavy per-row work.

    Small testdata tables arrive as a single parquet file → one input split →
    one core doing all the hashing/shingling. A round-robin repartition of the
    raw rows (cheap: the text itself is small) unlocks the full machine. At
    production scale the scan is already split, so this is a no-op.

    The split estimate comes from the scan's file list + sizes (early-exited
    once it reaches the target), NOT ``df.rdd`` — converting to an RDD builds
    the whole lineage driver-side on every query, which is dead weight in a
    library hot path.
    """
    import math
    import os

    target = min_parts or spark.sparkContext.defaultParallelism
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    digits = "".join(c for c in raw if c.isdigit())
    max_bytes = int(digits or "134217728")
    est_splits = 0
    for path in df.inputFiles():
        local = path.removeprefix("file:")
        try:
            est_splits += max(1, math.ceil(os.path.getsize(local) / max_bytes))
        except OSError:  # non-local / unstat-able: count the file as 1 split
            est_splits += 1
        if est_splits >= target:
            return df
    return df.repartition(target)


def dec(col: Column | str, p: int = 12, s: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def money_sum(col: Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(col).cast("double").alias(alias)


def avg_double(col: Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, divided as double."""
    return (F.sum(col).cast("double") / F.count(col)).alias(alias)


# price * (1 - discount): DECIMAL(12,2) * DECIMAL(4,2) → DECIMAL(17,4), exact
def disc_price() -> Column:
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(1,0)") - dec("l_discount", 3, 2))


def charge() -> Column:
    # (price * (1-disc)) * (1+tax): DECIMAL(17,4) * DECIMAL(4,2) → DECIMAL(22,6), exact
    return disc_price() * (F.lit(1).cast("decimal(1,0)") + dec("l_tax", 3, 2))


# SQL-side equivalents (DuckDB): keep in lockstep with the column builders.
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(3,2)))"
)
SQL_CHARGE = (
    f"({SQL_DISC_PRICE}) * "
    "(CAST(1 AS DECIMAL(1,0)) + CAST(l_tax AS DECIMAL(3,2)))"
)
