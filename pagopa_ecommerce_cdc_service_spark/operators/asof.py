"""Backward as-of join: each left row picks the latest right row at-or-before
its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive formulations are
an inequality join (O(n·m) pairs per key before aggregation) or a correlated
subquery. This implementation uses the union + ordered-window trick:

1. union left and right rows into one stream, tagged by side;
2. sort within each key by (ts, side) — right rows sort before left rows at
   equal timestamps, so "at-or-before" includes ties;
3. running ``last(right_payload, ignorenulls=True)`` hands every left row
   the most recent right payload;
4. keep the left rows.

Cost: ONE shuffle on the key (same as any keyed window), no row-pair
blowup, whole-stage-codegen window aggregation. At 100 TB both inputs
shuffle-hash-partition on the key and each partition sorts locally —
exactly the plan a native as-of operator would pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + ``payload_prefix``-prefixed columns of the matched right
    row (NULLs when no right row is at-or-before the left timestamp).

    ``right_tiebreak`` names a right column that makes the match well-defined
    when several right rows share a timestamp: the row with the LARGEST
    tiebreak value wins. Without it, ties pick an arbitrary right row (the
    running ``last`` sees them in unspecified order).
    """
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    tiebreak = (
        F.col(right_tiebreak) if right_tiebreak is not None else F.lit(0)
    )
    r = right.select(
        F.col(by).alias(by),
        F.col(right_ts).alias("_ts"),
        payload.alias("_payload"),
        F.lit(0).alias("_side"),  # right sorts first at equal ts (>= match)
        tiebreak.alias("_tiebreak"),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tiebreak"].dataType).alias("_tiebreak"),
    )
    left_types = dict(left.dtypes)
    unioned = l.unionByName(
        r.select(
            *[F.lit(None).cast(left_types[c]).alias(c) for c in left_cols if c != by],
            by,
            "_ts",
            "_payload",
            "_side",
            "_tiebreak",
        )
    )
    # ascending (_ts, _side, _tiebreak): among right rows at an equal ts the
    # largest tiebreak sorts last, so the running last() picks it; left rows
    # (_side=1) still sort after every right row at their ts
    w = (
        Window.partitionBy(by)
        .orderBy("_ts", "_side", F.col("_tiebreak").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_m")[c].alias(f"{payload_prefix}{c}") for c in payload_cols],
    )
    return out
