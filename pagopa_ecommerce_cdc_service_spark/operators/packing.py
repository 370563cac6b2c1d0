"""Sequence packing for LLM pretraining batch construction.

Documents are concatenated per shard (deterministic hash of the id) in a
fixed order and cut into fixed-capacity token bins; each output row is one
document SEGMENT — which bin it lands in and which token slice of the
document fills it (documents straddling a bin boundary split, exactly like
real pretraining data prep). This is the formulation that vectorizes:
everything is window cumsum + integer arithmetic + one ``sequence``
explode — whole-stage-codegen'd JVM expressions, no Python, one shuffle on
the shard key regardless of corpus size.

Invariants (tested):
- every bin except a shard's last holds exactly ``capacity`` tokens;
- segment slices tile each document exactly (no token lost or duplicated);
- deterministic under any input partitioning (order is (shard, id)).

The no-split variant (greedy next-fit keeping documents whole) is
inherently a sequential scan; at scale you shard exactly like here and run
the scan per shard — but the concat-split form is what large pretraining
pipelines actually use, so that is the first-class operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql


def pack_concat_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    capacity: int = 512,
    n_shards: int = 32,
) -> DataFrame:
    """→ one row per (document × bin it occupies): ``id_col``, ``shard``,
    ``bin_idx`` (within shard), ``tok_start`` (offset inside the document),
    ``tok_len``. Zero/negative-weight documents are dropped."""
    shard = (md5_long(F.col(id_col).cast("string")) % n_shards).alias("shard")
    d = df.select(F.col(id_col), F.col(weight_col).alias("_w"), shard).filter(
        F.col("_w") > 0
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    d = (
        d.withColumn("_end", F.sum("_w").over(w))
        .withColumn("_start", F.col("_end") - F.col("_w"))
        # exact integer div (`DIV`, not float `/`): the SQL twin and the
        # capacity-curve law use `//`, and for shard cumsums near 2^53 the
        # double-division path can round a half-ulp-under-power-of-two
        # quotient up and disagree with them by one bin
        .withColumn("_first_bin", F.expr(f"_start DIV {int(capacity)}"))
        .withColumn("_last_bin", F.expr(f"(_end - 1) DIV {int(capacity)}"))
    )
    seg = d.select(
        id_col,
        "shard",
        "_start",
        "_end",
        F.explode(F.sequence("_first_bin", "_last_bin")).alias("bin_idx"),
    )
    seg_start = F.greatest(F.col("_start"), F.col("bin_idx") * capacity)
    seg_end = F.least(F.col("_end"), (F.col("bin_idx") + 1) * capacity)
    return seg.select(
        id_col,
        "shard",
        "bin_idx",
        (seg_start - F.col("_start")).alias("tok_start"),
        (seg_end - seg_start).alias("tok_len"),
    )


def pack_concat_offsets_sql(
    weight_expr: str,
    id_expr: str = "doc_id",
    capacity: int = 512,
    n_shards: int = 32,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`pack_concat_offsets` (same constants)."""
    shard = f"({md5_long_sql(f'CAST({id_expr} AS VARCHAR)')} % {n_shards})"
    return f"""
    WITH d AS (
      SELECT {id_expr} AS doc_id, {weight_expr} AS w, {shard} AS shard
      FROM {table}
      WHERE {weight_expr} > 0
    ),
    c AS (
      SELECT doc_id, shard, w,
             SUM(w) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS e
      FROM d
    ),
    s AS (
      SELECT doc_id, shard, e - w AS st, e,
             CAST((e - w) // {capacity} AS BIGINT) AS fb,
             CAST((e - 1) // {capacity} AS BIGINT) AS lb
      FROM c
    )
    SELECT doc_id, shard, u.bin_idx,
           CAST(GREATEST(st, u.bin_idx * {capacity}) - st AS BIGINT) AS tok_start,
           CAST(LEAST(e, (u.bin_idx + 1) * {capacity})
                - GREATEST(st, u.bin_idx * {capacity}) AS BIGINT) AS tok_len
    FROM s, LATERAL (SELECT UNNEST(generate_series(fb, lb)) AS bin_idx) u
    """
