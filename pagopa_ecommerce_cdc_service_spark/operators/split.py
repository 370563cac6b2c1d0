"""Deterministic dataset splitting for training pipelines.

Train/validation/test assignment must be a PURE FUNCTION of the document
key — never `rand()` — so that (a) re-runs, retries and different
partitionings produce the same split, (b) the same document never leaks
across splits when the corpus is re-processed, and (c) any engine
(Spark, DuckDB, Python) can recompute membership. The assignment is the
portable ``md5_long`` (functions/hashing.py) of the key modulo a fixed
denominator — no shuffle, no state, embarrassingly parallel.

Stratified form: the hash is salted with the stratum value so fractions
hold within each stratum independently (e.g. per language, per source).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql

SPLIT_DENOM = 10_000


def split_bucket(key: Column, stratum: Column | None = None) -> Column:
    """Deterministic bucket in [0, SPLIT_DENOM) from the document key
    (optionally salted by a stratum column)."""
    src = key.cast("string")
    if stratum is not None:
        src = F.concat_ws("|", stratum.cast("string"), src)
    return md5_long(src) % SPLIT_DENOM


def split_bucket_sql(key_expr: str, stratum_expr: str | None = None) -> str:
    src = f"CAST({key_expr} AS VARCHAR)"
    if stratum_expr is not None:
        src = f"concat_ws('|', CAST({stratum_expr} AS VARCHAR), {src})"
    return f"({md5_long_sql(src)} % {SPLIT_DENOM})"


def assign_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    stratum: str | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train'/'validation'/'test'/...) assigned by
    hash-bucket ranges in the order ``fractions`` lists them.

    ``fractions`` must sum to 1.0 (±1e-9). With ``stratum``, fractions hold
    per stratum value rather than only globally.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = split_bucket(
        F.col(key), F.col(stratum) if stratum is not None else None
    )
    expr = None
    hi = 0.0
    for name, frac in fractions.items():
        hi += frac
        bound = int(round(hi * SPLIT_DENOM))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr)


def split_case_sql(
    key_expr: str, fractions: dict[str, float], stratum_expr: str | None = None
) -> str:
    """DuckDB CASE expression mirroring :func:`assign_split`."""
    bucket = split_bucket_sql(key_expr, stratum_expr)
    parts = []
    hi = 0.0
    for name, frac in fractions.items():
        hi += frac
        bound = int(round(hi * SPLIT_DENOM))
        parts.append(f"WHEN {bucket} < {bound} THEN '{name}'")
    return "CASE " + " ".join(parts) + " END"
