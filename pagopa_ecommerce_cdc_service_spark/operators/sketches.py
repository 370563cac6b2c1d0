"""Distributed sketch primitives: HyperLogLog, Count-Min, Bloom filter.

The classic approximate-query-engine components, built so every sketch is
*deterministic and engine-portable*: all hashing goes through ``md5_long``
(identical in Spark, DuckDB and Python), all register/counter arithmetic is
integer-exact, and the only floating-point step (HLL's harmonic-mean
estimate) is a single constant-over-double division in IEEE doubles — so
sketch states and estimates are bit-identical across engines and
certifiable under the driver's value-hash gate.

Scale shape (the reason sketches exist at 100 TB):

- HLL: ``explode → groupBy(group, bucket).max(rho)`` — partial aggregation
  collapses every partition to ≤ m rows per group before the ONE shuffle;
  register tables are mergeable under any partitioning (max is associative
  and commutative), which is exactly how a 1000-executor rollup or a
  streaming accumulation combines them.
- Count-Min: ``groupBy(row, pos).sum`` — a fixed d×w grid regardless of
  input cardinality; map-side combine bounds shuffle traffic at
  ``d·w`` rows per partition. Point estimates then broadcast the tiny grid.
- Bloom: the filter is 16 longs built by ``bit_or`` aggregation — a
  runtime filter you can broadcast to prune a probe side *before* its
  shuffle, the declarative twin of Spark's own InjectRuntimeFilter /
  BloomFilterAggregate (ours is replayable by the DuckDB oracle).

Reference scope note: the reference service (pagopa-ecommerce-cdc-service)
has no sketch surface — these belong to the generalized large-corpus
analytics engine this repo targets (SURVEY.md north star), alongside the
dedup/ANN operators in ``text.py``/``similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql

# --- HyperLogLog ----------------------------------------------------------
# md5_long yields 60 usable bits: the low HLL_P select the register, the
# remaining HLL_W feed the leading-zero geometric observable.
HLL_P = 6
HLL_M = 1 << HLL_P            # 64 registers
HLL_W = 60 - HLL_P            # 54 value bits; rho ∈ [1, 55]
HLL_RHO_MAX = HLL_W + 1
# The harmonic sum Σ 2^-M[j] is held as an exact integer scaled by
# 2^RHO_MAX: an empty register (M=0) contributes 2^RHO_MAX, a register
# holding rho contributes 2^(RHO_MAX-rho).  64 · 2^55 = 2^61 < 2^63, so the
# scaled sum always fits a BIGINT exactly.
HLL_EMPTY_TERM = 1 << HLL_RHO_MAX
# alpha_64 · m² · 2^RHO_MAX as one exact Python double: the final estimate
# is then a single double division, bit-identical in both engines.
HLL_ALPHA_64 = 0.709
HLL_EST_NUM = HLL_ALPHA_64 * HLL_M * HLL_M * float(1 << HLL_RHO_MAX)
# Small-range (linear-counting) correction: when the raw estimate falls
# below 2.5·m and empty registers remain, the unbiased estimator is
# m·ln(m/V) with V = empty-register count.  V has only m-1 possible values,
# so the corrections are PRECOMPUTED here as Python doubles and embedded as
# literals in both engines — neither engine ever calls ln(), which keeps the
# result bit-identical (JVM Math.log and libm log are not guaranteed to
# round identically).  Index v-1 holds m·ln(m/v).
import math as _math

HLL_LC_THRESHOLD = 2.5 * HLL_M
HLL_LC_TABLE = tuple(
    HLL_M * _math.log(HLL_M / v) for v in range(1, HLL_M)
)


def hll_bucket(h: Column) -> Column:
    """Register index from a 60-bit portable hash: its low HLL_P bits."""
    return h.bitwiseAND(F.lit(HLL_M - 1))


def hll_bucket_sql(h: str) -> str:
    return f"(({h}) & {HLL_M - 1})"


def hll_rho(h: Column) -> Column:
    """rho = leading zeros of the hash's HLL_W value bits, plus one.

    ``length(bin(w))`` is ``floor(log2(w)) + 1`` for w > 0 in both engines
    (minimal-width binary strings), so rho = RHO_MAX - length(bin(w)); the
    all-zero value maps to RHO_MAX.
    """
    w = F.shiftright(h, HLL_P)
    return F.when(w == F.lit(0), F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(w))
    )


def hll_rho_sql(h: str) -> str:
    w = f"(({h}) >> {HLL_P})"
    return (
        f"(CASE WHEN {w} = 0 THEN {HLL_RHO_MAX} "
        f"ELSE {HLL_RHO_MAX} - length(bin({w})) END)"
    )


def hll_register_term(max_rho: Column) -> Column:
    """Scaled harmonic-sum term 2^(RHO_MAX - M) for an occupied register."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.lit(HLL_RHO_MAX) - max_rho).cast("int")
    )


def hll_register_term_sql(max_rho: str) -> str:
    return f"(1::BIGINT << CAST({HLL_RHO_MAX} - ({max_rho}) AS INTEGER))"


def hll_estimate(raw: Column, used_buckets: Column) -> Column:
    """Raw harmonic estimate with the standard small-range correction.

    Below 2.5·m with empty registers remaining, linear counting
    (m·ln(m/empty)) replaces the biased raw estimate — via the precomputed
    HLL_LC_TABLE lookup, so no engine-side ln().
    """
    empty = (F.lit(HLL_M) - used_buckets).cast("int")
    lc = F.element_at(F.array(*[F.lit(x) for x in HLL_LC_TABLE]), empty)
    return F.when(
        (raw < F.lit(HLL_LC_THRESHOLD)) & (empty > F.lit(0)), lc
    ).otherwise(raw)


def hll_estimate_sql(raw: str, used_buckets: str) -> str:
    # scientific notation forces a DOUBLE literal: DuckDB types plain
    # decimal-point literals as DECIMAL, whose cast to double can land one
    # ulp away from Python/Spark's correctly-rounded value
    table = "[" + ", ".join(format(x, ".17e") for x in HLL_LC_TABLE) + "]"
    empty = f"({HLL_M} - ({used_buckets}))"
    return (
        f"(CASE WHEN ({raw}) < {HLL_LC_THRESHOLD!r} AND {empty} > 0 "
        f"THEN ({table})[{empty}] ELSE ({raw}) END)"
    )


# --- Count-Min ------------------------------------------------------------
CMS_D = 4                     # hash rows
CMS_W = 256                   # counters per row


def cms_pos(col: Column, row: int) -> Column:
    """Counter index for hash row ``row``: salted portable hash mod w."""
    return md5_long(F.concat(F.lit(f"cms{row}:"), col)) % F.lit(CMS_W)


def cms_pos_sql(expr: str, row: int) -> str:
    salted = "'cms" + str(row) + ":' || " + expr
    return f"({md5_long_sql(salted)} % {CMS_W})"


# --- Bloom filter ---------------------------------------------------------
# 63-bit words: DuckDB raises on BIGINT 1<<63, so the sign bit is never
# used; 16 words × 63 bits = 1008-bit filter, k = 3 hash probes.
BLOOM_WORD_BITS = 63
BLOOM_WORDS = 16
BLOOM_BITS = BLOOM_WORD_BITS * BLOOM_WORDS
BLOOM_K = 3


def bloom_pos(col: Column, probe: int) -> Column:
    return md5_long(F.concat(F.lit(f"bloom{probe}:"), col)) % F.lit(BLOOM_BITS)


def bloom_pos_sql(expr: str, probe: int) -> str:
    salted = "'bloom" + str(probe) + ":' || " + expr
    return f"({md5_long_sql(salted)} % {BLOOM_BITS})"


def bloom_word(pos: Column) -> Column:
    return F.floor(pos / F.lit(BLOOM_WORD_BITS)).cast("long")


def bloom_mask(pos: Column) -> Column:
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % F.lit(BLOOM_WORD_BITS)).cast("int")
    )


def bloom_word_sql(pos: str) -> str:
    return f"CAST(({pos}) // {BLOOM_WORD_BITS} AS BIGINT)"


def bloom_mask_sql(pos: str) -> str:
    return f"(1::BIGINT << CAST(({pos}) % {BLOOM_WORD_BITS} AS INTEGER))"


def hll_final_cols(occ_sum: Column, used_buckets: Column) -> tuple[Column, Column]:
    """Shared finalization for every HLL surface (batch + streaming twins):
    (denom_q, hll_estimate) from the occupied-register scaled sum and the
    used-bucket count."""
    denom = occ_sum + (F.lit(HLL_M) - used_buckets) * F.lit(HLL_EMPTY_TERM)
    return (
        denom.alias("denom_q"),
        hll_estimate(F.lit(HLL_EST_NUM) / denom.cast("double"), used_buckets).alias(
            "hll_estimate"
        ),
    )


def hll_final_sql(occ_sum: str, used_buckets: str) -> tuple[str, str]:
    """SQL twin of hll_final_cols: (denom_expr, estimate_expr)."""
    denom = f"({occ_sum}) + ({HLL_M} - ({used_buckets})) * {HLL_EMPTY_TERM}::BIGINT"
    est = hll_estimate_sql(f"{HLL_EST_NUM!r} / CAST({denom} AS DOUBLE)", used_buckets)
    return denom, est
