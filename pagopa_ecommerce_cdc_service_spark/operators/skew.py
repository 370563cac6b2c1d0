"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew,
but two situations still need explicit salting at 100 TB:

1. **Aggregation over a hot key** — AQE cannot split a single groupBy key.
   ``salted_agg`` spreads one logical key over ``n_salts`` physical reduce
   slots, then merges the partials: phase 1 shuffles on (key, salt) — the
   hot key's rows land on up to ``n_salts`` different reducers — and phase 2
   shuffles the tiny partial table on key alone.

2. **Broadcast-join fan-out of a hot build side** is already handled by
   broadcasting (no shuffle at all) — prefer ``F.broadcast`` and leave
   salting for genuinely large-large skewed joins (AQE's territory).

Only works for decomposable aggregates (sum/count/min/max/bit-ops — anything
with an associative merge). The helper takes (partial, merge) expression
pairs so both phases stay whole-stage-codegen'd JVM expressions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"


@dataclass(frozen=True)
class SaltedAgg:
    """One decomposable aggregate: phase-1 partial + phase-2 merge."""

    partial: Callable[[], Column]  # e.g. lambda: F.sum("x")
    merge: Callable[[Column], Column]  # e.g. lambda c: F.sum(c)
    alias: str


def sum_agg(col: str, alias: str) -> SaltedAgg:
    return SaltedAgg(lambda: F.sum(col), lambda c: F.sum(c), alias)


def count_agg(alias: str) -> SaltedAgg:
    return SaltedAgg(lambda: F.count("*"), lambda c: F.sum(c), alias)


def min_agg(col: str, alias: str) -> SaltedAgg:
    return SaltedAgg(lambda: F.min(col), lambda c: F.min(c), alias)


def max_agg(col: str, alias: str) -> SaltedAgg:
    return SaltedAgg(lambda: F.max(col), lambda c: F.max(c), alias)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[SaltedAgg],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """groupBy(keys).agg(...) with the reduce fan-in of every key widened
    ``n_salts``-fold.

    ``salt_source`` defaults to a deterministic hash of the full row via
    ``monotonically_increasing_id`` — any column expression works; pick one
    uncorrelated with ``keys``. Deterministic by construction: the final
    merge is associative, so the salt assignment never changes results.
    """
    if salt_source is None:
        salt_source = F.monotonically_increasing_id()
    salted = df.withColumn(_SALT, F.pmod(F.hash(salt_source), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[a.partial().alias(f"_p_{a.alias}") for a in aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[a.merge(F.col(f"_p_{a.alias}")).alias(a.alias) for a in aggs]
    )
