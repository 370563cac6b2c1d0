"""THE comparison function for Spark-vs-DuckDB result parity.

Shared by the two local replicas of the driver's correctness gate —
``tests/test_oracle_parity.py`` (per-query pytest, every round) and
``tools/gate_preflight.py`` (one-shot sweep of the 50-slot prefix) — so a
verdict can never diverge between them on comparison semantics (round-13
ADVICE: the preflight briefly carried a Decimal→float coercion the parity
suite did not, opening a gap where a sub-double-precision Decimal
difference passed one checker but not the other).

Semantics, deliberately STRICT (no Decimal coercion — the suite's
decimal-exact / integer-quantized discipline means no query needs it, and
coercion could only mask a genuine cross-engine drift the driver's hash
gate would still catch):

- NaN → the string "NaN" (NaN != NaN would otherwise fail equal rows);
- float -0.0 → 0.0 (equal under ==, but repr-different, which would
  perturb the order-insensitive sort);
- everything else compared as the engine returned it;
- column order neutralized by sorting names; row order neutralized by
  sorting normalized tuples on repr;
- dtype-KIND parity checked separately (``kind``): Python's 1 == 1.0
  makes pure value comparison blind to an int column coming back float
  from one engine — the driver's hash gate is not.
"""

from __future__ import annotations

import math


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v


def normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


def kind(dt) -> str:
    s = str(dt)
    if "int" in s:
        return "int"
    if "float" in s or "double" in s:
        return "float"
    if "datetime" in s:
        return "ts"
    return "other"


def kind_diff(spark_pd, oracle_pd) -> dict:
    return {
        c: (kind(spark_pd[c].dtype), kind(oracle_pd[c].dtype))
        for c in spark_pd.columns
        if c in oracle_pd.columns
        and kind(spark_pd[c].dtype) != kind(oracle_pd[c].dtype)
    }
