"""Byte-pair-encoding merge-table application — Catalyst-native, no Python.

Real BPE apply in the sense of Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units") and the GPT-2 tokenizer: a
word starts as its character sequence and a rank-ordered MERGE TABLE is
applied — each merge ``(a, b) -> ab`` fuses adjacent symbol pairs
leftmost-first. This replaces the regex-class *estimate* in
``t_bpe_token_count`` with the actual merge algorithm.

Application order: we apply each merge FULLY, in rank order (Sennrich's
``apply_bpe``), rather than repeatedly scanning for the present pair with
the best rank (GPT-2's runtime loop). For a WELL-FORMED merge table — every
operand is a single character or the output of an earlier merge, which is
true of any table actually produced by BPE training — the two strategies
yield identical tokenizations: a merge can never create an operand pair of
an earlier-ranked merge (the earlier merge's output symbol is strictly
shorter than anything built after it in training order). ``MERGES`` is
checked for well-formedness at import; ``tests/test_bpe.py`` property-tests
the fold against the classic priority-queue algorithm.

Engine parity: the per-merge pass is a pure left fold over the symbol
array — ``F.aggregate`` in Spark, ``list_reduce`` in DuckDB — with
identical leftmost semantics (verified: a run of five ``a`` under
``(a,a)->aa`` gives ``[aa, aa, a]`` in both). Everything is JVM-side
Catalyst expression / vectorized DuckDB list kernels; no UDFs.

Scale: embarrassingly parallel per document; cost is O(len(word) x
len(MERGES)) per word with no joins or shuffles — the same shape as any
map-only text stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Rank-ordered merge table (operand_a, operand_b); merged symbol = a + b.
# A fixed, deterministic table: common English digraphs/trigraphs, including
# one identical-operand pair (l, l) so the leftmost-run semantics stay
# exercised. Part of the on-disk format — append-only, never reorder.
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),    # th
    ("th", "e"),   # the
    ("i", "n"),    # in
    ("e", "r"),    # er
    ("a", "n"),    # an
    ("o", "n"),    # on
    ("in", "g"),   # ing
    ("e", "n"),    # en
    ("e", "s"),    # es
    ("o", "r"),    # or
    ("t", "i"),    # ti
    ("a", "t"),    # at
    ("s", "t"),    # st
    ("l", "l"),    # ll
)


def _check_well_formed(merges: tuple[tuple[str, str], ...]) -> None:
    """Every operand must be a single char or an earlier merge's output —
    the property that makes rank-order application == priority application."""
    produced: set[str] = set()
    for a, b in merges:
        for operand in (a, b):
            if len(operand) > 1 and operand not in produced:
                raise ValueError(
                    f"merge table not well-formed: operand {operand!r} is "
                    "neither a single character nor an earlier merge output"
                )
        produced.add(a + b)


_check_well_formed(MERGES)


# --- Spark side --------------------------------------------------------------

def _merge_pass(arr: Column, a: str, b: str) -> Column:
    """One rank's pass: left fold fusing adjacent (a, b) leftmost-first."""
    ab = a + b
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_tokens(word: Column) -> Column:
    """Non-empty word → array of BPE symbols after applying MERGES."""
    arr = F.split(word, "")
    for a, b in MERGES:
        arr = _merge_pass(arr, a, b)
    return arr


# --- DuckDB twin -------------------------------------------------------------

def bpe_tokens_sql(word_expr: str) -> str:
    expr = (
        f"list_transform(range(1, len({word_expr})+1), "
        f"i -> substr({word_expr}, i::INT, 1))"
    )
    for a, b in MERGES:
        ab = a + b
        expr = (
            f"list_reduce(list_prepend([]::VARCHAR[], "
            f"list_transform({expr}, s -> [s])), "
            f"(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = '{a}' "
            f"AND x[1] = '{b}' "
            f"THEN list_append(acc[:len(acc)-1], '{ab}') "
            f"ELSE list_concat(acc, x) END)"
        )
    return expr


# --- Python reference (tests only) -------------------------------------------

def bpe_tokens_py(word: str) -> list[str]:
    """Sequential rank-order fold — mirrors the Spark/DuckDB expression."""
    symbols = list(word)
    for a, b in MERGES:
        out: list[str] = []
        for s in symbols:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        symbols = out
    return symbols


def bpe_tokens_classic_py(word: str) -> list[str]:
    """GPT-2-style priority loop: repeatedly fuse all occurrences of the
    best-ranked pair present. The equivalence target for the property test."""
    ranks = {pair: i for i, pair in enumerate(MERGES)}
    symbols = list(word)
    while len(symbols) > 1:
        pairs = {
            (symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)
        }
        best = min(pairs, key=lambda p: ranks.get(p, len(MERGES)))
        if best not in ranks:
            break
        a, b = best
        out: list[str] = []
        for s in symbols:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        symbols = out
    return symbols
