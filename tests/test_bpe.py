"""BPE merge-table application: the sequential rank-order fold (what the
Spark/DuckDB expressions implement) must equal the classic GPT-2-style
priority loop for the well-formed MERGES table, and all three
implementations (Python reference, Spark Catalyst, DuckDB) must agree."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pagopa_ecommerce_cdc_service_spark.operators.bpe import (
    MERGES,
    _check_well_formed,
    bpe_tokens,
    bpe_tokens_classic_py,
    bpe_tokens_py,
    bpe_tokens_sql,
)

_ALPHABET = "aeghilnorst"  # dense in merge operands → deep merge chains


@given(st.text(alphabet=_ALPHABET, min_size=1, max_size=24))
@settings(max_examples=300, deadline=None)
def test_rank_order_fold_equals_classic_priority_loop(word):
    assert bpe_tokens_py(word) == bpe_tokens_classic_py(word)


@given(st.text(alphabet=_ALPHABET, min_size=1, max_size=24))
@settings(max_examples=300, deadline=None)
def test_tokens_concatenate_back_to_word(word):
    assert "".join(bpe_tokens_py(word)) == word


def test_leftmost_run_semantics():
    # five l's under (l,l)->ll: leftmost-first gives [ll, ll, l]
    assert bpe_tokens_py("lllll") == ["ll", "ll", "l"]
    assert bpe_tokens_classic_py("lllll") == ["ll", "ll", "l"]


def test_chained_merges_build_trigraphs():
    assert bpe_tokens_py("the") == ["the"]          # t+h -> th, th+e -> the
    assert bpe_tokens_py("thing") == ["th", "ing"]  # in+g -> ing
    assert bpe_tokens_py("theater") == ["the", "at", "er"]


def test_malformed_table_rejected():
    with pytest.raises(ValueError, match="not well-formed"):
        _check_well_formed((("ab", "c"), ("a", "b")))


_WORDS = ["the", "thing", "theater", "lllll", "ingest", "start", "a", "zzz",
          "nation", "resting", "online", "anthill"]


def test_spark_and_duckdb_match_python_reference(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(w,) for w in _WORDS], ["w"])
    got = {
        r["w"]: list(r["toks"])
        for r in df.select("w", bpe_tokens(F.col("w")).alias("toks")).collect()
    }
    con = duckdb.connect()
    for w in _WORDS:
        expected = bpe_tokens_py(w)
        assert got[w] == expected, f"spark mismatch on {w!r}"
        literal = "'" + w + "'"
        (ducked,) = con.execute(f"SELECT {bpe_tokens_sql(literal)}").fetchone()
        assert list(ducked) == expected, f"duckdb mismatch on {w!r}"


# --- training ---------------------------------------------------------------

_CORPUS = {
    # counts chosen so ties exist (er/re at equal count in the tail words)
    "the": 50, "thing": 30, "theater": 10, "rare": 7, "rarer": 7,
    "inner": 12, "running": 9, "a": 40, "stress": 5, "assess": 5,
}


def test_train_matches_python_reference(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.bpe import (
        bpe_train,
        bpe_train_py,
    )

    words = spark.createDataFrame(
        list(_CORPUS.items()), "word string, cnt long"
    )
    assert bpe_train(words, 10) == bpe_train_py(_CORPUS, 10)


def test_train_matches_duckdb_unrolled_oracle(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.bpe import (
        bpe_train_py,
        bpe_train_sql,
    )

    rows = " UNION ALL ".join(
        f"SELECT '{w}' AS word, {c} AS cnt" for w, c in _CORPUS.items()
    )
    got = duckdb.connect().execute(bpe_train_sql(6, rows)).fetchall()
    expected = [
        (i + 1, a, b, a + b, c)
        for i, (a, b, c) in enumerate(bpe_train_py(_CORPUS, 6))
    ]
    assert got == expected


def test_train_learned_table_is_well_formed_and_compact(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.bpe import bpe_train_py

    merges = bpe_train_py(_CORPUS, 12)
    _check_well_formed(tuple((a, b) for a, b, _ in merges))
    # counts are non-increasing only within equal symbol generations is NOT
    # guaranteed by BPE; what IS guaranteed: every count is positive
    assert all(c > 0 for _, _, c in merges)


def test_train_stops_when_nothing_left_to_merge(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.bpe import (
        bpe_train,
        bpe_train_py,
    )

    tiny = {"ab": 3, "cd": 2}  # two merges exhaust every multi-symbol word
    words = spark.createDataFrame(list(tiny.items()), "word string, cnt long")
    got = bpe_train(words, 10)
    assert got == bpe_train_py(tiny, 10)
    assert len(got) == 2
