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
