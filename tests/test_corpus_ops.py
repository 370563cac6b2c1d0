"""Edge-case tests for the round-3 corpus operators (repetition stats,
decontamination, BM25, funnel, nearest-pivot IVF assignment) — semantics the
oracle-parity hash can't isolate on the synthetic corpus.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pagopa_ecommerce_cdc_service_spark.operators.similarity import (
    nearest_pivot,
    quantize,
)
from pagopa_ecommerce_cdc_service_spark.operators.text import (
    word_ngrams,
)


# --- word n-grams ----------------------------------------------------------

def test_word_ngrams_shorter_than_n_is_empty(spark):
    df = spark.createDataFrame(
        [("one two",), ("one",), ("",), ("a b c",)], ["text"]
    )
    out = [r[0] for r in df.select(word_ngrams(F.col("text"), 3)).collect()]
    assert out == [[], [], [], ["a b c"]]


def test_word_ngrams_collapses_whitespace(spark):
    df = spark.createDataFrame([("  a   b \t c  ",)], ["text"])
    out = df.select(word_ngrams(F.col("text"), 2).alias("g")).head()[0]
    assert out == ["a b", "b c"]


# --- nearest_pivot ---------------------------------------------------------

def _emb_df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", quantize(F.col("embedding")).alias("qvec")
    )


def test_nearest_pivot_picks_closest(spark):
    emb = _emb_df(
        spark,
        [(10, [0.9, 0.0]), (11, [0.0, 1.1]), (12, [-1.0, 0.0])],
    )
    piv = _emb_df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])]).select(
        F.col("vec_id").alias("pid"), F.col("qvec").alias("pv")
    )
    got = {
        r["vec_id"]: r["pid"]
        for r in nearest_pivot(emb, piv).select("vec_id", "pid").collect()
    }
    assert got == {10: 1, 11: 2, 12: 2}  # (-1,0): d2 4e6 vs 2e6 → pid 2


def test_nearest_pivot_tie_breaks_to_smallest_pid(spark):
    # query vector equidistant from both pivots → deterministic smallest pid
    emb = _emb_df(spark, [(10, [0.0, 0.0])])
    piv = _emb_df(spark, [(2, [1.0, 0.0]), (1, [0.0, 1.0])]).select(
        F.col("vec_id").alias("pid"), F.col("qvec").alias("pv")
    )
    assert nearest_pivot(emb, piv).head()["pid"] == 1


def test_nearest_pivot_adds_no_shuffle(spark):
    emb = _emb_df(spark, [(10, [0.9, 0.0]), (11, [0.0, 1.1])])
    piv = _emb_df(spark, [(1, [1.0, 0.0])]).select(
        F.col("vec_id").alias("pid"), F.col("qvec").alias("pv")
    )
    plan = nearest_pivot(emb, piv)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


# --- funnel / decontamination / repetition over the suite ------------------

@pytest.fixture(scope="module")
def suite():
    import __spark_entry__ as entry

    return entry.queries()


def test_quality_funnel_conserves_corpus(spark, sf_dir, suite):
    import duckdb

    total = duckdb.connect().execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    rows = suite["t_quality_funnel"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == total
    assert {r["rule"] for r in rows} <= {
        "too_short", "too_repetitive", "stopword_poor", "pass"
    }
    # stages must be distinct and consistent with the rule labels
    assert len({r["stage"] for r in rows}) == len(rows)


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir, suite):
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import _DECON_MOD

    out = suite["t_decontaminate"](spark, sf_dir)
    bench_rows = out.filter(
        md5_long(F.col("doc_id").cast("string")) % _DECON_MOD == 1
    ).count()
    assert bench_rows == 0  # benchmark docs never appear in the report


def test_repetition_stats_known_doc(spark, suite, tmp_path):
    # "a b a b a b": bigrams [ab, ba, ab, ba, ab] → total 5, distinct 2,
    # top 3; trigrams [aba, bab, aba, bab] → dup frac 2/4
    spark.createDataFrame(
        [(0, "a b a b a b", "en", "s", 11)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        t_repetition_stats,
    )

    r = t_repetition_stats(spark, str(tmp_path)).head()
    assert r["n_tokens"] == 6
    assert r["dup_bigram_frac"] == pytest.approx(3 / 5)
    assert r["top_bigram_frac"] == pytest.approx(3 / 5)
    assert r["dup_trigram_frac"] == pytest.approx(2 / 4)


def test_bm25_scores_monotonic_in_tf(spark, tmp_path):
    # same length docs; more matches of a query term ⇒ strictly higher score
    docs = [
        (0, "join join join pad pad pad", "en", "s", 1),
        (1, "join join pad pad pad pad", "en", "s", 1),
        (2, "pad pad pad pad pad pad", "en", "s", 1),
    ]
    spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        t_bm25_topdocs,
    )

    rows = {r["doc_id"]: r["bm25_score"] for r in t_bm25_topdocs(spark, str(tmp_path)).collect()}
    assert rows[0] > rows[1] > rows[2] == 0.0


# --- global shuffle sharding -----------------------------------------------

def test_global_shuffle_checksum_pins_intra_shard_order(spark, tmp_path):
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long_py
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _N_SHUFFLE_SHARDS,
        _SHUFFLE_P,
        t_global_shuffle_shards,
    )

    docs = [(i, f"doc {i}", "en", "s", 10 + i) for i in range(40)]
    spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["shard"]: (r["n_docs"], r["sum_chars"], r["order_checksum"])
        for r in t_global_shuffle_shards(spark, str(tmp_path)).collect()
    }

    # sequential reference: shard by md5, order by (md5, doc_id)
    by_shard: dict[int, list[tuple[int, int, int]]] = {}
    for i, _, _, _, nc in docs:
        h = md5_long_py(str(i))
        by_shard.setdefault(h % _N_SHUFFLE_SHARDS, []).append((h, i, nc))
    expected = {}
    for s, rows in by_shard.items():
        rows.sort()
        expected[s] = (
            len(rows),
            sum(nc for _, _, nc in rows),
            sum((p + 1) * (h % _SHUFFLE_P) for p, (h, _, _) in enumerate(rows)),
        )
    assert got == expected


def test_global_shuffle_membership_is_partitioning_invariant(spark, tmp_path):
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        t_global_shuffle_shards,
    )

    docs = [(i, "x", "en", "s", 1) for i in range(64)]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "a" / "documents.parquet"))
    df.repartition(13).write.mode("overwrite").parquet(str(tmp_path / "b" / "documents.parquet"))
    a = sorted(map(tuple, t_global_shuffle_shards(spark, str(tmp_path / "a")).collect()))
    b = sorted(map(tuple, t_global_shuffle_shards(spark, str(tmp_path / "b")).collect()))
    assert a == b


# --- PII scrub --------------------------------------------------------------

def test_pii_scrub_redacts_known_patterns(spark, tmp_path):
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import t_pii_scrub

    # doc text itself carries one extra email + one ip; the query injects one
    # synthetic email, phone, and ip derived from doc_id=3
    text = "write to bob.smith@corp.example.org from 192.168.001.7 today"
    spark.createDataFrame(
        [(3, text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    r = t_pii_scrub(spark, str(tmp_path)).head()
    assert r["n_emails"] == 2       # corpus email + injected user3@example.com
    assert r["n_phones"] == 1       # injected +39-06-0000003
    assert r["n_ips"] == 2          # corpus ip + injected 10.3.0.21
    import hashlib

    scrubbed = (
        "write to <EMAIL> from <IP> today"
        " contact <EMAIL> <PHONE> ip <IP>"
    )
    assert r["scrubbed_len"] == len(scrubbed)
    assert r["scrubbed_hash"] == hashlib.md5(scrubbed.encode()).hexdigest()


# --- content-defined chunking ---------------------------------------------

def test_content_chunks_partition_each_document(spark):
    """Chunks exactly tile [1..len(text)]: starts begin at 1, spans are
    contiguous and non-overlapping, lengths sum to the doc length, and
    re-concatenating the substrings reproduces the document byte-for-byte.
    Also pins the window-edge law: no cut before position W or at the
    last character, so every chunk is non-empty and the first is >= W
    chars on any text of length > W."""
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        CDC_W,
        content_cut_positions,
    )

    texts = [
        "short",                      # below the window: single chunk
        "exactly8",                   # == W: single chunk (cuts need p > W-1 AND p < n)
        "The quick brown fox jumps over the lazy dog " * 20,
        "abcdefgh" * 64,              # periodic content
        "x",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = df.withColumn("cuts", content_cut_positions(F.col("text"))).collect()
    for r in rows:
        text, cuts, n = r["text"], list(r["cuts"]), len(r["text"])
        assert cuts == sorted(set(cuts))
        assert all(CDC_W <= c <= n - 1 for c in cuts), (cuts, n)
        starts = [1] + [c + 1 for c in cuts]
        ends = cuts + [n]
        spans = [text[s - 1 : e] for s, e in zip(starts, ends)]
        assert all(spans), "empty chunk"
        assert "".join(spans) == text
        if n > CDC_W:
            assert len(spans[0]) >= CDC_W


def test_content_chunks_shift_invariant_interior(spark):
    """The defining CDC property: a passage shared by two documents at
    DIFFERENT offsets produces identical interior chunks (a fixed-size
    chunker would misalign every one of them)."""
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        content_cut_positions,
    )

    shared = (
        "the quick brown fox jumps over the lazy dog while content "
        "defined chunking keeps interior boundaries aligned " * 3
    )
    docs = [("A" * 7 + " ") + shared, ("totally different and longer prefix!! " + shared)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])
    rows = df.withColumn("cuts", content_cut_positions(F.col("text"))).collect()
    chunk_sets = []
    for r in rows:
        text, cuts, n = r["text"], list(r["cuts"]), len(r["text"])
        starts = [1] + [c + 1 for c in cuts]
        ends = cuts + [n]
        chunk_sets.append({text[s - 1 : e] for s, e in zip(starts, ends)})
    assert chunk_sets[0] & chunk_sets[1], "no shared interior chunk"


def _py_cut_positions(text: str) -> list[int]:
    """Independent reference for the chunker's cut law: a sequential
    ROLLING-hash scan (H(p+1) derived from H(p)), deliberately a different
    evaluation strategy from BOTH production paths (the segmented Catalyst
    expression and the shifted-slice numpy kernel), so agreement is
    three-way evidence, not self-confirmation."""
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        CDC_B,
        CDC_D,
        CDC_M,
        CDC_W,
    )

    n = len(text)
    if n - 1 < CDC_W:
        return []
    bw = pow(CDC_B, CDC_W, CDC_M)
    # H(p) = sum_j ord(text[p-1-j]) * B^j  (1-based p); seed at p = W
    h = 0
    for j in range(CDC_W):
        h = (h + ord(text[CDC_W - 1 - j]) * pow(CDC_B, j, CDC_M)) % CDC_M
    cuts = [CDC_W] if h % CDC_D == 0 else []
    for p in range(CDC_W, n - 1):  # roll to p+1
        h = (h * CDC_B + ord(text[p]) - ord(text[p - CDC_W]) * bw) % CDC_M
        if h % CDC_D == 0:
            cuts.append(p + 1)
    return cuts


def test_content_chunks_segmented_equals_linear_scan(spark):
    """The segmented evaluation (CDC_SEG position tiles) must be
    position-for-position identical to a full linear scan, including at
    every segment-boundary alignment: lengths straddling, exactly on, and
    one off a CDC_SEG multiple."""
    import random

    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        CDC_SEG,
        CDC_W,
        content_cut_positions,
    )

    rng = random.Random(20260814)
    alphabet = "abcdefgh ijklmnop"
    lengths = [
        CDC_W,
        CDC_W + 1,
        CDC_SEG - 1,
        CDC_SEG,
        CDC_SEG + 1,
        CDC_SEG + CDC_W,
        2 * CDC_SEG - 1,
        2 * CDC_SEG,
        2 * CDC_SEG + 7,
        3 * CDC_SEG + 123,
    ]
    texts = ["".join(rng.choice(alphabet) for _ in range(n)) for n in lengths]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = (
        df.withColumn("cuts", content_cut_positions(F.col("text")))
        .orderBy("doc_id")
        .collect()
    )
    for r, text in zip(rows, texts):
        assert list(r["cuts"]) == _py_cut_positions(text), len(text)


def test_chunk_rows_arrow_equals_catalyst_at_threshold(spark):
    """The hybrid router's two paths are cut-for-cut identical: the same
    documents chunked with the threshold forced to 0 (everything Arrow)
    and forced high (everything Catalyst) yield identical chunk rows,
    on lengths straddling the CDC_LONG_DOC boundary."""
    import random

    from pagopa_ecommerce_cdc_service_spark.operators import text as text_ops
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import _chunk_rows

    rng = random.Random(7)
    alphabet = "content defined chunking ABC 012 "
    lengths = [
        200,
        text_ops.CDC_LONG_DOC - 1,
        text_ops.CDC_LONG_DOC,
        text_ops.CDC_LONG_DOC + 1,
        text_ops.CDC_LONG_DOC + 500,
    ]
    docs = spark.createDataFrame(
        [
            (i, "".join(rng.choice(alphabet) for _ in range(n)))
            for i, n in enumerate(lengths)
        ],
        ["doc_id", "text"],
    )
    mixed = sorted(map(tuple, _chunk_rows(docs).collect()))
    orig = text_ops.CDC_LONG_DOC
    try:
        text_ops.CDC_LONG_DOC = 0
        all_arrow = sorted(map(tuple, _chunk_rows(docs).collect()))
        text_ops.CDC_LONG_DOC = 1 << 40
        all_catalyst = sorted(map(tuple, _chunk_rows(docs).collect()))
    finally:
        text_ops.CDC_LONG_DOC = orig
    assert mixed == all_arrow == all_catalyst
    assert len(mixed) > len(lengths)  # every doc actually split


def test_content_chunks_multi_megabyte_document(spark):
    """A 5 MB document chunks in bounded time and memory (routed through
    the Arrow kernel by the hybrid), and its chunk rows match spans
    derived from the independent rolling-scan reference exactly."""
    import random
    import time

    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long_py
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import _chunk_rows

    rng = random.Random(99)
    big = "".join(
        rng.choice("the quick brown fox 0123456789 ") for _ in range(5_000_000)
    )
    df = spark.createDataFrame([(7, big)], ["doc_id", "text"]).repartition(1)
    t0 = time.monotonic()
    rows = sorted(map(tuple, _chunk_rows(df).collect()))
    wall = time.monotonic() - t0
    cuts = _py_cut_positions(big)
    starts = [1] + [c + 1 for c in cuts]
    ends = cuts + [len(big)]
    expected = sorted(
        (7, i, s, e - s + 1, md5_long_py(big[s - 1 : e]))
        for i, (s, e) in enumerate(zip(starts, ends))
    )
    assert rows == expected
    # ~5M candidates / 64 expected-cut density
    assert 40_000 < len(cuts) < 120_000
    assert wall < 120, f"5 MB chunking took {wall:.1f}s"


def _py_rewrite(docs: list[tuple[int, str]], min_len: int) -> list[tuple]:
    """Sequential reference for the chunk-dedup REWRITE: global
    first-occurrence keeper by (doc_id, chunk_idx) within each
    (chunk_hash, chunk_len) group, kept chunks re-concatenated."""
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long_py

    chunks = []  # (doc_id, idx, text)
    for doc_id, text in docs:
        cuts = _py_cut_positions(text)
        starts = [1] + [c + 1 for c in cuts]
        ends = cuts + [len(text)]
        for i, (s, e) in enumerate(zip(starts, ends)):
            chunks.append((doc_id, i, text[s - 1 : e]))
    seen = set()
    kept = {}
    for doc_id, i, ch in sorted(chunks, key=lambda c: (c[0], c[1])):
        key = (md5_long_py(ch), len(ch))
        dropped = len(ch) >= min_len and key in seen
        seen.add(key)
        kept.setdefault(doc_id, []).append((i, ch, dropped))
    out = []
    for doc_id, items in kept.items():
        parts = [ch for _, ch, dropped in sorted(items) if not dropped]
        rebuilt = "".join(parts)
        out.append((doc_id, len(parts), len(rebuilt), rebuilt))
    return sorted(out)


def test_chunk_rewrite_arrow_equals_catalyst_at_threshold(spark):
    """The rewrite's two rebuild routes are text-for-text identical on
    lengths straddling CDC_LONG_DOC, including documents that share
    duplicated passages (so the drop lists are non-empty), and both match
    the sequential reference."""
    import random

    from pagopa_ecommerce_cdc_service_spark.operators import text as text_ops
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _CHUNK_DEDUP_MIN_LEN,
        _chunk_rewrite,
    )

    rng = random.Random(11)
    alphabet = "rewrite route parity XY 789 "
    shared = "".join(rng.choice(alphabet) for _ in range(700))
    lengths = [300, text_ops.CDC_LONG_DOC - 1, text_ops.CDC_LONG_DOC + 1, 12_000]
    rows = []
    for i, n in enumerate(lengths):
        body = "".join(rng.choice(alphabet) for _ in range(n))
        # splice the shared passage into every doc at an offset that varies
        rows.append((i, body[: 50 * (i + 1)] + shared + body[50 * (i + 1) :]))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    mixed = sorted(map(tuple, _chunk_rewrite(docs).collect()))
    orig = text_ops.CDC_LONG_DOC
    try:
        text_ops.CDC_LONG_DOC = 0
        all_arrow = sorted(map(tuple, _chunk_rewrite(docs).collect()))
        text_ops.CDC_LONG_DOC = 1 << 40
        all_catalyst = sorted(map(tuple, _chunk_rewrite(docs).collect()))
    finally:
        text_ops.CDC_LONG_DOC = orig
    assert mixed == all_arrow == all_catalyst
    assert mixed == _py_rewrite(rows, _CHUNK_DEDUP_MIN_LEN)
    originals = dict(rows)
    assert any(r[2] < len(originals[r[0]]) for r in mixed), (
        "no document actually lost duplicated mass"
    )


def test_chunk_rewrite_multi_megabyte_document(spark):
    """A multi-MB document (with an internally duplicated passage) rewrites
    in bounded time through the Arrow route — the Catalyst per-position
    substr walk would be quadratic here (round-6 ADVICE scenario)."""
    import random
    import time

    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _CHUNK_DEDUP_MIN_LEN,
        _chunk_rewrite,
    )

    rng = random.Random(23)
    passage = "".join(rng.choice("dup mass 456 ") for _ in range(10_000))
    big = (
        "".join(rng.choice("the quick brown fox 0123456789 ") for _ in range(2_000_000))
        + passage
        + "".join(rng.choice("lazy dog tail 77 ") for _ in range(2_000_000))
        + passage
    )
    df = spark.createDataFrame([(3, big)], ["doc_id", "text"]).repartition(1)
    t0 = time.monotonic()
    rows = sorted(map(tuple, _chunk_rewrite(df).collect()))
    wall = time.monotonic() - t0
    assert rows == _py_rewrite([(3, big)], _CHUNK_DEDUP_MIN_LEN)
    assert rows[0][2] < len(big), "duplicated passage not dropped"
    assert wall < 120, f"multi-MB rewrite took {wall:.1f}s"


# --- robust winnowing -------------------------------------------------------

def _py_winnow(text: str, k: int = 5, w: int = 4) -> set[int]:
    """Sequential reference of the winnowing law (same hash domain)."""
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long_py
    from pagopa_ecommerce_cdc_service_spark.operators.text import MERSENNE31

    if len(text) >= k:
        grams = [
            md5_long_py(text[i : i + k]) % MERSENNE31
            for i in range(len(text) - k + 1)
        ]
    else:
        grams = [md5_long_py(text) % MERSENNE31]
    if len(grams) < w:
        return {min(grams)}
    return {min(grams[i : i + w]) for i in range(len(grams) - w + 1)}


def test_winnow_matches_python_reference_and_detection_guarantee(spark):
    """Two laws at once: (1) the Spark expression equals the sequential
    reference fingerprint set document-for-document; (2) the published
    winnowing guarantee — any substring shared by two documents of length
    >= w + k - 1 yields at least one shared fingerprint — holds for
    planted common substrings at every alignment."""
    import random

    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        WINNOW_W,
        positional_gram_hashes,
        winnow_from_grams,
    )

    rng = random.Random(41)
    alphabet = "winnow guarantee xyz 358 "
    shared = "".join(rng.choice(alphabet) for _ in range(5 + WINNOW_W - 1))
    docs = []
    for i in range(12):
        body = "".join(rng.choice(alphabet) for _ in range(30 + 17 * i))
        off = min(3 * i, len(body))
        docs.append((i, body[:off] + shared + body[off:]))
    docs.append((98, "tiny"))            # shorter than k
    docs.append((99, "under-w doc!"))    # fewer grams than w
    df = (
        spark.createDataFrame(docs, ["doc_id", "text"])
        .select("doc_id", positional_gram_hashes(F.col("text")).alias("g"))
        .select("doc_id", winnow_from_grams(F.col("g")).alias("fps"))
    )
    got = {r["doc_id"]: set(r["fps"]) for r in df.collect()}
    for doc_id, text in docs:
        assert got[doc_id] == _py_winnow(text), doc_id
    # detection guarantee across every pair holding the planted substring
    for i in range(12):
        for j in range(i + 1, 12):
            assert got[i] & got[j], (i, j)


# --- exact-substring duplication spans --------------------------------------

def test_exact_substr_merges_overlapping_windows(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        exact_substr_spans,
    )

    # docs 1 and 2 share a 5-token run "a b c d e" => with w=3, windows at
    # positions 1,2,3 of the shared run are duplicated and must merge into
    # ONE maximal span covering the whole run in each document
    docs = spark.createDataFrame(
        [
            (1, "a b c d e x1 y1 z1"),
            (2, "p2 q2 a b c d e"),
            (3, "u3 v3 w3 t3"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in exact_substr_spans(docs, w=3).collect()
    }
    assert out == {(1, 1, 5, 5), (2, 3, 7, 5)}


def test_exact_substr_detects_within_doc_repeats(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        exact_substr_spans,
    )

    # "m n o" occurs twice INSIDE one document (positions 1 and 6) and
    # nowhere else: both occurrences are duplicated spans (paper
    # semantics: any repeat counts, not just cross-document)
    docs = spark.createDataFrame(
        [(1, "m n o x y m n o"), (2, "unrelated words entirely here")],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substr_spans(docs, w=3).collect()
    }
    assert out == {(1, 1, 3), (1, 6, 8)}


def test_exact_substr_touching_windows_merge_across_gap(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        exact_substr_spans,
    )

    # two duplicated windows whose starts differ by exactly w (touching,
    # zero overlap) must merge; a gap of w+1 must NOT merge
    docs = spark.createDataFrame(
        [
            # shared windows: "a b c" at pos 1 and "d e f" at pos 4 (touch)
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            # shared windows at pos 1 and pos 5 (gap of one non-shared
            # window start) — doc 3/4 texts differ at position 4
            (3, "g h i x3 j k l"),
            (4, "g h i y4 j k l"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substr_spans(docs, w=3).collect()
    }
    assert (1, 1, 6) in out and (2, 1, 6) in out
    assert (3, 1, 3) in out and (3, 5, 7) in out
    assert (4, 1, 3) in out and (4, 5, 7) in out


# --- entity golden record ----------------------------------------------------

def test_golden_record_merges_chained_matches(spark):
    from decimal import Decimal

    from pagopa_ecommerce_cdc_service_spark.plans.pipeline_queries import (
        golden_records,
    )

    dec = lambda s: Decimal(s)
    # chain: cust 10 - supp 5 - cust 11 - supp 6 => ONE entity with
    # 2 custs + 2 supps; plus an isolated pair (cust 20, supp 9)
    m = spark.createDataFrame(
        [
            (10, 5, dec("100.00"), dec("120.00")),
            (11, 5, dec("101.00"), dec("120.00")),
            (11, 6, dec("101.00"), dec("95.50")),
            (20, 9, dec("7.25"), dec("8.00")),
        ],
        "cust long, supp long, c_bal decimal(12,2), s_bal decimal(12,2)",
    )
    rows = {r.entity_id: r for r in golden_records(m).collect()}
    # entity id = min NODE id: supp 5 -> 5*2+1 = 11 undercuts cust 10 -> 20
    assert set(rows) == {11, 19}
    big = rows[11]
    assert (big.n_cust, big.n_supp) == (2, 2)
    assert big.golden_bal_cents == 12000  # max of all member balances
    assert (big.rep_cust, big.rep_supp) == (10, 5)
    small = rows[19]
    assert (small.n_cust, small.n_supp) == (1, 1)
    assert small.golden_bal_cents == 800


def _brute_substr_spans(docs: dict[int, str], w: int) -> set[tuple[int, int, int]]:
    """Reference ExactSubstr: count every w-token window across the corpus,
    mark duplicated positions, merge overlapping/touching windows."""
    from collections import Counter

    toks = {d: t.split() for d, t in docs.items()}
    counts = Counter()
    for t in toks.values():
        for i in range(len(t) - w + 1):
            counts[" ".join(t[i : i + w])] += 1
    spans = set()
    for d, t in toks.items():
        dup = [
            i + 1
            for i in range(len(t) - w + 1)
            if counts[" ".join(t[i : i + w])] >= 2
        ]
        run: list[int] = []
        for p in dup + [None]:
            if p is not None and (not run or p - run[-1] <= w):
                run.append(p)
                continue
            if run:
                spans.add((d, run[0], run[-1] + w - 1))
            run = [p] if p is not None else []
    return spans


def test_exact_substr_matches_bruteforce_property(spark):
    """Randomized corpora (small vocab forces collisions): the distributed
    posting/window/islands plan must equal the quadratic reference."""
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        exact_substr_spans,
    )

    vocab = ["aa", "bb", "cc", "dd"]
    doc = st.lists(st.sampled_from(vocab), min_size=0, max_size=14).map(" ".join)
    corpora = st.lists(doc, min_size=1, max_size=5)

    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpora)
    def run(texts):
        docs = {i + 1: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(
            [(d, t) for d, t in docs.items()], ["doc_id", "text"]
        )
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in exact_substr_spans(df, w=3).collect()
        }
        assert got == _brute_substr_spans(docs, 3)

    run()


def _brute_keepone_rebuild(docs: dict[int, str], w: int):
    """Reference keep-first ExactSubstr rewrite: cut every occurrence of a
    duplicated window EXCEPT the canonical first (min (doc_id, pos));
    rebuild from uncovered tokens."""
    toks = {d: t.split() for d, t in docs.items()}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        t = toks[d]
        for i in range(len(t) - w + 1):
            occ.setdefault(" ".join(t[i : i + w]), []).append((d, i + 1))
    cut: dict[int, set[int]] = {d: set() for d in toks}
    for lst in occ.values():
        if len(lst) >= 2:
            for d, p in lst[1:]:
                cut[d].update(range(p, p + w))
    out = {}
    for d, t in toks.items():
        kept = [tok for i, tok in enumerate(t, 1) if i not in cut[d]]
        out[d] = (" ".join(kept), len(t), len(kept))
    return out


def test_exact_substr_keepone_preserves_canonical_copy(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        exact_substr_keepone_rewrite,
        exact_substr_rewrite,
    )

    # the same 3-gram "x y z" in docs 1 and 2: cut-all erases both, the
    # keep-one policy preserves doc 1's (canonical) copy
    docs = {1: "x y z a", 2: "b x y z"}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    keepone = {
        r.doc_id: (r.rebuilt_text, r.n_tokens, r.kept_tokens)
        for r in exact_substr_keepone_rewrite(df, w=3).collect()
    }
    assert keepone == _brute_keepone_rebuild(docs, 3)
    assert keepone[1] == ("x y z a", 4, 4)
    assert keepone[2] == ("b", 4, 1)
    cutall = {
        r.doc_id: r.kept_tokens for r in exact_substr_rewrite(df, w=3).collect()
    }
    assert cutall == {1: 1, 2: 1}


def test_exact_substr_keepone_matches_bruteforce_property(spark):
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        exact_substr_keepone_rewrite,
    )

    vocab = ["aa", "bb", "cc"]
    doc = st.lists(st.sampled_from(vocab), min_size=1, max_size=12).map(" ".join)
    corpora = st.lists(doc, min_size=1, max_size=4)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpora)
    def run(texts):
        docs = {i + 1: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(
            [(d, t) for d, t in docs.items()], ["doc_id", "text"]
        )
        got = {
            r.doc_id: (r.rebuilt_text, r.n_tokens, r.kept_tokens)
            for r in exact_substr_keepone_rewrite(df, w=3).collect()
        }
        assert got == _brute_keepone_rebuild(docs, 3)

    run()


# --- unigram surprisal --------------------------------------------------------

def test_unigram_surprisal_matches_bruteforce(spark):
    """Fixed corpus: per-doc surprisal sums must equal a Python reference
    computing floor(log2(N // c)) per token with exact integers."""
    from collections import Counter

    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        t_unigram_surprisal,
    )

    texts = {
        1: "a a b c",
        2: "a b b d d",
        3: "c",
        4: "e e e e e e",
    }
    import tempfile

    tmp = tempfile.mkdtemp(prefix="surprisal-ut-")
    spark.createDataFrame(
        [(d, t, "xx", "src", len(t)) for d, t in texts.items()],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    toks = {d: t.split() for d, t in texts.items()}
    counts = Counter(tok for ts in toks.values() for tok in ts)
    N = sum(counts.values())
    expect = {}
    for d, ts in toks.items():
        s = sum((N // counts[t]).bit_length() - 1 for t in ts)
        expect[d] = (len(ts), s, s * 1000 // len(ts))

    got = {
        r.doc_id: (r.n_tokens, r.surprisal_sum, r.surprisal_per_1k)
        for r in t_unigram_surprisal(spark, tmp).collect()
    }
    assert got == expect


# --- k-center coreset ---------------------------------------------------------

def test_kcenter_matches_bruteforce_fps(spark):
    """Synthetic embeddings: the unrolled plan must reproduce greedy
    farthest-point sampling (seed = min id, argmax min-distance with
    (d desc, id asc) ties) computed by a quadratic Python reference."""
    import tempfile

    from pagopa_ecommerce_cdc_service_spark.operators.similarity import QUANT
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        e_kcenter_coreset,
    )

    vecs = {
        0: [0.0, 0.0],
        1: [1.0, 0.0],
        2: [0.0, 1.0],
        3: [10.0, 10.0],
        4: [10.0, 10.5],
        5: [-7.0, 2.0],
        6: [3.0, -4.0],
    }
    tmp = tempfile.mkdtemp(prefix="kcenter-ut-")
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    q = {i: [round(x * QUANT) for x in v] for i, v in vecs.items()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    centers = [min(q)]
    dmin = {i: d2(v, q[centers[0]]) for i, v in q.items()}
    expect = []
    for rnd in range(1, 4):
        # radius after round `rnd` = max min-distance = the next pick's d
        nxt = max(dmin, key=lambda i: (dmin[i], -i))
        expect.append((rnd, centers[-1], dmin[nxt]))
        centers.append(nxt)
        for i, v in q.items():
            dmin[i] = min(dmin[i], d2(v, q[nxt]))
    expect.append((4, centers[3], max(dmin.values())))
    got = sorted(
        (r.sel_round, r.center_id, r.radius_sq)
        for r in e_kcenter_coreset(spark, tmp).collect()
    )
    assert got == expect, (got, expect)


# --- interval overlap join ----------------------------------------------------

def test_interval_overlap_join_matches_bruteforce(spark):
    """Synthetic events: the bucketed broadcast rewrite must equal a
    Python theta-join over gap-island sessions and the exact integer
    hot-hour law."""
    import datetime as dt
    import tempfile
    from collections import Counter

    from pagopa_ecommerce_cdc_service_spark.plans.events_queries import (
        w_interval_overlap_join,
    )

    H = 3_600_000
    base = 1_700_000_000_000  # ms, hour-unaligned on purpose? keep raw
    # (user, offset-ms): user 1 has one long session spanning 3 hours and a
    # separate later session; user 2 clusters inside one hot hour
    ev = [
        (1, 0), (1, 20 * 60_000), (1, 100 * 60_000), (1, 170 * 60_000),
        (1, 400 * 60_000),
        (2, 30 * 60_000), (2, 45 * 60_000), (2, 50 * 60_000),
        (2, 55 * 60_000), (2, 60 * 60_000),
    ]
    rows = [
        (i, dt.datetime.fromtimestamp((base + off) / 1000, dt.timezone.utc)
             .replace(tzinfo=None),
         u, "click", 1.0, "{}")
        for i, (u, off) in enumerate(ev)
    ]
    tmp = tempfile.mkdtemp(prefix="overlap-ut-")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props"
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    # reference: gap-island sessions (>= 30 min starts new), hot hours,
    # naive theta join
    ms = sorted((u, base + off, i) for i, (u, off) in enumerate(ev))
    sessions = []
    cur = None
    for u, t, _ in ms:
        if cur and cur[0] == u and t - cur[2] < 1_800_000:
            cur = (u, cur[1], t)
        else:
            if cur:
                sessions.append(cur)
            cur = (u, t, t)
    sessions.append(cur)
    hours = Counter((base + off) // H for _, off in ev)
    total, n_hours = sum(hours.values()), len(hours)
    hot = {hb: c for hb, c in hours.items() if 4 * c * n_hours >= 5 * total}
    expect = set()
    for u, s, e in sessions:
        for hb, c in hot.items():
            if s < (hb + 1) * H and e >= hb * H:
                ov = min(e + 1, (hb + 1) * H) - max(s, hb * H)
                expect.add((u, s, hb * H, c, ov))

    got = {
        (r.user_id, r.session_start_ms, r.hour_ms, r.hour_events,
         r.overlap_ms)
        for r in w_interval_overlap_join(spark, tmp).collect()
    }
    assert got == expect, (sorted(got), sorted(expect))


def test_exact_substr_rewrite_cuts_all_duplicated_spans(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        exact_substr_rewrite,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e x1 y1 z1"),
            (2, "p2 q2 a b c d e"),
            (3, "only unique tokens here"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.rebuilt_text, r.n_tokens, r.kept_tokens)
        for r in exact_substr_rewrite(docs, w=3).collect()
    }
    # the shared 5-token run "a b c d e" is cut from BOTH docs (cut-all)
    assert got[1] == ("x1 y1 z1", 8, 3)
    assert got[2] == ("p2 q2", 7, 2)
    assert got[3] == ("only unique tokens here", 4, 4)


def test_exact_substr_rewrite_matches_bruteforce_property(spark):
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        exact_substr_rewrite,
    )

    vocab = ["aa", "bb", "cc"]
    doc = st.lists(st.sampled_from(vocab), min_size=0, max_size=12).map(" ".join)
    corpora = st.lists(doc, min_size=1, max_size=4)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpora)
    def run(texts):
        docs = {i + 1: t for i, t in enumerate(texts)}
        spans = _brute_substr_spans(docs, 3)
        expect = {}
        import re

        for d, t in docs.items():
            # repo tokenization convention: split(trim(text), '\\s+') yields
            # [""] (size 1) for empty/whitespace-only text in BOTH engines
            ts = re.split(r"\s+", t.strip())
            cut = set()
            for dd, s, e in spans:
                if dd == d:
                    cut.update(range(s, e + 1))
            keep = [tok for i, tok in enumerate(ts, 1) if i not in cut]
            expect[d] = (" ".join(keep), len(ts), len(keep))
        df = spark.createDataFrame(
            [(d, t) for d, t in docs.items()], ["doc_id", "text"]
        )
        got = {
            r.doc_id: (r.rebuilt_text, r.n_tokens, r.kept_tokens)
            for r in exact_substr_rewrite(df, w=3).collect()
        }
        assert got == expect

    run()


# --- bigram surprisal ----------------------------------------------------------

def _brute_bigram_surprisal(score_docs, ref_docs, penalty=4):
    import re
    from collections import Counter

    def toks(t):
        return re.split(r"\s+", t.strip())

    uni = Counter(w for t in ref_docs.values() for w in toks(t))
    N = sum(uni.values())
    bi = Counter()
    for t in ref_docs.values():
        ts = toks(t)
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] += 1

    def fl2(x):
        return x.bit_length() - 1

    out = {}
    for d, t in score_docs.items():
        ts = toks(t)
        s = fl2(N // max(uni.get(ts[0], 0), 1))
        for a, b in zip(ts, ts[1:]):
            if (a, b) in bi:
                s += fl2(uni[a] // bi[(a, b)])
            else:
                s += penalty + fl2(N // max(uni.get(b, 0), 1))
        out[d] = (len(ts), s, s * 1000 // len(ts))
    return out


def test_bigram_surprisal_self_scoring_matches_bruteforce(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        bigram_surprisal,
    )

    texts = {1: "a b a b c", 2: "a b", 3: "c c c a", 4: "d"}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.surprisal_sum, r.surprisal_per_1k)
        for r in bigram_surprisal(df).collect()
    }
    assert got == _brute_bigram_surprisal(texts, texts)


def test_bigram_surprisal_backoff_fires_on_unseen_bigrams(spark):
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        bigram_surprisal,
    )

    ref = {1: "a b a b", 2: "c a b c"}
    score = {10: "b a x", 11: "a b"}  # "b a", "a x" unseen; "x" OOV
    rdf = spark.createDataFrame(list(ref.items()), ["doc_id", "text"])
    sdf = spark.createDataFrame(list(score.items()), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.surprisal_sum, r.surprisal_per_1k)
        for r in bigram_surprisal(sdf, rdf).collect()
    }
    expect = _brute_bigram_surprisal(score, ref)
    assert got == expect
    # sanity: the unseen-bigram doc really is more surprising per token
    assert got[10][2] > got[11][2]


def test_bigram_surprisal_null_text_scores_nothing(spark):
    # round-7 ADVICE: a NULL-text row must be ABSENT from the output (the
    # Python reference would raise on it), not silently score as one
    # phantom "first token" of floor_log2(N) surprisal.
    from pagopa_ecommerce_cdc_service_spark.operators.text import (
        bigram_surprisal,
    )

    df = spark.createDataFrame(
        [(1, "a b a"), (2, None)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.surprisal_sum, r.surprisal_per_1k)
        for r in bigram_surprisal(df).collect()
    }
    assert set(got) == {1}
    assert got == _brute_bigram_surprisal({1: "a b a"}, {1: "a b a"})


def test_wminhash_downweights_boilerplate(spark):
    # Corpus: 8 docs sharing one boilerplate sentence (df=8 -> weight 1);
    # docs 0 and 1 additionally share a rare distinctive passage
    # (df=2 -> weight floor_log2(8/2)=2, clamped to [1,4]); docs 2 and 3
    # share ONLY the boilerplate plus disjoint unique content.
    # Law: the (0,1) pair must surface with high weighted Jaccard; the
    # (2,3) pair's weighted similarity is boilerplate-only and must stay
    # below the threshold (unweighted Jaccard would score it higher).
    import tempfile

    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        t_wminhash_pairs,
    )

    boiler = "all rights reserved contact support for terms of service today"
    rare = "quantum flux capacitor calibration requires seven turbo encabulators"
    docs = []
    for i in range(8):
        if i in (0, 1):
            text = f"{boiler} {rare}"
        elif i in (2, 3):
            text = f"{boiler} unique{i}word{i} only{i}here{i} extra{i}"
        else:
            text = f"{boiler} filler{i}a filler{i}b filler{i}c filler{i}d"
        docs.append((i, text, len(text), "t"))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, n_chars long, source string"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/documents.parquet")
        pairs = {
            (r["doc_a"], r["doc_b"]): r["wjaccard"]
            for r in t_wminhash_pairs(spark, tmp).collect()
        }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.95
    assert (2, 3) not in pairs


def test_wminhash_keepone_matches_union_find(spark, sf_dir):
    """t_wminhash_keepone must equal an independent Python union-find over
    the weighted pair table: groups = transitive closure, rep = min
    member, exactly one kept per group, pairless docs kept as singletons
    (NULL rep) — the same law e_semdedup_keepone pins on the vector side."""
    from collections import Counter

    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        t_wminhash_keepone,
        t_wminhash_pairs,
    )

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in t_wminhash_pairs(spark, sf_dir).collect():
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rep = {x: find(x) for x in parent}

    got = {
        r["doc_id"]: (r["group_rep"], r["kept"])
        for r in t_wminhash_keepone(spark, sf_dir).collect()
    }
    assert got, "empty artifact"
    for doc_id, (group_rep, kept) in got.items():
        if doc_id in rep:
            assert group_rep == rep[doc_id]
            assert kept == (doc_id == rep[doc_id])
        else:
            assert group_rep is None and kept is True
    kept_per_group = Counter(
        g for _, (g, kept) in got.items() if g is not None and kept
    )
    groups = {g for _, (g, _) in got.items() if g is not None}
    assert kept_per_group == Counter({g: 1 for g in groups})


def test_band_sweep_sampled_tracks_full_ratios(spark, sf_dir):
    """The sampled band sweep is the deployment shape of the full sweep;
    its OUTPUT claims are ratios, so certify they are sample-stable at
    gate scale: per-arm precision within an honest tolerance of the full
    sweep's, and both tables ordered the same way (precision falls and
    candidate volume explodes as r shrinks). Also pin the sample-size
    law: D = ceil(n / TARGET) keeps ~TARGET docs."""
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long_py
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _BSW_SAMPLE_TARGET,
        t_lsh_band_sweep,
        t_lsh_band_sweep_sampled,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read

    full = {r.n_bands: r for r in t_lsh_band_sweep(spark, sf_dir).collect()}
    samp = {
        r.n_bands: r for r in t_lsh_band_sweep_sampled(spark, sf_dir).collect()
    }
    assert set(full) == set(samp) == {2, 4, 8}

    # sample-size law: deterministic md5 membership, modulus scaled to the
    # corpus so the surviving set is ~TARGET docs at ANY corpus size
    ids = [r.doc_id for r in read(spark, sf_dir, "documents").select("doc_id").collect()]
    d = (len(ids) + _BSW_SAMPLE_TARGET - 1) // _BSW_SAMPLE_TARGET
    n_sampled = sum(1 for i in ids if md5_long_py(f"bsw:{i}") % d == 0)
    assert n_sampled <= 2 * _BSW_SAMPLE_TARGET
    assert n_sampled >= min(len(ids), _BSW_SAMPLE_TARGET) // 2

    # the FULL sweep's surface is stable (500+ docs at gate scales):
    # precision monotone DOWN in n_bands, candidate volume monotone UP
    assert full[2].precision >= full[4].precision >= full[8].precision
    assert full[2].n_candidates <= full[4].n_candidates <= full[8].n_candidates
    assert samp[2].n_candidates <= samp[4].n_candidates <= samp[8].n_candidates

    # the SAMPLED table rests on ~300 docs, so assert only what survives
    # sampling noise on ANY driver-regenerated corpus (the rotation
    # machinery exists to avoid data-churn flakes): the low-r arm keeps
    # thousands of candidates and its tiny precision tracks the full
    # sweep tightly; the high-r/low-r EXTREMES stay far apart.
    assert samp[8].n_candidates > 100, samp[8]
    # tolerance derived from the binomial standard error of the sampled
    # estimate (r13 ADVICE: the old max(0.02, 0.5·p) band was ~10× the
    # precision itself at gate scale — loose enough to hide a real
    # ratio-stability regression). SE = sqrt(p(1-p)/n_cand_sampled) with
    # p from the full sweep; 6·SE absorbs the doc-level (not pair-level)
    # sampling design effect, and a ±10-pair absolute floor covers the
    # degenerate p≈0 corner. Measured r14: |Δ| ≈ 1.2·SE at both gate
    # scales, so 6·SE keeps ~5× headroom while being ~5× tighter than
    # the old band. (The value-exact commutation test below is the hard
    # pin; this asserts sample-representativeness.)
    p = full[8].precision
    se = math.sqrt(max(p * (1.0 - p), 0.0) / samp[8].n_candidates)
    assert abs(samp[8].precision - p) <= max(6.0 * se, 10.0 / samp[8].n_candidates)
    if samp[2].n_candidates > 0:
        assert samp[2].precision >= samp[8].precision + 0.1


def test_band_sweep_sampling_commutes_with_sweeping(spark, sf_dir, tmp_path):
    """VALUE-EXACT property (no tolerances): the sampled sweep over the
    full corpus must equal the FULL sweep over a corpus containing
    exactly the sampled documents — membership is a pure function of
    doc_id, so sampling and sweeping commute. (The staged subset is
    small enough that its own modulus is 1, i.e. the full sweep there
    samples nothing.)"""
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _BSW_SAMPLE_TARGET,
        t_lsh_band_sweep,
        t_lsh_band_sweep_sampled,
    )

    docs = read(spark, sf_dir, "documents")
    n = docs.count()
    d = (n + _BSW_SAMPLE_TARGET - 1) // _BSW_SAMPLE_TARGET
    keep = docs.filter(
        md5_long(F.concat(F.lit("bsw:"), F.col("doc_id").cast("string"))) % d
        == 0
    )
    assert keep.count() <= _BSW_SAMPLE_TARGET * 2 <= 2 * n
    subset_dir = str(tmp_path / "subset")
    keep.write.mode("overwrite").parquet(f"{subset_dir}/documents.parquet")

    sampled = sorted(
        map(tuple, t_lsh_band_sweep_sampled(spark, sf_dir).collect())
    )
    full_on_subset = sorted(
        map(tuple, t_lsh_band_sweep(spark, subset_dir).collect())
    )
    assert sampled == full_on_subset


def test_lang_temperature_mix_laws(spark, sf_dir):
    """Pure-math pins for the α = 1/2 temperature mixture: the weight is
    floor(sqrt(n)·1000) exactly; shares are exact integer floors; and the
    law's POINT holds — boost is antitone in corpus share (low-resource
    languages are up-sampled, high-resource down-sampled, pivoting around
    1000 milli)."""
    import math

    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        t_lang_temperature_mix,
    )

    rows = {r.lang: r for r in t_lang_temperature_mix(spark, sf_dir).collect()}
    assert len(rows) >= 2
    n_total = read(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows.values()) == n_total

    total_w = sum(r.temp_weight_milli for r in rows.values())
    for r in rows.values():
        assert r.temp_weight_milli == math.floor(math.sqrt(r.n_docs) * 1000)
        assert r.natural_micro == r.n_docs * 1_000_000 // n_total
        assert r.alloc_micro == r.temp_weight_milli * 1_000_000 // total_w
        assert r.boost_milli == r.alloc_micro * 1000 // r.natural_micro

    by_share = sorted(rows.values(), key=lambda r: r.n_docs)
    boosts = [r.boost_milli for r in by_share]
    assert boosts == sorted(boosts, reverse=True), boosts
    # sqrt flattens strictly: smallest lang boosted, largest damped
    assert by_share[0].boost_milli >= 1000 >= by_share[-1].boost_milli


def test_train_mix_manifest_consistent_with_corpus_mix(spark, sf_dir):
    """The manifest is the temperature law over the TRAIN SLICE: (a) its
    per-lang doc counts are bounded by the full-corpus census (the split
    only removes docs); (b) train docs ≈ the split's train fraction of
    the corpus (hash-uniformity, wide tolerance); (c) allocation shares
    obey the same exact-integer-floor laws as the corpus-wide mix —
    sum(alloc_micro) ≤ 1e6 < sum + |langs| (floor residue), same for
    natural_micro; (d) weight law w = floor(sqrt(n)·1000) recomputes
    exactly; (e) token mass is positive wherever docs exist."""
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _SPLIT_FRACTIONS,
        t_lang_id,
        t_train_mix_manifest,
    )

    rows = t_train_mix_manifest(spark, sf_dir).collect()
    assert rows
    full = {
        r.lang: r.n
        for r in t_lang_id(spark, sf_dir)
        .groupBy(F.col("predicted_lang").alias("lang"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_train = sum(r.n_docs for r in rows)
    n_all = sum(full.values())
    frac = _SPLIT_FRACTIONS["train"]
    assert abs(n_train - frac * n_all) <= 0.15 * n_all, (n_train, n_all)
    for r in rows:
        assert 0 < r.n_docs <= full[r.lang]
        assert r.token_mass_train > 0
        assert r.temp_weight_milli == math.floor(math.sqrt(r.n_docs) * 1000)
    for col in ("alloc_micro", "natural_micro"):
        s = sum(getattr(r, col) for r in rows)
        assert s <= 1_000_000 < s + len(rows), (col, s)


def test_contamination_report_mirrors_flag_list(spark, sf_dir):
    """The eval-side report and the train-side flag list aggregate the
    SAME post-threshold hit relation, so their totals must agree: equal
    total hit counts, equal global max cosine, and every (nearest)
    pairing must be mutually consistent — the report's nearest train id
    for an eval item is a flagged vector whose own max_cos is at least
    that pair's cosine."""
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        e_contamination_report,
        e_decontaminate_semantic,
    )

    rep = e_contamination_report(spark, sf_dir).collect()
    flag = e_decontaminate_semantic(spark, sf_dir).collect()
    assert rep and flag
    assert sum(r.n_train_hits for r in rep) == sum(f.n_eval_hits for f in flag)
    assert max(r.max_cos for r in rep) == max(f.max_cos for f in flag)
    flag_by_id = {f.vec_id: f for f in flag}
    for r in rep:
        f = flag_by_id.get(r.nearest_train_id)
        assert f is not None, r
        assert f.max_cos >= r.max_cos - 1e-12
