"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are JVM-side Catalyst expressions over arrays (no Python UDFs):
shingling via ``transform``/``sequence``, hashing via the portable
``md5_long`` (functions/hashing.py), folds via ``array_min``/``aggregate``.
Every operator has a DuckDB-SQL twin built from the same constants so the
driver oracle can certify it.

Scale notes (100 TB): everything here is embarrassingly parallel per
document — no shuffle at all until a downstream groupBy/join; shingle
arrays stay inside the row (no explode) so there is no row-count blowup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import (
    MERSENNE31,
    MINHASH_PERMS,
    md5_long,
    md5_long_sql,
)

# ---------------------------------------------------------------------------
# tokenization / shingling
# ---------------------------------------------------------------------------

def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


TOKENS_SQL = "string_split_regex(trim({c}), '\\s+')"


def char_shingles(col: Column, n: int = 5) -> Column:
    """All character n-grams; whole text when shorter than n."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length(col) - (n - 1)),
        lambda i: col.substr(i, F.lit(n)),
    )
    return F.when(F.length(col) >= n, grams).otherwise(F.array(col))


def char_shingles_sql(c: str, n: int = 5) -> str:
    return (
        f"CASE WHEN len({c}) >= {n} "
        f"THEN list_transform(generate_series(1, len({c}) - {n - 1}), i -> substr({c}, i, {n})) "
        f"ELSE [{c}] END"
    )


def shingle_hashes31(col: Column, n: int = 5) -> Column:
    """Distinct char-n-gram hashes in the Mersenne-31 domain (minhash base)."""
    return F.array_distinct(
        F.transform(char_shingles(col, n), lambda s: md5_long(s) % MERSENNE31)
    )


def shingle_hashes31_sql(c: str, n: int = 5) -> str:
    return (
        f"list_distinct(list_transform({char_shingles_sql(c, n)}, "
        f"s -> {md5_long_sql('s')} % {MERSENNE31}))"
    )


WINNOW_W = 4


def positional_gram_hashes(col: Column, k: int = 5) -> Column:
    """Positional (non-distinct) char-k-gram hashes in the Mersenne-31
    domain — the winnowing base. Callers should bind this to its OWN
    projection column before windowing over it: a lambda body that embeds
    this expression re-evaluates the whole array per reference."""
    return F.transform(char_shingles(col, k), lambda s: md5_long(s) % MERSENNE31)


def winnow_from_grams(g: Column, w: int = WINNOW_W) -> Column:
    """Distinct ROBUST WINNOWING fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS scheme): the minimum of every w-window of
    consecutive positional gram hashes, deduplicated. Guarantee: any
    substring shared by two documents of length ≥ w + k − 1 yields at
    least one shared fingerprint (the detection floor), while keeping an
    expected 2/(w+1) fraction of grams — a third selection law next to
    MinHash (per-permutation global minima) and CDC chunk hashes
    (content-defined boundaries). Evaluated as w SHIFTED SLICES folded
    with zip_with/least, NOT a transform over window positions — a
    per-position lambda referencing the gram array would re-evaluate it
    per element, O(n²·md5) per document (the word_ngrams lesson). In-row,
    pure flatMap shape; O(w·n) work, O(n) transient."""
    n_w = F.size(g) - (w - 1)
    wins = F.slice(g, 1, n_w)
    for j in range(1, w):
        wins = F.zip_with(wins, F.slice(g, j + 1, n_w), lambda x, y: F.least(x, y))
    return F.when(n_w >= 1, F.array_distinct(wins)).otherwise(
        F.array(F.array_min(g))
    )


def winnow_fingerprints_sql(c: str, k: int = 5, w: int = WINNOW_W) -> str:
    grams = (
        f"list_transform({char_shingles_sql(c, k)}, "
        f"s -> {md5_long_sql('s')} % {MERSENNE31})"
    )
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, GREATEST(len({grams}) - {w - 1}, 1)), "
        f"i -> list_min(({grams})[i : i + {w - 1}])))"
    )


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams (space-joined), empty array when the doc has < n tokens.

    Pure Catalyst array expression — no explode, no shuffle: the gram array
    stays inside the row until a caller chooses to explode it.
    """
    # Sliding window via n shifted slices zipped together, NOT a
    # transform-over-positions: a lambda body that references the token
    # array re-evaluates the split regex PER ELEMENT (higher-order
    # functions are interpreted — no codegen subexpression elimination),
    # turning tokenization O(len) into O(len·tokens) per row. The slices
    # evaluate the split n times per ROW instead (measured 2–3× faster on
    # the 3-gram corpus pass), and zip_with walks each pair once.
    t = tokens(col)
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    parts = [F.slice(t, i + 1, m) for i in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(t) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams_sql(c: str, n: int) -> str:
    t = TOKENS_SQL.format(c=c)
    return (
        f"list_transform(range(0, greatest(len({t}) - {n - 1}, 0)), "
        f"i -> array_to_string(({t})[i + 1:i + {n}], ' '))"
    )


# ---------------------------------------------------------------------------
# minhash signatures
# ---------------------------------------------------------------------------

def minhash_signature(hashes31: Column, k: int = 16) -> Column:
    """k-wide minhash signature as array<long> from the base-hash array."""

    def perm(i: int):
        a, b = MINHASH_PERMS[i]
        # single-param lambda: PySpark treats a second param as the array index
        return lambda x: (x * a + b) % MERSENNE31

    return F.array(*[F.array_min(F.transform(hashes31, perm(i))) for i in range(k)])


def minhash_signature_sql(hashes_expr: str, k: int = 16) -> str:
    parts = [
        f"list_min(list_transform({hashes_expr}, "
        f"x -> (x * {MINHASH_PERMS[i][0]} + {MINHASH_PERMS[i][1]}) % {MERSENNE31}))"
        for i in range(k)
    ]
    return "[" + ", ".join(parts) + "]"


def band_key(sig: Column, band: int, r: int) -> Column:
    """Hash of one signature band (rows band*r .. band*r+r-1)."""
    return md5_long(F.concat_ws(",", *[sig[band * r + j].cast("string") for j in range(r)]))


def band_key_sql(sig_expr: str, band: int, r: int) -> str:
    cols = ", ".join(f"CAST(({sig_expr})[{band * r + j + 1}] AS VARCHAR)" for j in range(r))
    return md5_long_sql(f"concat_ws(',', {cols})")


# ---------------------------------------------------------------------------
# simhash (60-bit, token-frequency weighted)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60


def simhash_docs(df, id_col: str = "doc_id", text_col: str = "text"):
    """60-bit simhash per document: per bit, sum of ±1 over token hashes.

    Single-pass, whole-stage-codegen formulation: explode tokens, hash each
    token ONCE, then 60 map-side-combined SUM aggregations (one per bit) in
    one shuffle keyed by document. The earlier per-row higher-order-function
    formulation evaluated 60 interpreted ``aggregate`` lambdas per document,
    each re-tokenizing and re-hashing the text — ~60× the MD5 work, all
    outside codegen. At 100 TB the explode adds rows but partial aggregation
    collapses them back to one row per (partition, doc) before the shuffle.
    """
    th = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("_t")).select(
        id_col, md5_long(F.col("_t")).alias("_h")
    )
    votes = th.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright("_h", i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_v{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    out = None
    for i in range(SIMHASH_BITS):
        b = F.when(F.col(f"_v{i}") > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        out = b if out is None else out + b
    return votes.select(id_col, out.alias("h"))


def simhash_sql(c: str) -> str:
    th = f"list_transform({TOKENS_SQL.format(c=c)}, t -> {md5_long_sql('t')})"
    parts = []
    for i in range(SIMHASH_BITS):
        votes = f"list_sum(list_transform(_th, h -> ((h >> {i}) & 1) * 2 - 1))"
        parts.append(f"CASE WHEN {votes} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END")
    total = " + ".join(parts)
    return f"(SELECT {total} FROM (SELECT {th} AS _th) _sh)"


def hamming60(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# quality / language heuristics (integer counts → double ratios)
# ---------------------------------------------------------------------------

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def stopword_pattern(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


def stopword_count(col: Column, lang: str) -> Column:
    return F.regexp_count(F.lower(col), F.lit(stopword_pattern(lang)))


def stopword_count_sql(c: str, lang: str) -> str:
    return f"len(regexp_extract_all(lower({c}), '{stopword_pattern(lang)}'))"


# ---------------------------------------------------------------------------
# content-defined chunking (FastCDC-lite): cut positions from a rolling
# W-char polynomial hash. A position p (1-based, p in [W, n-1]) is a cut
# AFTER character p iff H(text[p-W+1 .. p]) % CDC_D == 0 with
# H = sum_j cp[p-j] * B^j mod M. Boundaries are a pure function of the
# LOCAL window, so chunking is shift-invariant — an insertion near the
# start of a document re-chunks only the window it touches, where a
# fixed-size chunker would shift every downstream chunk — and the scan is
# embarrassingly parallel: no state crosses row or partition boundaries,
# the 100 TB shape is a pure flatMap. Expected chunk length ~= CDC_D
# chars. p >= W guarantees a full window exists before the first cut;
# p <= n-1 guarantees the final chunk is never empty. No min/max chunk
# clamp on purpose: a clamp makes boundary eligibility depend on the
# PREVIOUS boundary (sequential scan), destroying the parallelism that
# is the whole point of CDC at scale.
# ---------------------------------------------------------------------------

CDC_W = 8
CDC_B = 257
CDC_M = 1_000_000_007
CDC_D = 64
_CDC_POW = [pow(CDC_B, j, CDC_M) for j in range(CDC_W)]

# Candidate-position segmentation bound. The naive formulation materializes
# ONE F.sequence(W, n-1) — an O(doc_length) transient int array per row in
# expression evaluation, a multi-MB allocation per multi-MB document: an
# executor-memory cliff at 100 TB even though the plan has zero exchanges.
# Because a cut at position p depends only on the W chars ending at p
# (window-local by design), the candidate range can be evaluated in
# fixed-size position segments with NO overlap logic at all — the hash
# still reads the original string via substr, so segmentation is exact,
# not approximate. Peak per-row transient memory drops from O(n) to
# O(n / CDC_SEG + CDC_SEG + cuts): for a 5 MB doc, ~1.3k segment ids plus
# one 4096-int scratch array instead of a 5M-int array.
CDC_SEG = 4096


def content_cut_positions(col: Column) -> Column:
    """Ascending 1-based cut positions for ``col`` (ASCII/BMP text; Spark
    and DuckDB agree on per-character ``ascii``/``substr`` semantics).

    Evaluated segment-by-segment (``CDC_SEG`` candidate positions at a
    time) so per-row transient memory is bounded regardless of document
    length; the result is position-for-position identical to a single
    full-range scan because boundary eligibility is window-local.
    """
    n = F.length(col)

    def h(p: Column) -> Column:
        s = F.ascii(col.substr(p, F.lit(1))).cast("long") * F.lit(_CDC_POW[0])
        for j in range(1, CDC_W):
            s = s + F.ascii(col.substr(p - j, F.lit(1))).cast("long") * F.lit(
                _CDC_POW[j]
            )
        return s % F.lit(CDC_M)

    # candidate positions p in [W, n-1], tiled into segments of CDC_SEG:
    # segment s covers [W + s*SEG, min(n-1, W + (s+1)*SEG - 1)]
    last_seg = F.floor((n - F.lit(1 + CDC_W)) / F.lit(CDC_SEG)).cast("int")
    cuts = F.flatten(
        F.transform(
            F.sequence(F.lit(0), last_seg),
            lambda s: F.filter(
                F.sequence(
                    F.lit(CDC_W) + s * F.lit(CDC_SEG),
                    F.least(n - 1, F.lit(CDC_W) + (s + 1) * F.lit(CDC_SEG) - 1),
                ),
                lambda p: h(p) % CDC_D == 0,
            ),
        )
    )
    return F.when(n - 1 >= CDC_W, cuts).otherwise(F.array().cast("array<int>"))


def content_cut_positions_sql(c: str) -> str:
    terms = " + ".join(
        f"CAST(ascii(substr({c}, p - {j}, 1)) AS BIGINT) * {_CDC_POW[j]}"
        for j in range(CDC_W)
    )
    return (
        f"CASE WHEN len({c}) - 1 >= {CDC_W} THEN "
        f"list_filter(range({CDC_W}, CAST(len({c}) AS BIGINT)), "
        f"p -> ({terms}) % {CDC_M} % {CDC_D} = 0) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )


# Documents longer than this route through the Arrow (mapInPandas) chunker.
# The Catalyst path's per-position substr is a char-offset walk on the JVM
# string — O(p) per probe, O(n²/2) per document — which is invisible on
# KB-scale web documents but a CPU cliff on multi-MB ones; the Arrow kernel
# is a vectorized O(n·W) numpy scan over the same polynomial law, so the
# two paths are cut-for-cut identical and a pipeline can route by length
# without changing results.
CDC_LONG_DOC = 8192

CHUNK_ROW_SCHEMA = (
    "doc_id bigint, chunk_idx bigint, chunk_start bigint, "
    "chunk_len bigint, chunk_hash bigint"
)


def cut_positions_py(text: str) -> list[int]:
    """Numpy kernel of the Arrow chunker: the same cut law as
    ``content_cut_positions``, evaluated as W shifted-slice multiply-adds
    over the codepoint array (int64 — products stay below 128·1e9·8 ≪ 2⁶³,
    exact)."""
    import numpy as np

    n = len(text)
    if n - 1 < CDC_W:
        return []
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    h = np.zeros(n - CDC_W, dtype=np.int64)
    for j in range(CDC_W):
        h += cp[CDC_W - 1 - j : n - 1 - j] * _CDC_POW[j]
    h %= CDC_M
    return (np.nonzero(h % CDC_D == 0)[0] + CDC_W).tolist()


def chunk_long_doc_batches(frames):
    """``mapInPandas`` body: (doc_id, text) batches → CHUNK_ROW_SCHEMA
    rows, one row per content-defined chunk. Map-only — no state crosses
    batch or partition boundaries."""
    import pandas as pd

    from ..functions.hashing import md5_long_py

    for pdf in frames:
        out = {k: [] for k in ("doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_hash")}
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n = len(text)
            cuts = cut_positions_py(text)
            starts = [1] + [c + 1 for c in cuts]
            ends = cuts + [n]
            for i, (s, e) in enumerate(zip(starts, ends)):
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(i)
                out["chunk_start"].append(s)
                out["chunk_len"].append(e - s + 1)
                out["chunk_hash"].append(md5_long_py(text[s - 1 : e]))
        yield pd.DataFrame(out)


REWRITE_ROW_SCHEMA = (
    "doc_id bigint, n_kept bigint, rebuilt_len bigint, rebuilt_text string"
)


def rebuild_long_doc_batches(frames):
    """``mapInPandas`` body for the chunk-dedup REWRITE of long documents:
    (doc_id, text, dropped_idx) → the deduplicated text rebuilt from kept
    chunks, same cut law as the chunker. Python slicing has O(1) offset
    access + O(chunk_len) copy, so the rebuild is linear in document
    length — the Catalyst in-row rebuild's per-position substr is a
    char-offset walk, quadratic on multi-MB docs (the cliff CDC_LONG_DOC
    routes around). Map-only."""
    import pandas as pd

    for pdf in frames:
        out = {k: [] for k in ("doc_id", "n_kept", "rebuilt_len", "rebuilt_text")}
        for doc_id, text, dropped in zip(
            pdf["doc_id"], pdf["text"], pdf["dropped_idx"]
        ):
            n = len(text)
            cuts = cut_positions_py(text)
            starts = [1] + [c + 1 for c in cuts]
            ends = cuts + [n]
            drop = {int(i) for i in dropped}
            parts = [
                text[s - 1 : e]
                for i, (s, e) in enumerate(zip(starts, ends))
                if i not in drop
            ]
            rebuilt = "".join(parts)
            out["doc_id"].append(doc_id)
            out["n_kept"].append(len(parts))
            out["rebuilt_len"].append(len(rebuilt))
            out["rebuilt_text"].append(rebuilt)
        yield pd.DataFrame(out)


# ---------------------------------------------------------------------------
# exact-substring duplication spans (Lee et al. 2021 ExactSubstr dedup)
# ---------------------------------------------------------------------------

def _substr_postings(docs, w: int):
    """(doc_id, pos, gh) positional gram-hash postings, 1-based positions.

    Hash in-row BEFORE the explode: the posting table then carries
    (doc_id, pos, int64) — the exploded/shuffled volume is 8-byte hashes,
    never gram strings (the string array exists only transiently inside
    the source row, same shape as every shingle operator here)."""
    gh_arr = F.transform(word_ngrams(F.col("text"), w), lambda g: md5_long(g))
    return docs.select(
        "doc_id", F.posexplode(gh_arr).alias("pos0", "gh")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "gh"
    )


def _spans_from_hits(hits, w: int):
    """Merge duplicated window positions into maximal spans
    (gaps-and-islands on one doc_id exchange). ``hits`` = (doc_id, pos)."""
    from pyspark.sql import Window

    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(by_doc) <= w, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("island", F.sum("brk").over(by_doc))
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (w - 1)).alias("span_end"),
        (F.max("pos") + w - F.min("pos")).alias("span_tokens"),
    ).drop("island")


def exact_substr_spans(docs, w: int = 8):
    """(doc_id, text) → maximal duplicated token spans
    (doc_id, span_start, span_end, span_tokens), where a position is
    duplicated iff its w-token window occurs ≥ 2 times anywhere in the
    corpus (cross- OR within-document) and overlapping/touching duplicated
    windows merge. Positions are 1-based token indices.

    Shape: one posting exchange on the gram hash (window count — the
    posting table crosses the wire once there), one exchange on doc_id for
    the gaps-and-islands merge. No joins.
    """
    from pyspark.sql import Window

    grams = _substr_postings(docs, w)
    hits = (
        grams.withColumn("c", F.count("*").over(Window.partitionBy("gh")))
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    return _spans_from_hits(hits, w)


def exact_substr_keepone_spans(docs, w: int = 8):
    """Keep-FIRST variant of :func:`exact_substr_spans`: a position is cut
    iff its w-token window occurs ≥ 2 times corpus-wide AND this occurrence
    is NOT the canonical first one (min by (doc_id, pos) per window) — the
    Lee et al. 2021 dedup policy that preserves one copy of every
    duplicated passage. ``row_number ≥ 2`` encodes both conditions (a
    second occurrence exists iff rn reaches 2). A kept occurrence's tokens
    can still be cut when a DIFFERENT duplicated window (whose canonical
    copy lives elsewhere) covers them — coverage is per window, not per
    span, and the law stays one-pass deterministic.

    Shape identical to the cut-all variant: the gh exchange serves one
    row_number window instead of one count window; spans merge on doc_id.
    """
    from pyspark.sql import Window

    grams = _substr_postings(docs, w)
    first = Window.partitionBy("gh").orderBy("doc_id", "pos")
    hits = (
        grams.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") >= 2)
        .select("doc_id", "pos")
    )
    return _spans_from_hits(hits, w)


def exact_substr_rewrite(docs, w: int = 8):
    """(doc_id, text) → (doc_id, rebuilt_text, n_tokens, kept_tokens):
    the ExactSubstr dedup ARTIFACT — every duplicated span (as detected by
    :func:`exact_substr_spans`) is cut out of the text and the surviving
    tokens re-joined in order. Cut-all semantics; see
    :func:`exact_substr_keepone_rewrite` for the keep-first policy.

    Shape: the span table (bounded by duplicated-region count, narrow) is
    grouped per doc and joined back onto the corpus; the rebuild is an
    in-row token filter against the per-doc span list (O(tokens × spans)
    per row, spans per doc are few) — document text never shuffles: the
    join moves only (doc_id, start, end) triples."""
    return _rebuild_outside_spans(docs, exact_substr_spans(docs, w=w))


def exact_substr_keepone_rewrite(docs, w: int = 8):
    """Keep-first ExactSubstr rewrite: cut only non-canonical occurrences
    (:func:`exact_substr_keepone_spans`), so every duplicated passage
    survives exactly once (modulo cross-window coverage, documented
    there). Same narrow-join + in-row-filter rebuild as the cut-all
    variant."""
    return _rebuild_outside_spans(docs, exact_substr_keepone_spans(docs, w=w))


def _rebuild_outside_spans(docs, span_df):
    """Rebuild each doc's text from the tokens NO span covers."""
    from pyspark.sql import functions as F  # local alias for clarity

    spans = (
        span_df
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
            ).alias("spans")
        )
    )
    t = tokens(F.col("text"))
    joined = docs.join(spans, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("spans"), F.array().cast("array<struct<s:bigint,e:bigint>>"))
        .alias("spans"),
        t.alias("toks"),
    )
    # keep token i (1-based) iff no span covers it
    kept = F.filter(
        F.transform(
            F.col("toks"),
            lambda tok, i: F.struct(
                tok.alias("tok"),
                F.exists(
                    F.col("spans"),
                    lambda sp: (sp["s"] <= i + 1) & (i + 1 <= sp["e"]),
                ).alias("cut"),
            ),
        ),
        lambda st: ~st["cut"],
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", F.transform(kept, lambda st: st["tok"])).alias(
            "rebuilt_text"
        ),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# bigram surprisal with unigram backoff (integer-exact LM-quality scoring)
# ---------------------------------------------------------------------------
_BACKOFF_PENALTY = 4  # ≈ log2(1/alpha) for the unseen-bigram discount


def bigram_surprisal(docs, ref_docs=None):
    """Score ``docs`` (doc_id, text) against a bigram LM whose counts come
    from ``ref_docs`` (default: ``docs`` itself — self-scoring, where every
    adjacent pair is by construction seen and the backoff never fires).

    Per-token surprisal, all in the integer domain (floor(log2 x) =
    length(bin(x))−1, bit-identical across engines):

    - first token:            floor_log2(N // max(c(w), 1))
    - seen bigram (prev, w):  floor_log2(c(prev) // c(prev, w))
    - unseen bigram:          BACKOFF_PENALTY + floor_log2(N // max(c(w), 1))

    Returns (doc_id, n_tokens, surprisal_sum, surprisal_per_1k). Shape:
    one bigram explode + three key-hashed count joins (bigram, prev
    unigram, cur unigram — md5-uniform keys, AQE broadcasts the count
    tables when small); the corpus total rides a broadcast one-row
    crossJoin. 100 TB: counts are vocabulary-bounded aggregations with
    map-side combine; the exploded score table crosses the wire only on
    the count keys."""
    if ref_docs is None:
        ref_docs = docs

    def flog2(x):
        return (F.length(F.bin(x)) - 1).cast("long")

    ref_tok = ref_docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    uni = ref_tok.groupBy("w").agg(F.count("*").alias("cw"))
    total = ref_tok.agg(F.count("*").alias("n"))
    bi = (
        ref_docs.select(F.explode(word_ngrams(F.col("text"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("cbg"))
    )

    t = tokens(F.col("text"))
    # a NULL/empty text has NO tokens: without the filter it would still
    # emit a phantom "first token" row (element_at → NULL) and score as
    # one token of floor_log2(N) surprisal (round-7 ADVICE) — it must be
    # absent, matching the empty-product LM convention and the oracle
    first = docs.filter(F.element_at(t, 1).isNotNull()).select(
        "doc_id", F.element_at(t, 1).alias("cur"), F.lit(None).alias("bg")
    )
    rest = docs.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("bg")
    ).select(
        "doc_id", F.element_at(F.split(F.col("bg"), " "), -1).alias("cur"), "bg"
    )
    scored = (
        first.unionByName(rest)
        .join(bi, "bg", "left")
        .join(
            uni.select(F.col("w").alias("cur"), F.col("cw").alias("c_cur")),
            "cur",
            "left",
        )
        .withColumn(
            "prev",
            F.when(
                F.col("bg").isNotNull(),
                F.element_at(F.split(F.col("bg"), " "), 1),
            ),
        )
        .join(
            uni.select(F.col("w").alias("prev"), F.col("cw").alias("c_prev")),
            "prev",
            "left",
        )
        .crossJoin(F.broadcast(total))
    )
    uni_s = flog2(F.expr("n div greatest(coalesce(c_cur, 0), 1)"))
    bi_s = flog2(F.expr("c_prev div cbg"))
    surp = (
        F.when(F.col("bg").isNull(), uni_s)  # first token
        .when(F.col("cbg").isNotNull(), bi_s)  # seen bigram
        .otherwise(F.lit(_BACKOFF_PENALTY) + uni_s)  # backoff
    ).cast("long")
    return (
        scored.select("doc_id", surp.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("s").cast("long").alias("surprisal_sum"),
            F.expr("(sum(s) * 1000) div count(*)").cast("long").alias(
                "surprisal_per_1k"
            ),
        )
    )
