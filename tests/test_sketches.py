"""Semantic guarantees of the sketch operators (beyond oracle parity).

Oracle parity (test_oracle_parity.py) proves Spark and DuckDB compute the
same numbers; these tests prove the numbers mean what a sketch promises:

- HLL: the raw harmonic-mean estimate lands within the theoretical error
  envelope of the exact distinct count (sigma = 1.04/sqrt(m) ~= 13% for
  m=64; we allow 4 sigma).
- Count-Min: estimates NEVER undercount (one-sided error), and equal the
  exact count when no collision occurred.
- Bloom: NO false negatives ever (every true member passes), and the
  false-positive rate on non-members stays under a loose cap for a
  1008-bit / k=3 filter at the test's build-set size.
"""

from __future__ import annotations

from pagopa_ecommerce_cdc_service_spark.plans.sketch_queries import (
    t_bloom_prune_join,
    t_cms_heavy_hitters,
    t_hll_distinct,
)


def test_hll_estimate_within_error_envelope(spark, sf_dir):
    rows = t_hll_distinct(spark, sf_dir).collect()
    assert rows, "no languages found"
    for r in rows:
        assert r.exact_distinct > 0
        rel_err = abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct
        # sigma = 1.04/sqrt(64) = 0.13; raw estimator bias grows at low
        # occupancy, so allow 4 sigma
        assert rel_err < 0.52, (
            f"lang={r.lang} estimate={r.hll_estimate} exact={r.exact_distinct}"
        )
        assert 0 < r.used_buckets <= 64


def test_cms_never_undercounts(spark, sf_dir):
    rows = t_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.overcount >= 0, f"CMS undercounted {r.tok}: {r.cms_n} < {r.exact_n}"
        assert r.cms_n == r.exact_n + r.overcount


def test_bloom_no_false_negatives(spark, sf_dir):
    # direct membership check, not an aggregate inequality (which false
    # positives could mask): rebuild the bitmap, then verify IN PYTHON that
    # every build-set text has all k probe bits set.
    from pagopa_ecommerce_cdc_service_spark.functions.hashing import (
        md5_long,
        md5_long_py,
    )
    from pagopa_ecommerce_cdc_service_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_K,
        BLOOM_WORD_BITS,
        bloom_mask,
        bloom_pos,
        bloom_word,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read

    from pyspark.sql import functions as F

    docs = read(spark, sf_dir, "documents")
    quarantine = md5_long(
        F.concat(F.lit("bloomset:"), F.col("doc_id").cast("string"))
    ) % 37 == F.lit(0)
    build = docs.filter(quarantine).select("text")
    positions = build.select(
        F.explode(
            F.array(*[bloom_pos(F.col("text"), k) for k in range(BLOOM_K)])
        ).alias("pos")
    )
    bitmap = dict(
        positions.groupBy(bloom_word(F.col("pos")).alias("word"))
        .agg(F.bit_or(bloom_mask(F.col("pos"))).alias("bits"))
        .collect()
    )
    texts = [r.text for r in build.collect()]
    assert texts, "build set empty — filter untested"
    for text in texts:
        for k in range(BLOOM_K):
            pos = md5_long_py(f"bloom{k}:{text}") % BLOOM_BITS
            word, bit = pos // BLOOM_WORD_BITS, pos % BLOOM_WORD_BITS
            assert bitmap.get(word, 0) & (1 << bit), (
                f"false negative: probe {k} of a build text not set"
            )

    rows = t_bloom_prune_join(spark, sf_dir).collect()
    total = {c: sum(getattr(r, c) for r in rows) for c in rows[0].asDict()
             if c != "lang"}
    # 1008 bits / k=3: fp rate stays tiny at this build-set size
    non_members = total["n_docs"] - total["n_true_hit"]
    assert total["n_false_pos"] <= max(2, 0.05 * non_members)
