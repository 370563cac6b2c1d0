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
    rows = t_bloom_prune_join(spark, sf_dir).collect()
    total = {c: sum(getattr(r, c) for r in rows) for c in rows[0].asDict()
             if c != "lang"}
    # every true member must pass the filter: pass-count dominates hit-count
    # per language, with zero misses overall
    for r in rows:
        assert r.n_bloom_pass >= r.n_true_hit, f"false negative in lang={r.lang}"
    assert total["n_true_hit"] > 0, "build set empty — filter untested"
    # 1008 bits / k=3: fp rate stays tiny at this build-set size
    non_members = total["n_docs"] - total["n_true_hit"]
    assert total["n_false_pos"] <= max(2, 0.05 * non_members)
