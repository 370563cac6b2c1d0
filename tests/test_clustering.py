"""k-means / quantized-ANN semantics and plan-shape guarantees.

Oracle parity (test_oracle_parity.py) proves engine agreement; these prove
the algorithm behaves like k-means and the plan has the promised scale
shape (operators/clustering.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
    KM_K,
    kmeans_assign,
    kmeans_plan,
    kmeans_seeds,
    kmeans_update,
)
from pagopa_ecommerce_cdc_service_spark.operators.similarity import quantize
from pagopa_ecommerce_cdc_service_spark.plans.helpers import read, spread
from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
    e_kmeans_clusters,
    e_sq8_topk,
)


def _emb(spark, sf_dir):
    return (
        spread(read(spark, sf_dir, "embeddings"), spark)
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .repartition(4, "vec_id")
    )


def test_kmeans_iteration_never_increases_wcss(spark, sf_dir):
    # Lloyd's invariant: each assign→update→assign round is monotone.
    emb = _emb(spark, sf_dir)
    cent = kmeans_seeds(emb, KM_K)
    prev = None
    for _ in range(3):
        assigned = kmeans_assign(emb, cent)
        wcss = assigned.agg(F.sum("dist")).collect()[0][0]
        if prev is not None:
            # floor-quantized centroids can sit up to 1 off the true mean
            # per dim, so exact-Lloyd's monotonicity holds only up to
            # n_vec * dims of quantization slack
            slack = emb.count() * 64
            assert wcss <= prev + slack, f"WCSS rose: {prev} -> {wcss}"
        prev = wcss
        cent = kmeans_update(assigned)


def test_kmeans_assignment_total_and_exclusive(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    final = kmeans_plan(emb)
    n_vec = emb.count()
    assert final.count() == n_vec  # every vector assigned exactly once
    assert final.select("vec_id").distinct().count() == n_vec
    k_used = final.select("cid").distinct().count()
    assert 1 <= k_used <= KM_K


def test_kmeans_single_wide_exchange(spark, sf_dir):
    # The 100 TB claim: vector rows cross the wire once. Since the r14
    # fold-based assignment (centroids collapse to one broadcast array row;
    # argmin is a per-row transform + array_min) NO operator ever requires a
    # vec_id partitioning: the only vec_id exchanges in the executed plan
    # are the query's explicit REPARTITION_BY_NUM — the planner inserts no
    # ENSURE_REQUIREMENTS exchange over vector rows for assignment.
    # (Pre-r14 this pinned ReusedExchange >= 3: the crossJoin+groupBy argmin
    # needed the vec_id partitioning and the claim rested on AQE collapsing
    # the repeated groupBys onto one materialized exchange.)
    df = e_kmeans_clusters(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    vec_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(vec_id" in l and "ReusedExchange" not in l
    ]
    assert vec_exchanges, "expected the explicit vec_id repartition"
    assert all("REPARTITION_BY_NUM" in l for l in vec_exchanges), vec_exchanges
    assert "EvalPython" not in plan


def test_sq8_candidates_superset_rescore(spark, sf_dir):
    rows = e_sq8_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    # int8 dots are coarse but monotone-ish: the rescored top must come out
    # sorted by exact cosine, and every int8 dot must be a plausible product
    # of two 127-bounded vectors
    cos = [r.cos_sim for r in rows]
    assert cos == sorted(cos, reverse=True)
    for r in rows:
        assert abs(r.dot8) <= 127 * 127 * 64


def test_pq_codes_cover_every_vector_subspace(spark, sf_dir):
    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        PQ_K,
        PQ_M,
        pq_subvectors,
        pq_train,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "q")
    codes, cb = pq_train(pq_subvectors(emb))
    n_vec = emb.count()
    assert codes.count() == n_vec * PQ_M
    rng = codes.agg(F.min("cid"), F.max("cid")).collect()[0]
    assert 1 <= rng[0] and rng[1] <= PQ_K
    # codebook: at most PQ_M * PQ_K entries, every sub present
    assert cb.select("sub").distinct().count() == PQ_M


def test_pq_code_table_distances_match_codebook(spark, sf_dir):
    # The code table loses no information relative to the codebook: every
    # stored dist must equal sq_dist(subvector, assigned centroid)
    # recomputed independently against the codebook.
    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        pq_subvectors,
        pq_train,
        sq_dist,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "q")
    codes, cb = pq_train(pq_subvectors(emb))
    mismatches = (
        codes.join(cb, ["sub", "cid"])
        .withColumn("recomputed", sq_dist(F.col("sq"), F.col("c")))
        .filter(F.col("recomputed") != F.col("dist"))
        .count()
    )
    assert mismatches == 0
    per_vec = codes.groupBy("vec_id").agg(F.count("*").alias("m"))
    assert per_vec.filter(F.col("m") != 8).count() == 0


def test_kmeans_identical_under_any_partitioning(spark, sf_dir):
    # The determinism contract: assignments are a pure function of the
    # data, not of physical layout — rerunning the whole unrolled plan
    # with different partition counts must produce identical rows.
    def run(n_parts):
        emb = (
            spread(read(spark, sf_dir, "embeddings"), spark)
            .select("vec_id", quantize(F.col("embedding")).alias("q"))
            .repartition(n_parts, "vec_id")
        )
        rows = kmeans_plan(emb).select("vec_id", "cid", "dist").collect()
        return sorted((r.vec_id, r.cid, r.dist) for r in rows)

    assert run(2) == run(9)


def test_pq_codes_identical_under_any_partitioning(spark, sf_dir):
    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        pq_subvectors,
        pq_train,
    )

    def run(n_parts):
        emb = (
            spread(read(spark, sf_dir, "embeddings"), spark)
            .select("vec_id", quantize(F.col("embedding")).alias("q"))
        )
        subs = pq_subvectors(emb).repartition(n_parts, "vec_id", "sub")
        codes, _ = pq_train(subs)
        rows = codes.select("vec_id", "sub", "cid", "dist").collect()
        return sorted((r.vec_id, r.sub, r.cid, r.dist) for r in rows)

    assert run(3) == run(8)


def test_opq_perm_is_balanced_permutation(spark, sf_dir):
    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        PQ_M,
        PQ_SUBDIM,
    )
    from pagopa_ecommerce_cdc_service_spark.operators.similarity import quantize
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _opq_perm_df,
    )

    full = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
    )
    pa = _opq_perm_df(full).collect()[0]["pa"]
    # a true permutation of 0..63
    assert sorted(pa) == list(range(PQ_M * PQ_SUBDIM))
    # balanced allocation: within every subspace, the slots hold one dim
    # from each variance octile — i.e. slot j across subspaces covers
    # ranks j*PQ_M..(j+1)*PQ_M-1. Verify via rank reconstruction: dim at
    # target position p = (r % PQ_M) * PQ_SUBDIM + (r // PQ_M) has rank r.
    rank_of = {}
    for p, d in enumerate(pa):
        sub, slot = divmod(p, PQ_SUBDIM)
        rank_of[d] = slot * PQ_M + sub
    assert sorted(rank_of.values()) == list(range(PQ_M * PQ_SUBDIM))
    # variance ordering: rank 0's dim has the (weakly) largest variance
    dv = full.select(F.posexplode("q").alias("dim0", "v"))
    st = {
        r["dim0"]: r["var_num"]
        for r in dv.groupBy("dim0")
        .agg(
            (
                F.count("*").cast("decimal(38,0)")
                * F.sum(F.col("v") * F.col("v")).cast("decimal(38,0)")
                - F.sum("v").cast("decimal(38,0)")
                * F.sum("v").cast("decimal(38,0)")
            ).alias("var_num")
        )
        .collect()
    }
    by_rank = sorted(rank_of, key=lambda d: rank_of[d])
    vars_in_rank_order = [st[d] for d in by_rank]
    assert vars_in_rank_order == sorted(vars_in_rank_order, reverse=True)


def test_opq_wins_on_anisotropic_corpus(spark):
    # The gate corpus is near-isotropic (delta ~0.3%), so prove the
    # operator's point on an ANISOTROPIC synthetic: dims 0..7 carry all
    # the variance (naive PQ loads them into ONE subspace and starves the
    # other seven), dims 8..63 are near-constant. The variance-balanced
    # permutation must spread the hot dims one-per-subspace and cut total
    # quantization error by a wide margin.
    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        pq_subvectors,
        pq_train,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _opq_permuted,
    )

    n = 512
    rows = []
    for i in range(n):
        v = [((i * (d + 3) * 2654435761) % 2001) - 1000 for d in range(8)]
        v += [(d % 7) - 3 for d in range(8, 64)]  # near-constant tail
        rows.append((i, v))
    full = spark.createDataFrame(rows, "vec_id long, q array<bigint>")

    def wcss(subs):
        codes, _ = pq_train(subs)
        return codes.agg(F.sum("dist")).collect()[0][0]

    plain = wcss(pq_subvectors(full))
    opq = wcss(pq_subvectors(_opq_permuted(full)))
    # every hot dim lands in its own subspace: each codebook then models
    # ONE high-variance coordinate instead of one codebook modeling eight
    assert opq < 0.55 * plain, (opq, plain)


def test_semdedup_keepone_matches_union_find(spark, sf_dir):
    """e_semdedup_keepone must equal an independent Python union-find over
    the pair table: groups are the transitive closure of the thresholded
    pairs, the representative is the min member, exactly one member per
    group is kept, and vectors with no pair are kept singletons (NULL
    rep). Also pins the within-cluster transitivity claim: if any cluster
    holds two DISJOINT groups, a per-cluster argmin would have collapsed
    them — the CC must not."""
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        e_semdedup_keepone,
        e_semdedup_pairs,
    )

    pairs = [
        (r["vec_a"], r["vec_b"], r["cluster_id"])
        for r in e_semdedup_pairs(spark, sf_dir).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b, _ in pairs:
        union(a, b)
    rep = {x: find(x) for x in parent}

    got = {
        r["vec_id"]: (r["group_rep"], r["kept"])
        for r in e_semdedup_keepone(spark, sf_dir).collect()
    }
    assert got, "empty artifact"
    for vec_id, (group_rep, kept) in got.items():
        if vec_id in rep:
            assert group_rep == rep[vec_id], (vec_id, group_rep, rep[vec_id])
            assert kept == (vec_id == rep[vec_id])
        else:
            assert group_rep is None and kept is True, (vec_id, group_rep, kept)
    # exactly one kept member per group
    from collections import Counter

    kept_per_group = Counter(
        g for _, (g, kept) in got.items() if g is not None and kept
    )
    groups = {g for _, (g, _) in got.items() if g is not None}
    assert kept_per_group == Counter({g: 1 for g in groups})


def test_kn_seeds_scale_with_corpus(spark):
    # k = clamp(n div target, 1, cap): the law itself, on three corpus
    # sizes spanning floor / proportional / cap regimes — and the first k
    # adaptive seeds equal kmeans_seeds(emb, k) exactly (same hash rank).
    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        kmeans_kn_seeds,
    )

    def corpus(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(F.col("id") % 7, F.col("id") % 5).alias("q"),
        )

    for n, target, cap, want in ((10, 4, 8, 2), (100, 4, 8, 8), (3, 4, 8, 1)):
        got = kmeans_kn_seeds(corpus(n), target=target, cap=cap).count()
        assert got == want, (n, target, cap, got)

    emb = corpus(50)
    adaptive = kmeans_kn_seeds(emb, target=10, cap=32)  # k = 5
    fixed = kmeans_seeds(emb, k=5)
    assert sorted(map(tuple, adaptive.collect())) == sorted(
        map(tuple, fixed.collect())
    )


def test_kn_fit_single_wide_exchange(spark, sf_dir):
    # The adaptive-k chain keeps the kmeans scale shape (the
    # test_kmeans_single_wide_exchange claim): assignment adds no vec_id
    # exchange; the extra k law is a one-row broadcast aggregate, never a
    # vector-set exchange.
    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        kmeans_kn_fit,
    )

    emb = _emb(spark, sf_dir)
    _, assigned = kmeans_kn_fit(emb)
    assigned.collect()
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    # r14 fold-based assignment: no planner-inserted vec_id exchange — the
    # only vec_id exchanges are the explicit REPARTITION_BY_NUM (see
    # test_kmeans_single_wide_exchange for the full rationale)
    vec_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(vec_id" in l and "ReusedExchange" not in l
    ]
    assert vec_exchanges, "expected the explicit vec_id repartition"
    assert all("REPARTITION_BY_NUM" in l for l in vec_exchanges), vec_exchanges
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_pcapq_perm_is_balanced_loading_permutation(spark, sf_dir):
    # The PCA-permutation mirrors the OPQ dealing law with |PC1 loading|
    # as the rank key: a true permutation of 0..63, rank-reconstructable
    # from the dealing formula, and ordered by the fixed-point loading
    # magnitudes (ties broken by dim — the oracle's window order).
    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        PQ_M,
        PQ_SUBDIM,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _gram_row,
        _pc1_cols,
        _pcapq_perm_df,
    )

    pa = _pcapq_perm_df(spark, sf_dir).collect()[0]["pa"]
    assert sorted(pa) == list(range(PQ_M * PQ_SUBDIM))
    rank_of = {}
    for p, d in enumerate(pa):
        sub, slot = divmod(p, PQ_SUBDIM)
        rank_of[d] = slot * PQ_M + sub
    assert sorted(rank_of.values()) == list(range(PQ_M * PQ_SUBDIM))
    va = _pc1_cols(_gram_row(spark, sf_dir)).collect()[0]["va1"]
    by_rank = sorted(rank_of, key=lambda d: rank_of[d])
    keys = [(-abs(va[d]), d) for d in by_rank]
    assert keys == sorted(keys)


def test_kn_pruned_assignment_total_and_deterministic(spark, sf_dir):
    # The pivot-pruned assignment must never drop a vector (live-pivot
    # semi-join closes the empty-group hole) and must be a pure function
    # of the data under any physical partitioning.
    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        kmeans_kn_pruned_fit,
    )

    def run(n_parts):
        emb = (
            spread(read(spark, sf_dir, "embeddings"), spark)
            .select("vec_id", quantize(F.col("embedding")).alias("q"))
            .repartition(n_parts, "vec_id")
        )
        _, assigned = kmeans_kn_pruned_fit(emb)
        rows = assigned.select("vec_id", "cid", "dist").collect()
        return sorted((r.vec_id, r.cid, r.dist) for r in rows)

    a = run(2)
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(a) == n_vec
    assert len({v for v, _, _ in a}) == n_vec
    assert a == run(7)


def test_kn_pivots_default_is_sqrt_cap_and_unchanged():
    # Round-11 guard for the P = sqrt(k) prescription wired as the default
    # (SCALING.md pivot-count sweep): KN_PIVOTS must track sqrt(KN_CAP),
    # and at the current cap the derived value must equal the 16 every
    # certified e_semdedup_kn_pruned plan and oracle was emitted with —
    # a cap change that silently moved the default would drift the gate.
    import math

    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        KN_CAP,
        KN_PIVOTS,
    )

    assert KN_PIVOTS == math.isqrt(KN_CAP)
    assert KN_PIVOTS == 16, (
        "KN_CAP changed: re-certify e_semdedup_kn_pruned (plan + oracle "
        "emit the pivot count) before shipping the new default"
    )


def test_regret_sweep_sampled_arm_is_subset_of_full_audit(spark, sf_dir):
    """The P = 16 arm of e_kn_pruned_regret_sweep runs the SAME chain as
    e_kn_pruned_vs_flat_delta (isqrt(256) = 16 is the wired default, same
    salt, so identical centroids) with the exact ground-truth pass
    restricted to the md5-anchor sample — its disagreement/regret totals
    must therefore be bounded by the full audit's, and per-vector regret
    stays >= 0 (same candidate set, restricted vs full argmin)."""
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _REGRET_SAMPLE,
        e_kn_pruned_regret_sweep,
        e_kn_pruned_vs_flat_delta,
    )

    sweep = {
        r.pivots: r for r in e_kn_pruned_regret_sweep(spark, sf_dir).collect()
    }
    full = e_kn_pruned_vs_flat_delta(spark, sf_dir).collect()[0]
    arm = sweep[16]
    assert arm.n_sampled == min(_REGRET_SAMPLE, full.n_vectors)
    assert 0 <= arm.n_diff_assign <= full.n_diff_assign
    assert 0 <= arm.total_regret <= full.total_regret
    assert 0 <= arm.max_regret <= full.max_regret
    for row in sweep.values():
        assert row.total_regret >= 0 and row.max_regret >= 0


def test_ivf_split_rebalance_improves_balance(spark, sf_dir):
    """Structural guarantees of the split-rebalance law: (a) mass is
    conserved — both phases assign every vector exactly once; (b) each
    split parent with >= 2 members yields two non-empty halves (a
    sub-seed captures at least itself), each strictly smaller than the
    parent; (c) max list occupancy improves — STRICTLY when the generic
    precondition holds (every list tied at the max falls inside the
    top-_RB_SPLITS selection and each split parent has >= 2 members;
    driver-regenerated data could in principle produce a wider tie or a
    1-member hot list, where the law degrades to <=); (d) unsplit lists
    carry over unchanged; (e) the before phase equals e_ivf_build_stats
    (same assignment law)."""
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _RB_SPLITS,
        e_ivf_build_stats,
        e_ivf_split_rebalance,
    )

    rows = e_ivf_split_rebalance(spark, sf_dir).collect()
    before = {r.list_id: r.n_vecs for r in rows if r.phase == "before"}
    after = {r.list_id: r.n_vecs for r in rows if r.phase == "after"}

    assert sum(before.values()) == sum(after.values()) > 0

    split_parents = {
        lid // 10 * 10 for lid in after if lid % 10 != 0
    }
    assert len(split_parents) == _RB_SPLITS
    # the split lists are the top-_RB_SPLITS by occupancy (ties to
    # smaller pid)
    ranked = sorted(before.items(), key=lambda kv: (-kv[1], kv[0]))
    assert split_parents == {lid for lid, _ in ranked[:_RB_SPLITS]}

    max_before = max(before.values())
    tied_at_max = sum(1 for n in before.values() if n == max_before)
    generic = tied_at_max <= _RB_SPLITS and all(
        before[p] >= 2 for p in split_parents
    )
    if generic:
        assert len(after) == len(before) + _RB_SPLITS
        assert max(after.values()) < max_before
    else:
        assert max(after.values()) <= max_before

    for parent in split_parents:
        halves = [after[lid] for lid in after if lid // 10 * 10 == parent and lid % 10 != 0]
        assert sum(halves) == before[parent]
        if before[parent] >= 2:
            assert len(halves) == 2 and all(h >= 1 for h in halves)
            assert max(halves) < before[parent]
    for lid, n in before.items():
        if lid not in split_parents:
            assert after[lid] == n

    stats = {r.list_id * 10: r.n_vecs for r in e_ivf_build_stats(spark, sf_dir).collect()}
    assert stats == before


def test_decontaminate_semantic_is_pruned_subset_of_exact(spark, sf_dir):
    """The IVF-pruned contamination scan must be a SUBSET of the exact
    all-pairs threshold scan (pruning can only lose candidates, never
    invent them), every reported hit must truly clear the threshold
    against its nearest eval item, and the per-vector stats must agree
    with a quadratic Python reference restricted to probed lists."""
    from collections import defaultdict

    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long_py
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _ED_COS,
        _ED_NPROBE,
        _ED_TARGET,
        _N_PIVOTS,
        e_decontaminate_semantic,
    )
    from pagopa_ecommerce_cdc_service_spark.operators.similarity import QUANT

    import math

    def _q(v):  # Spark round(x, 0): HALF_UP, away from zero
        return int(math.copysign(math.floor(abs(v) * QUANT + 0.5), v))

    vecs = {
        r.vec_id: [_q(v) for v in r.embedding]
        for r in read(spark, sf_dir, "embeddings").collect()
    }
    n2 = {i: sum(x * x for x in q) for i, q in vecs.items()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        return d / (math.sqrt(n2[a]) * math.sqrt(n2[b]))

    dd = (len(vecs) + _ED_TARGET - 1) // _ED_TARGET
    eval_ids = [i for i in vecs if md5_long_py(f"ed:{i}") % dd == 1]
    train_ids = [i for i in vecs if i not in set(eval_ids)]
    pivots = sorted(i for i in vecs if 1 <= i <= _N_PIVOTS)

    def d2(a, p):
        return sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[p]))

    def nearest(a):
        return min(pivots, key=lambda p: (d2(a, p), p))

    def probe(a):
        return [p for p in sorted(pivots, key=lambda p: (d2(a, p), p))[:_ED_NPROBE]]

    probed_by_list = defaultdict(set)
    for e in eval_ids:
        for p in probe(e):
            probed_by_list[p].add(e)

    expect = {}
    for t in train_ids:
        hits = [
            (cos(t, e), e)
            for e in probed_by_list[nearest(t)]
            if cos(t, e) >= _ED_COS
        ]
        if hits:
            best = max(hits, key=lambda h: (h[0], -h[1]))
            expect[t] = (len(hits), best[1])

    got = {
        r.vec_id: (r.n_eval_hits, r.nearest_eval_id, r.max_cos)
        for r in e_decontaminate_semantic(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for t, (nh, ne, mc) in got.items():
        assert (nh, ne) == expect[t]
        assert mc >= _ED_COS
        # subset of the EXACT scan: the flagged pair is a real near-dup
        assert cos(t, ne) >= _ED_COS


def test_ivf_rebalanced_topk_matches_reference(spark, sf_dir):
    """Quadratic Python reference for the whole serving chain: rebuild
    the rebalanced layout (assignment, hot split, sub-seeds, centroids)
    sequentially, probe the query's _NPROBE nearest lists, and take the
    exact-cosine top-5 among probed members — the Spark plan must
    reproduce it row for row."""
    import math

    from pagopa_ecommerce_cdc_service_spark.functions.hashing import md5_long_py
    from pagopa_ecommerce_cdc_service_spark.operators.similarity import QUANT
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _N_PIVOTS,
        _NPROBE,
        _RB_SPLITS,
        e_ivf_rebalanced_topk,
    )

    def _q(v):
        return int(math.copysign(math.floor(abs(v) * QUANT + 0.5), v))

    rows = read(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: [_q(v) for v in r.embedding] for r in rows}
    label = {r.vec_id: r.label for r in rows}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    pivots = {p: vecs[p] for p in range(1, _N_PIVOTS + 1) if p in vecs}
    assign = {
        i: min(pivots, key=lambda p: (d2(v, pivots[p]), p))
        for i, v in vecs.items()
    }
    occ: dict[int, int] = {}
    for p in assign.values():
        occ[p] = occ.get(p, 0) + 1
    hot = [p for p, _ in sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))][:_RB_SPLITS]

    final = {}
    cent = {p * 10: pivots[p] for p in pivots if p not in hot}
    for i, p in assign.items():
        if p not in hot:
            final[i] = p * 10
    for p in hot:
        members = sorted(
            (i for i, pp in assign.items() if pp == p),
            key=lambda i: (md5_long_py(f"rb:{i}"), i),
        )
        seeds = {s + 1: vecs[members[s]] for s in range(min(2, len(members)))}
        for s, sv in seeds.items():
            cent[p * 10 + s] = sv
        for i in members:
            s = min(seeds, key=lambda s: (d2(vecs[i], seeds[s]), s))
            final[i] = p * 10 + s

    qv = vecs[0]
    probed = sorted(cent, key=lambda c: (d2(qv, cent[c]), c))[:_NPROBE]
    pool = [i for i, lid in final.items() if lid in probed and i != 0]
    expect = sorted(pool, key=lambda i: (-cos(vecs[i], qv), i))[:5]

    got = e_ivf_rebalanced_topk(spark, sf_dir).collect()
    assert [r.vec_id for r in got] == expect
    for r in got:
        assert r.list_id == final[r.vec_id]
        assert r.label == label[r.vec_id]
        assert abs(r.cos_sim - cos(vecs[r.vec_id], qv)) < 1e-12


def test_round13_vector_queries_partitioning_invariant(spark, sf_dir, tmp_path):
    """Determinism contract for the round-13 vector queries: outputs are
    pure functions of the data, not of physical layout. The sub-seed
    min-aggregations, broadcast folds, and probe rankings must produce
    identical rows when the input parquet arrives as one file or many."""
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        e_decontaminate_semantic,
        e_ivf_rebalanced_topk,
        e_ivf_split_rebalance,
    )

    emb = read(spark, sf_dir, "embeddings")
    emb.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "a" / "embeddings.parquet")
    )
    emb.repartition(13).write.mode("overwrite").parquet(
        str(tmp_path / "b" / "embeddings.parquet")
    )
    for fn in (e_ivf_split_rebalance, e_decontaminate_semantic, e_ivf_rebalanced_topk):
        a = sorted(map(tuple, fn(spark, str(tmp_path / "a")).collect()))
        b = sorted(map(tuple, fn(spark, str(tmp_path / "b")).collect()))
        assert a == b, fn.__name__
        assert a, f"{fn.__name__}: empty output on the fixture corpus"


def test_decontaminated_split_conserves_mass_and_commutes(spark, sf_dir):
    """Cross-query consistency of the split regeneration: (a) MASS — the
    (label × bucket) census covers every vector exactly once (per-label
    totals equal the per-label corpus census); (b) QUARANTINE — the
    quarantined population is exactly e_decontaminate_semantic's flagged
    set (count AND sum-of-ids checksum); (c) NO-RESHUFFLE — because split
    assignment is a pure md5 function of (label, vec_id), survivors keep
    the bucket they would have had before decontamination: recomputing
    assign_split over the full train universe and dropping flagged rows
    reproduces the census row-for-row."""
    from pagopa_ecommerce_cdc_service_spark.operators.split import assign_split
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read
    from pagopa_ecommerce_cdc_service_spark.plans.text_queries import (
        _SPLIT_FRACTIONS,
    )
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _decontamination_chain,
        e_decontaminate_semantic,
        e_decontaminated_split,
    )

    census = {
        (r.label, r.split): (r.n_vecs, r.vec_id_sum)
        for r in e_decontaminated_split(spark, sf_dir).collect()
    }
    assert census, "empty census"

    # (a) mass conservation per label
    corpus = {
        r.label: (r.n, r.s)
        for r in read(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("vec_id").cast("long").alias("s"),
        )
        .collect()
    }
    for label, (n, s) in corpus.items():
        rows = [v for (lb, _), v in census.items() if lb == label]
        assert sum(r[0] for r in rows) == n, label
        assert sum(r[1] for r in rows) == s, label
    buckets = {b for (_, b) in census}
    assert buckets <= {"train", "validation", "test", "quarantined", "eval"}

    # (b) quarantined == flagged, count and id-sum
    flagged = e_decontaminate_semantic(spark, sf_dir).select("vec_id").collect()
    q_n = sum(v[0] for (lb, b), v in census.items() if b == "quarantined")
    q_s = sum(v[1] for (lb, b), v in census.items() if b == "quarantined")
    assert q_n == len(flagged)
    assert q_s == sum(r.vec_id for r in flagged)

    # (c) no-reshuffle: full-universe assignment minus flagged rows
    # reproduces the survivor census exactly
    _en, train, _hits = _decontamination_chain(spark, sf_dir)
    flagged_ids = {r.vec_id for r in flagged}
    full = assign_split(
        train.select("vec_id", "label"),
        key="vec_id",
        fractions=_SPLIT_FRACTIONS,
        stratum="label",
    ).collect()
    from collections import defaultdict

    expect = defaultdict(lambda: [0, 0])
    for r in full:
        if r.vec_id not in flagged_ids:
            e = expect[(r.label, r.split)]
            e[0] += 1
            e[1] += r.vec_id
    got = {
        k: v
        for k, v in census.items()
        if k[1] in ("train", "validation", "test")
    }
    assert got == {k: (v[0], v[1]) for k, v in expect.items()}


def test_rebalanced_layout_probe_efficiency_never_regresses(spark, sf_dir):
    """Promotion of SCALING.md's probe-efficiency measurement into a pin
    (round-14 queue): the ONE number the split-rebalance exists to improve
    is vectors scanned per probe at fixed nprobe. Laws pinned against the
    before-layout, computed from the shared _split_rebalanced_layout:

    (a) the registered serving query (vec 0) scans no more after the
        split, and STRICTLY less whenever its after-probe set contains a
        child of a parent it probed before (the 'split pays' case —
        measured 138→68 at sf0.001, 132→97 at sf0.01 on the r14 fixture);
    (b) over a deterministic 50-query sample the MEAN scanned count does
        not regress (≤ 2% slack for probe-set drift on regenerated data —
        a layout bug that mis-selects hot lists or mis-assigns children
        moves this by far more; measured improvement ~21% at both gate
        scales, 0/50 individual queries worse)."""
    from pagopa_ecommerce_cdc_service_spark.operators.similarity import quantize
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read, spread
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        _N_PIVOTS,
        _NPROBE,
        _split_rebalanced_layout,
    )

    emb = spread(read(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", quantize(F.col("embedding")).alias("qvec")
    )
    occ, hot, after, cent = _split_rebalanced_layout(emb)
    piv = emb.filter(F.col("vec_id").between(1, _N_PIVOTS)).select(
        F.col("vec_id").alias("pid"), F.col("qvec").alias("pv")
    )
    occ_b = {r.pid: r.nv for r in occ.collect()}
    occ_a = {
        r.list_id: r.n
        for r in after.groupBy("list_id").agg(F.count("*").alias("n")).collect()
    }
    pivs = [(r.pid, r.pv) for r in piv.collect()]
    cents = [(r.list_id, r.cv) for r in cent.collect()]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def probe(qvec):
        pb = sorted((d2(qvec, pv), pid) for pid, pv in pivs)[:_NPROBE]
        pa = sorted((d2(qvec, cv), lid) for lid, cv in cents)[:_NPROBE]
        sb = sum(occ_b[pid] for _, pid in pb)
        sa = sum(occ_a[lid] for _, lid in pa)
        return {pid for _, pid in pb}, {lid for _, lid in pa}, sb, sa

    queries = {r.vec_id: r.qvec for r in emb.filter(F.col("vec_id") < 50).collect()}
    assert 0 in queries

    # (a) the registered serving query
    pb0, pa0, sb0, sa0 = probe(queries[0])
    assert sa0 <= sb0, (sb0, sa0)
    # child list ids are parent*10 + sub (sub 1/2); unsplit ids are pid*10
    split_pays = any(lid % 10 != 0 and (lid // 10) in pb0 for lid in pa0)
    if split_pays:
        assert sa0 < sb0, (sb0, sa0)

    # (b) mean over the deterministic sample
    tot_b = tot_a = 0
    for qvec in queries.values():
        _, _, sb, sa = probe(qvec)
        tot_b += sb
        tot_a += sa
    assert tot_a <= tot_b * 1.02, (tot_b, tot_a)


def test_dual_audit_matches_separate_passes(spark, sf_dir):
    """r15 internals pin: kmeans_kn_pruned_dual (one map pass computing
    exact + pruned assignments from one broadcast state) must equal the
    two certified passes run separately at the same centroids — exact
    ≡ kmeans_assign (full k-way argmin, (dist, cid) tiebreak), pruned
    ≡ kmeans_kn_pruned_pass — aligned on vec_id, and per-row regret
    dist_pruned − dist_exact must be ≥ 0 (restricted vs full argmin)."""
    from pagopa_ecommerce_cdc_service_spark.operators.clustering import (
        KM_ITERS,
        kmeans_kn_pruned_dual,
        kmeans_kn_pruned_pass,
        kmeans_kn_seeds,
        kn_pivots,
    )

    emb = _emb(spark, sf_dir)
    seeds = kmeans_kn_seeds(emb)
    piv = kn_pivots(seeds)
    cent = seeds
    for _ in range(KM_ITERS):
        cent = kmeans_update(kmeans_kn_pruned_pass(emb, cent, piv))
    dual = {
        r.vec_id: (r.cid_exact, r.dist_exact, r.cid_pruned, r.dist_pruned)
        for r in kmeans_kn_pruned_dual(emb, cent, piv).collect()
    }
    exact = {
        r.vec_id: (r.cid, r.dist) for r in kmeans_assign(emb, cent).collect()
    }
    pruned = {
        r.vec_id: (r.cid, r.dist)
        for r in kmeans_kn_pruned_pass(emb, cent, piv).collect()
    }
    assert set(dual) == set(exact) == set(pruned)
    for vid, (ce, de, cp_, dp) in dual.items():
        assert (ce, de) == exact[vid], vid
        assert (cp_, dp) == pruned[vid], vid
        assert dp >= de, vid


def test_pruned_chain_plan_stays_linear(spark, sf_dir):
    """r15 plan pin: the pruned-kn chains' unrolled plans must stay LINEAR
    in the iteration count. Before the r15 rewrite the pass referenced the
    previous centroid tree twice per iteration (2^iters growth:
    e_kn_pruned_regret_sweep carried 570 parquet-scan nodes,
    e_kn_pruned_vs_flat_delta 132, e_semdedup_kn_pruned 396 at sf0.1); a
    refactor that reintroduces a second reference blows these bounds."""
    from pagopa_ecommerce_cdc_service_spark.plans.vector_queries import (
        e_kn_pruned_regret_sweep,
        e_kn_pruned_vs_flat_delta,
        e_semdedup_kn_pruned,
    )

    def scans(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("FileScan parquet")

    assert scans(e_kn_pruned_vs_flat_delta(spark, sf_dir)) <= 24
    assert scans(e_semdedup_kn_pruned(spark, sf_dir)) <= 40
    assert scans(e_kn_pruned_regret_sweep(spark, sf_dir)) <= 70
