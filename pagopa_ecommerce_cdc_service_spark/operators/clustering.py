"""Distributed k-means (Lloyd's) as ONE static Catalyst plan.

The iterative loop is UNROLLED at plan-build time for a fixed iteration
count, so the whole algorithm — seed selection, every assignment pass,
every centroid recompute — is a single declarative DataFrame plan: no
driver-side ``collect()`` between iterations, no jobs at build time, a
static fingerprint, and a DuckDB-replayable unrolled-CTE oracle (the same
technique the BPE trainer uses, ``plans/text_queries.py``).

Determinism (value-hash certifiable):
- seeds: the k vectors with the smallest portable ``md5_long("km:"||id)``,
  ranked by (hash, id) — no ``rand()``, reproducible under any partitioning;
- arithmetic: vectors live in the QUANT-scaled integer domain
  (``similarity.quantize``), squared distances are exact BIGINTs
  (|q| ≤ ~1000 ⇒ dim diff² ≤ 4e6, ×64 dims ≤ 2.6e8 per pair — no overflow),
  assignment tiebreak is (dist, cluster_id) via ``min(struct)``;
- centroid mean: ``floor(sum / n)`` with the division done in doubles only
  after the exact integer sum (|sum| < 2^53, so the double is exact and
  floor is engine-identical; integer ``div`` would differ — Spark truncates
  toward zero, DuckDB ``//`` floors — for negative sums).

Scale shape (the 100 TB plan, asserted in tests/test_plan_quality.py):
- ONE wide exchange total: vectors are hash-partitioned by id once, up
  front. Each assignment pass is a BroadcastNestedLoopJoin against the k
  (≤ tens) centroids — broadcast joins preserve the streamed side's
  partitioning, so every per-vector argmin ``groupBy(vec_id)`` reuses the
  same partitioning with NO further exchange of vector data.
- Each centroid recompute shuffles only the (cluster, dim) partial-sum
  grid: map-side combine bounds it at k·dims rows per task whatever the
  vector count.
A 1000-executor run therefore moves the full vector set across the wire
exactly once, plus k·dims-sized grids per iteration.

Reference scope: the reference CDC service has no clustering surface — this
belongs to the generalized training-data engine (SURVEY.md north star);
k-means is the standard corpus-topic/PQ-codebook primitive.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql
from .similarity import DIMS

KM_K = 8
KM_ITERS = 2  # centroid updates; assignment runs ITERS + 1 times


def sq_dist(a: Column, b: Column) -> Column:
    """Exact squared euclidean distance between quantized integer vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq_dist_sql(a: str, b: str, dims: int = DIMS) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {dims}), "
        f"i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i]))) AS BIGINT)"
    )


def kmeans_seeds(emb: DataFrame, k: int = KM_K, salt: str = "km:") -> DataFrame:
    """k seed centroids: vectors ranked by (md5_long(salt||id), id).

    ``orderBy().limit()`` compiles to TakeOrderedAndProject (no global
    sort); the row_number window then ranks only k rows. ``salt`` picks an
    independent deterministic seeding (stability audits run two).
    """
    hashed = emb.select(
        "vec_id",
        "q",
        md5_long(F.concat(F.lit(salt), F.col("vec_id").cast("string"))).alias("h"),
    )
    top = hashed.orderBy("h", "vec_id").limit(k)
    w = Window.orderBy("h", "vec_id")
    return top.select(F.row_number().over(w).alias("cid"), F.col("q").alias("c"))


def kmeans_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, q, cid, dist).

    r14 optimization (guide §2.4 — remove shuffles outright): the k
    centroids collapse to ONE cid-sorted array-of-structs row that
    broadcasts to every task; the argmin is a per-row transform +
    lexicographic array_min. Versus the previous crossJoin → n×k scored
    rows → groupBy(vec_id) min(struct) shape this materializes no n×k
    relation, builds no aggregation hash table, and needs no vec_id
    partitioning at all — a pure map-only pass over the corpus (same
    stage count at any scale). Winner identical: min over (dist, cid)
    structs is exactly the old min(struct(dist, cid)) tie-break.
    """
    cent_arr = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("_cb")
    )
    best = F.array_min(
        F.transform(
            F.col("_cb"),
            lambda s: F.struct(
                sq_dist(s["c"], F.col("q")).alias("dist"), s["cid"].alias("cid")
            ),
        )
    )
    return (
        emb.crossJoin(F.broadcast(cent_arr))
        .select(
            "vec_id",
            "q",
            best["cid"].alias("cid"),
            best["dist"].alias("dist"),
        )
    )


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """Recompute centroids: per-(cluster, dim) exact floor-mean, re-packed
    into ordered arrays. Shuffles only the k·dims grid (map-side combined).

    r15 NEGATIVE RESULT (kept as the explode form on the numbers): a
    single-exchange wide fold — groupBy(cid) with 64 per-slot integer
    sums, the pq_update shape — was built, proven value-identical, and
    interleave-A/B-measured. It consistently REGRESSED the pruned-kn
    chains (e_kn_pruned_vs_flat_delta 0.66-0.73×, e_kn_pruned_regret_sweep
    0.82-0.83×, e_semdedup_kn_pruned 0.81×, with and without a Generate
    barrier against re-inlining) while the flat chains moved within noise
    (e_kmeans_clusters 0.91-1.15×) — at gate scale the ~200 extra
    expression nodes per update (64 sums + 64 floors through codegen)
    cost more than the saved exchange of a k×64-row grid. pq_update keeps
    the wide fold: its 8-slot version measured 1.23-1.46× on the PQ
    family. See OPTIMIZATION_r15.md."""
    dims = (
        assigned.select("cid", F.posexplode("q").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(
            F.floor(F.sum("v").cast("double") / F.count("*")).cast("long").alias("cv")
        )
    )
    return dims.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
        ).alias("c")
    )


def kmeans_fit(
    emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS, salt: str = "km:"
):
    """Unrolled k-means returning ``(centroids, final_assignment)`` — the
    assignment is exactly :func:`kmeans_plan`'s output; the centroid table
    additionally feeds audits that need the model itself (silhouette)."""
    cent = kmeans_seeds(emb, k, salt)
    for _ in range(iters):
        cent = kmeans_update(kmeans_assign(emb, cent))
    return cent, kmeans_assign(emb, cent)


def kmeans_plan(
    emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS, salt: str = "km:"
) -> DataFrame:
    """Full unrolled k-means: returns the final assignment (vec_id, cid,
    dist) after ``iters`` centroid updates. ``emb`` must have (vec_id, q)
    and SHOULD be hash-partitioned by vec_id (see module docstring)."""
    return kmeans_fit(emb, k, iters, salt)[1]


# --- unrolled-CTE oracle ----------------------------------------------------


def kmeans_oracle_ctes(
    qv_sql: str,
    k: int = KM_K,
    iters: int = KM_ITERS,
    salt: str = "km:",
    prefix: str = "",
) -> str:
    """CTE chain mirroring kmeans_plan: emb → seeds → (a_i → c_i)* → a_final.

    The caller SELECTs from ``{prefix}a{iters}`` (final assignment: vec_id,
    cid, dist). ``qv_sql`` is the quantized-vector expression over
    ``embeddings``. ``salt``/``prefix`` let one query chain two independent
    seedings without CTE-name collisions (defaults keep the emitted SQL
    byte-identical to the single-chain form)."""
    p = prefix
    seed_hash = md5_long_sql(f"'{salt}' || CAST(vec_id AS VARCHAR)")
    parts = [
        f"{p}emb AS (SELECT vec_id, {qv_sql} AS q FROM embeddings)",
        f"""{p}seeds0 AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) AS cid, q AS c
          FROM (SELECT vec_id, q, {seed_hash} AS h FROM {p}emb
                ORDER BY h, vec_id LIMIT {k}))""",
    ]

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, q, cid, dist FROM (
            SELECT e.vec_id, e.q, s.cid,
                   {sq_dist_sql("e.q", "s.c")} AS dist,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {sq_dist_sql("e.q", "s.c")}, s.cid) AS rn
            FROM {p}emb e CROSS JOIN {cent} s)
          WHERE rn = 1)"""

    def update(name: str, assigned: str) -> str:
        return f"""{name} AS (
          SELECT cid, array_agg(cv ORDER BY pos) AS c FROM (
            SELECT cid, pos,
                   CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
            FROM (SELECT a.cid, i.pos, a.q[i.pos] AS v
                  FROM {assigned} a,
                       (SELECT unnest(generate_series(1, {DIMS})) AS pos) i)
            GROUP BY cid, pos)
          GROUP BY cid)"""

    cent = f"{p}seeds0"
    for i in range(iters):
        parts.append(assign(f"{p}a{i}", cent))
        parts.append(update(f"{p}c{i}", f"{p}a{i}"))
        cent = f"{p}c{i}"
    parts.append(assign(f"{p}a{iters}", cent))
    return ",\n".join(parts)


# --- corpus-scaled cluster count: k ∝ n -------------------------------------
# SemDeDup's design point is CONSTANT per-cluster size as the corpus grows
# (k = n / target), so the within-cluster quadratic pair work stays linear
# in n. ``kmeans_kn_seeds`` makes the cluster count data-dependent INSIDE
# one static plan: the seed scan takes the top KN_CAP vectors by hash rank
# (TakeOrderedAndProject — a fixed bound whatever the corpus), and the
# actual k = clamp(n div KN_TARGET, 1, KN_CAP) rides a ONE-ROW broadcast
# count aggregate into a rank filter. No driver-side count(), no job at
# plan-build time — the k∝n law is part of the declarative plan and of the
# DuckDB oracle. Integer-exact: `div` floors for positive n in both
# engines. KN_CAP is the static seed-scan bound — a config knob a 100 TB
# deployment raises with its corpus (the measured k∝n decade study lives
# in tools/semdedup_kscale.py; this operator REGISTERS the law).

KN_TARGET = 64  # design per-cluster size: k = clamp(n div 64, 1, KN_CAP)
KN_CAP = 256


def kmeans_kn_seeds(
    emb: DataFrame,
    target: int = KN_TARGET,
    cap: int = KN_CAP,
    salt: str = "km:",
) -> DataFrame:
    """Adaptive-count seed centroids: the top-``cap`` hash-ranked vectors,
    kept while rank ≤ k where k = clamp(n div target, 1, cap) is a one-row
    broadcast aggregate. The first k seeds equal ``kmeans_seeds(emb, k)``
    exactly (same hash, same rank order)."""
    kk = emb.agg(
        F.expr(f"greatest(1, least({cap}, count(*) div {target}))").alias("kk")
    )
    hashed = emb.select(
        "vec_id",
        "q",
        md5_long(F.concat(F.lit(salt), F.col("vec_id").cast("string"))).alias("h"),
    )
    top = hashed.orderBy("h", "vec_id").limit(cap)
    w = Window.orderBy("h", "vec_id")
    ranked = top.select(F.row_number().over(w).alias("cid"), F.col("q").alias("c"))
    return (
        ranked.crossJoin(F.broadcast(kk))
        .filter(F.col("cid") <= F.col("kk"))
        .select("cid", "c")
    )


def kmeans_kn_fit(
    emb: DataFrame,
    iters: int = KM_ITERS,
    target: int = KN_TARGET,
    cap: int = KN_CAP,
    salt: str = "km:",
):
    """Unrolled Lloyd's with corpus-scaled k: ``(centroids, assignment)``.
    Assignment/update passes are :func:`kmeans_assign`/:func:`kmeans_update`
    verbatim — they never reference k, so the adaptive seed table slots in
    with zero change to the iteration plan shape."""
    cent = kmeans_kn_seeds(emb, target, cap, salt)
    for _ in range(iters):
        cent = kmeans_update(kmeans_assign(emb, cent))
    return cent, kmeans_assign(emb, cent)


def kmeans_kn_oracle_ctes(
    qv_sql: str,
    iters: int = KM_ITERS,
    target: int = KN_TARGET,
    cap: int = KN_CAP,
    salt: str = "km:",
    prefix: str = "",
) -> str:
    """CTE chain mirroring kmeans_kn_fit: emb → kn (the one-row k law) →
    adaptive seeds → (a_i → c_i)* → a_final. The caller SELECTs from
    ``{prefix}a{iters}`` and may read the scaled k from ``{prefix}kn``.
    Assignment/update CTE text matches :func:`kmeans_oracle_ctes` exactly —
    only the seed CTE differs (rank ≤ scalar-subquery k over a top-``cap``
    scan instead of LIMIT k)."""
    p = prefix
    seed_hash = md5_long_sql(f"'{salt}' || CAST(vec_id AS VARCHAR)")
    parts = [
        f"{p}emb AS (SELECT vec_id, {qv_sql} AS q FROM embeddings)",
        f"""{p}kn AS (
          SELECT GREATEST(1, LEAST({cap}, count(*) // {target})) AS kk
          FROM {p}emb)""",
        f"""{p}seeds0 AS (
          SELECT cid, c FROM (
            SELECT row_number() OVER (ORDER BY h, vec_id) AS cid, q AS c
            FROM (SELECT vec_id, q, {seed_hash} AS h FROM {p}emb
                  ORDER BY h, vec_id LIMIT {cap}))
          WHERE cid <= (SELECT kk FROM {p}kn))""",
    ]

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, q, cid, dist FROM (
            SELECT e.vec_id, e.q, s.cid,
                   {sq_dist_sql("e.q", "s.c")} AS dist,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {sq_dist_sql("e.q", "s.c")}, s.cid) AS rn
            FROM {p}emb e CROSS JOIN {cent} s)
          WHERE rn = 1)"""

    def update(name: str, assigned: str) -> str:
        return f"""{name} AS (
          SELECT cid, array_agg(cv ORDER BY pos) AS c FROM (
            SELECT cid, pos,
                   CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
            FROM (SELECT a.cid, i.pos, a.q[i.pos] AS v
                  FROM {assigned} a,
                       (SELECT unnest(generate_series(1, {DIMS})) AS pos) i)
            GROUP BY cid, pos)
          GROUP BY cid)"""

    cent = f"{p}seeds0"
    for i in range(iters):
        parts.append(assign(f"{p}a{i}", cent))
        parts.append(update(f"{p}c{i}", f"{p}a{i}"))
        cent = f"{p}c{i}"
    parts.append(assign(f"{p}a{iters}", cent))
    return ",\n".join(parts)


# --- product quantization ---------------------------------------------------
# PQ = per-subspace k-means: the 64-dim QUANT vector splits into PQ_M
# 8-dim subvectors, each trained against its own PQ_K-centroid codebook
# (grouped Lloyd's — the same unrolled-static-plan machinery with `sub` as
# an extra key everywhere). A vector's code is PQ_M small ints; search is
# asymmetric distance (ADC): the query's 8x16 = 128-entry distance lookup
# table broadcasts, candidate distances are a sum of PQ_M exact-integer
# lookups. The 100 TB story: the corpus scan for search touches ONLY the
# (vec_id, sub, cid) code table — PQ_M bytes of code per vector instead of
# 512 bytes of floats — and the scoring join is a broadcast against 128
# rows; full vectors are read back for the final rescore of a fixed-size
# candidate set alone.

PQ_M = 8
PQ_SUBDIM = DIMS // PQ_M
PQ_K = 16
PQ_ITERS = 2


def pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, sub, sq): the PQ_M 8-dim slices of each quantized vector."""
    slices = F.array(
        *[F.slice(F.col("q"), m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)]
    )
    return emb.select("vec_id", F.posexplode(slices).alias("sub", "sq"))


def pq_seeds(subs: DataFrame, k: int = PQ_K) -> DataFrame:
    """Per-subspace seed codebook: the k subvectors with the smallest
    (md5_long('pq:'||id), id) rank within each subspace. One rank window
    per training run — a one-time cost the assignment passes never repeat."""
    w = Window.partitionBy("sub").orderBy("h", "vec_id")
    return (
        subs.withColumn(
            "h",
            md5_long(F.concat(F.lit("pq:"), F.col("vec_id").cast("string"))),
        )
        .withColumn("cid", F.row_number().over(w))
        .filter(F.col("cid") <= k)
        .select("sub", "cid", F.col("sq").alias("c"))
    )


def pq_assign(subs: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid code per (vector, subspace).

    r14 optimization (guide §2.4): the PQ_M×PQ_K codebook collapses to
    PQ_M rows of cid-sorted codeword arrays; one broadcast hash join on
    ``sub`` attaches each subvector's own codebook and the argmin is a
    per-row transform + array_min. No n×PQ_K scored relation, no
    (vec_id, sub) aggregation hash table — map-only after the bounded
    broadcast. Winner identical to the old min(struct(dist, cid))."""
    cb_arr = cent.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("_cb")
    )
    best = F.array_min(
        F.transform(
            F.col("_cb"),
            lambda s: F.struct(
                sq_dist(s["c"], F.col("sq")).alias("dist"), s["cid"].alias("cid")
            ),
        )
    )
    return (
        subs.join(F.broadcast(cb_arr), "sub")
        .select(
            "vec_id",
            "sub",
            "sq",
            best["cid"].alias("cid"),
            best["dist"].alias("dist"),
        )
    )


def pq_update(assigned: DataFrame) -> DataFrame:
    """Per-(subspace, cluster, dim) exact floor-mean → new codebooks.

    r15 optimization (guide §2.3 "aggregate before you shuffle", §2.4):
    ONE hash aggregate keyed by (sub, cid) with PQ_SUBDIM exact integer
    sums replaces the posexplode → (sub, cid, pos) grid → re-pack pair of
    exchanges — the input rows no longer multiply ×8 through the first
    hash aggregate, and each training update is one exchange instead of
    two. Identical per-slot arithmetic (floor(double(sum)/count) over
    exact BIGINT sums, order-free). Interleave-A/B floors: e_pq_topk
    1.23-1.46×, e_ivf_opq_topk 1.10×, e_pcapq_topk 1.08×. The 64-slot
    analogue for kmeans_update was measured and REJECTED (see there)."""
    sums = assigned.groupBy("sub", "cid").agg(
        F.count("*").alias("_n"),
        *[F.sum(F.col("sq")[i]).alias(f"_s{i}") for i in range(PQ_SUBDIM)],
    )
    return sums.select(
        "sub",
        "cid",
        F.array(
            *[
                F.floor(F.col(f"_s{i}").cast("double") / F.col("_n")).cast("long")
                for i in range(PQ_SUBDIM)
            ]
        ).alias("c"),
    )


def pq_train(subs: DataFrame, k: int = PQ_K, iters: int = PQ_ITERS):
    """(codes, codebook): unrolled grouped Lloyd's, one static plan."""
    cent = pq_seeds(subs, k)
    for _ in range(iters):
        cent = pq_update(pq_assign(subs, cent))
    return pq_assign(subs, cent), cent


def pq_oracle_ctes(
    qv_sql: str, k: int = PQ_K, iters: int = PQ_ITERS, prefix: str = ""
) -> str:
    """CTE chain mirroring pq_train over ``embeddings``: the caller reads
    ``{prefix}pq_codes`` (vec_id, sub, sq, cid, dist) and ``{prefix}pq_cb``
    (sub, cid, c). ``prefix`` lets one query chain two independent PQ
    trainings (plain vs OPQ-permuted) without CTE-name collisions — the
    default keeps the emitted SQL byte-identical to the single-chain form."""
    p = prefix
    seed_hash = md5_long_sql("'pq:' || CAST(vec_id AS VARCHAR)")
    sub_slices = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS sub, "
        f"list_slice(q, {m * PQ_SUBDIM + 1}, {m * PQ_SUBDIM + PQ_SUBDIM}) AS sq "
        f"FROM {p}pq_emb"
        for m in range(PQ_M)
    )
    d = lambda a, b: sq_dist_sql(a, b, PQ_SUBDIM)  # noqa: E731
    parts = [
        f"{p}pq_emb AS (SELECT vec_id, {qv_sql} AS q FROM embeddings)",
        f"{p}pq_subs AS ({sub_slices})",
        f"""{p}pq_seeds AS (
          SELECT sub, cid, sq AS c FROM (
            SELECT sub, vec_id, sq,
                   row_number() OVER (PARTITION BY sub ORDER BY {seed_hash}, vec_id)
                     AS cid
            FROM {p}pq_subs)
          WHERE cid <= {k})""",
    ]

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, sub, sq, cid, dist FROM (
            SELECT s.vec_id, s.sub, s.sq, c.cid,
                   {d("s.sq", "c.c")} AS dist,
                   row_number() OVER (
                     PARTITION BY s.vec_id, s.sub
                     ORDER BY {d("s.sq", "c.c")}, c.cid) AS rn
            FROM {p}pq_subs s JOIN {cent} c USING (sub))
          WHERE rn = 1)"""

    def update(name: str, assigned: str) -> str:
        return f"""{name} AS (
          SELECT sub, cid, array_agg(cv ORDER BY pos) AS c FROM (
            SELECT sub, cid, pos,
                   CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
            FROM (SELECT a.sub, a.cid, i.pos, a.sq[i.pos] AS v
                  FROM {assigned} a,
                       (SELECT unnest(generate_series(1, {PQ_SUBDIM})) AS pos) i)
            GROUP BY sub, cid, pos)
          GROUP BY sub, cid)"""

    cent = f"{p}pq_seeds"
    for i in range(iters):
        parts.append(assign(f"{p}pa{i}", cent))
        parts.append(update(f"{p}pc{i}", f"{p}pa{i}"))
        cent = f"{p}pc{i}"
    parts.append(assign(f"{p}pq_codes", cent))
    parts.append(f"{p}pq_cb AS (SELECT sub, cid, c FROM {cent})")
    return ",\n".join(parts)


# --- hierarchical (pivot-pruned) assignment for k ∝ n -----------------------
# The e_semdedup_kn decade row (SCALING.md) exposes the flat k∝n
# boundary: Lloyd's assignment is O(n·k) = O(n²/target) once k grows
# with the corpus. The standard fix — what a real SemDeDup deployment
# does — is hierarchical assignment: a small static PIVOT set coarse-
# quantizes the CENTROID table, each vector scores the P pivots first,
# then only the centroids in its nearest live pivot group. Per-vector
# work drops from k to ~P + k/P distances (P ∝ √k at the next decade —
# a config choice, like KN_CAP). Pivots are the top-P adaptive seeds by
# the same hash rank (static across iterations); the centroid→pivot map
# is recomputed per iteration against those fixed pivot vectors (k×P
# bounded). A pivot group can empty out as centroids move, so vectors
# pick their nearest LIVE pivot (semi-join on the groups present — P
# bounded); every surviving centroid belongs to some pivot, so the join
# never drops a vector. Deterministic end-to-end: every argmin is a
# min(struct(dist, id)) / row_number twin of the flat chain.

# P ∝ √k, wired as the DEFAULT (round 11): per-vector assignment work is
# P + k/P distances, minimized at P = √k; with k ∝ n capped at KN_CAP,
# the deployment rule is P = √KN_CAP. The tools/kn_pruned_study.py
# pivot-count sweep (SCALING.md, round 10) measured the optimum AT the
# prescription: P ∈ {4,8,16,32,64} at k = 312 gave a clean U with the
# minimum at P = 16 ≈ √312. isqrt(256) = 16, so the wired default emits
# byte-identical plans to the previous literal (guard-tested).
KN_PIVOTS = math.isqrt(KN_CAP)


def kn_pivots(seeds: DataFrame, p: int = KN_PIVOTS) -> DataFrame:
    """(pid, pc): the top-``p`` adaptive seeds double as the static
    coarse quantizer over the centroid set."""
    return seeds.filter(F.col("cid") <= p).select(
        F.col("cid").alias("pid"), F.col("c").alias("pc")
    )


def _pruned_state(cent: DataFrame, piv: DataFrame) -> DataFrame:
    """ONE bounded broadcastable row describing a pruned assignment pass.

    Columns:
    - ``_cp``: every centroid tagged with its nearest pivot, sorted by
      (pid, cid, c) — the per-pivot centroid groups, flattened;
    - ``_live``: the distinct (pid, pc) pivots whose group is non-empty
      (a moved centroid can empty a group), pid-sorted.

    r15 optimization (guide §1.2 "the distributed algorithm", §3.3 "very
    wide plans make planning the bottleneck"): the old pass derived the
    centroid→pivot argmin TWICE (once for the live-pivot set, once for
    the group attach), so every Lloyd's iteration embedded the previous
    centroid tree twice and the unrolled plan grew EXPONENTIALLY in the
    iteration count (e_semdedup_kn_pruned: 396 parquet-scan nodes,
    14k-line formatted plan; the three-arm regret sweep: 570 scans, 20k
    lines). This helper references ``cent`` exactly ONCE and ``piv``
    exactly once: the nearest-pivot argmin carries the winning pivot's
    vector through the struct (pid is unique, so (dist, pid) still
    decides the winner and ``pc`` never participates in a tie), and the
    live set is recovered in-row from the tagged centroid list instead
    of a second semi-join against a second ``cent`` derivation. Plan
    growth per iteration is now O(1) subtrees.

    Precondition (unchanged from the r14 fold forms): ``cent``/``piv``
    are non-empty — guaranteed by kmeans_kn_seeds (k ≥ 1)."""
    piv_arr = piv.agg(
        F.array_sort(F.collect_list(F.struct("pid", "pc"))).alias("_ps")
    )
    best = F.array_min(
        F.transform(
            F.col("_ps"),
            lambda pr: F.struct(
                sq_dist(pr["pc"], F.col("c")).alias("dist"),
                pr["pid"].alias("pid"),
                pr["pc"].alias("pc"),
            ),
        )
    )
    cp = cent.crossJoin(F.broadcast(piv_arr)).select(
        "cid", "c", best["pid"].alias("pid"), best["pc"].alias("pc")
    )
    tagged = cp.agg(
        F.array_sort(
            F.collect_list(F.struct("pid", "cid", "c", "pc"))
        ).alias("_all")
    )
    return tagged.select(
        F.transform(
            F.col("_all"),
            lambda x: F.struct(
                x["pid"].alias("pid"), x["cid"].alias("cid"), x["c"].alias("c")
            ),
        ).alias("_cp"),
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.col("_all"),
                    lambda x: F.struct(
                        x["pid"].alias("pid"), x["pc"].alias("pc")
                    ),
                )
            )
        ).alias("_live"),
    )


def kmeans_kn_pruned_pass(
    emb: DataFrame, cent: DataFrame, piv: DataFrame
) -> DataFrame:
    """Pivot-pruned nearest-centroid assignment: (vec_id, q, cid, dist).

    Each vector scores the live pivots first (P distances), then only
    the centroids in its nearest live pivot's group (~k/P distances) —
    the same hierarchical argmin as the certified chain, with identical
    (dist, id) tiebreaks at both levels (array_min over id-sorted
    structs ≡ min(struct(dist, id))).

    The whole pass is ONE map-only Project over the corpus against the
    broadcast one-row :func:`_pruned_state`; the vector's pivot id binds
    through an ``explode(array(...))`` Generate barrier so CollapseProject
    cannot re-inline the P-distance argmin into the per-group filter
    predicate (which would re-evaluate it once per centroid — the
    documented Markov/word_ngrams lesson). Every surviving centroid
    belongs to some pivot and the vector's pivot is live by
    construction, so the group filter never yields an empty array."""
    state = _pruned_state(cent, piv)
    vbest = F.array_min(
        F.transform(
            F.col("_live"),
            lambda pr: F.struct(
                sq_dist(pr["pc"], F.col("q")).alias("dist"),
                pr["pid"].alias("pid"),
            ),
        )
    )
    rows = emb.crossJoin(F.broadcast(state)).select(
        "vec_id",
        "q",
        "_cp",
        F.explode(F.array(vbest["pid"])).alias("_pid"),
    )
    best = F.array_min(
        F.transform(
            F.filter(F.col("_cp"), lambda x: x["pid"] == F.col("_pid")),
            lambda x: F.struct(
                sq_dist(x["c"], F.col("q")).alias("dist"), x["cid"].alias("cid")
            ),
        )
    )
    return rows.select(
        "vec_id", "q", best["cid"].alias("cid"), best["dist"].alias("dist")
    )


def kmeans_kn_pruned_dual(
    rows: DataFrame, cent: DataFrame, piv: DataFrame
) -> DataFrame:
    """Exact AND pivot-pruned assignment of ``rows`` in ONE map pass:
    (vec_id, cid_exact, dist_exact, cid_pruned, dist_pruned).

    The regret audits (e_kn_pruned_vs_flat_delta, e_kn_pruned_regret_sweep)
    need both assignments AT THE SAME centroid set. Computing them from the
    same broadcast :func:`_pruned_state` row references the centroid tree
    ONCE (previously: once inside the pruned pass, once more inside a
    separate kmeans_assign, then a vec_id join to align the two — two
    extra copies of the full unrolled Lloyd's tree per audit arm, plus a
    corpus/sample-wide join). Tiebreaks identical to the certified forms:
    exact ≡ min(struct(dist, cid)) over ALL centroids (array order is
    irrelevant to array_min), pruned ≡ the hierarchical argmin of
    :func:`kmeans_kn_pruned_pass`. Per-row regret dist_pruned −
    dist_exact stays ≥ 0 by construction (same candidate set, restricted
    vs full argmin)."""
    state = _pruned_state(cent, piv)
    vbest = F.array_min(
        F.transform(
            F.col("_live"),
            lambda pr: F.struct(
                sq_dist(pr["pc"], F.col("q")).alias("dist"),
                pr["pid"].alias("pid"),
            ),
        )
    )
    out = rows.crossJoin(F.broadcast(state)).select(
        "vec_id",
        "q",
        "_cp",
        F.explode(F.array(vbest["pid"])).alias("_pid"),
    )
    exact = F.array_min(
        F.transform(
            F.col("_cp"),
            lambda x: F.struct(
                sq_dist(x["c"], F.col("q")).alias("dist"), x["cid"].alias("cid")
            ),
        )
    )
    pruned = F.array_min(
        F.transform(
            F.filter(F.col("_cp"), lambda x: x["pid"] == F.col("_pid")),
            lambda x: F.struct(
                sq_dist(x["c"], F.col("q")).alias("dist"), x["cid"].alias("cid")
            ),
        )
    )
    return out.select(
        "vec_id",
        exact["cid"].alias("cid_exact"),
        exact["dist"].alias("dist_exact"),
        pruned["cid"].alias("cid_pruned"),
        pruned["dist"].alias("dist_pruned"),
    )


def kmeans_kn_pruned_audit(
    emb: DataFrame,
    rows: DataFrame,
    iters: int = KM_ITERS,
    target: int = KN_TARGET,
    cap: int = KN_CAP,
    p: int = KN_PIVOTS,
    salt: str = "km:",
) -> DataFrame:
    """Run the pruned fit on ``emb``, then the dual exact/pruned
    assignment of ``rows`` at the final centroids (see
    :func:`kmeans_kn_pruned_dual`)."""
    seeds = kmeans_kn_seeds(emb, target, cap, salt)
    piv = kn_pivots(seeds, p)
    cent = seeds
    for _ in range(iters):
        cent = kmeans_update(kmeans_kn_pruned_pass(emb, cent, piv))
    return kmeans_kn_pruned_dual(rows, cent, piv)


def kmeans_kn_pruned_fit(
    emb: DataFrame,
    iters: int = KM_ITERS,
    target: int = KN_TARGET,
    cap: int = KN_CAP,
    p: int = KN_PIVOTS,
    salt: str = "km:",
):
    """Adaptive-k Lloyd's with hierarchical assignment:
    ``(centroids, assignment)``. Updates are :func:`kmeans_update`
    verbatim — only the assignment pass is pruned. The default ``p``
    follows the P = √k prescription (P + k/P distances per vector is
    minimized at √k), which the round-10 pivot-count sweep
    (tools/kn_pruned_study.py --pivots, SCALING.md) measured as the
    actual optimum: P = 16 won the {4,8,16,32,64} grid at k = 312."""
    seeds = kmeans_kn_seeds(emb, target, cap, salt)
    piv = kn_pivots(seeds, p)
    cent = seeds
    for _ in range(iters):
        cent = kmeans_update(kmeans_kn_pruned_pass(emb, cent, piv))
    return cent, kmeans_kn_pruned_pass(emb, cent, piv)


def kmeans_kn_pruned_oracle_ctes(
    qv_sql: str,
    iters: int = KM_ITERS,
    target: int = KN_TARGET,
    cap: int = KN_CAP,
    p: int = KN_PIVOTS,
    salt: str = "km:",
    prefix: str = "",
) -> str:
    """CTE chain mirroring kmeans_kn_pruned_fit. The caller SELECTs from
    ``{prefix}a{iters}``; seed/kn CTEs match kmeans_kn_oracle_ctes."""
    pre = prefix
    seed_hash = md5_long_sql(f"'{salt}' || CAST(vec_id AS VARCHAR)")
    parts = [
        f"{pre}emb AS (SELECT vec_id, {qv_sql} AS q FROM embeddings)",
        f"""{pre}kn AS (
          SELECT GREATEST(1, LEAST({cap}, count(*) // {target})) AS kk
          FROM {pre}emb)""",
        f"""{pre}seeds0 AS (
          SELECT cid, c FROM (
            SELECT row_number() OVER (ORDER BY h, vec_id) AS cid, q AS c
            FROM (SELECT vec_id, q, {seed_hash} AS h FROM {pre}emb
                  ORDER BY h, vec_id LIMIT {cap}))
          WHERE cid <= (SELECT kk FROM {pre}kn))""",
        f"""{pre}piv AS (
          SELECT cid AS pid, c AS pc FROM {pre}seeds0 WHERE cid <= {p})""",
    ]

    def cp(name: str, cent: str) -> str:
        return f"""{name} AS (
          SELECT cid, c, pid FROM (
            SELECT s.cid, s.c, p.pid,
                   row_number() OVER (
                     PARTITION BY s.cid
                     ORDER BY {sq_dist_sql("s.c", "p.pc")}, p.pid) AS rn
            FROM {cent} s CROSS JOIN {pre}piv p)
          WHERE rn = 1)"""

    def vp(name: str, cpname: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, q, pid FROM (
            SELECT e.vec_id, e.q, p.pid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {sq_dist_sql("e.q", "p.pc")}, p.pid) AS rn
            FROM {pre}emb e CROSS JOIN
                 (SELECT * FROM {pre}piv
                  WHERE pid IN (SELECT DISTINCT pid FROM {cpname})) p)
          WHERE rn = 1)"""

    def assign(name: str, vpname: str, cpname: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, q, cid, dist FROM (
            SELECT v.vec_id, v.q, c.cid,
                   {sq_dist_sql("v.q", "c.c")} AS dist,
                   row_number() OVER (
                     PARTITION BY v.vec_id
                     ORDER BY {sq_dist_sql("v.q", "c.c")}, c.cid) AS rn
            FROM {vpname} v JOIN {cpname} c USING (pid))
          WHERE rn = 1)"""

    def update(name: str, assigned: str) -> str:
        return f"""{name} AS (
          SELECT cid, array_agg(cv ORDER BY pos) AS c FROM (
            SELECT cid, pos,
                   CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
            FROM (SELECT a.cid, i.pos, a.q[i.pos] AS v
                  FROM {assigned} a,
                       (SELECT unnest(generate_series(1, {DIMS})) AS pos) i)
            GROUP BY cid, pos)
          GROUP BY cid)"""

    cent = f"{pre}seeds0"
    for i in range(iters):
        parts.append(cp(f"{pre}cp{i}", cent))
        parts.append(vp(f"{pre}vp{i}", f"{pre}cp{i}"))
        parts.append(assign(f"{pre}a{i}", f"{pre}vp{i}", f"{pre}cp{i}"))
        parts.append(update(f"{pre}c{i}", f"{pre}a{i}"))
        cent = f"{pre}c{i}"
    parts.append(cp(f"{pre}cp{iters}", cent))
    parts.append(vp(f"{pre}vp{iters}", f"{pre}cp{iters}"))
    parts.append(assign(f"{pre}a{iters}", f"{pre}vp{iters}", f"{pre}cp{iters}"))
    return ",\n".join(parts)
