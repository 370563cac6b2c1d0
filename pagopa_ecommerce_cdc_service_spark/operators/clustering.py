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


def sq_dist_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {DIMS}), "
        f"i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i]))) AS BIGINT)"
    )


def kmeans_seeds(emb: DataFrame, k: int = KM_K) -> DataFrame:
    """k seed centroids: vectors ranked by (md5_long('km:'||id), id).

    ``orderBy().limit()`` compiles to TakeOrderedAndProject (no global
    sort); the row_number window then ranks only k rows.
    """
    hashed = emb.select(
        "vec_id",
        "q",
        md5_long(F.concat(F.lit("km:"), F.col("vec_id").cast("string"))).alias("h"),
    )
    top = hashed.orderBy("h", "vec_id").limit(k)
    w = Window.orderBy("h", "vec_id")
    return top.select(F.row_number().over(w).alias("cid"), F.col("q").alias("c"))


def kmeans_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, q, cid, dist).

    Broadcast the centroids; the argmin is min(struct(dist, cid)) — partial
    aggregation collapses the k candidate rows per vector map-side, and the
    broadcast join preserves emb's partitioning so the groupBy needs no
    exchange when emb is already hash-partitioned by vec_id.
    """
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "q",
        F.struct(sq_dist(F.col("q"), F.col("c")).alias("dist"), F.col("cid").alias("cid")).alias("sc"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min("sc").alias("m"), F.first("q").alias("q")
    )
    return best.select(
        "vec_id", "q", F.col("m.cid").alias("cid"), F.col("m.dist").alias("dist")
    )


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """Recompute centroids: per-(cluster, dim) exact floor-mean, re-packed
    into ordered arrays. Shuffles only the k·dims grid (map-side combined)."""
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


def kmeans_plan(emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS) -> DataFrame:
    """Full unrolled k-means: returns the final assignment (vec_id, cid,
    dist) after ``iters`` centroid updates. ``emb`` must have (vec_id, q)
    and SHOULD be hash-partitioned by vec_id (see module docstring)."""
    cent = kmeans_seeds(emb, k)
    for _ in range(iters):
        cent = kmeans_update(kmeans_assign(emb, cent))
    return kmeans_assign(emb, cent)


# --- unrolled-CTE oracle ----------------------------------------------------


def kmeans_oracle_ctes(qv_sql: str, k: int = KM_K, iters: int = KM_ITERS) -> str:
    """CTE chain mirroring kmeans_plan: emb → seeds → (a_i → c_i)* → a_final.

    The caller SELECTs from ``a{iters}`` (final assignment: vec_id, cid,
    dist). ``qv_sql`` is the quantized-vector expression over ``embeddings``.
    """
    seed_hash = md5_long_sql("'km:' || CAST(vec_id AS VARCHAR)")
    parts = [
        f"emb AS (SELECT vec_id, {qv_sql} AS q FROM embeddings)",
        f"""seeds0 AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) AS cid, q AS c
          FROM (SELECT vec_id, q, {seed_hash} AS h FROM emb
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
            FROM emb e CROSS JOIN {cent} s)
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

    cent = "seeds0"
    for i in range(iters):
        parts.append(assign(f"a{i}", cent))
        parts.append(update(f"c{i}", f"a{i}"))
        cent = f"c{i}"
    parts.append(assign(f"a{iters}", cent))
    return ",\n".join(parts)
