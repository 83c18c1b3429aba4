"""Similarity search over the ``embeddings`` table (array<float> column).

* brute-force cosine top-k — the exactness baseline: query set × corpus
  cross join, dot products via ``zip_with`` + ``aggregate`` (JVM-side,
  whole-stage-codegen; no Python). Cross-engine exactness: both Spark and
  the DuckDB oracle fold the products sequentially in double, giving
  bit-identical sums (verified), so scores compare exactly after round(6).
* LSH-bucketed ANN — the scale path: 8 deterministic ±1 hyperplanes
  (derived from the portable md5 hash, so both engines use the SAME
  planes), sign-bit bucket, candidates = same bucket, exact cosine
  re-rank. Sub-linear candidate generation; recall < 1 by construction.

Scale notes: brute force is O(|Q|·N) — fine for small query batches, not
for all-pairs; LSH buckets turn the quadratic join into a hash join on
bucket id. At 10^12 rows one would add multi-probe + IVF sharding; the
bucket join + re-rank skeleton is the same.
"""

from __future__ import annotations

from hashlib import md5 as _md5

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 8
DIM = 64


def _py_phash32(key: str) -> int:
    return int(_md5(key.encode()).hexdigest()[:8], 16)


def lsh_planes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplanes shared by Spark and the oracle."""
    return [
        [1 if _py_phash32(f"pl|{p}|{i}") % 2 == 1 else -1 for i in range(dim)]
        for p in range(n_planes)
    ]


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def with_norm(emb: DataFrame) -> DataFrame:
    return emb.withColumn("norm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))


def ann_bruteforce(emb: DataFrame, k: int = 5, query_mod: int = 25) -> DataFrame:
    """→ (q_id, vec_id, cos, rnk): exact top-k cosine neighbors per query."""
    e = with_norm(emb)
    q = e.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"))
    pairs = q.crossJoin(e.select("vec_id", "embedding", "norm")) \
        .where(F.col("vec_id") != F.col("q_id"))
    cos = F.round(_dot(F.col("qv"), F.col("embedding"))
                  / (F.col("qn") * F.col("norm")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        pairs.withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos", "rnk")
    )


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """→ (vec_id, bucket): sign-bit bucket over the deterministic planes."""
    planes = lsh_planes()
    bucket = F.lit(0).cast("long")
    for p, w in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in w])
        d = _dot(F.col("embedding"), lit)
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return emb.select("vec_id", bucket.alias("bucket"))


def ann_lsh(emb: DataFrame, k: int = 5, query_mod: int = 25) -> DataFrame:
    """LSH candidates (same bucket) → exact cosine re-rank → top-k."""
    e = with_norm(emb)
    bk = lsh_buckets(emb)
    e = e.join(bk, "vec_id")
    q = e.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"), F.col("bucket"))
    cand = q.join(e.select("vec_id", "embedding", "norm", "bucket"), "bucket") \
        .where(F.col("vec_id") != F.col("q_id"))
    cos = F.round(_dot(F.col("qv"), F.col("embedding"))
                  / (F.col("qn") * F.col("norm")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        cand.withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos", "rnk")
    )


def embedding_near_dup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (a < b)."""
    e = with_norm(emb).join(lsh_buckets(emb), "vec_id")
    l = e.select(F.col("bucket"), F.col("vec_id").alias("a"),
                 F.col("embedding").alias("va"), F.col("norm").alias("na"))
    r = e.select(F.col("bucket"), F.col("vec_id").alias("b"),
                 F.col("embedding").alias("vb"), F.col("norm").alias("nb"))
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        l.join(r, "bucket").where(F.col("a") < F.col("b"))
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
        .distinct()
    )


# ---------------------------------------------------------------- SQL (oracle)

_DOT = ("list_dot_product(CAST({x} AS DOUBLE[]), CAST({y} AS DOUBLE[]))")


def _norm_cte() -> str:
    d = _DOT.format(x="embedding", y="embedding")
    return f"en AS (SELECT vec_id, embedding, sqrt({d}) AS norm FROM embeddings)"


def ann_bruteforce_sql(k: int = 5, query_mod: int = 25) -> str:
    d = _DOT.format(x="q.embedding", y="e.embedding")
    return f"""
WITH {_norm_cte()},
qs AS (SELECT * FROM en WHERE vec_id % {query_mod} = 0),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id,
         round({d} / (q.norm * e.norm), 6) AS cos
  FROM qs q CROSS JOIN en e WHERE e.vec_id <> q.vec_id),
rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
       FROM scored)
SELECT q_id, vec_id, cos, rnk FROM rk WHERE rnk <= {k}
"""


def _buckets_cte() -> str:
    planes = lsh_planes()
    terms = []
    for p, w in enumerate(planes):
        arr = "[" + ", ".join(f"{float(x):.1f}" for x in w) + "]"
        d = _DOT.format(x="embedding", y=arr)
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << p} ELSE 0 END)")
    return ("eb AS (SELECT vec_id, CAST(" + " + ".join(terms)
            + " AS BIGINT) AS bucket FROM embeddings)")


def lsh_buckets_sql() -> str:
    return f"WITH {_buckets_cte()} SELECT vec_id, bucket FROM eb"


def ann_lsh_sql(k: int = 5, query_mod: int = 25) -> str:
    d = _DOT.format(x="q.embedding", y="e.embedding")
    return f"""
WITH {_norm_cte()}, {_buckets_cte()},
enb AS (SELECT en.*, eb.bucket FROM en JOIN eb USING (vec_id)),
qs AS (SELECT * FROM enb WHERE vec_id % {query_mod} = 0),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id,
         round({d} / (q.norm * e.norm), 6) AS cos
  FROM qs q JOIN enb e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id),
rk AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
       FROM scored)
SELECT q_id, vec_id, cos, rnk FROM rk WHERE rnk <= {k}
"""


def embedding_near_dup_sql(threshold: float = 0.95) -> str:
    d = _DOT.format(x="a.embedding", y="b.embedding")
    return f"""
WITH {_norm_cte()}, {_buckets_cte()},
enb AS (SELECT en.*, eb.bucket FROM en JOIN eb USING (vec_id))
SELECT DISTINCT a.vec_id AS a, b.vec_id AS b,
       round({d} / (a.norm * b.norm), 6) AS cos
FROM enb a JOIN enb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({d} / (a.norm * b.norm), 6) >= {threshold}
"""
