"""SDValidate + DomRanValidate scorers (SURVEY §2 A2-A4, F7, F9-F10).

Faithful Spark re-expression of /root/reference/sdvalidate.py:

* ``ot_dist``/``st_dist`` — per-relation object/subject type distributions,
  normalized by the GLOBAL fact count (sdvalidate.py:122-138: ``count`` is
  summed over all relations, so every relation's vector shares one scale).
* SDValidate score(s,p,o) = cosine(boolean type-vector of o, ot_dist[p])
  (sdvalidate.py:152-158). For a boolean vector this collapses to
  ``sum(dist[p][t] for t in types(o)) / (sqrt(|types(o)|) * ||dist[p]||)``
  — a join + aggregate, no dense vectors needed.
* rpf p(r|o) (sdvalidate.py:107-120) = facts(o, r) / facts(o).
* DomRanValidate (sdvalidate.py:10-55): induce domain/range = least
  populous type covering > conf · |distinct subjects|; score =
  min(domain_side, range_side) with side = prob if the entity carries the
  induced type else 1-prob; 1.0 when no type was induced.

All-entities-typed note: every entity here carries a ``kind:*`` type, so
the reference's add-thing-if-absent padding (sdvalidate.py:86-89) is a
no-op and is not implemented.

Scale notes: distributions group by (p, t) — p is only 4-hot but t fans
out, so the shuffle key (p, t) distributes; scoring is
triples ⋈ types(o) ⋈ broadcast(dist) — one shuffle join on o=e plus
broadcast of the small per-relation tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.typesys import kg_ctes


def ot_dist(triples: DataFrame, types: DataFrame, side: str = "o") -> DataFrame:
    """Per-relation type distribution over subjects/objects → (p, t, dist)."""
    total = triples.agg(F.count("*").alias("_tot"))
    return (
        triples.join(types, triples[side] == types.e)
        .groupBy("p", "t")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .select("p", "t", (F.col("cnt") / F.col("_tot")).alias("dist"))
    )


def sdvalidate_scores(triples: DataFrame, types: DataFrame) -> DataFrame:
    """→ (s, p, o, score): cosine(type-vec(o), ot_dist[p]). Low = suspect.

    Facts whose object has NO type row score 0.0 (cosine with the empty
    vector) instead of silently dropping out — the analog of the
    reference's pad-untyped-entities-with-thing step
    (sdvalidate.py:86-89). A no-op on fully-typed graphs (every entity
    carries a kind:* type); load-bearing in the type-incompleteness
    repair regime (correct.inject_type_errors).
    """
    dist = ot_dist(triples, types, "o")
    norms = dist.groupBy("p").agg(F.sqrt(F.sum(F.col("dist") * F.col("dist"))).alias("norm"))
    o_types = types.select(F.col("e").alias("o"), "t")
    return (
        triples.join(o_types, "o", "left")
        .join(F.broadcast(dist), ["p", "t"], "left")
        .groupBy("s", "p", "o")
        .agg(
            F.sum(F.coalesce(F.col("dist"), F.lit(0.0))).alias("dot"),
            F.count("t").alias("nt"),
        )
        .join(F.broadcast(norms), "p")
        .select(
            "s", "p", "o",
            F.when(F.col("nt") == 0, F.lit(0.0))
            .otherwise(F.col("dot") / (F.sqrt(F.col("nt")) * F.col("norm")))
            .alias("score"),
        )
    )


def rpf(triples: DataFrame) -> DataFrame:
    """Relation predictability p(r|o) → (o, p, rpf). sdvalidate.py:107-120."""
    by_op = triples.groupBy("o", "p").agg(F.count("*").alias("c_op"))
    by_o = triples.groupBy("o").agg(F.count("*").alias("c_o"))
    return by_op.join(by_o, "o").select(
        "o", "p", (F.col("c_op") / F.col("c_o")).alias("rpf")
    )


def domran_model(triples: DataFrame, types: DataFrame, conf: float = 0.95,
                 side: str = "s") -> DataFrame:
    """Induced domain (side='s') or range (side='o') per relation.

    → (p, t, prob): least-populous type covering > conf·|distinct side
    entities| of p; prob = coverage ratio. sdvalidate.py:24-43.
    """
    ents = triples.select("p", F.col(side).alias("e")).distinct()
    n_side = ents.groupBy("p").agg(F.count("*").alias("n_e"))
    cover = ents.join(types, "e").groupBy("p", "t").agg(F.count("*").alias("cov"))
    pop = types.groupBy("t").agg(F.count("*").alias("pop"))
    cand = (
        cover.join(n_side, "p")
        .where(F.col("cov") > F.lit(conf) * F.col("n_e"))
        .join(F.broadcast(pop), "t")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("p").orderBy("pop", "t")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("p", "t", (F.col("cov") / F.col("n_e")).alias("prob"))
    )


def domran_scores(triples: DataFrame, types: DataFrame, conf: float = 0.95) -> DataFrame:
    """→ (s, p, o, score) = min(domain_side, range_side). sdvalidate.py:45-52."""
    dom = domran_model(triples, types, conf, "s").withColumnRenamed("t", "dom_t") \
        .withColumnRenamed("prob", "dom_prob")
    ran = domran_model(triples, types, conf, "o").withColumnRenamed("t", "ran_t") \
        .withColumnRenamed("prob", "ran_prob")

    s_types = types.groupBy("e").agg(F.collect_set("t").alias("s_ts")) \
        .withColumnRenamed("e", "s")
    o_types = types.groupBy("e").agg(F.collect_set("t").alias("o_ts")) \
        .withColumnRenamed("e", "o")

    df = (
        triples.join(F.broadcast(dom), "p", "left")
        .join(F.broadcast(ran), "p", "left")
        .join(s_types, "s")
        .join(o_types, "o")
    )
    dside = F.when(F.col("dom_t").isNull(), F.lit(1.0)).otherwise(
        F.when(F.array_contains("s_ts", F.col("dom_t")), F.col("dom_prob"))
        .otherwise(1.0 - F.col("dom_prob"))
    )
    rside = F.when(F.col("ran_t").isNull(), F.lit(1.0)).otherwise(
        F.when(F.array_contains("o_ts", F.col("ran_t")), F.col("ran_prob"))
        .otherwise(1.0 - F.col("ran_prob"))
    )
    return df.select("s", "p", "o", F.least(dside, rside).alias("score"))


# ---------------------------------------------------------------- SQL (oracle)


def sdvalidate_ctes(facts_rel: str = "enc", round_to: int = 6) -> str:
    """CTE chain defining ``sdv(s, p, o, score)`` over a facts relation.

    Expects the ``ty`` CTE (kg_ctes) to be in scope.
    """
    return f"""
tot AS (SELECT count(*) AS n FROM {facts_rel}),
dist AS (
  SELECT f.p, ty.t, count(*) * 1.0 / (SELECT n FROM tot) AS dist
  FROM {facts_rel} f JOIN ty ON ty.e = f.o GROUP BY f.p, ty.t),
norms AS (SELECT p, sqrt(sum(dist * dist)) AS nrm FROM dist GROUP BY p),
agg AS (
  SELECT f.s, f.p, f.o,
         sum(coalesce(dist.dist, 0)) AS dot, count(ty.t) AS nt
  FROM {facts_rel} f LEFT JOIN ty ON ty.e = f.o
  LEFT JOIN dist ON dist.p = f.p AND dist.t = ty.t
  GROUP BY f.s, f.p, f.o),
sdv AS (
  SELECT agg.s, agg.p, agg.o,
         CASE WHEN agg.nt = 0 THEN 0.0
              ELSE round(agg.dot / (sqrt(agg.nt) * norms.nrm), {round_to})
         END AS score
  FROM agg JOIN norms ON norms.p = agg.p)
"""


def sdvalidate_sql(triples_cte: str, round_to: int = 6) -> str:
    return (f"WITH {kg_ctes(triples_cte)}, {sdvalidate_ctes('enc', round_to)} "
            "SELECT * FROM sdv")


def rpf_sql(triples_cte: str, round_to: int = 6) -> str:
    return f"""
WITH {kg_ctes(triples_cte)},
by_op AS (SELECT o, p, count(*) AS c_op FROM enc GROUP BY o, p),
by_o AS (SELECT o, count(*) AS c_o FROM enc GROUP BY o)
SELECT by_op.o, by_op.p, round(c_op * 1.0 / c_o, {round_to}) AS rpf
FROM by_op JOIN by_o ON by_o.o = by_op.o
"""


def _domran_model_sql(side: str, conf: float) -> str:
    return f"""
  SELECT p, t, cov * 1.0 / n_e AS prob FROM (
    SELECT c.p, c.t, c.cov, n.n_e,
           row_number() OVER (PARTITION BY c.p ORDER BY pop.pop, c.t) AS rn
    FROM (SELECT p, t, count(*) AS cov FROM
            (SELECT DISTINCT p, {side} AS e FROM enc) se JOIN ty ON ty.e = se.e
          GROUP BY p, t) c
    JOIN (SELECT p, count(*) AS n_e FROM (SELECT DISTINCT p, {side} AS e FROM enc) x
          GROUP BY p) n ON n.p = c.p
    JOIN (SELECT t, count(*) AS pop FROM ty GROUP BY t) pop ON pop.t = c.t
    WHERE c.cov > {conf} * n.n_e) z WHERE rn = 1
"""


def domran_scores_sql(triples_cte: str, conf: float = 0.95, round_to: int = 6) -> str:
    return f"""
WITH {kg_ctes(triples_cte)},
dom AS ({_domran_model_sql('s', conf)}),
ran AS ({_domran_model_sql('o', conf)})
SELECT enc.s, enc.p, enc.o,
  round(least(
    CASE WHEN dom.t IS NULL THEN 1.0
         WHEN EXISTS (SELECT 1 FROM ty WHERE ty.e = enc.s AND ty.t = dom.t)
         THEN dom.prob ELSE 1.0 - dom.prob END,
    CASE WHEN ran.t IS NULL THEN 1.0
         WHEN EXISTS (SELECT 1 FROM ty WHERE ty.e = enc.o AND ty.t = ran.t)
         THEN ran.prob ELSE 1.0 - ran.prob END), {round_to}) AS score
FROM enc LEFT JOIN dom ON dom.p = enc.p LEFT JOIN ran ON ran.p = enc.p
"""
