"""Deterministic error injection (SURVEY §2 R4, U6-U7).

Reference analog: /root/reference/generate_errors.py:15-87 — sample a
fraction of true triples, corrupt subject or object with (kind 1) a random
entity or (kind 2) an entity of identical type signature, rejecting
replacements that collide with existing triples.

The reference draws from unseeded ``random``; we need reproducibility AND
partition invariance, so every choice is a pure function of the triple via
the portable md5 hash (kgspark.hashing):

* selection: uniform(s,p,o) < p_error
* side: hash(s,p,o) mod 2  (0 → corrupt s, 1 → corrupt o)
* replacement: bounded retry — attempts a = 0..MAX_ATTEMPTS-1 propose
  candidate hash(s,p,o,a) mod pool; the first attempt whose corrupted
  triple is absent from the graph (left_anti) and differs from the original
  wins (reference's ``while True`` rejection loop, bounded + set-based).

Everything is exactly reproducible in DuckDB → full oracle coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.hashing import pick_mod, puniform, sql_phash32, sql_puniform
from kgspark.typesys import kg_ctes

MAX_ATTEMPTS = 8


def _finish(cand: DataFrame, triples: DataFrame) -> DataFrame:
    """Pick the first valid attempt per original triple; dedupe collisions."""
    new_s = F.when(F.col("side") == 0, F.col("cand")).otherwise(F.col("s"))
    new_o = F.when(F.col("side") == 1, F.col("cand")).otherwise(F.col("o"))
    cand = cand.select(
        F.col("s").alias("orig_s"), "p", F.col("o").alias("orig_o"),
        new_s.alias("s2"), new_o.alias("o2"), "a",
    ).where((F.col("s2") != F.col("orig_s")) | (F.col("o2") != F.col("orig_o")))
    # reject corrupted triples that already exist in the graph
    cand = cand.join(
        triples.select(F.col("s").alias("s2"), "p", F.col("o").alias("o2")),
        ["s2", "p", "o2"], "left_anti",
    )
    best = cand.groupBy("orig_s", "p", "orig_o").agg(F.min("a").alias("a"))
    picked = cand.join(best, ["orig_s", "p", "orig_o", "a"])
    # two originals may collide on the same corrupted triple → keep min origin
    from pyspark.sql.window import Window

    w = Window.partitionBy("s2", "p", "o2").orderBy("orig_s", "orig_o")
    return (
        picked.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("s2").alias("s"), "p", F.col("o2").alias("o"),
            "orig_s", "orig_o",
        )
    )


def inject_errors_kind1(triples: DataFrame, n_entities: int,
                        p_error: float = 0.05) -> DataFrame:
    """Kind-1 corruption: random replacement entity (ids are 1..n_entities)."""
    sel = triples.where(puniform(["s", "p", "o"], "errsel") < p_error)
    sel = sel.withColumn("side", pick_mod(["s", "p", "o"], 2, "errside"))
    cand = sel.withColumn("a", F.explode(F.sequence(F.lit(0), F.lit(MAX_ATTEMPTS - 1))))
    cand = cand.withColumn(
        "cand", pick_mod(["s", "p", "o", "a"], n_entities, "errrepl") + 1
    )
    return _finish(cand, triples)


def inject_errors_kind2(triples: DataFrame, types: DataFrame,
                        p_error: float = 0.05) -> DataFrame:
    """Kind-2: replacement shares the exact type signature of the original.

    Type-signature blocking = groupBy sorted type-set (reference J10,
    /root/reference/generate_errors.py:36-42). Groups of size 1 yield no
    candidate and the triple is skipped (the reference resamples instead).

    The group pick is join-based: members are numbered per signature with
    the range-partitioned grouped ordinal (no per-signature window, no
    per-row replicated member array — the biggest signature group is
    O(entities) at scale) and the hash-picked index joins on
    (sig, index). Same determinism as indexing a sorted member array.
    """
    from kgspark.ordering import grouped_ordinal

    sig = types.groupBy("e").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("t"))).alias("sig")
    )
    gsz = sig.groupBy("sig").agg(F.count("*").alias("gsz"))
    members = grouped_ordinal(sig, ["sig"], ["e"], out="_midx")
    pool = sig.join(gsz, "sig")

    sel = triples.where(puniform(["s", "p", "o"], "errsel") < p_error)
    sel = sel.withColumn("side", pick_mod(["s", "p", "o"], 2, "errside"))
    tgt = F.when(F.col("side") == 0, F.col("s")).otherwise(F.col("o"))
    sel = sel.withColumn("_tgt", tgt).join(
        pool.withColumnRenamed("e", "_tgt"), "_tgt"
    ).where(F.col("gsz") > 1)

    cand = sel.withColumn("a", F.explode(F.sequence(F.lit(0), F.lit(MAX_ATTEMPTS - 1))))
    idx = pick_mod(["s", "p", "o", "a"], F.col("gsz"), "errrepl2") + 1
    cand = cand.withColumn("_midx", idx.cast("long")).join(
        members.select("sig", "_midx", F.col("e").alias("cand")),
        ["sig", "_midx"],
    )
    return _finish(cand.drop("sig", "_midx", "gsz", "_tgt"), triples)


def inject_errors_kind3(triples: DataFrame, entities: DataFrame,
                        p_error: float = 0.05, max_dist: int = 2,
                        n_entities: int | None = None) -> DataFrame:
    """Kind-3: typo-CONFUSION corruption — replace the object with a
    name-similar entity (Damerau-Levenshtein ≤ max_dist via SymSpell
    delete-variant blocking, the same candidate machinery the correction
    loop searches). This is the realistic DBpedia error class the
    reference's ASM repair targets ("confusions normally occur on the
    object", /root/reference/correct_errors.py:99): unlike kind-1's
    random entities, a confused object is *recoverable* — the true object
    is inside the corrupted object's name-similarity candidate set.

    Only triples whose object HAS a name-similar partner are eligible;
    picks are hash-indexed into the partner list ordered by (dist, id)
    via the grouped ordinal (join-based, no member arrays); collisions
    with existing triples rejected through the bounded-attempt machinery.
    """
    from kgspark.correct import name_candidates
    from kgspark.ordering import grouped_ordinal

    cands = name_candidates(entities, max_dist, n_entities=n_entities)
    gsz = cands.groupBy("a").agg(F.count("*").alias("gsz"))
    members = grouped_ordinal(cands, ["a"], ["dist", "b"], out="_midx")

    sel = triples.where(puniform(["s", "p", "o"], "errsel3") < p_error)
    sel = sel.join(gsz.withColumnRenamed("a", "o"), "o")
    cand = sel.withColumn("a", F.explode(F.sequence(F.lit(0), F.lit(MAX_ATTEMPTS - 1))))
    idx = pick_mod(["s", "p", "o", "a"], F.col("gsz"), "errrepl3") + 1
    cand = cand.withColumn("_midx", idx.cast("long")).join(
        members.select(F.col("a").alias("o"), "_midx",
                       F.col("b").alias("cand")),
        ["o", "_midx"],
    ).withColumn("side", F.lit(1))
    return _finish(cand.drop("_midx", "gsz"), triples)


# ---------------------------------------------------------------- SQL (oracle)


def _finish_ctes(cand_cte: str) -> str:
    """CTE chain turning a (s,p,o,side,a,cnd) candidate CTE into ``errfin``."""
    return f"""
ecand0 AS ({cand_cte}),
ecand AS (
  SELECT s AS orig_s, p, o AS orig_o,
         CASE WHEN side = 0 THEN cnd ELSE s END AS s2,
         CASE WHEN side = 1 THEN cnd ELSE o END AS o2, a
  FROM ecand0),
valid AS (
  SELECT * FROM ecand
  WHERE (s2 <> orig_s OR o2 <> orig_o)
    AND NOT EXISTS (SELECT 1 FROM enc WHERE enc.s = ecand.s2 AND enc.p = ecand.p AND enc.o = ecand.o2)),
best AS (
  SELECT orig_s, p, orig_o, min(a) AS a FROM valid GROUP BY orig_s, p, orig_o),
picked AS (
  SELECT v.* FROM valid v JOIN best USING (orig_s, p, orig_o, a)),
dedup AS (
  SELECT *, row_number() OVER (PARTITION BY s2, p, o2 ORDER BY orig_s, orig_o) AS rn
  FROM picked),
errfin AS (SELECT s2 AS s, p, o2 AS o, orig_s, orig_o FROM dedup WHERE rn = 1)
"""


def errors_kind1_ctes(p_error: float = 0.05) -> str:
    """CTE chain (appended after kg_ctes) defining ``errfin`` for kind 1."""
    key_sel = "concat_ws('|', 'errsel', CAST(s AS VARCHAR), CAST(p AS VARCHAR), CAST(o AS VARCHAR))"
    key_side = key_sel.replace("'errsel'", "'errside'")
    key_rep = ("concat_ws('|', 'errrepl', CAST(s AS VARCHAR), CAST(p AS VARCHAR), "
               "CAST(o AS VARCHAR), CAST(a AS VARCHAR))")
    return f"""
ne AS (SELECT count(*) AS n FROM ent),
sel AS (
  SELECT s, p, o, {sql_phash32(key_side, 'duckdb')} % 2 AS side
  FROM enc WHERE {sql_puniform(key_sel, 'duckdb')} < {p_error}),
att AS (
  SELECT sel.*, a FROM sel, (SELECT unnest(generate_series(0, {MAX_ATTEMPTS - 1})) AS a) ats),
c AS (
  SELECT s, p, o, side, a,
         ({sql_phash32(key_rep, 'duckdb')} % (SELECT n FROM ne)) + 1 AS cnd
  FROM att),
{_finish_ctes("SELECT * FROM c")}
"""


def errors_kind2_ctes(p_error: float = 0.05) -> str:
    """CTE chain (appended after kg_ctes) defining ``errfin`` for kind 2."""
    key_sel = "concat_ws('|', 'errsel', CAST(s AS VARCHAR), CAST(p AS VARCHAR), CAST(o AS VARCHAR))"
    key_side = key_sel.replace("'errsel'", "'errside'")
    key_rep = ("concat_ws('|', 'errrepl2', CAST(s AS VARCHAR), CAST(p AS VARCHAR), "
               "CAST(o AS VARCHAR), CAST(a AS VARCHAR))")
    return f"""
esig AS (
  SELECT e, string_agg(CAST(t AS VARCHAR), ',' ORDER BY t) AS sg
  FROM (SELECT DISTINCT e, t FROM ty) GROUP BY e),
egrp AS (
  SELECT sg, list_sort(list(e)) AS members, count(*) AS gsz FROM esig GROUP BY sg),
pool AS (SELECT esig.e, egrp.members, egrp.gsz FROM esig JOIN egrp USING (sg)),
sel0 AS (
  SELECT s, p, o, {sql_phash32(key_side, 'duckdb')} % 2 AS side
  FROM enc WHERE {sql_puniform(key_sel, 'duckdb')} < {p_error}),
sel AS (
  SELECT sel0.*, pool.members, pool.gsz
  FROM sel0 JOIN pool ON pool.e = CASE WHEN side = 0 THEN sel0.s ELSE sel0.o END
  WHERE pool.gsz > 1),
att AS (
  SELECT sel.*, a FROM sel, (SELECT unnest(generate_series(0, {MAX_ATTEMPTS - 1})) AS a) ats),
c AS (
  SELECT s, p, o, side, a,
         members[CAST(({sql_phash32(key_rep, 'duckdb')} % gsz) + 1 AS INT)] AS cnd
  FROM att),
{_finish_ctes("SELECT s, p, o, side, a, cnd FROM c")}
"""


def errors_kind3_ctes(p_error: float = 0.05, max_dist: int = 2,
                      with_cands: bool = True) -> str:
    """CTE chain (after kg_ctes) defining ``errfin`` for kind 3.

    ``with_cands=False`` skips the shared name-candidate CTEs when the
    composed query already defines them (the correction oracle does)."""
    from kgspark.correct import name_candidates_ctes

    key_sel = ("concat_ws('|', 'errsel3', CAST(s AS VARCHAR), "
               "CAST(p AS VARCHAR), CAST(o AS VARCHAR))")
    key_rep = ("concat_ws('|', 'errrepl3', CAST(s AS VARCHAR), "
               "CAST(p AS VARCHAR), CAST(o AS VARCHAR), CAST(a AS VARCHAR))")
    cands = f"{name_candidates_ctes(max_dist)}," if with_cands else ""
    return f"""
{cands}
k3g AS (SELECT a, count(*) AS gsz FROM cpairs2 GROUP BY a),
k3m AS (SELECT a AS ka, b, row_number() OVER (PARTITION BY a ORDER BY dist, b) AS midx
        FROM cpairs2),
sel3 AS (
  SELECT enc.s, enc.p, enc.o, k3g.gsz FROM enc JOIN k3g ON k3g.a = enc.o
  WHERE {sql_puniform(key_sel, 'duckdb')} < {p_error}),
att3 AS (
  SELECT sel3.*, a FROM sel3,
    (SELECT unnest(generate_series(0, {MAX_ATTEMPTS - 1})) AS a) ats3),
c3 AS (
  SELECT att3.s, att3.p, att3.o, 1 AS side, att3.a, k3m.b AS cnd
  FROM att3 JOIN k3m ON k3m.ka = att3.o
   AND k3m.midx = ({sql_phash32(key_rep, 'duckdb')} % att3.gsz) + 1),
{_finish_ctes("SELECT s, p, o, side, a, cnd FROM c3")}
"""


def errors_kind3_sql(triples_cte: str, p_error: float = 0.05) -> str:
    return (f"WITH {kg_ctes(triples_cte)}, {errors_kind3_ctes(p_error)} "
            "SELECT * FROM errfin")


def errors_kind1_sql(triples_cte: str, p_error: float = 0.05) -> str:
    return (f"WITH {kg_ctes(triples_cte)}, {errors_kind1_ctes(p_error)} "
            "SELECT * FROM errfin")


def errors_kind2_sql(triples_cte: str, p_error: float = 0.05) -> str:
    return (f"WITH {kg_ctes(triples_cte)}, {errors_kind2_ctes(p_error)} "
            "SELECT * FROM errfin")
