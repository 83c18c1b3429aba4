"""Type-hierarchy materialization (SURVEY §2 U2-U4, H1-H2).

Reference: subClassOf DAG nodes (/root/reference/load_kb.py:128-152) and
bottom-up type-membership propagation (/root/reference/load_kb.py:212-233,
util.py:964-986). Our KG's vocabulary induces a small static hierarchy:

    lang:<x>  ⊂ kind:lang ⊂ kind:thing
    kind:<k>  ⊂ kind:thing          (k ∈ repo/file/module/sym/lang)

plus the generic operator: transitive closure of an arbitrary edge table
by iterative self-join with union-distinct (checkpointed per level), and
domain/range materialization (assert the domain type on every subject,
range type on every object — load_kb.py:198-210).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.util import materialize

# predicate name -> (domain kind type, range kind type); load_kb.py:154-160
DOMAINS = {
    "contains": "kind:repo",
    "written_in": "kind:file",
    "imports": "kind:file",
    "defines": "kind:file",
}
RANGES = {
    "contains": "kind:file",
    "written_in": "kind:lang",
    "imports": "kind:module",
    "defines": "kind:sym",
}


def subclass_edges(type_names: DataFrame) -> DataFrame:
    """→ (child, parent) name-level subClassOf edges from the vocabulary."""
    tn = type_names.select(F.col("name").alias("child"))
    lang = tn.where(F.col("child").startswith("lang:")).select(
        "child", F.lit("kind:lang").alias("parent"))
    kinds = tn.where(F.col("child").startswith("kind:")
                     & (F.col("child") != "kind:thing")).select(
        "child", F.lit("kind:thing").alias("parent"))
    extra = type_names.sparkSession.createDataFrame(
        [("kind:lang", "kind:thing")], "child string, parent string")
    return lang.unionByName(kinds).unionByName(extra).distinct()


def transitive_closure(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Iterative self-join closure → (child, parent), all ancestors (H1).

    Doubles path length each iteration (closure ∘ closure), so converges
    in O(log depth) rounds with a materialize per round.
    """
    clo = materialize(edges.distinct())
    for _ in range(max_iter):
        nxt = (
            clo.alias("a")
            .join(clo.alias("b"), F.col("a.parent") == F.col("b.child"))
            .select(F.col("a.child").alias("child"), F.col("b.parent").alias("parent"))
        )
        new = clo.unionByName(nxt).distinct()
        new = materialize(new)
        if new.count() == clo.count():
            break
        clo = new
    return clo


def types_closure(type_assertions: DataFrame, type_names: DataFrame) -> DataFrame:
    """U2: propagate memberships up the hierarchy → (e, t_name) distinct."""
    clo = transitive_closure(subclass_edges(type_names))
    inherited = (
        type_assertions.join(clo.withColumnRenamed("child", "t_name"), "t_name")
        .select("e", F.col("parent").alias("t_name"))
    )
    return type_assertions.select("e", "t_name").unionByName(inherited).distinct()


def materialize_domains_ranges(triples_raw: DataFrame) -> DataFrame:
    """U4: domain type for every subject, range type for every object."""
    spark = triples_raw.sparkSession
    dom = spark.createDataFrame(list(DOMAINS.items()), "pred string, t_name string")
    ran = spark.createDataFrame(list(RANGES.items()), "pred string, t_name string")
    subs = triples_raw.join(F.broadcast(dom), "pred").select(
        F.col("subj").alias("ename"), "t_name")
    objs = triples_raw.join(F.broadcast(ran), "pred").select(
        F.col("obj").alias("ename"), "t_name")
    return subs.unionByName(objs).distinct()


def domain_range_ids(relations: DataFrame) -> tuple[dict[int, str], dict[int, str]]:
    """Relation-id-keyed domain/range type-name dicts for P6 path pruning."""
    rels = {r["name"]: int(r["id"]) for r in relations.collect()}
    dom = {rels[k]: v for k, v in DOMAINS.items() if k in rels}
    ran = {rels[k]: v for k, v in RANGES.items() if k in rels}
    return dom, ran


def merge_equivalent_types(types: DataFrame, equivalences: DataFrame) -> DataFrame:
    """U1: class-equivalence merge — map type t_from into t_into, dedupe
    (reference ``typedata[:, t1] += typedata[:, t2]``, load_kb.py:191-196)."""
    mapped = (
        types.join(F.broadcast(equivalences),
                   types.t == equivalences.t_from, "left")
        .select("e", F.coalesce("t_into", "t").alias("t"))
    )
    return mapped.distinct()


def lang_equivalences(type_names: DataFrame) -> DataFrame:
    """Demo U1 equivalence set: every ``lang:*`` type is declared
    equivalent to the minimum-id lang type (the analog of owl:equivalentClass
    pairs the reference merges, load_kb.py:191-196) → (t_from, t_into)."""
    langs = type_names.where(F.col("name").startswith("lang:"))
    tgt = langs.agg(F.min("t")).first()[0]
    return langs.where(F.col("t") != tgt).select(
        F.col("t").alias("t_from"), F.lit(tgt).cast("int").alias("t_into"))


def omnipresent_types(types: DataFrame, n_entities: int) -> DataFrame:
    """A10: types held by every entity (generate_errors.py:27-28)."""
    return (
        types.groupBy("t").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") == n_entities)
        .select("t")
    )


# ---------------------------------------------------------------- SQL (oracle)


def types_closure_sql(triples_cte: str) -> str:
    from kgspark.typesys import kg_ctes

    return f"""
WITH {kg_ctes(triples_cte)},
hedges AS (
  SELECT name AS child, 'kind:lang' AS parent FROM tn WHERE name LIKE 'lang:%'
  UNION
  SELECT name, 'kind:thing' FROM tn WHERE name LIKE 'kind:%' AND name <> 'kind:thing'
  UNION
  SELECT 'kind:lang', 'kind:thing'),
hclo AS (
  WITH RECURSIVE cc(child, parent) AS (
    SELECT child, parent FROM hedges
    UNION
    SELECT cc.child, hedges.parent FROM cc JOIN hedges ON hedges.child = cc.parent)
  SELECT child, parent FROM cc)
SELECT DISTINCT e, t_name FROM (
  SELECT e, t_name FROM ta
  UNION ALL
  SELECT ta.e, hclo.parent FROM ta JOIN hclo ON hclo.child = ta.t_name)
"""


def domran_materialize_sql(triples_cte: str) -> str:
    from kgspark.link import canonical_tr_ctes

    dom_vals = ", ".join(f"('{k}', '{v}')" for k, v in sorted(DOMAINS.items()))
    ran_vals = ", ".join(f"('{k}', '{v}')" for k, v in sorted(RANGES.items()))
    return f"""
WITH {canonical_tr_ctes(triples_cte)},
dom(pred, t_name) AS (VALUES {dom_vals}),
ran(pred, t_name) AS (VALUES {ran_vals})
SELECT DISTINCT ename, t_name FROM (
  SELECT tr.subj AS ename, dom.t_name FROM tr JOIN dom USING (pred)
  UNION ALL
  SELECT tr.obj, ran.t_name FROM tr JOIN ran USING (pred))
"""


def types_merged_sql(triples_cte: str) -> str:
    """Oracle for merge_equivalent_types ∘ lang_equivalences: map every
    lang:* type id onto the minimum lang id, dedupe memberships."""
    from kgspark.typesys import kg_ctes

    return f"""
WITH {kg_ctes(triples_cte)},
lteq AS (SELECT t FROM tn WHERE name LIKE 'lang:%'),
ltmin AS (SELECT min(t) AS tgt FROM tn WHERE name LIKE 'lang:%')
SELECT DISTINCT e,
       CASE WHEN t IN (SELECT t FROM lteq) THEN (SELECT tgt FROM ltmin)
            ELSE t END AS t
FROM ty
"""


def omnipresent_types_sql(triples_cte: str) -> str:
    from kgspark.typesys import kg_ctes

    return f"""
WITH {kg_ctes(triples_cte)}
SELECT t FROM ty GROUP BY t
HAVING count(*) = (SELECT count(*) FROM ent)
"""
