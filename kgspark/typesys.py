"""Entity→type assertions (SURVEY §1.1 `types` matrix analog).

Reference: the n_entities × n_types boolean matrix built at
/root/reference/load_kb.py:171-172. Our vocabulary (FIXTURES.md §3):
every entity gets a *kind* type from its name prefix
(``kind:repo|file|module|sym|lang``), and file entities additionally get
the ``lang:*`` type asserted by their ``written_in`` fact — the analog of
rdf:type assertions plus domain/range materialization
(/root/reference/load_kb.py:198-210).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.encode import _id_order_sql, dense_ids


def type_assertions(entities: DataFrame, triples: DataFrame,
                    relations: DataFrame) -> DataFrame:
    """→ (e: long, t_name: string), distinct."""
    kind = entities.select(
        F.col("id").alias("e"),
        F.concat(F.lit("kind:"), F.split("name", ":").getItem(0)).alias("t_name"),
    )
    wi = relations.filter(F.col("name") == "written_in").select(
        F.col("id").cast("int").alias("p")
    )
    lang = (
        triples.join(F.broadcast(wi), "p")
        .join(entities.select(F.col("id").alias("o"), F.col("name").alias("t_name")), "o")
        .select(F.col("s").alias("e"), "t_name")
    )
    return kind.unionByName(lang).distinct()


def build_types(entities: DataFrame, triples: DataFrame,
                relations: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (types(e, t), type_names(t, name))."""
    ta = type_assertions(entities, triples, relations)
    type_names = dense_ids(ta.select(F.col("t_name").alias("name")), "name", "t") \
        .select(F.col("t").cast("int").alias("t"), "name")
    types = ta.join(F.broadcast(type_names), ta.t_name == type_names.name) \
        .select("e", "t")
    return types, type_names


# ---------------------------------------------------------------- SQL (oracle)

# CTE bodies reused by downstream oracle builders; all expect `tr`, `ent`,
# `rel`, `enc` CTEs from kgspark.encode oracle fragments.

def kg_ctes(triples_cte: str, canonical: bool = True) -> str:
    """Shared WITH-clause body: tr (canonicalized), ent, rel, enc, ta, tn, ty.

    ``canonical=True`` routes the raw triples through the linking +
    canonicalization CTE chain (kgspark.link), mirroring
    pipeline.build_graph. Set False for the raw-graph variant.
    """
    from kgspark.link import canonical_tr_ctes

    tr_def = (canonical_tr_ctes(triples_cte) if canonical
              else f"tr AS ({triples_cte})")
    return f"""
{tr_def},
names AS (SELECT DISTINCT name FROM (
  SELECT subj AS name FROM tr UNION ALL SELECT obj FROM tr)),
ent AS (SELECT CAST(row_number() OVER (ORDER BY {_id_order_sql()}) AS BIGINT) AS id, name FROM names),
rel AS (SELECT CAST(row_number() OVER (ORDER BY {_id_order_sql()}) AS INT) AS id, name
        FROM (SELECT DISTINCT pred AS name FROM tr)),
enc AS (SELECT es.id AS s, rel.id AS p, eo.id AS o
        FROM tr JOIN rel ON rel.name = tr.pred
        JOIN ent es ON es.name = tr.subj
        JOIN ent eo ON eo.name = tr.obj),
ta AS (SELECT DISTINCT e, t_name FROM (
  SELECT id AS e, 'kind:' || split_part(name, ':', 1) AS t_name FROM ent
  UNION ALL
  SELECT enc.s AS e, eo.name AS t_name
  FROM enc JOIN rel ON rel.id = enc.p AND rel.name = 'written_in'
  JOIN ent eo ON eo.id = enc.o)),
tn AS (SELECT CAST(row_number() OVER (ORDER BY {_id_order_sql('t_name')}) AS INT) AS t, t_name AS name
       FROM (SELECT DISTINCT t_name FROM ta)),
ty AS (SELECT ta.e, tn.t FROM ta JOIN tn ON tn.name = ta.t_name)
"""


def types_sql(triples_cte: str) -> str:
    return f"WITH {kg_ctes(triples_cte)} SELECT e, t FROM ty"


def type_names_sql(triples_cte: str) -> str:
    return f"WITH {kg_ctes(triples_cte)} SELECT t, name FROM tn"
