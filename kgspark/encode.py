"""Dictionary encoding: URIs/names → dense integer ids (SURVEY §2 S3).

Reference analog: the two-pass dictionary build at
/root/reference/load_kb.py:56-97 assigns ids in first-seen order — not
reproducible under parallelism. We instead assign ``row_number() over
(order by portable_hash(name), name)`` (1-based): deterministic,
partition-invariant, oracle-expressible, and computed WITHOUT a
single-partition global window:

  1. bucket = the hash's top bits (monotone in the sort key and UNIFORM —
     a name-prefix bucket would collapse to a handful of skewed buckets
     because entity names share prefixes like ``file:``);
  2. row_number within bucket (parallel, ~|names|/1024 per bucket);
  3. bucket offsets = cumulative counts over the 1024-row histogram,
     computed on the driver and broadcast-joined back.

This is the scalable zipWithIndex pattern in pure DataFrame ops, so it
survives a 1000-executor / 10^12-row dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kgspark.hashing import phash32, sql_phash32

N_ID_BUCKETS = 1024
_BUCKET_SHIFT = 22  # 2^32 / 2^22 = 1024 buckets


def _id_order_sql(name_sql: str = "name") -> str:
    h = sql_phash32(f"concat_ws('|', 'ids', {name_sql})", "duckdb")
    return f"{h}, {name_sql}"


def dense_ids(names: DataFrame, name_col: str = "name",
              id_col: str = "id") -> DataFrame:
    """Distinct single-column DataFrame → (id, name), 1-based dense ids
    ranked by (portable_hash(name), name)."""
    from kgspark.util import materialize

    # checkpoint the distinct-names table: it feeds BOTH the histogram
    # collect and the final ranked projection (separate actions — nothing
    # is reused across them otherwise, so the distinct shuffle of the
    # dimension would run twice)
    b = materialize(
        names.select(F.col(name_col)).distinct()
        .withColumn("_h", phash32([F.col(name_col)], "ids"))
        .withColumn("_b", F.shiftright("_h", _BUCKET_SHIFT))
    )
    hist = [(r["_b"], r["cnt"]) for r in
            b.groupBy("_b").agg(F.count("*").alias("cnt")).collect()]
    hist.sort(key=lambda x: x[0])
    offsets, acc = [], 0
    for bucket, cnt in hist:
        offsets.append((bucket, acc))
        acc += cnt
    spark = names.sparkSession
    off_df = spark.createDataFrame(offsets, "`_b` long, `_off` long")

    w = Window.partitionBy("_b").orderBy("_h", name_col)
    return (
        b.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_b")
        .select((F.col("_off") + F.col("_rn")).cast("long").alias(id_col),
                F.col(name_col))
    )


def build_dims(triples_raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """entities(id, name) + relations(id, name) dims from string triples."""
    ents = triples_raw.select(F.col("subj").alias("name")).unionByName(
        triples_raw.select(F.col("obj").alias("name"))
    )
    entities = dense_ids(ents, "name", "id")
    relations = dense_ids(triples_raw.select(F.col("pred").alias("name")), "name", "id")
    return entities, relations


def encode_triples(triples_raw: DataFrame, entities: DataFrame,
                   relations: DataFrame) -> DataFrame:
    """(subj, pred, obj) strings → (s: long, p: int, o: long) id triples.

    The relations dim is tiny → broadcast. The entities dim can be huge at
    10^12-file scale → plain shuffle join (sort-merge), joined twice (subj,
    obj). AQE handles skew on hot entities (e.g. ``lang:python``).
    """
    e_s = entities.select(F.col("id").alias("s"), F.col("name").alias("subj"))
    e_o = entities.select(F.col("id").alias("o"), F.col("name").alias("obj"))
    rel = relations.select(F.col("id").cast("int").alias("p"), F.col("name").alias("pred"))
    return (
        triples_raw.join(F.broadcast(rel), "pred")
        .join(e_s, "subj")
        .join(e_o, "obj")
        .select("s", "p", "o")
    )


# ---------------------------------------------------------------- SQL (oracle)


def entities_sql(triples_cte: str) -> str:
    return f"""
WITH tr AS ({triples_cte}),
names AS (SELECT DISTINCT name FROM (
  SELECT subj AS name FROM tr UNION ALL SELECT obj FROM tr))
SELECT row_number() OVER (ORDER BY {_id_order_sql()}) AS id, name FROM names
"""


def relations_sql(triples_cte: str) -> str:
    return f"""
WITH tr AS ({triples_cte}),
names AS (SELECT DISTINCT pred AS name FROM tr)
SELECT row_number() OVER (ORDER BY {_id_order_sql()}) AS id, name FROM names
"""


def encoded_sql(triples_cte: str) -> str:
    return f"""
WITH tr AS ({triples_cte}),
names AS (SELECT DISTINCT name FROM (
  SELECT subj AS name FROM tr UNION ALL SELECT obj FROM tr)),
ent AS (SELECT row_number() OVER (ORDER BY {_id_order_sql()}) AS id, name FROM names),
rel AS (SELECT row_number() OVER (ORDER BY {_id_order_sql()}) AS id, name
        FROM (SELECT DISTINCT pred AS name FROM tr))
SELECT CAST(es.id AS BIGINT) AS s, CAST(rel.id AS INT) AS p, CAST(eo.id AS BIGINT) AS o
FROM tr
JOIN rel ON rel.name = tr.pred
JOIN ent es ON es.name = tr.subj
JOIN ent eo ON eo.name = tr.obj
"""
