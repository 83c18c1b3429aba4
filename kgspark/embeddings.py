"""HolE scoring surface (SURVEY §2 M9 — the scoring operator only).

Reference: /root/reference/embeddings.py:636 scores a triple (s, p, o)
as ``sum(R[p] * ccorr(E[s], E[o]))`` (HolE); the embeddings themselves
are trained there through TF/skge (embeddings.py:1-30), which is out of
scope per the SURVEY north rule and absent from this container. The
SCORING composition, however, is pure column algebra and is implemented
here Spark-native: circular correlation via kgspark.simsearch.ccorr_col
(rotated sequential dot products, JVM-side) contracted against the
relation vector.

Embeddings are DETERMINISTIC hash-derived vectors (the portable md5
substrate, kgspark.hashing) — a pure function of the entity/relation id,
so (a) scoring is a single narrow projection with ZERO joins or
shuffles, and (b) the DuckDB oracle reconstructs identical vectors and
identical fold order (list_dot_product) for exact value checks. A
trained-embedding table can be swapped in as a (id, vec) join without
changing the composition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgspark.hashing import phash32, sql_phash32
from kgspark.simsearch import _DOT, ccorr_col, _dot

DIM_EMB = 16


def hash_embedding(id_col: Column, salt: str, d: int = DIM_EMB) -> Column:
    """Deterministic embedding: vec[i] = (h(salt|id|i) % 1000)/1000 − 0.5."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: (phash32([id_col, i], salt) % 1000) / 1000.0 - 0.5,
    )


def hole_scores(triples: DataFrame, d: int = DIM_EMB) -> DataFrame:
    """→ (s, p, o, score): the reference's HolE triple score
    (embeddings.py:636) over hash-derived vectors — one narrow
    projection, no shuffle; at 100 TB this is embarrassingly parallel."""
    es = hash_embedding(F.col("s"), "he", d)
    eo = hash_embedding(F.col("o"), "he", d)
    rp = hash_embedding(F.col("p"), "hr", d)
    score = F.round(_dot(rp, ccorr_col(es, eo, d)), 6)
    return triples.select("s", "p", "o", score.alias("score"))


# ---------------------------------------------------------------- SQL (oracle)


def _ev_sql(id_expr: str, salt: str, d: int) -> str:
    key = f"concat_ws('|', '{salt}', CAST({id_expr} AS VARCHAR), CAST(i AS VARCHAR))"
    h = sql_phash32(key, "duckdb")
    return (f"list_transform(generate_series(0, {d - 1}), "
            f"i -> (({h} % 1000) / 1000.0 - 0.5))")


def hole_scores_sql(triples_cte: str, d: int = DIM_EMB) -> str:
    """Oracle: identical hash-derived vectors, rotation dot products via
    list_dot_product (bit-identical to the Spark sequential fold)."""
    from kgspark.typesys import kg_ctes

    es, eo, rp = (_ev_sql("s", "he", d), _ev_sql("o", "he", d),
                  _ev_sql("p", "hr", d))
    cc = (f"list_transform(generate_series(0, {d - 1}), "
          f"k -> list_dot_product(es, "
          f"list_concat(list_slice(eo, k + 1, {d}), list_slice(eo, 1, k))))")
    return f"""
WITH {kg_ctes(triples_cte)},
hv AS (SELECT s, p, o, {es} AS es, {eo} AS eo, {rp} AS rp FROM enc)
SELECT s, p, o,
       round(list_dot_product(rp, {cc}), 6) AS score
FROM hv
"""
