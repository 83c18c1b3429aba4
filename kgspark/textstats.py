"""Text analysis operators over the ``documents`` table.

Training-data-pipeline layer: token counting, quality scoring, language
identification (stopword-marker heuristic), document fingerprinting.
All pure column expressions / joins — no Python in the hot path — with
exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.dedup import TOKENS_EXPR, shingles
from kgspark.hashing import phash32, sql_phash32

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "los", "y", "es", "de"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("de", "shi", "bu", "le", "zai", "he"),
}


def token_stats(docs: DataFrame) -> DataFrame:
    """→ (doc_id, n_tokens, n_uniq, n_chars_text): whitespace/word tokens."""
    tk = F.expr(TOKENS_EXPR)
    return docs.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        F.size(F.array_distinct(tk)).alias("n_uniq"),
        F.length("text").alias("n_chars_text"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """→ (doc_id, stop_ratio, uniq_ratio, alnum_ratio, quality).

    Heuristic quality = weighted mix of stopword density, length,
    vocabulary diversity and character cleanliness (the usual pretraining
    quality-filter shape), round(6).
    """
    tk = F.expr(TOKENS_EXPR)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size(tk)
    n_stop = F.size(F.array_intersect(F.array_distinct(tk), stops))
    stop_hits = F.size(F.filter(tk, lambda t: F.array_contains(stops, t)))
    alnum = F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
    df = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (stop_hits / F.greatest(n_tok, F.lit(1))).alias("stop_ratio"),
        (F.size(F.array_distinct(tk)) / F.greatest(n_tok, F.lit(1))).alias("uniq_ratio"),
        (alnum / F.greatest(F.length("text"), F.lit(1))).alias("alnum_ratio"),
    )
    quality = (
        F.lit(0.3) * F.least(F.col("stop_ratio") * 5, F.lit(1.0))
        + F.lit(0.3) * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + F.lit(0.2) * F.col("uniq_ratio")
        + F.lit(0.2) * F.col("alnum_ratio")
    )
    return df.select(
        "doc_id",
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("uniq_ratio", 6).alias("uniq_ratio"),
        F.round("alnum_ratio", 6).alias("alnum_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """→ (doc_id, pred_lang): marker-token argmax; 'und' when no hits.

    Ties break lexicographically (deterministic).
    """
    tk = F.expr(TOKENS_EXPR)
    cols = ["doc_id"]
    base = docs.select("doc_id", tk.alias("tk"))
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hits = F.size(F.filter(F.col("tk"), lambda t: F.array_contains(markers, t)))
        base = base.withColumn(f"hit_{lang}", hits)
        cols.append(f"hit_{lang}")
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hit_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earliest lang wins ties
        pred = F.when(F.col(f"hit_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return base.select("doc_id", pred.alias("pred_lang"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """→ (doc_id, fp, sha): rolling-shingle MinHash fingerprint + sha256."""
    sh = shingles(docs)
    mh = sh.groupBy("doc_id").agg(
        F.min(phash32([F.col("shingle")], "fp0")).alias("m0"),
        F.min(phash32([F.col("shingle")], "fp1")).alias("m1"),
    )
    return (
        docs.select("doc_id", F.sha2("text", 256).alias("sha"))
        .join(mh, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws("-", F.col("m0").cast("string"),
                        F.col("m1").cast("string")).alias("fp"),
            "sha",
        )
    )


# ---------------------------------------------------------------- SQL (oracle)


def token_stats_sql() -> str:
    return f"""
SELECT doc_id,
       len({TOKENS_EXPR}) AS n_tokens,
       len(list_distinct({TOKENS_EXPR})) AS n_uniq,
       length(text) AS n_chars_text
FROM documents
"""


def quality_scores_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH b AS (
  SELECT doc_id, {TOKENS_EXPR} AS tk,
         length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS alnum,
         length(text) AS lt
  FROM documents),
r AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         len(list_filter(tk, t -> t IN ({stops}))) * 1.0 / greatest(len(tk), 1) AS stop_ratio,
         len(list_distinct(tk)) * 1.0 / greatest(len(tk), 1) AS uniq_ratio,
         alnum * 1.0 / greatest(lt, 1) AS alnum_ratio
  FROM b)
SELECT doc_id, round(stop_ratio, 6) AS stop_ratio,
       round(uniq_ratio, 6) AS uniq_ratio,
       round(alnum_ratio, 6) AS alnum_ratio,
       round(0.3 * least(stop_ratio * 5, 1.0) + 0.3 * least(n_tokens / 100.0, 1.0)
             + 0.2 * uniq_ratio + 0.2 * alnum_ratio, 6) AS quality
FROM r
"""


def lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    hit_cols = ", ".join(
        "len(list_filter(tk, t -> t IN ({}))) AS hit_{}".format(
            ", ".join(f"'{m}'" for m in LANG_MARKERS[lg]), lg)
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"hit_{lg}" for lg in langs) + ")"
    pred = "'und'"
    for lg in reversed(langs):
        pred = f"CASE WHEN hit_{lg} = best THEN '{lg}' ELSE {pred} END"
    return f"""
WITH b AS (SELECT doc_id, {TOKENS_EXPR} AS tk FROM documents),
h AS (SELECT doc_id, {hit_cols} FROM b),
m AS (SELECT *, {best} AS best FROM h)
SELECT doc_id, CASE WHEN best <= 0 THEN 'und' ELSE {pred} END AS pred_lang FROM m
"""


def fingerprints_sql() -> str:
    from kgspark.dedup import _shingles_ctes

    h0 = sql_phash32("concat_ws('|', 'fp0', shingle)", "duckdb")
    h1 = sql_phash32("concat_ws('|', 'fp1', shingle)", "duckdb")
    return f"""
WITH {_shingles_ctes()},
mh AS (SELECT doc_id, min({h0}) AS m0, min({h1}) AS m1 FROM shing GROUP BY doc_id)
SELECT d.doc_id,
       concat_ws('-', CAST(mh.m0 AS VARCHAR), CAST(mh.m1 AS VARCHAR)) AS fp,
       sha256(d.text) AS sha
FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
"""
