"""Evaluation + outlier operators (SURVEY §2 A5/A9/M4/M5/W2/J6/F9).

* z-score outlier wrapper — /root/reference/errordetector.py:55-106:
  per-relation mean/std of scores; below-mean scores map to their z-score,
  the rest to 1.0 (only "too low" is suspicious).
* link-prediction evaluation — /root/reference/util.py:601-647: for
  sampled true facts, score EVERY candidate object, rank descending;
  the filtered variant removes other true objects (J6 anti-join,
  util.py:627-631). Reports MeanRank/MRR/Hits@k (A7/A8).
  Candidate scoring uses the SDValidate object-side score (a function of
  (p, candidate) only), so the candidate table is |relations| × |entities|
  — built once, not per fact.
* word frequency dictionary — /root/reference/entityasm.py:74-110 (A9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.hashing import puniform, sql_puniform
from kgspark.typesys import kg_ctes

EVAL_SAMPLE = 0.02


def zscore_outlier(scored: DataFrame, score_col: str = "score") -> DataFrame:
    """→ input + ``adj_score`` (F9 gating; errordetector.py:101-103)."""
    stats = scored.groupBy("p").agg(
        F.avg(score_col).alias("_mu"),
        F.stddev_samp(score_col).alias("_sd"),
    )
    j = scored.join(F.broadcast(stats), "p")
    adj = F.when(
        (F.col(score_col) < F.col("_mu")) & (F.col("_sd") > 0),
        (F.col(score_col) - F.col("_mu")) / F.col("_sd"),
    ).otherwise(F.lit(1.0))
    return j.select(*scored.columns, F.round(adj, 6).alias("adj_score"))


def mad_outlier(scored: DataFrame, score_col: str = "score") -> DataFrame:
    """M5 variant: per-relation median/MAD envelope.

    Deterministic stand-in for the reference's per-relation
    EllipticEnvelope wrapper (/root/reference/errordetector.py:47-49,
    72-79) — sklearn is absent from this environment, so the robust
    location/scale envelope replaces the fitted covariance; the wrapper's
    gating shape is preserved exactly (errordetector.py:101-103): scores
    at/above the relation mean map to 1.0, below-mean scores map to their
    robust z ``(x - median) / (1.4826 · MAD)``.
    """
    med = scored.groupBy("p").agg(
        F.percentile(score_col, F.lit(0.5)).alias("_med"),
        F.avg(score_col).alias("_mu"))
    dev = scored.join(F.broadcast(med), "p")
    mad = dev.groupBy("p").agg(F.percentile(
        F.abs(F.col(score_col) - F.col("_med")), F.lit(0.5)).alias("_mad"))
    j = dev.join(F.broadcast(mad), "p")
    adj = F.when(
        (F.col(score_col) < F.col("_mu")) & (F.col("_mad") > 0),
        (F.col(score_col) - F.col("_med")) / (1.4826 * F.col("_mad")),
    ).otherwise(F.lit(1.0))
    return j.select(*scored.columns, F.round(adj, 6).alias("adj_score"))


def iqr_outlier(scored: DataFrame, score_col: str = "score") -> DataFrame:
    """M5 variant: per-relation interquartile envelope (deterministic
    stand-in for IsolationForest/OneClassSVM in the reference's wrapper
    factory, /root/reference/errordetector.py:44-53; same below-mean
    gating). adj = (x - q1) / (q3 - q1) for below-mean scores."""
    st = scored.groupBy("p").agg(
        F.percentile(score_col, F.lit(0.25)).alias("_q1"),
        F.percentile(score_col, F.lit(0.75)).alias("_q3"),
        F.avg(score_col).alias("_mu"))
    j = scored.join(F.broadcast(st), "p")
    iqr = F.col("_q3") - F.col("_q1")
    adj = F.when(
        (F.col(score_col) < F.col("_mu")) & (iqr > 0),
        (F.col(score_col) - F.col("_q1")) / iqr,
    ).otherwise(F.lit(1.0))
    return j.select(*scored.columns, F.round(adj, 6).alias("adj_score"))


def candidate_scores_po(triples: DataFrame, types: DataFrame,
                        entities: DataFrame) -> DataFrame:
    """SDValidate score of every (p, candidate-object) pair (M4 analog)."""
    from kgspark.scoring import ot_dist

    dist = ot_dist(triples, types, "o")
    norms = dist.groupBy("p").agg(
        F.sqrt(F.sum(F.col("dist") * F.col("dist"))).alias("norm"))
    cand = entities.select(F.col("id").alias("cand")).crossJoin(
        triples.select("p").distinct())
    ct = cand.join(types.withColumnRenamed("e", "cand"), "cand") \
        .join(F.broadcast(dist), ["p", "t"], "left") \
        .groupBy("cand", "p").agg(
            F.sum(F.coalesce("dist", F.lit(0.0))).alias("dot"),
            F.count("*").alias("nt"))
    return ct.join(F.broadcast(norms), "p").select(
        "p", "cand",
        F.round(F.col("dot") / (F.sqrt("nt") * F.col("norm")), 6).alias("cscore"),
    )


def link_prediction_eval(triples: DataFrame, types: DataFrame,
                         entities: DataFrame,
                         sample: float = EVAL_SAMPLE) -> DataFrame:
    """→ 1-row (mr, mrr, fmr, fmrr, hits1, hits3, hits10, n_eval) (W2).

    Raw rank = position of the true o among all candidates ordered by
    (cscore desc, cand asc). Filtered rank subtracts better-ranked OTHER
    true objects of the same (s, p) (util.py:627-631).
    """
    facts = triples.where(puniform(["s", "p", "o"], "lpev") < sample)
    cs = candidate_scores_po(triples, types, entities)

    truth = facts.select("s", "p", F.col("o").alias("true_o"))
    true_sc = truth.join(
        cs.withColumnRenamed("cand", "true_o"), ["p", "true_o"]
    ).withColumnRenamed("cscore", "tscore")

    # raw rank: candidates strictly better than the true object
    better = true_sc.join(cs, "p").where(
        (F.col("cscore") > F.col("tscore"))
        | ((F.col("cscore") == F.col("tscore")) & (F.col("cand") < F.col("true_o")))
    )
    raw = better.groupBy("s", "p", "true_o", "tscore").agg(
        (F.count("*") + 1).alias("rank"))
    raw = true_sc.join(raw, ["s", "p", "true_o", "tscore"], "left") \
        .withColumn("rank", F.coalesce("rank", F.lit(1)))

    # filtered: subtract better-ranked other true objects of the same (s,p)
    others = triples.select("s", "p", F.col("o").alias("cand"))
    fbetter = true_sc.join(others, ["s", "p"]).where(
        F.col("cand") != F.col("true_o")
    ).join(cs, ["p", "cand"]).where(
        (F.col("cscore") > F.col("tscore"))
        | ((F.col("cscore") == F.col("tscore")) & (F.col("cand") < F.col("true_o")))
    ).groupBy("s", "p", "true_o").agg(F.count("*").alias("nbetter_true"))

    r = raw.join(fbetter, ["s", "p", "true_o"], "left").withColumn(
        "f_rank", F.col("rank") - F.coalesce("nbetter_true", F.lit(0)))
    return r.agg(
        F.round(F.avg("rank"), 6).alias("mr"),
        F.round(F.avg(1.0 / F.col("rank")), 6).alias("mrr"),
        F.round(F.avg("f_rank"), 6).alias("fmr"),
        F.round(F.avg(1.0 / F.col("f_rank")), 6).alias("fmrr"),
        F.round(F.avg((F.col("f_rank") <= 1).cast("double")), 6).alias("hits1"),
        F.round(F.avg((F.col("f_rank") <= 3).cast("double")), 6).alias("hits3"),
        F.round(F.avg((F.col("f_rank") <= 10).cast("double")), 6).alias("hits10"),
        F.count("*").alias("n_eval"),
    )


def word_freq(triples_raw: DataFrame) -> DataFrame:
    """A9: word → (count, n_entities) over entity-name words."""
    names = triples_raw.select(F.col("subj").alias("name")).unionByName(
        triples_raw.select(F.col("obj").alias("name"))).distinct()
    words = names.select(
        "name",
        F.explode(F.expr(
            "regexp_extract_all(lower(substr(name, instr(name, ':') + 1)),"
            " '[a-z]+', 0)")).alias("word"),
    )
    return words.groupBy("word").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("name").alias("n_entities"),
    )


# ---------------------------------------------------------------- SQL (oracle)


def zscore_outlier_sql(triples_cte: str) -> str:
    from kgspark.scoring import sdvalidate_ctes

    return f"""
WITH {kg_ctes(triples_cte)}, {sdvalidate_ctes('enc')},
stats AS (SELECT p, avg(score) AS mu, stddev_samp(score) AS sd
          FROM sdv GROUP BY p)
SELECT sdv.s, sdv.p, sdv.o, sdv.score,
  round(CASE WHEN sdv.score < stats.mu AND stats.sd > 0
             THEN (sdv.score - stats.mu) / stats.sd ELSE 1.0 END, 6) AS adj_score
FROM sdv JOIN stats ON stats.p = sdv.p
"""


def mad_outlier_sql(triples_cte: str) -> str:
    from kgspark.scoring import sdvalidate_ctes

    return f"""
WITH {kg_ctes(triples_cte)}, {sdvalidate_ctes('enc')},
medm AS (SELECT p, quantile_cont(score, 0.5) AS med, avg(score) AS mu
         FROM sdv GROUP BY p),
madm AS (SELECT sdv.p, quantile_cont(abs(sdv.score - medm.med), 0.5) AS mad
         FROM sdv JOIN medm USING (p) GROUP BY sdv.p)
SELECT sdv.s, sdv.p, sdv.o, sdv.score,
  round(CASE WHEN sdv.score < medm.mu AND madm.mad > 0
             THEN (sdv.score - medm.med) / (1.4826 * madm.mad)
             ELSE 1.0 END, 6) AS adj_score
FROM sdv JOIN medm USING (p) JOIN madm ON madm.p = sdv.p
"""


def iqr_outlier_sql(triples_cte: str) -> str:
    from kgspark.scoring import sdvalidate_ctes

    return f"""
WITH {kg_ctes(triples_cte)}, {sdvalidate_ctes('enc')},
iqst AS (SELECT p, quantile_cont(score, 0.25) AS q1,
                quantile_cont(score, 0.75) AS q3, avg(score) AS mu
         FROM sdv GROUP BY p)
SELECT sdv.s, sdv.p, sdv.o, sdv.score,
  round(CASE WHEN sdv.score < iqst.mu AND iqst.q3 - iqst.q1 > 0
             THEN (sdv.score - iqst.q1) / (iqst.q3 - iqst.q1)
             ELSE 1.0 END, 6) AS adj_score
FROM sdv JOIN iqst USING (p)
"""


def link_prediction_eval_sql(triples_cte: str, sample: float = EVAL_SAMPLE) -> str:
    key = ("concat_ws('|', 'lpev', CAST(s AS VARCHAR), CAST(p AS VARCHAR), "
           "CAST(o AS VARCHAR))")
    return f"""
WITH {kg_ctes(triples_cte)},
tot AS (SELECT count(*) AS n FROM enc),
dist AS (
  SELECT f.p, ty.t, count(*) * 1.0 / (SELECT n FROM tot) AS dist
  FROM enc f JOIN ty ON ty.e = f.o GROUP BY f.p, ty.t),
norms AS (SELECT p, sqrt(sum(dist * dist)) AS nrm FROM dist GROUP BY p),
cs AS (
  SELECT pp.p, ent.id AS cand,
         round(sum(coalesce(dist.dist, 0)) / (sqrt(count(*)) * any_value(norms.nrm)), 6) AS cscore
  FROM ent CROSS JOIN (SELECT DISTINCT p FROM enc) pp
  JOIN ty ON ty.e = ent.id
  LEFT JOIN dist ON dist.p = pp.p AND dist.t = ty.t
  JOIN norms ON norms.p = pp.p
  GROUP BY pp.p, ent.id),
facts AS (SELECT s, p, o AS true_o FROM enc
          WHERE {sql_puniform(key, 'duckdb')} < {sample}),
tsc AS (SELECT facts.*, cs.cscore AS tscore FROM facts
        JOIN cs ON cs.p = facts.p AND cs.cand = facts.true_o),
raw AS (
  SELECT tsc.s, tsc.p, tsc.true_o,
         1 + count(CASE WHEN cs.cscore > tsc.tscore
                        OR (cs.cscore = tsc.tscore AND cs.cand < tsc.true_o)
                        THEN 1 END) AS rank
  FROM tsc JOIN cs ON cs.p = tsc.p
  GROUP BY tsc.s, tsc.p, tsc.true_o),
fb AS (
  SELECT tsc.s, tsc.p, tsc.true_o, count(*) AS nbetter
  FROM tsc JOIN enc ot ON ot.s = tsc.s AND ot.p = tsc.p AND ot.o <> tsc.true_o
  JOIN cs ON cs.p = tsc.p AND cs.cand = ot.o
  WHERE cs.cscore > tsc.tscore
     OR (cs.cscore = tsc.tscore AND cs.cand < tsc.true_o)
  GROUP BY tsc.s, tsc.p, tsc.true_o),
rr AS (
  SELECT raw.*, raw.rank - coalesce(fb.nbetter, 0) AS f_rank
  FROM raw LEFT JOIN fb USING (s, p, true_o))
SELECT round(avg(rank), 6) AS mr, round(avg(1.0 / rank), 6) AS mrr,
       round(avg(f_rank), 6) AS fmr, round(avg(1.0 / f_rank), 6) AS fmrr,
       round(avg(CASE WHEN f_rank <= 1 THEN 1.0 ELSE 0.0 END), 6) AS hits1,
       round(avg(CASE WHEN f_rank <= 3 THEN 1.0 ELSE 0.0 END), 6) AS hits3,
       round(avg(CASE WHEN f_rank <= 10 THEN 1.0 ELSE 0.0 END), 6) AS hits10,
       count(*) AS n_eval
FROM rr
"""


def word_freq_sql(triples_cte: str) -> str:
    from kgspark.link import canonical_tr_ctes

    return f"""
WITH {canonical_tr_ctes(triples_cte)},
names AS (SELECT DISTINCT name FROM (
  SELECT subj AS name FROM tr UNION ALL SELECT obj FROM tr)),
words AS (
  SELECT name, unnest(regexp_extract_all(
    lower(substr(name, instr(name, ':') + 1)), '[a-z]+', 0)) AS word
  FROM names)
SELECT word, count(*) AS cnt, count(DISTINCT name) AS n_entities
FROM words GROUP BY word
"""
