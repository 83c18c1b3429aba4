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


# ------------------------------------------------- isolation forest (M5)

IF_TREES = 64
IF_SAMPLE = 256  # sklearn IsolationForest max_samples='auto' = min(256, n)
_EULER = 0.5772156649015329


def _if_c(m: int) -> float:
    """Average BST path length c(m) (Liu et al. 2008, the sklearn
    normalizer)."""
    import math

    if m <= 1:
        return 0.0
    return 2.0 * (math.log(m - 1) + _EULER) - 2.0 * (m - 1) / m


def _if_phash(key: str) -> int:
    from hashlib import md5

    return int(md5(key.encode()).hexdigest()[:8], 16)


def _if_trees(p: int, vals: list[float], n_trees: int = IF_TREES):
    """Deterministic 1-D isolation trees over a relation's score sample.

    sklearn's IsolationForest draws uniform split points between the
    node's min and max (1-D feature here — the wrapper fits on the score
    column, /root/reference/errordetector.py:63-67); the deterministic
    variant derives each split from the portable md5 of (p, tree, node).
    Because the feature is 1-D, every tree is a partition of the line
    into leaf INTERVALS with known depths — returned as
    ``(tree, lo, hi, h)`` rows with h = depth + c(leaf_size) (the
    standard unsplit-node path extension), plus the c(n) normalizer.
    Evaluation is then a broadcast interval join, no model object.
    """
    import math

    n = len(vals)
    max_depth = math.ceil(math.log2(max(2, n)))
    out: list[tuple[int, float, float, float]] = []

    def rec(t: int, v: list[float], lo: float, hi: float,
            depth: int, node: int) -> None:
        if depth >= max_depth or len(v) <= 1 or min(v) == max(v):
            out.append((t, lo, hi, depth + _if_c(len(v))))
            return
        lo_v, hi_v = min(v), max(v)
        u = _if_phash(f"if|{p}|{t}|{node}") / 2**32
        cut = lo_v + u * (hi_v - lo_v)
        left = [x for x in v if x < cut]
        right = [x for x in v if x >= cut]
        if not left or not right:
            out.append((t, lo, hi, depth + _if_c(len(v))))
            return
        rec(t, left, lo, cut, depth + 1, node * 2 + 1)
        rec(t, right, cut, hi, depth + 1, node * 2 + 2)

    for t in range(n_trees):
        rec(t, sorted(vals), float("-inf"), float("inf"), 0, 0)
    return out, _if_c(n)


def _if_samples_from_rows(rows) -> dict[int, list[float]]:
    """(s, p, o, score) rows → per-relation hash-ordered score sample
    (first IF_SAMPLE in (uniform, s, o) order) — the single sampling
    definition shared by the Spark operator and the Spark-free oracle
    fit."""
    d: dict[int, list] = {}
    for s, p, o, score in rows:
        u = _if_phash(f"ifsamp|{int(s)}|{int(p)}|{int(o)}") / 2**32
        d.setdefault(int(p), []).append((u, int(s), int(o), float(score)))
    return {p: [x[3] for x in sorted(v)[:IF_SAMPLE]] for p, v in d.items()}


def _if_fit(samples: dict[int, list[float]]):
    """→ (interval rows [(p, tree, lo, hi, h)], cn rows [(p, cn)]) for
    every relation with ≥2 distinct sampled scores."""
    intervals, cns = [], []
    for p, vals in sorted(samples.items()):
        if len(vals) < 2 or min(vals) == max(vals):
            continue  # no forest → z-score fallback (errordetector.py:97)
        rows, cn = _if_trees(p, vals)
        intervals += [(p, t, lo, hi, h) for t, lo, hi, h in rows]
        cns.append((p, cn))
    return intervals, cns


def iforest_outlier(scored: DataFrame, score_col: str = "score") -> DataFrame:
    """M5 'if' variant: deterministic isolation forest per relation.

    Mirrors the reference wrapper with method='if'
    (/root/reference/errordetector.py:50-51,63-67,93-99): fit on the
    relation's score population (hash-deterministic 256-row sample, the
    sklearn max_samples default), decision = 0.5 − 2^(−E[h(x)]/c(n))
    (sklearn's decision_function), gated like every wrapper variant —
    at/above-mean scores map to 1.0. Relations without a forest fall back
    to the z rule. Scoring is a broadcast interval join + one aggregate;
    the only driver-side data is the ≤256-per-relation sample.
    """
    from kgspark.ordering import grouped_ordinal

    spark = scored.sparkSession
    stats = scored.groupBy("p").agg(
        F.avg(score_col).alias("_mu"),
        F.stddev_samp(score_col).alias("_sd"))

    samp = scored.withColumn("_u", puniform(["s", "p", "o"], "ifsamp"))
    samp = grouped_ordinal(samp, ["p"], ["_u", "s", "o"], out="_rn") \
        .where(F.col("_rn") <= IF_SAMPLE)
    samples = _if_samples_from_rows(
        (r["s"], r["p"], r["o"], r[score_col])
        for r in samp.select("s", "p", "o", score_col).collect())
    intervals, cns = _if_fit(samples)

    if not intervals:
        return zscore_outlier(scored, score_col)
    # Per-relation nested arrays instead of an interval JOIN: joining
    # facts to the leaf table on the range predicate compiles to a
    # broadcast nested-loop join that GENERATES |facts| × |leaves| rows
    # before filtering — 10^13 at a 10^9-fact corpus. Packing each
    # relation's forest as (cuts[tree], hs[tree]) arrays makes scoring a
    # 4-row broadcast equi-join + whole-stage-codegen array lookups:
    # leaf index = #cuts ≤ score (the same ~trees×leaves comparisons a
    # forest evaluation inherently costs, with no row explosion).
    by_p: dict[int, dict[int, list]] = {}
    for p, t, lo, hi, h in intervals:
        by_p.setdefault(p, {}).setdefault(t, []).append((lo, hi, h))
    arr_rows = []
    for p, trees in sorted(by_p.items()):
        cuts, hs = [], []
        for t in sorted(trees):
            leaves = sorted(trees[t])
            cuts.append([lo for lo, _, _ in leaves[1:]])  # drop -inf
            hs.append([h for _, _, h in leaves])
        arr_rows.append((p, cuts, hs))
    adf = F.broadcast(spark.createDataFrame(
        arr_rows,
        "p int, cuts array<array<double>>, hs array<array<double>>"))
    cdf = F.broadcast(spark.createDataFrame(cns, "p int, cn double"))

    x = F.col(score_col)
    n_trees = F.size("cuts")
    tree_h = F.zip_with(
        "cuts", "hs",
        lambda c, h: F.element_at(
            h, (F.size(F.filter(c, lambda b: b <= x)) + 1).cast("int")))
    eh = (F.aggregate(tree_h, F.lit(0.0), lambda acc, v: acc + v)
          / n_trees.cast("double"))
    j = scored.join(adf, "p", "left") \
        .withColumn("_eh", F.when(F.col("cuts").isNotNull(), eh)) \
        .join(cdf, "p", "left").join(F.broadcast(stats), "p")
    s_if = F.pow(F.lit(2.0), -F.col("_eh") / F.col("cn"))
    dec = F.lit(0.5) - s_if
    fallback = F.when(F.col("_sd") > 0,
                      (F.col(score_col) - F.col("_mu")) / F.col("_sd")) \
        .otherwise(F.lit(1.0))
    adj = F.when(F.col(score_col) >= F.col("_mu"), F.lit(1.0)) \
        .otherwise(F.when(F.col("cn").isNull(), fallback).otherwise(dec))
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


def iforest_outlier_sql(triples_cte: str, sf_dir: str | None = None) -> str:
    """Exact oracle for iforest_outlier over SDValidate scores: the
    deterministic forest is fitted Spark-free (DuckDB computes the same
    sdv scores, the shared sampling + tree builder runs in Python) and
    its leaf intervals embedded as VALUES; scoring is the identical
    interval join in SQL."""
    import duckdb

    from kgspark.dialect import materialize_ctes
    from kgspark.patybred import _sql_num
    from kgspark.scoring import sdvalidate_ctes
    from kgspark.util import oracle_sf_dir

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{sf_dir or oracle_sf_dir()}/documents.parquet')")
    sdv = con.execute(materialize_ctes(
        f"WITH {kg_ctes(triples_cte)}, {sdvalidate_ctes('enc')} "
        "SELECT s, p, o, score FROM sdv")).df()
    con.close()
    samples = _if_samples_from_rows(
        (r.s, r.p, r.o, r.score) for r in sdv.itertuples())
    intervals, cns = _if_fit(samples)
    ivals = ", ".join(
        f"({p}, {t}, {_sql_num(lo)}, {_sql_num(hi)}, {_sql_num(h)})"
        for p, t, lo, hi, h in intervals) or \
        "(0, 0, CAST('0.0' AS DOUBLE), CAST('0.0' AS DOUBLE), CAST('0.0' AS DOUBLE))"
    cvals = ", ".join(f"({p}, {_sql_num(cn)})" for p, cn in cns) or \
        "(0, CAST('0.0' AS DOUBLE))"
    return f"""
WITH {kg_ctes(triples_cte)}, {sdvalidate_ctes('enc')},
ifs(fp, tree, lo, hi, h) AS (VALUES {ivals}),
ifc(fp, cn) AS (VALUES {cvals}),
ifst AS (SELECT p, avg(score) AS mu, stddev_samp(score) AS sd
         FROM sdv GROUP BY p),
ifeh AS (
  SELECT sdv.s, sdv.p, sdv.o, avg(ifs.h) AS eh
  FROM sdv JOIN ifs ON ifs.fp = sdv.p
   AND sdv.score >= ifs.lo AND sdv.score < ifs.hi
  GROUP BY sdv.s, sdv.p, sdv.o)
SELECT sdv.s, sdv.p, sdv.o, sdv.score,
  round(CASE WHEN sdv.score >= ifst.mu THEN 1.0
             WHEN ifc.fp IS NULL THEN
               CASE WHEN ifst.sd > 0
                    THEN (sdv.score - ifst.mu) / ifst.sd ELSE 1.0 END
             ELSE 0.5 - pow(2.0, -ifeh.eh / ifc.cn) END, 6) AS adj_score
FROM sdv
LEFT JOIN ifeh ON ifeh.s = sdv.s AND ifeh.p = sdv.p AND ifeh.o = sdv.o
LEFT JOIN ifc ON ifc.fp = sdv.p
JOIN ifst ON ifst.p = sdv.p
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
