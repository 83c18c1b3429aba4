"""Fact ranking + error-detection evaluation metrics (SURVEY §2 W1-W3, A7-A8).

Reference semantics:
* ordinal ranking ascending by score (most suspect first) —
  /root/reference/detect_errors.py:29 (``rankdata(method='ordinal')``),
  /root/reference/rank_facts.py:135-142. Ties broken by (s, p, o) for
  determinism (the reference inherits numpy's unstable order).
* filtered rank: subtract the count of better-ranked errors —
  /root/reference/detect_errors.py:16-22.
* MeanRank / MRR / FMeanRank / FMRR / ROC-AUC / PR-AUC on negated scores —
  /root/reference/detect_errors.py:25-47. AUCs are computed exactly via
  rank algebra (Mann-Whitney with average ranks; AP with threshold-grouped
  cumulative precision — the same tie handling as sklearn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kgspark.ordering import global_ordinal


def rank_facts(scored: DataFrame, score_col: str = "score") -> DataFrame:
    """→ input + ordinal ``rank`` ascending (score, s, p, o)."""
    return global_ordinal(scored, [score_col, "s", "p", "o"], out="rank")


def evaluate(ranked: DataFrame, flag_col: str = "is_error") -> DataFrame:
    """1-row metrics DataFrame over a ranked, error-flagged fact table."""
    n = ranked.count()
    errs = ranked.where(F.col(flag_col))
    w = Window.orderBy("rank")  # error subset only: tiny
    errs = errs.withColumn("f_rank", F.col("rank") - F.row_number().over(w) + 1)

    base = errs.agg(
        F.avg("rank").alias("mean_rank"),
        F.avg(1.0 / F.col("rank")).alias("mrr"),
        F.avg("f_rank").alias("f_mean_rank"),
        F.avg(1.0 / F.col("f_rank")).alias("f_mrr"),
        F.count("*").alias("n_errors"),
    ).withColumn("n_facts", F.lit(n).cast("long"))

    aucs = auc_metrics(ranked, flag_col)
    return base.crossJoin(aucs)


def auc_metrics(scored: DataFrame, flag_col: str = "is_error",
                score_col: str = "score") -> DataFrame:
    """ROC-AUC + PR-AUC of (low score ⇒ error), via threshold groups.

    Grouping by distinct score keeps the aggregation small and exact; the
    ascending-score order means "most suspect first", matching the
    reference's roc_auc_score(errors, -scores).
    """
    g = (
        scored.groupBy(score_col)
        .agg(
            F.sum(F.col(flag_col).cast("long")).alias("e"),
            F.count("*").alias("c"),
        )
    )
    w = Window.orderBy(score_col)
    g = g.withColumn("cum_e", F.sum("e").over(w)).withColumn("cum_c", F.sum("c").over(w))
    # average rank of the tie group (ascending score): cum_c - c + (c+1)/2
    g = g.withColumn("avg_rank", F.col("cum_c") - F.col("c") + (F.col("c") + 1) / 2.0)
    return g.agg(
        (
            1.0
            - (
                (F.sum(F.col("avg_rank") * F.col("e"))
                 - F.sum("e") * (F.sum("e") + 1) / 2.0)
                / (F.sum("e") * (F.sum("c") - F.sum("e")))
            )
        ).alias("roc_auc"),
        (
            F.sum(F.col("e") * F.col("cum_e") / F.col("cum_c")) / F.sum("e")
        ).alias("pr_auc"),
    )


# ---------------------------------------------------------------- SQL (oracle)


def rank_sql(scored_cte: str, round_to: int = 6) -> str:
    """Oracle: ordinal rank over a (s,p,o,score) CTE."""
    return f"""
WITH sc AS ({scored_cte})
SELECT s, p, o, round(score, {round_to}) AS score,
       CAST(row_number() OVER (ORDER BY score, s, p, o) AS BIGINT) AS rank
FROM sc
"""


def evaluate_sql(flagged_cte: str, round_to: int = 6) -> str:
    """Oracle: metrics over a (s,p,o,score,is_error) CTE."""
    return f"""
WITH sc AS ({flagged_cte}),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY score, s, p, o) AS BIGINT) AS rank FROM sc),
e AS (SELECT rank, rank - row_number() OVER (ORDER BY rank) + 1 AS f_rank
      FROM r WHERE is_error),
base AS (SELECT avg(rank) AS mean_rank, avg(1.0 / rank) AS mrr,
                avg(f_rank) AS f_mean_rank, avg(1.0 / f_rank) AS f_mrr,
                count(*) AS n_errors FROM e),
g AS (SELECT score, sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS e, count(*) AS c
      FROM r GROUP BY score),
cg AS (SELECT *, sum(e) OVER (ORDER BY score) AS cum_e,
              sum(c) OVER (ORDER BY score) AS cum_c FROM g),
a AS (SELECT
  1.0 - ((sum((cum_c - c + (c + 1) / 2.0) * e) - sum(e) * (sum(e) + 1) / 2.0)
         / (sum(e) * (sum(c) - sum(e)))) AS roc_auc,
  sum(e * cum_e * 1.0 / cum_c) / sum(e) AS pr_auc FROM cg)
SELECT round(mean_rank, {round_to}) AS mean_rank, round(mrr, {round_to}) AS mrr,
       round(f_mean_rank, {round_to}) AS f_mean_rank, round(f_mrr, {round_to}) AS f_mrr,
       n_errors, (SELECT count(*) FROM r) AS n_facts,
       round(roc_auc, {round_to}) AS roc_auc, round(pr_auc, {round_to}) AS pr_auc
FROM base, a
"""
