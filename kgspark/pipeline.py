"""End-to-end KG construction + error-detection pipeline composition.

Mirrors the reference entry points (SURVEY §3):
  E1 ingest   → build_graph      (load_kb.py analog)
  E2 rank     → flagship_ranked  (rank_facts.py analog, SDValidate scorer)
  E3 evaluate → flagship_metrics (detect_errors.py analog)

Every stage also has a DuckDB oracle builder so the whole chain is
value-checked end-to-end at sf0.01 by the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark import encode, errorsgen, extract, rank, scoring, synth, typesys


from kgspark.util import materialize  # re-export (bench/tests import from here)


@dataclass
class Graph:
    repo_files: DataFrame
    triples_raw: DataFrame  # pre-linking (subj, pred, obj) strings
    triples_str: DataFrame  # canonicalized (subj, pred, obj) strings
    entities: DataFrame
    relations: DataFrame
    triples: DataFrame  # encoded (s, p, o)
    types: DataFrame
    type_names: DataFrame
    n_entities: int


_GRAPH_MEMO: dict[tuple[int, str], Graph] = {}


def build_graph(spark: SparkSession, sf_dir: str, cache: bool = True,
                variant: str = "base") -> Graph:
    """Construct (and per-session memoize) the full KG from a testdata dir.

    ``variant='rich'`` builds from the 6-relation rich corpus
    (synth.repo_files_rich) used by the reference-gate correction queries.
    """
    key = (id(spark), sf_dir, variant)
    if cache and key in _GRAPH_MEMO:
        return _GRAPH_MEMO[key]
    g = _build_graph(spark, sf_dir, cache, variant)
    if cache:
        _GRAPH_MEMO[key] = g
    return g


def _build_graph(spark: SparkSession, sf_dir: str, cache: bool = True,
                 variant: str = "base") -> Graph:
    from kgspark import link

    rf = (synth.repo_files_rich(spark, sf_dir) if variant == "rich"
          else synth.repo_files(spark, sf_dir))
    # base corpus carries no file→file mention lines: arms off (zero cost)
    tr_raw = extract.extract_triples(rf, file_mentions=(variant == "rich"))
    if cache:
        tr_raw = materialize(tr_raw)
    # entity linking + canonicalization (MinHash-LSH blocking + iterative CC)
    tr = link.canonicalize_triples(tr_raw)
    if cache:
        tr = materialize(tr)
    ents, rels = encode.build_dims(tr)
    if cache:
        ents, rels = materialize(ents), materialize(rels)
    enc = encode.encode_triples(tr, ents, rels)
    if cache:
        enc = materialize(enc)
    types, tnames = typesys.build_types(ents, enc, rels)
    if cache:
        types = materialize(types)
    return Graph(rf, tr_raw, tr, ents, rels, enc, types, tnames, ents.count())


# Flagship (SDValidate-scored) intermediates, memoized per
# (session, sf, p_error): six driver queries (ranked, ranked_avg, metrics,
# corrections, type_corrections, corrected_triples) consume the same
# noisy→score→rank chain.
_FLAGSHIP_MEMO: dict[tuple, DataFrame] = {}


def noisy_facts(g: Graph, p_error: float = 0.05, kind: int = 1,
                replace: bool = False) -> DataFrame:
    """True facts ∪ injected errors with an ``is_error`` flag (U6).

    ``replace=True`` removes each corrupted fact's ORIGINAL from the
    graph (the realistic typo-confusion regime the reference's repair
    targets: the wrong triple is present, the right one is absent —
    /root/reference/correct_errors.py:99-141). Default keeps originals
    (additive injection, the generate_errors.py evaluation shape).
    """
    if kind == 1:
        errs = errorsgen.inject_errors_kind1(g.triples, g.n_entities, p_error)
    elif kind == 2:
        errs = errorsgen.inject_errors_kind2(g.triples, g.types, p_error)
    else:
        errs = errorsgen.inject_errors_kind3(g.triples, g.entities, p_error,
                                             n_entities=g.n_entities)
    base = g.triples
    if replace:
        base = base.join(
            errs.select(F.col("orig_s").alias("s"), "p",
                        F.col("orig_o").alias("o")),
            ["s", "p", "o"], "left_anti")
    return base.select(
        "s", "p", "o", F.lit(False).alias("is_error")
    ).unionByName(errs.select("s", "p", "o", F.lit(True).alias("is_error")))


def flagship_ranked(spark: SparkSession, sf_dir: str,
                    p_error: float = 0.05) -> DataFrame:
    """Noisy graph → SDValidate score → global ordinal rank (most suspect first)."""
    key = (id(spark), sf_dir, p_error)
    hit = _FLAGSHIP_MEMO.get(key)
    if hit is not None:
        return hit
    g = build_graph(spark, sf_dir)
    noisy = materialize(noisy_facts(g, p_error))
    scores = scoring.sdvalidate_scores(noisy.select("s", "p", "o"), g.types)
    scores = materialize(scores.withColumn("score", F.round("score", 6)))
    ranked = rank.rank_facts(scores)
    res = materialize(ranked.join(noisy, ["s", "p", "o"]).select(
        "s", "p", "o", "score", "rank", "is_error"
    ))
    _FLAGSHIP_MEMO[key] = res
    return res


def flagship_ranked_avg(spark: SparkSession, sf_dir: str,
                        p_error: float = 0.05) -> DataFrame:
    """flagship_ranked with scipy's default *average* tie ranks (the
    reference rank_facts.py:136 variant; W1 per-call-site choice)."""
    g = build_graph(spark, sf_dir)
    noisy = materialize(noisy_facts(g, p_error))
    scores = scoring.sdvalidate_scores(noisy.select("s", "p", "o"), g.types)
    scores = materialize(scores.withColumn("score", F.round("score", 6)))
    ranked = rank.rank_facts_average(scores)
    return ranked.join(noisy, ["s", "p", "o"]).select(
        "s", "p", "o", "score", "rank", "is_error"
    )


def flagship_metrics(spark: SparkSession, sf_dir: str,
                     p_error: float = 0.05) -> DataFrame:
    ranked = flagship_ranked(spark, sf_dir, p_error)
    m = rank.evaluate(ranked)
    return m.select(
        *[F.round(c, 6).alias(c) for c in
          ("mean_rank", "mrr", "f_mean_rank", "f_mrr")],
        "n_errors", "n_facts",
        F.round("roc_auc", 6).alias("roc_auc"),
        F.round("pr_auc", 6).alias("pr_auc"),
    )


# ---------------------------------------------------------------- SQL (oracle)


def _noisy_ctes(raw_cte: str, p_error: float) -> str:
    return f"""
{typesys.kg_ctes(raw_cte)},
{errorsgen.errors_kind1_ctes(p_error)},
noisy AS (
  SELECT s, p, o, FALSE AS is_error FROM enc
  UNION ALL
  SELECT s, p, o, TRUE AS is_error FROM errfin),
noisyf AS (SELECT s, p, o FROM noisy),
{scoring.sdvalidate_ctes('noisyf')},
flg AS (SELECT sdv.s, sdv.p, sdv.o, sdv.score, noisy.is_error
        FROM sdv JOIN noisy ON noisy.s = sdv.s AND noisy.p = sdv.p AND noisy.o = sdv.o)
"""


def flagship_ranked_sql(raw_cte: str, p_error: float = 0.05) -> str:
    return f"""
WITH {_noisy_ctes(raw_cte, p_error)}
SELECT s, p, o, score,
       CAST(row_number() OVER (ORDER BY score, s, p, o) AS BIGINT) AS rank,
       is_error
FROM flg
"""


def flagship_ranked_avg_sql(raw_cte: str, p_error: float = 0.05) -> str:
    return f"""
WITH {_noisy_ctes(raw_cte, p_error)},
g AS (SELECT score, count(*) AS c FROM flg GROUP BY score),
cg AS (SELECT score, c, sum(c) OVER (ORDER BY score) AS cum_c FROM g),
rk AS (SELECT score, cum_c - c + (c + 1) / 2.0 AS rank FROM cg)
SELECT flg.s, flg.p, flg.o, flg.score, rk.rank, flg.is_error
FROM flg JOIN rk ON rk.score = flg.score
"""


def flagship_metrics_sql(raw_cte: str, p_error: float = 0.05) -> str:
    flagged = (f"WITH {_noisy_ctes(raw_cte, p_error)} "
               "SELECT s, p, o, score, is_error FROM flg")
    return rank.evaluate_sql(flagged)
