"""Triple extraction: repo_files → (subj, pred, obj) string triples.

Reference analog: the NT line-scan + regex parse at
/root/reference/load_kb.py:9-10,61-96 — there, triples come from an NT
file; here (per the north rule) they are *mention-detected* from source
code content with Arrow-batched pandas UDFs (no per-row Python):

    repo   --contains-->   file
    file   --written_in--> lang
    file   --imports-->    module      (regex over content)
    file   --defines-->    symbol      (regex over content)

The emitted triple set is exact and deduplicated, matching the boolean
adjacency-tensor semantics of /root/reference/load_kb.py:169-172.

Scale notes: extraction is embarrassingly parallel (narrow ops up to the
final dedup). The dedup groups by (subj, pred, obj); `pred` is extremely
hot (4 values) so it must NOT be the leading shuffle key alone — Spark
hash-partitions on all three columns, which distributes fine. Column
pruning pushes `content` reads only into the two regex branches.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Portable across Python re / Java regex / RE2 (DuckDB oracle).
IMPORT_PATTERN = r"(?:^|\n)[ \t]*(?:import|from)[ \t]+([A-Za-z_][A-Za-z0-9_.]*)"
DEFINE_PATTERN = r"(?:^|\n)[ \t]*(?:def|class)[ \t]+([A-Za-z_][A-Za-z0-9_]*)"
# file→file mention patterns (only produced by the RICH fixture content,
# kgspark.synth._CONTENT_RICH — the base corpus contains no such lines, so
# base-corpus extraction output is unchanged by these arms). The include
# target is repo-relative, so the object entity is file:<own repo>/<path>.
INCLUDE_PATTERN = r"(?:^|\n)[ \t]*include[ \t]+([A-Za-z0-9_./]+)"
TESTEDBY_PATTERN = r"(?:^|\n)[ \t]*testedby[ \t]+([A-Za-z0-9_./]+)"

PREDICATES = ("contains", "written_in", "imports", "defines",
              "includes", "tested_by")

_import_re = re.compile(IMPORT_PATTERN)
_define_re = re.compile(DEFINE_PATTERN)


@F.pandas_udf(ArrayType(StringType()))
def extract_imports(content: pd.Series) -> pd.Series:
    """Arrow-batched mention detector for imported modules."""
    return content.str.findall(_import_re)


@F.pandas_udf(ArrayType(StringType()))
def extract_defines(content: pd.Series) -> pd.Series:
    """Arrow-batched mention detector for defined symbols."""
    return content.str.findall(_define_re)


def file_entity() -> F.Column:
    return F.concat(F.lit("file:"), F.col("repo"), F.lit("/"), F.col("path"))


def extract_triples(repo_files: DataFrame, use_pandas_udf: bool = False,
                    file_mentions: bool | None = None) -> DataFrame:
    """repo_files → distinct (subj, pred, obj) string triples.

    SINGLE-SCAN plan: one projection builds every mention array (two
    structural arms + four content detectors), concatenated into one
    array of (subj, pred, obj) structs and exploded once — the source
    (and its wide ``content`` column) is read exactly once per row,
    instead of once per relation arm. The only shuffle is the final
    dedup.

    ``use_pandas_udf=False`` (the default — guide §4.1: prefer built-ins)
    runs the import/define mention detectors as Spark's JVM-side
    ``regexp_extract_all`` — identical output (pinned by
    tests/test_extract.py), no Python worker boundary, no
    ArrowEvalPython node in the plan. ``use_pandas_udf=True`` swaps in
    the Arrow-batched pandas detectors — the general mention-detection
    hook (tokenizers, tree-sitter, …) for extractors a regex cannot
    express. The file→file detectors (rich corpus) are plain path
    tokens and always run JVM-side; repo-relative targets resolve to
    the mentioning file's own repo.

    ``file_mentions`` gates the two file→file detectors (includes /
    tested_by — only the RICH fixture content produces them):
    * ``None`` (default): auto — each regex runs only on rows passing a
      cheap ``contains(content, token)`` pre-filter (the regex requires
      the literal token, so output is identical; non-matching corpora
      pay a substring scan instead of two full regex passes).
    * ``False``: arms off entirely (zero cost — for corpora known to
      carry no file-mention lines, e.g. the base pipeline variant).
    * ``True``: unconditional regex (rich-corpus pipelines).
    """
    fe = file_entity()

    if use_pandas_udf:
        imp_arr = extract_imports(F.col("content"))
        def_arr = extract_defines(F.col("content"))
    else:
        imp_arr = F.expr(f"regexp_extract_all(content, '{IMPORT_PATTERN}', 1)")
        def_arr = F.expr(f"regexp_extract_all(content, '{DEFINE_PATTERN}', 1)")
    empty = F.array().cast("array<string>")
    if file_mentions is False:
        inc_arr = tst_arr = empty
    else:
        inc_arr = F.expr(f"regexp_extract_all(content, '{INCLUDE_PATTERN}', 1)")
        tst_arr = F.expr(f"regexp_extract_all(content, '{TESTEDBY_PATTERN}', 1)")
        if file_mentions is None:  # auto: token pre-filter guards the regex
            inc_arr = F.when(F.contains("content", F.lit("include")),
                             inc_arr).otherwise(empty)
            tst_arr = F.when(F.contains("content", F.lit("testedby")),
                             tst_arr).otherwise(empty)

    def triple(subj, pred: str, obj):
        return F.struct(subj.alias("subj"), F.lit(pred).alias("pred"),
                        obj.alias("obj"))

    fixed = F.array(
        triple(F.concat(F.lit("repo:"), F.col("repo")), "contains", fe),
        triple(fe, "written_in", F.concat(F.lit("lang:"), F.col("lang"))),
    )
    own_file = F.concat(F.lit("file:"), F.col("repo"), F.lit("/"))
    mentions = F.concat(
        fixed,
        F.transform(imp_arr, lambda m: triple(
            fe, "imports", F.concat(F.lit("module:"), m))),
        F.transform(def_arr, lambda m: triple(
            fe, "defines", F.concat(F.lit("sym:"), m))),
        F.transform(inc_arr, lambda m: triple(
            fe, "includes", F.concat(own_file, m))),
        F.transform(tst_arr, lambda m: triple(
            fe, "tested_by", F.concat(own_file, m))),
    )
    return (
        repo_files.select(F.explode(mentions).alias("t"))
        .select("t.subj", "t.pred", "t.obj")
        .distinct()
    )


# Default deny-list: mention analog of the reference's ontology-namespace
# entity filter (load_kb.py:12,21-25 drops OWL/RDF/RDFS/... entities, and
# -nocat drops dct:subject edges). Here: standard-library-ish module
# mentions carry no linkable signal.
DENY_PREFIXES = ("module:sys", "module:os", "module:util")


def filter_entities(triples: DataFrame,
                    deny_prefixes: tuple[str, ...] = DENY_PREFIXES) -> DataFrame:
    """S2: drop triples whose subject/object matches a deny-prefix list."""
    cond = None
    for p in deny_prefixes:
        c = F.col("subj").startswith(p) | F.col("obj").startswith(p)
        cond = c if cond is None else (cond | c)
    return triples.where(~cond) if cond is not None else triples


# ---------------------------------------------------------------- SQL (oracle)


def triples_raw_sql(repo_files_cte: str) -> str:
    """DuckDB oracle for :func:`extract_triples` (expects a repo_files CTE body)."""
    return f"""
WITH rf AS ({repo_files_cte}),
fe AS (SELECT 'file:' || repo || '/' || path AS f, * FROM rf),
imp AS (
  SELECT f AS subj, 'imports' AS pred,
         'module:' || unnest(regexp_extract_all(content, '{IMPORT_PATTERN}', 1)) AS obj
  FROM fe),
defs AS (
  SELECT f AS subj, 'defines' AS pred,
         'sym:' || unnest(regexp_extract_all(content, '{DEFINE_PATTERN}', 1)) AS obj
  FROM fe),
incl AS (
  SELECT f AS subj, 'includes' AS pred,
         'file:' || repo || '/' || unnest(regexp_extract_all(content, '{INCLUDE_PATTERN}', 1)) AS obj
  FROM fe),
tstd AS (
  SELECT f AS subj, 'tested_by' AS pred,
         'file:' || repo || '/' || unnest(regexp_extract_all(content, '{TESTEDBY_PATTERN}', 1)) AS obj
  FROM fe),
uni AS (
  SELECT 'repo:' || repo AS subj, 'contains' AS pred, f AS obj FROM fe
  UNION ALL
  SELECT f, 'written_in', 'lang:' || lang FROM fe
  UNION ALL SELECT * FROM imp
  UNION ALL SELECT * FROM defs
  UNION ALL SELECT * FROM incl
  UNION ALL SELECT * FROM tstd)
SELECT DISTINCT subj, pred, obj FROM uni
"""


def filtered_triples_sql(repo_files_cte: str,
                         deny_prefixes: tuple[str, ...] = DENY_PREFIXES) -> str:
    def lk(p: str) -> str:
        # LIKE treats _ and % as wildcards; the deny list is LITERAL
        # prefixes (Spark-side startswith), so escape both
        esc = p.replace("\\", "\\\\").replace("_", "\\_").replace("%", "\\%")
        return f"'{esc}%' ESCAPE '\\'"

    conds = " AND ".join(
        f"subj NOT LIKE {lk(p)} AND obj NOT LIKE {lk(p)}"
        for p in deny_prefixes
    )
    return (f"WITH t0 AS ({triples_raw_sql(repo_files_cte)}) "
            f"SELECT subj, pred, obj FROM t0 WHERE {conds}")
