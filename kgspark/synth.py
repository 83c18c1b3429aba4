"""Deterministic synthesis of the north-rule input table ``repo_files``.

The pipeline input shape is fixed by BASELINE.json's input_hint:
``repo_files(repo string, path string, commit string, lang string,
content string)``. No external data is allowed, so we derive it
deterministically from the sandbox ``documents`` parquet table (driver
generated, seed 42) with a single SQL template that BOTH Spark SQL and
DuckDB evaluate identically — this is what makes every downstream stage
oracle-checkable end-to-end.

Design goals mirrored from FIXTURES.md §1:
  * skewed repo distribution (floor(sqrt(u)) over a uniform key gives a
    linearly increasing repo-size histogram) to exercise repo-key salting;
  * hot ``lang`` values (50% python) to exercise hot-predicate salting of
    ``written_in``;
  * near-duplicate / casing-variant module mentions (``mod_7`` vs ``Mod_7``
    vs ``mod7``) to exercise linking + canonicalization (reference analog:
    entity disambiguation, /root/reference/entityasm.py:16-47).

Only dialect-portable functions appear in the template: ``||``, CASE,
floor, sqrt, md5, substr, replace, chr, %.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Number of distinct repos ≈ sqrt(REPO_KEYSPACE); linear size skew.
REPO_KEYSPACE = 2500
N_MODULES = 97
N_FUNCS = 53
N_CLASSES = 41

_LANG = (
    "CASE WHEN doc_id % 10 <= 4 THEN 'python' "
    "WHEN doc_id % 10 <= 6 THEN 'java' "
    "WHEN doc_id % 10 = 7 THEN 'go' "
    "WHEN doc_id % 10 = 8 THEN 'js' "
    "ELSE 'ruby' END"
)

_EXT = (
    "CASE WHEN doc_id % 10 <= 4 THEN '.py' "
    "WHEN doc_id % 10 <= 6 THEN '.java' "
    "WHEN doc_id % 10 = 7 THEN '.go' "
    "WHEN doc_id % 10 = 8 THEN '.js' "
    "ELSE '.rb' END"
)

_M1 = "CAST(doc_id % 97 AS {STR})"
# module-name variants (canonicalization fixture): every 13th file uses a
# casing variant, every 17th an edit-distance-1 variant (missing underscore)
_NAME1 = (
    "CASE WHEN doc_id % 13 = 0 THEN 'Mod_' || " + _M1 + " "
    "WHEN doc_id % 17 = 0 THEN 'mod' || " + _M1 + " "
    "ELSE 'mod_' || " + _M1 + " END"
)

_CONTENT = (
    "'import ' || " + _NAME1 + " || chr(10) || "
    "'import mod_' || CAST((doc_id * 7 + 3) % 97 AS {STR}) || chr(10) || "
    "'from mod_' || CAST((doc_id * 13 + 5) % 97 AS {STR}) || ' import util' || chr(10) || "
    "'def func_' || CAST(doc_id % 53 AS {STR}) || '(x):' || chr(10) || "
    "'    return x + ' || CAST(doc_id % 9 AS {STR}) || chr(10) || "
    "'class Cls' || CAST(doc_id % 41 AS {STR}) || ':' || chr(10) || "
    "'    pass' || chr(10) || "
    "'# doc: ' || replace(substr(text, 1, 100), chr(10), ' ')"
)

_TEMPLATE = """
SELECT
  'org' || CAST(CAST(floor(sqrt(CAST(doc_id % 2500 AS DOUBLE))) AS BIGINT) AS {STR}) || '/repo' AS repo,
  'src/m' || CAST(doc_id AS {STR}) || {EXT} AS path,
  md5(CAST(doc_id AS {STR})) || substr(md5('c' || CAST(doc_id AS {STR})), 1, 8) AS {Q}commit{Q},
  {LANG} AS lang,
  {CONTENT} AS content
FROM {DOCS}
"""


# ------------------------------------------------------------ rich variant
#
# The 4-relation star vocabulary makes per-relation PaTyBRED scores nearly
# constant: no depth-≤2 path connects a fact's endpoints besides its own
# relation, so only type features remain and the reference's correction
# acceptance gate (new/old ≥ 1.5 AND new > 0.75,
# /root/reference/correct_errors.py:126-141) never fires non-trivially.
# The RICH corpus adds two mutually-correlated file→file relations —
# every file `includes` and is `testedby` its sibling (doc_id xor 1) —
# so each `includes` fact carries a discriminative parallel-edge path
# feature (`tested_by` connecting the same endpoints). A typo-confused
# object loses that path, scores low, and the true sibling re-scores high:
# exactly the regime where the published gate accepts. Objects are files
# (kind:file + lang:* — ≥2 types), satisfying the reference's
# multi-typed-object replacement guard (correct_errors.py:99-112).
# The sibling expression (doc_id + 1 - 2*(doc_id % 2)) is dialect-portable.

_X = "(doc_id + 1 - 2*(doc_id % 2))"
_EXTX = _EXT.replace("doc_id", _X)

_CONTENT_RICH = (
    _CONTENT + " || chr(10) || "
    "'include src/m' || CAST(" + _X + " AS {STR}) || " + _EXTX + " || chr(10) || "
    "'testedby src/m' || CAST(" + _X + " AS {STR}) || " + _EXTX
)


def _render(dialect: str, docs_rel: str, content: str) -> str:
    if dialect == "duckdb":
        str_t, q = "VARCHAR", '"'
    else:
        str_t, q = "STRING", "`"
    sql = _TEMPLATE.format(
        STR="{STR}", EXT=_EXT, LANG=_LANG, CONTENT=content, Q=q, DOCS=docs_rel
    )
    return sql.replace("{STR}", str_t)


def repo_files_sql(dialect: str, docs_rel: str = "documents") -> str:
    """The synthesis query in the given dialect ('spark' | 'duckdb')."""
    return _render(dialect, docs_rel, _CONTENT)


def repo_files_rich_sql(dialect: str, docs_rel: str = "documents") -> str:
    """Rich-vocabulary synthesis (adds include/testedby sibling lines)."""
    return _render(dialect, docs_rel, _CONTENT_RICH)


def repo_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the deterministic repo_files DataFrame for a testdata dir.

    No input spread here: the extraction regexes are cheap enough per
    row that a repartition of the content column costs more than the
    serial scan saves (measured — warm extract 0.7s serial vs 1.5s
    spread at sf0.1); heavy per-row consumers (shingling, hashing)
    spread their own input instead."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("kgspark_documents")
    return spark.sql(repo_files_sql("spark", "kgspark_documents"))


def repo_files_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-vocabulary repo_files (6-relation corpus; see _CONTENT_RICH)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("kgspark_documents")
    return spark.sql(repo_files_rich_sql("spark", "kgspark_documents"))


def repo_files_scaled(spark: SparkSession, sf_dir: str, replicate: int) -> DataFrame:
    """Deterministically replicate the corpus ``replicate``× for scaling
    runs (no external data): copy k gets doc_ids offset by k·10^6, giving
    distinct files/repos but the same skew shape. Used by bench --scaling
    so compute, not fixed overhead, dominates the N-vs-4N comparison."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    # Drive the fan-out from the (partitioned) range and BROADCAST the tiny
    # docs table: the parquet source is one file = one scan split, so a
    # docs-driven cross join would funnel the whole replicated corpus
    # through a single task before any parallelism exists.
    n_parts = spark.sparkContext.defaultParallelism * 2
    reps = spark.range(0, replicate, 1, n_parts).select(F.col("id").alias("_k"))
    scaled = reps.join(F.broadcast(docs)).select(
        (F.col("doc_id") + F.col("_k") * 1_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    scaled.createOrReplaceTempView("kgspark_documents_scaled")
    return spark.sql(repo_files_sql("spark", "kgspark_documents_scaled"))
