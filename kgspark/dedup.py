"""Deduplication operators over the ``documents`` table.

Beyond the reference's own operator set: the large-scale training-data
pipeline layer. All variants are deterministic and oracle-checkable:

* exact       — sha256 groupBy (hash dedup)
* MinHash+LSH — word-3-shingles → portable MinHash (12 hashes) → banded
                buckets (4x3) → candidate pairs → exact Jaccard verify
* SimHash     — 32-bit weighted-token simhash; near-dup pairs via byte-band
                blocking + Hamming distance
* n-gram Jaccard — exact Jaccard on LSH candidates (the verify join
                exposed as its own operator)

Scale notes: shingling is narrow; the signature groupBy is one shuffle on
doc_id; band buckets are the blocking join (bucket sizes bounded by
near-dup group sizes); the Jaccard verify joins only candidate pairs.
Exact all-pairs comparison never happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.hashing import phash32, sql_phash32

N_HASHES = 12
BAND_ROWS = 3
SIMHASH_BITS = 32

TOKENS_EXPR = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
_SHINGLES_EXPR = (
    "transform(sequence(1, greatest(size(tk) - 2, 1)),"
    " i -> concat_ws(' ', slice(tk, i, 3)))"
)
_SHINGLES_SQL = (
    "[array_to_string(tk[i:i+2], ' ') "
    "for i in generate_series(1, greatest(len(tk) - 2, 1))]"
)


def shingles(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, shingle) distinct word-3-shingles."""
    from kgspark.util import spread_input

    # single-file sources scan as ONE partition — spread before the
    # tokenize/explode pass so it parallelizes (no-op on wide scans)
    return (
        spread_input(docs)
        .select("doc_id", F.expr(TOKENS_EXPR).alias("tk"))
        .select("doc_id", F.explode(F.expr(_SHINGLES_EXPR)).alias("shingle"))
        .distinct()
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """→ (doc_id, rep, group_size): rep = min doc_id with identical sha256."""
    h = docs.select("doc_id", F.sha2("text", 256).alias("sha"))
    g = h.groupBy("sha").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("group_size")
    )
    return h.join(g, "sha").select("doc_id", "rep", "group_size")


def minhash_bands(items: DataFrame, id_col: str = "doc_id",
                  item_col: str = "shingle") -> DataFrame:
    """Generic portable MinHash banding → (id, band, key).

    The per-band rows come from ONE explode over the signature table
    instead of an N-band union — one scan of the aggregate, no repeated
    subtree per band.
    """
    aggs = [F.min(phash32([F.col(item_col)], f"mh{i}")).alias(f"h{i}")
            for i in range(N_HASHES)]
    sig = items.groupBy(id_col).agg(*aggs)
    bands = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.concat_ws("_", *[F.col(f"h{j * BAND_ROWS + r}").cast("string")
                               for r in range(BAND_ROWS)]).alias("key"))
        for j in range(N_HASHES // BAND_ROWS)])
    return (sig.select(F.col(id_col), F.explode(bands).alias("_bk"))
            .select(id_col, "_bk.band", "_bk.key"))


def lsh_pairs(items: DataFrame, id_col: str = "doc_id",
              item_col: str = "shingle") -> DataFrame:
    from kgspark.util import materialize

    # checkpoint the banded table: it feeds BOTH sides of the blocking
    # self-join (separate subtrees — the shingle aggregation would
    # otherwise execute twice)
    bd = materialize(minhash_bands(items, id_col, item_col))
    l = bd.select("band", "key", F.col(id_col).alias("a"))
    r = bd.select("band", "key", F.col(id_col).alias("b"))
    return (l.join(r, ["band", "key"]).where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def jaccard_verify(pairs: DataFrame, items: DataFrame,
                   id_col: str = "doc_id", item_col: str = "shingle",
                   threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs → (a, b, jaccard)."""
    sizes = items.groupBy(id_col).agg(F.count("*").alias("n"))
    ia = items.select(F.col(id_col).alias("a"), item_col)
    ib = items.select(F.col(id_col).alias("b"), item_col)
    inter = (
        pairs.join(ia, "a").join(ib, ["b", item_col])
        .groupBy("a", "b").agg(F.count("*").alias("inter"))
    )
    j = (
        pairs.join(inter, ["a", "b"], "left")
        .join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("n", "nb"), "b")
        .select(
            "a", "b",
            (F.coalesce("inter", F.lit(0)) /
             (F.col("na") + F.col("nb") - F.coalesce("inter", F.lit(0)))
             ).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold) if threshold > 0 else j


def dedup_minhash(docs: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH blocking + exact Jaccard ≥ τ."""
    from kgspark.util import materialize

    # the shingle table feeds the signature aggregate AND three arms of
    # the Jaccard verify — checkpoint it once
    sh = materialize(shingles(docs))
    cand = lsh_pairs(sh)
    return jaccard_verify(cand, sh, threshold=threshold) \
        .withColumn("jaccard", F.round("jaccard", 6))


def simhash(docs: DataFrame) -> DataFrame:
    """→ (doc_id, simhash): 32-bit term-frequency-weighted SimHash.

    Single-shuffle formulation: summing ±1 per token OCCURRENCE equals
    summing ±w per distinct (doc, token) with w = occurrence count —
    integer addition is exact, so the per-bit totals (and the signature)
    are identical while the (doc_id, token) pre-aggregation shuffle
    disappears; the per-doc groupBy partial-aggregates map-side.
    """
    from kgspark.util import spread_input

    toks = (
        spread_input(docs)
        .select("doc_id", F.explode(F.expr(TOKENS_EXPR)).alias("tok"))
        .withColumn("h", phash32([F.col("tok")], "simhash"))
    )
    bit_sums = toks.groupBy("doc_id").agg(*[
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ])
    expr = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return bit_sums.select("doc_id", F.expr(expr).alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash: byte-band blocking + Hamming verify.

    Any pair within Hamming ≤ 6 of 32 bits shares at least one of the four
    bytes when the differing bits concentrate — classic multi-index
    blocking; exact for max_hamming < 8 when differing bits span ≤3 bands
    (pigeonhole over 4 bands ⇒ one band untouched for hamming ≤ 3; for
    larger radii this is a recall-oriented filter, stated explicitly).
    """
    from kgspark.util import materialize

    # checkpoint the signature (feeds both self-join sides); bands come
    # from one explode instead of a 4-arm union, and each band row
    # CARRIES its signature so the Hamming verify needs no join back to
    # the signature table — the self-join is the only join left
    sh = materialize(simhash(docs))
    barr = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("simhash"), j * 8).bitwiseAND(F.lit(255))
            .alias("key"))
        for j in range(4)])
    bd = (sh.select("doc_id", "simhash", F.explode(barr).alias("_bk"))
          .select("doc_id", "simhash", "_bk.band", "_bk.key"))
    # pin the self-join width: the banded rows are few BYTES, so AQE
    # coalesces the join to one partition — but each bucket pair costs a
    # bit_count verify, i.e. the stage is CPU-dense, not byte-dense
    from kgspark.util import shuffle_parts
    bd = bd.repartition(shuffle_parts(bd), "band", "key")
    l = bd.select("band", "key", F.col("doc_id").alias("a"),
                  F.col("simhash").alias("ha"))
    r = bd.select("band", "key", F.col("doc_id").alias("b"),
                  F.col("simhash").alias("hb"))
    return (
        l.join(r, ["band", "key"]).where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(
            F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------- SQL (oracle)


def _shingles_ctes() -> str:
    return f"""
docsh AS (
  SELECT doc_id, {TOKENS_EXPR} AS tk FROM documents),
shing AS (
  SELECT DISTINCT doc_id,
         unnest({_SHINGLES_SQL}) AS shingle
  FROM docsh)
"""


def dedup_exact_sql() -> str:
    return """
WITH h AS (SELECT doc_id, sha256(text) AS sha FROM documents),
g AS (SELECT sha, min(doc_id) AS rep, count(*) AS group_size FROM h GROUP BY sha)
SELECT h.doc_id, g.rep, g.group_size FROM h JOIN g USING (sha)
"""


def _minhash_band_ctes() -> str:
    mins = ", ".join(
        "min(%s) AS h%d" % (
            sql_phash32("concat_ws('|', 'mh%d', shingle)" % i, "duckdb"), i)
        for i in range(N_HASHES)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, "
        + " || '_' || ".join(
            f"CAST(h{j * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS))
        + " AS key FROM dsig"
        for j in range(N_HASHES // BAND_ROWS)
    )
    return f"""
dsig AS (SELECT doc_id, {mins} FROM shing GROUP BY doc_id),
dbands AS ({band_rows}),
dcand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM dbands l JOIN dbands r ON l.band = r.band AND l.key = r.key
  WHERE l.doc_id < r.doc_id)
"""


def dedup_minhash_sql(threshold: float = 0.4) -> str:
    return f"""
WITH {_shingles_ctes()}, {_minhash_band_ctes()},
sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM dcand c JOIN shing x ON x.doc_id = c.a
  JOIN shing y ON y.doc_id = c.b AND y.shingle = x.shingle
  GROUP BY c.a, c.b),
jac AS (
  SELECT c.a, c.b,
         coalesce(inter.i, 0) * 1.0 /
         (sa.n + sb.n - coalesce(inter.i, 0)) AS jaccard
  FROM dcand c LEFT JOIN inter ON inter.a = c.a AND inter.b = c.b
  JOIN sizes sa ON sa.doc_id = c.a JOIN sizes sb ON sb.doc_id = c.b)
SELECT a, b, round(jaccard, 6) AS jaccard FROM jac WHERE jaccard >= {threshold}
"""


def _simhash_ctes() -> str:
    h = sql_phash32("concat_ws('|', 'simhash', tok)", "duckdb")
    bits = ", ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN w ELSE -w END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    val = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
dtok AS (
  SELECT doc_id, tok, count(*) AS w, {h} AS h FROM (
    SELECT doc_id, unnest({TOKENS_EXPR}) AS tok FROM documents)
  GROUP BY doc_id, tok),
dbsum AS (SELECT doc_id, {bits} FROM dtok GROUP BY doc_id),
dsim AS (SELECT doc_id, {val} AS simhash FROM dbsum)
"""


def simhash_sql() -> str:
    return f"WITH {_simhash_ctes()} SELECT doc_id, simhash FROM dsim"


def simhash_pairs_sql(max_hamming: int = 6) -> str:
    return f"""
WITH {_simhash_ctes()},
sbands AS (
  SELECT doc_id, band, (simhash // (CASE band WHEN 0 THEN 1 WHEN 1 THEN 256
    WHEN 2 THEN 65536 ELSE 16777216 END)) % 256 AS key
  FROM dsim, (SELECT unnest(generate_series(0, 3)) AS band) b),
scand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM sbands l JOIN sbands r ON l.band = r.band AND l.key = r.key
  WHERE l.doc_id < r.doc_id)
SELECT c.a, c.b, bit_count(xor(sa.simhash, sb.simhash)) AS hamming
FROM scand c JOIN dsim sa ON sa.doc_id = c.a JOIN dsim sb ON sb.doc_id = c.b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
"""
