"""Entity linking / canonicalization parity + semantics (sf0.001)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import extract, link, synth
from tests.conftest import SF_TINY, assert_df_equal


@pytest.fixture(scope="module")
def tr(spark):
    rf = synth.repo_files(spark, SF_TINY)
    return extract.extract_triples(rf).localCheckpoint()


@pytest.fixture(scope="module")
def raw_cte():
    return extract.triples_raw_sql(synth.repo_files_sql("duckdb"))


def test_lsh_pairs_parity(spark, duck, tr, raw_cte):
    got = link.lsh_candidate_pairs(link.normalize_mentions(tr))
    assert_df_equal(got, duck.execute(link.lsh_pairs_sql(raw_cte)))


def test_lsh_full_recall_on_equal_norm(spark, tr):
    """Equal normalized forms share all 3-grams → identical signatures →
    LSH recall 1.0 for the canonical (max_lev=0) rule."""
    m = link.normalize_mentions(tr).cache()
    want = (
        m.alias("x").join(m.alias("y"), F.col("x.norm") == F.col("y.norm"))
        .where(F.col("x.name") < F.col("y.name"))
        .select(F.col("x.name").alias("a"), F.col("y.name").alias("b"))
    )
    got = link.lsh_candidate_pairs(m)
    assert want.exceptAll(got).count() == 0


def test_canonical_map_parity(spark, duck, tr, raw_cte):
    assert_df_equal(link.canonical_map(tr), duck.execute(link.canonical_map_sql(raw_cte)))
    assert_df_equal(
        link.canonical_map(tr, max_lev=1),
        duck.execute(link.canonical_map_sql(raw_cte, max_lev=1)),
    )


def test_canonical_triples_parity(spark, duck, tr, raw_cte):
    assert_df_equal(
        link.canonicalize_triples(tr), duck.execute(link.canonical_triples_sql(raw_cte))
    )


def test_canonicalization_merges_variants(spark, tr):
    """Casing + edit variants of the same module map to one canonical name."""
    cm = link.canonical_map(tr)
    merged = cm.groupBy("canon").agg(F.count("*").alias("n")).where(F.col("n") > 1)
    assert merged.count() > 0
    # all members of a component share a normalized form under max_lev=0
    m = link.normalize_mentions(tr)
    j = cm.join(m, "name").groupBy("canon").agg(F.countDistinct("norm").alias("d"))
    assert j.where(F.col("d") > 1).count() == 0


def test_connected_components_chain(spark):
    """Min-label propagation closes transitive chains a-b, b-c, c-d."""
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("x", "y")], "a string, b string"
    )
    comp = {r["node"]: r["comp"] for r in link.connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_osa_matches_duckdb_on_fixture(duck):
    """OSA (the reference's restricted Damerau-Levenshtein, our UDF) vs
    DuckDB's UNRESTRICTED builtin: the two can diverge when a
    transposition composes with another edit ('ca'→'abc': OSA 3, DL 2).
    Every dist-annotated oracle comparison is exact ONLY while no blocked
    candidate pair diverges — assert that invariant over ALL delete-
    variant-blocked entity-name pairs of BOTH corpora (the superset of
    every site that compares a distance ≤ 2)."""
    from kgspark import correct, typesys
    from kgspark.link import osa_distance

    assert osa_distance("ca", "abc") == 3  # the divergent class exists...
    for rich in (False, True):
        raw = extract.triples_raw_sql(
            synth.repo_files_rich_sql("duckdb") if rich
            else synth.repo_files_sql("duckdb"))
        rows = duck.execute(
            f"WITH {typesys.kg_ctes(raw)}, {correct.name_candidates_ctes(99)} "
            "SELECT DISTINCT l.cnorm AS na, r.cnorm AS nb, "
            "       damerau_levenshtein(l.cnorm, r.cnorm) AS d "
            "FROM cvars l JOIN cvars r ON l.var = r.var AND l.id <> r.id"
        ).fetchall()
        assert rows
        bad = [(na, nb) for na, nb, d in rows if osa_distance(na, nb) != d]
        assert not bad, f"divergent blocked pairs (rich={rich}): {bad[:5]}"
