"""SHACL-SPARQL constraint export (SURVEY §2 M8, optional deliverable).

Reference: /root/reference/shacl-sparql.py:10-160 compiles per-relation
decision trees into ``sh:sparql`` SELECT constraints whose FILTER encodes
EXISTS-path conditions (output shape:
/root/reference/shacl-constraints-dbpedia-experiments.shacl).

Our per-relation models are logistic regressions over boolean features, so
the analog is direct: a feature with a strongly POSITIVE weight is
evidence a true fact carries it — a fact *missing* it is suspect. For
each relation we emit one NodeShape whose constraint flags facts missing
all of the relation's top-k positive-evidence features:

    feature path_a[_b]  →  ! EXISTS { $this <ra>[/<rb>] ?o }   (^ = inverse)
    feature st_<t>      →  ! EXISTS { $this a <type> }
    feature ot_<t>      →  ! EXISTS { ?o a <type> }

This is a driver-side pure-Python transform of the collected (tiny) model
table — exactly like the reference, which runs on pickled models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PREFIX = "http://kgspark.shacl/"


def _term(path_ids: list[int], rel_names: dict[int, str], R: int) -> str:
    parts = []
    for x in path_ids:
        if x > R:
            parts.append(f"^<{PREFIX}{rel_names[x - R]}>")
        else:
            parts.append(f"<{PREFIX}{rel_names[x]}>")
    return "/".join(parts)


def _feature_condition(feat: str, rel_names: dict[int, str],
                       type_names: dict[int, str], R: int,
                       present: bool = False) -> str | None:
    """EXISTS-form SPARQL condition for one boolean feature.

    ``present=False`` (default) renders the *absence* test (``! EXISTS``)
    used by the LR compiler; ``present=True`` renders the positive form —
    the DT compiler needs both, exactly like the reference's
    ``negate``/``get_condition_str`` pair (shacl-sparql.py:58-120)."""
    neg = "" if present else "! "
    if feat.startswith("path_"):
        ids = [int(x) for x in feat.split("_")[1:]]
        return "%sEXISTS { $this %s ?o }" % (neg, _term(ids, rel_names, R))
    if feat.startswith("st_"):
        t = type_names[int(feat[3:])]
        return "%sEXISTS { $this a <%s%s> }" % (neg, PREFIX, t)
    if feat.startswith("ot_"):
        t = type_names[int(feat[3:])]
        return "%sEXISTS { ?o a <%s%s> }" % (neg, PREFIX, t)
    return None


def _shape_chunk(rname: str, filters: list[str]) -> str:
    filt = "  ||  ".join(f"({f})" for f in filters) if len(filters) > 1 \
        else filters[0]
    return (
        f":{rname}Shape a sh:NodeShape ;\n"
        f"sh:targetSubjectsOf <{PREFIX}{rname}> ;\n"
        "sh:sparql [\n"
        "  a sh:SPARQLConstraint;\n"
        "  sh:select \"\"\" \n"
        f"SELECT $this ?o WHERE {{ $this <{PREFIX}{rname}> ?o . \n"
        f"FILTER(({filt})) }} \n"
        "  \"\"\" ;\n"
        " ] . \n"
    )


def leaf_rules(leaves, rel_names: dict[int, str],
               type_names: dict[int, str], R: int, min_sup: int = 5,
               max_prob: float = 0.5) -> list[tuple[int, str, int, str]]:
    """DT error leaves → sorted rule rows (p, rname, leaf, clause).

    The published pruning (/root/reference/shacl-sparql.py:64-120): keep
    leaves confidently classifying errors (class share ≤ max_prob with
    ≥ min_sup training rows); each becomes one FILTER clause — the
    conjunction of its root-to-leaf conditions (positive EXISTS for
    required features, negated for forbidden). Pure python over the tiny
    collected leaf table, shared by the document compiler and the
    queryable rule table (and, run on the oracle's Spark-free DT fit, by
    the kg_shacl_rules oracle builder).
    """
    rows: list[tuple[int, str, int, str]] = []
    for row in leaves:
        # suspect leaf: mostly-negative with enough support (the
        # reference's `condition(value) and sum(value) >= minsup`)
        if row["prob"] > max_prob or row["n"] < min_sup:
            continue
        conds = []
        for f in sorted(row["feats_true"]):
            c = _feature_condition(f, rel_names, type_names, R, present=True)
            if c:
                conds.append(c)
        for f in sorted(row["feats_false"]):
            c = _feature_condition(f, rel_names, type_names, R,
                                   present=False)
            if c:
                conds.append(c)
        if conds:
            p = int(row["p"])
            rows.append((p, rel_names[p], int(row["leaf"]),
                         "  &&  ".join(conds)))
    return sorted(rows)


def compile_shacl_dt(dt_models: DataFrame, relations: DataFrame,
                     type_names: DataFrame, min_sup: int = 5,
                     max_prob: float = 0.5) -> str:
    """Decision-tree leaves → SHACL-SPARQL constraint document.

    The published mechanism (/root/reference/shacl-sparql.py:10-160): a
    relation's constraint is the disjunction of its error-leaf clauses
    (see :func:`leaf_rules`). ``dt_models`` is the (p, leaf, prob, n,
    feats_true, feats_false) table from kgspark.patybred.fit_models_dt.
    """
    rel_names = {int(r["id"]): r["name"] for r in relations.collect()}
    R = len(rel_names)
    tnames = {int(r["t"]): r["name"] for r in type_names.collect()}

    per_rel: dict[int, list[str]] = {}
    for p, _, _, clause in leaf_rules(dt_models.collect(), rel_names,
                                      tnames, R, min_sup, max_prob):
        per_rel.setdefault(p, []).append(clause)

    chunks = [
        f"@prefix : <{PREFIX}> . ",
        "@prefix sh: <http://www.w3.org/ns/shacl#> . ",
    ]
    for p in sorted(per_rel):
        chunks.append(_shape_chunk(rel_names[p], per_rel[p]))
    return "\n".join(chunks)


def shacl_rules(dt_models: DataFrame, relations: DataFrame,
                type_names: DataFrame, min_sup: int = 5,
                max_prob: float = 0.5) -> DataFrame:
    """M8 as a queryable table → (p, rname, leaf, clause): one row per
    suspect DT leaf with its compiled SPARQL FILTER clause. The driver
    oracle re-derives the identical rows from the Spark-free DuckDB DT
    fit (patybred._pb_fit_from_duckdb) — like the classifier oracles,
    conditioned only on the shared fit + compile procedures."""
    spark = dt_models.sparkSession
    rel_names = {int(r["id"]): r["name"] for r in relations.collect()}
    R = len(rel_names)
    tnames = {int(r["t"]): r["name"] for r in type_names.collect()}
    rows = leaf_rules(dt_models.collect(), rel_names, tnames, R,
                      min_sup, max_prob)
    schema = "p int, rname string, leaf int, clause string"
    df = spark.createDataFrame(rows or [(0, "", 0, "")], schema)
    return df if rows else df.limit(0)


def shacl_rules_oracle_sql(raw_cte: str, p_error: float, R: int = 4,
                           min_sup: int = 5, max_prob: float = 0.5) -> str:
    """Exact oracle for :func:`shacl_rules` over the pb_bundle(clf='dt')
    models: the DT is re-fitted Spark-free in DuckDB+numpy
    (patybred._pb_fit_from_duckdb — the same replica behind the
    kg_patybred_dt_ranked oracle), its suspect leaves compiled by the
    shared :func:`leaf_rules`, and the resulting rows embedded as
    VALUES."""
    import duckdb

    from kgspark.dialect import materialize_ctes
    from kgspark.patybred import _pb_fit_from_duckdb
    from kgspark.typesys import kg_ctes, type_names_sql
    from kgspark.util import oracle_sf_dir

    sf_dir = oracle_sf_dir()
    leaves = _pb_fit_from_duckdb(raw_cte, p_error, sf_dir, "dt", R)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{sf_dir}/documents.parquet')")
    rel = con.execute(materialize_ctes(
        f"WITH {kg_ctes(raw_cte)} SELECT CAST(id AS INT) AS id, name "
        "FROM rel")).fetchall()
    tn = con.execute(materialize_ctes(type_names_sql(raw_cte))).fetchall()
    con.close()
    rel_names = {int(i): n for i, n in rel}
    tnames = {int(t): n for t, n in tn}
    rows = [] if leaves is None or len(leaves) == 0 else leaf_rules(
        leaves.to_dict("records"), rel_names, tnames, R, min_sup, max_prob)
    if not rows:
        return ("SELECT CAST(NULL AS INT) AS p, CAST(NULL AS VARCHAR) AS "
                "rname, CAST(NULL AS INT) AS leaf, CAST(NULL AS VARCHAR) "
                "AS clause WHERE FALSE")

    def esc(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(
        f"({p}, '{esc(rn)}', {leaf}, '{esc(cl)}')"
        for p, rn, leaf, cl in rows)
    return (f"SELECT p, rname, leaf, clause FROM (VALUES {vals}) "
            "AS shrl(p, rname, leaf, clause)")


def compile_shacl(models: DataFrame, relations: DataFrame,
                  type_names: DataFrame, top_k: int = 3,
                  min_weight: float = 0.5) -> str:
    """Collected models → SHACL-SPARQL constraint document (text)."""
    rel_names = {int(r["id"]): r["name"] for r in relations.collect()}
    R = len(rel_names)
    tnames = {int(r["t"]): r["name"] for r in type_names.collect()}
    weights: dict[int, list[tuple[str, float]]] = {}
    for row in models.collect():
        if row["feat"] == "_bias":
            continue
        weights.setdefault(int(row["p"]), []).append((row["feat"], row["w"]))

    chunks = [
        f"@prefix : <{PREFIX}> . ",
        "@prefix sh: <http://www.w3.org/ns/shacl#> . ",
    ]
    for p in sorted(weights):
        top = sorted(
            [(f, w) for f, w in weights[p] if w >= min_weight],
            key=lambda x: (-x[1], x[0]),
        )[:top_k]
        conds = []
        for f, _ in top:
            c = _feature_condition(f, rel_names, tnames, R)
            if c:
                conds.append(c)
        if not conds:
            continue
        rname = rel_names[p]
        filt = "  &&  ".join(conds)
        chunks.append(
            f":{rname}Shape a sh:NodeShape ;\n"
            f"sh:targetSubjectsOf <{PREFIX}{rname}> ;\n"
            "sh:sparql [\n"
            "  a sh:SPARQLConstraint;\n"
            "  sh:select \"\"\" \n"
            f"SELECT $this ?o WHERE {{ $this <{PREFIX}{rname}> ?o . \n"
            f"FILTER(({filt})) }} \n"
            "  \"\"\" ;\n"
            " ] . \n"
        )
    return "\n".join(chunks)
