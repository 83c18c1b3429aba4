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


def compile_shacl_dt(dt_models: DataFrame, relations: DataFrame,
                     type_names: DataFrame, min_sup: int = 5,
                     max_prob: float = 0.5) -> str:
    """Decision-tree leaves → SHACL-SPARQL constraint document.

    The published mechanism (/root/reference/shacl-sparql.py:10-160): the
    per-relation tree is pruned to leaves confidently classifying errors
    (condition on the leaf's class share + min support), and each such
    leaf becomes a FILTER clause — the conjunction of its root-to-leaf
    conditions: positive EXISTS for required features, negated EXISTS for
    forbidden ones. A relation's constraint is the disjunction of its
    error leaves. ``dt_models`` is the (p, leaf, prob, n, feats_true,
    feats_false) table from kgspark.patybred.fit_models_dt.
    """
    rel_names = {int(r["id"]): r["name"] for r in relations.collect()}
    R = len(rel_names)
    tnames = {int(r["t"]): r["name"] for r in type_names.collect()}

    per_rel: dict[int, list[str]] = {}
    for row in dt_models.collect():
        # suspect leaf: mostly-negative with enough support (the
        # reference's `condition(value) and sum(value) >= minsup`)
        if row["prob"] > max_prob or row["n"] < min_sup:
            continue
        conds = []
        for f in sorted(row["feats_true"]):
            c = _feature_condition(f, rel_names, tnames, R, present=True)
            if c:
                conds.append(c)
        for f in sorted(row["feats_false"]):
            c = _feature_condition(f, rel_names, tnames, R, present=False)
            if c:
                conds.append(c)
        if conds:
            per_rel.setdefault(int(row["p"]), []).append(
                "  &&  ".join(conds))

    chunks = [
        f"@prefix : <{PREFIX}> . ",
        "@prefix sh: <http://www.w3.org/ns/shacl#> . ",
    ]
    for p in sorted(per_rel):
        chunks.append(_shape_chunk(rel_names[p], per_rel[p]))
    return "\n".join(chunks)


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
