"""HolE scoring surface (SURVEY §2 M9 — the scoring operator only).

Reference: /root/reference/embeddings.py:636 scores a triple (s, p, o)
as ``sum(R[p] * ccorr(E[s], E[o]))`` (HolE); the embeddings themselves
are trained there through TF/skge (embeddings.py:1-30), which is out of
scope per the SURVEY north rule and absent from this container. The
SCORING composition, however, is pure column algebra and is implemented
here Spark-native: circular correlation via kgspark.simsearch.ccorr_col
(rotated sequential dot products, JVM-side) contracted against the
relation vector.

Embeddings are DETERMINISTIC hash-derived vectors (the portable md5
substrate, kgspark.hashing) — a pure function of the entity/relation id,
so (a) scoring is a single narrow projection with ZERO joins or
shuffles, and (b) the DuckDB oracle reconstructs identical vectors and
identical fold order (list_dot_product) for exact value checks. A
trained-embedding table can be swapped in as a (id, vec) join without
changing the composition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgspark.hashing import phash32, sql_phash32
from kgspark.simsearch import _DOT, ccorr_col, _dot

DIM_EMB = 16


def hash_embedding(id_col: Column, salt: str, d: int = DIM_EMB) -> Column:
    """Deterministic embedding: vec[i] = (h(salt|id|i) % 1000)/1000 − 0.5."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: (phash32([id_col, i], salt) % 1000) / 1000.0 - 0.5,
    )


def hole_scores(triples: DataFrame, d: int = DIM_EMB) -> DataFrame:
    """→ (s, p, o, score): the reference's HolE triple score
    (embeddings.py:636) over hash-derived vectors — one narrow
    projection, no shuffle; at 100 TB this is embarrassingly parallel."""
    es = hash_embedding(F.col("s"), "he", d)
    eo = hash_embedding(F.col("o"), "he", d)
    rp = hash_embedding(F.col("p"), "hr", d)
    score = F.round(_dot(rp, ccorr_col(es, eo, d)), 6)
    return triples.select("s", "p", "o", score.alias("score"))


def proje_scores(triples: DataFrame, d: int = DIM_EMB) -> DataFrame:
    """→ (s, p, o, score): ProjE 'simple'-mode triple score — the fourth
    of the reference's embedding-model families (embeddings.py:404-448
    test/predict_proba: hr = h⊙w₁ + r⊙w₂, score = (tanh(hr)·h +
    tanh(hr)·o)/2 with zero-init combination bias). The TF trainer
    (embeddings.py:164-400) needs TensorFlow (absent), so like RESCAL
    this is the SCORING surface over deterministic hash-derived
    parameters: pure column algebra, zero joins/shuffles, with the
    global combination weights as hash vectors. Trained parameters slot
    in as a broadcast (p-independent) weight row without changing the
    composition."""
    es = hash_embedding(F.col("s"), "pe", d)
    eo = hash_embedding(F.col("o"), "pe", d)
    rp = hash_embedding(F.col("p"), "pr", d)
    w1 = hash_embedding(F.lit(0), "pw1", d)
    w2 = hash_embedding(F.lit(0), "pw2", d)
    hr = F.zip_with(F.zip_with(es, w1, lambda a, b: a * b),
                    F.zip_with(rp, w2, lambda a, b: a * b),
                    lambda a, b: a + b)
    # tanh via the exp identity — the same formula the DuckDB oracle
    # evaluates (its build has no tanh), keeping both sides' float ops
    # aligned like the sigmoid in the LR scoring oracles
    c = F.transform(hr, lambda x: 1.0 - 2.0 / (F.exp(2.0 * x) + 1.0))
    score = F.round((_dot(c, es) + _dot(c, eo)) / 2.0, 6)
    return triples.select("s", "p", "o", score.alias("score"))


def proje_scores_trained(triples: DataFrame, E: DataFrame, R: DataFrame,
                         w1: list[float], w2: list[float],
                         d: int = DIM_EMB) -> DataFrame:
    """→ (s, p, o, score): ProjE 'simple' scoring with TRAINED
    parameters slotted in — entity/relation tables joined (R
    broadcast), the global combination weights w1/w2 as literal arrays
    (a broadcast parameter row: p-independent, so it never shuffles).
    Same composition as :func:`proje_scores`, exercising the documented
    claim that trained parameters drop into the hash-substrate surface
    unchanged. The full TF trainer (reference embeddings.py:164-400) is
    TF-bound; :func:`numpy_proje_fit` provides a driver-side
    margin-SGD fit for fixture-scale parameters."""
    w1c = F.array(*[F.lit(float(x)) for x in w1])
    w2c = F.array(*[F.lit(float(x)) for x in w2])
    t = (
        triples
        .join(E.select(F.col("e").alias("s"), F.col("vec").alias("es")), "s")
        .join(E.select(F.col("e").alias("o"), F.col("vec").alias("eo")), "o")
        .join(F.broadcast(R.select("p", F.col("vec").alias("rp"))), "p")
    )
    hr = F.zip_with(F.zip_with(F.col("es"), w1c, lambda a, b: a * b),
                    F.zip_with(F.col("rp"), w2c, lambda a, b: a * b),
                    lambda a, b: a + b)
    c = F.transform(hr, lambda x: 1.0 - 2.0 / (F.exp(2.0 * x) + 1.0))
    t = t.select("s", "p", "o", "es", "eo", c.alias("_c"))
    score = F.round((_dot(F.col("_c"), F.col("es"))
                     + _dot(F.col("_c"), F.col("eo"))) / 2.0, 6)
    return t.select("s", "p", "o", score.alias("score"))


def numpy_proje_fit(rows: list[tuple[int, int, int]], n_entities: int,
                    d: int = DIM_EMB, epochs: int = 2, lr: float = 0.1,
                    margin: float = 1.0):
    """Driver-side margin-SGD fit of the ProjE 'simple' parameters
    (E, R, w1, w2) — the fixture-scale stand-in for the reference's TF
    trainer (embeddings.py:164-400; TF absent here). Same recipe as the
    other replicas: hash-substrate init, content-keyed corrupt-object
    negatives (salt ``pjneg``), pairwise hinge on the raw score. This
    is a small dense model (entities on the fixture KG), so a
    distributed fit buys nothing — the trained params broadcast into
    :func:`proje_scores_trained`."""
    import math

    from kgspark.simsearch import _py_phash32

    def vec(salt: str, ident) -> list[float]:
        return [(_py_phash32(f"{salt}|{ident}|{i}") % 1000) / 1000.0 - 0.5
                for i in range(d)]

    def tanh(x):
        return 1.0 - 2.0 / (math.exp(2.0 * x) + 1.0)

    ents = sorted({r[0] for r in rows} | {r[2] for r in rows})
    E = {e: vec("pe", e) for e in ents}
    R = {p: vec("pr", p) for p in sorted({r[1] for r in rows})}
    w1, w2 = vec("pw1", 0), vec("pw2", 0)

    def fgrad(h, r, o):
        """score + gradients wrt (h, r, o, w1, w2)."""
        hr = [h[i] * w1[i] + r[i] * w2[i] for i in range(d)]
        c = [tanh(x) for x in hr]
        f = sum(c[i] * (h[i] + o[i]) for i in range(d)) / 2.0
        gh, gr, go, g1, g2 = [], [], [], [], []
        for i in range(d):
            dci = (1.0 - c[i] * c[i]) * (h[i] + o[i]) / 2.0
            gh.append(c[i] / 2.0 + dci * w1[i])
            go.append(c[i] / 2.0)
            gr.append(dci * w2[i])
            g1.append(dci * h[i])
            g2.append(dci * r[i])
        return f, gh, gr, go, g1, g2

    for ep in range(epochs):
        for s, p, o in rows:
            oneg = (_py_phash32(f"pjneg|{s}|{p}|{o}|{ep}") % n_entities) + 1
            if oneg not in E:
                continue
            fp, ghp, grp, gop, g1p, g2p = fgrad(E[s], R[p], E[o])
            fn, ghn, grn, gon, g1n, g2n = fgrad(E[s], R[p], E[oneg])
            if margin - fp + fn <= 0:
                continue
            # descend the hinge: +∂f_pos, −∂f_neg
            E[s] = [v + lr * (a - b) for v, a, b in zip(E[s], ghp, ghn)]
            E[o] = [v + lr * a for v, a in zip(E[o], gop)]
            E[oneg] = [v - lr * a for v, a in zip(E[oneg], gon)]
            R[p] = [v + lr * (a - b) for v, a, b in zip(R[p], grp, grn)]
            w1 = [v + lr * (a - b) for v, a, b in zip(w1, g1p, g1n)]
            w2 = [v + lr * (a - b) for v, a, b in zip(w2, g2p, g2n)]
    return E, R, w1, w2


def rescal_w(p_col: Column, d: int = DIM_EMB) -> Column:
    """Deterministic d×d relation matrix W_p (row-major nested arrays)
    from the hash substrate: W[i][j] = (h('rw'|p|i|j) % 1000)/1000 − 0.5."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda j: (phash32([p_col, i, j], "rw") % 1000) / 1000.0 - 0.5))


def rescal_scores(triples: DataFrame, d: int = DIM_EMB) -> DataFrame:
    """→ (s, p, o, score): RESCAL bilinear triple score
    eₛᵀ · W_p · e_o — the third of the reference's four embedding-model
    families (embeddings.py drives skge's RESCAL the same way it drives
    HolE; TF-ProjE is the only family left unported — no TF here).

    Pure column algebra like :func:`hole_scores`: W_p·e_o first (d
    sequential row dots), then eₛ against that — both folds are the
    JVM sequential _dot, bit-identical to DuckDB's list_dot_product,
    so the oracle reconstructs exact values. Zero joins / shuffles —
    embarrassingly parallel at any scale. With TRAINED parameters the
    same contraction applies after a broadcast join of a (p, W) table
    (R relations × d² floats — a broadcast dim at any realistic R).
    """
    es = hash_embedding(F.col("s"), "re", d)
    eo = hash_embedding(F.col("o"), "re", d)
    wv = F.transform(rescal_w(F.col("p"), d), lambda row: _dot(row, eo))
    return triples.select(
        "s", "p", "o", F.round(_dot(es, wv), 6).alias("score"))


# ------------------------------------------------------- TransE training (M9)

TE_DIM = 16
TE_LR = 0.1
TE_MARGIN = 1.0
TE_EPOCHS = 2


def _l2norm_rows(tab: DataFrame, vec: str = "vec") -> DataFrame:
    n = F.sqrt(_dot(F.col(vec), F.col(vec)))
    n = F.when(n == 0, F.lit(1.0)).otherwise(n)
    return tab.withColumn(vec, F.transform(F.col(vec), lambda x: x / n))


def transe_init(triples: DataFrame, d: int = TE_DIM
                ) -> tuple[DataFrame, DataFrame]:
    """Deterministic initial (entity, relation) embedding tables from the
    hash substrate — identical in the numpy oracle replica."""
    ents = (triples.select(F.col("s").alias("e"))
            .unionByName(triples.select(F.col("o").alias("e"))).distinct())
    rels = triples.select(F.col("p")).distinct()
    E = ents.select("e", hash_embedding(F.col("e"), "te", d).alias("vec"))
    R = rels.select("p", hash_embedding(F.col("p"), "tr", d).alias("vec"))
    return E, R


def transe_epoch(triples: DataFrame, E: DataFrame, R: DataFrame,
                 n_entities: int, epoch: int, d: int = TE_DIM,
                 lr: float = TE_LR, margin: float = TE_MARGIN,
                 deterministic: bool = True
                 ) -> tuple[DataFrame, DataFrame]:
    """One distributed SGD epoch of squared-L2 TransE margin training.

    Reference analog: the skge/TF trainers behind embeddings.py:24-60
    (pairwise margin ranking with corrupt-object negatives). Spark-first
    shape: entity vectors are normalized, per-triple gradient
    contributions come from joins against the (entity|relation, vec)
    tables, then summed per parameter. Negatives are content-keyed
    corrupt-objects (epoch-salted), the reference's corruption scheme
    without rejection (documented simplification).

    Two gradient-accumulation modes:

    * ``deterministic=True`` (fixture/oracle mode): the per-parameter
      sum folds a SORTED ``collect_list`` — order-deterministic float
      addition, bit-identical to the numpy oracle replica. The list per
      entity grows with entity DEGREE, which on a real KG is unbounded
      (a hub entity collects millions of structs into one row), so this
      mode is for corpora small enough to oracle.
    * ``deterministic=False`` (scale mode, the large-corpus default via
      :func:`fit_transe`): plain per-slot ``F.sum`` partial aggregation
      — map-side combine, no per-entity array, hub entities cost O(d)
      state per partition instead of O(degree·d) in one row. Float sums
      are partition-order-dependent (≈1 ulp noise), which SGD tolerates.
    """
    from kgspark.hashing import pick_mod
    from kgspark.util import materialize

    # checkpoint the normalized table: it is joined three times below
    # (s / o / corrupt-o sides), and the normalization's nested
    # higher-order expression must not be re-bound per alias
    E = materialize(_l2norm_rows(E))
    # rename the relation key on the fact side: a shared column name
    # across the broadcast build side trips attribute dedup in the
    # composed per-epoch plan (p of the triples mis-binds into the R
    # scan) — distinct names keep resolution unambiguous
    t = triples.select("s", F.col("p").alias("_tp"), "o").withColumn(
        "o_neg",
        pick_mod([F.col("s"), F.col("_tp"), F.col("o"), F.lit(epoch)],
                 n_entities, "teneg") + 1)
    t = (
        t.join(E.select(F.col("e").alias("s"), F.col("vec").alias("es")), "s")
        .join(E.select(F.col("e").alias("o"), F.col("vec").alias("eo")), "o")
        .join(E.select(F.col("e").alias("o_neg"),
                       F.col("vec").alias("en")), "o_neg", "left")
        .join(F.broadcast(R.withColumnRenamed("vec", "rp")),
              F.col("_tp") == F.col("p"))
        .drop("p")
    )
    # a corrupt id may miss the entity table (ids are dense 1..n so it
    # should not, but stay total): missing negative → inactive triple
    dp = F.zip_with(F.zip_with(F.col("es"), F.col("rp"),
                               lambda a, b: a + b),
                    F.col("eo"), lambda a, b: a - b)
    dn = F.zip_with(F.zip_with(F.col("es"), F.col("rp"),
                               lambda a, b: a + b),
                    F.coalesce(F.col("en"), F.col("eo")),
                    lambda a, b: a - b)
    act = (F.col("en").isNotNull()
           & (F.lit(margin) + _dot(dp, dp) - _dot(dn, dn) > 0))
    g_sp = F.zip_with(dp, dn, lambda a, b: 2.0 * a - 2.0 * b)  # ∂/∂es, ∂/∂rp
    g_o = F.transform(dp, lambda a: -2.0 * a)                  # ∂/∂eo
    g_n = F.transform(dn, lambda a: 2.0 * a)                   # ∂/∂en
    # checkpoint the per-triple gradient rows: the downstream fold +
    # parameter-update self-joins re-reference this subtree several
    # times, and truncating here keeps the per-epoch plan flat
    t = materialize(t.where(act).select(
        "s", "_tp", "o", "o_neg",
        g_sp.alias("g_sp"), g_o.alias("g_o"), g_n.alias("g_n")))

    return _apply_grads(E, R, t.withColumnRenamed("g_sp", "g_s")
                        .withColumn("g_r", F.col("g_s")), d, lr,
                        deterministic)


def _apply_grads(E: DataFrame, R: DataFrame, t: DataFrame, d: int,
                 lr: float, deterministic: bool, d_r: int | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    """Shared SGD-update machinery: fold the per-triple gradient table
    ``t`` (s, _tp, o, o_neg, g_s, g_o, g_n, g_r) per entity/relation and
    apply ``x ← x − lr·Σg`` — the deterministic sorted fold or the
    hub-safe partial-sum aggregate (see :func:`transe_epoch`).

    ``d_r`` is the relation-parameter width when it differs from the
    entity width ``d`` (RESCAL folds a row-major-flattened d×d matrix,
    so d_r = d²)."""
    d_r = d if d_r is None else d_r
    # role index (0=subject, 1=object, 2=corrupt object) disambiguates
    # multiple same-triple contributions to one entity (s == o self-loops)
    contrib = t.select(
        F.explode(F.array(
            F.struct(F.lit(0).alias("i"), F.col("s").alias("e"),
                     F.col("g_s").alias("g")),
            F.struct(F.lit(1).alias("i"), F.col("o").alias("e"),
                     F.col("g_o").alias("g")),
            F.struct(F.lit(2).alias("i"), F.col("o_neg").alias("e"),
                     F.col("g_n").alias("g")),
        )).alias("c"),
        F.concat_ws("|", "s", "_tp", "o").alias("_k"),
    ).select(F.col("c.e").alias("e"), F.col("c.i").alias("_i"),
             F.col("c.g").alias("g"), "_k")

    if deterministic:
        def folded(grp: DataFrame, key: str, width: int) -> DataFrame:
            zero = F.array(*[F.lit(0.0) for _ in range(width)])
            lst = F.array_sort(F.collect_list(F.struct(
                F.col("_k").alias("k"), F.col("_i").alias("i"),
                F.col("g").alias("g"))))
            acc = F.aggregate(
                lst, zero,
                lambda a, s: F.zip_with(a, s["g"], lambda x, y: x + y))
            return grp.groupBy(key).agg(acc.alias("grad"))

        ge = folded(contrib, "e", d)
        gr = folded(
            t.select(F.col("_tp").alias("p"), F.lit(0).alias("_i"),
                     F.col("g_r").alias("g"),
                     F.concat_ws("|", "s", "_tp", "o").alias("_k")),
            "p", d_r)
    else:
        # scale mode: per-slot partial sums — a plain hash aggregate
        # with map-side combine; no collect_list, no per-entity array
        def summed(grp: DataFrame, key: str, width: int) -> DataFrame:
            agg = grp.groupBy(key).agg(
                *[F.sum(F.col("g")[i]).alias(f"_g{i}")
                  for i in range(width)])
            return agg.select(
                key, F.array(*[F.col(f"_g{i}") for i in range(width)])
                .alias("grad"))

        ge = summed(contrib, "e", d)
        gr = summed(
            t.select(F.col("_tp").alias("p"), F.col("g_r").alias("g")),
            "p", d_r)

    # gradient tables derive FROM E/R, so rename their keys before the
    # self-join (attribute-lineage disambiguation)
    ge = ge.select(F.col("e").alias("_ge"), "grad")
    gr = gr.select(F.col("p").alias("_gp"), "grad")
    E2 = E.join(ge, F.col("e") == F.col("_ge"), "left").select(
        "e",
        F.when(F.col("grad").isNull(), F.col("vec")).otherwise(
            F.zip_with("vec", "grad", lambda v, g: v - lr * g)).alias("vec"))
    R2 = R.join(gr, F.col("p") == F.col("_gp"), "left").select(
        "p",
        F.when(F.col("grad").isNull(), F.col("vec")).otherwise(
            F.zip_with("vec", "grad", lambda v, g: v - lr * g)).alias("vec"))
    return E2, R2


# Above this entity count fit_transe defaults to the scale-mode
# (partial-sum) gradient aggregation: entity degree — the sorted fold's
# per-row memory — is unbounded on real KGs, and a corpus this large is
# past oracle scale anyway.
TE_DETERMINISTIC_MAX = 1_000_000

# The sorted fold's real cost is the largest per-key collect_list — the
# MAX entity degree, not the entity count: a sub-1M-entity KG with one
# 10⁶-degree hub would still blow an executor. The auto-switch therefore
# also bounds degree; above this the partial-sum mode is forced.
TE_DETERMINISTIC_MAX_DEGREE = 50_000


def _auto_deterministic(triples: DataFrame, n_entities: int) -> bool:
    """Pick the gradient path when the caller didn't: the
    bit-reproducible sorted fold only when BOTH the entity count and the
    max in/out-degree (one aggregate over ``triples``) are bounded —
    otherwise the hub-safe partial-sum mode."""
    if n_entities > TE_DETERMINISTIC_MAX:
        return False
    deg = (
        triples.select(F.col("s").alias("e"))
        .unionAll(triples.select(F.col("o").alias("e")))
        .groupBy("e").count()
        .agg(F.max("count").alias("m")).first()["m"]
    )
    return (deg or 0) <= TE_DETERMINISTIC_MAX_DEGREE


def fit_transe(triples: DataFrame, n_entities: int, d: int = TE_DIM,
               epochs: int = TE_EPOCHS, lr: float = TE_LR,
               margin: float = TE_MARGIN,
               deterministic: bool | None = None
               ) -> tuple[DataFrame, DataFrame]:
    """Distributed TransE fit → (E(e, vec), R(p, vec)); each epoch is
    checkpointed (the iterative-algorithm lineage-truncation pattern).

    ``deterministic=None`` auto-selects the gradient path: the
    bit-reproducible sorted fold (oracle parity) only when both the
    entity count (``TE_DETERMINISTIC_MAX``) and the max in/out-degree
    (``TE_DETERMINISTIC_MAX_DEGREE`` — the fold's actual per-key
    memory bound) are small; the hub-safe partial-sum aggregation
    otherwise (see :func:`transe_epoch`); pass an explicit bool to
    force either."""
    from kgspark.util import materialize

    if deterministic is None:
        deterministic = _auto_deterministic(triples, n_entities)
    E, R = transe_init(triples, d)
    E, R = materialize(E), materialize(R)
    for ep in range(epochs):
        E, R = transe_epoch(triples, E, R, n_entities, ep, d, lr, margin,
                            deterministic)
        E, R = materialize(E), materialize(R)
    return E, R


def transe_scores(triples: DataFrame, E: DataFrame, R: DataFrame) -> DataFrame:
    """→ (s, p, o, score): score = −‖E[s]+R[p]−E[o]‖² (higher = more
    plausible), the reference's TransE scoring surface."""
    t = (
        triples
        .join(E.select(F.col("e").alias("s"), F.col("vec").alias("es")), "s")
        .join(E.select(F.col("e").alias("o"), F.col("vec").alias("eo")), "o")
        .join(F.broadcast(R.select("p", F.col("vec").alias("rp"))), "p")
    )
    dv = F.zip_with(F.zip_with(F.col("es"), F.col("rp"), lambda a, b: a + b),
                    F.col("eo"), lambda a, b: a - b)
    return t.select("s", "p", "o",
                    F.round(-_dot(dv, dv), 6).alias("score"))


# ------------------------------------------------------- HolE training (M9)

HO_MARGIN = 0.2  # skge default (reference embeddings.py:566 margin=0.2)
HO_LR = 0.1
HO_EPOCHS = 2


def _chain_dot(a: Column, b: Column, idxs: list[int]) -> Column:
    """Σ_i a[i]·b[idxs[i]] as a LEFT-ASSOCIATED plain-arithmetic chain —
    value-identical to the sequential HOF fold (0.0+p₀ ≡ p₀, then the
    same add order) but whole-stage-codegen-able: higher-order lambdas
    (aggregate/zip_with) evaluate interpreted per row, which made the
    HOF formulation of the HolE epoch ~35× slower than this unrolling
    at d=16."""
    expr = a[0] * b[idxs[0]]
    for i in range(1, len(idxs)):
        expr = expr + a[i] * b[idxs[i]]
    return expr


def ccorr_fast(a: Column, b: Column, d: int) -> Column:
    """Unrolled :func:`kgspark.simsearch.ccorr_col` (same values):
    ccorr(a,b)[k] = Σ_i a[i]·b[(i+k) mod d]."""
    return F.array(*[
        _chain_dot(a, b, [(i + k) % d for i in range(d)])
        for k in range(d)])


def _hole_grad_kernel(d: int, margin: float, deterministic: bool):
    """Arrow-batched HolE gradient kernel for ``mapInPandas``.

    The epoch's per-triple math is dense fixed-order linear algebra
    (five circular correlations/convolutions of width d per triple);
    expressing it in JVM column algebra is either interpreted per slot
    (higher-order lambdas) or a ~20k-node unrolled plan whose codegen
    compile dominates the epoch — exactly the case the Pandas-UDF
    escape hatch exists for. Two modes:

    * ``deterministic=True``: sequential python-float folds, the exact
      op order of :func:`numpy_hole` — oracle-bit-exact;
    * ``deterministic=False`` (scale): vectorized ``np.einsum`` over a
      rolled index tensor — order-free float sums, ~100× the
      throughput, the large-corpus default (pairs with the partial-sum
      gradient fold downstream).

    Emits only ACTIVE rows (margin hinge satisfied) with their
    gradient arrays: ∂η/∂s = ccorr(r,o), ∂η/∂o = cconv(r,s),
    ∂η/∂r = ccorr(s,o), differenced positive-vs-negative.
    """
    import numpy as np
    import pandas as pd

    idx_cc = np.array([[(i + k) % d for i in range(d)] for k in range(d)])
    idx_cv = np.array([[(j - k) % d for k in range(d)] for j in range(d)])

    def seq_cc(a, b):
        out = []
        for k in range(d):
            acc = 0.0
            for i in range(d):
                acc += a[i] * b[(i + k) % d]
            out.append(acc)
        return out

    def seq_conv(a, b):
        out = []
        for j in range(d):
            acc = 0.0
            for k in range(d):
                acc += a[k] * b[(j - k) % d]
            out.append(acc)
        return out

    def sdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            cols = {"s": [], "_tp": [], "o": [], "o_neg": [],
                    "g_s": [], "g_o": [], "g_n": [], "g_r": []}
            if deterministic:
                # zip over columns: itertuples would positional-rename
                # the leading-underscore _tp column
                for s_, tp_, o_, on_, es_, eo_, en_, rp_ in zip(
                        pdf["s"], pdf["_tp"], pdf["o"], pdf["o_neg"],
                        pdf["es"], pdf["eo"], pdf["en"], pdf["rp"]):
                    if en_ is None:
                        continue
                    es = [float(x) for x in es_]
                    eo = [float(x) for x in eo_]
                    en = [float(x) for x in en_]
                    rp = [float(x) for x in rp_]
                    ccp, ccn = seq_cc(es, eo), seq_cc(es, en)
                    if margin + sdot(rp, ccn) - sdot(rp, ccp) <= 0:
                        continue
                    ccro, ccrn = seq_cc(rp, eo), seq_cc(rp, en)
                    cv = seq_conv(rp, es)
                    cols["s"].append(s_)
                    cols["_tp"].append(tp_)
                    cols["o"].append(o_)
                    cols["o_neg"].append(on_)
                    cols["g_s"].append([a - b for a, b in zip(ccrn, ccro)])
                    cols["g_o"].append([-x for x in cv])
                    cols["g_n"].append(cv)
                    cols["g_r"].append([a - b for a, b in zip(ccn, ccp)])
            else:
                ok = pdf["en"].notna().to_numpy()
                pdf = pdf[ok]
                if not len(pdf):
                    continue
                es = np.stack(pdf["es"].to_numpy())
                eo = np.stack(pdf["eo"].to_numpy())
                en = np.stack(pdf["en"].to_numpy())
                rp = np.stack(pdf["rp"].to_numpy())

                def cc(a, b):
                    return np.einsum("ni,nki->nk", a, b[:, idx_cc])

                def conv(a, b):
                    return np.einsum("nk,njk->nj", a, b[:, idx_cv])

                ccp, ccn = cc(es, eo), cc(es, en)
                act = (margin + np.einsum("nk,nk->n", rp, ccn)
                       - np.einsum("nk,nk->n", rp, ccp)) > 0
                if not act.any():
                    continue
                sel = pdf[act]
                g_r = (ccn - ccp)[act]
                g_s = (cc(rp, en) - cc(rp, eo))[act]
                cv = conv(rp, es)[act]
                cols["s"] = sel["s"].tolist()
                cols["_tp"] = sel["_tp"].tolist()
                cols["o"] = sel["o"].tolist()
                cols["o_neg"] = sel["o_neg"].tolist()
                cols["g_s"] = list(g_s)
                cols["g_o"] = list(-cv)
                cols["g_n"] = list(cv)
                cols["g_r"] = list(g_r)
            if cols["s"]:
                yield pd.DataFrame(cols)

    return batches


def hole_init(triples: DataFrame, d: int = TE_DIM
              ) -> tuple[DataFrame, DataFrame]:
    """Deterministic initial HolE parameter tables (salts distinct from
    both the TransE trainer and the untrained hole_scores substrate)."""
    ents = (triples.select(F.col("s").alias("e"))
            .unionByName(triples.select(F.col("o").alias("e"))).distinct())
    rels = triples.select(F.col("p")).distinct()
    E = ents.select("e", hash_embedding(F.col("e"), "hoe", d).alias("vec"))
    R = rels.select("p", hash_embedding(F.col("p"), "hor", d).alias("vec"))
    return E, R


def hole_epoch(triples: DataFrame, E: DataFrame, R: DataFrame,
               n_entities: int, epoch: int, d: int = TE_DIM,
               lr: float = HO_LR, margin: float = HO_MARGIN,
               deterministic: bool = True
               ) -> tuple[DataFrame, DataFrame]:
    """One distributed SGD epoch of HolE margin-ranking training.

    Reference analog: skge's HolE trainer behind the SKGEWrapper
    (embeddings.py:565-600 — pairwise ranking with corrupt-object
    negatives over the holographic composition η = r·ccorr(s,o)).
    Spark-first shape mirrors :func:`transe_epoch` (same joins, same
    deterministic-fold/partial-sum gradient modes via _apply_grads);
    the ranking hinge is on the RAW composition η rather than skge's
    sigmoid activation (documented simplification — keeps every
    gradient polynomial, so the numpy replica is bit-exact with no
    exp-implementation caveat). Gradients of η: ∂/∂r = ccorr(s,o),
    ∂/∂s = ccorr(r,o), ∂/∂o = cconv(r,s).
    """
    from kgspark.hashing import pick_mod
    from kgspark.util import materialize

    E = materialize(_l2norm_rows(E))
    t = triples.select("s", F.col("p").alias("_tp"), "o").withColumn(
        "o_neg",
        pick_mod([F.col("s"), F.col("_tp"), F.col("o"), F.lit(epoch)],
                 n_entities, "honeg") + 1)
    t = (
        t.join(E.select(F.col("e").alias("s"), F.col("vec").alias("es")), "s")
        .join(E.select(F.col("e").alias("o"), F.col("vec").alias("eo")), "o")
        .join(E.select(F.col("e").alias("o_neg"),
                       F.col("vec").alias("en")), "o_neg", "left")
        .join(F.broadcast(R.withColumnRenamed("vec", "rp")),
              F.col("_tp") == F.col("p"))
        .drop("p")
    )
    # the hinge + gradient math runs in ONE Arrow pass per epoch (see
    # _hole_grad_kernel: sequential folds for oracle parity, einsum at
    # scale) — the joins and the gradient application stay JVM-side
    out_schema = ("s long, _tp int, o long, o_neg long, "
                  "g_s array<double>, g_o array<double>, "
                  "g_n array<double>, g_r array<double>")
    t = materialize(
        t.select("s", "_tp", "o", "o_neg", "es", "eo", "en", "rp")
        .mapInPandas(_hole_grad_kernel(d, margin, deterministic),
                     out_schema))
    return _apply_grads(E, R, t, d, lr, deterministic)


def fit_hole(triples: DataFrame, n_entities: int, d: int = TE_DIM,
             epochs: int = HO_EPOCHS, lr: float = HO_LR,
             margin: float = HO_MARGIN,
             deterministic: bool | None = None
             ) -> tuple[DataFrame, DataFrame]:
    """Distributed HolE fit → (E(e, vec), R(p, vec)); per-epoch
    checkpointing and the deterministic/scale gradient-mode auto-switch
    (entity-count AND max-degree bounded) exactly as
    :func:`fit_transe`."""
    from kgspark.util import materialize

    if deterministic is None:
        deterministic = _auto_deterministic(triples, n_entities)
    E, R = hole_init(triples, d)
    E, R = materialize(E), materialize(R)
    for ep in range(epochs):
        E, R = hole_epoch(triples, E, R, n_entities, ep, d, lr, margin,
                          deterministic)
        E, R = materialize(E), materialize(R)
    return E, R


def hole_trained_scores(triples: DataFrame, E: DataFrame, R: DataFrame,
                        d: int = TE_DIM) -> DataFrame:
    """→ (s, p, o, score): η = R[p]·ccorr(E[s], E[o]) over TRAINED
    tables — the reference's HolE scoring surface (embeddings.py:636)
    with the fitted parameters joined in."""
    t = (
        triples
        .join(E.select(F.col("e").alias("s"), F.col("vec").alias("es")), "s")
        .join(E.select(F.col("e").alias("o"), F.col("vec").alias("eo")), "o")
        .join(F.broadcast(R.select("p", F.col("vec").alias("rp"))), "p")
    )
    cc = ccorr_fast(F.col("es"), F.col("eo"), d)
    t = t.select("s", "p", "o", cc.alias("_cc"), "rp")
    sc = _chain_dot(F.col("rp"), F.col("_cc"), list(range(d)))
    return t.select("s", "p", "o", F.round(sc, 6).alias("score"))


# ------------------------------------------------------ RESCAL training (M9)

RS_LR = 0.1
RS_MARGIN = 1.0
RS_EPOCHS = 2


def rescal_init(triples: DataFrame, d: int = TE_DIM
                ) -> tuple[DataFrame, DataFrame]:
    """Deterministic initial RESCAL parameter tables: entity vectors
    (d) and ROW-MAJOR-FLATTENED relation matrices W_p (d² floats) from
    the hash substrate, salts distinct from every other trainer."""
    ents = (triples.select(F.col("s").alias("e"))
            .unionByName(triples.select(F.col("o").alias("e"))).distinct())
    rels = triples.select(F.col("p")).distinct()
    E = ents.select("e", hash_embedding(F.col("e"), "rse", d).alias("vec"))
    W = rels.select("p", hash_embedding(F.col("p"), "rsw", d * d)
                    .alias("vec"))
    return E, W


def _rescal_grad_kernel(d: int, margin: float, deterministic: bool):
    """Arrow-batched RESCAL gradient kernel for ``mapInPandas`` — the
    third trainable family, no TF/skge needed: with score
    f = eₛᵀ·W_p·e_o and the pairwise hinge
    max(0, margin − f(s,p,o) + f(s,p,o')), the active-row gradients are

    * ∂/∂eₛ  = W_p·e_o' − W_p·e_o
    * ∂/∂e_o = −W_pᵀ·eₛ,  ∂/∂e_o' = +W_pᵀ·eₛ
    * ∂/∂W_p = eₛ⊗e_o' − eₛ⊗e_o  (outer products, flattened row-major)

    Same two modes as :func:`_hole_grad_kernel`: sequential python-float
    folds bit-exact vs :func:`numpy_rescal` (oracle mode), ``np.einsum``
    batched mat-vecs/outers in scale mode.
    """
    import numpy as np
    import pandas as pd

    def mv(w, v):  # W·v, sequential row folds
        out = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc += w[i * d + j] * v[j]
            out.append(acc)
        return out

    def mtv(w, v):  # Wᵀ·v
        out = []
        for j in range(d):
            acc = 0.0
            for i in range(d):
                acc += w[i * d + j] * v[i]
            out.append(acc)
        return out

    def sdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            cols = {"s": [], "_tp": [], "o": [], "o_neg": [],
                    "g_s": [], "g_o": [], "g_n": [], "g_r": []}
            if deterministic:
                for s_, tp_, o_, on_, es_, eo_, en_, w_ in zip(
                        pdf["s"], pdf["_tp"], pdf["o"], pdf["o_neg"],
                        pdf["es"], pdf["eo"], pdf["en"], pdf["rp"]):
                    if en_ is None:
                        continue
                    es = [float(x) for x in es_]
                    eo = [float(x) for x in eo_]
                    en = [float(x) for x in en_]
                    w = [float(x) for x in w_]
                    wvp, wvn = mv(w, eo), mv(w, en)
                    if margin + sdot(es, wvn) - sdot(es, wvp) <= 0:
                        continue
                    wt = mtv(w, es)
                    cols["s"].append(s_)
                    cols["_tp"].append(tp_)
                    cols["o"].append(o_)
                    cols["o_neg"].append(on_)
                    cols["g_s"].append(
                        [a - b for a, b in zip(wvn, wvp)])
                    cols["g_o"].append([-x for x in wt])
                    cols["g_n"].append(wt)
                    cols["g_r"].append(
                        [es[i] * (en[j] - eo[j])
                         for i in range(d) for j in range(d)])
            else:
                ok = pdf["en"].notna().to_numpy()
                pdf = pdf[ok]
                if not len(pdf):
                    continue
                es = np.stack(pdf["es"].to_numpy())
                eo = np.stack(pdf["eo"].to_numpy())
                en = np.stack(pdf["en"].to_numpy())
                W3 = np.stack(pdf["rp"].to_numpy()).reshape(-1, d, d)
                wvp = np.einsum("nij,nj->ni", W3, eo)
                wvn = np.einsum("nij,nj->ni", W3, en)
                act = (margin + np.einsum("ni,ni->n", es, wvn)
                       - np.einsum("ni,ni->n", es, wvp)) > 0
                if not act.any():
                    continue
                sel = pdf[act]
                wt = np.einsum("nij,ni->nj", W3, es)[act]
                g_r = np.einsum("ni,nj->nij", es,
                                en - eo)[act].reshape(-1, d * d)
                cols["s"] = sel["s"].tolist()
                cols["_tp"] = sel["_tp"].tolist()
                cols["o"] = sel["o"].tolist()
                cols["o_neg"] = sel["o_neg"].tolist()
                cols["g_s"] = list((wvn - wvp)[act])
                cols["g_o"] = list(-wt)
                cols["g_n"] = list(wt)
                cols["g_r"] = list(g_r)
            if cols["s"]:
                yield pd.DataFrame(cols)

    return batches


def rescal_epoch(triples: DataFrame, E: DataFrame, W: DataFrame,
                 n_entities: int, epoch: int, d: int = TE_DIM,
                 lr: float = RS_LR, margin: float = RS_MARGIN,
                 deterministic: bool = True
                 ) -> tuple[DataFrame, DataFrame]:
    """One distributed SGD epoch of RESCAL margin-ranking training —
    the Spark-first shape of :func:`transe_epoch`/:func:`hole_epoch`
    (same joins, same content-keyed corrupt-object negatives, shared
    :func:`_apply_grads` with the relation side d² wide). The reference
    drives skge's RESCAL the same way it drives HolE
    (embeddings.py:24-60); the trainer here needs no TF/skge — the
    bilinear gradients are closed-form outer products."""
    from kgspark.hashing import pick_mod
    from kgspark.util import materialize

    E = materialize(_l2norm_rows(E))
    t = triples.select("s", F.col("p").alias("_tp"), "o").withColumn(
        "o_neg",
        pick_mod([F.col("s"), F.col("_tp"), F.col("o"), F.lit(epoch)],
                 n_entities, "rsneg") + 1)
    t = (
        t.join(E.select(F.col("e").alias("s"), F.col("vec").alias("es")), "s")
        .join(E.select(F.col("e").alias("o"), F.col("vec").alias("eo")), "o")
        .join(E.select(F.col("e").alias("o_neg"),
                       F.col("vec").alias("en")), "o_neg", "left")
        .join(F.broadcast(W.withColumnRenamed("vec", "rp")),
              F.col("_tp") == F.col("p"))
        .drop("p")
    )
    out_schema = ("s long, _tp int, o long, o_neg long, "
                  "g_s array<double>, g_o array<double>, "
                  "g_n array<double>, g_r array<double>")
    t = materialize(
        t.select("s", "_tp", "o", "o_neg", "es", "eo", "en", "rp")
        .mapInPandas(_rescal_grad_kernel(d, margin, deterministic),
                     out_schema))
    return _apply_grads(E, W, t, d, lr, deterministic, d_r=d * d)


def fit_rescal(triples: DataFrame, n_entities: int, d: int = TE_DIM,
               epochs: int = RS_EPOCHS, lr: float = RS_LR,
               margin: float = RS_MARGIN,
               deterministic: bool | None = None
               ) -> tuple[DataFrame, DataFrame]:
    """Distributed RESCAL fit → (E(e, vec), W(p, vec·d²)); per-epoch
    checkpointing and the deterministic/scale gradient-mode auto-switch
    (entity-count AND max-degree bounded) exactly as
    :func:`fit_transe`."""
    from kgspark.util import materialize

    if deterministic is None:
        deterministic = _auto_deterministic(triples, n_entities)
    E, W = rescal_init(triples, d)
    E, W = materialize(E), materialize(W)
    for ep in range(epochs):
        E, W = rescal_epoch(triples, E, W, n_entities, ep, d, lr, margin,
                            deterministic)
        E, W = materialize(E), materialize(W)
    return E, W


def rescal_trained_scores(triples: DataFrame, E: DataFrame, W: DataFrame,
                          d: int = TE_DIM) -> DataFrame:
    """→ (s, p, o, score): eₛᵀ·W_p·e_o over TRAINED tables — the RESCAL
    scoring surface with fitted parameters joined in (entity vectors as
    two hash joins, the R×d² relation-matrix table broadcast). The
    contraction is the unrolled left-associated chain (≡ the sequential
    fold, whole-stage-codegen-able — see :func:`_chain_dot`)."""
    t = (
        triples
        .join(E.select(F.col("e").alias("s"), F.col("vec").alias("es")), "s")
        .join(E.select(F.col("e").alias("o"), F.col("vec").alias("eo")), "o")
        .join(F.broadcast(W.select("p", F.col("vec").alias("wp"))), "p")
    )
    wv = F.array(*[
        _flat_row_dot(F.col("wp"), F.col("eo"), i, d) for i in range(d)])
    t = t.select("s", "p", "o", "es", wv.alias("_wv"))
    sc = _chain_dot(F.col("es"), F.col("_wv"), list(range(d)))
    return t.select("s", "p", "o", F.round(sc, 6).alias("score"))


def _flat_row_dot(w: Column, v: Column, i: int, d: int) -> Column:
    """Row ``i`` of the flattened d×d matrix ``w`` dotted with ``v`` as
    a left-associated chain — value-identical to the sequential fold."""
    expr = w[i * d] * v[0]
    for j in range(1, d):
        expr = expr + w[i * d + j] * v[j]
    return expr


def numpy_rescal(rows: list[tuple[int, int, int]], n_entities: int,
                 d: int = TE_DIM, epochs: int = RS_EPOCHS,
                 lr: float = RS_LR, margin: float = RS_MARGIN):
    """Spark-free replica of :func:`fit_rescal` with IDENTICAL float-op
    ORDER (sequential mat-vec folds, sorted gradient accumulation) —
    pytest parity reference and driver-oracle builder. Returns
    ({e: vec_d}, {p: flat_vec_d2})."""
    from kgspark.simsearch import _py_phash32

    def vec(salt: str, ident, width: int) -> list[float]:
        return [(_py_phash32(f"{salt}|{ident}|{i}") % 1000) / 1000.0 - 0.5
                for i in range(width)]

    def sdot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def mv(w, v):
        out = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc += w[i * d + j] * v[j]
            out.append(acc)
        return out

    def mtv(w, v):
        out = []
        for j in range(d):
            acc = 0.0
            for i in range(d):
                acc += w[i * d + j] * v[i]
            out.append(acc)
        return out

    ents = sorted({r[0] for r in rows} | {r[2] for r in rows})
    E = {e: vec("rse", e, d) for e in ents}
    W = {p: vec("rsw", p, d * d) for p in sorted({r[1] for r in rows})}
    for ep in range(epochs):
        for e, v in E.items():
            n = sdot(v, v) ** 0.5 or 1.0
            E[e] = [x / n for x in v]
        ce: dict[int, list] = {}
        cw: dict[int, list] = {}
        for s, p, o in rows:
            oneg = (_py_phash32(f"rsneg|{s}|{p}|{o}|{ep}") % n_entities) + 1
            if oneg not in E:
                continue
            wvp, wvn = mv(W[p], E[o]), mv(W[p], E[oneg])
            if margin + sdot(E[s], wvn) - sdot(E[s], wvp) > 0:
                k = f"{s}|{p}|{o}"
                wt = mtv(W[p], E[s])
                ce.setdefault(s, []).append(
                    (k, 0, [a - b for a, b in zip(wvn, wvp)]))
                ce.setdefault(o, []).append((k, 1, [-x for x in wt]))
                ce.setdefault(oneg, []).append((k, 2, wt))
                cw.setdefault(p, []).append(
                    (k, 0, [E[s][i] * (E[oneg][j] - E[o][j])
                            for i in range(d) for j in range(d)]))
        for e, lst in ce.items():
            grad = [0.0] * d
            for _, _, g in sorted(lst, key=lambda x: (x[0], x[1])):
                grad = [a + b for a, b in zip(grad, g)]
            E[e] = [v - lr * g for v, g in zip(E[e], grad)]
        for p, lst in cw.items():
            grad = [0.0] * (d * d)
            for _, _, g in sorted(lst, key=lambda x: (x[0], x[1])):
                grad = [a + b for a, b in zip(grad, g)]
            W[p] = [v - lr * g for v, g in zip(W[p], grad)]
    return E, W


def numpy_transe(rows: list[tuple[int, int, int]], n_entities: int,
                 d: int = TE_DIM, epochs: int = TE_EPOCHS,
                 lr: float = TE_LR, margin: float = TE_MARGIN):
    """Spark-free replica of :func:`fit_transe` with IDENTICAL float-op
    ORDER (sequential dot folds, sorted gradient accumulation) — the
    pytest parity reference and the driver-oracle builder. Returns
    ({e: vec}, {p: vec}) as python float lists."""
    from kgspark.simsearch import _py_phash32

    def vec(salt: str, ident) -> list[float]:
        return [(_py_phash32(f"{salt}|{ident}|{i}") % 1000) / 1000.0 - 0.5
                for i in range(d)]

    def sdot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    ents = sorted({r[0] for r in rows} | {r[2] for r in rows})
    E = {e: vec("te", e) for e in ents}
    R = {p: vec("tr", p) for p in sorted({r[1] for r in rows})}
    for ep in range(epochs):
        for e, v in E.items():
            n = sdot(v, v) ** 0.5 or 1.0
            E[e] = [x / n for x in v]
        ce: dict[int, list] = {}
        cr: dict[int, list] = {}
        for s, p, o in rows:
            oneg = (_py_phash32(f"teneg|{s}|{p}|{o}|{ep}") % n_entities) + 1
            if oneg not in E:
                continue
            dp = [(E[s][i] + R[p][i]) - E[o][i] for i in range(d)]
            dn = [(E[s][i] + R[p][i]) - E[oneg][i] for i in range(d)]
            if margin + sdot(dp, dp) - sdot(dn, dn) > 0:
                k = f"{s}|{p}|{o}"
                g_sp = [2.0 * a - 2.0 * b for a, b in zip(dp, dn)]
                ce.setdefault(s, []).append((k, 0, g_sp))
                ce.setdefault(o, []).append((k, 1, [-2.0 * a for a in dp]))
                ce.setdefault(oneg, []).append((k, 2, [2.0 * a for a in dn]))
                cr.setdefault(p, []).append((k, 0, g_sp))
        for e, lst in ce.items():
            grad = [0.0] * d
            for _, _, g in sorted(lst, key=lambda x: (x[0], x[1])):
                grad = [a + b for a, b in zip(grad, g)]
            E[e] = [v - lr * g for v, g in zip(E[e], grad)]
        for p, lst in cr.items():
            grad = [0.0] * d
            for _, _, g in sorted(lst, key=lambda x: (x[0], x[1])):
                grad = [a + b for a, b in zip(grad, g)]
            R[p] = [v - lr * g for v, g in zip(R[p], grad)]
    return E, R


def numpy_hole(rows: list[tuple[int, int, int]], n_entities: int,
               d: int = TE_DIM, epochs: int = HO_EPOCHS,
               lr: float = HO_LR, margin: float = HO_MARGIN):
    """Spark-free replica of :func:`fit_hole` with IDENTICAL float-op
    ORDER (sequential correlation/convolution folds, sorted gradient
    accumulation) — pytest parity reference and driver-oracle builder."""
    from kgspark.simsearch import _py_phash32

    def vec(salt: str, ident) -> list[float]:
        return [(_py_phash32(f"{salt}|{ident}|{i}") % 1000) / 1000.0 - 0.5
                for i in range(d)]

    def sdot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def cc(a, b) -> list[float]:
        out = []
        for k in range(d):
            acc = 0.0
            for i in range(d):
                acc += a[i] * b[(i + k) % d]
            out.append(acc)
        return out

    def conv(a, b) -> list[float]:
        out = []
        for j in range(d):
            acc = 0.0
            for k in range(d):
                acc += a[k] * b[(j - k) % d]
            out.append(acc)
        return out

    ents = sorted({r[0] for r in rows} | {r[2] for r in rows})
    E = {e: vec("hoe", e) for e in ents}
    R = {p: vec("hor", p) for p in sorted({r[1] for r in rows})}
    for ep in range(epochs):
        for e, v in E.items():
            n = sdot(v, v) ** 0.5 or 1.0
            E[e] = [x / n for x in v]
        ce: dict[int, list] = {}
        cr: dict[int, list] = {}
        for s, p, o in rows:
            oneg = (_py_phash32(f"honeg|{s}|{p}|{o}|{ep}") % n_entities) + 1
            if oneg not in E:
                continue
            ccp, ccn = cc(E[s], E[o]), cc(E[s], E[oneg])
            if margin + sdot(R[p], ccn) - sdot(R[p], ccp) > 0:
                k = f"{s}|{p}|{o}"
                ccro, ccrn = cc(R[p], E[o]), cc(R[p], E[oneg])
                cv = conv(R[p], E[s])
                ce.setdefault(s, []).append(
                    (k, 0, [a - b for a, b in zip(ccrn, ccro)]))
                ce.setdefault(o, []).append((k, 1, [-x for x in cv]))
                ce.setdefault(oneg, []).append((k, 2, cv))
                cr.setdefault(p, []).append(
                    (k, 0, [a - b for a, b in zip(ccn, ccp)]))
        for e, lst in ce.items():
            grad = [0.0] * d
            for _, _, g in sorted(lst, key=lambda x: (x[0], x[1])):
                grad = [a + b for a, b in zip(grad, g)]
            E[e] = [v - lr * g for v, g in zip(E[e], grad)]
        for p, lst in cr.items():
            grad = [0.0] * d
            for _, _, g in sorted(lst, key=lambda x: (x[0], x[1])):
                grad = [a + b for a, b in zip(grad, g)]
            R[p] = [v - lr * g for v, g in zip(R[p], grad)]
    return E, R


# ---------------------------------------------------------------- SQL (oracle)


def _sql_num(x: float) -> str:
    return f"CAST('{float(x)!r}' AS DOUBLE)"  # repr round-trips exactly


def transe_scores_oracle_sql(raw_cte: str, d: int = TE_DIM,
                             epochs: int = TE_EPOCHS, lr: float = TE_LR,
                             margin: float = TE_MARGIN) -> str:
    """Exact oracle for fit_transe → transe_scores: the numpy replica
    (bit-identical float-op order, see numpy_transe) trains Spark-free on
    the SAME triples pulled from DuckDB, and the final embedding tables
    are embedded as VALUES (repr round-trip) — scores are then pure list
    arithmetic in SQL. Same pattern as the PaTyBRED classifier oracles."""
    import duckdb

    from kgspark.dialect import materialize_ctes
    from kgspark.typesys import kg_ctes
    from kgspark.util import oracle_sf_dir

    sf_dir = oracle_sf_dir()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{sf_dir}/documents.parquet')")
    base = kg_ctes(raw_cte)
    rows = con.execute(materialize_ctes(
        f"WITH {base} SELECT s, p, o FROM enc")).fetchall()
    n_ents = con.execute(materialize_ctes(
        f"WITH {base} SELECT count(*) FROM ent")).fetchone()[0]
    con.close()
    E, R = numpy_transe([(r[0], r[1], r[2]) for r in rows], n_ents,
                        d, epochs, lr, margin)

    def vals(tab) -> str:
        return ", ".join(
            f"({k}, [{', '.join(_sql_num(v) for v in vec)}])"
            for k, vec in sorted(tab.items()))

    return f"""
WITH {kg_ctes(raw_cte)},
teE(e, vec) AS (VALUES {vals(E)}),
teR(p, vec) AS (VALUES {vals(R)}),
tej AS (
  SELECT enc.s, enc.p, enc.o,
         es.vec AS esv, eo.vec AS eov, rp.vec AS rpv
  FROM enc
  JOIN teE es ON es.e = enc.s
  JOIN teE eo ON eo.e = enc.o
  JOIN teR rp ON rp.p = enc.p),
tedv AS (
  SELECT s, p, o,
         list_transform(generate_series(1, {d}),
                        i -> (esv[i] + rpv[i]) - eov[i]) AS dv
  FROM tej)
SELECT s, p, o, round(-list_dot_product(dv, dv), 6) AS score FROM tedv
"""


def hole_trained_scores_oracle_sql(raw_cte: str, d: int = TE_DIM,
                                   epochs: int = HO_EPOCHS,
                                   lr: float = HO_LR,
                                   margin: float = HO_MARGIN) -> str:
    """Exact oracle for fit_hole → hole_trained_scores: the numpy
    replica trains Spark-free on the same triples (bit-identical fold
    order, see numpy_hole), final tables embedded as VALUES, and the
    score is the list_dot_product ccorr chain (≡ the Spark folds)."""
    import duckdb

    from kgspark.dialect import materialize_ctes
    from kgspark.typesys import kg_ctes
    from kgspark.util import oracle_sf_dir

    sf_dir = oracle_sf_dir()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{sf_dir}/documents.parquet')")
    base = kg_ctes(raw_cte)
    rows = con.execute(materialize_ctes(
        f"WITH {base} SELECT s, p, o FROM enc")).fetchall()
    n_ents = con.execute(materialize_ctes(
        f"WITH {base} SELECT count(*) FROM ent")).fetchone()[0]
    con.close()
    E, R = numpy_hole([(r[0], r[1], r[2]) for r in rows], n_ents,
                      d, epochs, lr, margin)

    def vals(tab) -> str:
        return ", ".join(
            f"({k}, [{', '.join(_sql_num(v) for v in vec)}])"
            for k, vec in sorted(tab.items()))

    cc = (f"list_transform(generate_series(0, {d - 1}), "
          f"k -> list_dot_product(esv, "
          f"list_concat(list_slice(eov, k + 1, {d}), "
          f"list_slice(eov, 1, k))))")
    return f"""
WITH {kg_ctes(raw_cte)},
hoE(e, vec) AS (VALUES {vals(E)}),
hoR(p, vec) AS (VALUES {vals(R)}),
hoj AS (
  SELECT enc.s, enc.p, enc.o,
         es.vec AS esv, eo.vec AS eov, rp.vec AS rpv
  FROM enc
  JOIN hoE es ON es.e = enc.s
  JOIN hoE eo ON eo.e = enc.o
  JOIN hoR rp ON rp.p = enc.p)
SELECT s, p, o, round(list_dot_product(rpv, {cc}), 6) AS score FROM hoj
"""


def rescal_trained_scores_oracle_sql(raw_cte: str, d: int = TE_DIM,
                                     epochs: int = RS_EPOCHS,
                                     lr: float = RS_LR,
                                     margin: float = RS_MARGIN) -> str:
    """Exact oracle for fit_rescal → rescal_trained_scores: the numpy
    replica trains Spark-free on the same triples (bit-identical
    sequential mat-vec fold order, see numpy_rescal), final tables
    embedded as VALUES, and the score is a list_dot_product chain over
    row slices of the flattened W (≡ the Spark unrolled chains)."""
    import duckdb

    from kgspark.dialect import materialize_ctes
    from kgspark.typesys import kg_ctes
    from kgspark.util import oracle_sf_dir

    sf_dir = oracle_sf_dir()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{sf_dir}/documents.parquet')")
    base = kg_ctes(raw_cte)
    rows = con.execute(materialize_ctes(
        f"WITH {base} SELECT s, p, o FROM enc")).fetchall()
    n_ents = con.execute(materialize_ctes(
        f"WITH {base} SELECT count(*) FROM ent")).fetchone()[0]
    con.close()
    E, W = numpy_rescal([(r[0], r[1], r[2]) for r in rows], n_ents,
                        d, epochs, lr, margin)

    def vals(tab) -> str:
        return ", ".join(
            f"({k}, [{', '.join(_sql_num(v) for v in vec)}])"
            for k, vec in sorted(tab.items()))

    # W·e_o row-wise: row i of the flattened matrix is the 1-based
    # slice [i·d+1, i·d+d]; list_dot_product is the same sequential
    # fold as the Spark unrolled chain
    wv = (f"list_transform(generate_series(0, {d - 1}), "
          f"i -> list_dot_product("
          f"list_slice(wpv, i * {d} + 1, i * {d} + {d}), eov))")
    return f"""
WITH {kg_ctes(raw_cte)},
rsE(e, vec) AS (VALUES {vals(E)}),
rsW(p, vec) AS (VALUES {vals(W)}),
rsj AS (
  SELECT enc.s, enc.p, enc.o,
         es.vec AS esv, eo.vec AS eov, wp.vec AS wpv
  FROM enc
  JOIN rsE es ON es.e = enc.s
  JOIN rsE eo ON eo.e = enc.o
  JOIN rsW wp ON wp.p = enc.p)
SELECT s, p, o,
       round(list_dot_product(esv, {wv}), 6) AS score
FROM rsj
"""


def _ev_sql(id_expr: str, salt: str, d: int) -> str:
    key = f"concat_ws('|', '{salt}', CAST({id_expr} AS VARCHAR), CAST(i AS VARCHAR))"
    h = sql_phash32(key, "duckdb")
    return (f"list_transform(generate_series(0, {d - 1}), "
            f"i -> (({h} % 1000) / 1000.0 - 0.5))")


def proje_scores_sql(triples_cte: str, d: int = DIM_EMB) -> str:
    """Oracle for :func:`proje_scores`: identical hash-derived vectors,
    identical elementwise-combine → tanh → sequential-dot order."""
    from kgspark.typesys import kg_ctes

    es, eo, rp = (_ev_sql("s", "pe", d), _ev_sql("o", "pe", d),
                  _ev_sql("p", "pr", d))
    w1, w2 = _ev_sql("0", "pw1", d), _ev_sql("0", "pw2", d)
    return f"""
WITH {kg_ctes(triples_cte)},
pjv AS (SELECT s, p, o, {es} AS es, {eo} AS eo, {rp} AS rp,
               {w1} AS w1, {w2} AS w2 FROM enc),
pjc AS (
  SELECT s, p, o, es, eo,
         list_transform(generate_series(1, {d}),
                        i -> (1.0 - 2.0 / (exp(2.0 * (es[i] * w1[i]
                              + rp[i] * w2[i])) + 1.0))) AS c
  FROM pjv)
SELECT s, p, o,
       round((list_dot_product(c, es) + list_dot_product(c, eo)) / 2.0,
             6) AS score
FROM pjc
"""


def rescal_scores_sql(triples_cte: str, d: int = DIM_EMB) -> str:
    """Oracle for :func:`rescal_scores`: identical hash-derived eₛ/e_o
    and W_p, identical fold order (list_dot_product ≡ the Spark
    sequential _dot)."""
    from kgspark.typesys import kg_ctes

    es, eo = _ev_sql("s", "re", d), _ev_sql("o", "re", d)
    wkey = ("concat_ws('|', 'rw', CAST(p AS VARCHAR), "
            "CAST(i AS VARCHAR), CAST(j AS VARCHAR))")
    h = sql_phash32(wkey, "duckdb")
    w = (f"list_transform(generate_series(0, {d - 1}), i -> "
         f"list_transform(generate_series(0, {d - 1}), j -> "
         f"(({h} % 1000) / 1000.0 - 0.5)))")
    return f"""
WITH {kg_ctes(triples_cte)},
rsv AS (SELECT s, p, o, {es} AS es, {eo} AS eo, {w} AS w FROM enc),
rsw AS (
  SELECT s, p, o, es,
         list_transform(w, row -> list_dot_product(row, eo)) AS wv
  FROM rsv)
SELECT s, p, o, round(list_dot_product(es, wv), 6) AS score FROM rsw
"""


def hole_scores_sql(triples_cte: str, d: int = DIM_EMB) -> str:
    """Oracle: identical hash-derived vectors, rotation dot products via
    list_dot_product (bit-identical to the Spark sequential fold)."""
    from kgspark.typesys import kg_ctes

    es, eo, rp = (_ev_sql("s", "he", d), _ev_sql("o", "he", d),
                  _ev_sql("p", "hr", d))
    cc = (f"list_transform(generate_series(0, {d - 1}), "
          f"k -> list_dot_product(es, "
          f"list_concat(list_slice(eo, k + 1, {d}), list_slice(eo, 1, k))))")
    return f"""
WITH {kg_ctes(triples_cte)},
hv AS (SELECT s, p, o, {es} AS es, {eo} AS eo, {rp} AS rp FROM enc)
SELECT s, p, o,
       round(list_dot_product(rp, {cc}), 6) AS score
FROM hv
"""
