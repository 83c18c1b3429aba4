#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

Modes:
  python bench.py               # single run at local[$SPARK_GRAFT_CPUS]
  python bench.py --scaling     # same job at local[N] vs local[4N]
                                # (default 2 vs 8 — the regime where the
                                # single box is not memory-bandwidth
                                # saturated, see BASELINE.md) on a
                                # deterministically replicated corpus;
                                # reports throughput at both + efficiency
                                # — the in-sandbox stand-in for N vs 4N
                                # executors
"""

from __future__ import annotations

import json
import os
import sys
import time


def _e2e(spark, rf, p_error=0.05):
    """extract → link → canonicalize → encode → corrupt → score → rank."""
    from pyspark.sql import functions as F

    from kgspark import encode, errorsgen, extract, link, rank, scoring, typesys
    from kgspark.util import materialize

    t = {}
    t0 = time.time()
    # bench corpus is the base variant (no file→file mention lines)
    tr_raw = materialize(extract.extract_triples(rf, file_mentions=False))
    t["extract"] = time.time() - t0

    t0 = time.time()
    tr = materialize(link.canonicalize_triples(tr_raw))
    t["link_canonicalize"] = time.time() - t0

    t0 = time.time()
    ents, rels = encode.build_dims(tr)
    ents, rels = materialize(ents), materialize(rels)
    enc = materialize(encode.encode_triples(tr, ents, rels))
    n_triples = enc.count()
    t["encode"] = time.time() - t0

    t0 = time.time()
    types = materialize(typesys.build_types(ents, enc, rels)[0])
    t["types"] = time.time() - t0

    t0 = time.time()
    n_entities = ents.count()
    errs = errorsgen.inject_errors_kind1(enc, n_entities, p_error)
    noisy = materialize(
        enc.select("s", "p", "o", F.lit(False).alias("is_error")).unionByName(
            errs.select("s", "p", "o", F.lit(True).alias("is_error"))))
    t["inject_errors"] = time.time() - t0

    t0 = time.time()
    scores = scoring.sdvalidate_scores(noisy.select("s", "p", "o"), types)
    scores = materialize(scores.withColumn("score", F.round("score", 6)))
    t["sdvalidate_score"] = time.time() - t0

    t0 = time.time()
    ranked = rank.rank_facts(scores).join(noisy, ["s", "p", "o"])
    ranked.count()
    t["rank"] = time.time() - t0

    return t, n_triples, (tr_raw, tr, enc, types, noisy)


def run_scaling(master: str, sf_dir: str, replicate: int,
                runs: int = 3) -> dict:
    """Median-of-``runs`` e2e throughput at one parallelism.

    Protocol (BASELINE.md): one session per core count; the FIRST pass is
    a discarded warm-up (JIT compilation, code-gen caches, broadcast of
    the tiny docs table — the same treatment on both sides of the N-vs-4N
    comparison), then ``runs`` measured passes; the median kills the
    run-to-run scheduler/GC noise that made single-shot efficiency swing
    0.65-0.80 in round 1."""
    from kgspark import synth
    from kgspark.session import get_spark

    spark = get_spark("kgspark-bench", master=master)
    rf = synth.repo_files_scaled(spark, sf_dir, replicate)
    secs, n_triples, queries, inter = [], 0, {}, None
    for i in range(runs + 1):
        t0 = time.time()
        timings, n_triples, inter = _e2e(spark, rf)
        dt = time.time() - t0
        if i > 0:  # first pass = warm-up, discarded
            secs.append(dt)
            queries = timings
    # corrections stage (the most expensive operator at sf0.1): measured
    # once per side with its own warm-up so its N→4N efficiency is part
    # of the scaling evidence, not assumed from the e2e mix. It runs on
    # its OWN smaller replicate: the k·10⁶ doc-id offsets of the
    # replication scheme make every file name-similar to its ~replicate
    # cross-replica twins, so name-candidate pairs grow QUADRATICALLY in
    # the replicate factor — a fixture artifact (real corpora have
    # bounded near-name groups), not an operator property; at the default
    # 8× the stage still shuffles hundreds of thousands of blocked pairs.
    from pyspark.sql import functions as F

    from kgspark import correct, encode, scoring
    from kgspark import rank as _rank
    from kgspark.util import materialize

    corr_rep = int(os.environ.get("SPARK_GRAFT_CORR_REPLICATE", "8"))
    rfc = synth.repo_files_scaled(spark, sf_dir, corr_rep)
    _, _, (_, tr, enc, types, noisy) = _e2e(spark, rfc)
    facts = noisy.select("s", "p", "o")
    sc0 = scoring.sdvalidate_scores(facts, types) \
        .withColumn("score", F.round("score", 6))
    rk0 = materialize(_rank.rank_facts(sc0))
    ents_df = materialize(encode.build_dims(tr)[0])

    def _corr():
        correct.correct_errors(rk0, facts, types, ents_df,
                               min_score=0.01, min_score_gain=1.0).count()

    _corr()  # warm-up
    t0 = time.time()
    _corr()
    queries["corrections"] = time.time() - t0
    spark.stop()
    secs.sort()
    med = secs[len(secs) // 2] if len(secs) % 2 else \
        (secs[len(secs) // 2 - 1] + secs[len(secs) // 2]) / 2
    return {
        "e2e_warm_sec_runs": [round(s, 3) for s in secs],
        "e2e_warm_med_sec": round(med, 3),
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / med, 1),
    }


def run_scaling_pass(master: str, sf_dir: str, replicate: int):
    """One fresh-JVM scaling pass: a discarded warm-up e2e (JIT,
    codegen caches — the same treatment both sides get) then ONE
    measured pass. Building block of the INTERLEAVED protocol: the
    lo/hi sides alternate pass-by-pass inside one wall-clock window, so
    box contention that drifts over minutes hits both sides of a pair
    roughly equally instead of landing on whichever side was measured
    during the bad stretch (round-5's 0.498-0.839 attempt spread)."""
    from kgspark import synth
    from kgspark.session import get_spark

    spark = get_spark("kgspark-bench", master=master)
    rf = synth.repo_files_scaled(spark, sf_dir, replicate)
    _e2e(spark, rf)  # warm-up, discarded
    t0 = time.time()
    timings, n_triples, _ = _e2e(spark, rf)
    dt = time.time() - t0
    spark.stop()
    return round(dt, 3), n_triples, {k: round(v, 3)
                                     for k, v in timings.items()}


def run_scaling_interleaved(sf_dir: str, replicate: int, runs: int,
                            lo_n: int, hi_n: int) -> dict:
    """Interleaved N-vs-4N protocol: ``runs`` (lo, hi) PAIRS measured
    back-to-back (lo₁ hi₁ lo₂ hi₂ …), one fresh JVM + discarded warm-up
    per pass; the reported efficiency is the MEDIAN of per-pair
    efficiencies, so a contended stretch degrades one pair's both sides
    rather than one whole side of the comparison."""
    import statistics

    ratio = hi_n / lo_n
    pairs, n_triples = [], 0
    for i in range(runs):
        lo_sec, n_triples, lo_q = run_scaling_pass(
            f"local[{lo_n}]", sf_dir, replicate)
        hi_sec, _, hi_q = run_scaling_pass(
            f"local[{hi_n}]", sf_dir, replicate)
        pairs.append({"lo_sec": lo_sec, "hi_sec": hi_sec,
                      "lo_queries": lo_q, "hi_queries": hi_q,
                      "efficiency": round((lo_sec / hi_sec) / ratio, 3)})
    effs = sorted(p["efficiency"] for p in pairs)
    med_eff = effs[len(effs) // 2] if len(effs) % 2 else \
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    lo_med = statistics.median(p["lo_sec"] for p in pairs)
    hi_med = statistics.median(p["hi_sec"] for p in pairs)
    stage_speedup = {
        k: round(statistics.median(p["lo_queries"][k] for p in pairs)
                 / statistics.median(p["hi_queries"][k] for p in pairs), 2)
        for k in pairs[0]["hi_queries"]
        if all(p["lo_queries"].get(k) and p["hi_queries"].get(k)
               for p in pairs)
    }
    return {
        "protocol": "interleaved",
        "pairs": pairs,
        "pair_efficiencies": [p["efficiency"] for p in pairs],
        "efficiency": round(med_eff, 3),
        f"local[{lo_n}]_sec_runs": [p["lo_sec"] for p in pairs],
        f"local[{hi_n}]_sec_runs": [p["hi_sec"] for p in pairs],
        f"local[{lo_n}]_sec": lo_med,
        f"local[{hi_n}]_sec": hi_med,
        f"local[{lo_n}]_triples_per_sec": round(n_triples / lo_med, 1),
        f"local[{hi_n}]_triples_per_sec": round(n_triples / hi_med, 1),
        "stage_speedup": stage_speedup,
        "n_triples": n_triples,
    }


def run_once(master: str, sf_dir: str, replicate: int = 0,
             extras: bool = True) -> dict:
    from kgspark import synth
    from kgspark.session import get_spark

    spark = get_spark("kgspark-bench", master=master)
    if replicate:
        rf = synth.repo_files_scaled(spark, sf_dir, replicate)
    else:
        rf = synth.repo_files(spark, sf_dir)

    # BOTH protocols in one run, under distinct fields: the FIRST pass
    # is the cold single-shot number (the r1–r3 cross-round metric,
    # kept as e2e_cold_sec) and doubles as the warm-up; the
    # second pass is the warm number (e2e_warm_sec, JIT + codegen + OS
    # page cache — the --scaling protocol's treatment). Cross-round
    # comparisons must pair cold-to-cold or warm-to-warm.
    t0 = time.time()
    timings_cold, n_triples, _ = _e2e(spark, rf)
    e2e_cold_sec = time.time() - t0

    t_all0 = time.time()
    timings, n_triples, (tr_raw, tr, enc, types, noisy) = _e2e(spark, rf)
    e2e_warm_sec = time.time() - t_all0

    if extras:
        from pyspark.sql import functions as F

        import kgspark.patybred as pb
        from kgspark import dedup, rank, scoring, simsearch, textstats

        t0 = time.time()
        idx = pb.enumerate_paths(enc, 4)
        n_ents = enc.selectExpr("max(greatest(s, o)) m").first()["m"]
        models = pb.fit_models(enc, idx, types, int(n_ents))
        pb.score_facts(enc, idx, types, models).count()
        timings["patybred_train_score"] = time.time() - t0

        t0 = time.time()
        dt_models = pb.fit_models_dt(enc, idx, types, int(n_ents))
        pb.score_facts_dt(enc, idx, types, dt_models).count()
        timings["patybred_dt_train_score"] = time.time() - t0

        t0 = time.time()
        from kgspark import correct, encode
        from kgspark import rank as _rank
        from kgspark.util import materialize

        sc0 = scoring.sdvalidate_scores(noisy.select("s", "p", "o"), types) \
            .withColumn("score", F.round("score", 6))
        rk0 = materialize(_rank.rank_facts(sc0))
        ents_df, _ = encode.build_dims(tr)  # name candidates need the dim
        correct.correct_errors(rk0, noisy.select("s", "p", "o"), types,
                               ents_df, min_score=0.01,
                               min_score_gain=1.0).count()
        correct.type_corrections(rk0, noisy.select("s", "p", "o"), types,
                                 min_score=0.01, min_score_gain=1.0).count()
        timings["corrections"] = time.time() - t0

        t0 = time.time()
        sc = scoring.sdvalidate_scores(noisy.select("s", "p", "o"), types) \
            .withColumn("score", F.round("score", 6))
        rank.evaluate(rank.rank_facts(sc).join(noisy, ["s", "p", "o"])).collect()
        timings["evaluate_metrics"] = time.time() - t0

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        t0 = time.time()
        dedup.dedup_minhash(docs, 0.4).count()
        timings["dedup_minhash"] = time.time() - t0
        t0 = time.time()
        dedup.simhash_pairs(docs, 6).count()
        timings["dedup_simhash"] = time.time() - t0
        t0 = time.time()
        simsearch.ann_bruteforce(emb).count()
        timings["ann_topk"] = time.time() - t0
        t0 = time.time()
        textstats.quality_scores(docs).count()
        textstats.lang_id(docs).count()
        timings["textstats"] = time.time() - t0

    total = time.time() - t_all0
    spark.stop()
    return {
        "total_sec": round(total, 3),
        # The ambiguous `e2e_sec` alias is gone (r4 recorded warm under
        # it, r5 cold): only protocol-explicit fields are emitted now.
        # Cross-round cold comparisons use e2e_cold_sec (== the r1-r3
        # and r5 `e2e_sec` protocol).
        "e2e_cold_sec": round(e2e_cold_sec, 3),
        "e2e_warm_sec": round(e2e_warm_sec, 3),
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "queries_cold": {k: round(v, 3) for k, v in timings_cold.items()},
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / e2e_cold_sec, 1),
        "triples_per_sec_warm": round(n_triples / e2e_warm_sec, 1),
    }


def run_probes(sf_dir: str, replicate: int = 256) -> dict:
    """Isolate WHERE single-box scaling efficiency goes (1 vs 4 cores):
    a compute-bound job (sha256 + hash agg — one narrow shuffle) vs a
    shuffle-bound job (full-width repartition + distinct). On a shared-
    memory box the compute probe scales near-linearly while the shuffle
    probe is capped by memory bandwidth — the gap quantifies the sandbox
    artifact vs plan quality (see BASELINE.md)."""
    import time as _t

    from pyspark.sql import functions as F

    from kgspark import synth
    from kgspark.session import get_spark

    def side(master):
        spark = get_spark("kgspark-probes", master=master)
        rf = synth.repo_files_scaled(spark, sf_dir, replicate)

        def compute():
            rf.select(F.sha2("content", 256).alias("h")).groupBy(
                F.substring("h", 1, 2).alias("b")).agg(
                F.count("*").alias("c"), F.max("h").alias("m")).count()

        def shuffle():
            rf.repartition(8, "path").select(
                "repo", "path", "content").distinct().count()

        out = {}
        for name, job in (("compute", compute), ("shuffle", shuffle)):
            job()  # warm-up
            runs = []
            for _ in range(3):
                t0 = _t.time()
                job()
                runs.append(_t.time() - t0)
            out[name] = sorted(runs)[1]
        spark.stop()
        return out

    lo, hi = side("local[1]"), side("local[4]")
    return {
        "replicate": replicate,
        "local[1]": {k: round(v, 3) for k, v in lo.items()},
        "local[4]": {k: round(v, 3) for k, v in hi.items()},
        "efficiency": {k: round(lo[k] / hi[k] / 4, 3) for k in lo},
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if "--probes" in sys.argv:
        os.environ.setdefault("SPARK_GRAFT_COALESCE", "false")
        out = {"metric": "compute vs shuffle 1->4 core scaling probes",
               "unit": "sec", "sf": sf, **run_probes(sf_dir)}
        print(json.dumps(out))
        return
    if "--scaling" in sys.argv:
        # parallelism must track core count for the N-vs-4N comparison
        os.environ.setdefault("SPARK_GRAFT_COALESCE", "false")
        replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "512"))
        runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
        lo_n = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "2"))
        hi_n = 4 * lo_n
        protocol = os.environ.get("SPARK_GRAFT_SCALE_PROTOCOL",
                                  "interleaved")
        if protocol == "interleaved":
            s = run_scaling_interleaved(sf_dir, replicate, runs, lo_n,
                                        hi_n)
            out = {
                "metric": ("kg pipeline e2e scaling "
                           "(extract→link→encode→corrupt→score→rank)"),
                "value": s[f"local[{hi_n}]_sec"],
                "unit": "sec",
                "sf": sf,
                "replicate": replicate,
                "runs_per_side": runs,
                "n_triples": s.pop("n_triples"),
                "scaling": s,
            }
            print(json.dumps(out))
            return
        lo = run_scaling(f"local[{lo_n}]", sf_dir, replicate, runs)
        hi = run_scaling(f"local[{hi_n}]", sf_dir, replicate, runs)
        eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / (hi_n / lo_n)
        stage_speedup = {
            k: round(lo["queries"][k] / hi["queries"][k], 2)
            for k in hi["queries"] if lo["queries"].get(k)
        }
        out = {
            "metric": "kg pipeline e2e scaling (extract→link→encode→corrupt→score→rank)",
            "value": hi["e2e_warm_med_sec"],
            "unit": "sec",
            "queries": hi["queries"],
            "sf": sf,
            "replicate": replicate,
            "runs_per_side": runs,
            "n_triples": hi["n_triples"],
            "queries_lo": lo["queries"],
            "scaling": {
                f"local[{lo_n}]_triples_per_sec": lo["triples_per_sec"],
                f"local[{hi_n}]_triples_per_sec": hi["triples_per_sec"],
                f"local[{lo_n}]_sec_runs": lo["e2e_warm_sec_runs"],
                f"local[{hi_n}]_sec_runs": hi["e2e_warm_sec_runs"],
                f"local[{lo_n}]_sec": lo["e2e_warm_med_sec"],
                f"local[{hi_n}]_sec": hi["e2e_warm_med_sec"],
                "efficiency": round(eff, 3),
                "stage_speedup": stage_speedup,
            },
        }
    else:
        r = run_once(f"local[{cpus}]", sf_dir)
        out = {
            "metric": "kg pipeline e2e (extract→link→encode→corrupt→score→rank) + operator suite",
            "value": r["total_sec"],
            "unit": "sec",
            "queries": r["queries"],
            "queries_cold": r["queries_cold"],
            "sf": sf,
            "e2e_cold_sec": r["e2e_cold_sec"],
            "e2e_warm_sec": r["e2e_warm_sec"],
            "n_triples": r["n_triples"],
            "triples_per_sec": r["triples_per_sec"],
            "triples_per_sec_warm": r["triples_per_sec_warm"],
            "cores": int(cpus),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
