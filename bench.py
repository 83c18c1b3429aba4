#!/usr/bin/env python
"""Benchmark harness: headline KG pipeline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...,
   "cores": N}

Modes:
  python bench.py                # single run at local[$SPARK_GRAFT_CPUS]
  python bench.py --scaling      # run at local[8] and local[32], report
                                 # throughput at both + scaling efficiency
                                 # (the in-sandbox stand-in for N vs 4N
                                 # executors per BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_once(master: str, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from kgspark import pipeline, rank, scoring
    from kgspark.session import get_spark

    spark = get_spark("kgspark-bench", master=master)
    timings: dict[str, float] = {}
    t_total0 = time.time()

    # ---- stage 1: extract + encode (E1 ingest analog)
    t0 = time.time()
    g = pipeline.build_graph(spark, sf_dir)
    n_triples = g.triples.count()
    timings["extract_encode"] = time.time() - t0

    # ---- stage 2: type system
    t0 = time.time()
    n_types = g.types.count()
    timings["types"] = time.time() - t0

    # ---- stage 3: corrupt + score + rank (E2/E3 analog)
    t0 = time.time()
    noisy = pipeline.materialize(pipeline.noisy_facts(g, 0.05))
    timings["inject_errors"] = time.time() - t0

    t0 = time.time()
    scores = scoring.sdvalidate_scores(noisy.select("s", "p", "o"), g.types)
    scores = pipeline.materialize(scores.withColumn("score", F.round("score", 6)))
    timings["sdvalidate_score"] = time.time() - t0

    t0 = time.time()
    ranked = rank.rank_facts(scores)
    flagged = ranked.join(noisy, ["s", "p", "o"])
    n_ranked = flagged.count()
    timings["rank"] = time.time() - t0

    t0 = time.time()
    rank.evaluate(flagged).collect()
    timings["evaluate"] = time.time() - t0

    # ---- additional scorers
    t0 = time.time()
    scoring.domran_scores(g.triples, g.types).count()
    timings["domran_score"] = time.time() - t0

    total = time.time() - t_total0
    spark.stop()
    return {
        "total_sec": total,
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "n_triples": n_triples,
        "n_ranked": n_ranked,
        "n_types": n_types,
        "triples_per_sec": round(n_triples / total, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if "--scaling" in sys.argv:
        lo_n, hi_n = 8, 32
        lo = run_once(f"local[{lo_n}]", sf_dir)
        hi = run_once(f"local[{hi_n}]", sf_dir)
        eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / (hi_n / lo_n)
        out = {
            "metric": "kg pipeline e2e (extract→encode→corrupt→score→rank) scaling",
            "value": round(hi["total_sec"], 3),
            "unit": "sec",
            "queries": hi["queries"],
            "sf": sf,
            "scaling": {
                f"local[{lo_n}]": lo["triples_per_sec"],
                f"local[{hi_n}]": hi["triples_per_sec"],
                "efficiency": round(eff, 3),
            },
            "triples_per_sec": hi["triples_per_sec"],
        }
    else:
        r = run_once(f"local[{cpus}]", sf_dir)
        out = {
            "metric": "kg pipeline e2e (extract→encode→corrupt→score→rank)",
            "value": round(r["total_sec"], 3),
            "unit": "sec",
            "queries": r["queries"],
            "sf": sf,
            "n_triples": r["n_triples"],
            "triples_per_sec": r["triples_per_sec"],
            "cores": int(cpus),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
