#!/usr/bin/env python
"""spark-submit entry point for the kgspark KG construction pipeline.

Cluster usage (north rule):

    spark-submit --py-files kgspark.zip run_pipeline.py \
        --sf-dir /data/repo_corpus --workdir /checkpoints/run1 \
        --method patybred --p-error 0.05

(`kgspark.zip` = `zip -r kgspark.zip kgspark`.) Local usage:

    python run_pipeline.py --sf-dir /root/testdata/sf0.01 --workdir /tmp/ck

Every stage is checkpoint-resumable: rerunning with the same workdir
resumes from the last completed stage; changing a parameter recomputes
only the affected suffix of the DAG. Prints one JSON line with the
error-detection metrics and the per-stage compute/resume audit.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--method", choices=["sdvalidate", "patybred", "correct"],
                    default="sdvalidate")
    ap.add_argument("--p-error", type=float, default=0.05)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from kgspark.checkpoint import run_pipeline
    from kgspark.session import get_spark

    spark = get_spark("kgspark-pipeline", master=args.master)
    out = run_pipeline(spark, args.sf_dir, args.workdir, args.method,
                       args.p_error)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
