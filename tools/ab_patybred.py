"""A/B probe: time the patybred_train_score stage (enumerate_paths +
fit_models + score_facts, the bench stage content) at sf0.1 local[32].

Usage: python tools/ab_patybred.py <repo_path> <label>

Protocol (BASELINE.md round 6): check out the comparison code into a
git worktree, then ALTERNATE processes (A, B, A, B, ...) inside one
wall-clock window on an otherwise-idle box; each process discards one
warm-up and reports 3 timed runs + the median. Compare PAIRED medians.
The stage call busts the path-BFS memo each run (fresh DataFrame
object) so every run does the full enumerate+fit+score work.
"""
import json
import os
import sys
import time

repo, label = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
os.chdir(repo)

from kgspark.session import get_spark  # noqa: E402
from kgspark import synth  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("ab-pb", master="local[32]")
import bench  # noqa: E402

rf = synth.repo_files(spark, sf_dir)
_, _, (tr_raw, tr, enc, types, noisy) = bench._e2e(spark, rf)
import kgspark.patybred as pb  # noqa: E402

n_ents = int(enc.selectExpr("max(greatest(s, o)) m").first()["m"])


def stage():
    # fresh DF object each call -> busts the path-BFS memo, so every
    # run does the full enumerate+fit+score work like the bench stage
    e = enc.select("s", "p", "o")
    idx = pb.enumerate_paths(e, 4)
    models = pb.fit_models(e, idx, types, n_ents)
    pb.score_facts(e, idx, types, models).count()


stage()  # warm-up, discarded
times = []
for _ in range(3):
    t0 = time.time()
    stage()
    times.append(round(time.time() - t0, 2))
print(json.dumps({"label": label, "times": times,
                  "median": sorted(times)[1]}))
spark.stop()
