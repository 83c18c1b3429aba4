"""Checkpoint/resume: lineage fingerprints, per-partition counters."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kgspark.checkpoint import Checkpointer, run_pipeline, with_salt
from tests.conftest import SF_TINY


def test_stage_resume_and_invalidation(spark, tmp_path):
    wd = str(tmp_path / "ck")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).select(F.col("id").alias("x"))

    ck = Checkpointer(spark, wd)
    a = ck.stage("s1", build, params={"v": 1})
    assert calls["n"] == 1 and a.count() == 10

    ck2 = Checkpointer(spark, wd)
    b = ck2.stage("s1", build, params={"v": 1})
    assert calls["n"] == 1, "resume must not recompute"
    assert b.count() == 10
    assert ck2.events[0]["action"] == "resume"

    ck3 = Checkpointer(spark, wd)
    ck3.stage("s1", build, params={"v": 2})
    assert calls["n"] == 2, "param change must invalidate"


def test_dependency_invalidation_cascades(spark, tmp_path):
    wd = str(tmp_path / "ck")
    calls = {"a": 0, "b": 0}

    def run(pa):
        ck = Checkpointer(spark, wd)
        ck.stage("a", lambda: (calls.__setitem__("a", calls["a"] + 1),
                               spark.range(3))[1], params={"p": pa})
        ck.stage("b", lambda: (calls.__setitem__("b", calls["b"] + 1),
                               spark.range(4))[1], deps=["a"])

    run(1)
    assert calls == {"a": 1, "b": 1}
    run(1)
    assert calls == {"a": 1, "b": 1}
    run(2)  # upstream param change recomputes BOTH
    assert calls == {"a": 2, "b": 2}


def test_manifest_contents(spark, tmp_path):
    wd = str(tmp_path / "ck")
    ck = Checkpointer(spark, wd)
    df = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 3), (5, 2, 6)], "s long, p int, o long")
    ck.stage("t", lambda: df, partition_by=["p"])
    m = json.load(open(os.path.join(wd, "t", MANIFEST_NAME())))
    assert m["rows"] == 3
    assert sum(x["rows"] for x in m["partitions"]) == 3
    assert any("p=1" in x["file"] for x in m["partitions"])
    assert m["partition_by"] == ["p"]


def MANIFEST_NAME():
    from kgspark.checkpoint import MANIFEST
    return MANIFEST


def test_with_salt_partition_invariant(spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(100)], "s long, o long")
    a = with_salt(df.repartition(1), ["s", "o"]).collect()
    b = with_salt(df.repartition(7), ["s", "o"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r["salt"] for r in a} <= set(range(16))


def test_run_pipeline_resume_equivalence(spark, tmp_path):
    """Kill/resume analog: a second run over the same workdir resumes every
    stage and reproduces identical metrics (FIXTURES.md §5d)."""
    wd = str(tmp_path / "pipe")
    r1 = run_pipeline(spark, SF_TINY, wd, "sdvalidate", 0.05)
    r2 = run_pipeline(spark, SF_TINY, wd, "sdvalidate", 0.05)
    assert r1["metrics"] == r2["metrics"]
    assert all(e["action"] == "compute" for e in r1["events"])
    assert all(e["action"] == "resume" for e in r2["events"])
