"""Shared plan utilities."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def oracle_sf_dir() -> str:
    """Dataset dir the driver's oracle comparison runs at.

    The Spark-free classifier fits embedded in oracle SQL (patybred,
    corrections) must be fitted on the SAME dataset the driver compares
    at — a hard-coded default silently embeds wrong-data weights at any
    other scale factor. Honors the simdriver/driver env (SIM_SF), then an
    explicit override, then the driver-contract default of sf0.01.
    """
    return os.environ.get(
        "SIM_SF",
        os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"))


def shuffle_parts(df: DataFrame, default: int = 64) -> int:
    """The session's configured shuffle width (coalesce target for
    many-branch unions — see materialize callers in patybred)."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return default


def spread_input(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Repartition a narrowly-partitioned source so per-row compute
    parallelizes (guide §2.5 "input skew: one huge unsplittable file —
    repartition immediately after the read").

    The fixture ``documents``/``embeddings`` parquet is ONE file with one
    row group, so every tokenize/hash/dot-product pass downstream of the
    scan otherwise runs on a single task regardless of cluster width. A
    many-file corpus (the at-scale shape) already scans wide and is left
    untouched — the repartition only fires when the source has fewer
    partitions than the target width, so no shuffle is added at scale.

    The default target grows the split count by at most 8x (capped at the
    cluster parallelism): measured at sf0.1, fan-outs past ~8 stop paying
    (repartition + scheduling overhead eats the extra parallelism) while
    8x already takes the serial hash passes off the critical path; the
    bound also keeps shuffle block growth linear (guide §2.2).
    """
    sc = df.sparkSession.sparkContext
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    target = parts or min(sc.defaultParallelism, 8 * cur)
    return df.repartition(target) if cur < target else df


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute and truncate lineage (checkpoint-light).

    Composed KG pipelines re-use stage outputs many times; without
    truncation the logical plan tree grows multiplicatively (each reuse
    embeds the full upstream subtree), which bloats planning and the
    per-action plan-string rendering. ``localCheckpoint(eager=True)``
    bounds every downstream plan at the stage boundary — the in-session
    analog of the reference's NPZ stage files and of our parquet
    checkpoints (kgspark.checkpoint) used for cross-run resume.
    """
    return df.localCheckpoint(eager=True)
