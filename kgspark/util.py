"""Shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
