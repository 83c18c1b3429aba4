"""Scalable deterministic global ordering (SURVEY §2 W1).

``row_number()`` over an un-partitioned window collapses to a single
partition — fatal at 10^12 rows. This computes a global ordinal rank with
range repartitioning:

  1. ``repartitionByRange`` on the full sort key (boundaries come from
     sampling, but the FINAL RANK is boundary-independent: it equals the
     row's position in the total order wherever the cuts land, and the
     sort key is made total by the caller's tie-break columns);
  2. per-partition row_number (parallel) — range partition ids are
     ordered, so global rank = partition offset + local row_number;
  3. offsets = cumulative counts over the per-partition histogram
     (one tiny collect).

Unlike value-bucketing schemes (e.g. ``floor(score * K)``), range
partitioning stays balanced when the leading sort column has few distinct
values with huge tie groups — the realistic shape for scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _is_materialized(df: DataFrame) -> bool:
    """True when ``df`` is already a checkpointed/scanned leaf (LogicalRDD
    from ``localCheckpoint`` / ``createDataFrame``), i.e. re-executing it
    costs a scan, not a recompute of upstream lineage."""
    try:
        name = df._jdf.queryExecution().logical().getClass().getSimpleName()
        return name in ("LogicalRDD", "LocalRelation")
    except Exception:
        return False


def _ranged_with_offsets(
    df: DataFrame,
    order_cols: list[str],
    agg_cols: list[str],
    num_partitions: int | None = None,
):
    """Shared phase-1 of the range-partitioned global operators.

    Range-repartitions on ``order_cols`` (materialized so every downstream
    job sees identical boundaries), then computes, per ordered partition,
    the EXCLUSIVE prefix totals of each ``agg_cols`` entry over all earlier
    partitions ("*" = row count). Returns ``(ranged, off_df)`` where
    ``ranged`` carries ``_pid`` and ``off_df`` is a tiny (n_partitions)-row
    offset table to broadcast-join back — the per-partition histogram is
    the ONLY driver-side collect, so the pattern holds at any row count.
    """
    spark = df.sparkSession

    from kgspark.util import materialize

    # repartitionByRange runs the child TWICE (boundary-sampling pass +
    # the shuffle map); checkpoint non-trivial lineage first so the
    # upstream (often a full scoring pipeline) is computed once.
    if not _is_materialized(df):
        df = materialize(df)
    if num_partitions is None:
        # scale-adaptive width: track the (AQE-coalesced) input partition
        # count — an explicit repartitionByRange(N) is exempt from AQE
        # coalescing, so a fixed N would mean N near-empty range tasks on
        # small inputs and too-few on huge ones. Cap at 2x cluster
        # parallelism (the session's shuffle sizing policy).
        try:
            in_parts = df.rdd.getNumPartitions()
        except Exception:
            in_parts = spark.sparkContext.defaultParallelism * 2
        num_partitions = max(8, min(
            in_parts, spark.sparkContext.defaultParallelism * 2))
    cols = [F.col(c) for c in order_cols]
    ranged = materialize(df.repartitionByRange(num_partitions, *cols)) \
        .withColumn("_pid", F.spark_partition_id())

    aggs = [
        (F.count("*") if c == "*" else F.sum(c)).alias(f"_t{i}")
        for i, c in enumerate(agg_cols)
    ]
    hist = ranged.groupBy("_pid").agg(*aggs).collect()
    hist.sort(key=lambda r: r["_pid"])
    offsets, acc = [], [0] * len(agg_cols)
    for r in hist:
        offsets.append((r["_pid"], *acc))
        for i in range(len(agg_cols)):
            acc[i] += r[f"_t{i}"] or 0
    schema = "`_pid` int, " + ", ".join(
        f"`_off{i}` long" for i in range(len(agg_cols)))
    off_df = spark.createDataFrame(offsets, schema)
    return ranged, off_df


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    prefix: str = "cum_",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sums of integral ``sum_cols`` in the total order of
    ``order_cols`` — the two-phase replacement for
    ``F.sum(c).over(Window.orderBy(...))``, which collapses to ONE
    partition. Per-partition window sums run in parallel; cross-partition
    offsets come from the broadcast histogram. ``order_cols`` must be a
    total (duplicate-free) key so the running sum is well defined.
    """
    ranged, off_df = _ranged_with_offsets(df, order_cols, sum_cols,
                                          num_partitions)
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = ranged.join(F.broadcast(off_df), "_pid")
    for i, c in enumerate(sum_cols):
        out = out.withColumn(prefix + c, F.sum(c).over(w) + F.col(f"_off{i}"))
    return out.drop("_pid", *[f"_off{i}" for i in range(len(sum_cols))])


def grouped_ordinal(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    out: str = "gidx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group 1-based ordinal without ``Window.partitionBy(group)`` —
    safe when single groups are huge (hot subjects, giant type-signature
    pools) or when there are only a handful of groups (e.g. 4 relations):
    the range partitioner splits WITHIN a group because the sort key
    continues past the group columns, so no task ever owns a whole group.

    ordinal = global ordinal over (group ++ order) minus the group's
    offset (min global ordinal, a plain shuffle agg) + 1.
    """
    r = global_ordinal(df, group_cols + order_cols, out="_gord",
                       num_partitions=num_partitions)
    mins = r.groupBy(*group_cols).agg(F.min("_gord").alias("_g0"))
    return (
        r.join(mins, group_cols)
        .withColumn(out, (F.col("_gord") - F.col("_g0") + 1).cast("long"))
        .drop("_gord", "_g0")
    )


def global_ordinal(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    ranged, off_df = _ranged_with_offsets(df, order_cols, ["*"],
                                          num_partitions)
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.col("_off0") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off0")
    )
