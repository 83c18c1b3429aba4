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


def global_ordinal(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism * 2, 8)

    from kgspark.util import materialize

    cols = [F.col(c) for c in order_cols]
    # materialize the ranged layout so the histogram job and the ranking job
    # see identical partition boundaries (range sampling runs once)
    ranged = materialize(df.repartitionByRange(num_partitions, *cols)) \
        .withColumn("_pid", F.spark_partition_id())

    hist = [(r["_pid"], r["cnt"]) for r in
            ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()]
    hist.sort(key=lambda x: x[0])
    offsets, acc = [], 0
    for pid, cnt in hist:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets, "`_pid` int, `_off` long")

    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )
