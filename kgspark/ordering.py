"""Scalable deterministic global ordering (SURVEY §2 W1).

``row_number()`` over an un-partitioned window collapses to a single
partition — fatal at 10^12 rows. This module computes a global ordinal
rank with the bucketed two-phase pattern (same as kgspark.encode.dense_ids):
a deterministic, order-monotone bucket key → parallel within-bucket
row_number → tiny bucket histogram → broadcast offsets.

The bucket key MUST be a non-decreasing function of the sort order
(e.g. ``floor(score * 1024)`` for a leading ascending score column) so
that bucket-major + within-bucket order equals the global order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_ordinal(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rank",
    bucket: Column | None = None,
) -> DataFrame:
    if bucket is None:
        bucket = F.floor(F.col(order_cols[0]) * 1024)
    b = df.withColumn("_b", bucket.cast("long"))
    hist = [(r["_b"], r["cnt"]) for r in
            b.groupBy("_b").agg(F.count("*").alias("cnt")).collect()]
    hist.sort(key=lambda x: (x[0] is None, x[0]))
    offsets, acc = [], 0
    for bk, cnt in hist:
        offsets.append((bk, acc))
        acc += cnt
    off_df = df.sparkSession.createDataFrame(offsets, "`_b` long, `_off` long")

    w = Window.partitionBy("_b").orderBy(*[F.col(c) for c in order_cols])
    return (
        b.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_b")
        .withColumn(out, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_b", "_rn", "_off")
    )
