"""Structured-Streaming ingestion: incremental triple extraction.

The reference is batch-only (NPZ stage files); this module covers the
incremental-corpus regime a 10^12-file pipeline actually faces: new
repo_files partitions keep landing, and extraction — a stateless
projection + explode (kgspark.extract) — is exactly the stage that
streams. Downstream stages (linking/CC, dictionary encoding, scoring)
are iterative/global and re-run as periodic batch compactions over the
accumulated triple log; ``foreach_batch`` exposes the hook.

Design:
* source: file stream over a repo_files parquet directory
  (``maxFilesPerTrigger`` bounds micro-batch size; on a cluster the
  source would be an Iceberg/Kafka stream — same plan downstream);
* per micro-batch: the SAME single-scan extract_triples plan, deduped
  WITHIN the batch (global dedup is a stateful aggregate that cannot
  emit in append mode; the downstream compaction dedups globally —
  mirroring the batch pipeline's final distinct);
* sink: append-mode parquet triple log partitioned by ``pred`` (the
  per-predicate tensor layout, SURVEY §1.4), with the streaming
  checkpoint giving exactly-once file-level semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_FILES_SCHEMA = ("repo string, path string, commit string, "
                     "lang string, content string")


def stream_repo_files(spark: SparkSession, src_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    """Streaming repo_files source over a parquet directory."""
    return (
        spark.readStream.schema(REPO_FILES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def stream_extract_triples(repo_files_stream: DataFrame) -> DataFrame:
    """Streaming triples: the batch single-scan extraction plan applied
    to a streaming DataFrame (stateless — narrow ops + one explode), with
    per-batch dedup deferred to ``dropDuplicatesWithinWatermark``-free
    append semantics (see module docstring)."""
    from kgspark import extract

    fe = extract.file_entity()
    # extract_triples ends in .distinct() — a stateful aggregate that
    # append mode cannot emit; rebuild the same plan without it. The
    # JVM-regex path avoids a Python worker per micro-batch.
    from pyspark.sql import functions as F

    imp = F.expr(
        f"regexp_extract_all(content, '{extract.IMPORT_PATTERN}', 1)")
    dfn = F.expr(
        f"regexp_extract_all(content, '{extract.DEFINE_PATTERN}', 1)")
    inc = F.expr(
        f"regexp_extract_all(content, '{extract.INCLUDE_PATTERN}', 1)")
    tst = F.expr(
        f"regexp_extract_all(content, '{extract.TESTEDBY_PATTERN}', 1)")

    def triple(subj, pred, obj):
        return F.struct(subj.alias("subj"), F.lit(pred).alias("pred"),
                        obj.alias("obj"))

    own = F.concat(F.lit("file:"), F.col("repo"), F.lit("/"))
    mentions = F.concat(
        F.array(
            triple(F.concat(F.lit("repo:"), F.col("repo")), "contains", fe),
            triple(fe, "written_in",
                   F.concat(F.lit("lang:"), F.col("lang"))),
        ),
        F.transform(imp, lambda m: triple(
            fe, "imports", F.concat(F.lit("module:"), m))),
        F.transform(dfn, lambda m: triple(
            fe, "defines", F.concat(F.lit("sym:"), m))),
        F.transform(inc, lambda m: triple(fe, "includes", F.concat(own, m))),
        F.transform(tst, lambda m: triple(fe, "tested_by",
                                          F.concat(own, m))),
    )
    return (
        repo_files_stream.select(F.explode(mentions).alias("t"))
        .select("t.subj", "t.pred", "t.obj")
    )


def run_extraction_stream(spark: SparkSession, src_dir: str, out_dir: str,
                          checkpoint_dir: str,
                          available_now: bool = True):
    """src parquet dir → append-mode triple log partitioned by pred.

    ``available_now=True`` drains everything currently in the source and
    stops (the batch-catchup trigger); False runs continuously.
    Returns the StreamingQuery (already awaited when available_now).
    """
    tr = stream_extract_triples(stream_repo_files(spark, src_dir))
    w = (
        tr.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("pred")
        .outputMode("append")
    )
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return w.start()


def stream_dedup_docs(docs_stream: DataFrame,
                      ttl_seconds: int | None = None) -> DataFrame:
    """Stateful streaming exact-dedup (custom operator via
    ``applyInPandasWithState``): emit each content sha256 exactly ONCE
    across all micro-batches; later arrivals of the same sha are dropped
    against the per-group state.

    CONTRACT (first-batch-wins): the emitted representative is the min
    doc_id within the FIRST micro-batch that carries the sha — the
    streaming analog of "first seen wins" at ingest time. That is NOT
    in general the global min over the whole stream (a later batch may
    carry a smaller id); callers wanting the global min run the batch
    ``dedup.dedup_exact`` compaction over the accumulated log. The
    driver oracle is phrased against the first-containing batch.

    This is the streaming form of ``dedup.dedup_exact`` for a
    training-data ingest pipeline: state is keyed by sha (bounded by the
    number of DISTINCT contents, partitioned across the state store), so
    it scales the same way the batch hash-groupBy does.

    State hygiene at 100 TB: by default state never expires (exact
    dedup semantics — a sha stays deduped forever). ``ttl_seconds``
    switches to a processing-time TTL: a sha idle longer than the TTL
    is evicted and a LATER re-arrival re-emits (bounded state traded
    for bounded-recall dedup — the standard windowed-dedup compromise).
    Pair either mode with the RocksDB state-store provider
    (``run_dedup_stream(rocksdb_state=True)`` or
    ``session.get_spark(extra=ROCKSDB_STATE_CONF)``) so state lives
    off-heap/on-disk instead of executor memory.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def first_seen(key, pdfs, state: GroupState):
        if ttl_seconds is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if ttl_seconds is not None:
                state.setTimeoutDuration(ttl_seconds * 1000)
            return  # sha already emitted in an earlier micro-batch
        best = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        state.update((True,))
        if ttl_seconds is not None:
            state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame({"sha": [key[0]], "doc_id": [best]})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_seconds is not None else GroupStateTimeout.NoTimeout)
    return (
        docs_stream
        .withColumn("sha", F.sha2("text", 256))
        .groupBy("sha")
        .applyInPandasWithState(
            first_seen,
            outputStructType="sha string, doc_id long",
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def stream_dedup_docs_min(docs_stream: DataFrame) -> DataFrame:
    """Global-min streaming dedup (update mode): state keeps the RUNNING
    min doc_id per content sha and re-emits whenever a later micro-batch
    improves it — the live-streaming form of the batch
    ``dedup.dedup_exact`` compaction, closing the first-batch-wins
    caveat of :func:`stream_dedup_docs` for consumers that need
    global-min semantics without a separate batch pass.

    CONTRACT: the emission log is monotone per sha (each emitted doc_id
    is strictly smaller than the previous emission for that sha), so
    ``min(doc_id) GROUP BY sha`` over the log — or equivalently the last
    emission per sha — equals the global min over all arrivals so far.
    A batch that does not improve a sha's min emits nothing.

    State is one long per distinct sha (same scaling story as
    :func:`stream_dedup_docs`); update-mode output needs a
    ``foreachBatch`` sink for files (see :func:`run_dedup_stream_min`).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def running_min(key, pdfs, state: GroupState):
        best = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        if best is None:
            return
        if state.exists:
            (cur,) = state.get
            if best >= cur:
                return  # no improvement — nothing to emit
        state.update((best,))
        yield pd.DataFrame({"sha": [key[0]], "doc_id": [best]})

    return (
        docs_stream
        .withColumn("sha", F.sha2("text", 256))
        .groupBy("sha")
        .applyInPandasWithState(
            running_min,
            outputStructType="sha string, doc_id long",
            stateStructType="min_id long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_dedup_stream_min(spark: SparkSession, src_dir: str, out_dir: str,
                         checkpoint_dir: str,
                         max_files_per_trigger: int = 1):
    """src parquet dir of documents → global-min (sha, doc_id) emission
    log under ``out_dir`` (update-mode improvements appended via
    foreachBatch — the file-sink pattern for update output). Compact
    with ``min(doc_id) GROUP BY sha`` (monotone emissions make that the
    last-emitted, i.e. global-min, value). Drains with availableNow."""
    schema = spark.read.parquet(src_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    q = (
        stream_dedup_docs_min(docs)
        .writeStream
        .foreachBatch(lambda df, bid: df.write.mode("append")
                      .parquet(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


# State-store provider for large dedup state: RocksDB keeps per-key state
# off-heap with incremental checkpointing — the 100 TB default. Pass to
# get_spark(extra=...) or use run_dedup_stream(rocksdb_state=True).
ROCKSDB_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
}


def run_dedup_stream(spark: SparkSession, src_dir: str, out_dir: str,
                     checkpoint_dir: str,
                     max_files_per_trigger: int = 1,
                     ttl_seconds: int | None = None,
                     rocksdb_state: bool = False):
    """src parquet dir of documents → first-seen (sha, doc_id) log.

    ``maxFilesPerTrigger=1`` processes one source file per micro-batch
    (files in mtime order), so cross-batch state is genuinely exercised
    whenever the source has several files. Drains with availableNow.

    ``ttl_seconds`` / ``rocksdb_state`` are the state-hygiene knobs for
    long-running ingest (see :func:`stream_dedup_docs`); the provider
    conf is applied for this query and restored afterwards.
    """
    schema = spark.read.parquet(src_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None) if rocksdb_state else None
    if rocksdb_state:
        spark.conf.set(prov_key, ROCKSDB_STATE_CONF[prov_key])
    try:
        q = (
            stream_dedup_docs(docs, ttl_seconds)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if ttl_seconds is None:
            q.awaitTermination()
        else:
            # With ProcessingTimeTimeout registered, the runner keeps
            # scheduling (empty) micro-batches to evaluate expiry, so
            # availableNow never self-terminates — but a timeout-eval
            # batch (0 input rows) can ALSO interleave before the file
            # backlog is drained, so "first zero-row batch" is not a
            # safe stop. Drain until the rows ingested across distinct
            # batchIds reach the source listing's row count (the
            # availableNow snapshot) AND the latest batch consumed no
            # input; a 3-consecutive-zero-batch guard backstops the
            # equality in case a file lands between the pre-count and
            # the snapshot.
            import time

            def _get(p, k):
                return p[k] if isinstance(p, dict) else getattr(p, k)

            expected = spark.read.parquet(src_dir).count()
            ingested, seen_batches, zero_streak = 0, set(), 0
            while q.isActive:
                # recentProgress retains the last ~100 progress events:
                # every completed batchId is observed even when several
                # micro-batches finish inside one poll interval (a
                # lastProgress-only poll can miss data batches, undercount
                # `ingested`, and let interleaved timeout-eval zero batches
                # satisfy the zero-streak early — silent truncation).
                for lp in q.recentProgress:
                    bid = _get(lp, "batchId")
                    rows = _get(lp, "numInputRows")
                    if bid not in seen_batches:
                        seen_batches.add(bid)
                        ingested += rows
                        # a true CONSECUTIVE-batch streak over the complete
                        # batchId sequence
                        zero_streak = zero_streak + 1 if rows == 0 else 0
                lp = q.lastProgress
                if lp is not None:
                    rows = _get(lp, "numInputRows")
                    if (ingested >= expected and rows == 0) \
                            or zero_streak >= 3:
                        q.stop()
                        break
                time.sleep(0.5)
            q.awaitTermination()
    finally:
        if rocksdb_state:
            if prev is None:
                spark.conf.unset(prov_key)
            else:
                spark.conf.set(prov_key, prev)
    return q


def foreach_batch(spark: SparkSession, src_dir: str, checkpoint_dir: str,
                  fn: Callable[[DataFrame, int], None],
                  available_now: bool = True):
    """Micro-batch compaction hook: run ``fn(batch_triples, batch_id)``
    per micro-batch (e.g. merge into the canonical triple table, refresh
    dims incrementally). The triples handed to ``fn`` are batch-deduped."""
    tr = stream_extract_triples(stream_repo_files(spark, src_dir))
    w = tr.writeStream.foreachBatch(
        lambda df, bid: fn(df.distinct(), bid)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return w.start()
