"""Structured Streaming ingestion — the incremental twin of the batch
commit-log pipeline.

The reference has no streaming operators (SURVEY.md §2.11); its closest
shape is the infinite data iterator with periodic hook actions
(/root/reference/apis/train.py:235-246). The engine's primary resume
story is batch + commit-log (pipeline.resumable_run), but a crawl is
naturally a stream of WARC segments landing in object storage, so the
same kernel is exposed through readStream as well:

    files land in <in>/ -> readStream(parquet, pages schema)
        -> mapInArrow(extract)        (the identical kernel: streaming
                                       output is byte-identical to batch)
        -> foreachBatch: parquet append + lineage rows per micro-batch
           (batch_id plays chunk_id; the checkpoint dir is the WAL, so
           a restarted query never re-commits a finished micro-batch —
           exactly the CommitLog semantics, delegated to Spark)

Event-time analytics over the stream (late data handled by watermark)
are provided by windowed_page_counts — the windowed-agg shape of
`trigger(processingTime=...)` micro-batch periodic actions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from toyocr_spark.pipeline import extract_pages, partition_lineage
from toyocr_spark.sources.pages import PAGES_SCHEMA


def _pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None
) -> DataFrame:
    """The shared pages file-stream reader: narrows a fixture dir to
    its pages*.parquet (sidecars like expected_spans.parquet must never
    ingest under the wrong schema — a glob, not the bare file path,
    because the file-stream source requires a directory basePath) and
    applies the schema + trigger-size option every streaming operator
    uses."""
    if os.path.isdir(input_dir) and os.path.exists(
        os.path.join(input_dir, "pages.parquet")
    ):
        input_dir = os.path.join(input_dir, "pages*.parquet")
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 8)
        .parquet(input_dir)
    )


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    run_id: str = "stream",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and with available_now=True, run to completion) a streaming
    extraction over parquet files arriving in ``input_dir``.

    Returns the StreamingQuery. Exactly-once per micro-batch: the
    foreachBatch writer appends with ``txnAppId/txnVersion``-style
    idempotence delegated to the checkpoint WAL — Spark replays an
    interrupted batch id, and the parquet append for a replayed batch
    overwrites its own batch subdirectory (idempotent), mirroring
    pipeline.CommitLog's atomic chunk commit.
    """
    reader = _pages_stream(spark, input_dir, max_files_per_trigger)
    result = extract_pages(reader)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        path = os.path.join(out_dir, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(path)  # replay-safe
        lineage = partition_lineage(
            batch_df.sparkSession.read.parquet(path),
            run_id=run_id,
            chunk_id=int(batch_id),
            input_split=path,
        )
        lineage.write.mode("overwrite").parquet(
            os.path.join(out_dir, "_lineage", f"batch={batch_id}")
        )

    writer = (
        result.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_outlinks(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming outlink mining — the crawler's discovery loop: pages
    arrive, edges leave for the frontier (q92) and the link graph
    (q44). ``linkmine.mine_outlinks`` is map-only on both legs (JVM
    regexp + the sanctioned format kernel), so it lifts onto the
    stream unchanged and stream==batch edge-set identity holds by
    construction (asserted in tests). Replay-safe per micro-batch via
    the batch-subdirectory overwrite, like stream_extract."""
    from toyocr_spark.functions.linkmine import mine_outlinks

    reader = _pages_stream(spark, input_dir, max_files_per_trigger)
    edges = mine_outlinks(reader)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        path = os.path.join(out_dir, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(path)  # replay-safe

    writer = (
        edges.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Streaming exact content dedup: of all pages sharing an html
    digest, only the FIRST to arrive is ever emitted — the incremental
    twin of operators.dedup.exact_dedup, as a crawl-ingest stage (drop
    byte-identical recrawls before the extractor spends a cycle).

    State is Spark's dropDuplicates streaming store keyed on the digest
    alone (a 32-hex key per distinct page, nothing else): at
    10^9-page scale that is tens of GB spread across executors, which
    the state store handles; for unbounded crawls pass ``watermark`` to
    use dropDuplicatesWithinWatermark — duplicates separated by more
    than the watermark re-emit, the standard bounded-state trade.

    The digest is md5 (portable-hash discipline), computed BEFORE the
    stateful operator so only (digest)-keyed state shuffles, never
    html bytes beyond the one exchange Spark needs to co-locate keys.
    """
    reader = _pages_stream(spark, input_dir, max_files_per_trigger)
    keyed = reader.withColumn("digest", F.md5(F.col("html")))
    if watermark is not None:
        deduped = keyed.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
            ["digest"]
        )
    else:
        deduped = keyed.dropDuplicates(["digest"])

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        path = os.path.join(out_dir, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(path)  # replay-safe

    writer = (
        deduped.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_blocklist_extract(
    spark: SparkSession,
    input_dir: str,
    blocklist: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Streaming extraction with a per-micro-batch blocklist admission
    stage: pages whose url host — or ANY parent domain of it — appears
    in the static ``blocklist`` DataFrame (one ``host`` column) are
    dropped before the extractor spends a cycle on them. Admission uses
    the SAME ``drop_blocked_hosts`` operator as the batch prep_job
    stage (suffix-chain explode + case-insensitive broadcast
    equi-join), so one blocklist file means one thing in both modes —
    a bare stream-static equi-join here would block ``example.com``
    but admit ``ads.example.com``, silently diverging from the batch
    twin.

    Admission runs inside foreachBatch (each micro-batch is a plain
    DataFrame), which keeps the streaming plan stateless and re-plans
    the static blocklist side on every trigger: an updated blocklist
    table takes effect on the next micro-batch without a restart,
    which is exactly how a crawl blocklist is operated. The blocklist
    side is broadcast — no shuffle at any corpus size, because a
    blocklist, even a hostile one, is millions of rows, not billions.
    """
    from toyocr_spark.functions.urlfns import drop_blocked_hosts

    reader = _pages_stream(spark, input_dir, max_files_per_trigger)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        admitted = drop_blocked_hosts(
            batch_df.withColumn("_host", F.parse_url(F.col("url"), F.lit("HOST"))),
            "_host",
            blocklist,
        ).drop("_host")
        path = os.path.join(out_dir, f"batch={batch_id}")
        extract_pages(admitted).write.mode("overwrite").parquet(path)  # replay-safe

    writer = (
        reader.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stateful_host_progress(
    pages_stream: DataFrame,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-host
    cumulative crawl progress that survives across micro-batches.

    State per host = (pages_total, bytes_total, batches_seen); each
    micro-batch emits the updated running totals for hosts present in
    the batch — the arbitrary-state shape windowed aggs cannot express
    (running totals never close).

    ``idle_timeout_ms`` arms a processing-time timeout that emits a
    final tombstone row (closed=true) and releases the state when a
    host goes idle — for long-running continuous queries ONLY. Leave it
    None for availableNow/backfill runs: a pending timeout keeps the
    query alive ("no new data but cleaning up state") until it fires,
    so a 1-hour timeout would spin an availableNow query for an hour.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("host", T.StringType(), False),
            T.StructField("pages_total", T.LongType(), False),
            T.StructField("bytes_total", T.LongType(), False),
            T.StructField("batches_seen", T.IntegerType(), False),
            T.StructField("closed", T.BooleanType(), False),
        ]
    )
    state_schema = "pages_total long, bytes_total long, batches_seen int"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (host,) = key
        if state.hasTimedOut:
            pages_total, bytes_total, batches = state.get
            state.remove()
            yield pd.DataFrame(
                {"host": [host], "pages_total": [pages_total],
                 "bytes_total": [bytes_total], "batches_seen": [batches],
                 "closed": [True]}
            )
            return
        pages_total, bytes_total, batches = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            pages_total += len(pdf)
            bytes_total += int(pdf["nbytes"].sum())
        batches += 1
        state.update((pages_total, bytes_total, batches))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"host": [host], "pages_total": [pages_total],
             "bytes_total": [bytes_total], "batches_seen": [batches],
             "closed": [False]}
        )

    keyed = pages_stream.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.octet_length("html").alias("nbytes"),
    ).groupBy("host")
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout_conf
    )


def windowed_page_counts(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed counts per language with late-data handling:
    pages arriving more than ``watermark`` behind the max observed
    ``warc_ts`` are dropped from their (closed) window — the standard
    watermark + windowed-agg pattern for crawl-rate dashboards."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


def stream_cdx(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuous capture indexing: each micro-batch of arriving pages
    becomes its own small SORTED CDX segment under
    ``index_dir/segments/batch=<id>/`` (a complete mini-index: sorted
    shards + cluster.idx). Segments are immutable and idempotent per
    batch id (a replayed batch overwrites its own directory), so the
    stream composes with the WAL exactly like stream_extract.

    Global sort order across segments is NOT maintained online — that
    is compact_cdx's job (sources.cdx.merge_cdx over the segment list,
    one range Exchange over index rows). The 100 TB pattern: stream
    appends segments all day, a scheduled compaction folds them into
    the published index — identical to how log-structured tables
    handle sorted layouts.
    """
    from toyocr_spark.sources.cdx import write_cdx

    reader = _pages_stream(spark, input_dir, max_files_per_trigger)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_cdx(
            batch_df,
            os.path.join(index_dir, "segments", f"batch={batch_id}"),
            shards=2,
        )

    writer = reader.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def compact_cdx(spark: SparkSession, index_dir: str, out_dir: str, shards: int = 8):
    """Fold every streamed segment into one published sorted index
    (sources.cdx.merge_cdx semantics: duplicate captures collapse,
    one range Exchange over index rows)."""
    import glob as _glob

    from toyocr_spark.sources.cdx import merge_cdx

    segments = sorted(_glob.glob(os.path.join(index_dir, "segments", "batch=*")))
    if not segments:
        raise ValueError(f"no CDX segments under {index_dir}")
    return merge_cdx(spark, segments, out_dir, shards=shards)


def stream_neardup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    max_hamming: int = 3,
    k: int = 8,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Streaming NEAR-dup admission — the incremental twin of
    dedup.neardup_survivors: a page is admitted iff no page seen
    EARLIER in the stream (any prior micro-batch, or an earlier row of
    the same batch, ordered by (batch, url)) lies within
    ``max_hamming`` of its 64-bit text simhash.

    State is an append-only hash log (state_dir/batch=N: url + four
    14/16-bit chunk columns — a few dozen bytes per page, never the
    page itself), exactly the stream_cdx immutable-segment pattern.
    Each micro-batch runs dedup.banded_neardup_drops(seen, batch):
    only (band, bucket) keys shuffle, the candidate set is
    band-collision-sparse, and the batch side is small — the classic
    incremental-join shape. Replay-safe: a replayed batch id
    overwrites its own out/ and state/ subdirectories byte-for-byte.

    With id-ordered arrival (segment files sorted by url) the admitted
    set equals the batch neardup_survivors rule — asserted by
    tests/test_streaming.py. Out-of-order arrival admits by arrival,
    the only semantics a non-retracting stream can honour."""
    import glob as _glob

    from toyocr_spark.operators.dedup import banded_neardup_drops, simhash64

    reader = _pages_stream(spark, input_dir, max_files_per_trigger)

    state_cols = ["id", "seq", "c0", "c1", "c2", "c3"]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sim = simhash64(batch_df.select("url", "text"), "url", "text", k)
        h_batch = (
            sim.select("id", "c0", "c1", "c2", "c3")
            .withColumn("seq", F.lit(batch_id).cast("long"))
            .withColumn("ord", F.struct("seq", "id"))
        )
        prior_paths = sorted(_glob.glob(os.path.join(state_dir, "batch=*")))
        if prior_paths:
            prior = spark.read.parquet(*prior_paths).withColumn(
                "ord", F.struct("seq", "id")
            )
            seen = prior.select(*state_cols, "ord").unionByName(
                h_batch.select(*state_cols, "ord")
            )
        else:
            seen = h_batch.select(*state_cols, "ord")
        drops = banded_neardup_drops(seen, h_batch, max_hamming).withColumnRenamed(
            "id", "url"
        )
        admitted = batch_df.join(F.broadcast(drops), "url", "left_anti")
        admitted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        h_batch.select(*state_cols).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )

    writer = (
        reader.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def compact_neardup_state(spark: SparkSession, state_dir: str, shards: int = 4) -> int:
    """Fold the stream_neardup hash log's per-batch segments into one
    compacted segment (the log-structured pattern, like compact_cdx):
    arrival order is carried by the stored ``seq`` column, so a
    compacted log admits IDENTICALLY to the original — only the file
    count changes. Returns the number of rows compacted.

    Crash-safe by construction: the compacted segment lands under a
    FRESH generation name (batch=-1, then batch=-2, ...) via an atomic
    rename, and the source segments are removed only afterwards — at
    every instant the ``batch=*`` glob sees a superset of the log
    (duplicate hash rows are benign: admission depends on which rows
    EXIST, and drops are a distinct set). A crash mid-compaction
    leaves either an invisible temp dir or a visible duplicate,
    never a data loss window."""
    import glob as _glob
    import shutil

    all_paths = sorted(_glob.glob(os.path.join(state_dir, "batch=*")))
    gens = [
        int(os.path.basename(p).split("=")[1])
        for p in all_paths
    ]
    sources = [p for p, g in zip(all_paths, gens) if g >= 0]
    if not sources:
        return 0
    prior = spark.read.parquet(*all_paths).dropDuplicates(["id", "seq"])
    n = prior.count()
    tmp = os.path.join(state_dir, "_compact_tmp")
    prior.repartition(shards, "id").write.mode("overwrite").parquet(tmp)
    new_gen = min([g for g in gens if g < 0], default=0) - 1
    os.rename(tmp, os.path.join(state_dir, f"batch={new_gen}"))
    # new generation is visible: now the old copies may go
    for p in all_paths:
        shutil.rmtree(p, ignore_errors=True)
    return n


def stream_recrawl(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Streaming RECRAWL-rate tracking — the incremental twin of the
    q169 batch operator (operators/recrawl.py): snapshot observations
    (url, snap_t, digest) arrive in micro-batches, and each batch
    persists one MONOID summary row per url (first/last digest by
    time + within-batch transition count) to an append-only segment
    under state_dir/batch=N — the stream_neardup immutable-segment
    pattern, a few dozen bytes per url per batch, never the page.

    Because change_segment is an associative fold (see
    operators/recrawl.py), recrawl_schedule_from_state over the
    segments equals the batch operator over the full observation
    table whenever snapshots arrive time-ordered — asserted by
    tests/test_streaming.py. Replay-safe: a replayed batch id
    overwrites its own segment byte-for-byte."""
    from pyspark.sql import types as T

    from toyocr_spark.operators.recrawl import change_segment

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("snap_t", T.LongType(), False),
            T.StructField("digest", T.LongType(), False),
        ]
    )
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        change_segment(batch_df, batch_id).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )

    writer = (
        reader.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def recrawl_schedule_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """(url, n_changes, bucket) from the stream_recrawl segment log:
    the associative combine (boundary transitions between adjacent
    segments + within-counts), then the shared bucket map."""
    import glob as _glob

    from toyocr_spark.operators.recrawl import fold_change_segments, schedule_buckets

    paths = sorted(_glob.glob(os.path.join(state_dir, "batch=*")))
    segments = spark.read.parquet(*paths)
    return schedule_buckets(fold_change_segments(segments))
