"""Structured Streaming face of the curation engine.

The reference is batch-only, but its batch lifecycle — submit chunks, poll,
persist tracker state after every transition, resume after a kill
(``base_batch_request_processor.py:585-629``, ``batch_status_tracker.py:
365-417``) — is exactly Spark Structured Streaming's contract: source →
transformations → sink with a checkpointLocation that makes progress
durable and restart idempotent. Two entry points:

- :func:`stream_pipeline` — the full clip DAG over a *file-stream* source:
  new parquet files landing in a directory are scored exactly once;
  ``foreachBatch`` applies the identical ``stages.apply_all`` chain, so
  batch and streaming labels are bit-identical (asserted in
  tests/test_streaming.py). ``Trigger.AvailableNow`` drains the backlog
  and stops — the streaming analog of one batch run.
- :func:`stream_hourly_metrics` — watermarked tumbling-window rollup of
  the labeled stream (late rows beyond the watermark are dropped), the
  streaming analog of the audit metrics aggregate (SURVEY §2.5 A1).

Scale notes: a file-stream source on a landing directory is the standard
continuous-ingest topology for 10^12-clip tables (object-store manifests →
maxFilesPerTrigger bounds per-micro-batch memory); checkpointLocation on
shared storage gives the same resume guarantee the batch pipeline gets
from its checkpoint table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import pipeline as pipeline_mod
from . import stages
from .config import PipelineConfig

# the clips schema (BASELINE.json input_hint) — required: file streams
# cannot infer schemas
CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)


def _file_source(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int,
    schema: str = CLIPS_SCHEMA,
) -> DataFrame:
    """The module's ONE file-stream source recipe (explicit schema +
    ``maxFilesPerTrigger`` bounding per-micro-batch memory). Every entry
    point reads through this so a recipe change (e.g. ``cleanSource``
    tuning) cannot silently drift between them."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def _write_batch_keyed(
    df: DataFrame, output_dir: str, batch_id: int, partition_by: tuple[str, ...] = ()
) -> None:
    """The module's ONE idempotent-replay sink recipe: ``foreachBatch`` is
    at-least-once (a crash between the write and the streaming checkpoint
    commit re-delivers the batch), so each batch overwrites ITS OWN hive
    subdir keyed by the deterministic batch_id — a replay rewrites the
    same directory instead of appending duplicates."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{output_dir}/batch_id={batch_id}")


def stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """Run the clip curation DAG as a streaming query over a landing dir.

    Returns the started ``StreamingQuery``; callers ``awaitTermination()``.
    Exactly-once per input file via the source+checkpoint contract; output
    is appended parquet partitioned by ``part_key`` like the batch path.
    """
    cfg = cfg or PipelineConfig()
    reader = _file_source(spark, input_dir, max_files_per_trigger)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        labeled = stages.apply_all(
            batch_df.withColumn("part_key", pipeline_mod.hash_part_key(cfg.n_partitions)),
            cfg.rules,
        ).withColumn("ingest_ts", F.current_timestamp())  # arrival-time lineage
        _write_batch_keyed(labeled, output_dir, batch_id, partition_by=("part_key",))

    writer = reader.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_audio_features(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """Streaming face of the audio decode family (round-3 VERDICT task
    #6): new clip files landing in a directory pass through the SAME
    fused ``stages.decode_stage`` the batch path uses — one Arrow pass
    per micro-batch, bytes dropped before anything else happens — so
    streaming and batch features are bit-identical by construction
    (asserted in tests/test_streaming.py). The reference analog is its
    streamed-responses idiom (base_online_request_processor.py:540-594)
    applied to the media family.

    Exactly-once: file-source + checkpoint tracks consumed files;
    the foreachBatch sink overwrites a batch_id-keyed subdir, so an
    at-least-once replay after a crash rewrites the same directory
    instead of appending duplicates (the recipe shared by every sink in
    this module). Returns the started ``StreamingQuery``."""
    src = _file_source(spark, input_dir, max_files_per_trigger)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_keyed(
            stages.decode_stage(batch_df.drop("transcript")), output_dir, batch_id
        )

    writer = src.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_scrub_transcripts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """Streaming face of the PII/toxicity scrub: new clip files landing
    in a directory pass through the SAME pure-Catalyst
    ``stages.scrub_detail_stage`` as the batch path (one codegen
    projection per micro-batch — no Python at all), emitting
    (clip_id, scrubbed_transcript, per-rule hits). A compliance pipeline
    runs exactly this shape: scrub-on-arrival, audit counts per rule.

    Exactly-once via the module's shared recipe: file-source checkpoint
    + batch_id-keyed overwrite sink (an at-least-once replay rewrites
    the same subdir instead of appending duplicates). Returns the
    started ``StreamingQuery``."""
    src = _file_source(spark, input_dir, max_files_per_trigger)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # drop the RAW transcript before the sink: scrub_detail_stage only
        # ADDS columns, and writing the unscrubbed text next to its
        # scrubbed twin would leak the very PII this stream removes (the
        # batch twin pii_scrub_detail selects it away identically)
        _write_batch_keyed(
            stages.scrub_detail_stage(
                batch_df.select("clip_id", "transcript")
            ).drop("transcript"),
            output_dir, batch_id,
        )

    writer = src.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_dedup",
    max_files_per_trigger: int = 1,
    output_dir: str | None = None,
):
    """Custom stateful operator: exactly-once streaming dedup across
    micro-batches via ``applyInPandasWithState`` — the streaming face of
    the exact-dedup family (content digest ≙ the reference's cache
    identity, ``llm/llm.py:139-164``, held as per-key stream state the way
    its status trackers persist counters across poll cycles,
    ``batch_status_tracker.py:365-417``).

    Each digest group keeps (dup_count, canonical_id) as state: the first
    arrival is emitted once; every later arrival — same batch or any later
    micro-batch — only bumps the counter.

    **Canonical-choice contract (first-seen winner):** ``canonical_id`` is
    the min clip_id *within the first micro-batch that saw the digest* —
    so it depends on file landing order, and under append output mode a
    smaller clip_id arriving in a later batch can never revise it. This is
    deliberate: it is exactly the semantics of the batch pipeline's
    resume anti-join (the first committed row wins; a re-ingested
    duplicate is dropped, not re-canonicalized), and revising would
    require retracting an already-emitted row, which append-mode sinks
    cannot do. The chosen canonical is recorded in state, so the decision
    is durable across restarts and auditable via the state store. Callers
    needing global-min canonicals over a bounded corpus should use the
    batch ``dedup_exact`` operator instead.

    State is per-digest and lives in the state store (RocksDB on a real cluster),
    so memory is bounded by DISTINCT payloads, not rows; a production
    deployment with unbounded key churn would add a state TTL via
    ``GroupStateTimeout`` and emit the final counts on timeout —
    deliberately not set here so dedup is exact over the whole stream.

    **State-schema compatibility:** the state struct is
    ``(dup_count long, canonical_id string)`` — widened from the earlier
    ``(dup_count long)``. Spark state stores are schema-bound: restarting
    a checkpoint written under the OLD struct with this code requires a
    fresh ``checkpoint_dir`` (and re-processing the landing dir); there
    is no in-place state migration.
    Null transcripts hash to a NUL-byte sentinel (no real transcript can
    collide with it) so they dedupe among themselves under a non-null key
    instead of collapsing into Spark's null group.

    Sink: with ``output_dir`` set, each micro-batch appends parquet under
    a batch_id-keyed subdir (idempotent replay, and — unlike the memory
    sink — the query RESTARTS from its checkpoint, recovering the state
    store, so dedup stays exact across stop/start). Without it, results
    land in the in-memory table ``query_name`` (interactive/testing;
    memory sinks cannot recover a checkpoint)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = _file_source(spark, input_dir, max_files_per_trigger)
    # narrow projection BEFORE the digest groupBy: the state function
    # reads only clip_id, so shipping the full row would shuffle (and
    # Arrow-transfer into the Python worker) every clip's audio bytes —
    # the exact payload manifest mode exists to keep off the wire
    keyed = src.select("clip_id", stages.transcript_digest().alias("digest"))

    def _dedup(key, pdfs, state):
        first = None  # min NON-NULL clip_id seen this batch
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            nn = pdf["clip_id"].dropna()
            if len(nn):
                m = nn.min()
                if first is None or m < first:
                    first = m
        if state.exists:
            dup_count, canonical = state.get
            state.update((int(dup_count) + n, canonical))
        elif n:
            # canonical_id is NULL when every row of the digest carries a
            # NULL clip_id (same semantics as batch dedup_exact's
            # min(clip_id)); comparing through pandas-native min avoids
            # the str-vs-None comparison a raw sort would hit
            canonical = None if first is None else str(first)
            state.update((n - 1, canonical))
            yield pd.DataFrame({"digest": [key[0]], "canonical_id": [canonical]})
        else:
            state.update((0, None))

    dedup = keyed.groupBy("digest").applyInPandasWithState(
        _dedup,
        outputStructType="digest string, canonical_id string",
        stateStructType="dup_count long, canonical_id string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if output_dir is None:
        return (
            dedup.writeStream.format("memory")
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_keyed(batch_df, output_dir, batch_id)

    return (
        dedup.writeStream.foreachBatch(_sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_hourly_metrics(
    spark: SparkSession,
    labeled_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    query_name: str = "hourly_metrics",
    output_dir: str | None = None,
):
    """Watermarked tumbling-window keep-rate rollup over the labeled stream
    written by :func:`stream_pipeline` (which stamps ``ingest_ts``).

    ``update`` output mode: every triggered micro-batch emits the windows it
    changed, so a one-shot ``availableNow`` drain produces rows even for
    windows the watermark has not closed yet (``append`` would hold them
    back until a later batch advances the watermark). The watermark still
    bounds state: windows older than it are dropped from the store — the
    guarantee that makes this runnable forever at 10^12-clip scale.

    Sink: with ``output_dir`` set, each micro-batch's changed windows land
    as parquet under a batch_id-keyed subdir (idempotent replay), and —
    unlike the memory sink, which cannot recover a checkpoint — the query
    RESTARTS from ``checkpoint_dir``, resuming its window state instead of
    recounting rows it already aggregated. Because update mode RE-emits a
    window whenever it changes, the durable table is a log of window
    versions; read it through :func:`read_hourly_metrics`, which keeps the
    latest version per window. Without ``output_dir``, results land in the
    in-memory table ``query_name`` (interactive/testing only).
    """
    src = (
        spark.readStream.schema(
            "clip_id string, sr_hz int, dur_ms int, codec string, "
            "transcript string, keep boolean, ingest_ts timestamp"
        )
        .parquet(labeled_dir)
        .withWatermark("ingest_ts", watermark)
    )
    agg = (
        src.groupBy(F.window("ingest_ts", "1 hour").alias("win"))
        .agg(
            F.count("*").alias("n"),
            F.avg(F.col("keep").cast("double")).alias("keep_rate"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "n",
            "keep_rate",
        )
    )
    if output_dir is None:
        return (
            agg.writeStream.outputMode("update")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_keyed(batch_df, output_dir, batch_id)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_hourly_metrics(spark: SparkSession, output_dir: str) -> DataFrame:
    """Current value per window from a durable :func:`stream_hourly_metrics`
    table: update mode re-emits a window each time it changes, so the
    parquet log holds one row per (window, emitting batch) — the
    max-batch_id row is the live value (batch ids are monotone across
    restarts because they come from the recovered checkpoint).

    **Lifecycle contract:** ``output_dir`` and ``checkpoint_dir`` are a
    unit. Reusing an output_dir with a FRESH checkpoint restarts batch
    ids at 0, so the dead run's higher-numbered subdirs would permanently
    outrank every new batch here — wipe both together (the same rule the
    batch warehouse applies to its checkpoint table)."""
    from pyspark.sql import Window as W

    df = spark.read.option("basePath", output_dir).parquet(output_dir)
    w = W.partitionBy("hour").orderBy(F.desc("batch_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch_id")
    )
