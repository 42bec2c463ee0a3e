"""Structured-Streaming ingest (SURVEY.md §2.10).

The batch operators serve a streaming source UNCHANGED: pages arriving in
a directory are read with `readStream` and each micro-batch folds into the
existing pipeline output through `foreachBatch(run_incremental)` — the
same snapshot-diff merge the batch `--incremental` CLI uses, so a stream
of crawl deltas and a sequence of batch runs produce bit-identical tables
(test-gated: two micro-batches ≡ one full batch recompute).

The first micro-batch against an empty output dir runs the full pipeline;
every later one recomputes only the venues its pages touch. Checkpointing
is two-layer: Spark's streaming checkpoint (source offsets — which files
were consumed) plus the pipeline's own stage manifests (which venue
partitions are committed); a replayed micro-batch is idempotent because
run_incremental's url-replacement contract makes folding the same batch
twice a no-op.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from imc import manifest, pipeline
from imc.config import IMCParams

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def _initialized(out_dir: str) -> bool:
    """Route on manifest-FILE existence, not readability or committed-ness:
    any prior data — even a torn snapshot from a crashed run — must take
    the incremental path, where run_incremental raises a LOUD recovery
    error for torn or incomplete states. Routing a later wave to
    pipeline.run() would rebuild every stage from that wave alone and
    silently discard all previously ingested data (review r03; manifest
    writes are also atomic now, so a torn JSON can't occur either)."""
    return os.path.exists(os.path.join(out_dir, "points",
                                       manifest.MANIFEST_NAME))


def _points_written_by_stream_first_wave(out_dir: str) -> bool:
    """True iff the committed points stage was written by a FIRST-wave
    pipeline.run over an in-memory batch: exactly ONE input and it is the
    'inmemory-' fingerprint class. That is the single state where
    rebuilding from the replayed batch is exact — the batch IS the only
    data ever ingested. The shape test must be this strict (review r4):
    an INCREMENTAL commit's inputs are [parent_snapshot, inmemory_delta],
    so merely asking 'any inmemory input?' is true for every
    stream-maintained base, and a missing stage manifest at wave N>1
    (e.g. a crash inside a rewrite stage's overwrite) would then silently
    rebuild the whole output from wave N's batch alone — discarding every
    earlier wave. With the strict shape, that wave-N state re-raises the
    loud recovery error instead."""
    try:
        m = manifest.read_manifest(os.path.join(out_dir, "points"))
    except (OSError, ValueError):
        return False
    inputs = [str(i) for i in m.get("inputs", [])]
    return len(inputs) == 1 and inputs[0].startswith("inmemory-")


def stream_pages(spark: SparkSession, input_dir: str, out_dir: str,
                 checkpoint_dir: str, params: IMCParams | None = None,
                 max_files_per_trigger: int | None = None):
    """Fold pages parquet files appearing under input_dir into the pipeline
    output as they arrive. Runs with Trigger.AvailableNow — processes every
    unconsumed file then stops — so callers (and crons) invoke it per wave;
    a long-lived deployment would swap the trigger for a processing-time
    one, nothing else changes. Returns the finished StreamingQuery."""
    params = params or IMCParams()
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        if not _initialized(out_dir):
            pipeline.run(spark, batch_df, out_dir, params)
            return
        try:
            pipeline.run_incremental(spark, batch_df, out_dir, params)
        except pipeline.IncompleteBaseError:
            # ADVICE r03: a FIRST wave that crashed after the points stage
            # committed but before later stages leaves a base that is
            # "initialized" (points manifest exists) yet incomplete —
            # every replay would loop on the missing-manifest recovery
            # error forever. The replayed micro-batch IS that crashed
            # wave's input (offsets only commit after foreachBatch
            # succeeds), so when the committed points provably came from
            # a FIRST-wave stream batch (single in-memory input),
            # rebuilding the base from this batch is exact — fall through
            # to pipeline.run. Any other state (file-backed half-built
            # base, wave-N crash, torn incremental snapshot →
            # 'uncommitted') stays a loud error. Dispatch is on the
            # DEDICATED exception type (ADVICE r04: a message-substring
            # match broke silently under rewording).
            if _points_written_by_stream_first_wave(out_dir):
                pipeline.run(spark, batch_df, out_dir, params)
            else:
                raise

    q = (stream.writeStream
         .foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def stream_documents_dedup(spark: SparkSession, input_dir: str,
                           out_dir: str, checkpoint_dir: str,
                           max_files_per_trigger: int | None = None):
    """Streaming EXACT DEDUP over an arriving document corpus: parquet
    files landing under input_dir are consumed micro-batch-wise; each
    batch keeps one row per text hash (keeper = min doc_id, the
    textops.exact_dedup rule), anti-joins against every hash already
    ingested, and lands the survivors under out_dir/batch_id=N. The
    unique corpus is `spark.read.parquet(out_dir)` (hive partition
    discovery adds batch_id).

    Crash safety without a transaction log: each wave OVERWRITES its own
    batch_id partition — a replayed batch (offsets commit only after
    foreachBatch succeeds) rewrites the identical content, and the
    anti-join excludes the batch's own partial leftovers by filtering
    batch_id != N, so a torn append can never double-count or drop rows.
    State detection is the state READ itself (AnalysisException → no
    state yet): a first wave torn before any file commit (out_dir holds
    only _temporary debris) heals on replay instead of crash-looping on
    schema inference, and the guard works on any Hadoop filesystem, not
    just a driver-local path.
    Cross-batch keeper semantics are arrival-order (first batch to see a
    hash owns it); with doc_id-ordered waves this equals the batch
    exact_dedup result (test-gated).

    100 TB posture: the state read is hash-column-only (pruned at the
    scan) and the anti-join is a hash equi-join — at corpus scale the
    state table would be BUCKETED by text_hash so each wave's anti-join
    co-locates without reshuffling history; the per-wave work is
    O(batch + state-hash-column), never O(state rows x batch)."""
    from pyspark.sql import functions as F
    from pyspark.errors import AnalysisException

    from imc.textops import text_hash_expr

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        cols = [f.name for f in DOCS_SCHEMA.fields]
        winners = (batch_df
                   .withColumn("text_hash", text_hash_expr())
                   .groupBy("text_hash")
                   .agg(F.min(F.struct(*cols)).alias("_r"))
                   .select("text_hash", "_r.*"))
        try:
            # The read IS the state-existence check: raises
            # AnalysisException both when out_dir doesn't exist and when
            # it holds only pre-commit _temporary debris from a torn
            # first wave (no committed footers to infer a schema from).
            seen = spark.read.parquet(out_dir)
        except AnalysisException:
            seen = None
        if seen is not None:
            winners = winners.join(
                seen.where(F.col("batch_id") != F.lit(int(batch_id)))
                    .select("text_hash"),
                "text_hash", "left_anti")
        (winners.write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch_id={batch_id}")))

    q = (stream.writeStream
         .foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

_SESSION_OUT = ("user_id long, start_ts timestamp, end_ts timestamp, "
                "n_events long, dur_sec long")
# state in MICROSECONDS: the fixture timestamps carry sub-ms precision
# and emitted start/end must round-trip exactly
_SESSION_STATE = "start_us long, last_us long, n long"


def stream_sessionize(spark: SparkSession, input_dir: str, out_dir: str,
                      checkpoint_dir: str, gap_sec: int = 1800,
                      max_files_per_trigger: int | None = None):
    """CUSTOM STATEFUL streaming operator (SURVEY.md §2.10): gap-based
    sessionization of an arriving event stream via
    `applyInPandasWithState` — the same >gap_sec-silence-starts-a-new-
    session rule as the batch `rel_sessions` query, maintained
    incrementally per user across micro-batches.

    Semantics: events are grouped by user_id; per-user state holds the
    ONE open session (start_us, last_us, n — MICROSECONDS, matching the
    fixture's sub-ms timestamps). Each batch's rows merge in event-time
    order; a gap > gap_sec closes the preceding session and emits it
    (append mode). On-time rows arriving BEHIND the open session (the
    watermark contract permits them) count into it without moving its
    boundaries backwards, extend its start when within gap before it,
    or — when detached by more than the gap — emit as best-effort
    singleton sessions (3-long state cannot reconstruct the earlier
    timeline; event-time-ordered waves never produce them). The open session closes either when a later
    batch shows the gap, or when the event-time WATERMARK (delay =
    gap_sec) passes last_ts + gap — registered as an EventTimeTimeout so
    quiet users flush without new data. A timeout timestamp that would
    not be strictly ahead of the current watermark means the session is
    already closed by watermark arithmetic: emit it in this batch rather
    than registering an invalid timeout.

    Emitted sessions equal the batch rel_sessions result when waves
    arrive in event-time order (test-gated vs the batch twin); rows
    later than the watermark are dropped by Spark's state-store
    pre-filter — standard late-data semantics, also test-gated.

    100 TB posture: state is 3 longs per ACTIVE user (bounded by the
    watermark timeout, not corpus history); each batch shuffles once on
    user_id into the state store; the per-group walk is a vectorized
    pandas pass over that group's batch slice only. No driver-side
    state, no growth with stream length."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_sec) * 1_000_000

    def _emit(start_us: int, last_us: int, n: int, uid) -> "pd.DataFrame":
        return pd.DataFrame({
            "user_id": [uid],
            "start_ts": [pd.Timestamp(start_us, unit="us")],
            "end_ts": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            # floor-to-second endpoints, matching the batch twin's
            # unix_timestamp(max) - unix_timestamp(min)
            "dur_sec": [last_us // 1_000_000 - start_us // 1_000_000],
        })

    def _fold(key, pdf_iter, state: "GroupState"):
        (uid,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(start_us, last_us, n, uid)
            return
        parts = [pdf[["ts", "event_id"]] for pdf in pdf_iter]
        ev = pd.concat(parts).sort_values(["ts", "event_id"])
        us = (ev["ts"].astype("int64") // 1_000).to_numpy()
        out = []
        if state.exists:
            start_us, last_us, n = state.get
            first = 0
        else:
            start_us = last_us = int(us[0])
            n = 1
            first = 1
        for t in us[first:]:
            t = int(t)
            if t >= last_us:
                # the normal, event-time-ordered path
                if t - last_us > gap_us:
                    out.append((start_us, last_us, n))
                    start_us, n = t, 1
                else:
                    n += 1
                last_us = t
            elif t >= start_us:
                # on-time but out-of-order row INSIDE the open session
                # (Spark's watermark contract permits these): count it,
                # never move the boundaries backwards (review r5: an
                # unconditional `last_us = t` regressed the session end,
                # emitting sessions that precede events they counted)
                n += 1
            elif start_us - t <= gap_us:
                # within gap BEFORE the open session: extend start back
                start_us = t
                n += 1
            else:
                # detached earlier event — best-effort: its own session
                # (the full earlier timeline is no longer reconstructable
                # from 3-long state; ordered waves never hit this)
                out.append((t, t, 1))
        wm_ms = state.getCurrentWatermarkMs()
        timeout_ms = (last_us + gap_us) // 1000 + 1
        if timeout_ms <= wm_ms:
            # watermark already proves no on-time event can extend this
            # session — close it now; EventTimeTimeout timestamps must
            # be strictly ahead of the watermark
            out.append((start_us, last_us, n))
            state.remove()
        else:
            state.update((start_us, last_us, n))
            state.setTimeoutTimestamp(timeout_ms)
        for s, e, k in out:
            yield _emit(s, e, k, uid)

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    sessions = (stream
                .withWatermark("ts", f"{gap_sec} seconds")
                .groupBy("user_id")
                .applyInPandasWithState(
                    _fold, _SESSION_OUT, _SESSION_STATE, "append",
                    GroupStateTimeout.EventTimeTimeout))

    q = (sessions.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def stream_window_counts(spark: SparkSession, input_dir: str, out_dir: str,
                         checkpoint_dir: str, window: str = "1 hour",
                         delay: str = "30 minutes",
                         max_files_per_trigger: int | None = None):
    """WATERMARKED tumbling-window aggregation (SURVEY.md §2.10): hourly
    event counts + value sums per event_type over an arriving stream,
    with standard late-data semantics — `withWatermark(ts, delay)` +
    `groupBy(window(ts, window))` in APPEND mode, so a window row lands
    in the parquet sink exactly once, when the watermark passes its end;
    rows arriving later than the watermark are dropped (test-gated
    against the batch twin computed over the on-time rows only).

    100 TB posture: this is Spark's native streaming state-store agg —
    partial aggregation map-side, one shuffle on (window, event_type),
    state bounded by (windows within the watermark horizon ×
    event_types), independent of stream length."""
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    agg = (stream
           .withWatermark("ts", delay)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"))
           .select(F.col("w.start").alias("win_start"), "event_type",
                   "n_events", "sum_value"))

    q = (agg.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
