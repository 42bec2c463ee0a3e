"""iceberg_lite — snapshot/manifest layer over parquet (SURVEY.md §7.3-5).

The north_rule requires jobs "resumable from Iceberg-snapshot checkpoints
with per-partition lineage and metrics". No Iceberg runtime jar exists in
this environment (SURVEY.md §0 [E]), so this module emulates the needed
subset over plain parquet directories with a JSON manifest per stage:

  snapshot_id  = sha256(stage, sorted(input snapshot ids), params_hash)
                 — content-addressed, so resume is a pure manifest lookup:
                 same inputs + same params ⟹ same snapshot ⟹ skip stage.
  lineage      = input snapshot ids (the DAG edge set)
  metrics      = row count + per-partition row counts (lineage + metrics)

The interface is deliberately thin (write_stage / read_stage / is_current)
so `df.writeTo(tbl).append()` on a real Iceberg catalog is a one-line swap.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_imc_manifest.json"

# per-venue column-stats SIDE TABLE (parquet) inside the stage dir — the
# iceberg-lite analogue of Iceberg's partition-stats file. The leading
# underscore makes it invisible to parquet scans of the stage path
# (Hadoop FileInputFormat hides _*/.* paths), so the stage table and its
# stats co-live in one directory. Stats moved OUT of the manifest JSON in
# r5 (VERDICT r04 next-round #1): one inline dict per venue made the
# manifest — a driver-side, fully-loaded-per-batch structure — linear in
# venue count; the side table is read lazily and filtered to the venues
# a batch actually needs.
VENUE_STATS_DIR = "_venue_stats"


def snapshot_id(stage: str, input_snapshots: list[str], params_hash: str) -> str:
    payload = json.dumps({"stage": stage, "inputs": sorted(input_snapshots),
                          "params": params_hash}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST_NAME)


def is_current(path: str, expected_snapshot: str) -> bool:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
        return m.get("snapshot_id") == expected_snapshot and m.get("committed", False)
    except (json.JSONDecodeError, OSError):
        return False


def write_stage(df: DataFrame, path: str, stage: str,
                input_snapshots: list[str], params_hash: str,
                partition_by: list[str] | None = None,
                stats_fn=None) -> str:
    """Write df as a stage table + manifest; returns the snapshot id."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return refresh_manifest(df.sparkSession, path, stage, input_snapshots,
                            params_hash, partition_by, stats_fn=stats_fn)


def refresh_manifest(spark: SparkSession, path: str, stage: str,
                     input_snapshots: list[str], params_hash: str,
                     partition_by: list[str] | None = None,
                     stats_fn=None) -> str:
    """(Re)commit the manifest for data already at `path` — used both by
    write_stage and by incremental dynamic-partition-overwrite commits
    (the iceberg-lite analogue of an Iceberg snapshot commit).

    stats_fn: optional `dict | Callable[[DataFrame, str], dict]` of extra
    JSON-serializable column statistics recorded under manifest["stats"] —
    the iceberg-lite analogue of Iceberg's per-file column bounds. A
    callable runs over (table as written, stage path) at write time and
    may persist SIDE TABLES under the stage path (write_venue_stats);
    whatever dict it returns must stay O(1)-sized — per-venue data
    belongs in the side table, never inline in the manifest JSON. A plain
    dict is recorded as-is."""
    snap = snapshot_id(stage, input_snapshots, params_hash)

    # per-partition lineage + metrics on the data as written
    written = spark.read.parquet(path)
    part_counts = (written
                   .groupBy(F.spark_partition_id().alias("pid"))
                   .agg(F.count("*").alias("rows"))
                   .orderBy("pid")
                   .collect())
    manifest = {
        "stage": stage,
        "snapshot_id": snap,
        "inputs": sorted(input_snapshots),
        "params_hash": params_hash,
        "schema": written.schema.jsonValue(),
        "row_count": int(sum(r["rows"] for r in part_counts)),
        "partitions": [{"pid": int(r["pid"]), "rows": int(r["rows"])} for r in part_counts],
        "partition_by": partition_by or [],
        "stats": (stats_fn(written, path) if callable(stats_fn)
                  else (stats_fn or {})),
        "committed": True,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    _write_json_atomic(_manifest_path(path), manifest)
    return snap


def _write_json_atomic(mp: str, payload: dict) -> None:
    """tmp-file + os.replace: a crash mid-write can never leave truncated
    manifest JSON (the torn state every reader would otherwise have to
    special-case)."""
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, mp)


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_cols: list[str],
                         num_buckets: int = 16,
                         sort_cols: list[str] | None = None) -> None:
    """Bucketed managed table — the iceberg-lite analogue of Iceberg's
    bucket partition transform (SURVEY.md §4.2). Tables bucketed on the
    same key with the same bucket count CO-LOCATE their rows: every
    subsequent equi-join on that key is exchange-free (no shuffle on
    either side — explain-plan test-gated), which is how the bookkeeping
    joins (segments ⋈ assignments ⋈ eps_pairs on seg_id) run repeatedly
    at corpus scale without re-shuffling the big tables each time."""
    (df.write.mode("overwrite")
     .bucketBy(num_buckets, *bucket_cols)
     .sortBy(*(sort_cols or bucket_cols))
     .format("parquet")
     .saveAsTable(table))


def mark_uncommitted(path: str) -> None:
    """Tombstone an existing manifest (committed=False) BEFORE destructive
    partition operations: a crash between a partition drop and the new
    commit must leave the stage un-resumable instead of serving truncated
    data as committed (the iceberg-lite analogue of an in-flight snapshot)."""
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return
    with open(mp) as f:
        m = json.load(f)
    m["committed"] = False
    _write_json_atomic(mp, m)


def read_manifest(path: str) -> dict:
    with open(_manifest_path(path)) as f:
        return json.load(f)


def hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) resolved for any scheme (file://, hdfs://,
    s3a://) — the ONE copy of the jvm resolution idiom (read_venue_stats
    and pipeline._delete_dir both delegate here; review r5 wave 2
    flagged the hand-kept copies)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def write_venue_stats(stats_df: DataFrame, stage_path: str) -> DataFrame:
    """Overwrite the stage's per-venue stats side table
    (venue, x0, x1, y0, y1, max_len). localCheckpoint first: an
    incremental merge READS the old side table it is about to overwrite
    (self-overwrite would truncate the input mid-scan). Rows are
    range-partitioned + sorted by x0 so the halo closure's frontier
    queries get row-group min/max pruning on the x axis at corpus scale.
    Returns the CHECKPOINTED stats DataFrame so callers can aggregate
    their manifest summary from it directly instead of re-reading the
    parquet just written (review r5 wave 2: a wasted read+job per
    commit, recurring on the incremental path)."""
    stats_df = stats_df.localCheckpoint(eager=True)
    spark = stats_df.sparkSession
    n = max(1, min(stats_df.count() // 65_536,
                   spark.sparkContext.defaultParallelism))
    (stats_df.repartitionByRange(n, "x0").sortWithinPartitions("x0")
     .write.mode("overwrite")
     .parquet(os.path.join(stage_path, VENUE_STATS_DIR)))
    return stats_df


def read_venue_stats(spark: SparkSession, stage_path: str) -> DataFrame | None:
    """The stage's per-venue stats side table as a LAZY DataFrame, or None
    when the stage predates side-table stats. Callers filter/join it to
    the venues a batch needs — the full table never reaches the driver."""
    sp = os.path.join(stage_path, VENUE_STATS_DIR)
    # scheme-aware existence probe (os.path.exists is wrong for hdfs://
    # or s3a:// stage roots, which the incremental path supports)
    fs, hpath = hadoop_fs(spark, sp)
    if not fs.exists(hpath):
        return None
    return spark.read.parquet(sp)


def materialize(df: DataFrame, path: str, stage: str,
                input_snapshots: list[str], params_hash: str,
                resume: bool = True,
                partition_by: list[str] | None = None,
                stats_fn=None) -> tuple[DataFrame, str]:
    """Stage checkpoint: skip compute when the manifest already matches the
    expected content-addressed snapshot (resume semantics of the north_rule).
    Returns (stage DataFrame as read back, snapshot id)."""
    snap = snapshot_id(stage, input_snapshots, params_hash)
    if resume and is_current(path, snap):
        return read_stage(df.sparkSession, path), snap
    write_stage(df, path, stage, input_snapshots, params_hash, partition_by,
                stats_fn=stats_fn)
    return read_stage(df.sparkSession, path), snap
