"""End-to-end pipeline — EP1 of SURVEY.md §3.2.

pages ─filter/dedupe/extract/parse─► points
      ─lead window + MDL grouped-map─► segments
      ─cell cover + salted equi-join + refine─► eps_pairs
      ─core agg + label propagation─► assignments
      ─per-cluster sweep─► rep_points
      ─Bresenham explode + count─► raster ─► polygons
      ─broadcast PIP─► tile_assignments

Every stage lands as an iceberg_lite snapshot table (imc.manifest): a rerun
with the same inputs + params skips completed stages (resume).
"""

from __future__ import annotations

import hashlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imc import (corridors, dbscan, extract, joins, manifest, raster,
                 segments, sweep)
from imc.config import IMCParams

VENUE_STRIDE = 10_000  # traj_id = venue * stride + walk


def _input_fingerprint(pages: DataFrame) -> str:
    """Content-address the pipeline ROOT from the actual input: file list +
    sizes + mtimes (ADVICE r01: a literal 'pages' root made a rerun with a
    different --input but the same --output silently resume-skip every
    stage and return stale outputs). In-memory inputs get a unique id —
    no stable identity ⟹ no resume skipping."""
    files = sorted(pages.inputFiles())
    if not files:
        return "inmemory-" + uuid.uuid4().hex
    h = hashlib.sha256()
    for f in files:
        local = f[7:] if f.startswith("file://") else (
            f[5:] if f.startswith("file:") else f)
        try:
            st = os.stat(local)
            h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}".encode())
        except OSError:
            h.update(f.encode())
    return "pages-" + h.hexdigest()[:20]


def run(spark: SparkSession, pages: DataFrame, out_dir: str,
        params: IMCParams | None = None, resume: bool = True,
        use_mdl: bool = True) -> dict:
    """Run the full pipeline; returns {stage: (path, snapshot_id)}."""
    params = params or IMCParams()
    ph = params.params_hash()
    os.makedirs(out_dir, exist_ok=True)
    results: dict[str, tuple[str, str]] = {}

    def stage(name, df, inputs, partition_by=None):
        path = os.path.join(out_dir, name)
        out, snap = manifest.materialize(df, path, name, inputs, ph,
                                         resume=resume, partition_by=partition_by)
        results[name] = (path, snap)
        return out, snap

    venue_col = (F.col("traj_id") / VENUE_STRIDE).cast("long").alias("venue")
    # points + segments are hive-partitioned by venue: a bbox/venue query
    # then PRUNES at the scan (SURVEY.md §4.2 partition-pruning row) —
    # at 10^12 docs an unpartitioned layout re-scans the world per venue
    pts, s_pts = stage("points",
                       extract.pages_to_points(pages).withColumn("venue", venue_col),
                       [_input_fingerprint(pages)], partition_by=["venue"])
    seg_fn = segments.mdl_segments if use_mdl else segments.raw_segments
    segs, s_seg = stage("segments", seg_fn(pts).withColumn("venue", venue_col),
                        [s_pts], partition_by=["venue"])
    pairs, s_pairs = stage("eps_pairs", joins.eps_join(segs, params), [s_seg])
    assign, s_assign = stage("assignments", dbscan.dbscan(segs, pairs, params),
                             [s_seg, s_pairs])
    rep, s_rep = stage("rep_points",
                       sweep.representative_trajectories(segs, assign, params),
                       [s_seg, s_assign])
    stage("corridors", corridors.corridor_polygons(segs, assign, params),
          [s_seg, s_assign])
    rast, s_rast = stage("raster", raster.rasterize(segs, params), [s_seg],
                         partition_by=["venue"])
    polys, s_polys = stage("polygons", raster.extract_polygons(rast, params),
                           [s_rast], partition_by=["venue"])

    # tiles := extracted outer polygons (small set → broadcast PIP);
    # tile_id = venue * 1000 + poly_id (deterministic). The `venue` column
    # keys the broadcast dict so each probe tests only its venue's rings.
    tiles_pdf = (polys.filter("is_outer")
                 .select((F.col("venue") * 1000 + F.col("poly_id")).alias("tile_id"),
                         "venue", "ring")
                 .toPandas())
    tiles_pdf["kind"] = "corridor"
    stage("tile_assignments", joins.tile_assignments(segs, tiles_pdf),
          [s_seg, s_polys])
    return results
