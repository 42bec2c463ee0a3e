"""Spatial joins (SURVEY.md §2.4 — the heart of the engine).

ε-neighborhood self-join = the DBSCAN bulk ε-query ([T] §4.2 Defn 5), done
as ONE distributed join, not n point queries:

  phase 1 (prefilter): explode each segment onto its covering Morton cells
    (cell size g ≥ 2ε); probe side is dilated by the 8-neighbor ring. The
    equi-join on `cell` is a plain shuffle join Catalyst/AQE optimizes.
    Guarantee: dist ≤ ε ⟹ some endpoint pair within 2ε ⟹ shared key
    (proof in imc/cells.py docstring; verified vs crossJoin in tests).
  skew: hot cells (corridor junctions) are salted — left side gets
    salt = pmod(hash(seg_id), S), right side replicates S× — on top of
    AQE's skew-join splitting (BASELINE.json:6 mandates explicit salting).
  phase 2 (refine): exact TRACLUS + Hausdorff distance in a vectorized
    pandas UDF over pair batches; filter dist ≤ ε; canonical (a < b).

kNN join: same prefilter at expanding rings, row_number() ≤ k per probe.

Point-in-polygon tile assignment: tiles are a SMALL polygon set
(BASELINE.json:6 "broadcast of small polygon sets") — shipped into a
pandas-UDF closure; vectorized bbox prefilter + even-odd ray crossing;
map-side only, zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from imc import cells as cell_mod
from imc import kernels
from imc.config import IMCParams

_COORDS = ["x1", "y1", "x2", "y2"]


def _ensure_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition iff the input arrives in fewer partitions than the
    cluster can use (e.g. a small parquet file with one row group) so the
    map-side UDF stages actually fan out. No-op (and no extra shuffle) for
    healthy inputs — at real scale inputs always arrive well-partitioned."""
    want = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def _cover_udf(cell_size: float, dilate: bool, ring: int = 1):
    @pandas_udf(T.ArrayType(T.LongType()))
    def cover(x1: pd.Series, y1: pd.Series, x2: pd.Series, y2: pd.Series) -> pd.Series:
        n = len(x1)
        a1 = x1.to_numpy(np.float64)
        b1 = y1.to_numpy(np.float64)
        a2 = x2.to_numpy(np.float64)
        b2 = y2.to_numpy(np.float64)
        out = []
        offs = None
        if dilate:
            offs = np.array([(dx, dy) for dx in range(-ring, ring + 1)
                             for dy in range(-ring, ring + 1)], dtype=np.int64)
        for i in range(n):
            c = kernels.grid_traverse(a1[i], b1[i], a2[i], b2[i], cell_size)
            if offs is not None:
                c = (c[:, None, :] + offs[None, :, :]).reshape(-1, 2)
            out.append(np.unique(cell_mod.morton_encode(c[:, 0], c[:, 1])))
        return pd.Series(out)

    return cover


def with_cells(segments: DataFrame, cell_size: float, dilate: bool = False,
               ring: int = 1) -> DataFrame:
    """segments + exploded `cell` column (the batched H3/S2-style encoding)."""
    cov = _cover_udf(cell_size, dilate, ring)
    return (segments
            .withColumn("cell", F.explode(cov(*[F.col(c) for c in _COORDS]))))


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

    return pair_dist


def _hot_cells(segs: DataFrame, cell_size: float, factor: float) -> DataFrame:
    """Cells whose cover count exceeds factor × mean — the cheap pre-pass
    that drives salting (SURVEY.md §2.4 skew row). Runs on a 10% sample
    (seeded, deterministic) so the cover UDF isn't paid twice in full;
    relative hotness is what matters, and a hot cell holding a constant
    fraction of rows stays hot under uniform sampling."""
    sample = segs.sample(fraction=0.1, seed=42)
    counts = (with_cells(sample, cell_size, dilate=False)
              .groupBy("cell").agg(F.count("*").alias("n")))
    mean = counts.agg(F.avg("n")).collect()[0][0] or 0.0
    return counts.filter(F.col("n") > factor * mean).select("cell")


def eps_join(segments: DataFrame, params: IMCParams | None = None,
             salt: bool = True, metric: str = "traclus") -> DataFrame:
    """All pairs (a_seg < b_seg) with distance ≤ ε.

    Returns eps_pairs(a_seg BIGINT, b_seg BIGINT, dist DOUBLE) — itself a
    first-class deliverable ("matching the reference's join output rows",
    BASELINE.json north_rule).
    """
    params = params or IMCParams()
    g = params.join_cell
    segs = _ensure_parallelism(segments.select("seg_id", *_COORDS))

    left = with_cells(segs, g, dilate=False)
    right = with_cells(segs, g, dilate=True)

    if salt:
        s = params.salt_buckets
        hot = _hot_cells(segs, g, params.hot_cell_factor)
        hot = hot.withColumn("_hot", F.lit(True))
        left = (left.join(F.broadcast(hot), "cell", "left")
                .withColumn("salt",
                            F.when(F.col("_hot"), F.pmod(F.hash("seg_id"), F.lit(s)))
                            .otherwise(F.lit(0)))
                .drop("_hot"))
        right = (right.join(F.broadcast(hot), "cell", "left")
                 .withColumn("salt",
                             F.explode(F.when(F.col("_hot"),
                                              F.sequence(F.lit(0), F.lit(s - 1)))
                                       .otherwise(F.array(F.lit(0)))))
                 .drop("_hot"))
        join_keys = ["cell", "salt"]
    else:
        join_keys = ["cell"]

    l = left.select(F.col("seg_id").alias("a_seg"),
                    *[F.col(c).alias(f"a{c}") for c in _COORDS],
                    *join_keys)
    r = right.select(F.col("seg_id").alias("b_seg"),
                     *[F.col(c).alias(f"b{c}") for c in _COORDS],
                     *join_keys)
    # bbox prefilter (pure codegen, before the dedupe shuffle): TRACLUS
    # dist ≤ ε ⟹ some endpoint pair within gap_bound (see imc/cells.py);
    # the bbox gap lower-bounds every point-pair distance, so pairs with
    # bbox gap > gap_bound are provably not within ε. Cuts the candidate
    # set (and both downstream shuffles + the refine UDF input) ~2-5×.
    gap_bound = max(2.0 / max(params.w_perp, 1e-9),
                    1.0 / max(params.w_par, 1e-9)) * params.eps
    dx = F.greatest(F.lit(0.0),
                    F.least("ax1", "ax2") - F.greatest("bx1", "bx2"),
                    F.least("bx1", "bx2") - F.greatest("ax1", "ax2"))
    dy = F.greatest(F.lit(0.0),
                    F.least("ay1", "ay2") - F.greatest("by1", "by2"),
                    F.least("by1", "by2") - F.greatest("ay1", "ay2"))
    cands = (l.join(r, join_keys)
             .filter(F.col("a_seg") < F.col("b_seg"))
             .filter(dx * dx + dy * dy <= F.lit(gap_bound * gap_bound))
             .dropDuplicates(["a_seg", "b_seg"]))

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
             params: IMCParams | None = None, ring: int = 2,
             metric: str = "traclus") -> DataFrame:
    """k nearest base segments per probe segment (SURVEY.md §2.4).

    Candidates from the cell prefilter at `ring` dilation; probes whose
    candidate pool is smaller than k fall back to a broadcast nested-loop
    against the full base (exact, bounded: the fallback set is tiny for any
    sane ring). Returns (a_seg probe, b_seg base, dist, rank)."""
    params = params or IMCParams()
    g = params.join_cell
    probes = _ensure_parallelism(probes)
    base = _ensure_parallelism(base)

    p = with_cells(probes.select("seg_id", *_COORDS), g, dilate=True, ring=ring) \
        .select(F.col("seg_id").alias("a_seg"),
                *[F.col(c).alias(f"a{c}") for c in _COORDS], "cell")
    b = with_cells(base.select("seg_id", *_COORDS), g, dilate=False) \
        .select(F.col("seg_id").alias("b_seg"),
                *[F.col(c).alias(f"b{c}") for c in _COORDS], "cell")
    cands = (p.join(b, "cell")
             .filter(F.col("a_seg") != F.col("b_seg"))
             .dropDuplicates(["a_seg", "b_seg"])
             .drop("cell"))

    # probes with fewer than k candidates → exact fallback vs broadcast base
    short = (cands.groupBy("a_seg").agg(F.count("*").alias("n"))
             .filter(F.col("n") < k).select("a_seg"))
    fallback = (probes.select(F.col("seg_id").alias("a_seg"),
                              *[F.col(c).alias(f"a{c}") for c in _COORDS])
                .join(F.broadcast(short), "a_seg", "left_semi")
                .crossJoin(F.broadcast(
                    base.select(F.col("seg_id").alias("b_seg"),
                                *[F.col(c).alias(f"b{c}") for c in _COORDS])))
                .filter(F.col("a_seg") != F.col("b_seg")))
    cands = cands.unionByName(fallback).dropDuplicates(["a_seg", "b_seg"])

    pd_udf = _pair_dist_udf(params.w_perp, params.w_par, params.w_ang)
    dist_struct = pd_udf(*[F.col(f"a{c}") for c in _COORDS],
                         *[F.col(f"b{c}") for c in _COORDS])
    dist_col = F.col("_d.d_traclus") if metric == "traclus" else F.col("_d.d_hausdorff")
    w = Window.partitionBy("a_seg").orderBy("dist", "b_seg")
    return (cands
            .withColumn("_d", dist_struct)
            .withColumn("dist", dist_col)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("a_seg", "b_seg", "dist", "rank"))


def _pip_udf(tiles_pdf: pd.DataFrame):
    """Build the broadcast-closure PIP kernel. tiles_pdf: tile_id, ring
    (list of {x,y}), kind. Lowest containing tile_id wins (pinned)."""
    rings = []
    for _, row in tiles_pdf.sort_values("tile_id").iterrows():
        ring = np.array([[p["x"], p["y"]] for p in row["ring"]], dtype=np.float64)
        bbox = (ring[:, 0].min(), ring[:, 0].max(), ring[:, 1].min(), ring[:, 1].max())
        rings.append((int(row["tile_id"]), ring, bbox))

    @pandas_udf(T.LongType())
    def pip_assign(x: pd.Series, y: pd.Series) -> pd.Series:
        px = x.to_numpy(np.float64)
        py = y.to_numpy(np.float64)
        out = np.full(len(px), -1, dtype=np.int64)
        unassigned = np.ones(len(px), dtype=bool)
        for tile_id, ring, (x0, x1b, y0, y1b) in rings:
            mask = unassigned & (px >= x0) & (px <= x1b) & (py >= y0) & (py <= y1b)
            if not mask.any():
                continue
            inside = kernels.point_in_polygon(px[mask], py[mask], ring)
            idx = np.nonzero(mask)[0][inside]
            out[idx] = tile_id
            unassigned[idx] = False
        return pd.Series(out)

    return pip_assign


def tile_assignments(segments: DataFrame, tiles_pdf: pd.DataFrame) -> DataFrame:
    """Assign each segment (midpoint test) to the containing map tile.
    Broadcast nested-loop → vectorized ray crossing; map-side only.
    Returns (seg_id, tile_id); tile_id = -1 when no tile contains it."""
    pip = _pip_udf(tiles_pdf)
    mx = (F.col("x1") + F.col("x2")) / 2.0
    my = (F.col("y1") + F.col("y2")) / 2.0
    return _ensure_parallelism(segments).select("seg_id", pip(mx, my).alias("tile_id"))
