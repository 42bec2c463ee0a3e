"""Corridor-buffer operator (SURVEY.md §2.9 row 2): miter-offset polygon
around representative polylines, width from crossing spread. Kernel unit
tests + engine-level containment and raster-path cross-validation."""

import numpy as np
import pandas as pd
import pytest

from fixtures import gen_pages
from imc import corridors, dbscan, extract, joins, kernels, raster, segments, sweep
from imc.config import IMCParams

PARAMS = IMCParams(eps=1.2, min_lns=3)


def _area(ring):
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def test_offset_polyline_straight():
    pts = np.array([[0.0, 0.0], [10.0, 0.0]])
    ring = kernels.offset_polyline(pts, 1.0)
    assert ring.shape == (4, 2)
    assert _area(ring) == pytest.approx(20.0)  # 10 long × 2 wide, CCW
    inside = kernels.point_in_polygon([5.0, 0.1], [0.0, -0.9], ring)
    assert inside.all()
    assert not kernels.point_in_polygon([5.0], [1.5], ring)[0]


def test_offset_polyline_right_angle_miter():
    pts = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    ring = kernels.offset_polyline(pts, 0.5)
    # interior polyline points strictly inside (endpoints lie ON the flat
    # end caps by construction — standard offset geometry)
    probe = np.array([[5.0, 0.0], [10.0, 0.0], [10.0, 5.0], [9.9, 9.9]])
    assert kernels.point_in_polygon(probe[:, 0], probe[:, 1], ring).all()
    # area ≈ length(20) × width(1) + miter corner slack
    assert 19.0 < _area(ring) < 22.5
    # CCW orientation pinned
    assert _area(ring) > 0


def test_offset_polyline_degenerate_inputs():
    with pytest.raises(ValueError):
        kernels.offset_polyline(np.array([[1.0, 1.0], [1.0, 1.0]]), 0.5)
    # 180° reversal does not produce NaNs
    pts = np.array([[0.0, 0.0], [5.0, 0.0], [2.0, 0.0]])
    ring = kernels.offset_polyline(pts, 0.5)
    assert np.isfinite(ring).all()


def test_sweep_spread_column():
    rng = np.random.default_rng(3)
    n = 40
    y = rng.normal(0.0, 0.3, size=n)
    # 3m-long overlapping segments along y≈0 → ~6 crossings per position
    segs = np.stack([np.linspace(0, 20, n), y,
                     np.linspace(3.0, 23.0, n), y + rng.normal(0, 0.05, n)], axis=1)
    rep3 = kernels.sweep_representative(segs, 3, 1.0, with_spread=True)
    rep2 = kernels.sweep_representative(segs, 3, 1.0)
    assert rep3.shape[1] == 3 and rep2.shape[1] == 2
    assert rep3.shape[0] == rep2.shape[0] > 3
    np.testing.assert_array_equal(rep3[:, :2], rep2)  # default path unchanged
    assert (rep3[:, 2] >= 0).all()
    # spread tracks the planted noise scale (~2×q90 of |N(0,.3)| ≈ 1.0)
    assert 0.2 < np.median(rep3[:, 2]) < 2.0


@pytest.fixture(scope="module")
def cluster_ctx(spark):
    path = gen_pages.ensure_pages(sf=0.001)
    pts = extract.pages_to_points(spark.read.parquet(path))
    seg_df = segments.mdl_segments(pts)
    seg_df.cache().count()
    assign = dbscan.dbscan(seg_df, joins.eps_join(seg_df, PARAMS), PARAMS)
    assign.cache().count()
    return seg_df, assign


def test_corridor_polygons_contain_their_polylines(spark, cluster_ctx):
    seg_df, assign = cluster_ctx
    cors = corridors.corridor_polygons(seg_df, assign, PARAMS).toPandas()
    reps = sweep.representative_trajectories(seg_df, assign, PARAMS).toPandas()
    assert len(cors) > 0
    assert cors["cluster_id"].is_unique
    assert (cors["width"] >= PARAMS.corridor_min_width).all()
    for _, row in cors.iterrows():
        ring = np.array([[p["x"], p["y"]] for p in row["ring"]])
        rep = reps[reps["cluster_id"] == row["cluster_id"]].sort_values("pt_seq")
        pts = rep[["x", "y"]].to_numpy()
        # interior sample points of the polyline lie inside the buffer
        mids = (pts[:-1] + pts[1:]) / 2.0
        probe = np.concatenate([pts[1:-1], mids]) if len(pts) > 2 else mids
        inside = kernels.point_in_polygon(probe[:, 0], probe[:, 1], ring)
        assert inside.mean() >= 0.9, row["cluster_id"]


def test_corridor_polygons_overlap_raster_path(spark, cluster_ctx):
    """Cross-validation of the two map-polygon paths: the buffered
    corridors of venue 0 overlap the raster-extracted corridor region."""
    seg_df, assign = cluster_ctx
    venue0 = seg_df.filter("traj_id < 10000")
    cors = corridors.corridor_polygons(
        venue0, assign.join(venue0.select("seg_id"), "seg_id", "left_semi"),
        PARAMS).toPandas()
    rast = raster.extract_polygons(raster.rasterize(venue0, PARAMS), PARAMS) \
        .filter("is_outer").toPandas()
    assert len(cors) > 0 and len(rast) > 0
    # common grid over the venue extent
    xs = np.arange(-2.0, 43.0, 0.25) + 0.125
    ys = np.arange(-2.0, 43.0, 0.25) + 0.125
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    px, py = gx.ravel(), gy.ravel()

    def union_mask(rows):
        m = np.zeros(px.shape[0], dtype=bool)
        for _, row in rows.iterrows():
            ring = np.array([[p["x"], p["y"]] for p in row["ring"]])
            m |= kernels.point_in_polygon(px, py, ring)
        return m

    mc = union_mask(cors)
    mr = union_mask(rast)
    # the buffers hug the centerlines of the (wider) rasterized walkable
    # region: near-total containment is the meaningful cross-check, plus a
    # floor on symmetric IoU (buffers are ~0.5 m wide vs the ~3 m raster
    # corridor, so IoU is structurally ≤ width ratio)
    assert (mc & mr).sum() / max(mc.sum(), 1) > 0.9
    assert (mc & mr).sum() / max((mc | mr).sum(), 1) > 0.04
    # one corridor polygon per expected venue-0 cluster (the 6 grid lines)
    assert len(cors) == 6
