"""raw/MDL segment construction tests; the mapInPandas MDL fast path must
equal the grouped-map reference implementation exactly."""

import numpy as np
import pandas as pd
import pytest

from fixtures import gen_pages
from imc import extract, segments
from imc.kernels import mdl_partition


@pytest.fixture(scope="module")
def points(spark):
    path = gen_pages.ensure_pages(sf=0.001)
    pages = spark.read.parquet(path)
    pts = extract.pages_to_points(pages)
    pts.cache().count()
    return pts


def test_raw_segments_pairing(spark, points):
    segs = segments.raw_segments(points).toPandas()
    pts = points.toPandas().sort_values(["traj_id", "seq"])
    want_n = sum(len(g) - 1 for _, g in pts.groupby("traj_id"))
    # zero-length raw segments are possible but rare with noise; allow few
    assert want_n - 5 <= len(segs) <= want_n
    one = pts[pts.traj_id == pts.traj_id.iloc[0]]
    srow = segs[segs.seg_id == one.traj_id.iloc[0] * 100000 + one.seq.iloc[0]].iloc[0]
    assert srow["x1"] == one.x.iloc[0] and srow["y1"] == one.y.iloc[0]
    assert srow["x2"] == one.x.iloc[1] and srow["y2"] == one.y.iloc[1]
    assert (segs["len"] > 0).all()


def test_mdl_fast_equals_grouped(spark, points):
    fast = segments.mdl_segments(points).toPandas() \
        .sort_values("seg_id").reset_index(drop=True)
    ref = segments.mdl_segments_grouped(points).toPandas() \
        .sort_values("seg_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, ref)


def test_mdl_fast_handles_batch_boundaries(spark):
    """Trajectories spanning Arrow batch boundaries are reassembled: force
    tiny batches so every trajectory straddles several."""
    rng = np.random.default_rng(8)
    rows = []
    for tid in range(20):
        n = int(rng.integers(30, 80))
        xs = np.cumsum(rng.normal(1.0, 0.1, n))
        ys = rng.normal(0, 0.05, n)
        for s in range(n):
            rows.append((tid, s, float(xs[s]), float(ys[s])))
    pdf = pd.DataFrame(rows, columns=["traj_id", "seq", "x", "y"])
    df = spark.createDataFrame(pdf)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = segments.mdl_segments(df).toPandas().sort_values("seg_id")
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # driver-side oracle
    want_rows = []
    for tid, grp in pdf.groupby("traj_id"):
        pts = grp.sort_values("seq")[["x", "y"]].to_numpy(np.float64)
        cp = mdl_partition(pts)
        for a, b in zip(cp[:-1], cp[1:]):
            want_rows.append((tid * 100000 + int(grp.seq.iloc[a]),
                              pts[a, 0], pts[a, 1], pts[b, 0], pts[b, 1]))
    want = pd.DataFrame(want_rows, columns=["seg_id", "x1", "y1", "x2", "y2"]) \
        .sort_values("seg_id")
    assert list(got["seg_id"]) == list(want["seg_id"])
    np.testing.assert_allclose(got[["x1", "y1", "x2", "y2"]].to_numpy(),
                               want[["x1", "y1", "x2", "y2"]].to_numpy())
