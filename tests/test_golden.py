"""Golden end-to-end fixture gates (SURVEY.md §5.2-3; BASELINE.json:6
"must match the reference implementation's own trajectory-clustering test
fixtures exactly"). The goldens were frozen from the brute-force oracle by
fixtures/freeze_goldens.py and committed; here the distributed engine must
reproduce them exactly (multiset; dist/coords to 1e-9)."""

import os

import numpy as np
import pandas as pd
import pytest

from fixtures import gen_pages
from imc import dbscan, extract, joins, segments, sweep
from imc.config import IMCParams

PARAMS = IMCParams(eps=1.2, min_lns=3)
GOLD = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden", "sf0.001")


@pytest.fixture(scope="module")
def engine_outputs(spark):
    path = gen_pages.ensure_pages(sf=0.001)
    pages = spark.read.parquet(path)
    pts = extract.pages_to_points(pages)
    seg_df = segments.mdl_segments(pts)
    seg_df.cache().count()
    pairs = joins.eps_join(seg_df, PARAMS)
    pairs.cache().count()
    assign = dbscan.dbscan(seg_df, pairs, PARAMS)
    assign.cache().count()
    return seg_df, pairs, assign


def test_golden_eps_pairs(spark, engine_outputs):
    _, pairs, _ = engine_outputs
    got = pairs.toPandas().sort_values(["a_seg", "b_seg"]).reset_index(drop=True)
    want = pd.read_csv(os.path.join(GOLD, "golden_eps_pairs.csv")) \
        .sort_values(["a_seg", "b_seg"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[["a_seg", "b_seg"]],
                                  want[["a_seg", "b_seg"]], check_dtype=False)
    np.testing.assert_allclose(got["dist"], want["dist"], atol=1e-9)


def test_golden_assignments(spark, engine_outputs):
    _, _, assign = engine_outputs
    got = assign.toPandas().sort_values("seg_id").reset_index(drop=True)
    want = pd.read_csv(os.path.join(GOLD, "golden_assignments.csv")) \
        .sort_values("seg_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"seg_id": "int64", "cluster_id": "int64", "is_core": "bool"}),
        want.astype({"seg_id": "int64", "cluster_id": "int64", "is_core": "bool"}))


def test_golden_rep_points(spark, engine_outputs):
    seg_df, _, assign = engine_outputs
    rep = sweep.representative_trajectories(seg_df, assign, PARAMS).toPandas()
    got = rep.sort_values(["cluster_id", "pt_seq"]).reset_index(drop=True)
    want = pd.read_csv(os.path.join(GOLD, "golden_rep_points.csv")) \
        .sort_values(["cluster_id", "pt_seq"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[["cluster_id", "pt_seq"]],
                                  want[["cluster_id", "pt_seq"]], check_dtype=False)
    np.testing.assert_allclose(got[["x", "y"]], want[["x", "y"]], atol=1e-9)


def test_golden_tile_assignments(spark, engine_outputs):
    seg_df, _, _ = engine_outputs
    tiles = gen_pages.venue_tiles()
    got = joins.tile_assignments(seg_df, tiles).toPandas() \
        .sort_values("seg_id").reset_index(drop=True)
    want = pd.read_csv(os.path.join(GOLD, "golden_tile_assignments.csv")) \
        .sort_values("seg_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_golden_text_sha(spark):
    path = gen_pages.ensure_pages(sf=0.001)
    pages = spark.read.parquet(path)
    got = extract.text_sha(pages).toPandas().sort_values("url").reset_index(drop=True)
    want = pd.read_csv(os.path.join(GOLD, "golden_text_sha.csv")) \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
