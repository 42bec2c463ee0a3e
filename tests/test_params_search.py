"""ε-entropy parameter search ([T] §4.4; VERDICT r01: implemented but
untested). Hand-computed entropy check + structured-fixture best-ε."""

import math

import numpy as np
import pandas as pd
import pytest

from fixtures import gen_pages
from imc import extract, params_search, segments
from imc.config import IMCParams

PARAMS = IMCParams(eps=1.2, min_lns=3)


def test_neighborhood_entropy_hand_computed(spark):
    # A,B within eps of each other; C,D isolated → |Nε| = [2,2,1,1]
    # H = log2(6) − (2·log2(2)·2 + 0)/6
    pdf = pd.DataFrame({
        "seg_id": [1, 2, 3, 4],
        "x1": [0.0, 0.1, 100.0, 200.0], "y1": [0.0, 0.1, 0.0, 0.0],
        "x2": [1.0, 1.1, 101.0, 201.0], "y2": [0.0, 0.1, 0.0, 0.0],
    })
    segs = spark.createDataFrame(pdf)
    h, avg = params_search.neighborhood_entropy(segs, eps=1.0, params=PARAMS)
    want_h = math.log2(6) - (2 * math.log2(2) * 2) / 6
    assert h == pytest.approx(want_h, abs=1e-9)
    assert avg == pytest.approx(1.5, abs=1e-12)


@pytest.fixture(scope="module")
def seg_subset(spark):
    path = gen_pages.ensure_pages(sf=0.001)
    pts = extract.pages_to_points(spark.read.parquet(path))
    df = segments.mdl_segments(pts).filter("traj_id % 50 < 12")
    df.cache().count()
    return df


def test_search_eps_finds_structured_scale(spark, seg_subset):
    """On the corridor fixture the entropy is minimized at the corridor
    scale (ε=1.2, the pinned fixture parameter), not at the degenerate
    extremes where |Nε| is uniform (all 1s / all n) and H → log2 N."""
    res = params_search.search_eps(seg_subset, [0.05, 1.2, 50.0], PARAMS)
    tbl = {round(e, 3): (h, a) for e, h, a in res["table"]}
    assert res["best_eps"] == 1.2
    assert tbl[1.2][0] < tbl[0.05][0]
    assert tbl[1.2][0] < tbl[50.0][0]
    # avg |Nε| is monotone nondecreasing in ε
    assert tbl[0.05][1] <= tbl[1.2][1] <= tbl[50.0][1]
    lo, hi = res["min_lns_range"]
    assert hi == lo + 2 and lo == int(round(tbl[1.2][1])) + 1
