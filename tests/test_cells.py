"""Cell-index unit tests (SURVEY.md §5.2-1, §2.4 prefilter guarantee)."""

import numpy as np

from imc import cells
from imc.kernels import traclus_distance


def test_morton_roundtrip():
    rng = np.random.default_rng(1)
    ix = rng.integers(-100000, 100000, 1000)
    iy = rng.integers(-100000, 100000, 1000)
    code = cells.morton_encode(ix, iy)
    rx, ry = cells.morton_decode(code)
    np.testing.assert_array_equal(rx, ix)
    np.testing.assert_array_equal(ry, iy)
    assert code.dtype == np.int64
    assert np.all(code >= 0)  # biased domain → non-negative ids


def test_morton_unique_per_cell():
    ix, iy = np.meshgrid(np.arange(-50, 50), np.arange(-50, 50))
    codes = cells.morton_encode(ix.ravel(), iy.ravel())
    assert len(np.unique(codes)) == codes.size


def test_point_cell_boundaries():
    # floor semantics: x=1.0 with cell 1.0 lands in cell 1, not 0
    c0 = cells.point_cell([0.999], [0.0], 1.0)
    c1 = cells.point_cell([1.0], [0.0], 1.0)
    assert c0[0] != c1[0]


def test_cover_contains_endpoints_and_dilate_superset():
    cov = cells.segment_cover(0.2, 0.2, 5.7, 3.1, 1.0)
    assert cells.point_cell([0.2], [0.2], 1.0)[0] in cov
    assert cells.point_cell([5.7], [3.1], 1.0)[0] in cov
    dil = cells.segment_cover(0.2, 0.2, 5.7, 3.1, 1.0, dilate=True)
    assert set(cov) <= set(dil)
    assert np.all(np.diff(dil) > 0)  # sorted, unique


def test_prefilter_guarantee_vs_bruteforce():
    """Any pair with TRACLUS dist ≤ ε must share a (cover, dilated-cover)
    cell when cell size = 2ε — the ε-join correctness invariant."""
    rng = np.random.default_rng(42)
    eps = 1.5
    g = 2 * eps
    n = 120
    segs = rng.uniform(0, 30, size=(n, 4))
    lens = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
    segs = segs[lens > 1e-6]
    n = segs.shape[0]
    ii, jj = np.triu_indices(n, k=1)
    _, _, _, dist = traclus_distance(segs[ii, 0], segs[ii, 1], segs[ii, 2], segs[ii, 3],
                                     segs[jj, 0], segs[jj, 1], segs[jj, 2], segs[jj, 3])
    covers = [set(cells.segment_cover(*segs[i], g)) for i in range(n)]
    dilated = [set(cells.segment_cover(*segs[i], g, dilate=True)) for i in range(n)]
    close = np.nonzero(dist <= eps)[0]
    assert len(close) > 0  # fixture sanity: some pairs are within ε
    for k in close:
        i, j = int(ii[k]), int(jj[k])
        assert covers[i] & dilated[j], f"pair ({i},{j}) dist={dist[k]} missed by prefilter"
