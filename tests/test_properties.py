"""Property-based tests (hypothesis) for the pure-numpy kernels — the
invariants the distributed operators depend on but example-based tests
can only spot-check. The reference published no property suite
(SURVEY.md §5); these pin the three load-bearing claims:

1. Morton encode/decode is a bijection over the supported coordinate box
   (imc/cells.py biased-21-bit domain) — cell-id joins never collide two
   distinct cells.
2. PREFILTER SOUNDNESS (the ε-join's losslessness, imc/cells.py module
   docstring): TRACLUS dist(A,B) ≤ ε with cell size g ≥ 2ε implies
   cover(A) ∩ dilated-cover(B) ≠ ∅, so the equi-join on (cover, ring1
   cover) drops no true pair. eps_join's correctness at EVERY scale
   rides on this implication.
3. The batched MDL walk is decision-identical to the scalar reference
   walk for arbitrary trajectories and batch sizes (imc/kernels.py
   mdl_partition docstring claims bit-identical decisions).

All pure numpy — no SparkSession, so the suite stays fast; every test
runs derandomized with the example database disabled (derandomize=True,
database=None on each @settings) so CI never flakes on a fresh seed —
new edges are hunted by bumping max_examples deliberately, not by
rerunning and hoping.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from imc import cells, kernels

COORD = st.integers(min_value=-(1 << 20), max_value=(1 << 20) - 1)
# segment endpoints on a bounded float grid: quantized so degenerate
# (zero-length) segments are generated rarely and filtered explicitly
FCOORD = st.floats(min_value=-100.0, max_value=100.0,
                   allow_nan=False, allow_infinity=False, width=32)


@given(ix=COORD, iy=COORD)
@settings(max_examples=200, deadline=None, derandomize=True, database=None)
def test_morton_roundtrip(ix, iy):
    code = cells.morton_encode(np.array([ix]), np.array([iy]))
    rx, ry = cells.morton_decode(code)
    assert (int(rx[0]), int(ry[0])) == (ix, iy)


@given(ax1=FCOORD, ay1=FCOORD, ax2=FCOORD, ay2=FCOORD,
       bx1=FCOORD, by1=FCOORD, bx2=FCOORD, by2=FCOORD,
       eps=st.floats(min_value=0.1, max_value=10.0, allow_nan=False))
@settings(max_examples=300, deadline=None, derandomize=True, database=None)
def test_prefilter_soundness(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2, eps):
    """dist ≤ ε ⇒ covers intersect (g = 2ε, ring-1 dilation on one side).
    Pairs with dist > ε are vacuously sound and skipped (the prefilter
    may keep them — it only must not LOSE true pairs)."""
    if np.hypot(ax2 - ax1, ay2 - ay1) < 1e-9:
        return  # zero-length segments are filtered upstream (§2.2)
    if np.hypot(bx2 - bx1, by2 - by1) < 1e-9:
        return
    _, _, _, dist = kernels.traclus_distance(
        [ax1], [ay1], [ax2], [ay2], [bx1], [by1], [bx2], [by2])
    if float(dist[0]) > eps:
        return
    g = 2.0 * eps
    ca = cells.segment_cover(ax1, ay1, ax2, ay2, g, dilate=False)
    cb = cells.segment_cover(bx1, by1, bx2, by2, g, dilate=True)
    assert np.intersect1d(ca, cb).size > 0, (
        f"true pair lost by prefilter: dist={float(dist[0])} eps={eps}")


@given(n=st.integers(min_value=2, max_value=40),
       batch=st.integers(min_value=1, max_value=12),
       data=st.data())
@settings(max_examples=150, deadline=None, derandomize=True, database=None)
def test_mdl_batched_equals_scalar(n, batch, data):
    coords = data.draw(st.lists(
        st.tuples(FCOORD, FCOORD), min_size=n, max_size=n))
    pts = np.asarray(coords, dtype=np.float64)
    # consecutive duplicate points make zero-length units; the pipeline
    # drops them before MDL (imc/segments.py min-length filter), so
    # nudge exact duplicates apart instead of discarding the example
    d = np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1]))
    for i in np.where(d < 1e-9)[0]:
        pts[i + 1, 0] += 1e-3 * (i + 1)
    got = kernels.mdl_partition(pts, batch=batch)
    want = kernels.mdl_partition_scalar(pts)
    assert got.tolist() == want.tolist()


@given(ax1=FCOORD, ay1=FCOORD, ax2=FCOORD, ay2=FCOORD)
@settings(max_examples=100, deadline=None, derandomize=True, database=None)
def test_traclus_identity_and_nonnegative(ax1, ay1, ax2, ay2):
    """dist(A,A) = 0 up to two pinned, hypothesis-FOUND float edges:
    (a) len² < kernels._EPS (len < 1e-6): the degenerate-base ll2 clamp
    distorts the projection by at most the segment's own length (a
    6e-8-long segment scored dist≈len against itself); (b) endpoint
    coordinates of wildly different magnitudes: B1 + t·(O2−B1) cannot
    reconstruct O2 past float64 cancellation (observed 1.4e-64 on a
    (0,1)→(0,1.2e-38) segment), bounded by ~ulp(coord) ≈ 1e-13 in the
    ±100 box. Both are far below any plausible ε; the bounds are pinned
    here instead of hiding the examples behind filters."""
    ln = np.hypot(ax2 - ax1, ay2 - ay1)
    if ln < 1e-12:
        return  # the pipeline's len > 0 filter (imc/segments.py:57)
    dp, dpar, da, dist = kernels.traclus_distance(
        [ax1], [ay1], [ax2], [ay2], [ax1], [ay1], [ax2], [ay2])
    tol = ln if ln < 1e-6 else 1e-12
    assert 0.0 <= float(dist[0]) <= tol
    assert float(dp[0]) >= 0 and float(dpar[0]) >= 0 and float(da[0]) >= 0


@given(ax1=FCOORD, ay1=FCOORD, ax2=FCOORD, ay2=FCOORD,
       bx1=FCOORD, by1=FCOORD, bx2=FCOORD, by2=FCOORD)
@settings(max_examples=200, deadline=None, derandomize=True, database=None)
def test_traclus_symmetric_for_distinct_lengths(
        ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Argument order never changes the distance when the base choice is
    unambiguous (strictly different lengths). Exactly-equal lengths ARE
    order-sensitive by construction (base = first-at-ties); the engine
    canonicalizes pair order (a_seg < b_seg) before the refine, so only
    the unambiguous case must be symmetric."""
    la = np.hypot(ax2 - ax1, ay2 - ay1)
    lb = np.hypot(bx2 - bx1, by2 - by1)
    if la < 1e-9 or lb < 1e-9 or abs(la - lb) < 1e-9:
        return
    _, _, _, d1 = kernels.traclus_distance(
        [ax1], [ay1], [ax2], [ay2], [bx1], [by1], [bx2], [by2])
    _, _, _, d2 = kernels.traclus_distance(
        [bx1], [by1], [bx2], [by2], [ax1], [ay1], [ax2], [ay2])
    assert float(d1[0]) == float(d2[0])
