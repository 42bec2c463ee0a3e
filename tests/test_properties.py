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


# ---------------------------------------------------------------------------
# stream_sessionize's per-batch walk (imc/streaming.py sessionize_walk) —
# the documented late-data semantics, property-tested without a streaming
# query (VERDICT r05 #7). The walk is the ONLY place streaming can diverge
# from the batch twin; these pin (a) ordered waves are exactly the batch
# result and (b) detached late events only ever ADD (t, t, 1) singletons.

from imc.streaming import sessionize_walk  # noqa: E402

GAP_US = st.integers(min_value=1, max_value=10**7)
TIMES = st.lists(st.integers(min_value=0, max_value=10**9),
                 min_size=1, max_size=40)


def _batch_sessions(times_sorted, gap_us):
    """The batch rel_sessions rule, directly: walk the FULL sorted event
    list, close on silence > gap."""
    out = []
    s = last = times_sorted[0]
    n = 1
    for t in times_sorted[1:]:
        if t - last > gap_us:
            out.append((s, last, n))
            s, n = t, 1
        else:
            n += 1
        last = t
    out.append((s, last, n))
    return out


def _fold_waves(waves, gap_us):
    """Feed waves through the per-batch walk like the streaming query
    does (each wave pre-sorted, state carried), then flush the final
    open session — the availableNow-run end state."""
    emitted, state = [], None
    for w in waves:
        closed, state = sessionize_walk(sorted(w), state, gap_us)
        emitted.extend(closed)
    if state is not None:
        emitted.append(state)
    return emitted


@given(times=TIMES, cuts=st.lists(st.integers(0, 40), max_size=6),
       gap_us=GAP_US)
@settings(max_examples=300, deadline=None, derandomize=True, database=None)
def test_sessionize_ordered_waves_equal_batch_twin(times, cuts, gap_us):
    """(a) EVENT-TIME-ORDERED waves — any wave boundaries, including
    empty waves — produce exactly the batch twin's sessions, in order."""
    ts = sorted(times)
    idx = sorted(min(c, len(ts)) for c in cuts)
    waves, prev = [], 0
    for i in idx + [len(ts)]:
        waves.append(ts[prev:i])
        prev = i
    assert _fold_waves(waves, gap_us) == _batch_sessions(ts, gap_us)


@given(times=TIMES, cuts=st.lists(st.integers(0, 40), max_size=4),
       gap_us=GAP_US,
       late_offs=st.lists(st.integers(0, 10**6), min_size=1, max_size=5),
       late_waves=st.lists(st.integers(0, 6), min_size=5, max_size=5))
@settings(max_examples=300, deadline=None, derandomize=True, database=None)
def test_sessionize_detached_late_only_adds_singletons(
        times, cuts, gap_us, late_offs, late_waves):
    """(b) DETACHED late events (> gap earlier than everything on time,
    pairwise > gap apart — the best-effort arm) only ever ADD their own
    (t, t, 1) singleton sessions: every on-time session keeps exactly
    the boundaries and counts of the ordered run, wherever in the wave
    sequence the late rows land."""
    ts = sorted(times)
    idx = sorted(min(c, len(ts)) for c in cuts)
    waves, prev = [], 0
    for i in idx + [len(ts)]:
        waves.append(ts[prev:i])
        prev = i
    # construct lates below min(on-time) - gap, pairwise > gap apart
    lates, cur = [], ts[0] - gap_us - 1
    for off in late_offs:
        cur -= off
        lates.append(cur)
        cur -= gap_us + 1
    ordered = _fold_waves(waves, gap_us)
    polluted = [list(w) for w in waves]
    for t, wi in zip(lates, late_waves):
        polluted[wi % len(polluted)].append(t)
    got = _fold_waves(polluted, gap_us)
    want = sorted(ordered + [(t, t, 1) for t in lates])
    assert sorted(got) == want


@given(times=TIMES, cuts=st.lists(st.integers(0, 40), max_size=5),
       gap_us=GAP_US,
       jitter=st.lists(st.integers(0, 10**8), min_size=6, max_size=6))
@settings(max_examples=300, deadline=None, derandomize=True, database=None)
def test_sessionize_watermark_admitted_waves_never_overlap(
        times, cuts, gap_us, jitter):
    """(c) the ADVICE r05 #2 worry, bounded: under Spark's watermark
    admission rule — a batch-k row passes the state-store pre-filter
    only if ts >= max(all earlier-batch event times) - gap (delay =
    gap_sec) — emitted sessions can NEVER overlap as intervals, because
    a gap-closed session's own closing event (> end + gap) drags the
    watermark past its end before the next batch opens. This pins the
    non-overlap guarantee to the walk + watermark CONTRACT, so the
    3-long state needs no last-emitted-end fence."""
    ts = sorted(times)
    idx = sorted(min(c, len(ts)) for c in cuts)
    waves, prev = [], 0
    for i in idx + [len(ts)]:
        waves.append(ts[prev:i])
        prev = i
    # inject admissible out-of-order rows: each extra row lands in wave
    # k at any time >= watermark(k-1) = max(earlier waves) - gap
    seen_max = None
    polluted = []
    for k, w in enumerate(waves):
        w = list(w)
        if seen_max is not None:
            lo = seen_max - gap_us
            w.append(lo + jitter[k % len(jitter)] % (gap_us + 10**6))
        polluted.append(sorted(w))
        m = max(w, default=None)
        if m is not None:
            seen_max = m if seen_max is None else max(seen_max, m)
    emitted = _fold_waves(polluted, gap_us)
    ivals = sorted((s, e) for s, e, _ in emitted)
    for (s1, e1), (s2, e2) in zip(ivals, ivals[1:]):
        assert e1 < s2, (ivals,)


# --- r7: PQ encode / ADC identities (imc/similarity.py, VERDICT r06 #8) ---

VEC = st.lists(st.floats(min_value=-10.0, max_value=10.0,
                         allow_nan=False, allow_infinity=False, width=32),
               min_size=8, max_size=8)


@given(x=VEC, book=st.lists(VEC, min_size=2, max_size=6))
@settings(max_examples=200, deadline=None, derandomize=True, database=None)
def test_pq_encode_identity_argmax_dot_is_argmin_l2(x, book):
    """The PQ encoder assigns argmax(x·c − ‖c‖²/2) (the expression the
    Catalyst plan evaluates); the classic identity says that equals
    argmin ‖x−c‖₂ because ‖x−c‖² = ‖x‖² − 2(x·c − ‖c‖²/2) and ‖x‖² is
    candidate-independent. Pinned over random vectors/codebooks —
    trusted-by-construction until r7. Ties: both sides break to the
    LOWEST index (the engine ranks on (-score, index) structs); scores
    are compared at full precision here, the rounding contract is the
    separate LUT test below."""
    xv = np.asarray(x, dtype=np.float64)
    cb = np.asarray(book, dtype=np.float64)
    score = cb @ xv - 0.5 * (cb * cb).sum(axis=1)
    l2 = ((xv[None, :] - cb) ** 2).sum(axis=1)
    assert int(np.argmax(score)) == int(np.argmin(l2)) or (
        # exact score ties may legally disagree with l2 ties only when
        # both are ties (same score ⇒ same l2 and vice versa)
        np.isclose(score[np.argmax(score)], score[np.argmin(l2)])
        and np.isclose(l2[np.argmin(l2)], l2[np.argmax(score)]))


@given(q=st.lists(VEC, min_size=2, max_size=4),
       codes=st.lists(st.integers(min_value=0, max_value=3),
                      min_size=2, max_size=4),
       book=st.lists(VEC, min_size=4, max_size=4))
@settings(max_examples=200, deadline=None, derandomize=True, database=None)
def test_pq_lut_sum_equals_direct_inner_product(q, codes, book):
    """ADC scoring: Σ_j LUT_j[code_j] — each LUT entry rounded to 6 (the
    cross-engine determinism rule) — must equal the direct sum of the
    per-subspace inner products rounded the same way. This is exactly
    the substitution the Catalyst plan performs (element_at over the
    probe's LUT arrays); pinned so a future refactor can't silently
    change the rounding point."""
    cb = np.asarray(book, dtype=np.float64)
    subs = [np.asarray(s, dtype=np.float64) for s in q]
    m = len(subs)
    lut = [np.round(cb @ subs[j], 6) for j in range(m)]
    adc = sum(lut[j][codes[j % len(codes)] % len(cb)] for j in range(m))
    direct = sum(np.round(float(subs[j] @ cb[codes[j % len(codes)] % len(cb)]), 6)
                 for j in range(m))
    assert adc == direct
