"""Freeze golden outputs (FIXTURES.md §4) from the brute-force oracle.

Run once (`python fixtures/freeze_goldens.py`), outputs committed to git at
fixtures/golden/sf0.001/. Pure driver-side numpy/pandas — no Spark — so the
goldens are independent of the distributed operators they gate.

Sweep goldens come from the pinned kernel but are asserted against the
scalar oracle (≤1e-9) at freeze time; eps/assignment goldens come straight
from the exhaustive-matrix oracle.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from fixtures import gen_pages, oracle
from imc import kernels
from imc.config import IMCParams

SF = 0.001
PARAMS = IMCParams(eps=1.2, min_lns=3)
OUT = os.path.join(os.path.dirname(__file__), "golden", f"sf{SF}")


def build_segments() -> pd.DataFrame:
    tp = gen_pages.truth_points(sf=SF)
    rows = []
    for tid, grp in tp.groupby("traj_id"):
        grp = grp.sort_values("seq")
        pts = grp[["x", "y"]].to_numpy(np.float64)
        seqs = grp["seq"].to_numpy()
        cp = kernels.mdl_partition(pts)
        for a, b in zip(cp[:-1], cp[1:]):
            if pts[a, 0] == pts[b, 0] and pts[a, 1] == pts[b, 1]:
                continue
            rows.append((int(tid) * 100_000 + int(seqs[a]), int(tid),
                         pts[a, 0], pts[a, 1], pts[b, 0], pts[b, 1]))
    return pd.DataFrame(rows, columns=["seg_id", "traj_id", "x1", "y1", "x2", "y2"])


def main():
    os.makedirs(OUT, exist_ok=True)
    segs = build_segments()
    seg_ids = segs["seg_id"].to_numpy(np.int64)
    traj_ids = segs["traj_id"].to_numpy(np.int64)
    arr = segs[["x1", "y1", "x2", "y2"]].to_numpy(np.float64)

    eps_pairs = oracle.eps_pairs_oracle(seg_ids, arr, PARAMS.eps)
    eps_pairs.sort_values(["a_seg", "b_seg"]).to_csv(
        os.path.join(OUT, "golden_eps_pairs.csv"), index=False, float_format="%.17g")

    assigns = oracle.dbscan_oracle(seg_ids, traj_ids, arr, PARAMS.eps, PARAMS.min_lns)
    assigns.sort_values("seg_id").to_csv(
        os.path.join(OUT, "golden_assignments.csv"), index=False)

    rep_rows = []
    merged = assigns.merge(segs, on="seg_id")
    for cid, grp in merged.groupby("cluster_id"):
        cl = grp.sort_values("seg_id")[["x1", "y1", "x2", "y2"]].to_numpy(np.float64)
        rep = kernels.sweep_representative(cl, PARAMS.min_lns, PARAMS.gamma)
        check = oracle.sweep_oracle(cl, PARAMS.min_lns, PARAMS.gamma)
        assert rep.shape == check.shape
        np.testing.assert_allclose(rep, check, atol=1e-9)
        for k in range(rep.shape[0]):
            rep_rows.append((int(cid), k, rep[k, 0], rep[k, 1]))
    pd.DataFrame(rep_rows, columns=["cluster_id", "pt_seq", "x", "y"]).to_csv(
        os.path.join(OUT, "golden_rep_points.csv"), index=False, float_format="%.17g")

    # tile assignments vs ground-truth venue tiles (scalar PIP, lowest id wins)
    tiles = gen_pages.venue_tiles()
    mx = (segs["x1"] + segs["x2"]) / 2
    my = (segs["y1"] + segs["y2"]) / 2
    t_rows = []
    rings = [(int(r["tile_id"]), np.array([[p["x"], p["y"]] for p in r["ring"]]))
             for _, r in tiles.sort_values("tile_id").iterrows()]
    for sid, px, py in zip(seg_ids, mx, my):
        assigned = -1
        for tid, ring in rings:
            if kernels.point_in_polygon([px], [py], ring)[0]:
                assigned = tid
                break
        t_rows.append((int(sid), assigned))
    pd.DataFrame(t_rows, columns=["seg_id", "tile_id"]).to_csv(
        os.path.join(OUT, "golden_tile_assignments.csv"), index=False)

    # byte-identical text invariant: sha256 per url (latest warc_ts wins)
    pages = gen_pages.gen_pages(sf=SF)
    latest = (pages.sort_values(["url", "warc_ts"])
              .groupby("url", as_index=False).last())
    latest["sha256"] = latest["text"].map(
        lambda t: hashlib.sha256(t.encode()).hexdigest())
    latest[["url", "sha256"]].to_csv(
        os.path.join(OUT, "golden_text_sha.csv"), index=False)

    print(f"goldens frozen to {OUT}: "
          f"{len(eps_pairs)} eps_pairs, {len(assigns)} assignments, "
          f"{len(rep_rows)} rep_points, {len(t_rows)} tile_assignments, "
          f"{len(latest)} text shas")


if __name__ == "__main__":
    main()
