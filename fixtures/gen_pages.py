"""Deterministic synthetic `pages` corpus generator (FIXTURES.md §1-§2).

Produces the engine's only external-facing input: a Common-Crawl-style
web-page table with columns exactly (url, warc_ts, html, text, lang) per
BASELINE.json's input_hint, with trajectory points embedded in page text
(`TRAJ <traj_id> <seq> <x> <y> <iso8601>` lines inside a <pre data-traj>
block). Everything is reproducible bit-for-bit from (seed, sf, hot).

Venue model (FIXTURES.md §2): per venue, a 3×3 corridor grid — nodes at
(20i, 20j), i,j ∈ {0,1,2}, corridors 2 m wide / 20 m long — plus 4 rooms
hanging off edges. Walks are noisy random walks (σ=0.25 m) along the
corridor graph. Venues tile the plane at 1000 m pitch so cell ids never
collide across venues. ~10% of pages carry one walk each; ~90% en;
~5% duplicate urls with older warc_ts and truncated content (url-dedupe
exercise); non-en pages never carry walks (the lang filter then cannot
change cluster structure).

The `text` column is constructed directly (title\nprose\ntraj\n); `html`
wraps the same parts in markup such that the independently-written
extractor (imc.extract.extract_text_str: strip tags, unescape entities)
must reproduce `text` byte-identically — the per-row invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_TS = pd.Timestamp("2026-01-01T00:00:00")
PAGES_PER_VENUE = 500
WALK_EVERY = 10          # every 10th page carries a walk
VENUE_PITCH = 1000.0     # m between venue origins
NODE_STEP = 20.0         # corridor length
CORRIDOR_HALF_W = 1.0    # corridor half width (2 m wide)
ROOM_SIZE = 6.0
SIGMA = 0.10             # walk noise (m); ~6° heading noise at 1 m steps —
                         # keeps MDL segments corridor-scale so ε=1.2
                         # clustering resolves the 6 corridor lines
GEN_VERSION = 2          # bump when generator output changes (cache key)
STEP = 1.0               # walk sampling step (m)
LANGS = ["es", "de", "fr"]


# ---------------------------------------------------------------- venue truth

def venue_nodes(vx: float = 0.0, vy: float = 0.0) -> np.ndarray:
    """(9,2) node coordinates of one venue's 3×3 grid."""
    return np.array([[vx + 20.0 * i, vy + 20.0 * j] for j in range(3) for i in range(3)])


def venue_edges() -> list[tuple[int, int]]:
    """Corridor edges as (node_a, node_b) indices into venue_nodes (12 edges)."""
    edges = []
    for j in range(3):
        for i in range(2):
            edges.append((j * 3 + i, j * 3 + i + 1))      # horizontal
    for j in range(2):
        for i in range(3):
            edges.append((j * 3 + i, (j + 1) * 3 + i))    # vertical
    return edges


def venue_truth(vx: float = 0.0, vy: float = 0.0, venue: int = 0) -> pd.DataFrame:
    """venue_truth(edge_id, x1,y1,x2,y2, kind, expected_cluster) — FIXTURES.md §5."""
    nodes = venue_nodes(vx, vy)
    rows = []
    for eid, (a, b) in enumerate(venue_edges()):
        rows.append({
            "edge_id": venue * 100 + eid,
            "x1": nodes[a, 0], "y1": nodes[a, 1],
            "x2": nodes[b, 0], "y2": nodes[b, 1],
            "kind": "corridor",
            "expected_cluster": venue * 100 + eid,
        })
    return pd.DataFrame(rows)


def venue_tiles(vx: float = 0.0, vy: float = 0.0, venue: int = 0) -> pd.DataFrame:
    """tiles(tile_id, ring ARRAY<STRUCT<x,y>>, kind) — corridor rectangles
    (2 m wide around each edge centerline) + 4 rooms hanging off edges
    (FIXTURES.md §3). Rings are CCW, open (closing edge implied)."""
    nodes = venue_nodes(vx, vy)
    rows = []
    tid = venue * 100
    for (a, b) in venue_edges():
        x1, y1 = nodes[a]
        x2, y2 = nodes[b]
        if y1 == y2:  # horizontal
            ring = [(x1, y1 - CORRIDOR_HALF_W), (x2, y1 - CORRIDOR_HALF_W),
                    (x2, y1 + CORRIDOR_HALF_W), (x1, y1 + CORRIDOR_HALF_W)]
        else:         # vertical
            ring = [(x1 - CORRIDOR_HALF_W, y1), (x1 + CORRIDOR_HALF_W, y1),
                    (x1 + CORRIDOR_HALF_W, y2), (x1 - CORRIDOR_HALF_W, y2)]
        rows.append({"tile_id": tid, "venue": venue,
                     "ring": [{"x": float(x), "y": float(y)} for x, y in ring],
                     "kind": "corridor"})
        tid += 1
    # 4 rooms off the midpoints of edges 0,2,6,8 (south/south/west/west offsets)
    room_specs = [(0, 0.0, -1.0), (2, 0.0, -1.0), (6, -1.0, 0.0), (8, -1.0, 0.0)]
    for eid, ddx, ddy in room_specs:
        a, b = venue_edges()[eid]
        mx = (nodes[a, 0] + nodes[b, 0]) / 2.0
        my = (nodes[a, 1] + nodes[b, 1]) / 2.0
        cx = mx + ddx * (CORRIDOR_HALF_W + 1.0 + ROOM_SIZE / 2.0)
        cy = my + ddy * (CORRIDOR_HALF_W + 1.0 + ROOM_SIZE / 2.0)
        h = ROOM_SIZE / 2.0
        ring = [(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h), (cx - h, cy + h)]
        rows.append({"tile_id": tid, "venue": venue,
                     "ring": [{"x": float(x), "y": float(y)} for x, y in ring],
                     "kind": "room"})
        tid += 1
    return pd.DataFrame(rows)


def all_tiles(n_venues: int) -> pd.DataFrame:
    parts = []
    for v in range(n_venues):
        vx = (v % 10) * VENUE_PITCH
        vy = (v // 10) * VENUE_PITCH
        parts.append(venue_tiles(vx, vy, v))
    return pd.concat(parts, ignore_index=True)


# -------------------------------------------------------------------- walks

def gen_walk(venue: int, walk: int, seed: int, hot: bool) -> np.ndarray:
    """One noisy corridor walk → (n,2) float64 points, quantized to 1e-6 m
    (the %.6f print precision, so parse(format(p)) == p exactly)."""
    rng = np.random.default_rng([seed, venue, walk])
    nodes = venue_nodes((venue % 10) * VENUE_PITCH, (venue // 10) * VENUE_PITCH)
    adj: dict[int, list[int]] = {}
    for a, b in venue_edges():
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    center = 4  # node (1,1)
    if hot and rng.random() < 0.30:
        cur = int(rng.choice(adj[center]))
        path = [cur, center]
        cur = center
    else:
        cur = int(rng.integers(0, 9))
        path = [cur]
    n_moves = int(rng.integers(2, 5))
    while len(path) < n_moves + 1:
        choices = [n for n in adj[cur] if len(path) < 2 or n != path[-2]]
        if not choices:
            choices = adj[cur]
        cur = int(rng.choice(choices))
        path.append(cur)
    pts = []
    for k in range(len(path) - 1):
        p0 = nodes[path[k]]
        p1 = nodes[path[k + 1]]
        seg_len = float(np.hypot(*(p1 - p0)))
        n_steps = int(seg_len / STEP)
        ts = np.arange(n_steps) / max(n_steps, 1)
        pts.append(p0[None, :] + ts[:, None] * (p1 - p0)[None, :])
    pts.append(nodes[path[-1]][None, :])
    walk_pts = np.concatenate(pts, axis=0)
    walk_pts = walk_pts + rng.normal(0.0, SIGMA, size=walk_pts.shape)
    return np.round(walk_pts, 6)


def format_traj_lines(traj_id: int, pts: np.ndarray, t0: pd.Timestamp) -> str:
    lines = []
    for seq in range(pts.shape[0]):
        ts = (t0 + pd.Timedelta(seconds=seq)).strftime("%Y-%m-%dT%H:%M:%SZ")
        lines.append(f"TRAJ {traj_id} {seq} {pts[seq, 0]:.6f} {pts[seq, 1]:.6f} {ts}")
    return "\n".join(lines)


# -------------------------------------------------------------------- pages

def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _make_html(title: str, prose: str, traj_block: str | None) -> bytes:
    head = f'<html><head><meta charset="utf-8"></head><body><h1>{_esc(title)}</h1>\n'
    body = f"<p>{_esc(prose)}</p>\n"
    if traj_block is not None:
        body += f'<pre data-traj="1">{_esc(traj_block)}\n</pre>'
    return (head + body + "</body></html>").encode("utf-8")


def _make_text(title: str, prose: str, traj_block: str | None) -> str:
    out = f"{title}\n{prose}\n"
    if traj_block is not None:
        out += f"{traj_block}\n"
    return out


def n_pages_for_sf(sf: float) -> int:
    return int(round(sf * 500_000))


def gen_pages(sf: float = 0.001, seed: int = 42, hot: bool = False) -> pd.DataFrame:
    """The pages corpus: columns (url, warc_ts, html, text, lang)."""
    n_pages = n_pages_for_sf(sf)
    rows = []
    for p in range(n_pages):
        venue = p // PAGES_PER_VENUE
        slot = p % PAGES_PER_VENUE
        rng = np.random.default_rng([seed, 7, p])
        lang = "en" if rng.random() < 0.90 else LANGS[int(rng.integers(0, 3))]
        has_walk = (slot % WALK_EVERY == 0) and lang == "en"
        url = f"https://fixture.test/venue{venue}/walk{slot}"
        warc_ts = BASE_TS + pd.Timedelta(seconds=int(p) * 7 + 3600)
        title = f"Venue {venue} trace {slot}"
        prose = (f"Crowd-sourced indoor traces & signal logs for <venue {venue}>, "
                 f"page {slot}; corridors 2m wide, grid 3x3.")
        traj_block = None
        if has_walk:
            walk = slot // WALK_EVERY
            traj_id = venue * 10_000 + walk
            pts = gen_walk(venue, walk, seed, hot)
            traj_block = format_traj_lines(traj_id, pts, warc_ts)
        html = _make_html(title, prose, traj_block)
        text = _make_text(title, prose, traj_block)
        rows.append((url, warc_ts, html, text, lang))
        # ~5% stale duplicates: older warc_ts, truncated content
        if rng.random() < 0.05:
            old_ts = warc_ts - pd.Timedelta(days=30)
            old_block = None
            if traj_block is not None:
                lines = traj_block.split("\n")
                old_block = "\n".join(lines[: max(2, len(lines) // 2)])
            old_prose = prose + " (early crawl)"
            rows.append((url, old_ts, _make_html(title, old_prose, old_block),
                         _make_text(title, old_prose, old_block), lang))
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    return df


def truth_points(sf: float = 0.001, seed: int = 42, hot: bool = False) -> pd.DataFrame:
    """Ground-truth points table (what parse_points must recover from the
    deduped, lang-filtered corpus): (traj_id, seq, x, y, t, url)."""
    n_pages = n_pages_for_sf(sf)
    rows = []
    for p in range(n_pages):
        venue = p // PAGES_PER_VENUE
        slot = p % PAGES_PER_VENUE
        rng = np.random.default_rng([seed, 7, p])
        lang = "en" if rng.random() < 0.90 else LANGS[int(rng.integers(0, 3))]
        if not ((slot % WALK_EVERY == 0) and lang == "en"):
            continue
        url = f"https://fixture.test/venue{venue}/walk{slot}"
        warc_ts = BASE_TS + pd.Timedelta(seconds=int(p) * 7 + 3600)
        walk = slot // WALK_EVERY
        traj_id = venue * 10_000 + walk
        pts = gen_walk(venue, walk, seed, hot)
        for seq in range(pts.shape[0]):
            rows.append((traj_id, seq, pts[seq, 0], pts[seq, 1],
                         warc_ts + pd.Timedelta(seconds=seq), url))
    return pd.DataFrame(rows, columns=["traj_id", "seq", "x", "y", "t", "url"])


def write_pages_parquet(out_dir: str, sf: float = 0.001, seed: int = 42,
                        hot: bool = False) -> str:
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    df = gen_pages(sf, seed, hot)
    schema = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ])
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    path = os.path.join(out_dir, "pages.parquet")
    # small row groups: Spark's scan splits on row-group boundaries — a
    # single-row-group file forces the whole scan (and any map-side UDF
    # before the first shuffle) onto one task at any cluster size
    pq.write_table(table, path, row_group_size=4096)
    return path


def ensure_pages(sf: float = 0.001, seed: int = 42, hot: bool = False,
                 root: str | None = None) -> str:
    """Generate-if-missing cache of the pages fixture; returns parquet path."""
    import os

    root = root or os.path.join(os.path.dirname(__file__), "data")
    tag = (f"v{GEN_VERSION}_sf{sf}" + ("_hot" if hot else "")
           + (f"_s{seed}" if seed != 42 else ""))
    out_dir = os.path.join(root, tag)
    path = os.path.join(out_dir, "pages.parquet")
    if not os.path.exists(path):
        write_pages_parquet(out_dir, sf, seed, hot)
    return path


if __name__ == "__main__":
    import sys

    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.001
    hot = len(sys.argv) > 2 and sys.argv[2] == "hot"
    print(ensure_pages(sf=sf, hot=hot))
