"""Headline-operator scaling at compute-dominated scale.

The full-pipeline suite (BENCH/scaling.py) times 10 stages of 5-18 s each;
2-4 s of fixed per-stage latency (job scheduling, Python-worker ramp, AQE
re-planning) caps its measurable efficiency well below the engine's true
scaling. This harness isolates the HEADLINE operator (ε-join + tile
assignment — the BASELINE.json metric) on a 4× larger corpus (default
sf2.0 ≈ 1.5M segments, ~8M join rows) with cached input and warm workers,
best-of-2 per level — the regime a 100 TB run lives in, where stages are
minutes-to-hours and fixed latency is noise.

Appends a section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("IMC_HEADLINE_SF", "2.0")
# IMC_HEADLINE_HOT=1 → the hot-skew fixture (~30% of walks through one
# junction): the adversarial-skew evidence at compute-dominated scale
# (VERDICT r03 #6) — salting + AQE must hold efficiency near the base row
HOT = os.environ.get("IMC_HEADLINE_HOT", "") == "1"
N_LO = int(os.environ.get("IMC_SCALING_N", "4"))
# best-of-REPS per level; raise on noisy boxes
REPS = int(os.environ.get("IMC_HEADLINE_REPS", "2"))
N_HI = 4 * N_LO

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from fixtures import gen_pages
from imc import joins
from imc.config import IMCParams

cpus = int(sys.argv[1])
seg_path = sys.argv[2]
s = (SparkSession.builder.master(f"local[{cpus}]")
     .config("spark.sql.shuffle.partitions", "64")
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
     .config("spark.driver.memory", "24g")
     .config("spark.ui.enabled", "false").getOrCreate())
s.sparkContext.setLogLevel("ERROR")
segs = s.read.parquet(seg_path)
segs.cache().count()
params = IMCParams(eps=1.2, min_lns=3)
n_venues = max(1, gen_pages.n_pages_for_sf(float(%(sf)r)) // gen_pages.PAGES_PER_VENUE)
tiles = gen_pages.all_tiles(n_venues)
joins.eps_join(segs.limit(3000), params).count()  # warm python workers
best = None
for rep in range(int(%(reps)r)):
    t0 = time.perf_counter()
    n_eps = joins.eps_join(segs, params).count()
    n_tile = joins.tile_assignments(segs, tiles).count()
    dt = time.perf_counter() - t0
    if best is None or dt < best[0]:
        best = (dt, n_eps, n_tile)
print(json.dumps({"cpus": cpus, "sec": round(best[0], 2),
                  "rows": best[1] + best[2],
                  "n_eps": best[1], "n_tile": best[2]}))
s.stop()
""" % {"repo": REPO, "sf": SF, "reps": REPS}


def main():
    sys.path.insert(0, REPO)
    from fixtures import gen_pages
    pages_path = gen_pages.ensure_pages(sf=float(SF), hot=HOT)
    seg_path = os.path.join(os.path.dirname(pages_path), "bench_segments.parquet")
    if not os.path.exists(os.path.join(seg_path, "_SUCCESS")):
        print("materializing MDL segments at full parallelism ...", file=sys.stderr)
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from pyspark.sql import SparkSession\n"
            "from imc import extract, segments\n"
            "s = (SparkSession.builder.master('local[32]')"
            ".config('spark.sql.shuffle.partitions','64')"
            ".config('spark.driver.memory','24g')"
            ".config('spark.ui.enabled','false').getOrCreate())\n"
            "s.sparkContext.setLogLevel('ERROR')\n"
            "pts = extract.pages_to_points(s.read.parquet(%r))\n"
            "segments.mdl_segments(pts).write.mode('overwrite').parquet(%r)\n"
            "s.stop()\n" % (REPO, pages_path, seg_path))
        subprocess.run([sys.executable, "-c", code], check=True)

    results = {}
    for cpus in (N_LO, N_HI):
        print(f"headline run at local[{cpus}] ...", file=sys.stderr)
        out = subprocess.run([sys.executable, "-c", WORKER, str(cpus), seg_path],
                             capture_output=True, text=True, check=True)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = results[N_LO], results[N_HI]
    assert lo["rows"] == hi["rows"]
    thr_lo = lo["rows"] / lo["sec"]
    thr_hi = hi["rows"] / hi["sec"]
    eff = round(thr_hi / (4 * thr_lo), 3)

    title = ("## Headline operator at compute-dominated scale"
             + (" (hot-skew fixture)" if HOT else ""))
    intro = (
        [f"The SAME headline pair on the hot-skew sf{SF} corpus (~30% of",
         "walks through one junction — the hot ε-join cells the salting +",
         "AQE path exists for). Efficiency within ~0.1 of the base row",
         "above = the skew protection holds at compute-dominated scale:"]
        if HOT else
        [f"ε-join + tile assignment alone on a 4× corpus (pages sf{SF}: "
         f"{lo['n_eps']} join rows + {lo['n_tile']} tile rows), cached input,",
         f"warm Python workers, best-of-{REPS} — the regime a 100 TB stage runs in",
         "(minutes-to-hours of compute; per-job fixed latency is noise):"])
    lines = [
        "",
        title,
        "",
        *intro,
        "",
        f"| level | wall s | rows/s |",
        f"|---|---|---|",
        f"| local[{N_LO}] | {lo['sec']} | {round(thr_lo, 1)} |",
        f"| local[{N_HI}] | {hi['sec']} | {round(thr_hi, 1)} |",
        "",
        f"**Headline scaling efficiency: {eff}** (raw; ÷ the measured hardware",
        f"ceiling in the 'Platform scaling ceilings' section for the",
        f"engine-attributable number).",
        "",
    ]
    from _md import replace_section
    replace_section(title, lines)
    print(json.dumps({"headline_efficiency": eff, "hot": HOT,
                      "lo": lo, "hi": hi}))


if __name__ == "__main__":
    main()
