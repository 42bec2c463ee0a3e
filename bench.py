"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

MEDIAN-OF-N protocol (default N=3, $IMC_BENCH_REPS): the whole suite runs
N times in one session and each query reports its MEDIAN wall time — this
box's single-shot timings wobble ±15-30%, which round 2 showed is enough
to manufacture phantom regressions. Per-query spread ((max−min)/median)
is reported alongside so a real regression is distinguishable from noise.

ADAPTIVE REPS (r5, VERDICT r04 #8): when any query's spread exceeds
$IMC_BENCH_SPREAD_PCT (default 20) after the base reps, up to
$IMC_BENCH_MAX_EXTRA (default 2) EXTRA full passes run; medians are
recomputed over all passes. With ≥5 samples the reported spread is
TRIMMED — global min and max dropped — so one box hiccup doesn't read
as steady-state jitter (raw max−min can only grow with more samples);
"spread_trimmed": true marks when trimming applied.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec (median reps)>, "unit": "sec",
   "queries": {name: median sec, ...}, "spread_pct": {name: pct, ...},
   "reps": N, "sf": <sf>, "headline_rows": R, "headline_rows_per_sec": R,
   "cpus": C}

The headline metric (BASELINE.json) is spatial-join + tile-assignment
rows/sec: (eps_pairs rows + tile_assignment rows) / (t_eps + t_tile),
computed from the medians. BENCH/scaling.py runs this at two parallelism
levels for the ≥0.8 scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    shuffle_parts = os.environ.get("IMC_SHUFFLE_PARTITIONS", str(max(2 * cpus, 16)))
    return (SparkSession.builder
            .master(f"local[{cpus}]")
            .appName("imc-bench")
            .config("spark.sql.shuffle.partitions", shuffle_parts)
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
            .config("spark.driver.memory", os.environ.get("IMC_DRIVER_MEM", "24g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def run_suite(spark, sf_dir: str, pages_path: str, pages_sf: float):
    """One full pass over every benched query; returns (timings, counts)."""
    from fixtures import gen_pages
    from imc import (corridors, dbscan, extract, joins, raster, segments,
                     similarity, sweep, textops)
    from imc.config import IMCParams

    params = IMCParams(eps=1.2, min_lns=3)
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        n = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        counts[name] = n
        return n

    pages = spark.read.parquet(pages_path)

    # ingest: filter → dedupe → extract → parse → explode (cached: the MDL
    # stage consumes the same points without re-running the UDF chain)
    points = extract.pages_to_points(pages).cache()
    timed("ingest_points", lambda: points.count())

    # MDL partitioning (materialized — everything downstream reuses it)
    seg_path = os.path.join(os.path.dirname(pages_path),
                            "bench_segments.parquet")
    def build_segments():
        segments.mdl_segments(points).write.mode("overwrite").parquet(seg_path)
        return spark.read.parquet(seg_path).count()
    timed("mdl_segments", build_segments)
    segs = spark.read.parquet(seg_path)

    # THE headline pair: ε-join + tile assignment
    pairs = joins.eps_join(segs, params)
    timed("eps_join", lambda: pairs.count())
    n_venues = max(1, gen_pages.n_pages_for_sf(pages_sf) // gen_pages.PAGES_PER_VENUE)
    tiles = gen_pages.all_tiles(n_venues)
    timed("tile_assign", lambda: joins.tile_assignments(segs, tiles).count())

    # clustering + sweep
    pairs_path = os.path.join(os.path.dirname(pages_path), "bench_pairs.parquet")
    pairs.write.mode("overwrite").parquet(pairs_path)
    pairs_m = spark.read.parquet(pairs_path)
    assign = dbscan.dbscan(segs, pairs_m, params)
    assign_path = os.path.join(os.path.dirname(pages_path), "bench_assign.parquet")
    def run_dbscan():
        assign.write.mode("overwrite").parquet(assign_path)
        return spark.read.parquet(assign_path).count()
    timed("dbscan", run_dbscan)
    assign_m = spark.read.parquet(assign_path)
    timed("sweep", lambda: sweep.representative_trajectories(segs, assign_m, params).count())
    timed("corridors", lambda: corridors.corridor_polygons(segs, assign_m, params).count())

    # raster → polygons
    rast = raster.rasterize(segs, params)
    timed("raster_polygons",
          lambda: raster.extract_polygons(rast, params).count())

    # web-corpus training-data ops on driver tables
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    timed("dedup_lsh", lambda: textops.lsh_dup_pairs(docs).count())
    timed("dedup_simhash", lambda: textops.simhash_near_pairs(docs).count())
    # the operational end of the dedup ladder: LSH candidates → exact
    # Jaccard verify → connected components → keeper/purge labels (added
    # to the bench set r5 — its iterative CC is the one multi-round
    # corpus op, worth a baseline row of its own)
    timed("dedup_clusters", lambda: textops.dedup_clusters(docs).count())
    timed("text_quality", lambda: textops.quality_scores(docs).count())
    # r5 corpus-assembly representative: concat-then-chunk sequence
    # packing — the two-level distributed prefix sum (block window +
    # tiny block-offset join, no single-partition window)
    timed("text_pack", lambda: textops.pack_sequences(docs).count())
    # late-r5 heavy-hitter op: token explode → partial-agg shuffle →
    # sharded two-phase top-k (the vocabulary-audit workload)
    timed("text_top_terms", lambda: textops.top_terms(docs).count())
    # r6: the three round-6-reshaped ops get baseline rows of their own —
    # adaptive-block corpus mixing (per-source prefix sum), histogram-exact
    # per-language length quantiles, salted cross-doc boilerplate removal
    timed("text_mix", lambda: textops.corpus_mix(docs, 1e6).count())
    timed("text_quantiles", lambda: textops.length_quantiles(docs).count())
    timed("text_boilerplate",
          lambda: textops.boilerplate_scrub(docs).count())
    # r6: exact-substring dedup pair — positional spans and the
    # keep-first scrub (explode-heavy: ~1 row/token, the inherent cost)
    timed("text_dup_spans",
          lambda: textops.substring_dup_spans(docs).count())
    timed("text_scrub_substr",
          lambda: textops.substring_scrub(docs).count())
    timed("ann_topk", lambda: similarity.ann_topk_bruteforce(emb, 5, 50).count())
    timed("ann_lsh_multi",
          lambda: similarity.ann_topk_lsh_multi(emb, 5, 50).count())
    timed("ann_ivf", lambda: similarity.ann_topk_ivf(emb, 5, 50).count())
    # r6: PQ/ADC with exact refine — the byte-compressed scan leg
    timed("ann_pq", lambda: similarity.ann_topk_pq(emb, 5, 50).count())

    points.unpersist()
    return timings, counts


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    hot = os.environ.get("IMC_BENCH_HOT", "0") == "1"
    reps = max(1, int(os.environ.get("IMC_BENCH_REPS", "3")))

    from fixtures import gen_pages

    base = os.path.basename(sf_dir.rstrip("/"))
    sf = float(base.replace("sf", "")) if base.startswith("sf") else 0.1
    # the pages-corpus scale can exceed the driver-table scale (scaling runs
    # use a larger corpus so compute dominates fixed per-job latencies)
    pages_sf = float(os.environ.get("IMC_PAGES_SF", str(sf)))

    # pre-generate fixture outside the timed region (driver testdata is
    # read-only; the pages corpus is derived deterministically at this sf)
    pages_path = gen_pages.ensure_pages(sf=pages_sf, hot=hot)

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    warmup = int(os.environ.get("IMC_BENCH_WARMUP", "1"))
    for _ in range(warmup):
        # untimed: JVM/codegen warmup + OS page cache, so the measured
        # reps (and their spread) reflect steady state, not first-run cost
        run_suite(spark, sf_dir, pages_path, pages_sf)
    runs = [run_suite(spark, sf_dir, pages_path, pages_sf)
            for _ in range(reps)]
    names = list(runs[0][0])

    def raw_spread(n):
        ts = [r[0][n] for r in runs]
        return 100.0 * (max(ts) - min(ts)) / max(statistics.median(ts), 1e-9)

    # adaptive extra passes when any query is noisy (r5): one decision
    # after the base reps, not a per-pass re-check — raw max−min can only
    # grow as runs append, so re-evaluating it each pass was dead logic
    # (review r5); the extra samples exist to make the trimmed median
    # robust, and trimming needs all of them anyway
    spread_limit = float(os.environ.get("IMC_BENCH_SPREAD_PCT", "20"))
    max_extra = int(os.environ.get("IMC_BENCH_MAX_EXTRA", "2"))
    if reps > 1 and any(raw_spread(n) > spread_limit for n in names):
        for _ in range(max_extra):
            runs.append(run_suite(spark, sf_dir, pages_path, pages_sf))

    trimmed = len(runs) >= 5
    timings = {n: round(statistics.median(r[0][n] for r in runs), 3)
               for n in names}

    def spread_pct(n):
        ts = sorted(r[0][n] for r in runs)
        if trimmed:
            ts = ts[1:-1]  # drop the global min/max box hiccups
        return round(100.0 * (ts[-1] - ts[0])
                     / max(statistics.median(ts), 1e-9), 1)

    spread = {n: spread_pct(n) for n in names}
    counts = runs[-1][1]

    total = round(sum(timings.values()), 3)
    headline_rows = counts["eps_join"] + counts["tile_assign"]
    headline_t = timings["eps_join"] + timings["tile_assign"]
    out = {
        "metric": "spatial-join + tile-assignment rows/sec "
                  "(full TRACLUS pipeline + corpus ops, wall sec, "
                  f"median of {len(runs)})",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread_pct": spread,
        "spread_trimmed": trimmed,
        "reps": len(runs),
        "reps_base": reps,
        "warmup": warmup,
        "sf": sf,
        "pages_sf": pages_sf,
        "cpus": cpus,
        "hot": hot,
        "rows": counts,
        "headline_rows": headline_rows,
        "headline_rows_per_sec": round(headline_rows / max(headline_t, 1e-9), 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
