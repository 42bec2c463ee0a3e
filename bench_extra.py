"""Round-7 optimization measurement harness (bench.py is FROZEN — this
file owns the extra instrumentation the optimization guide §1 asks for).

Per-query isolation: each query runs alone, labelled with
setJobDescription, timed over N reps with BOTH the frozen-bench
methodology (.count()) and the noop sink (computes every column —
guide §1.4), and its .explain("formatted") can be dumped to
plans/r07/<name>_{before,after}.txt.

Usage:
  python bench_extra.py [--reps N] [--warmup N] [--plan-tag before|after]
                        [--noop] [name ...]
Defaults: reps=3, warmup=1, count-based timing (bench parity), all
queries. Plans are only written when --plan-tag is given.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_spark  # same session config as the frozen bench


def _registry(spark, sf_dir: str, pages_sf: float):
    """name -> zero-arg builder returning the query DataFrame. Mirrors
    bench.run_suite's per-query inputs (same parquet inputs, same
    params) but each entry is independently buildable."""
    from fixtures import gen_pages
    from imc import (corridors, dbscan, extract, joins, raster, segments,
                     similarity, sweep, textops)
    from imc.config import IMCParams

    params = IMCParams(eps=1.2, min_lns=3)
    pages_path = gen_pages.ensure_pages(sf=pages_sf, hot=False)
    pages = spark.read.parquet(pages_path)
    seg_path = os.path.join(os.path.dirname(pages_path),
                            "bench_segments.parquet")
    pairs_path = os.path.join(os.path.dirname(pages_path),
                              "bench_pairs.parquet")
    assign_path = os.path.join(os.path.dirname(pages_path),
                               "bench_assign.parquet")

    def _segs():
        if not os.path.exists(os.path.join(seg_path, "_SUCCESS")):
            segments.mdl_segments(extract.pages_to_points(pages)) \
                .write.mode("overwrite").parquet(seg_path)
        return spark.read.parquet(seg_path)

    def _pairs_m():
        if not os.path.exists(os.path.join(pairs_path, "_SUCCESS")):
            joins.eps_join(_segs(), params).write.mode("overwrite") \
                .parquet(pairs_path)
        return spark.read.parquet(pairs_path)

    def _assign_m():
        if not os.path.exists(os.path.join(assign_path, "_SUCCESS")):
            dbscan.dbscan(_segs(), _pairs_m(), params) \
                .write.mode("overwrite").parquet(assign_path)
        return spark.read.parquet(assign_path)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_venues = max(1, gen_pages.n_pages_for_sf(pages_sf)
                   // gen_pages.PAGES_PER_VENUE)

    return {
        "ingest_points": lambda: extract.pages_to_points(pages),
        "mdl_segments": lambda: segments.mdl_segments(
            extract.pages_to_points(pages)),
        "eps_join": lambda: joins.eps_join(_segs(), params),
        "tile_assign": lambda: joins.tile_assignments(
            _segs(), gen_pages.all_tiles(n_venues)),
        "dbscan": lambda: dbscan.dbscan(_segs(), _pairs_m(), params),
        "sweep": lambda: sweep.representative_trajectories(
            _segs(), _assign_m(), params),
        "corridors": lambda: corridors.corridor_polygons(
            _segs(), _assign_m(), params),
        "raster_polygons": lambda: raster.extract_polygons(
            raster.rasterize(_segs(), params), params),
        "dedup_lsh": lambda: textops.lsh_dup_pairs(docs),
        "dedup_simhash": lambda: textops.simhash_near_pairs(docs),
        "dedup_clusters": lambda: textops.dedup_clusters(docs),
        "text_quality": lambda: textops.quality_scores(docs),
        "text_pack": lambda: textops.pack_sequences(docs),
        "text_top_terms": lambda: textops.top_terms(docs),
        "text_mix": lambda: textops.corpus_mix(docs, 1e6),
        "text_quantiles": lambda: textops.length_quantiles(docs),
        "text_boilerplate": lambda: textops.boilerplate_scrub(docs),
        "text_dup_spans": lambda: textops.substring_dup_spans(docs),
        "text_scrub_substr": lambda: textops.substring_scrub(docs),
        "ann_topk": lambda: similarity.ann_topk_bruteforce(emb, 5, 50),
        "ann_lsh_multi": lambda: similarity.ann_topk_lsh_multi(emb, 5, 50),
        "ann_ivf": lambda: similarity.ann_topk_ivf(emb, 5, 50),
        "ann_pq": lambda: similarity.ann_topk_pq(emb, 5, 50),
    }


def main():
    args = sys.argv[1:]

    def _opt(flag, default=None, has_val=True):
        if flag in args:
            i = args.index(flag)
            args.pop(i)
            return args.pop(i) if has_val else True
        return default

    reps = int(_opt("--reps", "3"))
    warmup = int(_opt("--warmup", "1"))
    plan_tag = _opt("--plan-tag")
    use_noop = bool(_opt("--noop", False, has_val=False))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.path.basename(sf_dir.rstrip("/"))
    sf = float(base.replace("sf", "")) if base.startswith("sf") else 0.1
    pages_sf = float(os.environ.get("IMC_PAGES_SF", str(sf)))

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = _registry(spark, sf_dir, pages_sf)
    names = args or list(reg)

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r07")
    if plan_tag:
        os.makedirs(plans_dir, exist_ok=True)

    # bench.py builds these OUTSIDE its timed lambda (eps_join counts a
    # pre-built frame; dbscan's CC loop runs eagerly at construction) —
    # mirror that so per-query numbers are comparable to the frozen bench
    outside_build = {"eps_join", "dbscan"}

    out = {}
    for name in names:
        build = reg[name]
        if plan_tag:
            mode = (spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))
            txt = build()._jdf.queryExecution().explainString(mode)
            with open(os.path.join(plans_dir, f"{name}_{plan_tag}.txt"),
                      "w") as f:
                f.write(txt)
        if reps == 0:
            continue
        ts = []
        for i in range(warmup + reps):
            spark.sparkContext.setJobDescription(f"r07:{name}:rep{i}")
            # build INSIDE the timed region — the frozen bench times
            # `fn()` including operator construction, and some operators
            # do eager work there (CC rounds, hot-cell sampling) —
            # except the outside_build set (see above)
            if name in outside_build:
                df = build()
                t0 = time.perf_counter()
            else:
                t0 = time.perf_counter()
                df = build()
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            if i >= warmup:
                ts.append(dt)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"median": round(statistics.median(ts), 3),
                     "min": round(min(ts), 3),
                     "samples": [round(t, 3) for t in ts]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {n: v["median"] for n, v in out.items()},
                      "mode": "noop" if use_noop else "count",
                      "sf": sf, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
