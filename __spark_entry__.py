"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query groups (SURVEY.md §2 coverage):
  * imc_*       — the TRACLUS spatial pipeline operators on the synthetic
                  pages corpus (fixtures/gen_pages.py, derived from sf_dir's
                  scale). EVERY query is DuckDB-oracled (r3): the round-2
                  "sequential geometry isn't SQL" claim fell to one trick,
                  sequential-to-set-wise factoring — precompute every
                  possible step's decision set-wise, then replay the
                  recurrence with a recursive CTE over pure transitions:
                    - imc_segments: the MDL walk (_mdl_walk_sql);
                    - imc_rep_points / imc_corridors: the γ-gap sweep
                      (_sweep_walk_sql) + spread quantiles;
                    - imc_assignments: DBSCAN via recursive min-label CC;
                    - imc_raster: generate_series supercover (_raster_sql);
                    - imc_polygons: boundary-stitch loops as cycles of a
                      PURE per-edge successor (the left-most-turn rule
                      pairs junction edges deterministically), run-based
                      cell CC, integer shoelace orientation.
                  Full ring/polyline COORDINATE exactness additionally
                  stays golden-gated (tests/test_golden.py) — the oracle
                  frames for corridors/polygons compare width/orientation/
                  vertex counts, which pin every stitch decision.
  * dedup_* / text_* / media_* / ann_* — web-corpus training-data ops over
                  the driver's documents/embeddings tables, each with an
                  exactly-matching DuckDB oracle.
  * rel_*       — relational primitives the pipeline relies on (window
                  sequencing, hash aggregation, joins), oracled.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fixtures import gen_pages  # noqa: E402
from imc import (corridors, dbscan, extract, joins, multimodal,  # noqa: E402
                 params_search, quality, raster, segments, similarity,
                 sweep, textops)
from imc.config import VENUE_STRIDE, IMCParams  # noqa: E402

PARAMS = IMCParams(eps=1.2, min_lns=3)
# candidate ε values of the parameter-search query (shared by the Spark
# query and its DuckDB oracle so the two stay in lockstep)
_ENTROPY_EPS = [0.6, 1.2, 2.4]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else 0.01


def _fixture_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(gen_pages.ensure_pages(sf=_sf_of(sf_dir)))


def _seg_cache_name() -> str:
    # cache keyed by the params hash: a changed PARAMS (or any config field)
    # must regenerate the derived fixtures instead of silently serving
    # results computed under the old configuration
    return f"segments_{PARAMS.params_hash()}.parquet"


def _assign_cache_name() -> str:
    return f"assignments_{PARAMS.params_hash()}.parquet"


def _fixture_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDL segments for the fixture corpus, cached as parquet next to the
    pages fixture (deterministic content; several queries() entries share
    this prefix, and the driver runs them in separate actions)."""
    pages_path = gen_pages.ensure_pages(sf=_sf_of(sf_dir))
    seg_path = os.path.join(os.path.dirname(pages_path), _seg_cache_name())
    if not os.path.exists(seg_path):
        pts = extract.pages_to_points(spark.read.parquet(pages_path))
        segments.mdl_segments(pts).write.mode("overwrite").parquet(seg_path)
    return spark.read.parquet(seg_path)


def _fixture_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN assignments for the fixture corpus, cached as parquet next to
    the segments fixture (deterministic; shared by several queries() and
    by the qmeasure oracle)."""
    pages_path = gen_pages.ensure_pages(sf=_sf_of(sf_dir))
    a_path = os.path.join(os.path.dirname(pages_path), _assign_cache_name())
    if not os.path.exists(a_path):
        segs = _fixture_segments(spark, sf_dir)
        segs.cache()
        (dbscan.dbscan(segs, joins.eps_join(segs, PARAMS), PARAMS)
         .write.mode("overwrite").parquet(a_path))
    return spark.read.parquet(a_path)


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the headline spatial-join + tile-assignment rows at
    sf0.001 — ε-pairs annotated with both segments' map tiles."""
    sf_dir = "/root/testdata/sf0.001"
    segs = _fixture_segments(spark, sf_dir)
    segs.cache()
    pairs = joins.eps_join(segs, PARAMS)
    tiles = gen_pages.all_tiles(max(1, gen_pages.n_pages_for_sf(_sf_of(sf_dir))
                                    // gen_pages.PAGES_PER_VENUE))
    ta = joins.tile_assignments(segs, tiles)
    return (pairs
            .join(ta.withColumnRenamed("seg_id", "a_seg")
                    .withColumnRenamed("tile_id", "a_tile"), "a_seg")
            .join(ta.withColumnRenamed("seg_id", "b_seg")
                    .withColumnRenamed("tile_id", "b_tile"), "b_seg")
            .select("a_seg", "b_seg", "dist", "a_tile", "b_tile"))


# --------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- TRACLUS pipeline ----
    # DuckDB-oracled where ANSI-SQL-expressible (extraction, parsing, the
    # ε/kNN joins via crossJoin arithmetic, ray-crossing PIP); the MDL /
    # DBSCAN / sweep / raster stages are sequential-per-group geometry —
    # rows-only here, exactness gated by the committed goldens instead.
    def imc_points(spark, sf_dir):
        # t (timestamp) is parsed but excluded from the comparison frame:
        # cross-engine timestamp value hashing is timezone-fragile, and the
        # t-parse is covered by tests/test_extract.py equivalence gates
        return (extract.pages_to_points(_fixture_pages(spark, sf_dir))
                .select("traj_id", "seq", "x", "y", "url"))

    def imc_text_sha(spark, sf_dir):
        return extract.text_sha(_fixture_pages(spark, sf_dir))

    def imc_segments(spark, sf_dir):
        # len/angle are one-expression builtins over the endpoints
        # (hypot/atan2, unit-tested); the comparison frame carries the
        # decision-bearing columns — the endpoints ARE the MDL output
        return _fixture_segments(spark, sf_dir).select(
            "seg_id", "traj_id", "x1", "y1", "x2", "y2")

    def imc_eps_pairs(spark, sf_dir):
        # dist rounded to 6 in the comparison frame only (the pipeline and
        # goldens keep full precision): DuckDB computes the same float64
        # formula via a different expression tree, equal to ~1e-15
        return (joins.eps_join(_fixture_segments(spark, sf_dir), PARAMS)
                .select("a_seg", "b_seg", F.round("dist", 6).alias("dist")))

    def imc_eps_pairs_hausdorff(spark, sf_dir):
        # the SAME ε-join operator under its second metric ([B]:6 "exact
        # Hausdorff/perpendicular-parallel-angular distance refine") —
        # prefilter completeness holds a fortiori (H ≥ euclidean gap)
        return (joins.eps_join(_fixture_segments(spark, sf_dir), PARAMS,
                               metric="hausdorff")
                .select("a_seg", "b_seg", F.round("dist", 6).alias("dist")))

    def imc_knn(spark, sf_dir):
        segs = _fixture_segments(spark, sf_dir)
        # the oracle computes EXACT kNN and asserts settled=true for every
        # row — so a fixture probe silently truncated at R_max would
        # hash-mismatch (the r5 settled flag is itself under the gate)
        return (joins.knn_join(segs, segs, k=3, params=PARAMS)
                .select("a_seg", "b_seg", F.round("dist", 6).alias("dist"),
                        "rank", "settled"))

    def imc_assignments(spark, sf_dir):
        return _fixture_assignments(spark, sf_dir)

    def imc_rep_points(spark, sf_dir):
        # x/y rounded to 6 in the comparison frame only: both engines
        # rotate through cluster-direction cosines whose last-ulp differs
        # (sum order), so raw doubles differ ~1e-13 — same pattern as
        # imc_eps_pairs' dist column
        return (sweep.representative_trajectories(
                    _fixture_segments(spark, sf_dir),
                    _fixture_assignments(spark, sf_dir), PARAMS)
                .select("cluster_id", "pt_seq",
                        F.round("x", 6).alias("x"), F.round("y", 6).alias("y")))

    def imc_qmeasure(spark, sf_dir):
        # TRACLUS clustering-quality metric ([T] §6.2): per-cluster SSE
        return quality.cluster_sse(_fixture_segments(spark, sf_dir),
                                   _fixture_assignments(spark, sf_dir), PARAMS)

    def imc_tile_assignments(spark, sf_dir):
        segs = _fixture_segments(spark, sf_dir)
        n_venues = max(1, gen_pages.n_pages_for_sf(_sf_of(sf_dir))
                       // gen_pages.PAGES_PER_VENUE)
        return joins.tile_assignments(segs, gen_pages.all_tiles(n_venues))

    def imc_corridors(spark, sf_dir):
        # comparison frame: width + vertex count. Neither needs the miter
        # geometry itself — width is a median of per-point 0.9-quantile
        # crossing spreads (sweep state, SQL-able) and the offset ring
        # always carries exactly 2 x (deduped sweep points) vertices —
        # so this IS hash-exact-oracle-able; ring coordinate exactness
        # stays pytest-gated (tests/test_corridors.py shape invariants)
        segs = _fixture_segments(spark, sf_dir)
        assign = _fixture_assignments(spark, sf_dir)
        return (corridors.corridor_polygons(segs, assign, PARAMS)
                .select("cluster_id",
                        F.round("width", 6).alias("width"),
                        F.size("ring").cast("long").alias("n_vertices")))

    def imc_param_entropy(spark, sf_dir):
        # ε-entropy parameter search table ([T] §4.4): one row per
        # candidate ε with the neighborhood entropy and mean |Nε|
        segs = _fixture_segments(spark, sf_dir)
        segs.cache()
        res = params_search.search_eps(segs, _ENTROPY_EPS, PARAMS)
        rows = [(float(e), float(round(h, 6)), float(round(a, 6)))
                for e, h, a in res["table"]]
        return spark.createDataFrame(rows, "eps double, entropy double, avg_n double")

    def imc_raster(spark, sf_dir):
        return raster.rasterize(_fixture_segments(spark, sf_dir), PARAMS)

    def imc_polygons(spark, sf_dir):
        rast = raster.rasterize(_fixture_segments(spark, sf_dir), PARAMS)
        return (raster.extract_polygons(rast, PARAMS)
                .select("venue", "poly_id", "is_outer",
                        F.size("ring").cast("long").alias("n_vertices")))

    q.update(imc_points=imc_points, imc_text_sha=imc_text_sha,
             imc_segments=imc_segments, imc_eps_pairs=imc_eps_pairs,
             imc_eps_pairs_hausdorff=imc_eps_pairs_hausdorff,
             imc_knn=imc_knn, imc_assignments=imc_assignments,
             imc_rep_points=imc_rep_points,
             imc_tile_assignments=imc_tile_assignments,
             imc_raster=imc_raster, imc_polygons=imc_polygons,
             imc_corridors=imc_corridors,
             imc_param_entropy=imc_param_entropy,
             imc_qmeasure=imc_qmeasure)

    # ---- web-corpus training-data ops (DuckDB-oracled) ----
    def dedup_exact(spark, sf_dir):
        return textops.exact_dedup(_tbl(spark, sf_dir, "documents"))

    def dedup_minhash_sigs(spark, sf_dir):
        return textops.minhash_signatures(_tbl(spark, sf_dir, "documents"))

    def dedup_lsh_pairs(spark, sf_dir):
        return textops.lsh_dup_pairs(_tbl(spark, sf_dir, "documents"))

    def dedup_jaccard_pairs(spark, sf_dir):
        return textops.ngram_jaccard_pairs(_tbl(spark, sf_dir, "documents"), 0.7)

    def dedup_simhash(spark, sf_dir):  # rows-only (python hash loop)
        return textops.simhash_fingerprints(_tbl(spark, sf_dir, "documents"))

    def dedup_simhash_pairs(spark, sf_dir):  # rows-only
        return textops.simhash_near_pairs(_tbl(spark, sf_dir, "documents"), 3)

    def text_tokens(spark, sf_dir):
        return textops.token_counts(_tbl(spark, sf_dir, "documents"))

    def text_quality(spark, sf_dir):
        return textops.quality_scores(_tbl(spark, sf_dir, "documents"))

    def text_langid(spark, sf_dir):
        return textops.lang_id(_tbl(spark, sf_dir, "documents"))

    def text_fingerprint(spark, sf_dir):
        return textops.fingerprints(_tbl(spark, sf_dir, "documents"))

    def dedup_clusters(spark, sf_dir):
        # the operational end of the dedup ladder: connected components
        # over the verified Jaccard pairs; purge list = NOT is_keeper
        return textops.dedup_clusters(_tbl(spark, sf_dir, "documents"), 0.7)

    def text_split(spark, sf_dir):
        return textops.train_split(_tbl(spark, sf_dir, "documents"), 10, 10)

    def text_source_quota(spark, sf_dir):
        return textops.source_quota(_tbl(spark, sf_dir, "documents"), 20)

    def text_corpus_stats(spark, sf_dir):
        # corpus composition ROLLUP — the SURVEY §2.5 cube/rollup row
        return textops.corpus_stats(_tbl(spark, sf_dir, "documents"))

    def text_quantiles(spark, sf_dir):
        # exact per-language length percentiles (continuous
        # interpolation, same definition as DuckDB quantile_cont)
        return textops.length_quantiles(_tbl(spark, sf_dir, "documents"))

    def text_top_terms(spark, sf_dir):
        # exact per-language top-10 token heavy hitters via the sharded
        # two-phase top-k (no single per-language vocab task)
        return textops.top_terms(_tbl(spark, sf_dir, "documents"), 10)

    def text_decontaminate(spark, sf_dir):
        # benchmark decontamination (r5): every 37th doc stands in for
        # the eval set; the rest of the corpus is screened against its
        # word-3-gram shingle hashes (broadcast semi-join, never
        # corpus×benchmark)
        docs = _tbl(spark, sf_dir, "documents")
        bench = docs.filter(F.col("doc_id") % 37 == 0)
        return textops.decontaminate(docs.filter(F.col("doc_id") % 37 != 0),
                                     bench)

    def text_pack(spark, sf_dir):
        # concat-then-chunk sequence packing (r5): deterministic stream
        # offsets + chunk ranges via a two-level distributed prefix sum
        return textops.pack_sequences(_tbl(spark, sf_dir, "documents"),
                                      2048)

    def text_pii(spark, sf_dir):
        # PII redaction (r5): counts + redacted-text fingerprint; the
        # oracle reproduces the byte-identical clean_sha
        return textops.pii_scrub(_tbl(spark, sf_dir, "documents"))

    def text_repetition(spark, sf_dir):
        # Gopher-style repetition quality rules (r5)
        return textops.repetition_scores(_tbl(spark, sf_dir, "documents"))

    def text_boilerplate(spark, sf_dir):
        # C4/RefinedWeb-style cross-document boilerplate line removal (r5)
        return textops.boilerplate_scrub(_tbl(spark, sf_dir, "documents"))

    def text_mix(spark, sf_dir):
        # token-budget corpus mixing, uniform weights over sources (r5)
        return textops.corpus_mix(_tbl(spark, sf_dir, "documents"),
                                  budget_tokens=10_000)

    def text_dup_spans(spark, sf_dir):
        # cross-doc exact duplicate substring spans (r6): positional
        # word-8-gram shingle dedup, maximal merged spans
        return textops.substring_dup_spans(_tbl(spark, sf_dir,
                                                "documents"))

    def text_scrub_substr(spark, sf_dir):
        # exact-substring dedup APPLIED (r6): keep-first keeper rule,
        # covered non-keeper tokens cut, doc rebuilt + fingerprinted
        return textops.substring_scrub(_tbl(spark, sf_dir, "documents"))

    def dedup_embcos_clusters(spark, sf_dir):
        # vector twin of dedup_clusters (same τ/bits as embcos pairs)
        return similarity.embedding_dup_clusters(
            _tbl(spark, sf_dir, "embeddings"), threshold=0.45,
            bits=6, tables=4)

    def media_metadata(spark, sf_dir):
        return multimodal.media_metadata(_tbl(spark, sf_dir, "documents"))

    def media_frames(spark, sf_dir):
        return multimodal.media_frame_sample(
            multimodal.documents_as_media(_tbl(spark, sf_dir, "documents")))

    def ann_topk(spark, sf_dir):
        return similarity.ann_topk_bruteforce(_tbl(spark, sf_dir, "embeddings"),
                                              k=5, probe_mod=50)

    def ann_topk_lsh(spark, sf_dir):
        return similarity.ann_topk_lsh(_tbl(spark, sf_dir, "embeddings"),
                                       k=5, probe_mod=50, bits=8)

    def dedup_embcos_pairs(spark, sf_dir):
        # τ=0.45 / 6-bit buckets tuned to the synthetic table's similarity
        # range (max pairwise cos ≈ 0.51 — no planted near-dups); a real
        # corpus uses τ≈0.9 with 16-24 bucket bits
        return similarity.embedding_dup_pairs(_tbl(spark, sf_dir, "embeddings"),
                                              threshold=0.45, bits=6, tables=4)

    def ann_topk_ivf(spark, sf_dir):
        # n_lists sizes the inverted lists (~n/n_lists vectors each);
        # n_probe trades recall for probe cost — a 10^9-row corpus wants
        # n_lists ~ sqrt(n), trained on a bounded sample the same way.
        # r5: the quantizer comes from the WIRED index operator
        # (similarity.ivf_index) — deterministic md5-bucket sample,
        # persisted index manifest, zero-job reload on re-query. At the
        # driver's correctness scale the sample is the full id-sorted
        # table, so the centroids are bit-identical to the oracle's
        # pyarrow-trained literals (_ivf_seeds_sql).
        emb = _tbl(spark, sf_dir, "embeddings")
        idx_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "fixtures", "data",
            "ivf_" + os.path.basename(sf_dir.rstrip("/")))
        # r6: hot_lists rides the same persisted manifest (zero-job
        # load) — salting is output-invariant, so the oracle is untouched
        cents = similarity.ivf_index(emb, idx_dir, _IVF_N_LISTS, _IVF_ITERS)
        return similarity.ann_topk_ivf(
            emb, k=5, probe_mod=50,
            n_lists=_IVF_N_LISTS, n_probe=_IVF_N_PROBE,
            centroids=cents, hot_lists=similarity.ivf_hot_lists(idx_dir))

    def ann_topk_pq(spark, sf_dir):
        # product quantization with asymmetric distance (r6): the third
        # FAISS leg — base vectors compressed to m=8 code bytes, probes
        # score with LUT lookups; codebooks from the WIRED persisted
        # index (pq_index, same fingerprint/zero-job-reload contract as
        # ivf_index); at the driver's correctness scale the training
        # sample is the full id-sorted table, bit-identical to the
        # oracle's pyarrow-trained literals (_pq_codebooks)
        emb = _tbl(spark, sf_dir, "embeddings")
        idx_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "fixtures", "data",
            "pq_" + os.path.basename(sf_dir.rstrip("/")))
        books = similarity.pq_index(emb, idx_dir, _PQ_M, _PQ_K, _IVF_ITERS)
        return similarity.ann_topk_pq(emb, k=5, probe_mod=50,
                                      codebooks=books)

    def ann_topk_lsh_multi(spark, sf_dir):
        # bits sizes bucket occupancy (≈ n/2^bits per table): 12 bits at
        # the 500-row correctness scale; a 10^9-row corpus wants 20-24
        return similarity.ann_topk_lsh_multi(_tbl(spark, sf_dir, "embeddings"),
                                             k=5, probe_mod=50,
                                             bits=12, tables=4)

    q.update(dedup_exact=dedup_exact, dedup_minhash_sigs=dedup_minhash_sigs,
             dedup_lsh_pairs=dedup_lsh_pairs,
             dedup_jaccard_pairs=dedup_jaccard_pairs,
             dedup_simhash=dedup_simhash,
             dedup_simhash_pairs=dedup_simhash_pairs,
             text_tokens=text_tokens, text_quality=text_quality,
             text_langid=text_langid, text_fingerprint=text_fingerprint,
             dedup_clusters=dedup_clusters, text_split=text_split,
             text_source_quota=text_source_quota,
             text_corpus_stats=text_corpus_stats,
             text_quantiles=text_quantiles,
             text_top_terms=text_top_terms,
             text_decontaminate=text_decontaminate, text_pack=text_pack,
             text_pii=text_pii, text_repetition=text_repetition,
             text_boilerplate=text_boilerplate, text_mix=text_mix,
             text_dup_spans=text_dup_spans,
             text_scrub_substr=text_scrub_substr,
             dedup_embcos_clusters=dedup_embcos_clusters,
             media_metadata=media_metadata, media_frames=media_frames,
             ann_topk=ann_topk, ann_topk_lsh=ann_topk_lsh,
             ann_topk_ivf=ann_topk_ivf, ann_topk_pq=ann_topk_pq,
             ann_topk_lsh_multi=ann_topk_lsh_multi,
             dedup_embcos_pairs=dedup_embcos_pairs)

    # ---- relational primitives (DuckDB-oracled) ----
    def rel_event_pairs(spark, sf_dir):
        from pyspark.sql import Window
        ev = _tbl(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (ev.select("user_id", "event_id", "ts",
                          F.lead("event_id").over(w).alias("next_event_id"),
                          F.lead("ts").over(w).alias("next_ts"))
                .filter(F.col("next_event_id").isNotNull())
                .select("user_id", "event_id", "next_event_id",
                        (F.unix_timestamp("next_ts")
                         - F.unix_timestamp("ts")).alias("dt_sec")))

    def rel_pricing_summary(spark, sf_dir):
        li = _tbl(spark, sf_dir, "lineitem")
        return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                     F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                     F.count("*").alias("count_order"))
                .orderBy("l_returnflag", "l_linestatus"))

    def rel_top_customers(spark, sf_dir):
        o = _tbl(spark, sf_dir, "orders")
        c = _tbl(spark, sf_dir, "customer")
        return (o.join(c, o.o_custkey == c.c_custkey)
                .groupBy("c_custkey")
                .agg(F.count("*").alias("n_orders"),
                     F.round(F.sum("o_totalprice"), 2).alias("revenue"))
                .filter(F.col("n_orders") >= 3))

    def rel_shipping_priority(spark, sf_dir):
        # TPC-H Q3 shape: 3-way join, filter both sides, agg, top-k
        c = _tbl(spark, sf_dir, "customer")
        o = _tbl(spark, sf_dir, "orders")
        li = _tbl(spark, sf_dir, "lineitem")
        from pyspark.sql import Window
        rev = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        agg = (c.filter(F.col("c_mktsegment") == "BUILDING")
               .join(o, c.c_custkey == o.o_custkey)
               .join(li, o.o_orderkey == li.l_orderkey)
               .filter((F.col("o_orderdate") < F.lit("1995-03-15"))
                       & (F.col("l_shipdate") > F.lit("1995-03-15")))
               .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
               .agg(rev.alias("revenue")))
        # distributed top-k: orderBy().limit(k) compiles to
        # TakeOrderedAndProject (per-partition partial top-10 + driver
        # merge — no global sort shuffle, no full-table single-partition
        # window); the rank window then runs over just the 10 survivors
        top = agg.orderBy(F.desc("revenue"), "o_orderkey").limit(10)
        w = Window.orderBy(F.desc("revenue"), "o_orderkey")
        return (top.withColumn("rk", F.row_number().over(w))
                .select("o_orderkey",
                        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                        "o_orderpriority", "revenue", F.col("rk").cast("long").alias("rk")))

    def rel_sessions(spark, sf_dir):
        # gap-based sessionization: a >30min silence starts a new session;
        # per session: event count + duration (batch equivalent of the
        # streaming session-window operator)
        from pyspark.sql import Window
        ev = _tbl(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        sessions = (ev
                    .withColumn("_new", F.when(gap.isNull() | (gap > 1800), 1)
                                .otherwise(0))
                    .withColumn("session_no",
                                F.sum("_new").over(
                                    w.rowsBetween(Window.unboundedPreceding, 0))))
        return (sessions.groupBy("user_id", "session_no")
                .agg(F.count("*").alias("n_events"),
                     (F.unix_timestamp(F.max("ts"))
                      - F.unix_timestamp(F.min("ts"))).alias("dur_sec"))
                .select("user_id", F.col("session_no").cast("long").alias("session_no"),
                        "n_events", "dur_sec"))

    def rel_asof(spark, sf_dir):
        # AS-OF (temporal) join: each purchase matched to the latest
        # click AT-OR-BEFORE it by the same user — kdb aj / DuckDB
        # ASOF JOIN semantics, expressed Spark-first as ONE per-user
        # window (union-free: both sides filter from the same table,
        # clicks sort before co-timestamped purchases via _side, and
        # last(ignorenulls) carries the newest click ts forward) — one
        # shuffle, no range-join explosion, no per-row Python. A hot
        # user serializes through one task like any per-key ordered
        # scan; the oracle is DuckDB's NATIVE ASOF LEFT JOIN, so the
        # window rewrite is checked against an independent
        # implementation of the operator, not a SQL twin of itself.
        # ts is TIMESTAMP_NTZ: the matched click is identified by its
        # microsecond-formatted string (tz-free on NTZ) and the gap by
        # an integer-seconds difference (tz offsets cancel — the repo's
        # rel_event_pairs convention); sentinels '' / -1 keep no-match
        # rows str/int64-exact across both engines (pandas would float
        # a nullable BIGINT).
        from pyspark.sql import Window
        ev = (_tbl(spark, sf_dir, "events")
              .where(F.col("event_type").isin("click", "purchase"))
              .withColumn("_side",
                          F.when(F.col("event_type") == "click", F.lit(0))
                          .otherwise(F.lit(1))))
        w = (Window.partitionBy("user_id").orderBy("ts", "_side", "event_id")
             .rowsBetween(Window.unboundedPreceding, 0))
        fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
        click_str = F.when(F.col("_side") == 0, F.date_format("ts", fmt))
        click_sec = F.when(F.col("_side") == 0, F.unix_timestamp("ts"))
        return (ev.withColumn("_click_ts",
                              F.last(click_str, ignorenulls=True).over(w))
                .withColumn("_click_sec",
                            F.last(click_sec, ignorenulls=True).over(w))
                .where(F.col("_side") == 1)
                .select("user_id", "event_id",
                        F.date_format("ts", fmt).alias("ts_str"),
                        F.coalesce(F.col("_click_ts"), F.lit(""))
                        .alias("click_ts"),
                        F.coalesce(F.unix_timestamp("ts")
                                   - F.col("_click_sec"), F.lit(-1))
                        .alias("gap_sec")))

    def rel_hourly(spark, sf_dir):
        # tumbling-window event rollup — the BATCH TWIN of
        # imc/streaming.py's stream_window_counts (same hourly window,
        # same count/sum aggregates), so the streaming operator's
        # semantics have a hash-exact oracle anchor even though the
        # stream itself is not SQL-expressible. win_start as a formatted
        # string (the rel_asof NTZ convention) keeps the hash stable
        # across engines. One partial-agg shuffle on (hour, type) —
        # scale-safe at any corpus size.
        ev = _tbl(spark, sf_dir, "events")
        return (ev.groupBy(
                    F.date_format(F.date_trunc("hour", "ts"),
                                  "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                    "event_type")
                .agg(F.count("*").alias("n_events"),
                     F.round(F.sum("value"), 2).alias("sum_value")))

    def rel_props_json(spark, sf_dir):
        # SEMI-STRUCTURED extraction: events.props is a JSON string;
        # parse with from_json against an explicit schema (a Catalyst
        # JSON expression inside whole-stage codegen — never a Python
        # json.loads UDF) and roll the extracted field up by event_type.
        # The web-scale shape: typed extraction at the scan edge so only
        # the parsed column (not the raw JSON) crosses the shuffle.
        ev = _tbl(spark, sf_dir, "events")
        k = F.from_json("props", "k INT")["k"]
        return (ev.select("event_type", k.alias("_k"))
                .groupBy("event_type")
                .agg(F.count("*").alias("n_events"),
                     F.sum("_k").cast("long").alias("sum_k"),
                     F.min("_k").cast("long").alias("min_k"),
                     F.max("_k").cast("long").alias("max_k")))

    def rel_region_revenue(spark, sf_dir):
        # 5-way snowflake join rollup: revenue by region (broadcast dims)
        r = _tbl(spark, sf_dir, "region")
        n = _tbl(spark, sf_dir, "nation")
        c = _tbl(spark, sf_dir, "customer")
        o = _tbl(spark, sf_dir, "orders")
        return (o.join(c, o.o_custkey == c.c_custkey)
                .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
                .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
                .groupBy("r_name")
                .agg(F.count("*").alias("n_orders"),
                     F.round(F.sum("o_totalprice"), 2).alias("revenue")))

    q.update(rel_event_pairs=rel_event_pairs,
             rel_pricing_summary=rel_pricing_summary,
             rel_top_customers=rel_top_customers,
             rel_shipping_priority=rel_shipping_priority,
             rel_sessions=rel_sessions,
             rel_asof=rel_asof,
             rel_hourly=rel_hourly,
             rel_props_json=rel_props_json,
             rel_region_revenue=rel_region_revenue)
    # the registry holds more entries than the driver's 50-row snapshot
    # cap, and dict order is its iteration order — so entries that have
    # NEVER had a driver correctness row (VERDICT r06 #6: rel_hourly and
    # rel_props_json, registered post-cap in r5/r6) enumerate FIRST.
    # Pure reordering: same names, same callables, same oracle SQL.
    _never_sampled = ["rel_hourly", "rel_props_json"]
    return {**{n: q[n] for n in _never_sampled},
            **{n: f for n, f in q.items() if n not in _never_sampled}}


# --------------------------------------------------------------- oracles

# --- geometry-oracle helpers (sf0.01 fixture paths + SQL fragments) ---

_ORACLE_SF = 0.01  # the driver's correctness scale
# the driver's correctness tables (TESTDATA.md) — used where an oracle
# needs DATA-DEPENDENT literals (e.g. trained IVF centroids): the Spark
# query trains on its sf_dir, the oracle trains on this one, and at the
# driver's compare scale the two are the same table
_ORACLE_DIR = "/root/testdata/sf0.01"

_IVF_N_LISTS, _IVF_N_PROBE, _IVF_ITERS = 16, 4, 8
_ivf_cent_cache: dict[tuple, list] = {}


def _ivf_centroids(sf_dir: str) -> list:
    """Trained IVF coarse quantizer for sf_dir's embeddings table —
    similarity.train_ivf_centroids over the full (bounded, driver-scale)
    table read via pyarrow: NO Spark and no BLAS GEMM anywhere, so the
    query process and the oracle process produce bit-identical centroid
    floats and can share them as literals (the lsh_planes pattern, but
    data-dependent)."""
    path = os.path.abspath(os.path.join(sf_dir, "embeddings.parquet"))
    st = os.stat(path)
    # ADVICE r04: key on (path, size, mtime) so a regenerated fixture
    # never serves stale centroids from the in-process cache
    key = (path, st.st_size, st.st_mtime_ns)
    if key not in _ivf_cent_cache:
        import numpy as np
        import pyarrow.parquet as pq
        pf = pq.ParquetFile(path)
        n = pf.metadata.num_rows
        # 100 TB posture (ADVICE r04): the row cap bounds what the driver
        # HOLDS — ids are read alone first (8 B/row), the stride is taken
        # over the ID-SORTED order (the pinned convention: every
        # stride-th row of the id-sorted table — review r5 caught a
        # file-order stride, a different sample whenever the file isn't
        # physically id-sorted), then ONLY the ~cap selected embeddings
        # stream out of the row groups; Arrow→numpy, no to_pylist. No
        # effect at the driver's correctness scales (stride=1 there), so
        # oracle literals are unchanged.
        cap = 100_000
        stride = max(1, -(-n // cap))
        ids_full = (pq.read_table(path, columns=["vec_id"])
                    .column("vec_id").to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        keep = np.zeros(n, dtype=bool)
        keep[np.argsort(ids_full, kind="stable")[::stride]] = True
        ids_parts, mat_parts = [], []
        seen = 0
        for rg in range(pf.num_row_groups):
            t = pf.read_row_group(rg, columns=["embedding"])
            m = t.num_rows
            take = np.nonzero(keep[seen:seen + m])[0]
            if len(take):
                # flatten() (not .values) — it respects list-array offsets
                flat = (t.column("embedding").combine_chunks().flatten()
                        .to_numpy(zero_copy_only=False))
                dim = len(flat) // m
                mat_parts.append(np.asarray(flat, dtype=np.float64)
                                 .reshape(m, dim)[take])
                ids_parts.append(ids_full[seen + take])
            seen += m
        ids = np.concatenate(ids_parts)
        mat = np.concatenate(mat_parts, axis=0)
        mat = mat[np.argsort(ids, kind="stable")]
        cent = similarity.train_ivf_centroids(mat, _IVF_N_LISTS, _IVF_ITERS)
        _ivf_cent_cache[key] = [[float(x) for x in row] for row in cent]
        # the same id-sorted sample trains the PQ codebooks (r6) —
        # loaded once, both quantizers share the read
        _pq_books_cache[key] = similarity.train_pq_codebooks(
            mat, _PQ_M, _PQ_K, _IVF_ITERS)
    return _ivf_cent_cache[key]


_PQ_M, _PQ_K = 8, 16
_pq_books_cache: dict[tuple, list] = {}


def _pq_codebooks(sf_dir: str) -> list:
    """Trained PQ codebooks for sf_dir's embeddings — rides
    _ivf_centroids' single pyarrow read (same sample convention), so
    query-process and oracle-process floats are bit-identical."""
    path = os.path.abspath(os.path.join(sf_dir, "embeddings.parquet"))
    st = os.stat(path)
    key = (path, st.st_size, st.st_mtime_ns)
    if key not in _pq_books_cache:
        _ivf_centroids(sf_dir)
    return _pq_books_cache[key]


def _pq_cb_sql() -> str:
    """The trained PQ codebooks as a DuckDB VALUES literal
    (j, code, lo, hi, c_emb, hn) — subspace j slices nv[lo:hi]
    (1-based inclusive, DuckDB slice semantics = Spark F.slice), hn is
    the precomputed ‖c‖²/2 of the argmax-L2 identity. hn is computed
    once here in Python and used as a literal by BOTH engines, so the
    floats agree bit-for-bit."""
    books = _pq_codebooks(_ORACLE_DIR)
    ds = len(books[0][0])
    rows = []
    for j, book in enumerate(books):
        lo, hi = j * ds + 1, (j + 1) * ds
        for ci, c in enumerate(book):
            hn = sum(w * w for w in c) / 2.0
            rows.append(
                f"({j}, {ci}, {lo}, {hi}, "
                f"[{', '.join(repr(x) for x in c)}]::DOUBLE[], {hn!r})")
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(j, code, lo, hi, c_emb, hn)")


def _ivf_seeds_sql() -> str:
    """The trained centroids as a DuckDB VALUES literal (list_id, c_emb)."""
    cent = _ivf_centroids(_ORACLE_DIR)
    rows = ", ".join(
        f"({i}::BIGINT, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cent))
    return f"SELECT * FROM (VALUES {rows}) AS t(list_id, c_emb)"


def _fixture_paths() -> tuple[str, str]:
    """(pages, segments) parquet paths for the oracle sf. Pages are
    generated on demand; segments.parquet is written by the imc_* Spark
    queries (the driver runs each Spark query before its oracle)."""
    pages = gen_pages.ensure_pages(sf=_ORACLE_SF)
    # the segments cache is a Spark-written DIRECTORY → glob for DuckDB
    return pages, os.path.join(os.path.dirname(pages),
                               _seg_cache_name(), "*.parquet")


def _assignments_glob() -> str:
    pages = gen_pages.ensure_pages(sf=_ORACLE_SF)
    return os.path.join(os.path.dirname(pages),
                        _assign_cache_name(), "*.parquet")


_EXTRACT_SQL = ("replace(replace(replace("
                "regexp_replace(decode(html), '<[^>]*>', '', 'g'),"
                " '&lt;', '<'), '&gt;', '>'), '&amp;', '&')")

_TRAJ_LINE_SQL = (r"(?m)^TRAJ \d+ \d+ -?\d+\.\d{6} -?\d+\.\d{6} "
                  r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")


def _dedup_pages_cte(pages_path: str, lang: str | None) -> str:
    where = f"WHERE lang = '{lang}'" if lang else ""
    return (f"SELECT url, html FROM ("
            f"  SELECT url, html, row_number() OVER ("
            f"    PARTITION BY url ORDER BY warc_ts DESC, length(text) DESC) AS rn"
            f"  FROM read_parquet('{pages_path}') {where}) WHERE rn = 1")


def _traclus_chain() -> str:
    """CTE chain computing the TRACLUS distance for a `cand` CTE with
    columns (a_seg, b_seg, ax1..ay2, bx1..by2) — the same float64 formula
    sequence as imc.kernels.traclus_distance (hypot → sqrt(x²+y²) is the
    only expression-tree difference; outputs are compared at round 6)."""
    return """
    m0 AS (
      SELECT *,
        sqrt((ax2-ax1)*(ax2-ax1) + (ay2-ay1)*(ay2-ay1)) AS len_a,
        sqrt((bx2-bx1)*(bx2-bx1) + (by2-by1)*(by2-by1)) AS len_b
      FROM cand),
    m1 AS (
      SELECT a_seg, b_seg,
        CASE WHEN len_a >= len_b THEN ax1 ELSE bx1 END AS q1x,
        CASE WHEN len_a >= len_b THEN ay1 ELSE by1 END AS q1y,
        CASE WHEN len_a >= len_b THEN ax2 ELSE bx2 END AS q2x,
        CASE WHEN len_a >= len_b THEN ay2 ELSE by2 END AS q2y,
        CASE WHEN len_a >= len_b THEN bx1 ELSE ax1 END AS o1x,
        CASE WHEN len_a >= len_b THEN by1 ELSE ay1 END AS o1y,
        CASE WHEN len_a >= len_b THEN bx2 ELSE ax2 END AS o2x,
        CASE WHEN len_a >= len_b THEN by2 ELSE ay2 END AS o2y,
        CASE WHEN len_a >= len_b THEN len_a ELSE len_b END AS lb,
        CASE WHEN len_a >= len_b THEN len_b ELSE len_a END AS lo
      FROM m0),
    m2 AS (
      SELECT *, (q2x-q1x) AS ux, (q2y-q1y) AS uy,
        greatest((q2x-q1x)*(q2x-q1x) + (q2y-q1y)*(q2y-q1y), 1e-12) AS ll2
      FROM m1),
    m3 AS (
      SELECT *, ((o1x-q1x)*ux + (o1y-q1y)*uy)/ll2 AS t1,
                ((o2x-q1x)*ux + (o2y-q1y)*uy)/ll2 AS t2
      FROM m2),
    m4 AS (
      SELECT *,
        sqrt((o1x-(q1x+t1*ux))*(o1x-(q1x+t1*ux))
           + (o1y-(q1y+t1*uy))*(o1y-(q1y+t1*uy))) AS lp1,
        sqrt((o2x-(q1x+t2*ux))*(o2x-(q1x+t2*ux))
           + (o2y-(q1y+t2*uy))*(o2y-(q1y+t2*uy))) AS lp2
      FROM m3),
    m5 AS (
      SELECT *,
        CASE WHEN lp1+lp2 > 0
             THEN (lp1*lp1 + lp2*lp2)/greatest(lp1+lp2, 1e-12)
             ELSE 0.0 END AS d_perp,
        least(least(abs(t1), abs(1.0-t1))*lb,
              least(abs(t2), abs(1.0-t2))*lb) AS d_par,
        (ux*(o2x-o1x) + uy*(o2y-o1y)) / greatest(lb*lo, 1e-12) AS craw,
        least(abs(ux*(o2y-o1y) - uy*(o2x-o1x))
              / greatest(lb*lo, 1e-12), 1.0) AS sint
      FROM m4),
    m6 AS (
      SELECT a_seg, b_seg, d_perp, d_par,
        CASE WHEN c >= 0.0 THEN lo * sint ELSE lo END AS d_ang
      FROM (SELECT *, least(greatest(craw, -1.0), 1.0) AS c FROM m5))
    """


def _mdl_walk_sql(pages_path: str) -> str:
    """The FULL MDL trajectory-partitioning walk ([T] §3.3 Fig. 8) in pure
    SQL — the round-2 'not ANSI-SQL-expressible' claim was too strong. The
    sequential recurrence factors into (a) a SET-WISE precompute of
    MDL_par(i, j) for every candidate chord (pairs × covered units, one
    range join + group-by), (b) first-break indices nxt(i) = min j with
    MDL_par > MDL_nopar, and (c) a recursive CTE replaying the walk, whose
    transition cp → coalesce(nxt(cp) − 1, n − 1) is exactly the kernel's
    first-candidate-that-breaks rule (a break at the first candidate is
    impossible: MDL_par(i, i+1) = MDL_nopar + 2·log2(1e-300) < MDL_nopar,
    so the recursion strictly advances). Float formulas mirror
    kernels._mdl_par_cost term-for-term (sqrt(x²+y²) for np.hypot, the
    sqrt(1−cos²) MDL angle convention, log2 floored at 1e-300, nopar via
    cumulative-sum differences); output endpoints are exact input copies,
    so the frame is hash-exact when every decision matches (verified at
    sf0.01: 7,660/7,660 segments bit-equal). n ≤ 2 trajectories bypass the
    walk (kernel shortcut: every point characteristic)."""
    return f"""
    dedup AS ({_dedup_pages_cte(pages_path, 'en')}),
    txt AS (SELECT url, {_EXTRACT_SQL} AS t FROM dedup),
    lines AS (SELECT url, unnest(regexp_extract_all(t,
               '{_TRAJ_LINE_SQL}')) AS ln FROM txt),
    praw AS (SELECT string_split(ln, ' ') AS f FROM lines),
    pts0 AS (SELECT f[2]::BIGINT AS traj_id, f[3]::INT AS seq,
                    f[4]::DOUBLE AS x, f[5]::DOUBLE AS y FROM praw),
    pts AS MATERIALIZED (
      SELECT traj_id, seq, x, y,
             (row_number() OVER (PARTITION BY traj_id ORDER BY seq)
              - 1)::BIGINT AS idx
      FROM pts0),
    trajs AS MATERIALIZED (
      SELECT traj_id, count(*) AS n FROM pts GROUP BY traj_id),
    units AS MATERIALIZED (
      SELECT a.traj_id, a.idx AS k, a.x AS s1x, a.y AS s1y,
             b.x AS s2x, b.y AS s2y,
             log2(greatest(sqrt((b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y)),
                           1e-300)) AS lh_u
      FROM pts a JOIN pts b
        ON b.traj_id = a.traj_id AND b.idx = a.idx + 1),
    culh AS MATERIALIZED (
      SELECT p.traj_id, p.idx AS m,
             coalesce(sum(u.lh_u) OVER (PARTITION BY p.traj_id ORDER BY p.idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0.0) AS c
      FROM pts p LEFT JOIN units u
        ON u.traj_id = p.traj_id AND u.k = p.idx),
    pairs AS MATERIALIZED (
      SELECT a.traj_id, a.idx AS i, b.idx AS j,
             a.x AS pix, a.y AS piy,
             (b.x - a.x) AS cjx, (b.y - a.y) AS cjy,
             sqrt((b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y)) AS clen
      FROM pts a JOIN pts b
        ON b.traj_id = a.traj_id AND b.idx > a.idx),
    mdl_raw AS (
      SELECT p.traj_id, p.i, p.j, p.clen,
             greatest(p.clen * p.clen, 1e-12) AS ll2,
             ((u.s1x - p.pix) * p.cjx + (u.s1y - p.piy) * p.cjy) / ll2 AS t1,
             ((u.s2x - p.pix) * p.cjx + (u.s2y - p.piy) * p.cjy) / ll2 AS t2,
             sqrt((u.s1x - (p.pix + t1 * p.cjx)) * (u.s1x - (p.pix + t1 * p.cjx))
                + (u.s1y - (p.piy + t1 * p.cjy)) * (u.s1y - (p.piy + t1 * p.cjy))
                ) AS l1,
             sqrt((u.s2x - (p.pix + t2 * p.cjx)) * (u.s2x - (p.pix + t2 * p.cjx))
                + (u.s2y - (p.piy + t2 * p.cjy)) * (u.s2y - (p.piy + t2 * p.cjy))
                ) AS l2,
             (u.s2x - u.s1x) AS vx, (u.s2y - u.s1y) AS vy,
             sqrt((u.s2x-u.s1x)*(u.s2x-u.s1x) + (u.s2y-u.s1y)*(u.s2y-u.s1y))
               AS vlen,
             least(greatest((vx * p.cjx + vy * p.cjy)
                   / greatest(p.clen * vlen, 1e-12), -1.0), 1.0) AS cost
      FROM pairs p JOIN units u
        ON u.traj_id = p.traj_id AND u.k >= p.i AND u.k < p.j),
    mdl_sums AS (
      SELECT traj_id, i, j, any_value(clen) AS clen,
             sum(CASE WHEN (l1+l2) > 0
                      THEN (l1*l1 + l2*l2)/greatest(l1+l2, 1e-12)
                      ELSE 0.0 END) AS sp,
             sum(CASE WHEN cost >= 0.0
                      THEN vlen * sqrt(greatest(1.0 - cost*cost, 0.0))
                      ELSE vlen END) AS sa
      FROM mdl_raw GROUP BY traj_id, i, j),
    mdl_costs AS (
      SELECT s.traj_id, s.i, s.j,
             log2(greatest(s.clen, 1e-300))
             + (log2(greatest({PARAMS.w_perp!r} * sp, 1e-300))
                + log2(greatest({PARAMS.w_ang!r} * sa, 1e-300))) AS cpar,
             (cj.c - ci.c) AS cnop
      FROM mdl_sums s
      JOIN culh ci ON ci.traj_id = s.traj_id AND ci.m = s.i
      JOIN culh cj ON cj.traj_id = s.traj_id AND cj.m = s.j),
    nxt AS MATERIALIZED (
      SELECT traj_id, i, min(j) AS nj FROM mdl_costs
      WHERE cpar > cnop GROUP BY traj_id, i),
    walk(traj_id, cp) AS (
      SELECT traj_id, 0::BIGINT FROM trajs WHERE n >= 3
      UNION ALL
      SELECT w.traj_id, coalesce(x.nj - 1, t.n - 1)
      FROM walk w
      JOIN trajs t ON t.traj_id = w.traj_id
      LEFT JOIN nxt x ON x.traj_id = w.traj_id AND x.i = w.cp
      WHERE w.cp < t.n - 1),
    cps AS (
      SELECT traj_id, cp FROM walk
      UNION ALL SELECT traj_id, 0::BIGINT FROM trajs WHERE n = 2
      UNION ALL SELECT traj_id, 1::BIGINT FROM trajs WHERE n = 2),
    segpairs AS (
      SELECT traj_id, cp AS a,
             lead(cp) OVER (PARTITION BY traj_id ORDER BY cp) AS b
      FROM cps),
    mdl_out AS (
      SELECT s.traj_id * {segments.SEG_ID_STRIDE} + pa.seq AS seg_id,
             s.traj_id,
             pa.x AS x1, pa.y AS y1, pb.x AS x2, pb.y AS y2
      FROM segpairs s
      JOIN pts pa ON pa.traj_id = s.traj_id AND pa.idx = s.a
      JOIN pts pb ON pb.traj_id = s.traj_id AND pb.idx = s.b
      WHERE s.b IS NOT NULL)
    """


# lattice key packing for the polygon oracle (bias covers negative cells;
# 2^20 stride keeps (gx, gy) lexicographic order = key order)
_KB = 16384
_KM = 1 << 20


def _raster_sql(segs_path: str) -> str:
    """CTE chain ending in rast(venue, gx, gy, hits) — the supercover
    traversal mirroring kernels.grid_traverse_batch: grid-line crossing
    parameters via generate_series, sorted per segment; each positive-width
    inter-crossing interval's midpoint identifies one traversed cell."""
    return f"""
    rs AS (SELECT seg_id, traj_id,
                  x1 / {PARAMS.raster_cell!r} AS a1,
                  y1 / {PARAMS.raster_cell!r} AS b1,
                  x2 / {PARAMS.raster_cell!r} AS a2,
                  y2 / {PARAMS.raster_cell!r} AS b2
           FROM read_parquet('{segs_path}')),
    rg AS (SELECT *, floor(a1)::BIGINT AS ix1, floor(b1)::BIGINT AS iy1,
                 floor(a2)::BIGINT AS ix2, floor(b2)::BIGINT AS iy2,
                 (a2 - a1) AS dx, (b2 - b1) AS dy
          FROM rs),
    rxc AS (SELECT seg_id, (k::DOUBLE - a1) / dx AS t FROM (
             SELECT seg_id, a1, dx,
                    unnest(generate_series(least(ix1, ix2) + 1,
                                           greatest(ix1, ix2))) AS k
             FROM rg)),
    ryc AS (SELECT seg_id, (k::DOUBLE - b1) / dy AS t FROM (
             SELECT seg_id, b1, dy,
                    unnest(generate_series(least(iy1, iy2) + 1,
                                           greatest(iy1, iy2))) AS k
             FROM rg)),
    rts AS (SELECT seg_id, t FROM rxc UNION ALL SELECT seg_id, t FROM ryc
           UNION ALL SELECT seg_id, 0.0 FROM rg
           UNION ALL SELECT seg_id, 1.0 FROM rg),
    riv AS (SELECT seg_id,
                  lag(t) OVER (PARTITION BY seg_id ORDER BY t) AS lo,
                  t AS hi
           FROM rts),
    rmid AS (SELECT seg_id, (lo + hi) / 2.0 AS tm FROM riv
            WHERE lo IS NOT NULL AND hi > lo),
    rcells AS (SELECT rg.traj_id,
                     floor(rg.a1 + m.tm * rg.dx)::INT AS gx,
                     floor(rg.b1 + m.tm * rg.dy)::INT AS gy
              FROM rmid m JOIN rg ON rg.seg_id = m.seg_id),
    rast AS MATERIALIZED (
      SELECT (traj_id // {VENUE_STRIDE}) AS venue, gx, gy, count(*) AS hits
      FROM rcells GROUP BY venue, gx, gy)
    """


def _sweep_walk_sql(segs_glob: str, asn_glob: str) -> str:
    """The representative-trajectory sweep ([T] §4.3 Fig. 13) in pure SQL —
    the same sequential-to-set-wise factoring as _mdl_walk_sql: the γ-gap
    emission recurrence's state is always the LAST EMITTED event's x', so
    the transition sstep(e) = min ok-event e' > e with x'(e') − x'(e) ≥ γ
    precomputes per event, and a recursive CTE replays the walk from the
    first qualifying event (which always emits: last_x = −∞). Crossing
    counts and the interpolated avg-y' are state-free per event. Mirrors
    kernels.sweep_representative's pinned conventions: half-plane vector
    flip, rotation via the cluster direction cosines, lo ≤ x' ≤ hi
    inclusive crossing test, span-0 → t=0.5, norm ≤ 0 → (1,0). Verified
    bit-equal at round-6 against the kernel at sf0.01 (1,501/1,501 rows)."""
    return f"""
    asn AS (SELECT seg_id, cluster_id FROM read_parquet('{asn_glob}')),
    csegs AS (SELECT a.cluster_id, s.seg_id, s.x1, s.y1, s.x2, s.y2
              FROM read_parquet('{segs_glob}') s JOIN asn a USING (seg_id)),
    flips AS (SELECT *,
           CASE WHEN ((x2-x1) < 0) OR ((x2-x1) = 0 AND (y2-y1) < 0)
                THEN -(x2-x1) ELSE (x2-x1) END AS fvx,
           CASE WHEN ((x2-x1) < 0) OR ((x2-x1) = 0 AND (y2-y1) < 0)
                THEN -(y2-y1) ELSE (y2-y1) END AS fvy
       FROM csegs),
    dirs0 AS (SELECT cluster_id, sum(fvx) AS sx, sum(fvy) AS sy
              FROM flips GROUP BY cluster_id),
    dirs AS (SELECT cluster_id,
                    CASE WHEN norm <= 0 THEN 1.0 ELSE sx / norm END AS cx,
                    CASE WHEN norm <= 0 THEN 0.0 ELSE sy / norm END AS cy
             FROM (SELECT cluster_id, sx, sy,
                          sqrt(sx*sx + sy*sy) AS norm FROM dirs0)),
    rot AS MATERIALIZED (
      SELECT f.cluster_id, f.seg_id,
             f.x1*d.cx + f.y1*d.cy AS e1x, -f.x1*d.cy + f.y1*d.cx AS e1y,
             f.x2*d.cx + f.y2*d.cy AS e2x, -f.x2*d.cy + f.y2*d.cx AS e2y
      FROM flips f JOIN dirs d USING (cluster_id)),
    spans AS MATERIALIZED (
      SELECT cluster_id, seg_id,
             least(e1x, e2x) AS lo, greatest(e1x, e2x) AS hi,
             CASE WHEN e1x <= e2x THEN e1y ELSE e2y END AS ylo,
             CASE WHEN e1x <= e2x THEN e2y ELSE e1y END AS yhi
      FROM rot),
    ev AS MATERIALIZED (
      SELECT cluster_id, x, y,
             row_number() OVER (PARTITION BY cluster_id ORDER BY x, y) AS e
      FROM (SELECT cluster_id, e1x AS x, e1y AS y FROM rot
            UNION ALL SELECT cluster_id, e2x, e2y FROM rot)),
    evq AS MATERIALIZED (
      SELECT v.cluster_id, v.e, v.x,
             count(s.seg_id) AS cnt,
             sum(s.ylo + (CASE WHEN (s.hi - s.lo) > 0
                          THEN (v.x - s.lo) / greatest(s.hi - s.lo, 1e-12)
                          ELSE 0.5 END) * (s.yhi - s.ylo)) AS ysum
      FROM ev v JOIN spans s
        ON s.cluster_id = v.cluster_id AND s.lo <= v.x AND s.hi >= v.x
      GROUP BY v.cluster_id, v.e, v.x),
    sstep AS MATERIALIZED (
      SELECT a.cluster_id, a.e, min(b.e) AS ne
      FROM evq a JOIN evq b
        ON b.cluster_id = a.cluster_id AND b.e > a.e
       AND b.cnt >= {PARAMS.min_lns} AND (b.x - a.x) >= {PARAMS.gamma!r}
      WHERE a.cnt >= {PARAMS.min_lns}
      GROUP BY a.cluster_id, a.e),
    sbase AS (SELECT cluster_id, min(e) AS e0 FROM evq
              WHERE cnt >= {PARAMS.min_lns} GROUP BY cluster_id),
    swalk(cluster_id, e) AS (
      SELECT cluster_id, e0 FROM sbase
      UNION ALL
      SELECT w.cluster_id, s.ne
      FROM swalk w JOIN sstep s
        ON s.cluster_id = w.cluster_id AND s.e = w.e AND s.ne IS NOT NULL),
    emitted AS (
      SELECT w.cluster_id, w.e, q.x, q.ysum / q.cnt AS avgy
      FROM swalk w JOIN evq q ON q.cluster_id = w.cluster_id AND q.e = w.e)
    """


def _pt_seg_sql(px: str, py: str, x1: str, y1: str, x2: str, y2: str) -> str:
    """Point→segment distance as a SQL expression string — mirrors
    joins._pt_seg_dist_expr term-for-term (zero-length guard, t clamp)."""
    ux, uy = f"({x2} - {x1})", f"({y2} - {y1})"
    ll2 = f"({ux}*{ux} + {uy}*{uy})"
    t0 = (f"(CASE WHEN {ll2} > 0 THEN (({px} - {x1})*{ux} + ({py} - {y1})*{uy})"
          f" / greatest({ll2}, 1e-12) ELSE 0.0 END)")
    t = f"least(greatest({t0}, 0.0), 1.0)"
    dx = f"({px} - ({x1} + {t}*{ux}))"
    dy = f"({py} - ({y1} + {t}*{uy}))"
    return f"sqrt({dx}*{dx} + {dy}*{dy})"


def _hausdorff_sql() -> str:
    """Segment Hausdorff distance over (ax1..by2) columns — max of the four
    endpoint→other-segment distances (joins.hausdorff_dist_expr twin)."""
    return ("greatest("
            + _pt_seg_sql("ax1", "ay1", "bx1", "by1", "bx2", "by2") + ", "
            + _pt_seg_sql("ax2", "ay2", "bx1", "by1", "bx2", "by2") + ", "
            + _pt_seg_sql("bx1", "by1", "ax1", "ay1", "ax2", "ay2") + ", "
            + _pt_seg_sql("bx2", "by2", "ax1", "ay1", "ax2", "ay2") + ")")


def _tile_edges_values() -> str:
    """The sf0.01 tile rings as a VALUES literal of directed edges
    (tile_id, venue, ex1, ey1, ex2, ey2) — 4 edges per rectangular tile,
    closing edge included (matches kernels.point_in_polygon's roll)."""
    n_venues = max(1, gen_pages.n_pages_for_sf(_ORACLE_SF)
                   // gen_pages.PAGES_PER_VENUE)
    tiles = gen_pages.all_tiles(n_venues)
    rows = []
    for _, t in tiles.iterrows():
        ring = [(p["x"], p["y"]) for p in t["ring"]]
        for i in range(len(ring)):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % len(ring)]
            rows.append(f"({int(t['tile_id'])}, {int(t['venue'])}, "
                        f"{x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return ", ".join(rows)


def _lsh_multi_bucket_sql(bits: int, tables: int) -> str:
    """Multi-table sign-LSH bucket keys as SQL — same plane constants and
    the same left-to-right float64 addition order as
    imc.similarity.multi_bucket, so signs agree bitwise."""
    planes = similarity.lsh_planes(bits, tables)
    selects = []
    for t in range(tables):
        bit_terms = []
        for j in range(bits):
            proj = " + ".join(
                f"((CASE WHEN len(embedding) >= {d + 1} "
                f"AND embedding[{d + 1}] IS NOT NULL "
                f"THEN embedding[{d + 1}]::DOUBLE ELSE 0.0 END) * {c!r})"
                for d, c in planes[t][j])
            bit_terms.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << j} ELSE 0 END)")
        selects.append(f"SELECT vec_id, {t} AS tbl, "
                       f"({' + '.join(bit_terms)}) AS bucket FROM embeddings")
    return " UNION ALL ".join(selects)


def _embcos_pairs_cte(threshold: float, bits: int, tables: int) -> str:
    """mb/wb/ecand/epairs CTE chain for embedding-cosine near-dup pairs —
    the ONE copy shared by the dedup_embcos_pairs and
    dedup_embcos_clusters oracles (same single-source rule as
    _verified_pairs_cte)."""
    cos = ("round(list_cosine_similarity(ea.embedding::DOUBLE[], "
           "eb.embedding::DOUBLE[]), 6)")
    return (f"mb AS ({_lsh_multi_bucket_sql(bits, tables)}), "
            f"wb AS (SELECT e.vec_id, e.embedding, m.tbl, m.bucket "
            f"FROM embeddings e JOIN mb m USING (vec_id)), "
            f"ecand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id "
            f"FROM wb a JOIN wb b ON a.tbl = b.tbl AND a.bucket = b.bucket "
            f"AND a.vec_id < b.vec_id), "
            f"epairs AS MATERIALIZED (SELECT c.a_id, c.b_id, {cos} AS cos "
            f"FROM ecand c JOIN embeddings ea ON ea.vec_id = c.a_id "
            f"JOIN embeddings eb ON eb.vec_id = c.b_id "
            f"WHERE {cos} >= {threshold})")


def _simhash_cte() -> str:
    """Simhash fingerprints over `documents` — mirrors
    imc.textops.simhash_fingerprints bit-for-bit (md5 hex-digit bit
    extraction, signed vote sums, sign-pack, tokenless docs → 0)."""
    def digit(i: int) -> str:
        return f"(strpos('0123456789abcdef', substr(hx, {i + 1}, 1)) - 1)"
    sums = ", ".join(
        f"sum(CASE WHEN (({digit(15 - b // 4)} >> {b % 4}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) AS s{b}"
        for b in range(64))
    terms = [f"(CASE WHEN s{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
             for b in range(63)]
    terms.append("(CASE WHEN s63 > 0 THEN (-9223372036854775807 - 1)::BIGINT "
                 "ELSE 0::BIGINT END)")
    pack = " + ".join(terms)
    return (r"toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            r"'\S+')) AS tok FROM documents), "
            f"hs AS (SELECT doc_id, md5(tok) AS hx FROM toks), "
            f"sums AS (SELECT doc_id, {sums} FROM hs GROUP BY doc_id), "
            f"sigraw AS (SELECT doc_id, ({pack})::BIGINT AS simhash FROM sums), "
            f"sig AS (SELECT d.doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash "
            f"FROM documents d LEFT JOIN sigraw s USING (doc_id))")


_WORDS = r"regexp_split_to_array(trim(lower(text)), '\s+')"
_SHINGLES = (f"list_distinct(list_transform(generate_series(1, "
             f"greatest(len({_WORDS}) - 2, 0)), "
             f"i -> array_to_string(({_WORDS})[i:i+2], ' ')))")


def _sigs_cte() -> str:
    sig_cols = ", ".join(f"min(substr(hh, {8 * i + 1}, 8)) AS sig_{i}"
                         for i in range(textops.MINHASH_K))
    return (f"SELECT doc_id, {sig_cols} FROM ("
            f"  SELECT doc_id, md5(s) || md5(s || '#') AS hh FROM ("
            f"    SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents"
            f"    WHERE len({_WORDS}) >= 3)) GROUP BY doc_id")


def _bands_cte() -> str:
    rows = textops.MINHASH_K // textops.LSH_BANDS
    selects = []
    for b in range(textops.LSH_BANDS):
        parts = " || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows))
        selects.append(f"SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs")
    return " UNION ALL ".join(selects)


def _verified_pairs_cte(threshold: float = 0.7) -> str:
    """cand → shingles → exact-Jaccard-verified pair CTE chain (needs
    `sigs`/`bands` CTEs in scope) — the ONE copy of the verification SQL
    and its threshold, shared by the dedup_jaccard_pairs and
    dedup_clusters oracles (review r4: two hand-kept copies of
    bit-sensitive SQL desynchronize silently)."""
    jac = ("round(len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
           "greatest(len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE, "
           "1.0), 6)")
    return (f"cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id "
            f"FROM bands a JOIN bands b ON a.band = b.band "
            f"AND a.bucket = b.bucket AND a.doc_id < b.doc_id), "
            f"sh AS MATERIALIZED (SELECT doc_id, {_SHINGLES} AS sh "
            f"FROM documents), "
            f"vpairs AS MATERIALIZED (SELECT a_id, b_id, {jac} AS jaccard "
            f"FROM cand JOIN sh sa ON cand.a_id = sa.doc_id "
            f"JOIN sh sb ON cand.b_id = sb.doc_id "
            f"WHERE {jac} >= {threshold})")


def oracle_sql() -> dict[str, str]:
    k = textops.MINHASH_K
    sig_cols = ", ".join(f"sig_{i}" for i in range(k))
    bucket_expr = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(8))
    cos = ("round(list_cosine_similarity(a.embedding::DOUBLE[], "
           "b.embedding::DOUBLE[]), 6)")
    pages_path, segs_path = _fixture_paths()
    gap2 = PARAMS.gap_bound * PARAMS.gap_bound
    # widest entropy candidate's gap bound (complete for the smaller ε too)
    _wide = dataclasses.replace(PARAMS, eps=max(_ENTROPY_EPS))
    wide_gap2 = _wide.gap_bound * _wide.gap_bound
    bbox_gap2 = ("(power(greatest(0.0, least(ax1,ax2)-greatest(bx1,bx2), "
                 "least(bx1,bx2)-greatest(ax1,ax2)), 2) + "
                 "power(greatest(0.0, least(ay1,ay2)-greatest(by1,by2), "
                 "least(by1,by2)-greatest(ay1,ay2)), 2))")
    seg_cols_a = ", ".join(f"a.{c} AS a{c}" for c in ("x1", "y1", "x2", "y2"))
    seg_cols_b = ", ".join(f"b.{c} AS b{c}" for c in ("x1", "y1", "x2", "y2"))
    return {
        "imc_text_sha": f"""
            WITH dedup AS ({_dedup_pages_cte(pages_path, None)})
            SELECT url, sha256({_EXTRACT_SQL}) AS sha256 FROM dedup
        """,
        "imc_points": f"""
            WITH dedup AS ({_dedup_pages_cte(pages_path, 'en')}),
            txt AS (SELECT url, {_EXTRACT_SQL} AS t FROM dedup),
            lines AS (SELECT url, unnest(regexp_extract_all(t,
                       '{_TRAJ_LINE_SQL}')) AS ln FROM txt),
            p AS (SELECT url, string_split(ln, ' ') AS f FROM lines)
            SELECT f[2]::BIGINT AS traj_id, f[3]::INT AS seq,
                   f[4]::DOUBLE AS x, f[5]::DOUBLE AS y, url
            FROM p
        """,
        "imc_eps_pairs": f"""
            WITH s AS (SELECT seg_id, x1, y1, x2, y2
                       FROM read_parquet('{segs_path}')),
            cand AS (
              SELECT a.seg_id AS a_seg, b.seg_id AS b_seg,
                     {seg_cols_a}, {seg_cols_b}
              FROM s a JOIN s b ON a.seg_id < b.seg_id),
            pre AS (SELECT * FROM cand WHERE {bbox_gap2} <= {gap2!r}),
            {_traclus_chain().replace('FROM cand', 'FROM pre', 1)}
            SELECT a_seg, b_seg, round(d_perp + d_par + d_ang, 6) AS dist
            FROM m6 WHERE d_perp + d_par + d_ang <= {PARAMS.eps!r}
        """,
        "imc_eps_pairs_hausdorff": f"""
            WITH s AS (SELECT seg_id, x1, y1, x2, y2
                       FROM read_parquet('{segs_path}')),
            cand AS (
              SELECT a.seg_id AS a_seg, b.seg_id AS b_seg,
                     {seg_cols_a}, {seg_cols_b}
              FROM s a JOIN s b ON a.seg_id < b.seg_id),
            pre AS (SELECT * FROM cand WHERE {bbox_gap2} <= {gap2!r}),
            hd AS (SELECT a_seg, b_seg, {_hausdorff_sql()} AS dist FROM pre)
            SELECT a_seg, b_seg, round(dist, 6) AS dist
            FROM hd WHERE dist <= {PARAMS.eps!r}
        """,
        "imc_knn": f"""
            WITH s AS (SELECT seg_id, x1, y1, x2, y2
                       FROM read_parquet('{segs_path}')),
            cand AS (
              SELECT a.seg_id AS a_seg, b.seg_id AS b_seg,
                     {seg_cols_a}, {seg_cols_b}
              FROM s a JOIN s b ON a.seg_id <> b.seg_id),
            {_traclus_chain()},
            d AS (SELECT a_seg, b_seg, round(d_perp + d_par + d_ang, 6) AS dist
                  FROM m6)
            SELECT a_seg, b_seg, dist,
                   row_number() OVER (PARTITION BY a_seg
                                      ORDER BY dist, b_seg)::BIGINT AS rank,
                   TRUE AS settled
            FROM d
            QUALIFY rank <= 3
        """,
        "imc_qmeasure": f"""
            WITH segs AS (SELECT seg_id, x1, y1, x2, y2
                          FROM read_parquet('{segs_path}')),
            asn AS (SELECT seg_id, cluster_id
                    FROM read_parquet('{_assignments_glob()}')),
            j AS (SELECT a.cluster_id, s.* FROM asn a JOIN segs s USING (seg_id)),
            cand AS (
              SELECT x.seg_id AS a_seg, y.seg_id AS b_seg,
                     x.x1 AS ax1, x.y1 AS ay1, x.x2 AS ax2, x.y2 AS ay2,
                     y.x1 AS bx1, y.y1 AS by1, y.x2 AS bx2, y.y2 AS by2
              FROM j x JOIN j y
                ON x.cluster_id = y.cluster_id AND x.seg_id < y.seg_id),
            {_traclus_chain()},
            per AS (
              SELECT a.cluster_id,
                     sum(round((d_perp + d_par + d_ang)
                               * (d_perp + d_par + d_ang), 6)) AS s
              FROM m6 JOIN asn a ON m6.a_seg = a.seg_id
              GROUP BY a.cluster_id),
            sizes AS (SELECT cluster_id, count(*) AS n_segs
                      FROM asn GROUP BY cluster_id)
            SELECT sizes.cluster_id, n_segs,
                   round(coalesce(per.s, 0.0) / n_segs, 3) AS sse
            FROM sizes LEFT JOIN per USING (cluster_id)
        """,
        "imc_tile_assignments": f"""
            WITH segs AS (SELECT seg_id, traj_id, (x1+x2)/2.0 AS px,
                                 (y1+y2)/2.0 AS py
                          FROM read_parquet('{segs_path}')),
            edges(tile_id, venue, ex1, ey1, ex2, ey2) AS (
              VALUES {_tile_edges_values()}),
            crossings AS (
              SELECT s.seg_id, e.tile_id,
                     sum(CASE WHEN ((e.ey1 > s.py) <> (e.ey2 > s.py))
                               AND s.px < e.ex1 + (s.py - e.ey1)
                                   / (e.ey2 - e.ey1) * (e.ex2 - e.ex1)
                          THEN 1 ELSE 0 END) AS c
              FROM segs s JOIN edges e
                ON e.venue = s.traj_id // {joins.TRAJ_VENUE_STRIDE}
              GROUP BY s.seg_id, e.tile_id),
            inside AS (SELECT seg_id, min(tile_id) AS tile_id
                       FROM crossings WHERE c % 2 = 1 GROUP BY seg_id)
            SELECT s.seg_id, coalesce(i.tile_id, -1)::BIGINT AS tile_id
            FROM segs s LEFT JOIN inside i USING (seg_id)
        """,
        # corridor buffers over the sweep walk: per-point spread =
        # 2 x quantile_cont(0.9) of |y' - avg y'| over crossings, width =
        # max(median spread, floor), n_vertices = 2 x deduped sweep points
        # (the miter ring never merges vertices)
        "imc_corridors": f"""
            WITH RECURSIVE
            {_sweep_walk_sql(segs_path, _assignments_glob())},
            cross2 AS (
              SELECT w.cluster_id, w.e, q.x, q.cnt, q.ysum,
                     s.ylo + (CASE WHEN (s.hi - s.lo) > 0
                              THEN (q.x - s.lo) / greatest(s.hi - s.lo, 1e-12)
                              ELSE 0.5 END) * (s.yhi - s.ylo) AS yint
              FROM swalk w
              JOIN evq q ON q.cluster_id = w.cluster_id AND q.e = w.e
              JOIN spans s ON s.cluster_id = w.cluster_id
                          AND s.lo <= q.x AND s.hi >= q.x),
            spreads AS (
              SELECT cluster_id, e,
                     2.0 * quantile_cont(abs(yint - ysum / cnt), 0.9) AS spread
              FROM cross2 GROUP BY cluster_id, e),
            outpts AS (
              SELECT em.cluster_id, em.e,
                     em.x * d.cx - em.avgy * d.cy AS ox,
                     em.x * d.cy + em.avgy * d.cx AS oy,
                     sp.spread
              FROM emitted em JOIN dirs d USING (cluster_id)
              JOIN spreads sp ON sp.cluster_id = em.cluster_id
                             AND sp.e = em.e),
            dedup2 AS (
              SELECT * FROM (
                SELECT *, lag(ox) OVER w2 AS px, lag(oy) OVER w2 AS py
                FROM outpts WINDOW w2 AS (PARTITION BY cluster_id ORDER BY e))
              WHERE px IS NULL OR ox <> px OR oy <> py),
            agg2 AS (
              SELECT cluster_id, count(*) AS m,
                     quantile_cont(spread, 0.5) AS med
              FROM dedup2 GROUP BY cluster_id)
            SELECT cluster_id,
                   round(greatest(med, {PARAMS.corridor_min_width!r}), 6)
                     AS width,
                   (2 * m)::BIGINT AS n_vertices
            FROM agg2 WHERE m >= 2
        """,
        # the representative-trajectory sweep in SQL: state-free per-event
        # crossing stats, precomputed γ-gap transitions, recursive replay
        "imc_rep_points": f"""
            WITH RECURSIVE
            {_sweep_walk_sql(segs_path, _assignments_glob())}
            SELECT e.cluster_id,
                   (row_number() OVER (PARTITION BY e.cluster_id
                                       ORDER BY e.e) - 1)::INT AS pt_seq,
                   round(e.x * d.cx - e.avgy * d.cy, 6) AS x,
                   round(e.x * d.cy + e.avgy * d.cx, 6) AS y
            FROM emitted e JOIN dirs d USING (cluster_id)
        """,
        # the full MDL trajectory-partitioning walk in SQL: set-wise
        # MDL_par precompute → first-break indices → recursive-CTE replay
        # (see _mdl_walk_sql docstring for the factoring argument)
        "imc_segments": f"""
            WITH RECURSIVE
            {_mdl_walk_sql(pages_path)}
            SELECT seg_id, traj_id, x1, y1, x2, y2 FROM mdl_out
            WHERE sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)) > 0
        """,
        # ε-entropy parameter search ([T] §4.4): the oracled ε-pair chain,
        # evaluated at three candidate ε via one lateral VALUES join; the
        # bbox prefilter uses the WIDEST candidate's gap bound (dist ≤ ε ⟹
        # gap ≤ 2ε, so the 2.4-candidate bound is complete for all three)
        "imc_param_entropy": f"""
            WITH s AS (SELECT seg_id, x1, y1, x2, y2
                       FROM read_parquet('{segs_path}')),
            cand AS (
              SELECT a.seg_id AS a_seg, b.seg_id AS b_seg,
                     {seg_cols_a}, {seg_cols_b}
              FROM s a JOIN s b ON a.seg_id < b.seg_id),
            pre AS (SELECT * FROM cand WHERE {bbox_gap2} <= {wide_gap2!r}),
            {_traclus_chain().replace('FROM cand', 'FROM pre', 1)},
            d AS MATERIALIZED (
              SELECT a_seg, b_seg, d_perp + d_par + d_ang AS dist FROM m6
              WHERE d_perp + d_par + d_ang <= {max(_ENTROPY_EPS)!r}),
            eps(eps) AS (VALUES {', '.join(f'({e!r}::DOUBLE)'
                                           for e in _ENTROPY_EPS)}),
            sym AS (SELECT e.eps, d.a_seg AS seg FROM eps e
                      JOIN d ON d.dist <= e.eps
                    UNION ALL
                    SELECT e.eps, d.b_seg FROM eps e
                      JOIN d ON d.dist <= e.eps),
            nb AS (SELECT eps, seg, count(*) AS n FROM sym GROUP BY eps, seg),
            deg AS (SELECT e.eps, (coalesce(nb.n, 0) + 1) AS n_eps
                    FROM s CROSS JOIN eps e
                    LEFT JOIN nb ON nb.eps = e.eps AND nb.seg = s.seg_id),
            agg AS (SELECT eps, sum(n_eps)::DOUBLE AS total, avg(n_eps) AS avg_n,
                           sum(n_eps * log2(n_eps)) AS nlogn
                    FROM deg GROUP BY eps)
            SELECT eps, round(log2(total) - nlogn / total, 6) AS entropy,
                   round(avg_n, 6) AS avg_n
            FROM agg
        """,
        # segment DBSCAN: ε-graph from the oracled pair chain; connected
        # components of the core-core subgraph via a recursive min-label
        # closure; border attach = min adjacent core component; |PTR| ≥
        # MinLns survival; dense-rank canonical ids — the full imc.dbscan
        # contract in ANSI SQL
        "imc_assignments": f"""
            WITH RECURSIVE
            s AS (SELECT seg_id, x1, y1, x2, y2
                  FROM read_parquet('{segs_path}')),
            cand AS (
              SELECT a.seg_id AS a_seg, b.seg_id AS b_seg,
                     {seg_cols_a}, {seg_cols_b}
              FROM s a JOIN s b ON a.seg_id < b.seg_id),
            pre AS (SELECT * FROM cand WHERE {bbox_gap2} <= {gap2!r}),
            {_traclus_chain().replace('FROM cand', 'FROM pre', 1)},
            pairs AS MATERIALIZED (
              SELECT a_seg, b_seg FROM m6
              WHERE d_perp + d_par + d_ang <= {PARAMS.eps!r}),
            sym AS MATERIALIZED (
              SELECT a_seg AS src, b_seg AS dst FROM pairs
              UNION ALL SELECT b_seg, a_seg FROM pairs),
            deg AS (SELECT s.seg_id, count(sym.dst) + 1 AS n_eps
                    FROM s LEFT JOIN sym ON sym.src = s.seg_id
                    GROUP BY s.seg_id),
            cores AS MATERIALIZED (
              SELECT seg_id FROM deg WHERE n_eps >= {PARAMS.min_lns}),
            ce AS MATERIALIZED (
              SELECT src, dst FROM sym
              WHERE src IN (SELECT seg_id FROM cores)
                AND dst IN (SELECT seg_id FROM cores)),
            reach(seg, r) AS (
              SELECT seg_id, seg_id FROM cores
              UNION
              SELECT reach.seg, ce.dst FROM reach JOIN ce ON ce.src = reach.r),
            comp AS (SELECT seg AS seg_id, min(r) AS comp FROM reach
                     GROUP BY seg),
            border AS (
              SELECT sym.src AS seg_id, min(c.comp) AS comp
              FROM sym JOIN comp c ON c.seg_id = sym.dst
              WHERE sym.src NOT IN (SELECT seg_id FROM cores)
              GROUP BY sym.src),
            assigned AS (
              SELECT seg_id, comp, TRUE AS is_core FROM comp
              UNION ALL SELECT seg_id, comp, FALSE AS is_core FROM border),
            keep AS (SELECT comp FROM assigned
                     GROUP BY comp
                     HAVING count(DISTINCT seg_id // {segments.SEG_ID_STRIDE})
                            >= {PARAMS.min_lns}),
            surv AS (SELECT * FROM assigned
                     WHERE comp IN (SELECT comp FROM keep)),
            ranked AS (SELECT comp,
                              (row_number() OVER (ORDER BY comp) - 1)::BIGINT
                                AS cluster_id
                       FROM (SELECT DISTINCT comp FROM surv))
            SELECT surv.seg_id, ranked.cluster_id, surv.is_core
            FROM surv JOIN ranked USING (comp)
        """,
        # supercover raster: mirrors kernels.grid_traverse_batch — all
        # grid-line crossing parameters t per segment via generate_series,
        # sorted; each positive-width inter-crossing interval's midpoint
        # identifies one traversed cell; hash-agg hit counts
        "imc_raster": f"""
            WITH {_raster_sql(segs_path)}
            SELECT venue, gx, gy, hits FROM rast
        """,
        # raster→vector polygon extraction in SQL: the boundary stitch's
        # successor is a PURE per-edge function (left-most-turn at
        # checkerboard junctions pairs in/out edges deterministically), so
        # loops are cycles of a precomputed succ graph (recursive closure);
        # components come from vertical-run CC; poly_id = dense rank of the
        # component's lex-min cell (the scan-order label); is_outer =
        # integer shoelace sign; n_vertices = direction changes (the
        # collinear collapse keeps exactly the corner vertices)
        "imc_polygons": f"""
            WITH RECURSIVE
            {_raster_sql(segs_path)},
            occ AS MATERIALIZED (
              SELECT venue, gx::BIGINT AS gx, gy::BIGINT AS gy
              FROM rast WHERE hits >= {PARAMS.raster_threshold}),
            runs AS MATERIALIZED (
              SELECT venue, gx, min(gy) AS glo, max(gy) AS ghi,
                     ((gx + {_KB}) * {_KM} + (min(gy) + {_KB})) AS rk
              FROM (SELECT *, gy - (row_number() OVER (
                        PARTITION BY venue, gx ORDER BY gy)) AS grp
                    FROM occ)
              GROUP BY venue, gx, grp),
            radj AS MATERIALIZED (
              SELECT a.venue, a.rk AS ka, b.rk AS kb
              FROM runs a JOIN runs b
                ON b.venue = a.venue AND abs(b.gx - a.gx) = 1
               AND b.glo <= a.ghi AND b.ghi >= a.glo),
            rreach(venue, rk, r) AS (
              SELECT venue, rk, rk FROM runs
              UNION
              SELECT rr.venue, rr.rk, a.kb FROM rreach rr
              JOIN radj a ON a.venue = rr.venue AND a.ka = rr.r),
            rcomp AS MATERIALIZED (
              SELECT venue, rk, min(r) AS ck FROM rreach
              GROUP BY venue, rk),
            cellc AS MATERIALIZED (
              SELECT o.venue, o.gx, o.gy, rc.ck
              FROM occ o
              JOIN runs r ON r.venue = o.venue AND r.gx = o.gx
                         AND o.gy BETWEEN r.glo AND r.ghi
              JOIN rcomp rc ON rc.venue = r.venue AND rc.rk = r.rk),
            pid AS MATERIALIZED (
              SELECT venue, ck,
                     dense_rank() OVER (PARTITION BY venue
                                        ORDER BY ck)::INT AS poly_id
              FROM (SELECT DISTINCT venue, ck FROM cellc)),
            bedges AS MATERIALIZED (
              SELECT c.venue, c.ck,
                     CASE d.i WHEN 0 THEN c.gx     WHEN 1 THEN c.gx + 1
                              WHEN 2 THEN c.gx     ELSE c.gx + 1 END AS sx,
                     CASE d.i WHEN 0 THEN c.gy + 1 WHEN 1 THEN c.gy
                              WHEN 2 THEN c.gy     ELSE c.gy + 1 END AS sy,
                     CASE d.i WHEN 0 THEN 0  WHEN 1 THEN 0
                              WHEN 2 THEN 1  ELSE -1 END AS dx,
                     CASE d.i WHEN 0 THEN -1 WHEN 1 THEN 1
                              WHEN 2 THEN 0  ELSE 0 END AS dy
              FROM cellc c, (VALUES (0), (1), (2), (3)) d(i)
              WHERE NOT EXISTS (
                SELECT 1 FROM occ n
                WHERE n.venue = c.venue
                  AND n.gx = c.gx + CASE d.i WHEN 0 THEN -1
                                             WHEN 1 THEN 1 ELSE 0 END
                  AND n.gy = c.gy + CASE d.i WHEN 2 THEN -1
                                             WHEN 3 THEN 1 ELSE 0 END)),
            beid AS MATERIALIZED (
              SELECT *, sx + dx AS ex, sy + dy AS ey,
                     (((sx + {_KB}) * {_KM} + (sy + {_KB})) * 4
                      + CASE WHEN dx = 1 THEN 0 WHEN dx = -1 THEN 1
                             WHEN dy = 1 THEN 2 ELSE 3 END) AS id
              FROM bedges),
            bsucc AS MATERIALIZED (
              SELECT e.venue, e.id, e.ck, e.sx, e.sy, e.ex, e.ey,
                     e.dx, e.dy, f.id AS nid, f.dx AS ndx, f.dy AS ndy
              FROM beid e JOIN beid f
                ON f.venue = e.venue AND f.sx = e.ex AND f.sy = e.ey
              QUALIFY row_number() OVER (
                PARTITION BY e.venue, e.id
                ORDER BY CASE WHEN (f.dx, f.dy) = (-e.dy, e.dx) THEN 0
                              WHEN (f.dx, f.dy) = (e.dx, e.dy) THEN 1
                              ELSE 2 END) = 1),
            lreach(venue, id, r) AS (
              SELECT venue, id, id FROM bsucc
              UNION
              SELECT lr.venue, lr.id, s.nid FROM lreach lr
              JOIN bsucc s ON s.venue = lr.venue AND s.id = lr.r),
            lid AS (SELECT venue, id, min(r) AS loop_id FROM lreach
                    GROUP BY venue, id),
            loops AS (
              SELECT l.venue, l.loop_id, min(s.ck) AS ck,
                     sum(s.sx * s.ey - s.ex * s.sy) AS area2,
                     sum(CASE WHEN s.ndx <> s.dx OR s.ndy <> s.dy
                              THEN 1 ELSE 0 END) AS n_vertices
              FROM lid l JOIN bsucc s
                ON s.venue = l.venue AND s.id = l.id
              GROUP BY l.venue, l.loop_id)
            SELECT lo.venue, p.poly_id, (lo.area2 > 0) AS is_outer,
                   lo.n_vertices::BIGINT AS n_vertices
            FROM loops lo JOIN pid p
              ON p.venue = lo.venue AND p.ck = lo.ck
        """,
        "dedup_simhash": f"""
            WITH {_simhash_cte()}
            SELECT doc_id, simhash FROM sig
        """,
        "dedup_simhash_pairs": f"""
            WITH {_simhash_cte()},
            blocks AS (
              SELECT doc_id, simhash, blk,
                     ((simhash >> (16 * blk)) & 65535) AS key
              FROM sig, (VALUES (0), (1), (2), (3)) b(blk)),
            cand AS (
              SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                     a.simhash AS a_sh, b.simhash AS b_sh
              FROM blocks a JOIN blocks b
                ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id)
            SELECT a_id, b_id, bit_count(xor(a_sh, b_sh))::INT AS hamming
            FROM cand WHERE bit_count(xor(a_sh, b_sh)) <= 3
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
                   count(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "dedup_minhash_sigs": f"WITH sigs AS ({_sigs_cte()}) "
                              f"SELECT doc_id, {sig_cols} FROM sigs",
        "dedup_lsh_pairs": f"""
            WITH sigs AS ({_sigs_cte()}),
            bands AS ({_bands_cte()})
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        """,
        "dedup_jaccard_pairs": f"""
            WITH sigs AS ({_sigs_cte()}),
            bands AS ({_bands_cte()}),
            {_verified_pairs_cte(0.7)}
            SELECT a_id, b_id, jaccard FROM vpairs
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE sigs AS ({_sigs_cte()}),
            bands AS ({_bands_cte()}),
            {_verified_pairs_cte(0.7)},
            edges AS MATERIALIZED (
              SELECT a_id, b_id FROM vpairs
              UNION ALL
              SELECT b_id, a_id FROM vpairs),
            reach AS (
              SELECT doc_id, doc_id AS r FROM documents
              UNION
              SELECT e.a_id AS doc_id, r.r
              FROM edges e JOIN reach r ON e.b_id = r.doc_id)
            SELECT doc_id, min(r) AS cluster_id,
                   (doc_id = min(r)) AS is_keeper
            FROM reach GROUP BY doc_id
        """,
        "text_split": """
            WITH h AS (SELECT doc_id, md5(doc_id::VARCHAR) AS hx
                       FROM documents),
            b AS (SELECT doc_id,
                   ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
                  + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
                  + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)
                   )::BIGINT % 100 AS bucket
                  FROM h)
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 10 THEN 'test'
                        WHEN bucket < 20 THEN 'val'
                        ELSE 'train' END AS split
            FROM b
        """,
        "text_source_quota": """
            WITH r AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rn
              FROM documents)
            SELECT doc_id, source, rn::BIGINT AS rn FROM r WHERE rn <= 20
        """,
        "text_decontaminate": f"""
            WITH bench AS (SELECT * FROM documents WHERE doc_id % 37 = 0),
            corpus AS (SELECT * FROM documents WHERE doc_id % 37 <> 0),
            bh AS (SELECT DISTINCT md5(s) AS h FROM (
                     SELECT unnest({_SHINGLES}) AS s FROM bench)),
            ds AS (SELECT doc_id, md5(s) AS h FROM (
                     SELECT doc_id, unnest({_SHINGLES}) AS s FROM corpus)),
            hits AS (SELECT doc_id, count(*) AS n FROM ds
                     WHERE h IN (SELECT h FROM bh) GROUP BY doc_id)
            SELECT c.doc_id, coalesce(n, 0)::BIGINT AS n_hits,
                   coalesce(n, 0) >= 1 AS contaminated
            FROM corpus c LEFT JOIN hits USING (doc_id)
        """,
        "text_pii": f"""
            WITH s AS (
              SELECT doc_id,
                     len(regexp_extract_all(text,
                         '{textops.PII_EMAIL}'))::BIGINT AS n_emails,
                     regexp_replace(text, '{textops.PII_EMAIL}',
                                    '<EMAIL>', 'g') AS ne
              FROM documents)
            SELECT doc_id, n_emails,
                   len(regexp_extract_all(ne,
                       '{textops.PII_PHONE}'))::BIGINT AS n_phones,
                   md5(regexp_replace(ne, '{textops.PII_PHONE}',
                                      '<PHONE>', 'g')) AS clean_sha
            FROM s
        """,
        "text_repetition": r"""
            WITH l AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)),
                                 x -> length(trim(x)) > 0) AS lines
              FROM documents),
            base AS (
              SELECT doc_id, len(lines)::BIGINT AS n_lines,
                     CASE WHEN len(lines) > 0
                          THEN round(1.0 - len(list_distinct(lines))::DOUBLE
                                           / len(lines)::DOUBLE, 6)
                          ELSE 0.0 END AS dup_line_frac
              FROM l),
            w AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS words
              FROM documents),
            i AS (
              SELECT doc_id, words,
                     unnest(generate_series(1, len(words) - 1)) AS i
              FROM w WHERE len(words) >= 2),
            g AS (
              SELECT doc_id, words[i] || ' ' || words[i + 1] AS g FROM i),
            top AS (
              SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM (
                SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
              GROUP BY doc_id)
            SELECT b.doc_id, b.n_lines, b.dup_line_frac,
                   coalesce(round(mx::DOUBLE / tot::DOUBLE, 6), 0.0)
                     AS top_bigram_frac
            FROM base b LEFT JOIN top USING (doc_id)
        """,
        "text_boilerplate": r"""
            WITH l AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(ls))) AS pos,
                     unnest(ls) AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                    FROM documents)),
            b AS (
              SELECT md5(line) AS k FROM l
              WHERE length(trim(line)) > 0
              GROUP BY md5(line)
              HAVING count(DISTINCT doc_id) >= 2),
            m AS (
              SELECT doc_id, pos, line,
                     md5(line) IN (SELECT k FROM b) AS boiler
              FROM l)
            SELECT doc_id, count(*)::BIGINT AS n_lines,
                   sum(CASE WHEN boiler THEN 1 ELSE 0 END)::BIGINT
                     AS n_removed,
                   md5(coalesce(
                       string_agg(CASE WHEN NOT boiler THEN line END,
                                  chr(10) ORDER BY pos), ''))
                     AS clean_sha
            FROM m GROUP BY doc_id
        """,
        "text_dup_spans": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS w
              FROM documents),
            sh AS (
              SELECT doc_id, i AS pos,
                     md5(array_to_string(w[i:i+7], ' ')) AS h
              FROM toks,
                   unnest(generate_series(1, greatest(len(w) - 7, 0)))
                     AS t(i)),
            dup AS (
              SELECT h FROM sh GROUP BY h
              HAVING count(DISTINCT doc_id) >= 2),
            hits AS (
              SELECT doc_id, pos FROM sh
              WHERE h IN (SELECT h FROM dup)),
            brk AS (
              SELECT doc_id, pos,
                     CASE WHEN pos > lag(pos) OVER (
                            PARTITION BY doc_id ORDER BY pos) + 8
                          THEN 1 ELSE 0 END AS b
              FROM hits),
            grp AS (
              SELECT doc_id, pos,
                     sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS gid
              FROM brk)
            SELECT doc_id, min(pos)::BIGINT AS span_start,
                   (max(pos) + 7)::BIGINT AS span_end,
                   count(*)::BIGINT AS n_shingles
            FROM grp GROUP BY doc_id, gid
        """,
        "text_scrub_substr": r"""
            WITH toks0 AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS w
              FROM documents),
            sh AS (
              SELECT doc_id, i AS pos,
                     md5(array_to_string(w[i:i+7], ' ')) AS h
              FROM toks0,
                   unnest(generate_series(1, greatest(len(w) - 7, 0)))
                     AS t(i)),
            dup AS (
              SELECT h FROM sh GROUP BY h
              HAVING count(DISTINCT doc_id) >= 2),
            occ AS (
              SELECT doc_id, pos,
                     row_number() OVER (PARTITION BY h
                                        ORDER BY doc_id, pos) AS rn
              FROM sh WHERE h IN (SELECT h FROM dup)),
            cov AS (
              SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7))
                       AS pos
              FROM occ WHERE rn > 1),
            toks AS (
              SELECT doc_id, i AS pos, w[i] AS tok
              FROM toks0, unnest(generate_series(1, len(w))) AS t(i)),
            marked AS (
              SELECT t.doc_id, t.pos, t.tok, c.pos IS NOT NULL AS cut
              FROM toks t LEFT JOIN cov c
                ON t.doc_id = c.doc_id AND t.pos = c.pos)
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   sum(CASE WHEN cut THEN 1 ELSE 0 END)::BIGINT
                     AS n_removed,
                   md5(coalesce(
                       string_agg(CASE WHEN NOT cut THEN tok END, ' '
                                  ORDER BY pos), ''))
                     AS clean_sha
            FROM marked GROUP BY doc_id
        """,
        "text_mix": r"""
            WITH t AS (
              SELECT doc_id, source,
                     len(regexp_extract_all(text, '\S+'))::BIGINT
                       AS n_tokens,
                     md5(doc_id::VARCHAR) AS h
              FROM documents),
            ns AS (SELECT count(DISTINCT source) AS n FROM t),
            c AS (
              SELECT doc_id, source, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY h, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0)::BIGINT AS cum_before
              FROM t)
            SELECT doc_id, source, n_tokens, cum_before,
                   cum_before < 10000.0 / (SELECT n FROM ns) AS selected
            FROM c
        """,
        "text_pack": r"""
            WITH t AS (SELECT doc_id,
                              len(regexp_extract_all(text, '\S+'))::BIGINT
                                AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, n_tokens,
                         coalesce(sum(n_tokens) OVER (
                            ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                            PRECEDING AND 1 PRECEDING), 0)::BIGINT
                           AS start_offset
                  FROM t)
            SELECT doc_id, n_tokens, start_offset,
                   (start_offset // 2048)::BIGINT AS first_chunk,
                   greatest(start_offset // 2048,
                            (start_offset + n_tokens - 1) // 2048)::BIGINT
                     AS last_chunk
            FROM c
        """,
        "text_tokens": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars_text
            FROM documents
        """,
        "text_quality": r"""
            WITH t AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\S+')) AS nt,
                     len(regexp_extract_all(text, '[.,;:!?]')) AS np,
                     len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS ns,
                     greatest(length(text), 1) AS nc
              FROM documents)
            SELECT doc_id, nt::BIGINT AS n_tokens,
                   round(np::DOUBLE / nc::DOUBLE, 6) AS punct_ratio,
                   round(ns::DOUBLE / greatest(nt, 1)::DOUBLE, 6) AS stop_ratio,
                   least(nt::DOUBLE / 100.0, 1.0) * 0.5
                   + least(round(ns::DOUBLE / greatest(nt, 1)::DOUBLE, 6) * 5.0,
                           1.0) * 0.3
                   + (1.0 - least(round(np::DOUBLE / nc::DOUBLE, 6) * 10.0,
                                  1.0)) * 0.2 AS quality
            FROM t
        """,
        "text_langid": r"""
            WITH t AS (
              SELECT doc_id,
                 len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS c_en,
                 len(regexp_extract_all(lower(text), '\b(el|la|los|que|de)\b')) AS c_es,
                 len(regexp_extract_all(lower(text), '\b(der|die|und|das|nicht)\b')) AS c_de,
                 len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b')) AS c_fr
              FROM documents)
            SELECT doc_id,
                   CASE WHEN c_en = greatest(c_en, c_es, c_de, c_fr) THEN 'en'
                        WHEN c_es = greatest(c_en, c_es, c_de, c_fr) THEN 'es'
                        WHEN c_de = greatest(c_en, c_es, c_de, c_fr) THEN 'de'
                        ELSE 'fr' END AS pred_lang
            FROM t
        """,
        "text_fingerprint": r"""
            SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "media_metadata": """
            SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
                   sha256(text) AS sha256
            FROM documents
        """,
        # frame sampling over the blob adapter; char slicing == byte
        # slicing because the driver corpus is pure ASCII (asserted when
        # this oracle was written — a multibyte corpus would need blob
        # slicing, which DuckDB lacks)
        "media_frames": """
            WITH f AS (
              SELECT doc_id, text,
                     unnest(generate_series(0, (length(text) - 1) // 256))
                       AS frame_no
              FROM documents WHERE length(text) > 0)
            SELECT doc_id, frame_no::INT AS frame_no,
                   octet_length(encode(substring(text, frame_no * 256 + 1,
                                                 256)))::BIGINT AS n_bytes,
                   sha256(substring(text, frame_no * 256 + 1, 256))
                     AS sha256
            FROM f WHERE frame_no % 2 = 0
        """,
        "ann_topk": f"""
            WITH probes AS (
              SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
            scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     {cos} AS score
              FROM probes a JOIN embeddings b ON a.vec_id <> b.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, score, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 5
        """,
        "ann_topk_lsh": f"""
            WITH wb AS (
              SELECT vec_id, embedding, {bucket_expr} AS bucket FROM embeddings),
            probes AS (SELECT * FROM wb WHERE vec_id % 50 = 0),
            scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     {cos} AS score
              FROM probes a JOIN wb b
                ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, score, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 5
        """,
        "dedup_embcos_pairs": f"""
            WITH {_embcos_pairs_cte(0.45, 6, 4)}
            SELECT a_id, b_id, cos FROM epairs
        """,
        "dedup_embcos_clusters": f"""
            WITH RECURSIVE {_embcos_pairs_cte(0.45, 6, 4)},
            eedges AS MATERIALIZED (
              SELECT a_id, b_id FROM epairs
              UNION ALL
              SELECT b_id, a_id FROM epairs),
            ereach AS (
              SELECT vec_id, vec_id AS r FROM embeddings
              UNION
              SELECT e.a_id AS vec_id, r.r
              FROM eedges e JOIN ereach r ON e.b_id = r.vec_id)
            SELECT vec_id, min(r) AS cluster_id,
                   (vec_id = min(r)) AS is_keeper
            FROM ereach GROUP BY vec_id
        """,
        "text_corpus_stats": r"""
            SELECT CASE WHEN grouping(lang) = 1 THEN '(all)'
                        ELSE coalesce(lang, '(null)') END AS lang,
                   CASE WHEN grouping(source) = 1 THEN '(all)'
                        ELSE coalesce(source, '(null)') END AS source,
                   count(*)::BIGINT AS n_docs,
                   sum(len(regexp_extract_all(text, '\S+')))::BIGINT
                     AS n_tokens
            FROM documents GROUP BY ROLLUP (lang, source)
        """,
        "text_quantiles": r"""
            SELECT lang, count(*) AS n_docs,
                   round(quantile_cont(n_chars::DOUBLE, 0.5), 6) AS p50,
                   round(quantile_cont(n_chars::DOUBLE, 0.9), 6) AS p90,
                   round(quantile_cont(n_chars::DOUBLE, 0.99), 6) AS p99
            FROM documents GROUP BY lang
        """,
        "text_top_terms": r"""
            WITH tok AS (
              SELECT lang,
                     unnest(regexp_extract_all(lower(text), '\S+')) AS term
              FROM documents),
            c AS (SELECT lang, term, count(*) AS n
                  FROM tok GROUP BY lang, term),
            r AS (SELECT lang, term, n,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY n DESC, term) AS rk
                  FROM c)
            SELECT lang, term, n, rk::BIGINT AS rk FROM r WHERE rk <= 10
        """,
        "ann_topk_ivf": f"""
            WITH seeds AS ({_ivf_seeds_sql()}),
            ascored AS (
              SELECT e.vec_id, e.embedding, s.list_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                  s.c_emb::DOUBLE[]), 6)
                       AS a_cos
              FROM embeddings e CROSS JOIN seeds s),
            aranked AS (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                         ORDER BY a_cos DESC, list_id) AS lrank
              FROM ascored),
            lists AS (SELECT vec_id, list_id FROM aranked WHERE lrank = 1),
            probes AS (SELECT vec_id AS query_id, list_id FROM aranked
                       WHERE vec_id % 50 = 0 AND lrank <= 4),
            cand AS (
              SELECT DISTINCT p.query_id, l.vec_id AS neighbor_id
              FROM probes p JOIN lists l USING (list_id)
              WHERE l.vec_id <> p.query_id),
            scored AS (
              SELECT c.query_id, c.neighbor_id,
                     round(list_cosine_similarity(qa.embedding::DOUBLE[],
                                                  qb.embedding::DOUBLE[]), 6)
                       AS score
              FROM cand c JOIN embeddings qa ON qa.vec_id = c.query_id
                          JOIN embeddings qb ON qb.vec_id = c.neighbor_id),
            ranked AS (
              SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id)
                       AS rank
              FROM scored)
            SELECT query_id, neighbor_id, score, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 5
        """,
        "ann_topk_pq": f"""
            WITH cb AS ({_pq_cb_sql()}),
            nb AS (
              SELECT vec_id,
                     list_transform(embedding::DOUBLE[],
                       x -> x / greatest(sqrt(list_inner_product(
                              embedding::DOUBLE[], embedding::DOUBLE[])),
                            1e-300)) AS nv
              FROM embeddings),
            sub AS (
              SELECT n.vec_id, cb.j, cb.code,
                     round(list_inner_product(n.nv[cb.lo:cb.hi],
                                              cb.c_emb) - cb.hn, 6) AS s
              FROM nb n CROSS JOIN cb),
            enc AS (
              SELECT vec_id, j, code FROM (
                SELECT vec_id, j, code,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY s DESC, code) AS rn
                FROM sub) WHERE rn = 1),
            luts AS (
              SELECT n.vec_id AS query_id, cb.j, cb.code,
                     round(list_inner_product(n.nv[cb.lo:cb.hi],
                                              cb.c_emb), 6) AS lv
              FROM nb n CROSS JOIN cb WHERE n.vec_id % 50 = 0),
            adc AS (
              SELECT l.query_id, e.vec_id AS neighbor_id,
                     round(sum(l.lv), 6) AS a
              FROM enc e JOIN luts l ON l.j = e.j AND l.code = e.code
              WHERE l.query_id <> e.vec_id
              GROUP BY l.query_id, e.vec_id),
            cand AS (
              SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY a DESC, neighbor_id)
                         AS arank
                FROM adc) WHERE arank <= 20),
            scored AS (
              SELECT c.query_id, c.neighbor_id,
                     round(list_cosine_similarity(qa.embedding::DOUBLE[],
                                                  qb.embedding::DOUBLE[]),
                           6) AS score
              FROM cand c JOIN embeddings qa ON qa.vec_id = c.query_id
                          JOIN embeddings qb ON qb.vec_id = c.neighbor_id)
            SELECT query_id, neighbor_id, score, rank::BIGINT AS rank
            FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY score DESC,
                                                    neighbor_id) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "ann_topk_lsh_multi": f"""
            WITH mb AS ({_lsh_multi_bucket_sql(12, 4)}),
            wb AS (SELECT e.vec_id, e.embedding, m.tbl, m.bucket
                   FROM embeddings e JOIN mb m USING (vec_id)),
            probes AS (SELECT * FROM wb WHERE vec_id % 50 = 0),
            cand AS (
              SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
              FROM probes a JOIN wb b
                ON a.tbl = b.tbl AND a.bucket = b.bucket
               AND a.vec_id <> b.vec_id),
            scored AS (
              SELECT c.query_id, c.neighbor_id,
                     round(list_cosine_similarity(qa.embedding::DOUBLE[],
                                                  qb.embedding::DOUBLE[]), 6) AS score
              FROM cand c JOIN embeddings qa ON qa.vec_id = c.query_id
                          JOIN embeddings qb ON qb.vec_id = c.neighbor_id),
            ranked AS (
              SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, score, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 5
        """,
        "rel_event_pairs": """
            WITH t AS (
              SELECT user_id, event_id,
                     lead(event_id) OVER w AS next_event_id,
                     lead(ts) OVER w AS next_ts, ts
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, event_id, next_event_id,
                   (floor(epoch(next_ts))::BIGINT
                    - floor(epoch(ts))::BIGINT) AS dt_sec
            FROM t WHERE next_event_id IS NOT NULL
        """,
        "rel_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "rel_top_customers": """
            SELECT c_custkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey HAVING count(*) >= 3
        """,
        "rel_shipping_priority": """
            WITH agg AS (
              SELECT o_orderkey, o_orderdate, o_orderpriority,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              FROM customer JOIN orders ON c_custkey = o_custkey
                            JOIN lineitem ON o_orderkey = l_orderkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1995-03-15'
                AND l_shipdate > TIMESTAMP '1995-03-15'
              GROUP BY o_orderkey, o_orderdate, o_orderpriority)
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_orderpriority, revenue,
                   row_number() OVER (ORDER BY revenue DESC, o_orderkey)
                     ::BIGINT AS rk
            FROM agg QUALIFY rk <= 10
        """,
        "rel_sessions": """
            WITH g AS (
              SELECT user_id, event_id, ts,
                     floor(epoch(ts))::BIGINT
                     - floor(epoch(lag(ts) OVER w))::BIGINT AS gap
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, ts,
                     sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
              FROM g)
            SELECT user_id, session_no::BIGINT AS session_no,
                   count(*) AS n_events,
                   (floor(epoch(max(ts)))::BIGINT
                    - floor(epoch(min(ts)))::BIGINT) AS dur_sec
            FROM s GROUP BY user_id, session_no
        """,
        "rel_props_json": """
            SELECT event_type, count(*) AS n_events,
                   sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
                   min(json_extract(props, '$.k')::BIGINT) AS min_k,
                   max(json_extract(props, '$.k')::BIGINT) AS max_k
            FROM events GROUP BY event_type
        """,
        "rel_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                     AS win_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "rel_asof": """
            WITH c AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'click'),
                 p AS (SELECT user_id, event_id, ts FROM events
                       WHERE event_type = 'purchase')
            SELECT p.user_id, p.event_id,
                   strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
                   coalesce(strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f'), '')
                     AS click_ts,
                   coalesce(floor(epoch(p.ts))::BIGINT
                            - floor(epoch(c.ts))::BIGINT, -1) AS gap_sec
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "rel_region_revenue": """
            SELECT r_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
                        JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
    }
