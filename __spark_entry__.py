"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query groups (SURVEY.md §2 coverage):
  * imc_*       — the TRACLUS spatial pipeline operators on the synthetic
                  pages corpus (fixtures/gen_pages.py, derived from sf_dir's
                  scale). Geometry is not ANSI-SQL-expressible → rows-only
                  checks; exactness is gated by the committed golden
                  fixtures (tests/test_golden.py) instead.
  * dedup_* / text_* / media_* / ann_* — web-corpus training-data ops over
                  the driver's documents/embeddings tables, each with an
                  exactly-matching DuckDB oracle.
  * rel_*       — relational primitives the pipeline relies on (window
                  sequencing, hash aggregation, joins), oracled.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fixtures import gen_pages  # noqa: E402
from imc import (dbscan, extract, joins, multimodal, raster,  # noqa: E402
                 segments, similarity, sweep, textops)
from imc.config import IMCParams  # noqa: E402

PARAMS = IMCParams(eps=1.2, min_lns=3)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else 0.01


def _fixture_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(gen_pages.ensure_pages(sf=_sf_of(sf_dir)))


def _fixture_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDL segments for the fixture corpus, cached as parquet next to the
    pages fixture (deterministic content; several queries() entries share
    this prefix, and the driver runs them in separate actions)."""
    pages_path = gen_pages.ensure_pages(sf=_sf_of(sf_dir))
    seg_path = os.path.join(os.path.dirname(pages_path), "segments.parquet")
    if not os.path.exists(seg_path):
        pts = extract.pages_to_points(spark.read.parquet(pages_path))
        segments.mdl_segments(pts).write.mode("overwrite").parquet(seg_path)
    return spark.read.parquet(seg_path)


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

    # ---- TRACLUS pipeline (rows-only; exactness gated by goldens) ----
    def imc_points(spark, sf_dir):
        return extract.pages_to_points(_fixture_pages(spark, sf_dir))

    def imc_text_sha(spark, sf_dir):
        return extract.text_sha(_fixture_pages(spark, sf_dir))

    def imc_segments(spark, sf_dir):
        return _fixture_segments(spark, sf_dir)

    def imc_eps_pairs(spark, sf_dir):
        return joins.eps_join(_fixture_segments(spark, sf_dir), PARAMS)

    def imc_knn(spark, sf_dir):
        segs = _fixture_segments(spark, sf_dir)
        return joins.knn_join(segs, segs, k=3, params=PARAMS)

    def imc_assignments(spark, sf_dir):
        segs = _fixture_segments(spark, sf_dir)
        segs.cache()
        return dbscan.dbscan(segs, joins.eps_join(segs, PARAMS), PARAMS)

    def imc_rep_points(spark, sf_dir):
        segs = _fixture_segments(spark, sf_dir)
        segs.cache()
        assign = dbscan.dbscan(segs, joins.eps_join(segs, PARAMS), PARAMS)
        return sweep.representative_trajectories(segs, assign, PARAMS)

    def imc_tile_assignments(spark, sf_dir):
        segs = _fixture_segments(spark, sf_dir)
        n_venues = max(1, gen_pages.n_pages_for_sf(_sf_of(sf_dir))
                       // gen_pages.PAGES_PER_VENUE)
        return joins.tile_assignments(segs, gen_pages.all_tiles(n_venues))

    def imc_raster(spark, sf_dir):
        return raster.rasterize(_fixture_segments(spark, sf_dir), PARAMS)

    def imc_polygons(spark, sf_dir):
        rast = raster.rasterize(_fixture_segments(spark, sf_dir), PARAMS)
        return (raster.extract_polygons(rast, PARAMS)
                .select("venue", "poly_id", "is_outer",
                        F.size("ring").cast("long").alias("n_vertices")))

    q.update(imc_points=imc_points, imc_text_sha=imc_text_sha,
             imc_segments=imc_segments, imc_eps_pairs=imc_eps_pairs,
             imc_knn=imc_knn, imc_assignments=imc_assignments,
             imc_rep_points=imc_rep_points,
             imc_tile_assignments=imc_tile_assignments,
             imc_raster=imc_raster, imc_polygons=imc_polygons)

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

    def media_metadata(spark, sf_dir):
        return multimodal.media_metadata(_tbl(spark, sf_dir, "documents"))

    def ann_topk(spark, sf_dir):
        return similarity.ann_topk_bruteforce(_tbl(spark, sf_dir, "embeddings"),
                                              k=5, probe_mod=50)

    def ann_topk_lsh(spark, sf_dir):
        return similarity.ann_topk_lsh(_tbl(spark, sf_dir, "embeddings"),
                                       k=5, probe_mod=50, bits=8)

    q.update(dedup_exact=dedup_exact, dedup_minhash_sigs=dedup_minhash_sigs,
             dedup_lsh_pairs=dedup_lsh_pairs,
             dedup_jaccard_pairs=dedup_jaccard_pairs,
             dedup_simhash=dedup_simhash,
             dedup_simhash_pairs=dedup_simhash_pairs,
             text_tokens=text_tokens, text_quality=text_quality,
             text_langid=text_langid, text_fingerprint=text_fingerprint,
             media_metadata=media_metadata,
             ann_topk=ann_topk, ann_topk_lsh=ann_topk_lsh)

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

    q.update(rel_event_pairs=rel_event_pairs,
             rel_pricing_summary=rel_pricing_summary,
             rel_top_customers=rel_top_customers)
    return q


# --------------------------------------------------------------- oracles

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


def oracle_sql() -> dict[str, str]:
    k = textops.MINHASH_K
    sig_cols = ", ".join(f"sig_{i}" for i in range(k))
    bucket_expr = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(8))
    cos = ("round(list_cosine_similarity(a.embedding::DOUBLE[], "
           "b.embedding::DOUBLE[]), 6)")
    return {
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
            cand AS (
              SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
            sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents)
            SELECT a_id, b_id,
                   round(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                         greatest(len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE,
                                  1.0), 6) AS jaccard
            FROM cand JOIN sh sa ON cand.a_id = sa.doc_id
                      JOIN sh sb ON cand.b_id = sb.doc_id
            WHERE round(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                        greatest(len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE,
                                 1.0), 6) >= 0.7
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
    }
