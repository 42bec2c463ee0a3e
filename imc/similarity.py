"""Embedding similarity search over `embeddings(vec_id, embedding, label)`.

Brute-force cosine top-k is the correctness baseline: probes are broadcast
and scored with a numpy matmul inside mapInPandas (Arrow batches, one pass
over the base table, no shuffle until the per-probe top-k aggregation).
The scale path is sign-bucket LSH: an 8-bit hyperoctant key turns the
all-pairs problem into an equi-join — the same prefilter-then-refine shape
as the spatial ε-join (SURVEY.md §2.4).

Dot products are accumulated in float64 in ascending dimension order and
scores rounded to 6 decimals so the DuckDB oracle (explicit unnest-sum SQL
in __spark_entry__) reproduces values bitwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType()),
    T.StructField("neighbor_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
])


def _score_block(q_ids, q_mat, q_norm, b_ids, b_mat, k):
    b_norm = np.sqrt((b_mat * b_mat).sum(axis=1))
    denom = np.maximum(np.outer(q_norm, b_norm), 1e-300)
    scores = (q_mat @ b_mat.T) / denom
    rows = []
    for qi in range(len(q_ids)):
        s = scores[qi]
        mask = b_ids != q_ids[qi]
        ids = b_ids[mask]
        sv = s[mask]
        if len(ids) == 0:
            continue
        # partial top-(k+8) within the block (slack so rounded-score ties at
        # the k boundary can't be lost before the final window top-k)
        take = min(k + 8, len(ids))
        part = np.argpartition(-sv, take - 1)[:take]
        for j in part:
            rows.append((int(q_ids[qi]), int(ids[j]), float(sv[j])))
    return rows


def ann_topk_bruteforce(embeddings: DataFrame, k: int = 5,
                        probe_mod: int = 50) -> DataFrame:
    """Exact cosine top-k for probe vectors (vec_id % probe_mod == 0)
    against the full table. Returns (query_id, neighbor_id, score, rank).

    Probes are collected (a small, bounded set) and broadcast inside a
    mapInPandas closure; each base partition computes a partial top-k, the
    final top-k is a window over k×n_partitions rows per probe.
    """
    probes = (embeddings.filter(F.col("vec_id") % probe_mod == 0)
              .select("vec_id", "embedding").toPandas())
    q_ids = probes["vec_id"].to_numpy(np.int64)
    q_mat = np.stack([np.asarray(v, dtype=np.float64) for v in probes["embedding"]])
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def scan(batches):
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(np.int64)
            b_mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            rows = _score_block(q_ids, q_mat, q_norm, b_ids, b_mat, k)
            if rows:
                yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    partial = embeddings.select("vec_id", "embedding").mapInPandas(scan, _TOPK_SCHEMA)
    # rank on the ROUNDED score with a neighbor_id tie-break: selection is
    # then insensitive to last-ulp summation-order differences, so the
    # DuckDB oracle reproduces rows exactly
    w = Window.partitionBy("query_id").orderBy(F.desc("r_score"), F.asc("neighbor_id"))
    return (partial
            .withColumn("r_score", F.round("score", 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.col("r_score").alias("score"), "rank"))


def sign_bucket(embeddings: DataFrame, bits: int = 8) -> DataFrame:
    """(vec_id, bucket) — hyperoctant LSH key from the signs of the first
    `bits` dimensions (deterministic, SQL-expressible). NULL elements and
    embeddings shorter than `bits` dims map to bucket bit 0 (coalesce), the
    same semantics as the DuckDB oracle's CASE ... ELSE 0 — no row is ever
    silently dropped from the LSH join."""
    b = None
    for i in range(bits):
        bit = F.coalesce((F.try_element_at("embedding", F.lit(i + 1)) > 0).cast("long"),
                         F.lit(0)) * F.lit(1 << i)
        b = bit if b is None else b + bit
    return embeddings.select("vec_id", b.alias("bucket"))


def ann_topk_lsh(embeddings: DataFrame, k: int = 5,
                 probe_mod: int = 50, bits: int = 8) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's sign bucket
    (equi-join prefilter), exact cosine refine + window top-k. The scale
    path: shuffle is keyed by bucket, never all-pairs."""
    with_b = (embeddings
              .join(sign_bucket(embeddings, bits), "vec_id")
              .select("vec_id", "embedding", "bucket"))
    probes = with_b.filter(F.col("vec_id") % probe_mod == 0)
    a = probes.select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("q_emb"), "bucket")
    b = with_b.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("b_emb"), "bucket")
    joined = a.join(b, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))

    # cosine in fixed dimension order via zip_with + aggregate (JVM-side)
    def cos(x, y):
        dot = F.aggregate(F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
                          F.lit(0.0), lambda acc, v: acc + v)
        nx = F.sqrt(F.aggregate(F.transform(x, lambda p: p.cast("double") * p.cast("double")),
                                F.lit(0.0), lambda acc, v: acc + v))
        ny = F.sqrt(F.aggregate(F.transform(y, lambda p: p.cast("double") * p.cast("double")),
                                F.lit(0.0), lambda acc, v: acc + v))
        return dot / F.greatest(nx * ny, F.lit(1e-300))

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (joined
            .withColumn("score", F.round(cos(F.col("q_emb"), F.col("b_emb")), 6))
            .withColumn("rank", F.row_number().over(w))  # score already rounded
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "score", "rank"))
