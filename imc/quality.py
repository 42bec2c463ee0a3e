"""Clustering-quality metric: the TRACLUS QMeasure ([T] §6.2).

Per surviving cluster, the sum of squared in-cluster segment distances in
its pairwise form: SSE(C) = (1/|C|) · Σ_{i<j ∈ C} dist(Li,Lj)²
(≡ 1/(2|C|) · Σ_{x,y} dist²). Noise segments are excluded (assignments
drop them already — documented deviation from the paper's noise penalty).

Everything is DataFrame ops: in-cluster pairs via a self-equi-join on
cluster_id (clusters are venue-bounded, never corpus-bounded), distance as
the Catalyst TRACLUS expression, one hash aggregate. Each dist² term is
rounded to 6 before summing so the sum is cross-engine stable to ~1e-8
regardless of accumulation order (the DuckDB oracle reproduces the rounded
SSE bit-for-bit at round 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imc.config import IMCParams
from imc.joins import _COORDS, with_traclus_dist


def cluster_sse(segments: DataFrame, assignments: DataFrame,
                params: IMCParams | None = None) -> DataFrame:
    """(cluster_id, n_segs, sse) — per-cluster QMeasure terms."""
    params = params or IMCParams()
    j = (assignments.select("seg_id", "cluster_id")
         .join(segments.select("seg_id", *_COORDS).hint("merge"), "seg_id"))
    a = j.select(F.col("cluster_id"), F.col("seg_id").alias("a_seg"),
                 *[F.col(c).alias(f"a{c}") for c in _COORDS])
    b = j.select(F.col("cluster_id"), F.col("seg_id").alias("b_seg"),
                 *[F.col(c).alias(f"b{c}") for c in _COORDS])
    # merge-join hint: the broadcast-hash-join variant fuses the join and
    # all the distance projections into one whole-stage-codegen method too
    # large for Janino; the SMJ shape (same as eps_join) compiles fine
    pairs = (a.join(b.hint("merge"), "cluster_id")
             .filter(F.col("a_seg") < F.col("b_seg")))
    d = with_traclus_dist(pairs, params.w_perp, params.w_par, params.w_ang)
    per = (d.groupBy("cluster_id")
           .agg(F.sum(F.round(F.col("dist") * F.col("dist"), 6)).alias("_sum_d2")))
    sizes = assignments.groupBy("cluster_id").agg(F.count("*").alias("n_segs"))
    return (sizes.join(per, "cluster_id", "left")
            .select("cluster_id", "n_segs",
                    F.round(F.coalesce(F.col("_sum_d2"), F.lit(0.0))
                            / F.col("n_segs"), 3).alias("sse")))


def qmeasure(segments: DataFrame, assignments: DataFrame,
             params: IMCParams | None = None) -> float:
    """Scalar QMeasure = Σ_C SSE(C) — smaller is tighter clustering."""
    row = (cluster_sse(segments, assignments, params)
           .agg(F.sum("sse").alias("q")).collect()[0])
    return float(row["q"] or 0.0)
