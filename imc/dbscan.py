"""Line-segment DBSCAN as a dataflow operator (SURVEY.md §2.8).

[T] §4.2 Fig. 12 is a sequential queue expansion; in bulk form, after the
ε-join produced the full ε-graph:

  1. cores: |Nε(L)| ≥ MinLns, where Nε includes L itself ([T] Defn 6) —
     one hash aggregation over the symmetrized pair list.
  2. clusters = connected components of the core-core subgraph, via
     iterative min-label propagation (each round one join + one agg;
     localCheckpoint every few rounds to truncate lineage).
  3. border segments attach to the minimum adjacent core label
     (deterministic; the paper's queue order is first-come-first-served,
     which is not reproducible in parallel — pinned to min).
  4. clusters with |PTR(C)| < MinLns distinct trajectories are discarded
     ([T] Defn 8, Fig. 12 step 3).
  5. canonical cluster ids: dense_rank over the component's min seg_id so
     output ids are deterministic and fixture-comparable.

Returns assignments(seg_id, cluster_id, is_core) — noise segments are
absent (the reference marks them noise and drops them from clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from imc.config import IMCParams


def symmetrize(eps_pairs: DataFrame) -> DataFrame:
    """(a,b) canonical pairs → both directions (src, dst)."""
    ab = eps_pairs.select(F.col("a_seg").alias("src"), F.col("b_seg").alias("dst"))
    ba = eps_pairs.select(F.col("b_seg").alias("src"), F.col("a_seg").alias("dst"))
    return ab.unionByName(ba)


def core_segments(segments: DataFrame, eps_pairs: DataFrame,
                  params: IMCParams) -> DataFrame:
    """(seg_id, n_eps, is_core); n_eps counts the segment itself."""
    deg = (symmetrize(eps_pairs)
           .groupBy("src").agg(F.count("*").alias("n_nbrs")))
    return (segments.select("seg_id")
            .join(deg, segments.seg_id == deg.src, "left")
            .select("seg_id",
                    (F.coalesce(F.col("n_nbrs"), F.lit(0)) + 1).alias("n_eps"))
            .withColumn("is_core", F.col("n_eps") >= F.lit(params.min_lns)))


def _connected_components(edges: DataFrame, nodes: DataFrame,
                          max_iter: int = 50) -> DataFrame:
    """Min-label propagation WITH GRAPH CONTRACTION (VERDICT r01
    What's-wrong #4: plain propagation re-joined the full edge list every
    round, so a hot-cell near-clique — O(n²) edges — made DBSCAN *slower*
    at higher parallelism).

    Each round: every supernode adopts min(self, min neighbor) with one
    pointer-jump, then the edge list is REWRITTEN onto the new supernode
    ids and deduped — a clique collapses to one supernode after round 1
    and its edges vanish, so later rounds touch a geometrically shrinking
    graph. Merges always relabel toward the smaller id, so the surviving
    supernode of a component is its min seg_id (deterministic ids).
    Terminates when the contracted graph is empty: a path graph halves
    per round ⇒ O(log n) rounds.

    edges: symmetric (src, dst) over core segments; nodes: (seg_id).
    Returns (seg_id, comp) with comp = min seg_id in the component."""
    labels = (nodes.select(F.col("seg_id"), F.col("seg_id").alias("comp"))
              .localCheckpoint(eager=True))
    g = (edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
         .filter(F.col("a") != F.col("b"))
         .localCheckpoint(eager=True))
    for _ in range(max_iter):
        if g.isEmpty():
            break
        # m: supernode → min(self, min neighbor), with one pointer jump
        m = (g.groupBy("a").agg(F.min("b").alias("nb"))
             .select(F.col("a").alias("comp"), F.least("a", "nb").alias("new")))
        jump = m.select(F.col("comp").alias("new"), F.col("new").alias("new2"))
        m = (m.join(jump, "new", "left")
             .select("comp",
                     F.least(F.col("new"), F.coalesce(F.col("new2"), F.col("new"))
                             ).alias("new"))
             .localCheckpoint(eager=True))
        labels = (labels.join(m, "comp", "left")
                  .select("seg_id", F.coalesce("new", "comp").alias("comp"))
                  .localCheckpoint(eager=True))
        # contract: rewrite edges onto new supernode ids, drop self-loops,
        # dedupe canonically, re-symmetrize
        ma = m.select(F.col("comp").alias("a"), F.col("new").alias("_na"))
        mb = m.select(F.col("comp").alias("b"), F.col("new").alias("_nb"))
        gc = (g.join(ma, "a", "left").join(mb, "b", "left")
              .select(F.coalesce("_na", F.col("a")).alias("ca"),
                      F.coalesce("_nb", F.col("b")).alias("cb"))
              .filter(F.col("ca") != F.col("cb"))
              .select(F.least("ca", "cb").alias("u"),
                      F.greatest("ca", "cb").alias("v"))
              .distinct())
        g = (gc.select(F.col("u").alias("a"), F.col("v").alias("b"))
             .unionByName(gc.select(F.col("v").alias("a"), F.col("u").alias("b")))
             .localCheckpoint(eager=True))
    return labels


def rank_components(comps: DataFrame) -> DataFrame:
    """(comp) → (comp, cluster_id): dense canonical ids 0..n−1 in
    ascending comp order WITHOUT a global single-partition window
    (VERDICT r04 #6: one row per cluster is tiny per venue, but a global
    Window.orderBy over 10^8 clusters is one serial sort task).

    comp is a component-min seg_id, and seg_id div (SEG_ID_STRIDE ×
    VENUE_STRIDE) is its venue — MONOTONE in comp — so the global
    ascending-comp order equals (venue asc, comp asc): rank within venue
    (a distributed window keyed by venue) plus a per-venue base offset
    (running sum over ONE ROW PER VENUE — the only single-task step,
    venue-count-sized) reproduces the exact same total order, hence
    bit-identical cluster ids (oracle-gated via imc_assignments)."""
    from imc.config import VENUE_STRIDE
    from imc.segments import SEG_ID_STRIDE
    v = F.expr(f"comp div {SEG_ID_STRIDE * VENUE_STRIDE}")
    wv = Window.partitionBy("_v").orderBy("comp")
    ranked = (comps.withColumn("_v", v)
              .withColumn("_r", F.row_number().over(wv)))
    wo = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    offs = (ranked.groupBy("_v").agg(F.count("*").alias("_n"))
            .withColumn("_off", F.coalesce(F.sum("_n").over(wo), F.lit(0))))
    return (ranked.join(F.broadcast(offs.select("_v", "_off")), "_v")
            .select("comp", (F.col("_off") + F.col("_r") - 1)
                    .cast("long").alias("cluster_id")))


def dbscan(segments: DataFrame, eps_pairs: DataFrame,
           params: IMCParams | None = None) -> DataFrame:
    """assignments(seg_id, cluster_id, is_core) — SURVEY.md §2.8."""
    params = params or IMCParams()
    # cut lineage ONCE: eps_pairs is consumed by several branches below
    # (degrees, core edges, border attach); an unmaterialized ε-join plan
    # embedded that many times blows up driver-side optimization (the
    # staged refine projections re-optimize per reference — observed OOM
    # at default 1g driver heap). localCheckpoint is a no-op-ish scan for
    # already-materialized inputs (the pipeline passes parquet-backed
    # pairs) and caps plan size for direct callers.
    eps_pairs = eps_pairs.localCheckpoint(eager=True)
    cores = core_segments(segments, eps_pairs, params).filter("is_core")
    core_ids = cores.select("seg_id").localCheckpoint(eager=True)

    sym = symmetrize(eps_pairs)
    core_edges = (sym
                  .join(core_ids.withColumnRenamed("seg_id", "src"), "src", "left_semi")
                  .join(core_ids.withColumnRenamed("seg_id", "dst"), "dst", "left_semi"))

    comp = _connected_components(core_edges, core_ids)

    # border attachment: non-core neighbors of cores take min adjacent comp
    border = (sym
              .join(core_ids.withColumnRenamed("seg_id", "dst"), "dst", "left_semi")
              .join(core_ids.withColumnRenamed("seg_id", "src"), "src", "left_anti")
              .join(comp.withColumnRenamed("seg_id", "dst"), "dst")
              .groupBy("src").agg(F.min("comp").alias("comp"))
              .select(F.col("src").alias("seg_id"), "comp"))

    assigned = (comp.select("seg_id", "comp").withColumn("is_core", F.lit(True))
                .unionByName(border.withColumn("is_core", F.lit(False))))

    # |PTR(C)| ≥ MinLns filter ([T] Defn 8): distinct trajectories per comp
    with_traj = assigned.join(segments.select("seg_id", "traj_id"), "seg_id")
    keep = (with_traj.groupBy("comp")
            .agg(F.countDistinct("traj_id").alias("n_traj"))
            .filter(F.col("n_traj") >= F.lit(params.min_lns))
            .select("comp"))
    surviving = assigned.join(keep, "comp", "left_semi")

    # canonical ids: dense rank of comp labels — ranked on the DISTINCT
    # comp set (one row per cluster) via the two-level venue rank (no
    # global single-partition window), then joined back
    ranked = rank_components(surviving.select("comp").distinct())
    return (surviving.join(F.broadcast(ranked), "comp")
            .select("seg_id", "cluster_id", "is_core"))
