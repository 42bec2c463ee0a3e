"""Bucketed co-located joins (SURVEY.md §4.2): tables bucketed on the same
key join WITHOUT any Exchange — the layout that keeps repeated bookkeeping
joins shuffle-free at corpus scale."""

import pytest

from fixtures import gen_pages
from imc import dbscan, extract, joins, manifest, segments
from imc.config import IMCParams

PARAMS = IMCParams(eps=1.2, min_lns=3)


@pytest.mark.usefixtures("spark")
def test_bucketed_join_is_exchange_free(spark):
    pts = extract.pages_to_points(
        spark.read.parquet(gen_pages.ensure_pages(sf=0.001)))
    seg_df = segments.mdl_segments(pts)
    seg_df.cache().count()
    assign = dbscan.dbscan(seg_df, joins.eps_join(seg_df, PARAMS), PARAMS)

    manifest.write_bucketed_table(seg_df, "t_segs_bucketed", ["seg_id"], 8)
    manifest.write_bucketed_table(assign, "t_assign_bucketed", ["seg_id"], 8)
    try:
        a = spark.table("t_segs_bucketed")
        b = spark.table("t_assign_bucketed")
        joined = a.join(b.hint("merge"), "seg_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == assign.count()

        # control: the same join from plain (unbucketed) parquet shuffles
        plain = seg_df.join(assign.hint("merge"), "seg_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_segs_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_assign_bucketed")
