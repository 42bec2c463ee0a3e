"""SQL surface + physical-plan evidence: spark.sql over registered stage
views must produce the same results as the DataFrame path, and a venue
predicate must reach the scan as a PARTITION filter (pruning, SURVEY.md
§4.2) with column pruning visible in ReadSchema."""

import pytest

from fixtures import gen_pages
from imc import pipeline, sqlviews
from imc.config import IMCParams

PARAMS = IMCParams(eps=1.2, min_lns=3)


@pytest.fixture(scope="module")
def out_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sqlviews") / "out")
    pages = spark.read.parquet(gen_pages.ensure_pages(sf=0.001))
    pipeline.run(spark, pages, out, PARAMS)
    return out


def test_sql_views_match_dataframe_path(spark, out_dir):
    names = sqlviews.register_stage_views(spark, out_dir)
    assert "imc_segments" in names and "imc_eps_pairs" in names
    n_sql = spark.sql(
        "SELECT count(*) AS n FROM imc_eps_pairs p "
        "JOIN imc_segments s ON p.a_seg = s.seg_id").collect()[0]["n"]
    pairs = spark.read.parquet(out_dir + "/eps_pairs")
    segs = spark.read.parquet(out_dir + "/segments")
    n_df = pairs.join(segs, pairs.a_seg == segs.seg_id).count()
    assert n_sql == n_df > 0


def test_venue_predicate_prunes_partitions(spark, out_dir):
    sqlviews.register_stage_views(spark, out_dir)
    plan = (spark.sql("SELECT seg_id FROM imc_segments WHERE venue = 0")
            ._jdf.queryExecution().executedPlan().toString())
    # the venue predicate must reach the scan as a PARTITION filter (not a
    # post-scan data filter) and only the selected columns must be read
    assert "PartitionFilters" in plan and "venue" in plan.split(
        "PartitionFilters")[1][:200]
    read_schema = plan.split("ReadSchema:")[1][:120]
    assert "seg_id" in read_schema and "x1" not in read_schema


def test_torn_stage_not_registered(spark, out_dir):
    from imc import manifest
    import os
    manifest.mark_uncommitted(os.path.join(out_dir, "raster"))
    try:
        names = sqlviews.register_stage_views(spark, out_dir, prefix="t2_")
        assert "t2_raster" not in names and "t2_segments" in names
    finally:
        # restore for other tests in the module
        import json
        mp = os.path.join(out_dir, "raster", "_imc_manifest.json")
        m = json.load(open(mp))
        m["committed"] = True
        json.dump(m, open(mp, "w"))
