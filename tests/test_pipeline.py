"""End-to-end pipeline + resume semantics (SURVEY.md §7.1 M7)."""

import json
import os

import pytest

from fixtures import gen_pages
from imc import manifest, pipeline
from imc.config import IMCParams

PARAMS = IMCParams(eps=1.2, min_lns=3)


@pytest.mark.usefixtures("spark")
def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    path = gen_pages.ensure_pages(sf=0.001)
    pages = spark.read.parquet(path)
    out = str(tmp_path / "run1")

    results = pipeline.run(spark, pages, out, PARAMS)
    expected = {"points", "segments", "eps_pairs", "assignments",
                "rep_points", "raster", "polygons", "tile_assignments"}
    assert set(results) == expected
    for name, (p, snap) in results.items():
        m = manifest.read_manifest(p)
        assert m["snapshot_id"] == snap
        assert m["committed"]
        assert m["row_count"] > 0, name
        assert sum(pc["rows"] for pc in m["partitions"]) == m["row_count"]

    # resume: second run with identical inputs+params must skip (manifests
    # unchanged on disk — compare mtimes)
    mtimes = {n: os.path.getmtime(os.path.join(p, manifest.MANIFEST_NAME))
              for n, (p, _) in results.items()}
    results2 = pipeline.run(spark, pages, out, PARAMS)
    for n, (p, snap) in results2.items():
        assert results[n][1] == snap
        assert os.path.getmtime(os.path.join(p, manifest.MANIFEST_NAME)) == mtimes[n], n

    # param change → new snapshot ids → stages recompute
    p2 = IMCParams(eps=1.2, min_lns=4)
    results3 = pipeline.run(spark, pages, out, p2)
    assert results3["eps_pairs"][1] != results["eps_pairs"][1]

    # corrupted manifest → stage recomputes
    mp = os.path.join(results["points"][0], manifest.MANIFEST_NAME)
    with open(mp, "w") as f:
        json.dump({"snapshot_id": "bogus"}, f)
    results4 = pipeline.run(spark, pages, out, PARAMS)
    assert results4["points"][1] == results["points"][1]
    assert manifest.read_manifest(results["points"][0])["snapshot_id"] == results["points"][1]
