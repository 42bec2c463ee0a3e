"""SQL surface over the pipeline's stage tables (SURVEY.md §3: the engine
is DataFrame-first, but every stage output is a plain table — registering
them as views gives users the `spark.sql(...)` entry point the
"DataFrame / SQL" API contract promises, with zero extra machinery:
Catalyst sees the same relations, so pushdown/pruning behave identically
to the DataFrame path (explain-test-gated)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from imc import manifest

STAGES = ("points", "segments", "eps_pairs", "assignments", "rep_points",
          "corridors", "raster", "polygons", "tile_assignments")


def register_stage_views(spark: SparkSession, out_dir: str,
                         prefix: str = "imc_") -> list[str]:
    """Register every committed stage table under `out_dir` as a temp view
    `<prefix><stage>`; returns the view names. Uncommitted / missing
    stages are skipped (a torn snapshot must not be queryable)."""
    names = []
    for stage in STAGES:
        path = os.path.join(out_dir, stage)
        try:
            if not manifest.read_manifest(path).get("committed"):
                continue
        except (OSError, ValueError):
            continue
        name = f"{prefix}{stage}"
        manifest.read_stage(spark, path).createOrReplaceTempView(name)
        names.append(name)
    return names
