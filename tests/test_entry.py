"""Smoke the driver contract: entry() and every rows-only queries() entry
runs and returns a stable-schema DataFrame at the driver's scales."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"a_seg", "b_seg", "dist", "a_tile", "b_tile"}


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    # schema is stable across two invocations
    df2 = entrymod.queries()[name](spark, SF_DIR)
    assert df.schema == df2.schema
    if name in ("imc_points", "imc_segments", "imc_eps_pairs", "imc_assignments",
                "imc_rep_points", "imc_raster", "imc_text_sha"):
        assert n > 0, name
