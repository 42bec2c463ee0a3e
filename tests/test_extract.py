"""M0 tests: fixture corpus + extraction invariant (SURVEY.md §7.1 M0,
§5.2-3 — byte-identical text per url, asserted via sha256)."""

import hashlib

import pandas as pd
import pytest

from fixtures import gen_pages
from imc import extract


def test_generator_deterministic():
    a = gen_pages.gen_pages(sf=0.001, seed=42)
    b = gen_pages.gen_pages(sf=0.001, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = gen_pages.gen_pages(sf=0.001, seed=43)
    assert not a.equals(c)


def test_generator_shape():
    df = gen_pages.gen_pages(sf=0.001, seed=42)
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    n_unique = df["url"].nunique()
    assert n_unique == 500
    assert len(df) > 500  # duplicates injected
    assert (df["lang"] == "en").mean() > 0.8
    # walks present
    assert df["text"].str.contains("TRAJ ").any()


def test_extract_text_matches_ground_truth_bytes():
    """THE per-row invariant: extractor(html) == text, byte-identical."""
    df = gen_pages.gen_pages(sf=0.001, seed=42)
    for _, row in df.iterrows():
        got = extract.extract_text_str(row["html"])
        assert got == row["text"], row["url"]
        assert hashlib.sha256(got.encode()).digest() == hashlib.sha256(
            row["text"].encode()).digest()


def test_parse_points_grammar():
    pts = extract._parse_one("x\nTRAJ 10001 0 1.500000 -2.250000 2026-01-01T00:00:05Z\nnoise")
    assert pts == [(10001, 0, 1.5, -2.25, pd.Timestamp("2026-01-01T00:00:05"))]
    assert extract._parse_one("no points here") == []
    # malformed lines are ignored (wrong precision)
    assert extract._parse_one("TRAJ 1 0 1.5 2.5 2026-01-01T00:00:05Z") == []


@pytest.mark.usefixtures("spark")
def test_pages_to_points_matches_truth(spark):
    path = gen_pages.ensure_pages(sf=0.001)
    pages = spark.read.parquet(path)
    got = extract.pages_to_points(pages).toPandas()
    want = gen_pages.truth_points(sf=0.001)
    got = got.sort_values(["traj_id", "seq"]).reset_index(drop=True)
    want = want.sort_values(["traj_id", "seq"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[["traj_id", "seq", "x", "y"]].astype(
        {"traj_id": "int64", "seq": "int32"}),
        want[["traj_id", "seq", "x", "y"]].astype({"traj_id": "int64", "seq": "int32"}))


@pytest.mark.usefixtures("spark")
def test_builtin_extract_equals_udf_twin(spark):
    """The Catalyst extract/parse path is byte-identical to the pandas-UDF
    reference twins (the round-1 implementation, kept as the oracle)."""
    from pyspark.sql import functions as F
    path = gen_pages.ensure_pages(sf=0.001)
    pages = spark.read.parquet(path)
    both = pages.select(
        "url", "warc_ts",
        extract.extract_text_col(F.col("html")).alias("builtin"),
        extract.extract_text(F.col("html")).alias("udf"))
    assert both.filter("builtin != udf OR builtin IS NULL").count() == 0
    # parse: builtin explode path vs UDF struct path, same multiset
    udf_pts = (pages.select(F.explode(extract.parse_points(
        extract.extract_text(F.col("html")))).alias("p"))
        .select("p.traj_id", "p.seq", "p.x", "p.y", "p.t").toPandas())
    bi_pts = (pages.select(F.explode(extract.parse_points_cols(
        extract.extract_text_col(F.col("html")))).alias("_ln"))
        .select(*extract._point_fields(F.col("_ln"))).toPandas())
    udf_pts = udf_pts.sort_values(["traj_id", "seq"]).reset_index(drop=True)
    bi_pts = bi_pts.sort_values(["traj_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(udf_pts, bi_pts)


@pytest.mark.usefixtures("spark")
def test_text_sha_invariant_on_spark(spark):
    """Extracted sha per url equals sha of stored ground-truth text."""
    path = gen_pages.ensure_pages(sf=0.001)
    pages = spark.read.parquet(path)
    got = extract.text_sha(pages).toPandas().set_index("url")["sha256"]
    truth = extract.dedupe_pages(pages).select("url", "text").toPandas()
    want = truth.set_index("url")["text"].map(
        lambda t: hashlib.sha256(t.encode()).hexdigest())
    assert got.sort_index().equals(want.sort_index())
