"""Streaming-ingest parity (SURVEY.md §2.10): readStream over a pages
directory + foreachBatch(run_incremental) must produce tables bit-equal
to one batch run over the union — the batch operators serve a streaming
source unchanged."""

import os
import shutil

import pandas as pd
import pytest

from fixtures import gen_pages
from imc import pipeline, streaming
from imc.config import IMCParams

PARAMS = IMCParams(eps=1.2, min_lns=3)


def _read_sorted(spark, path, keys):
    df = spark.read.parquet(path).toPandas()
    return df[sorted(df.columns)].sort_values(keys).reset_index(drop=True)


@pytest.mark.usefixtures("spark")
def test_two_microbatches_equal_batch(spark, tmp_path):
    from pyspark.sql import functions as F
    pages = spark.read.parquet(gen_pages.ensure_pages(sf=0.001))
    slot = F.regexp_extract("url", r"walk(\d+)$", 1).cast("int")
    # wave 1: most urls (every version); wave 2: the re-crawl delta —
    # slots >= 400 (every version of those urls, so the within-batch
    # dedupe and the cross-batch url replacement are both exercised)
    wave1 = pages.filter(slot < 400)
    wave2 = pages.filter(slot >= 400)
    assert wave2.count() > 0

    in_dir = str(tmp_path / "arriving")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    def land(df, name):
        staged = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(staged)
        part = [f for f in os.listdir(staged) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(staged, part), os.path.join(in_dir, name))

    land(wave1, "wave1.parquet")
    streaming.stream_pages(spark, in_dir, out_dir, ck_dir, PARAMS)
    assert streaming._initialized(out_dir)

    land(wave2, "wave2.parquet")
    streaming.stream_pages(spark, in_dir, out_dir, ck_dir, PARAMS)

    full_out = str(tmp_path / "full")
    full = pipeline.run(spark, pages, full_out, PARAMS)

    for name, keys in [("points", ["traj_id", "seq"]), ("segments", ["seg_id"]),
                       ("eps_pairs", ["a_seg", "b_seg"]),
                       ("assignments", ["seg_id"]),
                       ("tile_assignments", ["seg_id"])]:
        got = _read_sorted(spark, os.path.join(out_dir, name), keys)
        want = _read_sorted(spark, full[name][0], keys)
        assert len(got) == len(want), name
        pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name)

    # a third run with nothing new must consume zero batches (offsets
    # checkpointed) and leave every manifest committed
    streaming.stream_pages(spark, in_dir, out_dir, ck_dir, PARAMS)
    from imc import manifest
    m = manifest.read_manifest(os.path.join(out_dir, "eps_pairs"))
    assert m["committed"]
