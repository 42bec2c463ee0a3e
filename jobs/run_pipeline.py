"""spark-submit entry point (EP3, SURVEY.md §3.2; BASELINE.json north_rule
"run via spark-submit --py-files on a multi-executor cluster").

Usage:
  spark-submit --py-files imc.zip jobs/run_pipeline.py \
      --input /path/to/pages_parquet --output /path/to/out \
      [--eps 1.2] [--min-lns 3] [--gamma 1.0] [--no-resume] [--raw-segments] \
      [--incremental]   # fold --input as a NEW batch into an existing
                        # --output (snapshot-diff mode: only venues in the
                        # batch recompute; see imc.pipeline.run_incremental)
      [--stream --checkpoint /path/ck]  # treat --input as a DIRECTORY pages
                        # files land in: Structured-Streaming readStream +
                        # foreachBatch(run_incremental), AvailableNow
                        # trigger (consume everything unprocessed, stop)

The package zip is built by jobs/make_pyfiles.sh; no cluster-side installs.
Resume: stages whose iceberg-lite manifest matches the content-addressed
snapshot id (inputs + params) are skipped.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet path")
    ap.add_argument("--output", required=True, help="output table root")
    ap.add_argument("--eps", type=float, default=1.2)
    ap.add_argument("--min-lns", type=int, default=3)
    ap.add_argument("--gamma", type=float, default=1.0)
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--raw-segments", action="store_true",
                    help="skip MDL partitioning (debug)")
    ap.add_argument("--incremental", action="store_true",
                    help="treat --input as a new batch folded into an "
                         "existing --output (venue-level snapshot diff)")
    ap.add_argument("--stream", action="store_true",
                    help="treat --input as a directory pages files land "
                         "in; consume them via Structured Streaming")
    ap.add_argument("--checkpoint",
                    help="streaming checkpoint dir (required with --stream)")
    args = ap.parse_args(argv)
    if args.stream and not args.checkpoint:
        ap.error("--stream requires --checkpoint")

    from pyspark.sql import SparkSession

    from imc.config import IMCParams
    from imc.pipeline import run, run_incremental

    spark = (SparkSession.builder.appName("imc-pipeline")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    params = IMCParams(eps=args.eps, min_lns=args.min_lns, gamma=args.gamma,
                       salt_buckets=args.salt_buckets)
    if args.stream:
        from imc.streaming import stream_pages
        stream_pages(spark, args.input, args.output, args.checkpoint, params)
        print(json.dumps({"streamed": True, "output": args.output}))
        spark.stop()
        return
    pages = spark.read.parquet(args.input)
    if args.incremental:
        results = run_incremental(spark, pages, args.output, params)
    else:
        results = run(spark, pages, args.output, params,
                      resume=not args.no_resume, use_mdl=not args.raw_segments)
    print(json.dumps({name: {"path": p, "snapshot": s}
                      for name, (p, s) in results.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
