"""Platform scaling ceilings of THIS box (single-socket, SMT, shared
memory controller) at the N / 4N parallelism pair — the context the raw
engine efficiency must be read against, since a real N→4N multi-executor
cluster adds memory bandwidth, shuffle bandwidth, and fixed-frequency
cores linearly with nodes, none of which this box does.

Probes (best-of-2 each, both levels):
  cpu_burn     zero-coordination multiprocessing arithmetic — pure-CPU
               ceiling (per-core turbo droop as cores activate)
  jvm_shuffle  Spark's own hash-aggregate over 200M generated rows —
               what ANY shuffle-heavy Spark job can scale to here
               (no Python, no engine code: range → pmod/hash → groupBy)
  jvm_codegen  Spark whole-stage-codegen scan-sum over 2B rows (tiny —
               shows the fixed-latency floor)

Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_LO = int(os.environ.get("IMC_SCALING_N", "4"))
N_HI = 4 * N_LO

WORKER = r"""
import json, sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
cpus = int(sys.argv[1])
s = (SparkSession.builder.master(f"local[{cpus}]")
     .config("spark.sql.shuffle.partitions", "64")
     .config("spark.driver.memory", "24g")
     .config("spark.ui.enabled", "false").getOrCreate())
s.sparkContext.setLogLevel("ERROR")
out = {}
for name, fn in [
    ("jvm_shuffle", lambda: (s.range(200_000_000)
                             .withColumn("k", F.pmod(F.hash("id"), F.lit(3_000_000)))
                             .groupBy("k").count().filter("count > 100").count())),
    ("jvm_codegen", lambda: s.range(2_000_000_000)
                             .select(F.sum(F.col("id") % 7)).collect() and 0),
]:
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 2)
print(json.dumps(out))
s.stop()
"""


def _burn(_):
    acc = 0
    for i in range(30_000_000):
        acc += i * i
    return acc


def main():
    res: dict = {"n_lo": N_LO, "n_hi": N_HI}
    for n in (N_LO, N_HI):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            with mp.Pool(n) as p:
                p.map(_burn, range(n))
            best = min(best, time.perf_counter() - t0)
        res[f"burn_{n}"] = round(best, 2)
    for n in (N_LO, N_HI):
        out = subprocess.run([sys.executable, "-c", WORKER, str(n)],
                             capture_output=True, text=True, check=True)
        for k, v in json.loads(out.stdout.strip().splitlines()[-1]).items():
            res[f"{k}_{n}"] = v
    res["burn_eff"] = round(res[f"burn_{N_LO}"] / res[f"burn_{N_HI}"], 3)
    res["jvm_shuffle_eff"] = round(
        res[f"jvm_shuffle_{N_LO}"] / (4 * res[f"jvm_shuffle_{N_HI}"]), 3)
    res["jvm_codegen_eff"] = round(
        res[f"jvm_codegen_{N_LO}"] / (4 * res[f"jvm_codegen_{N_HI}"]), 3)

    lines = [
        "",
        "## Platform scaling ceilings (this box, measured)",
        "",
        "Re-measured each round; the JVM-shuffle row has ranged 0.57-0.70",
        "across rounds on this box — the ceiling any shuffle-bound engine",
        "code can reach here.",
        "",
        f"| probe | local[{N_LO}] s | local[{N_HI}] s | efficiency |",
        "|---|---|---|---|",
        f"| CPU burn (no coordination; perfect = equal wall) | {res[f'burn_{N_LO}']} | {res[f'burn_{N_HI}']} | {res['burn_eff']} |",
        f"| Spark JVM hash-agg shuffle, 200M rows, zero Python | {res[f'jvm_shuffle_{N_LO}']} | {res[f'jvm_shuffle_{N_HI}']} | {res['jvm_shuffle_eff']} |",
        f"| Spark codegen scan-sum, 2B rows (fixed-latency floor) | {res[f'jvm_codegen_{N_LO}']} | {res[f'jvm_codegen_{N_HI}']} | {res['jvm_codegen_eff']} |",
        "",
        "Any shuffle-heavy Spark job — engine code or not — tops out near the",
        "jvm_shuffle number on this box (one memory controller shared by all",
        "cores). A real N→4N cluster adds bandwidth with nodes; these probes",
        "bound what raw single-box efficiency can show.",
        "",
    ]
    from _md import replace_section
    replace_section("## Platform scaling ceilings (this box, measured)", lines)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
