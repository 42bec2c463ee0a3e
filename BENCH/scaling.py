"""Scaling-efficiency evidence (BASELINE.json north_rule: ≥0.8 from N to 4N
executors; sandbox protocol per BASELINE.md: local[8] vs local[32] on the
same input — no real multi-node cluster exists here).

Runs bench.py at both parallelism levels (plus the hot-cell skew variant)
and writes BENCH/BASELINE.md with throughputs and
efficiency = thr_32 / (4 × thr_8) for the headline metric and per stage.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


PAGES_SF = os.environ.get("IMC_SCALING_PAGES_SF", "0.5")


def run_bench(cpus: int, hot: bool = False) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["IMC_BENCH_HOT"] = "1" if hot else "0"
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # scaling protocol: SAME job config at both levels (fixed shuffle
    # partitioning), corpus large enough that compute dominates the fixed
    # per-job latencies that would otherwise mask parallel speedup
    env["IMC_PAGES_SF"] = PAGES_SF
    env["IMC_SHUFFLE_PARTITIONS"] = "64"
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env, check=True)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    runs = {}
    for hot in (False, True):
        for cpus in (8, 32):
            key = f"{'hot' if hot else 'base'}_{cpus}"
            print(f"running bench: cpus={cpus} hot={hot} ...", file=sys.stderr)
            runs[key] = run_bench(cpus, hot)

    def headline_thr(r):
        return r["headline_rows_per_sec"]

    def eff(r8, r32):
        return round(headline_thr(r32) / (4.0 * headline_thr(r8)), 3)

    def stage_eff(r8, r32, stage):
        return round(r8["queries"][stage] / (4.0 * r32["queries"][stage]), 3)

    base8, base32 = runs["base_8"], runs["base_32"]
    hot8, hot32 = runs["hot_8"], runs["hot_32"]

    # determinism across parallelism (SURVEY.md §5.2-4): identical row
    # counts for every stage at local[8] vs local[32]
    assert base8["rows"] == base32["rows"], (base8["rows"], base32["rows"])
    assert hot8["rows"] == hot32["rows"], (hot8["rows"], hot32["rows"])

    lines = []
    lines.append("# BENCH/BASELINE — measured throughput + scaling efficiency")
    lines.append("")
    lines.append(f"Protocol (BASELINE.md): same input (synthetic pages corpus at "
                 f"sf{PAGES_SF} + driver testdata sf0.1), same job config "
                 f"(64 shuffle partitions), two parallelism levels `local[8]` vs")
    lines.append("`local[32]` (no real multi-node cluster in this sandbox); efficiency =")
    lines.append("`thr_32 / (4 × thr_8)`. Headline metric = spatial-join +")
    lines.append("tile-assignment rows/sec (BASELINE.json).")
    lines.append("")
    lines.append("| fixture | headline rows | thr local[8] (rows/s) | thr local[32] (rows/s) | efficiency |")
    lines.append("|---|---|---|---|---|")
    lines.append(f"| base | {base32['headline_rows']} | {headline_thr(base8)} "
                 f"| {headline_thr(base32)} | **{eff(base8, base32)}** |")
    lines.append(f"| hot-cell skew (30% via one junction) | {hot32['headline_rows']} "
                 f"| {headline_thr(hot8)} | {headline_thr(hot32)} | **{eff(hot8, hot32)}** |")
    lines.append("")
    lines.append("Per-stage wall seconds (base fixture) and stage efficiency")
    lines.append("`t_8 / (4 × t_32)`:")
    lines.append("")
    lines.append("| stage | local[8] s | local[32] s | efficiency |")
    lines.append("|---|---|---|---|")
    for stage in base32["queries"]:
        lines.append(f"| {stage} | {base8['queries'][stage]} | {base32['queries'][stage]} "
                     f"| {stage_eff(base8, base32, stage)} |")
    lines.append("")
    lines.append("Determinism: every stage produced identical row counts at both")
    lines.append("parallelism levels (asserted by this harness) — the scaling runs")
    lines.append("double as cross-parallelism determinism tests (SURVEY.md §5.2-4).")
    lines.append("")
    lines.append("Raw bench JSON:")
    lines.append("")
    for key, r in runs.items():
        lines.append(f"- `{key}`: `{json.dumps(r)}`")
    lines.append("")

    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}", file=sys.stderr)
    print(json.dumps({"base_efficiency": eff(base8, base32),
                      "hot_efficiency": eff(hot8, hot32)}))


if __name__ == "__main__":
    main()
