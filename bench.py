"""Benchmark harness (driver contract).

Headline metric (BASELINE.json): URLs scheduled+deduped per second on
a synthetic frontier — one full crawl-scheduling wave (fetch join,
JVM extraction, Arrow canonicalization, filters, seen anti-join,
admission fold) — measured at TWO parallelism levels on the SAME
input (the sandbox stand-in for N vs 4N executors; see BASELINE.md),
plus per-query timings of the headline operator queries at
$SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "urls_scheduled_per_sec", "value": <at full cores>,
   "unit": "urls/sec", "queries": {name: sec, ...}, "sf": ...,
   "scaling": {"cores_lo": .., "cores_hi": .., "lo_urls_per_sec": ..,
               "hi_urls_per_sec": .., "efficiency": ..}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "f9_budget_admission",
    "t1_t2_url_enrich",
    "lineitem_agg",
    "nation_revenue",
    "minhash_lsh_dups",
    "ann_brute_topk",
    "text_stats",
    "crawl_full_run",
]


def run_worker(cores: int, corpus_path: str) -> dict:
    cmd = [
        sys.executable, "-m", "tspider_spark.bench_worker",
        "--cores", str(cores), "--corpus-path", corpus_path,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(REPO), timeout=3600,
        env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    raise RuntimeError(
        f"worker cores={cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    corpus_path = tempfile.mkdtemp(prefix="tspider_bench_corpus_") + "/docs"

    # scaling evidence: same input, two parallelism levels (lo first so
    # the corpus is built once and reused)
    lo_cores = max(CPUS // 4, 1)
    lo = run_worker(lo_cores, corpus_path)
    hi = run_worker(CPUS, corpus_path)
    speedup = hi["urls_per_sec"] / lo["urls_per_sec"]
    efficiency = speedup / (CPUS / lo_cores)

    # per-query timings at the target sf
    import __spark_entry__ as entry
    from tspider_spark.session import get_spark

    spark = get_spark("bench-queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    qs = entry.queries()
    timings = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    spark.stop()

    result = {
        "metric": "urls_scheduled_per_sec",
        "value": hi["urls_per_sec"],
        "unit": "urls/sec",
        "queries": timings,
        "sf": SF_DIR,
        "scaling": {
            "cores_lo": lo_cores,
            "cores_hi": CPUS,
            "lo_urls_per_sec": lo["urls_per_sec"],
            "hi_urls_per_sec": hi["urls_per_sec"],
            "lo_elapsed_sec": lo["elapsed_sec"],
            "hi_elapsed_sec": hi["elapsed_sec"],
            "candidates": hi["candidates"],
            "admitted": hi["admitted"],
            "speedup": round(speedup, 3),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
