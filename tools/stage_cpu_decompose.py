"""Decompose a scaling-efficiency gap from Spark event logs.

Usage:
    python tools/stage_cpu_decompose.py LO_EVENTLOG HI_EVENTLOG
    python tools/stage_cpu_decompose.py EVENTLOG            # single-run dump

Aggregates SparkListenerTaskEnd metrics per stage (task run time, CPU
time, GC, shuffle fetch-wait, shuffle bytes) and, with two logs,
prints the per-stage CPU-inflation table used in BASELINE.md's
scaling analysis: if the hi-parallelism run burns more aggregate CPU
seconds for identical work while utilization stays equal and
fetch-wait ~0, the gap is per-thread memory-stall inflation (shared
LLC / memory channels) — a single-box artifact, not a plan defect.

Produce the logs by running the job with:
    TSPIDER_EXTRA_CONF='{"spark.eventLog.enabled":"true",
      "spark.eventLog.dir":"/tmp/spark-events",
      "spark.eventLog.compress":"false"}'
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def stage_metrics(path: str) -> dict:
    stages: dict = defaultdict(
        lambda: {
            "name": "",
            "tasks": 0,
            "run_s": 0.0,
            "cpu_s": 0.0,
            "gc_s": 0.0,
            "fetch_wait_s": 0.0,
            "shuffle_read_mb": 0.0,
            "shuffle_write_mb": 0.0,
        }
    )
    app = {"start": None, "end": None, "cores": None}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerApplicationStart":
                app["start"] = ev.get("Timestamp")
            elif kind == "SparkListenerApplicationEnd":
                app["end"] = ev.get("Timestamp")
            elif kind == "SparkListenerEnvironmentUpdate":
                m = ev.get("Spark Properties", {}).get("spark.master", "")
                if m.startswith("local["):
                    app["cores"] = m[len("local["):-1]
            elif kind == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                stages[info["Stage ID"]]["name"] = info["Stage Name"].split(
                    "\n"
                )[0]
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                s = stages[sid]
                s["tasks"] += 1
                s["run_s"] += tm.get("Executor Run Time", 0) / 1e3
                s["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                s["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                rd = tm.get("Shuffle Read Metrics") or {}
                s["fetch_wait_s"] += rd.get("Fetch Wait Time", 0) / 1e3
                s["shuffle_read_mb"] += (
                    rd.get("Remote Bytes Read", 0) + rd.get("Local Bytes Read", 0)
                ) / 1e6
                wr = tm.get("Shuffle Write Metrics") or {}
                s["shuffle_write_mb"] += wr.get("Shuffle Bytes Written", 0) / 1e6
    return {"app": app, "stages": dict(stages)}


def totals(m: dict) -> dict:
    t = defaultdict(float)
    for s in m["stages"].values():
        for k in ("run_s", "cpu_s", "gc_s", "fetch_wait_s"):
            t[k] += s[k]
    app = m["app"]
    if app["start"] and app["end"]:
        t["wall_s"] = (app["end"] - app["start"]) / 1e3
    return dict(t)


def _dump_single(m: dict) -> None:
    print(f"{'stage':<6}{'tasks':>6}{'run_s':>10}{'cpu_s':>10}"
          f"{'gc_s':>8}{'fwait_s':>9}{'rd_mb':>9}{'wr_mb':>9}  name")
    for sid in sorted(m["stages"]):
        s = m["stages"][sid]
        print(
            f"{sid:<6}{s['tasks']:>6}{s['run_s']:>10.1f}{s['cpu_s']:>10.1f}"
            f"{s['gc_s']:>8.1f}{s['fetch_wait_s']:>9.1f}"
            f"{s['shuffle_read_mb']:>9.1f}{s['shuffle_write_mb']:>9.1f}"
            f"  {s['name'][:60]}"
        )
    t = totals(m)
    print(f"\ntotals: {json.dumps({k: round(v, 1) for k, v in t.items()})}")


def _compare(lo: dict, hi: dict) -> None:
    tl, th = totals(lo), totals(hi)
    print("aggregate:")
    for k in ("wall_s", "run_s", "cpu_s", "gc_s", "fetch_wait_s"):
        a, b = tl.get(k, 0.0), th.get(k, 0.0)
        infl = f"  hi/lo={b / a:.2f}x" if a else ""
        print(f"  {k:<14}{a:>10.1f}{b:>10.1f}{infl}")
    cl, ch = lo["app"]["cores"], hi["app"]["cores"]
    if cl and ch and tl.get("wall_s") and th.get("wall_s"):
        ul = tl["run_s"] / (int(cl) * tl["wall_s"])
        uh = th["run_s"] / (int(ch) * th["wall_s"])
        print(f"  core-utilization: lo={ul:.0%} hi={uh:.0%}")

    # per-stage inflation, matched by stage NAME (stage ids differ
    # between runs); only stages present in both with >=1s lo CPU
    by_name_lo: dict = defaultdict(lambda: [0.0, 0.0])
    by_name_hi: dict = defaultdict(lambda: [0.0, 0.0])
    for s in lo["stages"].values():
        by_name_lo[s["name"]][0] += s["cpu_s"]
        by_name_lo[s["name"]][1] += s["run_s"]
    for s in hi["stages"].values():
        by_name_hi[s["name"]][0] += s["cpu_s"]
        by_name_hi[s["name"]][1] += s["run_s"]
    rows = []
    for name, (cpu_l, _) in by_name_lo.items():
        if name in by_name_hi and cpu_l >= 1.0:
            rows.append((by_name_hi[name][0] / cpu_l, cpu_l, name))
    rows.sort(reverse=True)
    print("\nper-stage CPU inflation (hi_cpu / lo_cpu), matched by name:")
    for infl, cpu_l, name in rows:
        print(f"  {infl:>6.2f}x  lo_cpu={cpu_l:>8.1f}s  {name[:70]}")


def main() -> None:
    if len(sys.argv) == 2:
        _dump_single(stage_metrics(sys.argv[1]))
    elif len(sys.argv) == 3:
        _compare(stage_metrics(sys.argv[1]), stage_metrics(sys.argv[2]))
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main()
