"""Summarize a Spark event log per job-description label (round 15).

For each job-description prefix (e.g. "timed0:q75_neardup_jaccard"), print:
jobs, stages-with-tasks, task count, sum of task run/CPU/GC time, shuffle
bytes, spill — plus per-label wall (last job end − first job start).

Job/stage/task COUNTS are deterministic for a fixed plan, so comparing two
variants' counts is immune to the box noise that makes cross-JVM wall
deltas unreliable (OPTIMIZATION_r14.md measurement discipline); CPU sums
are the robust effort metric.

Usage: python tools/eventlog_summary.py <eventlog-path-or-app-id> [label-prefix]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def read_lines(path: str):
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.startswith("events_"):
                with open(os.path.join(path, f)) as fh:
                    yield from fh
    else:
        with open(path) as fh:
            yield from fh


def main() -> None:
    arg = sys.argv[1]
    want = sys.argv[2] if len(sys.argv) > 2 else ""
    path = arg
    if not os.path.exists(path):
        for cand in (f"/tmp/spark-events/{arg}", f"/tmp/spark-events/eventlog_v2_{arg}"):
            if os.path.exists(cand):
                path = cand
                break

    jobs = {}  # job id -> {desc, stages, t0, t1}
    stage_metrics = defaultdict(lambda: defaultdict(float))
    stage_tasks = defaultdict(int)
    for line in read_lines(path):
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "desc": ev.get("Properties", {}).get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                "t0": ev.get("Submission Time"),
            }
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time")
        elif e == "SparkListenerTaskEnd":
            info = ev.get("Task Info", {})
            if info.get("Failed") or info.get("Killed"):
                continue
            sid = ev["Stage ID"]
            stage_tasks[sid] += 1
            accs = {
                a["Name"]: a.get("Update", 0)
                for a in info.get("Accumulables", [])
                if a.get("Internal")
            }
            g = lambda n: accs.get(f"internal.metrics.{n}", 0)  # noqa: E731
            m = stage_metrics[sid]
            m["run_ms"] += g("executorRunTime")
            m["cpu_ms"] += g("executorCpuTime") / 1e6
            m["gc_ms"] += g("jvmGCTime")
            m["deser_ms"] += g("executorDeserializeTime")
            m["shR_mb"] += (
                g("shuffle.read.remoteBytesRead") + g("shuffle.read.localBytesRead")
            ) / 1e6
            m["shW_mb"] += g("shuffle.write.bytesWritten") / 1e6
            m["spill_mb"] += g("memoryBytesSpilled") / 1e6

    by_label = defaultdict(
        lambda: {
            "jobs": 0,
            "stages": 0,
            "tasks": 0,
            "run_ms": 0.0,
            "cpu_ms": 0.0,
            "gc_ms": 0.0,
            "deser_ms": 0.0,
            "shR_mb": 0.0,
            "shW_mb": 0.0,
            "spill_mb": 0.0,
            "t0": None,
            "t1": None,
        }
    )
    for jid in sorted(jobs):
        j = jobs[jid]
        label = j["desc"] or "<none>"
        if want and not label.startswith(want):
            continue
        acc = by_label[label]
        acc["jobs"] += 1
        if acc["t0"] is None or (j.get("t0") or 0) < acc["t0"]:
            acc["t0"] = j.get("t0")
        if acc["t1"] is None or (j.get("t1") or 0) > acc["t1"]:
            acc["t1"] = j.get("t1")
        for sid in j["stages"]:
            if stage_tasks.get(sid):
                acc["stages"] += 1
                acc["tasks"] += stage_tasks[sid]
                for k, v in stage_metrics[sid].items():
                    acc[k] += v

    print(
        f"{'label':42s} {'jobs':>4s} {'stg':>4s} {'tasks':>6s} {'wall_ms':>8s} "
        f"{'run_s':>7s} {'cpu_s':>7s} {'gc_s':>6s} {'deser_s':>7s} "
        f"{'shR':>7s} {'shW':>7s} {'spill':>7s}"
    )
    for label in sorted(by_label):
        a = by_label[label]
        wall = (a["t1"] - a["t0"]) if a["t0"] is not None and a["t1"] is not None else 0
        print(
            f"{label:42s} {a['jobs']:4d} {a['stages']:4d} {a['tasks']:6d} {wall:8d} "
            f"{a['run_ms'] / 1e3:7.2f} {a['cpu_ms'] / 1e3:7.2f} {a['gc_ms'] / 1e3:6.2f} "
            f"{a['deser_ms'] / 1e3:7.2f} {a['shR_mb']:7.1f} {a['shW_mb']:7.1f} "
            f"{a['spill_mb']:7.1f}"
        )


if __name__ == "__main__":
    main()
