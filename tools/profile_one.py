#!/usr/bin/env python
"""Profile queries stage-by-stage via the Spark event log (guide §1:
empirical measurement — which stage, shuffle vs compute — without the
live UI, which is disabled in bench sessions).

Runs each query once with the bench warmups, then parses the event log
and prints, per job: duration, and per stage: name, task count, total
task time, shuffle read/write bytes, spill, and the top accumulated
metrics. Stages are attributed to queries via setJobDescription.

Usage: python tools/profile_one.py <query>[,<query>...] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evt_dir = Path("/tmp/spark-events")
    evt_dir.mkdir(exist_ok=True)
    import shutil

    for old in evt_dir.glob("*"):
        shutil.rmtree(old) if old.is_dir() else old.unlink()

    import __spark_entry__ as entry_mod
    from revtron_utils_spark.session import get_spark

    spark = get_spark(
        app_name="profile-one",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": str(evt_dir),
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s

    spark.range(256).repartition(64).select(_warm(col("id").cast("double"))).collect()
    from revtron_utils_spark.io import read_table

    read_table(spark, sf_dir, "region").write.mode("overwrite").format("noop").save()

    from revtron_utils_spark.operators.dedup import release_caches

    queries = entry_mod.queries()
    wall = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        release_caches()
        spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log (file, or rolling-v2 directory) ----
    log = next(evt_dir.glob(f"*{app_id}*"))
    if log.is_dir():
        logs = sorted(log.glob("events_*"))
    else:
        logs = [log]
    jobs = {}  # jobId -> dict
    stages = {}  # stageId -> dict
    stage_jobs = {}  # stageId -> jobId
    import itertools

    with open(logs[0]) as _f0:
        pass  # ensure readable
    lines = itertools.chain.from_iterable(open(p) for p in logs)
    if True:
        for line in lines:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                desc = (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {
                    "desc": desc,
                    "t0": e.get("Submission Time", 0),
                    "t1": None,
                }
                for sid in e.get("Stage IDs", []):
                    stage_jobs[sid] = jid
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e.get("Completion Time", 0)
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                # MERGE into any entry the task-end handler already
                # created: task ends precede stage completion in the
                # event log, and replacing the dict here zeroed every
                # accumulated task metric (r12 fix)
                st = stages.setdefault(sid, {
                    "task_time": 0,
                    "sr": 0,
                    "sw": 0,
                    "spill": 0,
                    "input": 0,
                    "gc": 0,
                    "fetch_wait": 0,
                    "cpu": 0,
                })
                st["name"] = si.get("Stage Name", "")[:90]
                st["tasks"] = si.get("Number of Tasks", 0)
                st["t0"] = si.get("Submission Time")
                st["t1"] = si.get("Completion Time")
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                st = stages.get(sid)
                ti = e.get("Task Info", {})
                tm = e.get("Task Metrics") or {}
                if st is None:
                    # task end can precede stage completion event order
                    st = stages.setdefault(
                        sid,
                        {
                            "name": "?",
                            "tasks": 0,
                            "t0": None,
                            "t1": None,
                            "task_time": 0,
                            "sr": 0,
                            "sw": 0,
                            "spill": 0,
                            "input": 0,
                            "gc": 0,
                            "fetch_wait": 0,
                            "cpu": 0,
                        },
                    )
                st["task_time"] += (ti.get("Finish Time", 0) or 0) - (
                    ti.get("Launch Time", 0) or 0
                )
                st["gc"] += tm.get("JVM GC Time", 0)
                st["cpu"] += tm.get("Executor CPU Time", 0) // 1_000_000
                srm = tm.get("Shuffle Read Metrics") or {}
                st["sr"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                st["fetch_wait"] += srm.get("Fetch Wait Time", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                st["sw"] += swm.get("Shuffle Bytes Written", 0)
                st["spill"] += tm.get("Disk Bytes Spilled", 0)
                im = tm.get("Input Metrics") or {}
                st["input"] += im.get("Bytes Read", 0)

    per_q_jobs = defaultdict(list)
    for jid, j in jobs.items():
        d = j["desc"]
        if d.startswith("Q:"):
            per_q_jobs[d[2:]].append(jid)

    if os.environ.get("PROFILE_SUMMARY"):
        for name in names:
            jids = per_q_jobs.get(name, [])
            nstages = sum(
                1 for s, j in stage_jobs.items() if j in jids and s in stages
            )
            jdur = sum(((jobs[j]["t1"] or 0) - jobs[j]["t0"]) / 1000 for j in jids)
            sw = sum(
                stages[s]["sw"]
                for s, j in stage_jobs.items()
                if j in jids and s in stages
            )
            print(
                f"SUMMARY {name}: wall={wall.get(name, 0):.2f}s "
                f"jobs={len(jids)} stages={nstages} jobsum={jdur:.2f}s "
                f"shuffle_write={sw / 1048576:.1f}M"
            )
        return

    mb = lambda b: f"{b / 1048576:.1f}M"
    for name in names:
        print(f"\n===== {name}  wall={wall.get(name, 0):.2f}s =====")
        for jid in sorted(per_q_jobs.get(name, [])):
            j = jobs[jid]
            dur = ((j["t1"] or 0) - j["t0"]) / 1000
            sids = sorted(s for s, jj in stage_jobs.items() if jj == jid and s in stages)
            print(f"  job {jid}: {dur:6.2f}s  ({len(sids)} stages)")
            for sid in sids:
                st = stages[sid]
                sdur = (
                    ((st["t1"] or 0) - (st["t0"] or 0)) / 1000
                    if st["t0"]
                    else -1
                )
                print(
                    f"    stage {sid:4d} {sdur:6.2f}s wall, "
                    f"{st['task_time']/1000:7.2f}s tasks, cpu {st['cpu']/1000:6.2f}s, "
                    f"{st['tasks']:3d}t, in {mb(st['input'])}, "
                    f"sr {mb(st['sr'])}, sw {mb(st['sw'])}, "
                    f"spill {mb(st['spill'])}, gc {st['gc']/1000:.2f}s, "
                    f"fw {st['fetch_wait']/1000:.2f}s  | {st['name']}"
                )


if __name__ == "__main__":
    main()
