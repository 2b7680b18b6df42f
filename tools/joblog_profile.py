"""Event-log job/stage profile of single queries (guide §1/§7: map wall
time to jobs and stages, not just totals). Runs each named query
end-to-end (fn build fences + noop sink) in a session with event
logging, then prints per-job wall time and the heaviest stages with
task-time / shuffle bytes.

Usage: python3 tools/joblog_profile.py <query> [query ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EV_DIR = "/tmp/spark-events-profile"


def main() -> None:
    os.makedirs(EV_DIR, exist_ok=True)
    import shutil
    shutil.rmtree(EV_DIR, ignore_errors=True)
    os.makedirs(EV_DIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_migrate_api_spark.plans.registry import QUERIES, headline_names
    from etl_migrate_api_spark.session import get_spark

    headline_names()
    spark = get_spark(
        app_name="joblog_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EV_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # bench-identical warm-up
    import pandas as pd
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def _identity(s):
        return s

    _identity.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _warm = F.pandas_udf("long")(_identity)
    spark.range(1024).repartition(32).select(_warm(F.col("id")).alias("x")).agg(
        F.sum("x")
    ).collect()

    marks = {}
    for name in sys.argv[1:]:
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        marks[name] = (t0, time.perf_counter())
        spark.catalog.clearCache()
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(m.keySet().toArray()):
            r = m.get(rid)
            if r is not None:
                r.unpersist()
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse the single event log
    cand = glob.glob(f"{EV_DIR}/*")
    path = cand[0]
    if os.path.isdir(path):
        inner = [p for p in glob.glob(path + "/*") if "appstatus" not in p]
        path = inner[0]
    jobs = {}  # id -> dict
    stages = {}  # id -> dict
    with open(path) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "t0": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "wall_ms": (t1 - t0) if t0 and t1 else None,
                    "tasks": si["Number of Tasks"],
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                sr = m.get("Shuffle Read Metrics", {})
                sw = m.get("Shuffle Write Metrics", {})
                st["sh_read"] = st.get("sh_read", 0) + sr.get(
                    "Remote Bytes Read", 0
                ) + sr.get("Local Bytes Read", 0)
                st["sh_write"] = st.get("sh_write", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )
                st["py_ms"] = st.get("py_ms", 0)

    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        wall = (j["t1"] - j["t0"]) / 1000.0
        print(f"job {jid:3d}  {wall:7.3f}s  {j['desc'][:60]}")
        for sid in sorted(j["stages"]):
            st = stages.get(sid)
            if not st or st.get("wall_ms") is None:
                continue
            print(
                f"    stage {sid:3d} {st['wall_ms']/1000.0:7.3f}s"
                f" tasks={st.get('tasks', '?'):>3}"
                f" taskTime={st.get('task_ms', 0)/1000.0:7.2f}s"
                f" shR={st.get('sh_read', 0)>>10}K shW={st.get('sh_write', 0)>>10}K"
                f"  {st.get('name', '')}"
            )


if __name__ == "__main__":
    main()
