"""Decompose a declared query's wall time into jobs, stages and driver
gaps via the Spark event log. Usage:

    python plans/r13/profile_query.py <query>[,<query2>...] [n_runs]

For each query: one untimed warm run, then n timed runs; prints the
LAST timed run's job timeline (job wall, stage executor time, the
driver gap before each job) so fixed overhead is attributable.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dataeng_azure_spotify_spark.session import get_spark  # noqa: E402

import __spark_entry__ as m  # noqa: E402

EVDIR = "/tmp/evlog"


def main() -> None:
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR)
    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    qs = m.queries()
    # warm the session like bench.py does
    from pyspark.sql import functions as F
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("g")).count().count()
    m._cat(spark, sf_dir)

    marks = {}
    for name in names:
        fn = qs[name]
        spark.catalog.clearCache()
        fn(spark, sf_dir).count()  # warm
        walls = []
        for i in range(n_runs):
            spark.catalog.clearCache()
            sc.setJobDescription(f"__prof__{name}__{i}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            walls.append(time.time() - t0)
            sc.setJobDescription(None)
        marks[name] = walls
        import gc
        gc.collect()
    spark.stop()
    time.sleep(1)

    # parse the event log (rolling dir in Spark 4: events_* files inside)
    root = [os.path.join(EVDIR, f) for f in os.listdir(EVDIR)][0]
    if os.path.isdir(root):
        evfiles = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.startswith("events_")
        )
    else:
        evfiles = [root]
    jobs = {}   # id -> dict
    stages = {} # id -> dict
    import itertools

    def _open(f):
        if f.endswith(".zstd"):
            import io
            import subprocess

            out = subprocess.run(
                ["zstd", "-dc", f], capture_output=True, check=True
            ).stdout
            return io.StringIO(out.decode())
        return open(f)

    for line in itertools.chain.from_iterable(_open(f) for f in evfiles):
        e = json.loads(line)
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            props = e.get("Properties") or {}
            jobs[e["Job ID"]] = {
                "t0": e["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
            }
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            tasks = si.get("Number of Tasks", 0)
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", "")[:60],
                "tasks": tasks,
                "t0": si.get("Submission Time", 0),
                "t1": si.get("Completion Time", 0),
            }

    for name in names:
        tag = f"__prof__{name}__{len(marks[name]) - 1}"
        sel = sorted(
            (j for j in jobs.values() if j.get("desc") == tag and "t1" in j),
            key=lambda j: j["t0"],
        )
        if not sel:
            print(f"== {name}: no jobs captured for {tag}")
            continue
        total = (sel[-1]["t1"] - sel[0]["t0"]) / 1e3
        print(f"\n== {name}: wall(s)={['%.2f' % w for w in marks[name]]} "
              f"jobs={len(sel)} span={total:.2f}s")
        prev_end = None
        gap_total = 0.0
        for j in sel:
            gap = (j["t0"] - prev_end) / 1e3 if prev_end else 0.0
            gap_total += max(gap, 0)
            dur = (j["t1"] - j["t0"]) / 1e3
            stg = [
                f"{stages[s]['tasks']}t"
                for s in j["stages"]
                if s in stages
            ]
            names_s = {stages[s]["name"] for s in j["stages"] if s in stages}
            print(f"  gap {gap:6.3f}  job {dur:6.3f}s  stages[{len(j['stages'])}] "
                  f"{'+'.join(stg[:8])} {sorted(names_s)[:2]}")
            prev_end = j["t1"]
        print(f"  total driver gap between jobs: {gap_total:.2f}s")


if __name__ == "__main__":
    main()
