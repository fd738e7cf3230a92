#!/usr/bin/env python
"""Per-stage decomposition of headline queries via the Spark event log.

Runs each named query REPEATS times with setJobDescription(name), event
log on, then parses the log into per-query {job, stage, duration,
shuffle bytes, task count} so optimization targets the real stage, not
a guess (guide section 1 / 7).

Usage: python plans/r14/profile_queries.py name [name ...]
Writes /tmp/r14_profile/<name>.json + a text summary to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

EVDIR = "/tmp/r14_eventlog"
OUTDIR = "/tmp/r14_profile"


def parse_eventlog(path: str) -> dict:
    """Aggregate stage metrics per job description from one app log."""
    job_desc: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stages: dict[int, dict] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                job_desc[jid] = props.get(
                    "spark.job.description", props.get("callSite.short", "?")
                )
                job_stages[jid] = [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])
                ]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages[sid] = {
                    "stage": sid,
                    "name": si.get("Stage Name", "")[:120],
                    "tasks": si.get("Number of Tasks"),
                    "wall_ms": (com - sub) if sub and com else None,
                    "executor_run_ms": acc.get("internal.metrics.executorRunTime"),
                    "cpu_ms": (acc.get("internal.metrics.executorCpuTime") or 0)
                    // 1_000_000,
                    "shuffle_read_b": acc.get(
                        "internal.metrics.shuffle.read.remoteBytesRead", 0
                    )
                    or 0,
                    "shuffle_read_local_b": acc.get(
                        "internal.metrics.shuffle.read.localBytesRead", 0
                    )
                    or 0,
                    "shuffle_write_b": acc.get(
                        "internal.metrics.shuffle.write.bytesWritten", 0
                    )
                    or 0,
                    "input_b": acc.get("internal.metrics.input.bytesRead", 0)
                    or 0,
                    "python_ser_ms": acc.get("data sent to Python workers", 0),
                }
    out: dict[str, list[dict]] = {}
    for jid, desc in sorted(job_desc.items()):
        rows = [stages[s] for s in job_stages.get(jid, []) if s in stages]
        out.setdefault(desc, []).append(
            {"job": jid, "stages": sorted(rows, key=lambda r: r["stage"])}
        )
    return out


def main() -> None:
    names = sys.argv[1:]
    assert names, "pass query names"
    repeats = int(os.environ.get("PROFILE_REPEATS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(EVDIR, exist_ok=True)
    os.makedirs(OUTDIR, exist_ok=True)

    from gpssbzd_spark import corpus, get_session

    spark = get_session(
        app_name="gpssbzd_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    qs = corpus.queries()

    # warmup (same as bench)
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    sc.setJobDescription("warmup")
    spark.range(10_000).groupBy((F.col("id") % 8).alias("k")).count()
    spark.range(1_000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    walls: dict[str, list[float]] = {}
    for name in names:
        for rep in range(repeats):
            import gc

            sc.setJobDescription(f"{name}#r{rep}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.setdefault(name, []).append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            del df
            gc.collect()
    sc.setJobDescription(None)
    spark.stop()

    log_path = os.path.join(EVDIR, app_id)
    if not os.path.exists(log_path):
        v2 = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        cand = [
            os.path.join(v2, f)
            for f in os.listdir(v2)
            if f.startswith("events_")
        ]
        assert len(cand) == 1, cand
        log_path = cand[0]
    per_desc = parse_eventlog(log_path)
    for name in names:
        rec = {
            "walls": [round(w, 3) for w in walls[name]],
            "jobs": {
                d: v for d, v in per_desc.items() if d.startswith(name + "#")
            },
        }
        with open(os.path.join(OUTDIR, f"{name}.json"), "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"\n=== {name} walls={rec['walls']}")
        # print the LAST repeat (warm) decomposition
        last = f"{name}#r{repeats-1}"
        for j in rec["jobs"].get(last, []):
            for s in j["stages"]:
                print(
                    f"  job{j['job']:>3} stage{s['stage']:>4} "
                    f"wall={s['wall_ms'] or 0:>6}ms run={s['executor_run_ms'] or 0:>7}ms "
                    f"cpu={s['cpu_ms'] or 0:>7}ms tasks={s['tasks']:>4} "
                    f"in={s['input_b']:>9} sw={s['shuffle_write_b']:>8} "
                    f"sr={s['shuffle_read_b'] + s['shuffle_read_local_b']:>8} "
                    f"| {s['name'][:60]}"
                )


if __name__ == "__main__":
    main()
