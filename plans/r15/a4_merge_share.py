#!/usr/bin/env python
"""Map-vs-merge stage decomposition of the a4_percentile_exact shape
across the scaling octave (VERDICT r14 #8).

Runs the exact-percentile aggregation over inflate_lineitem(K) for
K in SPARK_GRAFT_SCALE_MULTS (default 1,4,16,64) with event logging,
attributes each stage to map (partial_percentile, the pre-exchange
scan+partial) or merge (the post-exchange final percentile, whose
buffer holds every value of its group), and reports the merge share
of stage wall per K. Writes plans/r15/a4_merge_share.json.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [
        int(m)
        for m in os.environ.get("SPARK_GRAFT_SCALE_MULTS", "1,4,16,64").split(",")
    ]
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))

    from pyspark.sql import functions as F

    from gpssbzd_spark import get_session
    from gpssbzd_spark.dataprep.scalegen import inflate_lineitem
    from gpssbzd_spark.sources import load_table

    evdir = tempfile.mkdtemp(prefix="a4_evlog_")
    spark = get_session(
        app_name="r15_a4_merge_share",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    base = load_table(spark, sf_dir, "lineitem")

    walls: dict[int, list[float]] = {}
    for K in mults:
        # label the cache materialization so it cannot be mis-attributed
        # to the previous K's last repeat
        sc.setJobDescription(f"cache_x{K}")
        inp = inflate_lineitem(base, K).persist()
        inp.count()
        for rep in range(repeats):
            sc.setJobDescription(f"a4x{K}#r{rep}")
            t0 = time.perf_counter()
            out = inp.groupBy("l_returnflag").agg(
                F.round(F.percentile("l_extendedprice", 0.95), 4).alias(
                    "p95_price"
                )
            )
            out.write.format("noop").mode("overwrite").save()
            walls.setdefault(K, []).append(time.perf_counter() - t0)
        inp.unpersist()
    sc.setJobDescription(None)
    spark.stop()

    # parse: per description, split stages into map (has input or
    # shuffle write, no shuffle read of the agg exchange) vs merge
    # (reads the agg shuffle). With AQE the final percentile stage is
    # the one whose tasks READ shuffle and write none.
    log_path = os.path.join(evdir, app_id)
    if not os.path.exists(log_path):
        v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        log_path = [
            os.path.join(v2, f)
            for f in os.listdir(v2)
            if f.startswith("events_")
        ][0]
    job_desc: dict[int, str] = {}
    stage_desc: dict[int, str] = {}
    per_desc: dict[str, list[dict]] = {}
    with open(log_path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                d = props.get("spark.job.description", "")
                job_desc[ev["Job ID"]] = d
                for s in ev.get("Stage Infos", []):
                    stage_desc.setdefault(s["Stage ID"], d)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                d = stage_desc.get(si["Stage ID"], "")
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                sub, com = si.get("Submission Time"), si.get("Completion Time")
                per_desc.setdefault(d, []).append(
                    {
                        "stage": si["Stage ID"],
                        "tasks": si.get("Number of Tasks"),
                        "wall_ms": (com - sub) if sub and com else 0,
                        "run_ms": acc.get("internal.metrics.executorRunTime", 0) or 0,
                        "sr": (acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0)
                        + (acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0),
                        "sw": acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0,
                    }
                )

    out: dict[str, dict] = {
        "what": "a4_percentile_exact map-vs-merge stage share across the "
        "inflate_lineitem octave (VERDICT r14 #8). map = the "
        "partial-percentile stage (writes the agg shuffle), merge = the "
        "final-percentile stage (reads it, writes none); share = merge "
        "run_ms / (map + merge run_ms) of the LAST (warm) repeat. The "
        "agg shuffle bytes are also recorded: Spark's exact Percentile "
        "buffers (value -> count) maps, so replicated rows grow counts, "
        "not buffer size — the merge input is bounded by DISTINCT "
        "values per group whatever K is.",
        "sf_dir": sf_dir,
        "per_k": {},
    }
    for K in mults:
        d = f"a4x{K}#r{repeats-1}"
        stages = per_desc.get(d, [])
        merge = [s for s in stages if s["sr"] > 0 and s["sw"] == 0]
        mapst = [s for s in stages if s["sw"] > 0]
        merge_run = sum(s["run_ms"] for s in merge)
        map_run = sum(s["run_ms"] for s in mapst)
        denom = (map_run + merge_run) or 1
        out["per_k"][K] = {
            "wall_min": round(min(walls[K]), 3),
            "stages": stages,
            "map_run_ms": map_run,
            "merge_run_ms": merge_run,
            "agg_shuffle_bytes": sum(s["sw"] for s in mapst),
            "merge_share": round(merge_run / denom, 4),
        }
        print(
            f"K={K}: wall_min={min(walls[K]):.2f}s merge_share="
            f"{merge_run / denom:.3f} ({merge_run}/{denom} ms) "
            f"agg_shuffle={sum(s['sw'] for s in mapst)}B"
        )
    with open(
        os.path.join(REPO, "plans", "r15", "a4_merge_share.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
