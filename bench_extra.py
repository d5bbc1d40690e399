#!/usr/bin/env python
"""Round-6 optimization harness — NOT the driver bench (bench.py is frozen).

Per guide §1.4: isolates individual queries with the noop sink so the
computation is timed without the sink, captures `.explain("formatted")`
plans to plans/r06/, and records the same status-store attribution the main
bench uses. Used for before/after evidence in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py plans  [query ...]   # write <q>_{before|after}.txt
  python bench_extra.py time   [query ...]   # noop-sink best-of-N timings
  python bench_extra.py pipeline             # one pipeline run + stage dump

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     R06_PLAN_TAG=before|after (default after), R06_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def get_session():
    from bench import bench_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    return bench_spark("imagor-bench-extra", cpus)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_time(names):
    import __spark_entry__ as entry
    from bench import RegionTimer
    from imagor_spark.engine.workdirs import make_workdir

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session()
    probe = make_workdir("imagor_bx_")
    timer = RegionTimer(spark, probe)
    n_runs = int(os.environ.get("R06_RUNS", "3"))
    out = {}
    qs = entry.queries()
    for name, fn in qs.items():
        if names and name not in names:
            continue
        spark.sparkContext.setJobDescription(f"r06:{name}")
        reps = []
        for _ in range(n_runs):
            rec = timer.run(lambda: _noop(fn(spark, sf_dir)))
            rec.pop("result", None)
            reps.append(rec)
        out[name] = {"best_sec": min(r["sec"] for r in reps), "runs": reps}
        print(f"{name}: {out[name]['best_sec']}s "
              f"{[r['sec'] for r in reps]}", flush=True)
    print(json.dumps(out))
    spark.stop()


def cmd_plans(names):
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("R06_PLAN_TAG", "after")
    spark = get_session()
    os.makedirs(os.path.join(ROOT, "plans", "r06"), exist_ok=True)
    for name, fn in entry.queries().items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:
            plan = f"(explain failed: {exc})"
        path = os.path.join(ROOT, "plans", "r06", f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


def cmd_pipeline():
    """One pipeline run with per-stage metrics dumped (shuffle attribution)."""
    import shutil
    import urllib.request

    from bench import run_pipeline_bench
    from imagor_spark.engine.workdirs import make_workdir, purge_stale_workdirs

    purge_stale_workdirs()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session()
    wd = make_workdir("imagor_bx_pipe_", base=os.environ.get("SPARK_GRAFT_WORKDIR"))
    try:
        res = run_pipeline_bench(spark, sf_dir, wd)
        print(json.dumps({k: v for k, v in res.items() if k != "runs"}))
        # stage-level dump for shuffle attribution
        sc = spark.sparkContext
        base = sc.uiWebUrl
        app = sc.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        for s in stages[:18]:
            print(f"stage {s['stageId']}: {s['name'][:70]} "
                  f"run={s['executorRunTime']/1e3:.1f}s "
                  f"sh_r={s.get('shuffleReadBytes',0)/1e6:.0f}MB "
                  f"sh_w={s.get('shuffleWriteBytes',0)/1e6:.0f}MB "
                  f"in={s.get('inputBytes',0)/1e6:.0f}MB "
                  f"out={s.get('outputBytes',0)/1e6:.0f}MB "
                  f"tasks={s.get('numCompleteTasks')}")
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = set(sys.argv[2:])
    if mode == "plans":
        cmd_plans(names)
    elif mode == "pipeline":
        cmd_pipeline()
    else:
        cmd_time(names)
