"""Pin kg_linked_pipeline's wall-time variance (VERDICT r4 #7).

Runs the flagship linked pipeline 6x in one warm session under a
shuffle-config variant, collecting per-run stage-level evidence from
the Spark REST API: per-stage wall (completion - submission), summed
executor run/CPU time, and task-duration quantiles for the slowest
stage of the slowest run. If total executor time is flat across runs
while stage wall varies, the variance is scheduling, not compute.

Usage:
  SPARK_GRAFT_LV_CONF=base|nocoalesce|fixedsp python scripts/linked_variance.py
Writes one JSON line per run to stdout and a summary to
/tmp/linked_variance_<conf>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from json_ld_spark.operators import linking as lk  # noqa: E402
from json_ld_spark.plans.kg import build_kg  # noqa: E402
from json_ld_spark.session import get_spark  # noqa: E402
from json_ld_spark.sources.transcripts import transcripts_from_documents  # noqa: E402

CONFS = {
    "base": {},
    "nocoalesce": {"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    "fixedsp": {"spark.sql.adaptive.enabled": "false"},
    "nocodegen": {"spark.sql.codegen.wholeStage": "false"},
    "bigjit": {
        # raise the C2 inline ceiling for Janino whole-stage methods and
        # keep flushing off so compiled generated code is never swept
        "spark.driver.extraJavaOptions": (
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m"
        ),
    },
}


def _rest(app_base: str, path: str):
    with urllib.request.urlopen(app_base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    conf_name = os.environ.get("SPARK_GRAFT_LV_CONF", "base")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_LV_RUNS", "6"))
    extra = {"spark.ui.enabled": "true", **CONFS[conf_name]}
    spark = get_spark(f"linked-variance-{conf_name}", cores=cores, extra_conf=extra)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    transcripts = (
        transcripts_from_documents(spark, sf_dir, amplify=40)
        .repartition(max(cores * 2, 16), "conv_id")
        .cache()
    )
    transcripts.count()
    dictionary = lk.synthesize_entity_dictionary(
        spark, sf_dir, max_entities=2000
    ).cache()
    dictionary.count()

    def job():
        return build_kg(transcripts, entity_dictionary=dictionary, engine="native")[
            "triples"
        ].count()

    job()  # warm python workers + codegen

    def code_cache():
        """JVM code-heap pool usage via JMX — if 'CodeHeap non-profiled
        nmethods' (or the unsegmented 'CodeCache') fills, HotSpot stops
        JIT-compiling and whole-stage-codegen runs interpreted (~30x)."""
        jvm = spark.sparkContext._jvm
        pools = jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
        out = {}
        for p in pools:
            n = p.getName()
            if "Code" in n or "code" in n:
                u = p.getUsage()
                out[n] = f"{u.getUsed() // (1 << 20)}/{u.getMax() // (1 << 20)}MB"
        return out

    def storage():
        """Cached-RDD census: if repeated runs accumulate dead
        localCheckpoint blocks until the transcripts cache is evicted,
        slow runs will show missing cached partitions + parquet
        re-reads (recompute of the amplify lineage)."""
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        tot_mb = sum(i.memSize() for i in infos) // (1 << 20)
        n_rdds = len(infos)
        tr = [
            f"{i.numCachedPartitions()}/{i.numPartitions()}"
            for i in infos
            if "repartition" in (i.name() or "") or i.numPartitions() == 64
        ]
        return {"n_cached_rdds": n_rdds, "mem_mb": int(tot_mb), "p64": tr[:3]}

    def jit_ms():
        jvm = spark.sparkContext._jvm
        return (
            jvm.java.lang.management.ManagementFactory.getCompilationMXBean()
            .getTotalCompilationTime()
        )

    # Calibrated pure-CPU spin probe, independent of Spark/JIT state:
    # a fixed-work Python loop sampled continuously on a daemon thread.
    # If spins dilate in lockstep with slow runs, the HOST got slower
    # (guest-invisible co-tenant contention); if spins stay flat while
    # tasks dilate, the slowdown is inside the JVM.
    import threading

    spin_log: list[tuple[float, float]] = []
    mem_log: list[tuple[float, float]] = []

    def _spin_once() -> float:
        t0 = time.monotonic()
        x = 0
        for _ in range(2_000_000):
            x += 1
        return time.monotonic() - t0

    # memory-heavy twin: random-stride reads over a 128 MB array. An
    # ALU loop rides out host cache/bandwidth contention; this does
    # not — if mem dilates with slow runs while spin stays flat, the
    # episodes are co-tenant MEMORY-SUBSYSTEM contention, invisible to
    # /proc/stat steal.
    import numpy as np

    mem_arr = np.arange(16_000_000, dtype=np.int64)
    mem_idx = np.random.default_rng(7).integers(0, 16_000_000, 2_000_000)

    def _mem_once() -> float:
        t0 = time.monotonic()
        mem_arr[mem_idx].sum()
        return time.monotonic() - t0

    def _spinner():
        while not stop_spin.is_set():
            d = _spin_once()
            spin_log.append((time.monotonic(), d))
            m = _mem_once()
            mem_log.append((time.monotonic(), m))
            time.sleep(0.25)

    stop_spin = threading.Event()
    baseline_spin = min(_spin_once() for _ in range(5))
    baseline_mem = min(_mem_once() for _ in range(5))
    threading.Thread(target=_spinner, daemon=True).start()
    print(json.dumps({"code_cache_initial": code_cache(),
                      "spin_baseline_s": round(baseline_spin, 3),
                      "mem_baseline_s": round(baseline_mem, 3)}), flush=True)

    runs = []
    for i in range(n_runs):
        jit0 = jit_ms()
        seen = {(s["stageId"], s["attemptId"]) for s in _rest(base, "/stages")}
        la0 = os.getloadavg()[0]
        t0 = time.monotonic()
        job()
        wall = time.monotonic() - t0
        la1 = os.getloadavg()[0]
        def _window(log, base):
            xs = [d for (ts, d) in log if t0 <= ts <= t0 + wall]
            if not xs:
                return {"n": 0, "med_x": None, "max_x": None}
            return {
                "n": len(xs),
                "med_x": round(sorted(xs)[len(xs) // 2] / base, 1),
                "max_x": round(max(xs) / base, 1),
            }

        spin = _window(spin_log, baseline_spin)
        mem = _window(mem_log, baseline_mem)
        stages = [
            s
            for s in _rest(base, "/stages?status=COMPLETE")
            if (s["stageId"], s["attemptId"]) not in seen
        ]
        tot_run = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
        tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
        per_stage = sorted(
            (
                {
                    "id": s["stageId"],
                    "name": s["name"].split("\n")[0][:60],
                    "desc": (s.get("description") or "")[:80],
                    "tasks": s["numCompleteTasks"],
                    "runTime_s": round(s.get("executorRunTime", 0) / 1e3, 2),
                    "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                    "spill_mb": round(
                        (s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0))
                        / 1e6,
                        1,
                    ),
                    "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                }
                for s in stages
            ),
            key=lambda x: -x["runTime_s"],
        )[:4]
        rec = {
            "run": i,
            "wall_s": round(wall, 2),
            "n_stages": len(stages),
            "executor_run_s": round(tot_run, 1),
            "executor_cpu_s": round(tot_cpu, 1),
            "loadavg": [la0, la1],
            "jit_ms": jit_ms() - jit0,
            "spin_dilation": spin,
            "mem_dilation": mem,
            "storage": storage(),
            "code_cache": code_cache(),
            "top_stages": per_stage,
        }
        runs.append(rec)
        print(json.dumps(rec), flush=True)

    # task-duration quantiles for the heaviest stage of the slowest run
    slow = max(runs, key=lambda r: r["wall_s"])
    detail = {}
    if slow["top_stages"]:
        sid = slow["top_stages"][0]["id"]
        try:
            q = _rest(
                base,
                f"/stages/{sid}/0/taskSummary?quantiles=0.0,0.5,0.95,1.0",
            )
            detail = {
                "stage": sid,
                "duration_q_ms": q.get("duration"),
                "schedulerDelay_q_ms": q.get("schedulerDelay"),
            }
        except Exception as ex:  # noqa: BLE001
            detail = {"error": str(ex)}
    walls = sorted(r["wall_s"] for r in runs)
    summary = {
        "conf": conf_name,
        "walls_s": walls,
        "band": [walls[0], walls[-1]],
        "executor_run_s": [r["executor_run_s"] for r in runs],
        "slowest_stage_tasks": detail,
    }
    print(json.dumps(summary), flush=True)
    with open(f"/tmp/linked_variance_{conf_name}.json", "w") as f:
        json.dump({"runs": runs, "summary": summary}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
