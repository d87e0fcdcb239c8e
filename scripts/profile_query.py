"""Per-stage profiler for declared queries (guide §1: measure first).

Runs each named query against a UI-enabled local session, forces it
with the noop sink, and dumps per-stage metrics scraped from the
Spark UI REST API (localhost only): task count, executor run time,
shuffle read/write bytes, and stage wall time. This is how a change's
"fold stage now runs >= cores tasks" claim gets a committed artifact
(VERDICT r14 item 9).

Usage:
  python scripts/profile_query.py q_dedup_embed_recall [q_x ...] \
      [--sf /root/testdata/sf0.1] [--cpus 32] [--warm] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.loads(r.read().decode())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--warm", action="store_true", help="one untimed warm-up run")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from flink_pipeline_spark.plans import query_fns
    from flink_pipeline_spark.session import EngineConf, get_session

    port = 4049
    spark = get_session(
        EngineConf(
            app_name="fps_profile",
            master=f"local[{args.cpus}]",
            shuffle_partitions=int(args.cpus),
            ui_enabled=True,
            extra={"spark.ui.port": str(port)},
        )
    )
    fns = query_fns()
    app_id = rest(port, "applications")[0]["id"]
    out: dict[str, dict] = {}

    for name in args.queries:
        if args.warm:
            fns[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        runs = []
        for rep in range(args.repeats):
            before = {s["stageId"] for s in rest(port, f"applications/{app_id}/stages")}
            spark.sparkContext.setJobDescription(f"profile:{name}:{rep}")
            t0 = time.time()
            fns[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            spark.catalog.clearCache()
            stages = [
                s
                for s in rest(port, f"applications/{app_id}/stages")
                if s["stageId"] not in before and s["status"] == "COMPLETE"
            ]
            stages.sort(key=lambda s: -s.get("executorRunTime", 0))
            runs.append(
                {
                    "wall_sec": round(wall, 3),
                    "n_stages": len(stages),
                    "n_tasks": sum(s["numCompleteTasks"] for s in stages),
                    "executor_run_sec": round(
                        sum(s.get("executorRunTime", 0) for s in stages) / 1e3, 2
                    ),
                    "shuffle_read_mb": round(
                        sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
                    ),
                    "shuffle_write_mb": round(
                        sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
                    ),
                    "top_stages": [
                        {
                            "id": s["stageId"],
                            "tasks": s["numCompleteTasks"],
                            "run_sec": round(s.get("executorRunTime", 0) / 1e3, 2),
                            "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                            "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                            "name": (s.get("name") or "")[:100],
                        }
                        for s in stages[:12]
                    ],
                }
            )
        out[name] = {"runs": runs}
        r0 = runs[-1]
        print(
            f"{name}: wall={r0['wall_sec']}s stages={r0['n_stages']} "
            f"tasks={r0['n_tasks']} exec={r0['executor_run_sec']}s "
            f"shRead={r0['shuffle_read_mb']}MB shWrite={r0['shuffle_write_mb']}MB"
        )
        for s in r0["top_stages"][:8]:
            print(
                f"    stage {s['id']}: {s['tasks']} tasks, {s['run_sec']}s exec, "
                f"read {s['sh_read_mb']}MB, write {s['sh_write_mb']}MB  {s['name']}"
            )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
