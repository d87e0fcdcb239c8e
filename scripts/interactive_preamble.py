"""Preamble for interactive optimization sessions (tmux):
builds a UI-enabled local[32] session and defines helpers:

  t(name, sf=SF01, n=1)     -> time a declared query (noop sink), min-of-n
  parity(name, sf=SF001)    -> oracle parity check for one declared query
  prof(name)                -> run + per-stage profile via REST
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from flink_pipeline_spark.plans import query_fns  # noqa: E402
from flink_pipeline_spark.plans.registry import ORACLES  # noqa: E402
from flink_pipeline_spark.session import EngineConf, get_session  # noqa: E402
from tests.parity import assert_parity  # noqa: E402

SF001 = "/root/testdata/sf0.001"
SF01G = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
PORT = 4046

spark = get_session(
    EngineConf(
        app_name="fps_interactive",
        master="local[32]",
        shuffle_partitions=32,
        ui_enabled=True,
        extra={"spark.ui.port": str(PORT)},
    )
)
FNS = query_fns()


def t(name, sf=SF01, n=1):
    best = None
    for _ in range(n):
        t0 = time.time()
        FNS[name](spark, sf).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None else min(best, el)
        spark.catalog.clearCache()
    print(f"{name}: {best:.3f}s (min of {n})")
    return best


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _con(sf):
    con = duckdb.connect()
    for tb in TABLES:
        p = os.path.join(sf, f"{tb}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def parity(name, sf=SF01G):
    con = _con(sf)
    assert_parity(FNS[name](spark, sf), con, ORACLES[name], name)
    con.close()
    print(f"{name}: parity OK at {sf}")


def _rest(path):
    with urllib.request.urlopen(
        f"http://localhost:{PORT}/api/v1/{path}"
    ) as r:
        return json.loads(r.read().decode())


def prof(name, sf=SF01):
    app = _rest("applications")[0]["id"]
    before = {s["stageId"] for s in _rest(f"applications/{app}/stages")}
    t0 = time.time()
    FNS[name](spark, sf).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.catalog.clearCache()
    stages = [
        s
        for s in _rest(f"applications/{app}/stages")
        if s["stageId"] not in before and s["status"] == "COMPLETE"
    ]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    tot = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
    print(f"{name}: wall={wall:.2f}s stages={len(stages)} exec={tot:.1f}s")
    for s in stages[:10]:
        print(
            f"  st{s['stageId']}: {s['numCompleteTasks']}t "
            f"{s.get('executorRunTime', 0) / 1e3:.2f}s "
            f"r{s.get('shuffleReadBytes', 0) // 1024}K "
            f"w{s.get('shuffleWriteBytes', 0) // 1024}K"
        )
    return wall


print("ready: t(name), parity(name), prof(name)")
