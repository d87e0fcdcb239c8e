"""Capture .explain("formatted") for named queries into plan files.

Usage:
  python scripts/explain_queries.py --out plans/r15 --suffix _before q_a q_b
  python scripts/explain_queries.py --out plans/r15 --suffix _after --all-touched q_a ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    from flink_pipeline_spark.plans import query_fns
    from flink_pipeline_spark.session import EngineConf, get_session

    spark = get_session(
        EngineConf(
            app_name="fps_explain",
            master=f"local[{args.cpus}]",
            shuffle_partitions=int(args.cpus),
        )
    )
    fns = query_fns()
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        df = fns[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
