"""Isolated per-query profile — the BASELINE.md adjudication protocol.

    python tools/isolated_profile.py q1 [q2 ...] [--runs 10] [--sf DIR]

For each named query: warm once at sf0.001 (codegen/JIT), then N tight
runs at the target SF with the noop sink, printing every run plus
min/median. Used to adjudicate bench-gate breaches: a genuine plan
regression reproduces its time across all N runs on an idle host; a
host stall shows up as a divergent outlier set.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from json2hbase_spark import registry  # noqa: E402
from json2hbase_spark.materialize import cleanup_materialized  # noqa: E402
from json2hbase_spark.session import get_spark  # noqa: E402

registry.load_all_query_modules()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("json2hbase_profile")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = registry.QUERIES[name]
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        cleanup_materialized()
        runs: list[float] = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            cleanup_materialized()
        out[name] = {
            "runs": runs,
            "min": min(runs),
            "median": round(statistics.median(runs), 3),
        }
        print(f"# {name}: runs={runs} min={min(runs)} median={out[name]['median']}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
