"""Dump .explain('formatted') for named queries to files.

    python tools/explain_dump.py --out plans/r13 --suffix _before q1 q2 ...

Writes <out>/<query><suffix>.txt for each query. Planning runs at
--sf (default sf0.1, the bench scale); queries that materialize()
during plan construction execute those legs eagerly, which is fine —
the dump captures the FINAL consumed plan the bench times.
"""

from __future__ import annotations

import argparse
import os
import sys
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
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    out = REPO / args.out
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        df = registry.QUERIES[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out / f"{name}{args.suffix}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
        cleanup_materialized()


if __name__ == "__main__":
    main()
