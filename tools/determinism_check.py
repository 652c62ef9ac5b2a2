"""Rerun-determinism gate: every registered query executed TWICE in
one session, strict value-hashes compared.

The oracle gate (tools/oracle_check.py) proves Spark == DuckDB for one
execution; it cannot catch a query that is nondeterministic ACROSS
runs — collect_list/collect_set ordering leaking into output,
partition-order-dependent float sums, time- or random-seeded
expressions, temp-path contents in results. Reproducibility is a core
contract for a training-data engine (a rerun of the pipeline must
produce the identical corpus), so this probes it directly: same
session, same fixtures, two plans executed back to back, sha256 over
the sorted row reprs must match.

Usage:
    python tools/determinism_check.py [--sf /root/testdata/sf0.01] [q1 q2 ...]

Exit code 1 if any query's two runs hash differently.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from json2hbase_spark import registry  # noqa: E402
from json2hbase_spark.materialize import cleanup_materialized  # noqa: E402
from json2hbase_spark.session import get_spark  # noqa: E402
from tools.oracle_check import _rows_from_pandas, strict_hash  # noqa: E402

registry.load_all_query_modules()


def run_hash(spark, name: str, sf_dir: str) -> tuple[str, int]:
    pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    cleanup_materialized()
    _, rows = _rows_from_pandas(pdf)
    return strict_hash(rows), len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("determinism_check")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.names or sorted(registry.QUERIES)
    n_ok = n_bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            h1, r1 = run_hash(spark, name, args.sf)
            h2, r2 = run_hash(spark, name, args.sf)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            n_bad += 1
            continue
        el = time.perf_counter() - t0
        if h1 == h2 and r1 == r2:
            n_ok += 1
            print(f"ok    {name} ({r1} rows, {h1}, {el:.1f}s)")
        else:
            n_bad += 1
            print(f"FLAKY {name}: run1=({r1} rows, {h1}) run2=({r2} rows, {h2})")
    print(f"\n{n_ok} deterministic, {n_bad} flaky/error")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
