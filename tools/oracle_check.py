"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle twin on the
same parquet fixtures, then compares row count, column names, and
order-insensitive values (exact for non-floats, tolerant + strict-hash
report for floats, so round()-boundary risks surface before the driver
sees them).

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.01] [q1 q2 ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
import traceback
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from json2hbase_spark import registry  # noqa: E402
from json2hbase_spark.io import TABLES  # noqa: E402
from json2hbase_spark.session import get_spark  # noqa: E402

registry.load_all_query_modules()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == +0.0 semantically; signed-zero repr noise breaks row alignment
        return v
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    return v


def _rows_from_pandas(pdf):
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False):
        out.append(tuple(_norm_cell(v) for v in row))
    return cols, out


def _sort_key(row):
    return tuple("\x00" if v is None else str(v) for v in row)


def strict_hash(rows) -> str:
    h = hashlib.sha256()
    for row in sorted(rows, key=_sort_key):
        h.update(repr(row).encode())
    return h.hexdigest()[:12]


def compare(name: str, spark_pdf, duck_pdf) -> list[str]:
    problems = []
    s_cols, s_rows = _rows_from_pandas(spark_pdf)
    d_cols, d_rows = _rows_from_pandas(duck_pdf)
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duck={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
        return problems
    s_rows.sort(key=_sort_key)
    d_rows.sort(key=_sort_key)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            ok = True
            if isinstance(sv, float) and isinstance(dv, float):
                ok = (sv == dv) or (sv != sv and dv != dv) or math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9)
            elif type(sv) is not type(dv) and sv is not None and dv is not None:
                ok = str(sv) == str(dv)
                if not ok:
                    problems.append(
                        f"type/value mismatch row {i} col {s_cols[c]}: "
                        f"spark={sv!r}({type(sv).__name__}) duck={dv!r}({type(dv).__name__})"
                    )
                    n_bad += 1
                    continue
            else:
                ok = sv == dv
            if not ok:
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"value mismatch row {i} col {s_cols[c]}: spark={sv!r} duck={dv!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched cells total")
    # strict hash parity (what the driver actually does) as a warning signal
    if not problems and strict_hash(s_rows) != strict_hash(d_rows):
        problems.append("WARN-ONLY: tolerant match but strict repr-hash differs (float formatting)")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    names = args.names or sorted(registry.QUERIES)
    spark = get_spark("oracle_check")
    con = duck_connection(args.sf)

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        dt = time.time() - t0
        oracle = registry.ORACLES.get(name)
        if oracle is None:
            print(f"rows  {name}: {len(spark_pdf)} rows ({dt:.1f}s, no oracle)")
            n_rows_only += 1
            continue
        t1 = time.time()
        try:
            duck_pdf = con.execute(oracle).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb oracle raised: {exc}")
            n_fail += 1
            continue
        t_duck = time.time() - t1
        t2 = time.time()
        problems = compare(name, spark_pdf, duck_pdf)
        t_cmp = time.time() - t2
        real = [p for p in problems if not p.startswith("WARN-ONLY")]
        if real:
            print(f"FAIL  {name} ({len(spark_pdf)} rows, {dt:.1f}s)")
            for p in problems[:8]:
                print(f"      {p}")
            n_fail += 1
        else:
            warn = " [strict-hash-warn]" if problems else ""
            print(
                f"ok    {name} ({len(spark_pdf)} rows, {dt:.1f}s spark"
                f" + {t_duck:.1f}s duck + {t_cmp:.1f}s cmp){warn}"
            )
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
