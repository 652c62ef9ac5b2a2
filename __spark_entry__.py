"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``json2hbase_spark``; this module only adapts
the engine's query registry to the driver's contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from json2hbase_spark import registry  # noqa: E402
from json2hbase_spark.session import apply_engine_confs  # noqa: E402

registry.load_all_query_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary, d1_agg_hash)
    on /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_confs(spark)
    return registry.QUERIES["d1_agg_hash"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate records only the FIRST 50 entries of
# queries(), so order the NOT-yet-recorded queries first: across
# rounds the union of driver records then covers the whole registry
# instead of re-checking the same 50. Rather than hand-maintaining the
# verified list, derive it from the CORRECTNESS_r*.json files the
# driver leaves in the repo: a key counts as verified if it
# hash-matched, or ran rows-only because SURVEY §2 declares no hash
# oracle possible ("no_oracle"). Genuine failures re-surface into the
# window automatically. Local full-registry parity is still checked
# every session via tools/oracle_check.py.
def _driver_verified() -> dict[str, int]:
    """name → LATEST round with a green driver record (hash-match, or
    rows-only where SURVEY §2 declares no hash oracle possible)."""
    import json
    import re

    done: dict[str, int] = {}
    for path in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rec = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rec.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or row.get("err") == "no_oracle":
                done[name] = max(done.get(name, 0), rnd)
    return done


def _fresh_rank(name: str) -> int:
    """Priority order within the not-yet-recorded set (as of round 7
    that means each round's new additions — e.g. the 23 round-7 ops
    j91–j106, b12, a26/a27, c18, d16, e13, i26 — which the 50-entry
    window picks up first, the verified remainder rotating
    oldest-record-first behind them). The family order was chosen in
    round 4 when ~111 ids were unrecorded: streaming first (largest,
    hardest to re-verify), then the k/m escape hatches, then corpus
    ops, then the relational/source/function tails. Everything is
    verified locally every session via tools/oracle_check.py AND
    tools/determinism_check.py regardless of window position."""
    head = name.split("_", 1)[0]
    if head[0] == "i" or name == "c7_join_asof":
        return 0
    if head[0] == "k" or name in ("m6_modality_mix", "m7_media_dedup"):
        return 1
    if head[0] == "j" and head[1:].isdigit() and int(head[1:]) >= 40:
        return 2  # round-4 corpus ops: driver-verify in their own round
    if head[0] == "c":
        return 3
    if head[0] in ("g", "e", "f", "d"):
        return 4
    if head[0] == "a":
        return 5
    if head[0] == "b":
        return 6
    if head[0] == "j" or head[0] == "m":
        return 7
    return 8  # h-family spills to the following round's window


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2. Queries
    without any driver-side correctness record come first (ordered by
    _fresh_rank); as of round 7 every registered query has a green
    record, so the verified remainder rotates OLDEST-record-first —
    each round's 50-entry window re-verifies the stalest ids against
    the freshly regenerated fixtures instead of re-checking the same
    recent 50."""
    seen = _driver_verified()
    fresh_names = [k for k in registry.QUERIES if k not in seen]
    fresh_names.sort(key=lambda n: (_fresh_rank(n), n))
    fresh = {k: registry.QUERIES[k] for k in fresh_names}
    stale_first = sorted(
        (k for k in seen if k in registry.QUERIES),
        key=lambda n: (seen[n], n),
    )
    rest = {k: registry.QUERIES[k] for k in stale_first}
    return {**fresh, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI twin for each SQL-expressible query; ops without an
    entry get the driver's weaker rows-only check."""
    return dict(registry.ORACLES)
