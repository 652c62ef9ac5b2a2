"""Pluggable DataFrame materialization (cut lineage / break subtree
re-execution) with a durability strategy switch.

Why: several operators (MinHash banding, SimHash, dup-components'
edge set, incremental dedup's shingle table, k-means centroids) must
materialize an intermediate so (a) self-joins don't recompute an
HOF-lambda subtree per side (ReuseExchange can't match those plans)
and (b) iterative loops keep a flat plan. ``localCheckpoint`` is the
right local primitive (in-memory, truncates lineage, no config), but
it is executor-local and non-replicated: on a real cluster a lost
executor makes the job unrecoverable because the truncated lineage
cannot be replayed. At 100 TB the materialization must be durable.

Strategies (select via ``SPARK_GRAFT_MATERIALIZE`` or per-call):

- ``local``      — ``localCheckpoint(eager)``. Default for the local
                   harness: fastest, zero config, NOT fault-tolerant.
- ``checkpoint`` — reliable ``checkpoint(eager)`` into
                   ``spark.sparkContext.getCheckpointDir()`` (HDFS/S3
                   on a cluster; a temp dir is auto-set locally).
                   Survives executor loss — the 100 TB default.
- ``persist``    — ``persist(DISK_ONLY_2)`` + count(): 2-replica
                   block-manager copy; cheaper than a checkpoint
                   write, survives single-executor loss, lineage kept
                   (re-derivable after catastrophic loss).
"""

from __future__ import annotations

import atexit
import contextlib
import os
import shutil

from pyspark import StorageLevel
from pyspark.sql import DataFrame

from json2hbase_spark.scratch import scratch_dir

_VALID = ("local", "checkpoint", "persist")

# Lifecycle registry: long-lived sessions (or real clusters) must not
# accumulate cached blocks / checkpoint files across queries. Every
# persist() and every auto-created checkpoint dir is tracked here;
# cleanup_materialized() releases them once the consuming action is
# done (bench.py calls it per query; tests use materialization_scope).
_persisted: list[DataFrame] = []
_created_ckpt_dirs: list[str] = []


def cleanup_materialized(remove_checkpoint_dirs: bool = False) -> None:
    """Unpersist every DataFrame cached by the 'persist' strategy and
    (optionally) delete checkpoint dirs this module auto-created.
    Safe after the consuming action: 'persist' keeps lineage so a late
    re-use just recomputes; call with remove_checkpoint_dirs=True only
    at end-of-session because 'checkpoint' plans read those files.
    NOTE: 'local' (localCheckpoint) blocks are NOT released here —
    Spark's ContextCleaner unpersists them once the driver drops the
    DataFrame reference; gc.collect() below accelerates that drop so
    long sessions do not ride on Python GC timing."""
    import gc

    gc.collect()
    while _persisted:
        df = _persisted.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped
    if remove_checkpoint_dirs:
        while _created_ckpt_dirs:
            shutil.rmtree(_created_ckpt_dirs.pop(), ignore_errors=True)


@contextlib.contextmanager
def materialization_scope():
    """Context manager releasing persists created inside the scope."""
    mark = len(_persisted)
    try:
        yield
    finally:
        while len(_persisted) > mark:
            df = _persisted.pop()
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass


atexit.register(cleanup_materialized, remove_checkpoint_dirs=True)


def strategy_from_env() -> str:
    s = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local")
    if s not in _VALID:
        raise ValueError(f"SPARK_GRAFT_MATERIALIZE must be one of {_VALID}, got {s!r}")
    return s


def materialize(df: DataFrame, strategy: str | None = None) -> DataFrame:
    """Materialize ``df`` now and return a DataFrame whose plan reads
    the materialized result (flat lineage for 'local'/'checkpoint';
    cached-with-lineage for 'persist')."""
    s = strategy or strategy_from_env()
    if s == "local":
        return df.localCheckpoint(eager=True)
    if s == "checkpoint":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            # local fallback; clusters set a durable dir (HDFS/S3) via
            # sc.setCheckpointDir at submit time. Tracked so
            # cleanup_materialized(remove_checkpoint_dirs=True) can
            # reclaim the files at end-of-session.
            d = scratch_dir("json2hbase_ckpt_")
            _created_ckpt_dirs.append(d)
            sc.setCheckpointDir(d)
        return df.checkpoint(eager=True)
    if s == "persist":
        out = df.persist(StorageLevel.DISK_ONLY_2)
        out.count()  # force the write so downstream reuse hits the cache
        _persisted.append(out)
        return out
    raise ValueError(f"unknown materialization strategy {s!r}")
