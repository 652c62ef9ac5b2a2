"""Per-invocation scratch directories for staged writes and stream
checkpoints.

Eager plans that stage data (ETL round-trips, streaming checkpoints,
foreachBatch state) allocate here: a private ``mkdtemp`` under ONE
process-scoped root that ``atexit`` removes. This closes two ADVICE r7
findings at once:

- **collision/squat safety** — fixed, predictable paths under
  ``tempfile.gettempdir()`` (the old ``/tmp/j2h_*_<tag>`` convention)
  let two concurrent runs overwrite each other mid-read, and on
  multi-user hosts the path can be pre-owned; a per-run ``mkdtemp``
  cannot collide.
- **unbounded accumulation** — bench loops and plan sweeps re-execute
  eager plans every round; bare ``mkdtemp`` dirs were never removed.
  Everything under the shared root disappears when the process exits.

Queries whose TESTS or ORACLES must find the staged path record it in
``LAST_STAGED[query_name]`` instead of re-deriving a fixed path.

The legacy fixed-path sites that remain (a9/a10/a11/a23/c16 staging)
are overwrite-mode and tag-stable by design — their DuckDB oracles or
plan tests re-derive the same path; they are bounded (one dir per
fixture tag) but still carry the concurrency caveat documented here.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None

# query name -> the scratch path its latest invocation staged to
# (tests and verification helpers read this instead of re-deriving
# a fixed path).
LAST_STAGED: dict[str, str] = {}


def scratch_root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="j2h_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh private directory under the process scratch root,
    removed (with everything else) at interpreter exit."""
    return tempfile.mkdtemp(prefix=prefix.rstrip("_") + "_", dir=scratch_root())
