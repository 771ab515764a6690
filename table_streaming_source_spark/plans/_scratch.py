"""Deterministic, self-cleaning scratch space for fixture materialization
(ADVICE round 3: per-call ``mkdtemp`` dirs and hash-randomized metastore
table names accumulated orphans across runs).

Two rules replace ``tempfile.mkdtemp``:

* **Deterministic names.**  A scratch path is a pure function of its
  ``(kind, key)`` — typically the sf_dir and format — so a repeated run
  lands on the SAME path and overwrites in place instead of leaving a
  fresh orphan per process.  Even a ``kill -9`` (no atexit) therefore
  bounds disk use at one dir per distinct fixture, not one per run.
* **atexit cleanup.**  Every path handed out (and every metastore table
  registered) is removed/dropped at interpreter exit; in-process caches
  key on the live session, so nothing ever reuses these across
  processes anyway.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

_CREATED: set[str] = set()
_TABLES: list[tuple[object, str]] = []


def scratch_dir(kind: str, *key_parts: str, fresh: bool = False) -> str:
    """Return (and create) the deterministic scratch dir for
    ``(kind, key_parts)``.  ``fresh=True`` wipes prior content first —
    required for checkpoint/sink dirs that must start empty."""
    digest = hashlib.md5(
        "\x00".join(key_parts).encode("utf-8")
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"tsss_{kind}_{digest}")
    if fresh and os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    _CREATED.add(path)
    return path


def deterministic_tag(*key_parts: str) -> str:
    """Stable 8-hex tag for metastore table names: same fixture → same
    name → overwrite in place across runs (never PYTHONHASHSEED-random)."""
    return hashlib.md5("\x00".join(key_parts).encode("utf-8")).hexdigest()[:8]


def register_table(spark, name: str) -> None:
    """Drop ``name`` at interpreter exit (best-effort)."""
    _TABLES.append((spark, name))


@atexit.register
def _cleanup() -> None:
    for spark, name in _TABLES:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:
            pass
    _TABLES.clear()
    for path in list(_CREATED):
        shutil.rmtree(path, ignore_errors=True)
    _CREATED.clear()
