"""Scratch-dir sink roundtrips.

Several queries prove a SINK contract by writing to a temp directory and
reading the result back (scan_roundtrip's CSV dump, neigh_tri_files'
per-vertex partitioned sink, events_partitioned_scan's date-partitioned
layout). The shape is always the same and its one invariant is easy to
break: the returned DataFrame must be MATERIALIZED (localCheckpoint eager)
before the temp dir is removed, or the lazy plan re-reads a deleted path at
collect time. This helper keeps that invariant in one place.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame


def sink_roundtrip(prefix: str, build: Callable[[str], DataFrame]) -> DataFrame:
    """Run `build(tmp_dir)` — write to the dir, read back, transform — and
    return its result eagerly materialized, with the dir removed after."""
    path = tempfile.mkdtemp(prefix=prefix)
    try:
        return build(path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
