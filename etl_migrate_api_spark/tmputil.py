"""Shared tmp-dir hygiene for queries that materialize scratch state
(format roundtrips, persisted indexes): uuid-suffixed per-run dirs
never collide, and each caller sweeps SIBLING dirs old enough that no
live run plausibly still reads them."""

from __future__ import annotations

import os
import shutil
import time


def sweep_stale_dirs(root: str, max_age_hours: float = 6.0) -> None:
    """Remove subdirectories of ``root`` older than ``max_age_hours``
    (dir mtime = creation time for these write-once scratch dirs;
    6 h >> any gate/bench/pytest session). Missing root is a no-op;
    races with concurrent sweeps are swallowed."""
    cutoff = time.time() - max_age_hours * 3600
    for stale in (
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # a concurrent sweep already took it
