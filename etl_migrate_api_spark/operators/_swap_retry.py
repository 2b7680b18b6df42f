"""Bounded retry for index readers racing a compact's directory swap.

Both persisted index families (the inverted text index and the
IVF/PQ/IVF-PQ vector layouts) compact by writing temp directories and
swapping each live dir with two renames (``dir -> dir.old``,
``tmp -> dir``), clearing the tombstone log strictly last. A reader
whose FILE LISTING straddles that swap sees a transiently missing or
momentarily empty path, and Spark's plan build raises
FileNotFoundException / PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA even
though every pre- and post-swap directory state is complete and exact
(probed live in r13: 7 listing failures in ~25 straddled swaps under a
48-cycle compact storm — a LIVENESS gap, never a wrong answer; each
reader docstring carried a "retry on failure" contract). This module
puts that contract in code (VERDICT r13 item 2): re-run the family's
recover hook (heals a crashed swap, a cheap isdir probe otherwise) and
rebuild, a bounded number of times, ONLY for the transient listing
error shapes — anything else re-raises immediately, first time.

Scope: the retry covers the reader's BUILD — plan resolution plus
every eager side-read inside it (sidecar stats/centroid/codebook
collects, schema inference, the probe listings). It cannot cover an
action a CALLER later runs on the returned DataFrame: a compact
swapping files between the build and that action surfaces as
[FAILED_READ_FILE.FILE_NOT_EXIST] at collect time, outside this
wrapper. That is the readers' standing execute-soon contract (consume
promptly; rebuild after mutating the index) — unchanged here, and the
engine's own callers and the driver already consume promptly.

Retry is safe here because every reader build is idempotent: it holds
no partial state, re-reads the sidecars, and re-derives the plan from
the directory layout as found. Compaction is single-writer by
contract, so the post-swap state heals every subsequent listing — the
bounded loop converges unless the index is genuinely gone, in which
case the final attempt's error propagates unchanged.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

T = TypeVar("T")

# Error shapes a torn two-rename swap produces at plan-build time: the
# directory vanishes between the listing and the footer read (Java
# FileNotFoundException, surfaced as PATH_NOT_FOUND by Spark 4's error
# classes), momentarily lists no files (schema inference fails), or a
# file listed pre-swap is opened post-swap by an eager side-read
# (FAILED_READ_FILE.FILE_NOT_EXIST at the collect inside the build).
# Matched on the rendered message: the JVM exception arrives wrapped in
# different Python types (AnalysisException, Py4JJavaError) depending
# on which phase of the build hits it. Nothing else retries.
_TRANSIENT_MARKERS = (
    "FileNotFoundException",
    "PATH_NOT_FOUND",
    "UNABLE_TO_INFER_SCHEMA",
    "Unable to infer schema",
    "FAILED_READ_FILE.FILE_NOT_EXIST",
    # Hadoop's RawLocalFileSystem throws AccessDeniedException whenever
    # java.io.File.list() returns null — which it does for a directory
    # that VANISHED mid-listing, not just for a real permission wall
    # (caught live by the 48-cycle storm probe: a bucket partition dir
    # swapped away under FileUtil.list surfaced as "Permission
    # denied"). A genuine chmod problem still fails — it just burns
    # the bounded retries (~0.2 s) first.
    "java.nio.file.AccessDeniedException",
)

_ATTEMPTS = 3
_BACKOFF_S = 0.05  # the swap is two renames — milliseconds, not seconds


# Spark 4 error-condition names for the same shapes — checked
# structurally via PySparkException.getCondition() before falling back
# to message matching, so a message-format drift across Spark versions
# cannot silently stop the retry (ADVICE r14). The substring fallback
# stays because two of the shapes arrive as raw JVM exceptions
# (Py4JJavaError cause chains) that carry no condition field.
_TRANSIENT_CONDITIONS = (
    "PATH_NOT_FOUND",
    "UNABLE_TO_INFER_SCHEMA",
    "FAILED_READ_FILE.FILE_NOT_EXIST",
)


def is_transient_swap_error(exc: BaseException) -> bool:
    """True iff ``exc`` is one of the torn-swap listing shapes —
    matched on the structured Spark error condition when the exception
    exposes one, else on the rendered message."""
    get_condition = getattr(exc, "getCondition", None) or getattr(
        exc, "getErrorClass", None
    )
    if get_condition is not None:
        try:
            condition = get_condition()
        except Exception:  # defensive: never let classification raise
            condition = None
        if condition and any(
            condition.startswith(c) for c in _TRANSIENT_CONDITIONS
        ):
            return True
    msg = str(exc)
    return any(marker in msg for marker in _TRANSIENT_MARKERS)


def with_swap_retry(
    build: Callable[[], T], recover: Callable[[], object]
) -> T:
    """``recover(); return build()`` with up to ``_ATTEMPTS`` tries.

    ``build`` must be idempotent (every index reader is — it re-derives
    its plan from the directory state as found). A non-transient build
    error propagates immediately; a transient one propagates only
    after the final attempt.

    ``recover`` may itself lose a race: its isdir probes and the
    heal rename are not atomic against a LIVE compactor's swap, so the
    ``.old`` dir it decided to restore can vanish (the compactor's
    rmtree) or the destination can re-appear (the compactor's second
    rename) between probe and rename — an OSError that means the
    WRITER is making progress, not that the index is broken. Those are
    swallowed and the attempt proceeds to ``build`` (which retries on
    its own transient shapes). The OTHER reason recover can raise — a
    crashed compact whose heal fails persistently (EACCES, read-only
    filesystem; no concurrent actor involved) — must not hide behind
    the build's generic path-not-found: when the FINAL error is a
    transient listing shape, the last recover failure is CHAINED onto
    it, so the traceback names the real blocker. A NON-transient build
    error (bad params, a genuine engine bug) re-raises bare — chaining
    a benign live-writer race OSError onto an unrelated ValueError
    would mislead debugging (ADVICE r14)."""
    recover_exc: OSError | None = None
    for attempt in range(_ATTEMPTS):
        try:
            recover()
            recover_exc = None
        except OSError as rexc:
            recover_exc = rexc  # racing a live writer, or a heal blocker
        try:
            return build()
        except Exception as exc:
            if not is_transient_swap_error(exc):
                raise  # unrelated failure — recover noise stays out
            if attempt == _ATTEMPTS - 1:
                if recover_exc is not None:
                    raise exc from recover_exc
                raise
            time.sleep(_BACKOFF_S * (attempt + 1))
    raise AssertionError("unreachable")  # pragma: no cover


def read_optional_dir(
    exists: Callable[[], bool], read: Callable[[], T]
) -> T | None:
    """The probe-then-read loop both tombstone-log readers share: None
    once the directory is CONFIRMED missing (never created, or a
    compact's strictly-last clear landed — either way the caller needs
    no mask), the read result when it resolves, bounded transient
    retries in between (a clear can land between the probe and the
    read — ADVICE r13). A non-transient read error propagates
    immediately; a transient one only after the final attempt with the
    dir still present."""
    last_exc: Exception | None = None
    for attempt in range(_ATTEMPTS):
        if not exists():
            return None
        try:
            return read()
        except Exception as exc:
            if not is_transient_swap_error(exc):
                raise
            last_exc = exc
            if attempt < _ATTEMPTS - 1:
                time.sleep(_BACKOFF_S * (attempt + 1))
    raise last_exc
