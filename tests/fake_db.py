"""Fake DB-API connection for upsert tests. Python workers run in
separate processes, so the call log goes through a file."""

from __future__ import annotations

import os
import tempfile

_LOG = os.path.join(tempfile.gettempdir(), "spark_graft_fake_db_log.txt")


def reset() -> None:
    if os.path.exists(_LOG):
        os.remove(_LOG)


def read_log() -> list[str]:
    with open(_LOG) as f:
        return [line.rstrip("\n") for line in f]


def _log(line: str) -> None:
    with open(_LOG, "a") as f:
        f.write(line + "\n")


class _Cursor:
    def execute(self, sql, params=None):
        _log(f"execute:{sql}")

    def executemany(self, sql, rows):
        rows = list(rows)
        _log(f"executemany:{sql}:{len(rows)}rows:{rows!r}")


class _Conn:
    def cursor(self):
        return _Cursor()

    def commit(self):
        _log("commit")

    def rollback(self):
        _log("rollback")

    def close(self):
        _log("close")


def connect() -> _Conn:
    return _Conn()
