"""Structured-Streaming source over a ``sinks/versioned.py``
VersionedTable — the Delta-streaming-source shape: the TABLE VERSION is
the stream offset. Each micro-batch emits the segments a version added
over its parent, Spark's checkpoint stores the last processed version,
and a restart resumes from it — so a manifest-log table doubles as a
replayable feed for downstream streaming jobs (the "table as topic"
pattern).

Overwrite commits are where table-streaming semantics get honest:
an overwrite replaces rows, which an append-only stream cannot
represent. Default (``onOverwrite=fail``) stops the stream with an
explicit error — the Delta default. ``onOverwrite=emitNew`` streams the
overwrite's own segments as if appended (Delta's ignoreChanges: rows
from rewritten data are RE-emitted; downstream must be idempotent or
dedup on key).

Schema comes from the latest manifest's first segment footer
(pyarrow, metadata-only) — the reader never infers from data and never
runs a Spark job on the driver.
"""

from __future__ import annotations

import os
from typing import Iterator

from etl_migrate_api_spark.sinks.versioned import VersionedTable

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _ddl_type(arrow_type) -> str:
    s = str(arrow_type)
    if s in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[s]
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("decimal128(") or s.startswith("decimal("):
        return "decimal" + s[s.index("(") :]
    raise ValueError(
        f"versioned_table stream: unsupported column type {s!r} "
        "(extend _ARROW_TO_DDL or cast before commit)"
    )


def table_schema(table_path: str) -> tuple[str, list[str]]:
    """(DDL string, field-name order) from the newest manifest's first
    segment footer. Caveat: on a schema-EVOLVED append chain the first
    segment predates the new columns — the stream carries the original
    schema until an overwrite resets it (evolved columns are for batch
    readers, which merge schemas)."""
    import pyarrow.parquet as pq

    t = VersionedTable(table_path)
    v = t.latest_version()
    if v < 1:
        raise FileNotFoundError(f"{table_path}: no committed version")
    seg = os.path.join(table_path, t.manifest(v)["segments"][0])
    part = sorted(
        f for f in os.listdir(seg) if f.endswith(".parquet")
    )[0]
    sch = pq.read_schema(os.path.join(seg, part))
    ddl = ", ".join(f"{f.name} {_ddl_type(f.type)}" for f in sch)
    return ddl, [f.name for f in sch]


def _new_segments(t: VersionedTable, v: int) -> list[str]:
    m = t.manifest(v)
    p = m.get("parent", v - 1)  # branch versions interleave numbering
    parent = set(t.manifest(p)["segments"]) if p >= 1 else set()
    return [s for s in m["segments"] if s not in parent]


def _scan_versions(
    table_path: str, fields: list[str], v_from: int, v_to: int, on_overwrite: str
) -> Iterator[tuple]:
    """Driver-side row scan of versions (v_from, v_to] in commit order
    (pyarrow, no Spark job — the same pattern as the offset-log
    reader)."""
    import pyarrow.parquet as pq

    t = VersionedTable(table_path)
    for v in range(v_from + 1, v_to + 1):
        if t.manifest(v).get("branch"):
            continue  # branch commit: invisible until fast_forward
        if not t.manifest(v).get("data_change", True):
            continue  # optimize/compaction: same rows, new layout
        if v > 1 and t.manifest(v)["mode"] != "append":
            if on_overwrite == "fail":
                raise RuntimeError(
                    f"{table_path}: version {v} is an overwrite — a "
                    "version stream cannot represent replaced rows. "
                    "Restart from this version, or set "
                    "onOverwrite=emitNew to re-emit rewritten data "
                    "(downstream must dedup)."
                )
        for seg in _new_segments(t, v):
            seg_dir = os.path.join(table_path, seg)
            for f in sorted(os.listdir(seg_dir)):
                if not f.endswith(".parquet"):
                    continue
                tbl = pq.read_table(os.path.join(seg_dir, f), columns=fields)
                for row in tbl.to_pylist():
                    yield tuple(row[c] for c in fields)


try:  # pragma: no cover - import surface depends on the PySpark build
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class VersionedTableStreamReader(SimpleDataSourceStreamReader):
        """Version-as-offset: ``initialOffset`` = version 0 (the stream
        includes the initial load), ``read(start)`` plans up to
        maxVersionsPerBatch new versions and returns the end version,
        ``readBetweenOffsets`` replays a planned range after restart
        from Spark's checkpoint."""

        def __init__(self, options: dict):
            self.path = options["path"]
            self.on_overwrite = options.get("onoverwrite", "fail").lower()
            if self.on_overwrite not in ("fail", "emitnew"):
                raise ValueError(
                    f"onOverwrite must be fail|emitNew, got {self.on_overwrite!r}"
                )
            self.max_versions = int(options.get("maxversionsperbatch", "0"))
            _, self.fields = table_schema(self.path)

        def initialOffset(self) -> dict:
            return {"version": 0}

        def read(self, start: dict):
            sv = int(start["version"])
            latest = VersionedTable(self.path).latest_version()
            ev = (
                min(latest, sv + self.max_versions)
                if self.max_versions
                else latest
            )
            if ev <= sv:
                return [], {"version": sv}
            # a LIST (Spark's prefetch cache copies planned batches;
            # generators can't be pickled)
            rows = list(
                _scan_versions(
                    self.path, self.fields, sv, ev, self.on_overwrite
                )
            )
            return rows, {"version": ev}

        def readBetweenOffsets(self, start: dict, end: dict):
            return list(
                _scan_versions(
                    self.path,
                    self.fields,
                    int(start["version"]),
                    int(end["version"]),
                    self.on_overwrite,
                )
            )

    class VersionedTableDataSource(DataSource):
        """``spark.readStream.format("versioned_table")`` over a
        VersionedTable directory; register with
        ``spark.dataSource.register(VersionedTableDataSource)``."""

        @classmethod
        def name(cls) -> str:
            return "versioned_table"

        def schema(self) -> str:
            return table_schema(self.options["path"])[0]

        def simpleStreamReader(self, schema):
            return VersionedTableStreamReader(self.options)

except ImportError:  # pragma: no cover
    VersionedTableDataSource = None  # type: ignore[assignment]


def stream_to_table(
    stream_df,
    table: VersionedTable,
    checkpoint: str,
    mode: str = "append",
    available_now: bool = True,
):
    """Exactly-once landing of a stream into a VersionedTable: each
    micro-batch commits with its Spark-assigned ``batch_id``, so the
    at-least-once replay foreachBatch guarantees (a batch re-delivered
    after a crash between sink write and checkpoint ack) hits the
    table's idempotence guard and writes nothing — offsets live in
    Spark's checkpoint, batch identity lives in the manifest log, and
    the pair composes to exactly-once (the same split Delta's
    txnVersion/appId makes). Returns the started StreamingQuery."""

    def process(batch_df, batch_id: int) -> None:
        table.commit(batch_df, mode=mode, batch_id=batch_id)

    w = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
