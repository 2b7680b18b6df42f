"""Spark 4 Python DataSource for keyset-paginated HTTP APIs — the
executor-parallel evolution of sources/http_cursor.py (SURVEY.md §2 S1
'at scale a custom Python DataSource (spark.dataSource.register)').

Usage::

    spark.dataSource.register(HttpCursorDataSource)
    df = (spark.read.format("http_cursor")
          .option("base_url", "http://host/api/contactpoint")
          .option("max_id", "70000")       # upper keyset bound
          .option("page_size", "1000")
          .option("slices", "32")          # read parallelism
          .schema("id bigint, hn_code string, tel_no string")
          .load())

Partition planning: the [0, max_id] keyset range is split into
``slices`` contiguous id ranges; each executor task pages through its
own range with ``lastId``/``limit`` requests (the same keyset contract
the reference's fetchContact uses, but issued from many executors at
once instead of one driver loop). Endpoints must support lastId+limit —
exactly the reference's API shape (fetchContact.js:5-11).

The upstream envelope is ``{"data": [...], "count": n}``; rows beyond
the partition's upper bound are discarded (the next partition reads
them), which keeps results exactly-once without upstream coordination.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


@dataclass
class _IdRange(InputPartition):
    start: int  # exclusive (lastId semantics)
    end: int  # inclusive


class HttpCursorReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.base_url = options.get("base_url")
        if not self.base_url:
            raise ValueError("http_cursor: option 'base_url' is required")
        self.max_id = int(options.get("max_id", "0"))
        self.page_size = int(options.get("page_size", "1000"))
        self.slices = max(1, int(options.get("slices", "8")))

    def partitions(self) -> list[InputPartition]:
        if self.max_id <= 0:
            return [_IdRange(0, 2**62)]  # single unbounded scan
        step = -(-self.max_id // self.slices)  # ceil division
        return [
            _IdRange(lo, min(lo + step, self.max_id))
            for lo in range(0, self.max_id, step)
        ]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        # executor-side import: the reader object is pickled to tasks
        import json as _json

        from etl_migrate_api_spark.sources.retry import get_json
        from pyspark.sql.types import StringType

        fields = [f.name for f in self.schema_.fields]
        str_fields = {f.name for f in self.schema_.fields if isinstance(f.dataType, StringType)}

        def _coerce(name: str, v):
            # string-typed fields accept anything upstream sends: nested
            # objects/arrays and type-wobbling scalars are JSON-stringified
            # (the inference fallback and explicit-string schemas both rely
            # on this; downstream re-parses with from_json when needed)
            if v is None or name not in str_fields or isinstance(v, str):
                return v
            return _json.dumps(v, separators=(",", ":"))
        cursor = partition.start
        while cursor < partition.end:
            # transient 5xx/connection failures retry with backoff
            # (retry.py); a persistent failure raises and Spark's task
            # retry re-reads this id range idempotently
            payload = get_json(
                f"{self.base_url}?lastId={cursor}&limit={self.page_size}",
                timeout=30,
            )
            rows = payload.get("data") or []
            if not rows:
                return
            # no ordering assumption on the page: filter (not return) on
            # the partition's bounds — an id-descending page would
            # otherwise discard its in-range tail. Lower bound is the
            # CURSOR, not partition.start: a misbehaving server that
            # overlaps or repeats pages must not re-emit rows already
            # yielded (exactly-once within the partition).
            for r in rows:
                if cursor < r["id"] <= partition.end:
                    yield tuple(_coerce(f, r.get(f)) for f in fields)
            # advance by the page's MAX id, not rows[-1]: an unsorted
            # page would otherwise re-fetch rows forever; and if the
            # server fails to advance the cursor, stop rather than loop
            new_cursor = max(r["id"] for r in rows)
            if new_cursor <= cursor:
                return
            cursor = new_cursor


def _infer_field_type(values: list) -> str:
    """Spark SQL type for one JSON field from its sampled non-null values
    — the same widening ladder ``spark.read.json`` uses: bool → bigint →
    double, anything mixed/nested falls back to string (upstream can then
    be parsed explicitly with from_json once the shape is known)."""
    non_null = [v for v in values if v is not None]
    if not non_null:
        return "string"  # null-only sample: string loses nothing
    types = {type(v) for v in non_null}
    if types == {bool}:
        return "boolean"
    if types <= {int}:
        return "bigint"
    if types <= {int, float}:
        return "double"
    if types == {str}:
        return "string"
    return "string"  # mixed / nested (dict, list): stringified downstream


class HttpCursorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "http_cursor"

    def schema(self) -> str:
        """Explicit schema is the contract (upstream JSON is dynamically
        typed — SURVEY.md §1: schema implicit on ingest); opt in to
        sampled inference with ``.option("infer_schema", "true")``:
        fetches ONE page from the driver (bounded by ``page_size``) and
        infers a flat schema spark.read.json-style. Inference is a
        driver-side convenience for exploration — production jobs pin
        the schema so an upstream type wobble fails loudly at read time
        instead of silently re-typing a column."""
        if str(self.options.get("infer_schema", "")).lower() not in ("true", "1"):
            raise NotImplementedError(
                "http_cursor: pass an explicit .schema(...) — upstream JSON is "
                "dynamically typed (SURVEY.md §1: schema implicit on ingest); "
                "or opt in to sampling with .option('infer_schema', 'true')"
            )
        from etl_migrate_api_spark.sources.retry import get_json

        base_url = self.options.get("base_url")
        if not base_url:
            raise ValueError("http_cursor: option 'base_url' is required")
        limit = int(self.options.get("page_size", "1000"))
        payload = get_json(f"{base_url}?lastId=0&limit={limit}", timeout=30)
        rows = payload.get("data") or []
        if not rows:
            raise ValueError(
                "http_cursor: cannot infer schema from an empty first page — "
                "pass an explicit .schema(...)"
            )
        # first-seen key order across the whole sample: rows may be
        # heterogeneous (a key absent early must still make the schema)
        cols: dict[str, list] = {}
        for r in rows:
            for k in r:
                cols.setdefault(k, [])
        for r in rows:
            for k, vals in cols.items():
                vals.append(r.get(k))
        # backticks inside a key must be doubled or the DDL parser
        # mis-parses the quoted identifier (same escape profile.py uses)
        def _q(k: str) -> str:
            return "`" + k.replace("`", "``") + "`"

        return ", ".join(f"{_q(k)} {_infer_field_type(v)}" for k, v in cols.items())

    def reader(self, schema: StructType) -> DataSourceReader:
        return HttpCursorReader(schema, self.options)
