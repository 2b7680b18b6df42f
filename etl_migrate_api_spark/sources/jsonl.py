"""JSONL (newline-delimited JSON) file source/sink — the interchange
format LLM training corpora actually arrive in (one JSON object per
line, usually gzip'd shards).

Contract choices, each a 100 TB lesson encoded as API shape:

- **Schema is REQUIRED.** ``spark.read.json`` without a schema runs a
  full inference pass — a second scan of the corpus before the first
  useful byte. At ingest scale the schema is part of the dataset
  contract, so the reader takes it explicitly and never infers.
- **Corrupt lines are DATA, not exceptions.** Real crawls contain
  truncated lines, BOMs, and half-written shards. The default mode
  (PERMISSIVE) lands every unparseable line in ``_corrupt_record`` so
  the pipeline can count/quarantine them; DROPMALFORMED and FAILFAST
  are pass-throughs for callers that want silence or a hard stop.
- **gzip is read-compatible but NOT splittable** — a 10 GB .jsonl.gz
  shard is one task no matter how many executors wait. The writer
  therefore shards explicitly (``n_shards``) so each output file is a
  unit of read parallelism; keep shards ≲256 MB compressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def _as_struct(schema: StructType | str) -> StructType:
    if isinstance(schema, StructType):
        return schema
    return StructType.fromDDL(schema)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = _CORRUPT,
) -> DataFrame:
    """Schema-pinned JSONL scan. In PERMISSIVE mode the returned frame
    carries ``corrupt_col``: NULL for clean rows, the raw line for
    unparseable ones (fields of a PARSEABLE line that merely violate
    the schema types also land there, per Spark's JSON semantics).
    Compression (.gz/.zst per file extension) is transparent.

    Caveat (Spark limitation): a query that references ONLY the corrupt
    column over raw files raises QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    ``df.cache()`` first (or select a data column alongside) when
    counting/quarantining corrupt lines."""
    struct = _as_struct(schema)
    if mode.upper() == "PERMISSIVE":
        if corrupt_col not in struct.fieldNames():
            # Spark only populates the corrupt column if the schema
            # declares it
            struct = StructType(
                list(struct.fields) + [StructField(corrupt_col, StringType())]
            )
    return (
        spark.read.schema(struct)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write ``df`` as JSONL shards. ``n_shards`` round-robins rows into
    exactly that many files (each file = one unit of downstream read
    parallelism — the knob that matters because gzip is unsplittable);
    None keeps the input partitioning. Overwrites ``path``."""
    out = df.repartition(n_shards) if n_shards else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
