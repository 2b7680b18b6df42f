"""sources/jsonl.py: the schema-pinned JSONL reader's corrupt-line
contract (PERMISSIVE / DROPMALFORMED / FAILFAST), write sharding, gzip
round-trip, and content fidelity for the bytes JSON escaping actually
has to work for (newlines, quotes, non-ASCII, nulls)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row

from etl_migrate_api_spark.sources.jsonl import read_jsonl, write_jsonl

_DDL = "doc_id bigint, text string"


def _plant(tmp_path, lines) -> str:
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_permissive_captures_corrupt_lines(spark, tmp_path):
    path = _plant(
        tmp_path,
        [
            '{"doc_id": 1, "text": "ok"}',
            '{"doc_id": 2, "text": "trunca',  # torn mid-write
            "not json at all",
            '{"doc_id": 3, "text": "fine"}',
        ],
    )
    df = read_jsonl(spark, path, _DDL).cache()
    rows = df.collect()
    ok = {r["doc_id"]: r for r in rows if r["_corrupt_record"] is None}
    assert ok[1]["text"] == "ok"
    assert ok[3]["text"] == "fine"
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 2
    # the raw line is preserved for quarantine
    assert any("trunca" in r["_corrupt_record"] for r in bad)
    df.unpersist()


def test_dropmalformed_and_failfast(spark, tmp_path):
    path = _plant(
        tmp_path,
        ['{"doc_id": 1, "text": "ok"}', "garbage"],
    )
    kept = read_jsonl(spark, path, _DDL, mode="DROPMALFORMED").collect()
    assert [r["doc_id"] for r in kept] == [1]
    with pytest.raises(Exception):
        read_jsonl(spark, path, _DDL, mode="FAILFAST").collect()


def test_roundtrip_preserves_hostile_content(spark, tmp_path):
    src = spark.createDataFrame(
        [
            Row(doc_id=1, text='line1\nline2\t"quoted" \\backslash'),
            Row(doc_id=2, text="héllo wörld — 中文 🙂"),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text=""),
        ]
    )
    path = str(tmp_path / "out")
    write_jsonl(src, path, n_shards=2, compression="gzip")
    back = read_jsonl(spark, path, _DDL).cache()
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = {r["doc_id"]: r["text"] for r in src.collect()}
    assert got == want
    # cache() first: Spark disallows querying ONLY the corrupt column
    # straight off raw files (documented in read_jsonl)
    assert back.where("_corrupt_record is not null").count() == 0
    back.unpersist()


def test_write_shards_exactly_n_files(spark, tmp_path):
    src = spark.range(1000).selectExpr(
        "id as doc_id", "cast(id as string) as text"
    )
    path = str(tmp_path / "sharded")
    write_jsonl(src, path, n_shards=4, compression="gzip")
    files = glob.glob(os.path.join(path, "part-*.json.gz"))
    assert len(files) == 4
    # every shard is non-trivial: round-robin repartition balances
    sizes = [os.path.getsize(f) for f in files]
    assert min(sizes) > 0.5 * max(sizes)
    assert read_jsonl(spark, path, _DDL).count() == 1000


def test_schema_string_and_struct_agree(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    path = _plant(tmp_path, ['{"doc_id": 7, "text": "x"}'])
    struct = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    a = read_jsonl(spark, path, _DDL).collect()
    b = read_jsonl(spark, path, struct).collect()
    assert a == b
