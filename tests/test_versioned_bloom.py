"""Bloom point-lookup sidecars on the manifest-log table
(sinks/versioned.py): pruning on hash-distributed layouts where zone
maps cannot help, no-false-negative guarantee, incremental build, and
vacuum hygiene.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.sinks.versioned import VersionedTable


@pytest.fixture()
def hash_table(spark, tmp_path):
    """Five appends keyed by k % 5 — every segment spans the FULL key
    range [r, 9995+r], so zone maps keep everything and only blooms
    can prune a point lookup."""
    t = VersionedTable(str(tmp_path / "t"))
    for r in range(5):
        df = (
            spark.range(0, 2000)
            .select((F.col("id") * 5 + r).alias("k"))
            .withColumn("v", F.col("k") * 10)
        )
        t.commit(df, mode="append")
    assert t.build_bloom(spark, "k") == 5
    return t


def test_zone_maps_cannot_prune_this_layout(hash_table):
    kept, skipped = hash_table.pruned_segments([("k", "=", 4937)])
    assert skipped == [] and len(kept) == 5


def test_bloom_prunes_point_lookup(spark, hash_table):
    t = hash_table
    # key 4937 ≡ 2 (mod 5) → lives in exactly one segment
    kept, skipped = t.bloom_prune("k", [4937])
    assert len(kept) <= 2  # 1 true + ≤1 false positive at 1% fpp
    assert len(skipped) >= 3
    rows = t.lookup(spark, "k", [4937]).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(4937, 49370)]


def test_no_false_negatives_across_many_keys(spark, hash_table):
    """Bloom's one-sided guarantee: every planted key is found. Probes
    every 97th key across all residues."""
    t = hash_table
    keys = list(range(0, 10000, 97))
    got = sorted(r["k"] for r in t.lookup(spark, "k", keys).collect())
    assert got == sorted(keys)


def test_multi_value_lookup_keeps_union(hash_table):
    kept, skipped = hash_table.bloom_prune("k", [4937, 4938])  # residues 2,3
    assert len(skipped) >= 2  # residues 0,1,4 minus false positives


def test_absent_key_prunes_everything(spark, hash_table):
    t = hash_table
    kept, skipped = t.bloom_prune("k", [123457])  # > max, also bloom-absent
    # bloom alone usually skips all 5 (up to fpp); lookup() also has the
    # zone map layer, which proves emptiness here
    assert t.lookup(spark, "k", [123457]).count() == 0


def test_incremental_build_only_new_segments(spark, hash_table):
    t = hash_table
    t.commit(
        spark.range(0, 100).select(
            (F.col("id") + 50000).alias("k"), (F.col("id")).alias("v")
        ),
        mode="append",
    )
    assert t.build_bloom(spark, "k") == 1  # only the new segment
    assert t.build_bloom(spark, "k") == 0  # idempotent
    assert t.lookup(spark, "k", [50050]).count() == 1


def test_string_keys_probe_identically(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "s"))
    for batch in (["alpha", "beta"], ["gamma", "delta"]):
        t.commit(
            spark.createDataFrame([(w, len(w)) for w in batch], "name string, n long"),
            mode="append",
        )
    t.build_bloom(spark, "name")
    kept, skipped = t.bloom_prune("name", ["gamma"])
    assert len(skipped) >= 1
    rows = t.lookup(spark, "name", ["gamma"]).collect()
    assert [(r["name"], r["n"]) for r in rows] == [("gamma", 5)]


def test_missing_sidecar_is_only_a_pruning_loss(spark, hash_table):
    t = hash_table
    # delete one sidecar: its segment must be KEPT, results unchanged
    seg = t.manifest(t.latest_version())["segments"][0]
    os.unlink(t._bloom_path(seg, "k"))
    kept, _ = t.bloom_prune("k", [4937])
    assert seg in kept
    assert t.lookup(spark, "k", [4937]).count() == 1


def test_vacuum_sweeps_blooms_with_segments(spark, hash_table):
    t = hash_table
    t.commit(t.read(spark).limit(10), mode="overwrite")
    res = t.vacuum(keep_last=1)
    assert res["segments_swept"] == 5
    assert res["blooms_swept"] == 5
    broot = os.path.join(t.path, "_index", "bloom")
    assert not os.path.isdir(broot) or os.listdir(broot) == []


def test_null_keys_never_poison_the_bloom(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "n"))
    t.commit(
        spark.createDataFrame(
            [(1, "a"), (None, "b")], "k bigint, v string"
        ),
        mode="append",
    )
    t.build_bloom(spark, "k")
    assert t.lookup(spark, "k", [1]).count() == 1
    # NULL never matches an IN lookup (SQL semantics)
    assert t.lookup(spark, "k", [2]).count() == 0


# -- r9 ADVICE regressions --------------------------------------------------


def test_bloom_rejects_non_int_string_columns(spark, tmp_path):
    """Probe parity (Python str(v) == Spark cast-to-string) holds only
    for int/string keys; bool/float/date columns must raise at BUILD
    time instead of producing silent false negatives at probe time."""
    import datetime as dt

    t = VersionedTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(True, 1.0e16, dt.date(2024, 1, 1), 1)],
        "b boolean, f double, d date, k int",
    )
    t.commit(df, mode="overwrite")
    for col in ("b", "f", "d"):
        with pytest.raises(TypeError, match="int/string only"):
            t.build_bloom(spark, col)
    assert t.build_bloom(spark, "k") == 1  # int stays indexable


def test_bloom_probe_rejects_non_int_string_values(spark, hash_table):
    """lookup()/bloom_prune() validate probe values: bool renders as
    'True' in Python but 'true' in Spark — a probe would be a false
    negative, so it raises instead."""
    with pytest.raises(TypeError, match="int and string"):
        hash_table.bloom_prune("k", [True])
    with pytest.raises(TypeError, match="int and string"):
        hash_table.lookup(spark, "k", [1.5])
