"""Index maintenance gates: appending new vectors against FROZEN
quantizers must (a) keep the cell-partitioned layout (pruning intact),
(b) match a full rebuild's recall on the grown corpus while the data
stays in-distribution, and (c) be observable via the staleness metric
when it does not."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.functions.vectors import dot
from etl_migrate_api_spark.operators.similarity import (
    add_to_ivf_index,
    add_to_ivfpq_index,
    ivf_index_staleness,
    ivf_topk_from_index,
    ivfpq_topk,
    write_ivf_index,
    write_ivfpq_index,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, "embeddings", sf_dir)


@pytest.fixture(scope="module")
def split(emb):
    # base: 4/5 of the corpus trains + builds; growth: the final 1/5
    # arrives later as an in-distribution ingest batch
    base = emb.where(F.col("vec_id") % 5 != 0)
    growth = emb.where(F.col("vec_id") % 5 == 0)
    return base, growth


@pytest.fixture(scope="module")
def grown_index(spark, split, tmp_path_factory):
    base, growth = split
    path = str(tmp_path_factory.mktemp("ivfpq_grow") / "index")
    write_ivfpq_index(base, path, k=8, m=32, ksub=16)
    add_to_ivfpq_index(growth, path)
    return path


@pytest.fixture(scope="module")
def rebuilt_index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq_rebuild") / "index")
    write_ivfpq_index(emb, path, k=8, m=32, ksub=16)
    return path


def _truth_top5(emb, queries):
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    exact = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        .crossJoin(b)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dot(F.col("qv"), F.col("cv")).alias("ip"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ip").desc(), "neighbor_id")
    truth: dict[int, set[int]] = {}
    for r in (
        exact.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 5).collect()
    ):
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return truth


def _recall(spark, index, queries, emb, truth, nprobe=8):
    got = ivfpq_topk(
        spark, index, queries, k=5, nprobe=nprobe, rerank_corpus=emb, rerank=100
    ).collect()
    mine: dict[int, set[int]] = {}
    for r in got:
        mine.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(mine.get(q, set()) & truth[q]) for q in truth)
    return hits / sum(len(v) for v in truth.values())


def test_append_covers_all_ids_once(spark, emb, grown_index):
    codes = spark.read.parquet(grown_index)
    assert codes.count() == emb.count()
    assert codes.select("vid").distinct().count() == emb.count()


def test_append_keeps_cell_partitioned_layout(spark, grown_index):
    """New files must land inside cell=N dirs (no new top-level layout)
    and a probed query must stay partition-pruned after the append."""
    top = [
        d
        for d in os.listdir(grown_index)
        if not d.startswith("_") and not d.startswith(".")  # _SUCCESS (+crc)
    ]
    assert top and all(d.startswith("cell=") for d in top)
    queries = spark.read.parquet(grown_index).limit(0)  # schema only
    # pruning check on the scan the real query runs
    emb = spark.read.parquet(grown_index)
    df = spark.read.parquet(grown_index).where(F.col("cell").isin([0, 1]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_line and "cell" in scan_line[0].split("PartitionFilters")[1][:120]
    del queries, emb


def test_append_matches_rebuild_recall(spark, emb, split, grown_index, rebuilt_index):
    """The 100 TB maintenance claim: encoding the growth batch against
    the base's frozen quantizers loses no measurable recall vs
    retraining on the grown corpus — for in-distribution growth."""
    _, growth = split
    queries = emb.where(F.col("vec_id") < 10)
    truth = _truth_top5(emb, queries)
    r_append = _recall(spark, grown_index, queries, emb, truth)
    r_rebuild = _recall(spark, rebuilt_index, queries, emb, truth)
    assert r_append >= 0.9, f"append recall {r_append}"
    assert r_append >= r_rebuild - 0.05, (r_append, r_rebuild)
    # growth-batch vectors must be findable: query FROM the growth set
    gq = growth.where(F.col("vec_id") < 50)
    gt = _truth_top5(emb, gq)
    assert _recall(spark, grown_index, gq, emb, gt) >= 0.9


def test_append_deterministic(spark, split, tmp_path):
    """Two appends of the same batch to two copies of the same base
    index produce identical codes — rebuilds and replicas agree."""
    base, growth = split
    a = str(tmp_path / "ia")
    b = str(tmp_path / "ib")
    write_ivfpq_index(base, a, k=8, m=32, ksub=16)
    write_ivfpq_index(base, b, k=8, m=32, ksub=16)
    add_to_ivfpq_index(growth, a)
    add_to_ivfpq_index(growth, b)
    ra = sorted(
        (r["vid"], r["cell"], bytes(r["codes"]))
        for r in spark.read.parquet(a).collect()
    )
    rb = sorted(
        (r["vid"], r["cell"], bytes(r["codes"]))
        for r in spark.read.parquet(b).collect()
    )
    assert ra == rb


def test_ivf_append_and_query(spark, split, emb, tmp_path):
    """Same maintenance path on the plain IVF layout: appended vectors
    are immediately queryable through the pruned scan."""
    base, growth = split
    path = str(tmp_path / "ivf")
    write_ivf_index(base, path, k=8)
    add_to_ivf_index(growth, path)
    assert spark.read.parquet(path).count() == emb.count()
    gq = growth.where(F.col("vec_id") < 50)
    got = ivf_topk_from_index(spark, path, gq, k=5, nprobe=8).collect()
    by_q: dict[int, int] = {}
    for r in got:
        by_q[r["query_id"]] = by_q.get(r["query_id"], 0) + 1
    assert by_q and all(n == 5 for n in by_q.values())


def test_staleness_flags_out_of_distribution_growth(spark, split, tmp_path):
    """mean cosine distance to the assigned frozen centroid: small on
    the training slice, measurably larger on a drifted batch (dims
    reversed — same norms, different directions). This is the rebuild
    trigger the append docstring promises."""
    base, _ = split
    path = str(tmp_path / "stale")
    write_ivfpq_index(base, path, k=8, m=32, ksub=16)
    on_train = ivf_index_staleness(spark, path, base)
    drifted = base.select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    on_drift = ivf_index_staleness(spark, path, drifted)
    assert on_train["n_vectors"] == on_drift["n_vectors"]
    assert 0.0 <= on_train["mean_dist"] <= on_train["max_dist"]
    # the synthetic embeddings are high-dimensional and weakly
    # clustered, so the centroid fit is loose even on the training
    # slice — the signal is the consistent upward shift, not its size
    assert on_drift["mean_dist"] > on_train["mean_dist"] * 1.05, (
        on_train, on_drift,
    )


def test_delete_tombstones_and_compaction(spark, emb, tmp_path):
    """Log-structured deletes: tombstoned ids vanish from query results
    immediately (broadcast anti-join mask), results equal a filtered
    brute force over the surviving corpus, compaction physically
    removes exactly the tombstoned rows and clears the log, and
    post-compaction results are identical to pre-compaction."""
    from etl_migrate_api_spark.operators.similarity import (
        bruteforce_topk,
        compact_ivf_index,
        delete_from_ivf_index,
    )

    path = str(tmp_path / "ivf_del")
    write_ivf_index(emb, path, k=8)
    queries = emb.where(F.col("vec_id") < 5)
    before = ivf_topk_from_index(spark, path, queries, k=5, nprobe=8)
    # kill every current top-1 neighbor
    dead_ids = [
        r["neighbor_id"] for r in before.where(F.col("rank") == 1).collect()
    ]
    assert dead_ids
    delete_from_ivf_index(
        spark.createDataFrame([(i,) for i in dead_ids], "vec_id long"), path
    )
    after = ivf_topk_from_index(spark, path, queries, k=5, nprobe=8)
    got_ids = {r["neighbor_id"] for r in after.collect()}
    assert got_ids.isdisjoint(set(dead_ids))
    # nprobe=8 == k probes every cell -> must equal exact brute force
    # over the surviving corpus
    survivors = emb.where(~F.col("vec_id").isin(dead_ids))
    want = bruteforce_topk(survivors, queries, k=5)
    w = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in want.collect()}
    g = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in after.collect()}
    assert g == w
    # compaction: removes exactly the dead rows, clears the log,
    # changes no results
    n_corpus = emb.count()
    removed = compact_ivf_index(spark, path)
    assert removed == len(set(dead_ids))
    assert not os.path.isdir(f"{path}.tombstones")
    assert spark.read.parquet(path).count() == n_corpus - removed
    again = ivf_topk_from_index(spark, path, queries, k=5, nprobe=8)
    assert {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in again.collect()
    } == g
    # idempotent: compacting with no log is a 0-row no-op
    assert compact_ivf_index(spark, path) == 0


def test_compaction_crash_window_recovery_and_full_delete(spark, emb, tmp_path):
    """The two compaction edges the crash contract documents: (1) a
    crash between the swap's two renames (index at path.old, path
    missing) heals on the next compact entry — and the tombstone mask
    keeps queries correct before and after; (2) a fully-tombstoned
    index refuses to compact (0, log intact) instead of writing an
    unreadable empty parquet dir."""
    from etl_migrate_api_spark.operators.similarity import (
        compact_ivf_index,
        delete_from_ivf_index,
        recover_ivf_index,
    )

    path = str(tmp_path / "ivf_crash")
    write_ivf_index(emb.where(F.col("vec_id") < 50), path, k=4)
    delete_from_ivf_index(
        spark.createDataFrame([(1,), (2,)], "vec_id long"), path
    )
    # simulate the mid-swap crash
    os.rename(path, f"{path}.old")
    assert recover_ivf_index(path) is True
    assert recover_ivf_index(path) is False  # idempotent
    removed = compact_ivf_index(spark, path)
    assert removed == 2
    # (2) tombstone EVERYTHING that's left
    remaining = spark.read.parquet(path).select("vec_id")
    delete_from_ivf_index(remaining, path)
    assert compact_ivf_index(spark, path) == 0
    assert os.path.isdir(f"{path}.tombstones")  # log intact
    # masked query over a fully-deleted index returns no neighbors
    q = emb.where(F.col("vec_id") < 2)
    assert ivf_topk_from_index(spark, path, q, k=3, nprobe=4).count() == 0


def test_reader_self_heals_mid_swap_crash(spark, emb, tmp_path):
    """r11: a QUERY arriving after a compact crashed between its two
    renames (index at path.old, path missing) must answer correctly
    instead of throwing FileNotFound — ivf_topk_from_index now calls
    recover_ivf_index on entry, the same reader self-heal contract as
    bm25_from_index."""
    from etl_migrate_api_spark.operators.similarity import (
        delete_from_ivf_index,
    )

    path = str(tmp_path / "ivf_heal")
    write_ivf_index(emb.where(F.col("vec_id") < 50), path, k=4)
    q = emb.where(F.col("vec_id") < 2)
    expected = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk_from_index(spark, path, q, k=3, nprobe=4).collect()
    }
    delete_from_ivf_index(
        spark.createDataFrame([(30,), (31,)], "vec_id long"), path
    )
    masked = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk_from_index(spark, path, q, k=3, nprobe=4).collect()
    }
    os.rename(path, f"{path}.old")  # the mid-swap crash
    healed = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk_from_index(spark, path, q, k=3, nprobe=4).collect()
    }
    assert healed == masked
    assert os.path.isdir(path) and not os.path.isdir(f"{path}.old")
    assert expected  # sanity: non-empty result set


def test_pq_readers_self_heal_mid_swap_crash(spark, emb, tmp_path):
    """r12: compact_ivf_index runs on EVERY index layout (r11), so its
    mid-swap crash window (index at path.old) extends to PQ and IVF-PQ
    indexes — and their readers must self-heal too, not just the
    raw-vector ivf_topk_from_index. Before this, pq_topk_from_index and
    ivfpq_topk read ``path`` directly and threw FileNotFound after a
    crashed compact, contradicting the family-generic reader
    contract."""
    from etl_migrate_api_spark.operators.similarity import (
        pq_topk_from_index,
        write_ivfpq_index,
        write_pq_index,
    )

    base = emb.where(F.col("vec_id") < 120)
    queries = emb.where(F.col("vec_id") < 3)

    p1 = str(tmp_path / "pq_heal")
    write_pq_index(base, p1, m=32, ksub=16)
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq_topk_from_index(spark, p1, queries, k=5).collect()
    }
    assert want
    os.rename(p1, f"{p1}.old")  # the mid-swap crash
    healed = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq_topk_from_index(spark, p1, queries, k=5).collect()
    }
    assert healed == want
    assert os.path.isdir(p1) and not os.path.isdir(f"{p1}.old")

    p2 = str(tmp_path / "ivfpq_heal")
    write_ivfpq_index(base, p2, k=4, m=32, ksub=16)
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivfpq_topk(spark, p2, queries, k=5, nprobe=4).collect()
    }
    assert want
    os.rename(p2, f"{p2}.old")
    healed = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivfpq_topk(spark, p2, queries, k=5, nprobe=4).collect()
    }
    assert healed == want
    assert os.path.isdir(p2) and not os.path.isdir(f"{p2}.old")


def test_delete_masks_ivfpq_and_pq_indexes(spark, emb, tmp_path):
    """r11: the tombstone log is index-family-GENERIC. Deleting from an
    IVF-PQ or flat-PQ index must hide the ids from the from-index
    readers immediately (before this, the log was appended but those
    readers silently ignored it — deleted vectors kept surfacing), and
    compact_ivf_index must fold the log on either layout (vid id
    column; flat table without cell partitions)."""
    from etl_migrate_api_spark.operators.similarity import (
        compact_ivf_index,
        delete_from_ivf_index,
        ivfpq_topk,
        pq_topk_from_index,
        write_ivfpq_index,
        write_pq_index,
    )

    base = emb.where(F.col("vec_id") < 120)
    queries = emb.where(F.col("vec_id") < 3)

    p1 = str(tmp_path / "ivfpq")
    write_ivfpq_index(base, p1, k=4, m=32, ksub=16)
    before = ivfpq_topk(spark, p1, queries, k=5, nprobe=4)
    dead = [r["neighbor_id"] for r in before.where(F.col("rank") == 1).collect()]
    assert dead
    delete_from_ivf_index(
        spark.createDataFrame([(i,) for i in dead], "vec_id long"), p1
    )
    after = ivfpq_topk(spark, p1, queries, k=5, nprobe=4)
    res_after = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in after.collect()}
    assert set(res_after.values()).isdisjoint(set(dead))
    removed = compact_ivf_index(spark, p1)
    assert removed == len(set(dead))
    import os as _os
    assert not _os.path.isdir(f"{p1}.tombstones")
    again = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in ivfpq_topk(spark, p1, queries, k=5, nprobe=4).collect()}
    assert again == res_after  # compaction changes no results

    p2 = str(tmp_path / "pqflat")
    write_pq_index(base, p2, m=32, ksub=16)
    before2 = pq_topk_from_index(spark, p2, queries, k=5)
    dead2 = [r["neighbor_id"] for r in before2.where(F.col("rank") == 1).collect()]
    assert dead2
    delete_from_ivf_index(
        spark.createDataFrame([(i,) for i in set(dead2)], "vec_id long"), p2
    )
    after2 = pq_topk_from_index(spark, p2, queries, k=5)
    res2 = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in after2.collect()}
    assert set(res2.values()).isdisjoint(set(dead2))
    removed2 = compact_ivf_index(spark, p2)  # flat layout, vid column
    assert removed2 == len(set(dead2))
    again2 = {(r["query_id"], r["rank"]): r["neighbor_id"]
              for r in pq_topk_from_index(spark, p2, queries, k=5).collect()}
    assert again2 == res2
