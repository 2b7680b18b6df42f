"""Live reader-vs-compact storm probe for the persisted index families.

The r13 probes measured the liveness gap this repo's r14 closed in
code (operators/_swap_retry.py): readers whose file listing straddled
a compact's two-rename swap failed transiently in 7 of ~25 straddled
swaps. This probe re-runs that shape WITH the in-code retry: a writer
thread runs delete -> compact cycles while reader threads query
continuously, and the probe fails if ANY read surfaces an exception —
external retry is exactly what readers must no longer need.

Two failure classes are measured separately, because the in-code
retry can only own one of them:

- BUILD-time straddles (listing / schema inference / eager sidecar
  reads) — the r13 gap. The engine retries these internally; ANY one
  surfacing to the caller fails the probe.
- ACTION-time straddles: the caller's collect opens files listed at
  build, and a compact swapping them away in between raises
  FAILED_READ_FILE.FILE_NOT_EXIST. That window is outside any
  build-side wrapper by construction (the readers return lazy
  DataFrames; materializing inside them would destroy the distributed
  plan the 100 TB story depends on) and is the readers' documented
  execute-soon contract: rebuild and re-run. The probe applies
  exactly that contract — one rebuild per straddle — counts the
  occurrences, and fails if a rebuild doesn't converge or the error
  is not the transient shape.

It also checks the membership half of the concurrency contract on
every read: a doc whose delete COMMITTED before the read started must
never appear in that read's results (score-level anomalies at the
top-k margin are the documented append/compact non-snapshot behavior;
wrong MEMBERSHIP never is). After the storm quiesces, the final read
must equal a fresh rebuild of the surviving corpus bit-for-bit.

Not a pytest: thread interleavings are not deterministic, so this is
a measurement tool (tests/test_swap_retry.py carries the
deterministic pins). Run: python3 tools/probe_swap_storm.py [cycles]
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fresh_stats() -> dict:
    return {
        "reads": 0,
        "action_straddles": 0,  # transient at collect; healed by rebuild
        "surfaced_errors": [],  # build-time or non-transient: probe fails
        "membership_violations": 0,
        "compacts": 0,
        "compact_aborts": 0,
    }


def _read_per_contract(stats: dict, read):
    """Run one read (build + collect) exactly as a contract-following
    caller would: a TRANSIENT failure at action time (the compact swap
    landing between the build's listing and the collect's file opens)
    means rebuild-and-rerun, bounded; anything else — including any
    build-time straddle, which the engine's in-code retry must have
    absorbed — is recorded as a surfaced error and fails the probe."""
    from etl_migrate_api_spark.operators._swap_retry import (
        is_transient_swap_error,
    )

    for _ in range(12):
        try:
            return read()
        except Exception as exc:  # noqa: BLE001 — the probe's point
            if not is_transient_swap_error(exc):
                stats["surfaced_errors"].append(str(exc)[:300])
                return None
            stats["action_straddles"] += 1
    stats["surfaced_errors"].append("action straddle did not converge")
    return None


def probe_text_index(spark, sf_small: str, root: str, cycles: int) -> dict:
    from pyspark.sql import functions as F

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small).persist()
    idx = os.path.join(root, "storm-text")
    TI.build_text_index(docs, idx)

    committed_dead: set[int] = set()
    dead_lock = threading.Lock()
    stop = threading.Event()
    stats = _fresh_stats()

    def writer():
        try:
            for c in range(cycles):
                lo, hi = c * 5, c * 5 + 5
                batch = docs.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ).select("doc_id")
                ids = [int(r["doc_id"]) for r in batch.collect()]
                TI.delete_from_text_index(batch, idx)
                with dead_lock:
                    committed_dead.update(ids)
                try:
                    TI.compact_text_index(spark, idx)
                    stats["compacts"] += 1
                except OSError:
                    # a reader's recover restored .old mid-swap and the
                    # compactor lost its second rename — the documented
                    # crashed-compact shape: the log is uncleared,
                    # queries stay exact, the next cycle's compact
                    # entry heals and retries the fold
                    stats["compact_aborts"] += 1
                time.sleep(0.25)  # see the IVF writer's beat rationale
        finally:
            stop.set()

    def reader():
        while not stop.is_set():
            with dead_lock:
                must_be_gone = set(committed_dead)
            rows = _read_per_contract(
                stats,
                lambda: TI.bm25_from_index(
                    spark, idx, ("hash", "join", "merge"), k=100_000
                ).collect(),
            )
            if rows is None:
                continue
            stats["reads"] += 1
            got_ids = {r["doc_id"] for r in rows}
            if got_ids & must_be_gone:
                stats["membership_violations"] += 1

    w = threading.Thread(target=writer)
    readers = [threading.Thread(target=reader) for _ in range(2)]
    w.start()
    [r.start() for r in readers]
    w.join()
    [r.join() for r in readers]

    # quiesced: the final read must equal a fresh rebuild bit-for-bit
    with dead_lock:
        gone = list(committed_dead)
    survivors = docs.where(~F.col("doc_id").isin(gone))
    ref = os.path.join(root, "storm-text-ref")
    TI.build_text_index(survivors, ref)
    TI._SIDECAR_MEMO.pop(idx, None)
    q = lambda p: [  # noqa: E731
        tuple(r)
        for r in TI.bm25_from_index(
            spark, p, ("hash", "join", "merge"), k=100_000
        ).collect()
    ]
    stats["final_exact"] = q(idx) == q(ref)
    docs.unpersist()
    return stats


def probe_ivf_index(spark, sf_small: str, root: str, cycles: int) -> dict:
    from pyspark.sql import functions as F

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators import similarity as SIM

    emb = load(spark, "embeddings", sf_small).persist()
    idx = os.path.join(root, "storm-ivf")
    SIM.write_ivf_index(emb, idx, k=4, n_iter=1)
    queries = emb.where(F.col("vec_id") < 3).persist()
    queries.count()

    committed_dead: set[int] = set()
    dead_lock = threading.Lock()
    stop = threading.Event()
    stats = _fresh_stats()

    def writer():
        try:
            for c in range(cycles):
                lo, hi = 10 + c * 5, 10 + c * 5 + 5
                batch = emb.where(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ).select("vec_id")
                ids = [int(r["vec_id"]) for r in batch.collect()]
                SIM.delete_from_ivf_index(batch, idx)
                with dead_lock:
                    committed_dead.update(ids)
                try:
                    SIM.compact_ivf_index(spark, idx)
                    stats["compacts"] += 1
                except OSError:
                    stats["compact_aborts"] += 1
                # a beat between cycles: a zero-think-time full-rewrite
                # compact loop mutates faster than any read completes —
                # a density no deployment runs (compaction amortizes
                # the delete log, it is not a hot loop). The beat keeps
                # the storm adversarial (reads still straddle swaps
                # constantly) while letting convergence be measurable;
                # the IVF read is the slowest in the family, so its
                # writer gets the longer beat.
                time.sleep(0.5)
        finally:
            stop.set()

    def reader():
        while not stop.is_set():
            with dead_lock:
                must_be_gone = set(committed_dead)
            rows = _read_per_contract(
                stats,
                lambda: SIM.ivf_topk_from_index(
                    spark, idx, queries, k=5, nprobe=2
                ).collect(),
            )
            if rows is None:
                continue
            stats["reads"] += 1
            got = {int(r["neighbor_id"]) for r in rows}
            if got & must_be_gone:
                stats["membership_violations"] += 1

    w = threading.Thread(target=writer)
    readers = [threading.Thread(target=reader) for _ in range(2)]
    w.start()
    [r.start() for r in readers]
    w.join()
    [r.join() for r in readers]
    emb.unpersist()
    queries.unpersist()
    # no final_exact here, deliberately: an IVF index keeps its FROZEN
    # centroids, while a fresh rebuild re-trains on the survivors —
    # different cells, legitimately different nprobe-bounded top-k.
    # The per-read membership check above is the IVF exactness bound;
    # bit-exactness under deletes is pinned separately by the family's
    # pytest suite against same-centroid rebuilds.
    return stats


def main() -> None:
    import json
    import shutil
    import tempfile

    from etl_migrate_api_spark.session import get_spark

    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    sf_small = "/root/testdata/sf0.001"
    spark = get_spark(app_name="swap-storm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="swap-storm-")
    try:
        out = {
            "cycles": cycles,
            "text": probe_text_index(spark, sf_small, root, cycles),
            "ivf": probe_ivf_index(spark, sf_small, root, cycles),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    ok = all(
        not fam["surfaced_errors"]
        and fam["membership_violations"] == 0
        and fam["reads"] > 0
        for fam in (out["text"], out["ivf"])
    ) and out["text"]["final_exact"]
    out["pass"] = ok
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
