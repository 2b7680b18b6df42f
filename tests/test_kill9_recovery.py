"""End-to-end crash recovery under a REAL SIGKILL: a subprocess runs
the contact pipeline and kills itself (kill -9 — no cleanup, no JVM
shutdown hooks, no finally blocks) at two surgical points inside the
commit cycle; a clean re-run over the same directories must converge
to the clean-run answer exactly. This closes the gap left by the
simulated-state tests in test_pipeline.py: here the torn directory
layouts are produced by an actual dying process."""

from __future__ import annotations

import os
import signal
import subprocess
import sys

from etl_migrate_api_spark.pipelines.contact_job import ContactEtlJob
from etl_migrate_api_spark.sinks.tables import HashBucketedTable, ParquetTable
from etl_migrate_api_spark.sources.http_cursor import CursorSource

BATCH_SCHEMA = "id bigint, hn_code string, firstname string, tel_no string"

PAGES = [
    [
        {"id": 1, "hn_code": "N1", "firstname": "a", "tel_no": "11,22"},
        {"id": 2, "hn_code": "N2", "firstname": "b", "tel_no": "33"},
        {"id": 3, "hn_code": "N2", "firstname": "b2", "tel_no": "44; 33"},
        {"id": 4, "hn_code": "N3", "firstname": "c", "tel_no": ""},
    ],
    [
        {"id": 5, "hn_code": "N2", "firstname": "b3", "tel_no": "55/33"},
        {"id": 6, "hn_code": "N4", "firstname": "d", "tel_no": "66 , 66"},
    ],
]

_CHILD = """
import os, signal, sys
sys.path.insert(0, {repo!r})
workdir, mode = sys.argv[1], sys.argv[2]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]").appName("kill9-child")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import etl_migrate_api_spark.pipelines.contact_job as cj
import etl_migrate_api_spark.sinks.tables as tbl
from etl_migrate_api_spark.sources.http_cursor import CursorSource

PAGES = {pages!r}

def fetch(last_id, limit):
    for page in PAGES:
        if page and page[0]["id"] > last_id:
            return {{"data": page, "count": len(page)}}
    return {{"data": [], "count": 0}}

if mode == "after_sink_upsert":
    # die between the sink write and the state write / success row of
    # batch 1 — the crash window the orphan-run repair exists for
    real = cj.upsert_by_key
    seen = {{"n": 0}}
    def killing(table, batch, key):
        real(table, batch, key)
        seen["n"] += 1
        if seen["n"] == 1:
            os.kill(os.getpid(), signal.SIGKILL)
    cj.upsert_by_key = killing
elif mode == "mid_bucket_swap":
    # die INSIDE the state table's bucket swap: the old bucket has just
    # been renamed to .bucketold-* trash, the new one is not in place —
    # the exact window HashBucketedTable._recover repairs. Fires on
    # batch 2 (batch 1 creates the table via the replace() path).
    real_rename = tbl.os.rename
    def killing_rename(src, dst):
        real_rename(src, dst)
        if "state_phones.bucketold-" in dst:
            os.kill(os.getpid(), signal.SIGKILL)
    tbl.os.rename = killing_rename
else:
    raise SystemExit(f"unknown mode {{mode}}")

src = CursorSource(spark, fetch, schema={schema!r}, limit=4)
cj.ContactEtlJob(spark, src, workdir).run()
print("CHILD-COMPLETED")  # unreachable on a working kill hook
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
           pages=PAGES, schema=BATCH_SCHEMA)


def _make_fetch(pages):
    def fetch(last_id: int, limit: int):
        for page in pages:
            if page and page[0]["id"] > last_id:
                return {"data": page, "count": len(page)}
        return {"data": [], "count": 0}

    return fetch


def _run_clean(spark, workdir) -> None:
    src = CursorSource(spark, _make_fetch(PAGES), schema=BATCH_SCHEMA, limit=4)
    ContactEtlJob(spark, src, str(workdir)).run()


def _table_rows(spark, path, bucketed=True):
    t = (
        HashBucketedTable(spark, str(path), key="hn_code", n_buckets=16)
        if bucketed
        else ParquetTable(spark, str(path))
    )
    rows = t.read().collect()
    out = []
    for r in rows:
        d = r.asDict()
        out.append(
            tuple(
                (k, tuple(v) if isinstance(v, list) else v)
                for k, v in sorted(d.items())
            )
        )
    return sorted(out)


def _crash_then_rerun(spark, tmp_path, mode):
    crash_dir = tmp_path / f"crash_{mode}"
    ref_dir = tmp_path / f"ref_{mode}"
    os.makedirs(crash_dir)

    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, str(crash_dir), mode],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # child + its JVM share a process group
    )
    out, _ = proc.communicate(timeout=300)
    # reap the orphaned JVM the SIGKILL'd python driver leaves behind
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    assert proc.returncode == -signal.SIGKILL, (proc.returncode, out)
    assert "CHILD-COMPLETED" not in out, "kill hook never fired"

    # the re-run (same dirs) and the never-crashed reference
    _run_clean(spark, crash_dir)
    _run_clean(spark, ref_dir)

    assert _table_rows(spark, crash_dir / "etl_customer_crm") == _table_rows(
        spark, ref_dir / "etl_customer_crm"
    )
    assert _table_rows(spark, crash_dir / "state_phones") == _table_rows(
        spark, ref_dir / "state_phones"
    )
    # watermarks agree too (the log row COUNT legitimately differs:
    # the crashed attempt leaves its orphan 'running' row behind)
    def wm(d):
        src = CursorSource(spark, _make_fetch([]), schema=BATCH_SCHEMA)
        return ContactEtlJob(spark, src, str(d)).last_successful_id()

    assert wm(crash_dir) == wm(ref_dir)


def test_kill9_between_sink_and_state_write(spark, tmp_path):
    _crash_then_rerun(spark, tmp_path, "after_sink_upsert")


def test_kill9_mid_state_bucket_swap(spark, tmp_path):
    _crash_then_rerun(spark, tmp_path, "mid_bucket_swap")


# ---------------------------------------------------------------------------
# Offset-log (Kafka-shaped source) EOS under SIGKILL
# ---------------------------------------------------------------------------

_OL_CHILD = """
import os, signal, sys
sys.path.insert(0, {repo!r})
topic_dir, sink_dir, mode = sys.argv[1], sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]").appName("kill9-offsetlog")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import etl_migrate_api_spark.streaming.offset_log as ol

if mode == "before_current_swap":
    # die AFTER the new (state, offsets) version dir is fully published
    # but BEFORE the CURRENT pointer moves (fires on the FIRST commit:
    # v-0 exists on disk, CURRENT never written): the batch looks done,
    # but is not committed — the rerun must replay it in full and must
    # NOT double-count (the stale v-dir is cleared and redone)
    def killing_swap(self, name):
        os.kill(os.getpid(), signal.SIGKILL)
    ol.TransactionalStateSink._swap_current = killing_swap
elif mode == "mid_version_write":
    # die while the version's state parquet is still a .tmp dir —
    # nothing was published; the rerun replays the batch
    real_rename = ol.os.rename
    def killing_rename(src, dst):
        if dst.endswith("v-1"):
            os.kill(os.getpid(), signal.SIGKILL)
        real_rename(src, dst)
    ol.os.rename = killing_rename
else:
    raise SystemExit(f"unknown mode {{mode}}")

# before_current_swap kills batch 0's pointer swap (v-0 published,
# never current); mid_version_write lets batch 0 commit and kills
# batch 1's dir publish (v-1 still a .tmp) — max 2 records/partition
# forces the multi-batch schedule
ol.offset_log_fold_loop(
    spark, topic_dir, sink_dir, max_records_per_partition=2
)
print("CHILD-COMPLETED")  # unreachable on a working kill hook
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ol_crash_then_rerun(spark, tmp_path, mode):
    import datetime

    from etl_migrate_api_spark.streaming.offset_log import (
        OffsetLogTopic,
        offset_log_fold_loop,
    )

    topic_dir = str(tmp_path / "topic")
    crash_sink = str(tmp_path / f"sink_{mode}")
    ref_sink = str(tmp_path / f"ref_{mode}")
    topic = OffsetLogTopic(spark, topic_dir, n_partitions=2)
    ts = datetime.datetime(2024, 1, 1)
    keys = ["a"] * 4 + ["b"] * 3 + ["c"] * 2 + ["d"]
    topic.append(
        spark.createDataFrame(
            [(k, f"v{i}", ts) for i, k in enumerate(keys)],
            "key string, value string, ts timestamp",
        )
    )

    proc = subprocess.Popen(
        [sys.executable, "-c", _OL_CHILD, topic_dir, crash_sink, mode],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    out, _ = proc.communicate(timeout=300)
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    assert proc.returncode == -signal.SIGKILL, (proc.returncode, out)
    assert "CHILD-COMPLETED" not in out, "kill hook never fired"

    # clean rerun over the torn sink + a never-crashed reference run
    got = {
        r["key"]: r["n"]
        for r in offset_log_fold_loop(
            spark, topic_dir, crash_sink, max_records_per_partition=2
        ).collect()
    }
    want = {
        r["key"]: r["n"]
        for r in offset_log_fold_loop(spark, topic_dir, ref_sink).collect()
    }
    assert got == want == {"a": 4, "b": 3, "c": 2, "d": 1}, (got, want)
    # offsets recorded with the state equal the topic end — fully caught up
    from etl_migrate_api_spark.streaming.offset_log import (
        TransactionalStateSink,
    )

    _, offsets, _ = TransactionalStateSink(spark, crash_sink).read()
    assert offsets == topic.end_offsets()


def test_kill9_offset_log_before_current_swap(spark, tmp_path):
    _ol_crash_then_rerun(spark, tmp_path, "before_current_swap")


def test_kill9_offset_log_mid_version_write(spark, tmp_path):
    _ol_crash_then_rerun(spark, tmp_path, "mid_version_write")
