"""The compact-swap listing race, retried IN CODE (VERDICT r13 item 2).

The r13 storm probes measured a liveness gap: a reader whose file
listing straddles a compact's two-rename directory swap fails
transiently (FileNotFoundException / PATH_NOT_FOUND / empty-path schema
inference) even though every read that completes is exact. r13 put
"retry on failure" in the reader docstrings; r14 moves it into
operators/_swap_retry.py and these tests pin it deterministically —
the r13 probe shape (delete → query → compact → query cycles) with a
one-shot transient failure injected into each read attempt, passing
WITHOUT any external retry by the caller.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.operators._swap_retry import (
    is_transient_swap_error,
    with_swap_retry,
)


def _transient() -> Exception:
    # the rendered shape of a torn-listing failure (java cause chain)
    return RuntimeError(
        "An error occurred while calling o1.parquet.\n"
        "Caused by: java.io.FileNotFoundException: File file:/x/part-0 "
        "does not exist"
    )


# ---------------------------------------------------------------------------
# the helper itself (no Spark needed)
# ---------------------------------------------------------------------------


def test_classifier_matches_real_spark_error_shapes():
    """The marker set must match the shapes PySpark 4 actually raises
    (probed live: AnalysisException [PATH_NOT_FOUND] for a vanished
    dir, [UNABLE_TO_INFER_SCHEMA] for a momentarily empty one,
    Py4JJavaError [FAILED_READ_FILE.FILE_NOT_EXIST] with a
    FileNotFoundException cause for a file swapped away after
    listing) — and must NOT match ordinary failures."""
    assert is_transient_swap_error(
        Exception("[PATH_NOT_FOUND] Path does not exist: file:/t/idx. "
                  "SQLSTATE: 42K03")
    )
    assert is_transient_swap_error(
        Exception("[UNABLE_TO_INFER_SCHEMA] Unable to infer schema for "
                  "Parquet. It must be specified manually. SQLSTATE: 42KD9")
    )
    assert is_transient_swap_error(
        Exception("[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error "
                  "while reading file file:/t/part-0. File does not exist.")
    )
    assert is_transient_swap_error(_transient())
    # Hadoop's RawLocalFileSystem mislabels a vanished-dir null listing
    # as AccessDenied (caught live by the 48-cycle storm probe)
    assert is_transient_swap_error(
        Exception("An error occurred while calling o8502.parquet.\n"
                  ": java.nio.file.AccessDeniedException: /t/idx/bucket=0: "
                  "Permission denied\n\tat org.apache.hadoop.fs.FileUtil"
                  ".list(FileUtil.java:1621)")
    )
    assert not is_transient_swap_error(ValueError("bad k: -1"))
    assert not is_transient_swap_error(
        Exception("[CANNOT_RESOLVE] column `doc_idd` does not exist")
    )


def test_with_swap_retry_recovers_then_succeeds():
    calls = {"build": 0, "recover": 0}

    def build():
        calls["build"] += 1
        if calls["build"] == 1:
            raise _transient()
        return "ok"

    def recover():
        calls["recover"] += 1

    assert with_swap_retry(build, recover) == "ok"
    # recover runs BEFORE every attempt (it is the heal hook), so a
    # crashed swap is restored even on the first try
    assert calls == {"build": 2, "recover": 2}


def test_with_swap_retry_propagates_non_transient_first_time():
    calls = {"build": 0}

    def build():
        calls["build"] += 1
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        with_swap_retry(build, lambda: None)
    assert calls["build"] == 1


def test_with_swap_retry_gives_up_after_bounded_attempts():
    calls = {"build": 0}

    def build():
        calls["build"] += 1
        raise _transient()

    with pytest.raises(RuntimeError):
        with_swap_retry(build, lambda: None)
    assert calls["build"] == 3  # _ATTEMPTS — bounded, not forever


# ---------------------------------------------------------------------------
# text index: the r13 probe shape, deterministic
# ---------------------------------------------------------------------------


def _bm25(spark, idx):
    rows = __import__(
        "etl_migrate_api_spark.operators.text_index", fromlist=["x"]
    ).bm25_from_index(spark, idx, ("hash", "join", "merge"), k=10).collect()
    return [tuple(r) for r in rows]


def test_bm25_read_survives_injected_swap_race_storm(
    spark, sf_small, tmp_path, monkeypatch
):
    """Delete → query → compact → query cycles with a ONE-SHOT
    transient failure injected into every read's first plan-build
    attempt — each read must answer (no external retry) and match a
    fresh rebuild of the same corpus state."""
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    TI.build_text_index(docs, idx)

    real_attempt = TI._bm25_from_index_attempt
    state = {"armed": False, "failures": 0}

    def flaky_attempt(*args, **kwargs):
        if state["armed"]:
            state["armed"] = False
            state["failures"] += 1
            raise _transient()
        return real_attempt(*args, **kwargs)

    monkeypatch.setattr(TI, "_bm25_from_index_attempt", flaky_attempt)

    live = docs
    for i, mod in enumerate((5, 7, 11)):
        dead = live.where(F.col("doc_id") % mod == 1).select("doc_id")
        TI.delete_from_text_index(dead, idx)
        live = live.where(F.col("doc_id") % mod != 1)
        TI._SIDECAR_MEMO.pop(idx, None)
        state["armed"] = True
        got_masked = _bm25(spark, idx)  # tombstone-masked read
        assert TI.compact_text_index(spark, idx) >= 0
        TI._SIDECAR_MEMO.pop(idx, None)
        state["armed"] = True
        got_folded = _bm25(spark, idx)  # post-compact read
        ref = str(tmp_path / f"ref{i}")
        TI.build_text_index(live, ref)
        want = _bm25(spark, ref)
        assert got_masked == want, f"cycle {i}: masked read diverged"
        assert got_folded == want, f"cycle {i}: folded read diverged"
    assert state["failures"] == 6  # every read really hit the injection


def test_tombstone_log_vanishing_between_probe_and_read_is_no_mask(
    spark, sf_small, tmp_path, monkeypatch
):
    """ADVICE r13: an rmtree landing between _read_tombstone_log's
    isdir probe and its spark.read is the compact's strictly-last
    step — the reader must treat the confirmed-missing log as the
    no-mask (compact finished) case, not surface a transient failure.
    Simulated deterministically with a one-shot lying isdir over a
    genuinely deleted log dir, so the REAL Spark PATH_NOT_FOUND is
    exercised."""
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    TI.build_text_index(docs, idx)
    TI.delete_from_text_index(
        docs.where(F.col("doc_id") % 4 == 1).select("doc_id"), idx
    )
    tpath = f"{idx}.tombstones"
    shutil.rmtree(tpath)  # the racing compact's clear already landed

    real_isdir = os.path.isdir
    lies = {"n": 0}

    def lying_isdir(p):
        if str(p) == tpath and lies["n"] == 0:
            lies["n"] += 1
            return True  # the probe that passed just before the rmtree
        return real_isdir(p)

    monkeypatch.setattr(os.path, "isdir", lying_isdir)
    assert TI._read_tombstone_log(spark, idx) is None
    assert lies["n"] == 1  # the lying probe was really consumed


# ---------------------------------------------------------------------------
# vector index family: same contract on all three persisted readers
# ---------------------------------------------------------------------------


def test_ivf_reader_survives_injected_swap_race(
    spark, sf_small, tmp_path, monkeypatch
):
    from etl_migrate_api_spark.operators import similarity as SIM

    emb = load(spark, "embeddings", sf_small)
    idx = str(tmp_path / "ivf")
    SIM.write_ivf_index(emb, idx, k=4, n_iter=1)
    queries = emb.where(F.col("vec_id") < 3)

    real_attempt = SIM._ivf_topk_from_index_attempt
    state = {"armed": True, "failures": 0}

    def flaky_attempt(*args, **kwargs):
        if state["armed"]:
            state["armed"] = False
            state["failures"] += 1
            raise _transient()
        return real_attempt(*args, **kwargs)

    monkeypatch.setattr(SIM, "_ivf_topk_from_index_attempt", flaky_attempt)
    got = SIM.ivf_topk_from_index(spark, idx, queries, k=3, nprobe=2)
    rows = {tuple(r) for r in got.collect()}
    assert state["failures"] == 1
    state["armed"] = False  # clean pass for the reference read
    want = {
        tuple(r)
        for r in SIM.ivf_topk_from_index(
            spark, idx, queries, k=3, nprobe=2
        ).collect()
    }
    assert rows == want and rows


def test_pq_and_ivfpq_readers_survive_injected_swap_race(
    spark, sf_small, tmp_path, monkeypatch
):
    from etl_migrate_api_spark.operators import similarity as SIM

    emb = load(spark, "embeddings", sf_small).where(F.col("vec_id") < 200)
    queries = emb.where(F.col("vec_id") < 2)

    pq = str(tmp_path / "pq")
    SIM.write_pq_index(emb, pq, m=8, ksub=4)
    real_pq = SIM._pq_topk_from_index_attempt
    seen = {"pq": 0, "ivfpq": 0}

    def flaky_pq(*args, **kwargs):
        if seen["pq"] == 0:
            seen["pq"] += 1
            raise _transient()
        return real_pq(*args, **kwargs)

    monkeypatch.setattr(SIM, "_pq_topk_from_index_attempt", flaky_pq)
    assert SIM.pq_topk_from_index(spark, pq, queries, k=3).count() > 0
    assert seen["pq"] == 1

    ivfpq = str(tmp_path / "ivfpq")
    SIM.write_ivfpq_index(emb, ivfpq, k=4, m=8, ksub=4, n_iter=1)
    real_ivfpq = SIM._ivfpq_topk_attempt

    def flaky_ivfpq(*args, **kwargs):
        if seen["ivfpq"] == 0:
            seen["ivfpq"] += 1
            raise _transient()
        return real_ivfpq(*args, **kwargs)

    monkeypatch.setattr(SIM, "_ivfpq_topk_attempt", flaky_ivfpq)
    assert SIM.ivfpq_topk(spark, ivfpq, queries, k=3, nprobe=2).count() > 0
    assert seen["ivfpq"] == 1


def test_ivf_tombstone_log_vanish_between_probe_and_read_is_no_mask(
    spark, sf_small, tmp_path, monkeypatch
):
    """The vector-index twin of the text-index ADVICE r13 fix: the
    delete-log read races compact_ivf_index's strictly-last rmtree."""
    from etl_migrate_api_spark.operators import similarity as SIM

    emb = load(spark, "embeddings", sf_small)
    idx = str(tmp_path / "ivf")
    SIM.write_ivf_index(emb, idx, k=4, n_iter=1)
    SIM.delete_from_ivf_index(emb.where(F.col("vec_id") < 5), idx)
    tpath = f"{idx}.tombstones"
    shutil.rmtree(tpath)

    real_isdir = os.path.isdir
    lies = {"n": 0}

    def lying_isdir(p):
        if str(p) == tpath and lies["n"] == 0:
            lies["n"] += 1
            return True
        return real_isdir(p)

    monkeypatch.setattr(os.path, "isdir", lying_isdir)
    assert SIM._read_tombstones(spark, idx) is None
    assert lies["n"] == 1


def test_with_swap_retry_tolerates_recover_losing_its_own_race():
    """recover's isdir/rename probes are not atomic against a LIVE
    compactor's swap: the .old dir it decided to restore can vanish
    (the writer's rmtree) between probe and rename. That OSError means
    the writer is making progress — the attempt must proceed to build,
    not crash the reader un-retried."""
    calls = {"build": 0, "recover": 0}

    def racing_recover():
        calls["recover"] += 1
        if calls["recover"] == 1:
            raise FileNotFoundError(
                "[Errno 2] No such file or directory: '/t/idx.old'"
            )

    def build():
        calls["build"] += 1
        return "ok"

    assert with_swap_retry(build, racing_recover) == "ok"
    assert calls == {"build": 1, "recover": 1}


def test_sidecar_state_restarts_when_log_vanishes_mid_read(
    spark, sf_small, tmp_path, monkeypatch
):
    """The _sidecar_state stats agg and log read are separate Spark
    jobs; a compact completing between them leaves pre-compact scalars
    paired with a vanished log. The old code crashed (AttributeError
    on None.select); the fix restarts the computation on the
    post-compact listings. Simulated with a one-shot None from the log
    reader — the restart's second pass must converge to exactly the
    unpatched state."""
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    TI.build_text_index(docs, idx)
    TI.delete_from_text_index(
        docs.where(F.col("doc_id") % 6 == 2).select("doc_id"), idx
    )
    TI._SIDECAR_MEMO.pop(idx, None)
    want = TI._sidecar_state(spark, idx)
    assert want[2]  # the delete really produced a dead-id mask

    real_log = TI._read_tombstone_log
    lies = {"n": 0}

    def vanishing_log(s, p):
        if lies["n"] == 0:
            lies["n"] += 1
            return None  # the compact's clear landed mid-call
        return real_log(s, p)

    monkeypatch.setattr(TI, "_read_tombstone_log", vanishing_log)
    TI._SIDECAR_MEMO.pop(idx, None)
    got = TI._sidecar_state(spark, idx)
    TI._SIDECAR_MEMO.pop(idx, None)
    assert lies["n"] == 1  # the vanish was really consumed
    assert got == want


def test_with_swap_retry_chains_persistent_recover_failure():
    """A crashed compact whose heal fails persistently (EACCES,
    read-only fs — no concurrent writer involved) must not hide
    behind the build's generic path-not-found: the last recover
    OSError is chained as the propagated error's __cause__."""
    heal_err = PermissionError("[Errno 13] Permission denied: '/t/idx.old'")

    def recover():
        raise heal_err

    def build():
        raise _transient()  # the unhealed index has no readable path

    with pytest.raises(RuntimeError) as exc_info:
        with_swap_retry(build, recover)
    assert exc_info.value.__cause__ is heal_err


def test_with_swap_retry_keeps_recover_noise_off_unrelated_errors():
    """ADVICE r14: a benign live-writer recover race (OSError) must NOT
    be chained as the 'cause' of an unrelated non-transient build
    error — a ValueError from bad params propagates bare, first time,
    so the traceback doesn't point debugging at the writer race."""
    calls = {"build": 0}

    def recover():
        raise OSError("[Errno 2] No such file or directory: '/t/idx.old'")

    def build():
        calls["build"] += 1
        raise ValueError("bad k: -1")

    with pytest.raises(ValueError) as exc_info:
        with_swap_retry(build, recover)
    assert calls["build"] == 1  # non-transient: no retries burned
    assert exc_info.value.__cause__ is None


def test_classifier_uses_structured_error_condition():
    """ADVICE r14: where PySpark exposes a structured error condition
    (getCondition() on Spark 4, getErrorClass() before it), classify
    on that — a message-format drift across Spark versions must not
    silently stop the retry. Non-transient conditions still refuse."""

    class _Captured(Exception):
        def __init__(self, condition):
            super().__init__("message with no recognizable marker text")
            self._condition = condition

        def getCondition(self):
            return self._condition

    assert is_transient_swap_error(_Captured("PATH_NOT_FOUND"))
    assert is_transient_swap_error(
        _Captured("FAILED_READ_FILE.FILE_NOT_EXIST")
    )
    assert not is_transient_swap_error(_Captured("CANNOT_RESOLVE"))
    assert not is_transient_swap_error(_Captured(None))

    class _Legacy(Exception):
        def getErrorClass(self):
            return "UNABLE_TO_INFER_SCHEMA"

    assert is_transient_swap_error(_Legacy("no marker text here"))

    class _Broken(Exception):
        def getCondition(self):  # classification must never raise
            raise RuntimeError("jvm gone")

    assert not is_transient_swap_error(_Broken("plain failure"))


def test_sidecar_state_restarts_when_log_vanishes_before_probe(
    spark, sf_small, tmp_path, monkeypatch
):
    """The SYMMETRIC interleaving of the mid-read vanish (second
    review pass on the r14 fix): a compact completing between the
    stats agg and the isdir probe leaves pre-compact scalars with the
    probe finding no log — breaking there would return them
    UNADJUSTED. The signature captured the tombstone listing before
    the stats read, so sig-non-None + probe-False proves the vanish;
    the fix restarts on the post-compact listings. Simulated with a
    one-shot lying isdir (False while the dir really exists) — the
    restart's second pass must converge to exactly the unpatched
    adjusted state."""
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    TI.build_text_index(docs, idx)
    TI.delete_from_text_index(
        docs.where(F.col("doc_id") % 6 == 2).select("doc_id"), idx
    )
    TI._SIDECAR_MEMO.pop(idx, None)
    want = TI._sidecar_state(spark, idx)
    assert want[2]  # the delete really produced a dead-id mask

    tpath = f"{idx}.tombstones"
    real_isdir = os.path.isdir
    lies = {"n": 0}

    def lying_isdir(p):
        if str(p) == tpath and lies["n"] == 0:
            lies["n"] += 1
            return False  # the probe that ran just after the "clear"
        return real_isdir(p)

    monkeypatch.setattr(os.path, "isdir", lying_isdir)
    TI._SIDECAR_MEMO.pop(idx, None)
    got = TI._sidecar_state(spark, idx)
    TI._SIDECAR_MEMO.pop(idx, None)
    assert lies["n"] == 1  # the vanish was really consumed
    assert got == want  # restarted and re-adjusted, not broken stale


def test_sidecar_state_settled_listing_check_catches_midread_mutation(
    spark, sf_small, tmp_path, monkeypatch
):
    """_sidecar_state spans several Spark jobs; rather than enumerate
    every mutation-between-jobs interleaving (e.g. a torn compact
    between the stats read and the epoch read pairs the old sum with
    the new marker), it accepts a value only when the sidecar listings
    are IDENTICAL before and after, restarting otherwise. Pinned with
    a real mid-read mutation: a stats delta row appended inside the
    epoch-read hook — the settled check must restart and converge to
    the post-mutation state."""
    from etl_migrate_api_spark.operators import text_index as TI

    docs = load(spark, "documents", sf_small)
    idx = str(tmp_path / "idx")
    TI.build_text_index(docs, idx)
    TI.delete_from_text_index(
        docs.where(F.col("doc_id") % 6 == 2).select("doc_id"), idx
    )

    real_epoch = TI._read_epoch
    fired = {"n": 0}

    def mutating_epoch(p):
        if fired["n"] == 0:
            fired["n"] += 1
            # an append's stats delta landing mid-read, AFTER this
            # pass's stats agg already ran
            spark.createDataFrame(
                [(3, 17)], "n_docs long, n_toks long"
            ).write.mode("append").parquet(f"{idx}.stats")
        return real_epoch(p)

    monkeypatch.setattr(TI, "_read_epoch", mutating_epoch)
    TI._SIDECAR_MEMO.pop(idx, None)
    got = TI._sidecar_state(spark, idx)
    monkeypatch.setattr(TI, "_read_epoch", real_epoch)
    TI._SIDECAR_MEMO.pop(idx, None)
    want = TI._sidecar_state(spark, idx)  # fresh, post-mutation
    TI._SIDECAR_MEMO.pop(idx, None)
    assert fired["n"] == 1  # the mutation really landed mid-read
    assert got == want  # restarted onto the settled state, no mix
