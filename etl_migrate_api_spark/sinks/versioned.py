"""Manifest-log versioned table — the transaction-log pattern Delta
Lake / Iceberg built the lakehouse on, reduced to its load-bearing
parts over plain parquet + POSIX renames:

- **Data files are immutable.** Every commit writes a fresh segment
  directory under ``data/``; nothing ever rewrites a published file.
  An *append* commit's manifest lists the parent's segments plus the
  new one — appending to a 100 TB table moves only the new bytes.
- **The manifest IS the commit.** A version exists iff
  ``_log/v<N>.json`` exists; it's published with hard-link-exclusive
  creation (``os.link`` fails EEXIST on a lost race), so commits are
  atomic and two concurrent writers serialize by retry — the loser
  REBASES (re-reads the winner's segment list) before trying N+1,
  which is exactly Delta's optimistic concurrency for blind appends.
- **Readers pin a version.** ``read(spark)`` resolves the latest
  manifest once; ``read(spark, version=k)`` is time travel. A reader
  never sees a half-commit: either the manifest file is there or it
  isn't.
- **Vacuum is two honest phases.** Expired manifests are deleted
  FIRST, then any segment no remaining manifest references; a crash
  between phases leaves only orphan segments, and re-running vacuum
  (or the next one) sweeps them. A crashed commit (segment written,
  manifest never published) leaves the same kind of orphan — one
  cleanup path heals both.

- **Zone maps ride the manifest.** Every commit records per-segment
  column min/max/null-count read from the parquet footers the write
  already produced (metadata-only, no extra scan — the stats Delta
  collects at write time). ``scan(filters)`` skips whole segments
  whose zone maps prove no match, then applies the full predicate on
  top, so pruning can never change results — only which files open.

Change-data-feed between versions reuses operators/diff.py::table_diff
(one co-partitioned full-outer join on the key, payload pre-hashed).
"""

from __future__ import annotations

import base64
import datetime as _dt
import time as _time
import decimal as _decimal
import json
import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

# Zone-map stats: string min/max longer than this are DROPPED rather
# than trusted — parquet writers may truncate binary statistics, and a
# truncated max is only a PREFIX of the true max (an unsound upper
# bound for pruning). Numeric/temporal stats are never truncated.
_STATS_MAX_STR = 16


def _norm_stat(v):
    """Normalize a parquet-footer statistic (or a filter value) to a
    ``(kind, json-serializable)`` pair whose within-kind ordering
    matches the column's ordering, or None if the value can't be used
    soundly. Temporal values become FIXED-WIDTH ISO strings (always
    with microseconds) so lexicographic compare == temporal compare."""
    if isinstance(v, bool):
        return ("num", int(v))
    if isinstance(v, int):
        return ("num", v)
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return ("num", v)
    if isinstance(v, _decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, str):
        return ("str", v) if len(v) <= _STATS_MAX_STR else None
    return None


def _cmp_pair(kind_a, a, kind_b, b):
    """Comparable (x, y) for two normalized values, or None if the
    kinds are incomparable (→ caller must keep the segment). num and
    dec cross-compare exactly through Decimal."""
    if kind_a == kind_b and kind_a != "dec":
        return (a, b)
    if {kind_a, kind_b} <= {"num", "dec"}:
        return (_decimal.Decimal(str(a)), _decimal.Decimal(str(b)))
    return None


def _excluded(colstat: dict | None, op: str, value) -> bool:
    """True iff the segment's [min, max] PROVES no row can satisfy
    ``col <op> value``. Any doubt (missing stats, incomparable kinds,
    unusable value) returns False — pruning is an optimization, never
    a correctness decision."""
    if colstat is None:
        return False
    if op == "in":
        return all(_excluded(colstat, "=", m) for m in value)
    if op == "between":
        a, b = value
        return _excluded(colstat, ">=", a) or _excluded(colstat, "<=", b)
    nv = _norm_stat(value)
    if nv is None:
        return False
    vkind, v = nv
    kind = colstat["kind"]
    lo_pair = _cmp_pair(kind, colstat["min"], vkind, v)
    hi_pair = _cmp_pair(kind, colstat["max"], vkind, v)
    if lo_pair is None or hi_pair is None:
        return False
    lo, v1 = lo_pair
    hi, v2 = hi_pair
    if op == "=":
        return v1 < lo or v2 > hi
    if op == "<":
        return lo >= v1
    if op == "<=":
        return lo > v1
    if op == ">":
        return hi <= v2
    if op == ">=":
        return hi < v2
    raise ValueError(f"unknown filter op {op!r}")


def _norm_filters(filters) -> list[tuple]:
    """Materialize a filter spec ONCE. ``in`` values may arrive as a
    generator; pruning probes them once per segment and the predicate
    once more, so an un-materialized iterator would be exhausted after
    the first segment — all(empty) == True would then mark every later
    segment excluded, silently dropping rows."""
    out = []
    for col, op, value in filters:
        if op == "in":
            value = list(value)
        elif op == "between":
            lo, hi = value  # unpacking materializes any iterable
            value = (lo, hi)
        out.append((col, op, value))
    return out


def _filters_predicate(filters):
    """The residual Column predicate for a filter spec — applied on
    top of the pruned scan so pruning can never change results."""
    from pyspark.sql import functions as F

    pred = F.lit(True)
    for col, op, value in filters:
        c = F.col(col)
        if op == "=":
            pred = pred & (c == F.lit(value))
        elif op == "<":
            pred = pred & (c < F.lit(value))
        elif op == "<=":
            pred = pred & (c <= F.lit(value))
        elif op == ">":
            pred = pred & (c > F.lit(value))
        elif op == ">=":
            pred = pred & (c >= F.lit(value))
        elif op == "in":
            pred = pred & c.isin(list(value))
        elif op == "between":
            pred = pred & (c >= F.lit(value[0])) & (c <= F.lit(value[1]))
        else:
            raise ValueError(f"unknown filter op {op!r}")
    return pred


def _segment_stats(seg_abs: str) -> dict:
    """Per-segment zone map read from the parquet FOOTERS the write
    already produced — metadata-only I/O (the same numbers Delta
    collects at write time), no data scan. A column keeps stats only
    if EVERY row group provided usable min/max; nested columns and
    over-long strings are dropped."""
    import pyarrow.parquet as pq

    rows = 0
    cols: dict[str, dict] = {}
    bad: set[str] = set()
    for fn in sorted(os.listdir(seg_abs)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(seg_abs, fn)).metadata
        rows += md.num_rows
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for ci in range(rg.num_columns):
                c = rg.column(ci)
                name = c.path_in_schema
                if "." in name or name in bad:
                    bad.add(name)
                    continue
                st = c.statistics
                if st is None or not st.has_min_max:
                    bad.add(name)
                    continue
                mn, mx = _norm_stat(st.min), _norm_stat(st.max)
                if mn is None or mx is None or mn[0] != mx[0]:
                    bad.add(name)
                    continue
                nulls = st.null_count if st.has_null_count else None
                cur = cols.get(name)
                if cur is None:
                    cols[name] = {
                        "kind": mn[0],
                        "min": mn[1],
                        "max": mx[1],
                        "nulls": nulls,
                    }
                else:
                    # within a column every row group shares one kind
                    lo = _cmp_pair(cur["kind"], cur["min"], mn[0], mn[1])
                    hi = _cmp_pair(cur["kind"], cur["max"], mx[0], mx[1])
                    if lo is None or hi is None:
                        bad.add(name)
                        continue
                    if lo[1] < lo[0]:
                        cur["min"] = mn[1]
                    if hi[1] > hi[0]:
                        cur["max"] = mx[1]
                    cur["nulls"] = (
                        None
                        if (nulls is None or cur["nulls"] is None)
                        else cur["nulls"] + nulls
                    )
    for name in bad:
        cols.pop(name, None)
    return {"rows": rows, "cols": cols}


class VersionedTable:
    # branch-ref lock older than this is treated as a crashed holder's
    # corpse and broken (the lock spans only a ref read-compare-write)
    LOCK_STALE_SEC = 10.0

    def __init__(self, path: str):
        self.path = path
        self._log = os.path.join(path, "_log")
        self._data = os.path.join(path, "data")

    # -- log ----------------------------------------------------------------

    def _vpath(self, v: int) -> str:
        return os.path.join(self._log, f"v{v:08d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self._log):
            return []
        return sorted(
            int(f[1:9])
            for f in os.listdir(self._log)
            if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def manifest(self, version: int) -> dict:
        with open(self._vpath(version)) as fh:
            return json.load(fh)

    # -- write --------------------------------------------------------------

    def last_batch_id(self) -> int | None:
        """Newest committed batch_id on the log, scanning back past
        commits (e.g. optimize) that carried none."""
        for v in reversed(self.versions()):
            b = self.manifest(v).get("batch_id")
            if b is not None:
                return int(b)
        return None

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        batch_id: int | None = None,
        allow_evolution: bool = False,
        expectations: list | None = None,
        _data_change: bool = True,
    ) -> int:
        """Write ``df`` as a new immutable segment and publish the next
        version. Returns the committed version number. ``mode``:
        'append' (manifest = parent segments + this one) or 'overwrite'
        (manifest = this segment only). Safe under concurrent
        committers (lost races rebase and retry).

        ``batch_id`` makes the commit IDEMPOTENT for streaming sinks:
        foreachBatch replays a batch after a crash with the SAME id, so
        a commit whose batch_id is ≤ the newest one already on the log
        is skipped (returns the current version, writes nothing) — the
        Delta txn-version contract. Ids must be monotone per table.

        Schema is part of the table contract: an append whose column
        names/types differ from the log's schema raises unless
        ``allow_evolution=True`` (readers always merge schemas, so
        evolved segments read back with NULLs for missing columns);
        an overwrite resets the schema.

        ``expectations`` (a list of operators/quality.py Checks) gates
        the commit the way Delta CHECK constraints do: the suite runs
        as ONE aggregate pass over the batch BEFORE any file is
        written, and any violation refuses the whole commit with the
        failing report in the error — a bad batch can never become a
        published version (re-drive it through a quarantine split
        upstream if partial landing is wanted)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        os.makedirs(self._log, exist_ok=True)
        if expectations:
            from etl_migrate_api_spark.operators.quality import run_checks

            failed = [
                (r["check"], r["violations"])
                for r in run_checks(df, expectations).collect()
                if not r["passed"]
            ]
            if failed:
                raise ValueError(
                    f"{self.path}: commit refused — expectations failed: "
                    + ", ".join(f"{c} ({v} violations)" for c, v in failed)
                )
        if batch_id is not None:
            last = self.last_batch_id()
            if last is not None and batch_id <= last:
                return self.latest_version()
        schema_json = df.schema.json()
        # drift = name/type drift; nullability is NOT part of the
        # contract (a parquet round-trip relaxes NOT NULL to nullable)
        canon = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        parent0 = self.latest_main_version()
        if mode == "append" and parent0:
            logged = self.manifest(parent0).get("schema")
            if logged and not allow_evolution:
                from pyspark.sql.types import StructType

                logged_canon = [
                    (f.name, f.dataType.simpleString())
                    for f in StructType.fromJson(json.loads(logged)).fields
                ]
                if logged_canon != canon:
                    raise ValueError(
                        f"{self.path}: append schema differs from the "
                        "table's (pass allow_evolution=True to evolve; "
                        "readers merge schemas)"
                    )
        seg = os.path.join(self._data, f"seg-{uuid.uuid4().hex}")
        df.write.mode("error").parquet(seg)
        seg_rel = os.path.relpath(seg, self.path)
        seg_stats = _segment_stats(seg)
        while True:
            # numbering is GLOBAL (max over main + branches), the
            # append base is the MAIN head — a main commit must never
            # absorb branch segments
            parent = self.latest_main_version()
            if mode == "append" and parent:
                pm = self.manifest(parent)
                base = pm["segments"]
                parent_stats = pm.get("stats", {})
            else:
                base, parent_stats = [], {}
            v = self.latest_version() + 1
            body = {
                "version": v,
                "parent": parent,
                "mode": mode,
                "data_change": _data_change,
                "schema": schema_json,
                "committed_at": _time.time(),
                "segments": base + [seg_rel],
                "stats": {
                    **{s: parent_stats[s] for s in base if s in parent_stats},
                    seg_rel: seg_stats,
                },
            }
            if batch_id is not None:
                body["batch_id"] = batch_id
            tmp = os.path.join(self._log, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                json.dump(body, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, self._vpath(v))  # EXCLUSIVE: loses race loudly
                os.unlink(tmp)
                return v
            except FileExistsError:
                os.unlink(tmp)  # rebase on the winner's segments, retry
                if batch_id is not None:
                    last = self.last_batch_id()
                    if last is not None and batch_id <= last:
                        return self.latest_version()  # rival was our replay

    def optimize(self, spark: SparkSession | None = None, n_files: int = 1) -> int:
        """Compact the current version into ``n_files`` files, published
        as an overwrite commit with ``data_change=False`` — history
        stays time-travelable, and streams/increments know no rows
        changed (the Delta OPTIMIZE contract: layout, not data).
        Returns the new version; vacuum afterwards reclaims the old
        small files once their manifests expire."""
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError("optimize() needs a live SparkSession")
        cur = self.read(spark).coalesce(n_files)
        return self.commit(cur, mode="overwrite", _data_change=False)

    # -- named refs: tags + branches (Iceberg-style) --------------------------
    #
    # A TAG is an immutable name → version pointer (release pinning:
    # "train-data-2024-06"). A BRANCH is a mutable head: commits made
    # with ``branch=`` advance the branch pointer only — ``main`` (the
    # plain numbered log) never sees them, and a branch can be
    # fast-forwarded into main explicitly. Refs are tiny JSON files
    # under _refs/, written with the same atomic replace as CURRENT
    # pointers; they reference versions, so vacuum must keep any
    # version a ref names (vacuum refuses otherwise).

    def _ref_path(self, name: str) -> str:
        return os.path.join(self.path, "_refs", f"{name}.json")

    def _write_ref(self, name: str, body: dict) -> None:
        os.makedirs(os.path.join(self.path, "_refs"), exist_ok=True)
        tmp = self._ref_path(name) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(body, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._ref_path(name))

    def refs(self) -> dict[str, dict]:
        d = os.path.join(self.path, "_refs")
        out: dict[str, dict] = {}
        for f in sorted(os.listdir(d)) if os.path.isdir(d) else []:
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out[f[:-5]] = json.load(fh)
        return out

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin ``name`` to a version (default: current MAIN head, like
        ``read`` — tagging unpublished branch data requires naming its
        version explicitly). Tags are immutable — re-tagging an
        existing name raises."""
        v = self.latest_main_version() if version is None else version
        if not os.path.exists(self._vpath(v)):
            raise FileNotFoundError(f"{self.path}: no version {v} to tag")
        if os.path.exists(self._ref_path(name)):
            raise ValueError(f"{self.path}: tag {name!r} already exists")
        self._write_ref(name, {"kind": "tag", "version": v})
        return v

    def read_ref(self, spark: SparkSession, name: str) -> DataFrame:
        ref = self.refs().get(name)
        if ref is None:
            raise FileNotFoundError(f"{self.path}: no ref {name!r}")
        return self.read(spark, ref["version"])

    def branch(self, name: str, from_version: int | None = None) -> int:
        """Create a branch headed at ``from_version`` (default:
        current main)."""
        v = (
            self.latest_main_version()
            if from_version is None
            else from_version
        )
        if os.path.exists(self._ref_path(name)):
            raise ValueError(f"{self.path}: ref {name!r} already exists")
        self._write_ref(name, {"kind": "branch", "version": v})
        return v

    def commit_to_branch(
        self, name: str, df: DataFrame, mode: str = "append"
    ) -> int:
        """Commit onto a branch: writes a NUMBERED version like any
        commit (so vacuum/time-travel see it) but advances ONLY the
        branch pointer — main's head is wherever a main commit last
        put it, and main readers (``read`` with no version) are
        unaffected because read() resolves through the branch-aware
        head, see ``latest_main_version``. The WAP (write-audit-
        publish) pattern: land on a branch, validate, then
        fast_forward into main."""
        if self.refs().get(name, {}).get("kind") != "branch":
            raise FileNotFoundError(f"{self.path}: no branch {name!r}")
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        # stage the commit as a child of the BRANCH head: reuse commit()
        # mechanics by temporarily reading the branch head's segments
        seg = os.path.join(self._data, f"seg-{uuid.uuid4().hex}")
        df.write.mode("error").parquet(seg)
        seg_rel = os.path.relpath(seg, self.path)
        seg_stats = _segment_stats(seg)
        while True:
            # (re)read the branch head INSIDE the loop: the manifest we
            # stage must chain off whatever the ref points at NOW
            ref = self.refs().get(name)
            if ref is None or ref["kind"] != "branch":
                raise FileNotFoundError(f"{self.path}: no branch {name!r}")
            base_v = ref["version"]
            parent = self.latest_version()
            bm = self.manifest(base_v)
            base = bm["segments"] if mode == "append" else []
            base_stats = bm.get("stats", {}) if mode == "append" else {}
            v = parent + 1
            body = {
                "version": v,
                "parent": base_v,
                "mode": mode,
                "data_change": True,
                "branch": name,
                "committed_at": _time.time(),
                "schema": df.schema.json(),
                "segments": base + [seg_rel],
                "stats": {
                    **{s: base_stats[s] for s in base if s in base_stats},
                    seg_rel: seg_stats,
                },
            }
            tmp = os.path.join(self._log, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                json.dump(body, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, self._vpath(v))
            except FileExistsError:
                os.unlink(tmp)
                continue  # numbered-version race lost — renumber
            os.unlink(tmp)
            # advance the ref iff it STILL points at base_v — a blind
            # overwrite here would silently drop a rival's commit from
            # the branch (last-write-wins), unlike main's rebase path.
            # CAS via a link-lock: hold the ref's lock across
            # read-compare-write so two committers serialize. The lock
            # file carries a per-attempt TOKEN so release is
            # owner-checked — a holder can never unlink a lock it no
            # longer owns (e.g. after a breaker intervened).
            lock = self._ref_path(name) + ".lock"
            token = uuid.uuid4().hex
            tmp_l = lock + f".tmp-{token[:8]}"
            with open(tmp_l, "w") as fh:
                fh.write(token)

            def _release() -> None:
                try:
                    with open(lock) as fh:
                        mine = fh.read() == token
                    if mine:
                        os.unlink(lock)
                except OSError:
                    pass  # already gone, or not ours to judge

            try:
                os.link(tmp_l, lock)
            except FileExistsError:
                os.unlink(tmp_l)
                os.unlink(self._vpath(v))  # rival holds the ref — rebase
                # stale-lock recovery: a committer that died between
                # os.link and the release would wedge the branch
                # forever. The lock is only ever held across a
                # read-compare-write of the ref (milliseconds), so one
                # older than LOCK_STALE_SEC is a corpse. Claim ONLY
                # when the live lock already stats stale — renaming a
                # fresh rival's lock away (even briefly, to judge it)
                # opens a window where the lock path is absent and a
                # THIRD committer's os.link succeeds, breaking mutual
                # exclusion with the live holder (and the holder's
                # release then hits OSError on the renamed-away path).
                # The claim itself is an atomic rename (of two breakers
                # exactly one wins), and the corpse's mtime is
                # RE-CHECKED post-claim: between our stat and our
                # rename a live holder may have released and
                # re-acquired at the same path (TOCTOU) — a
                # claimed-but-fresh corpse is restored via os.link
                # (fails loudly if a rival re-locked; the fresh
                # holder's owner-checked release keeps it from
                # unlinking the rival's lock).
                #
                # RESIDUAL WINDOW (accepted): if the stat says stale
                # but the holder releases AND a rival re-acquires in
                # the stat→rename gap, the fresh rival's lock is still
                # briefly renamed away, and a third committer's
                # os.link can succeed before the restore — two holders
                # for a few microseconds. Closing it fully needs a
                # holder-identity check (inode/content compared
                # post-claim) or fcntl range locks; with an
                # mtime-based breaker whose stale threshold is 1000×
                # the hold time, the triple coincidence (death-aged
                # lock + release + re-acquire inside one syscall gap)
                # is accepted and the post-claim re-check bounds the
                # damage to the restore path above.
                try:
                    if (
                        _time.time() - os.path.getmtime(lock)
                        > self.LOCK_STALE_SEC
                    ):
                        corpse = lock + f".stale-{uuid.uuid4().hex[:8]}"
                        os.rename(lock, corpse)
                        if (
                            _time.time() - os.path.getmtime(corpse)
                            > self.LOCK_STALE_SEC
                        ):
                            os.unlink(corpse)  # genuinely dead — broken
                        else:
                            try:
                                os.link(corpse, lock)  # live — restore
                            except FileExistsError:
                                pass  # rival re-locked; owner-checked
                                # release keeps double-frees impossible
                            os.unlink(corpse)
                except OSError:
                    pass  # holder released, or another breaker won
                _time.sleep(0.01)
                continue
            os.unlink(tmp_l)
            try:
                cur = self.refs().get(name)
                if cur is None or cur["kind"] != "branch":
                    os.unlink(self._vpath(v))
                    raise FileNotFoundError(
                        f"{self.path}: branch {name!r} deleted mid-commit"
                    )
                if cur["version"] != base_v:
                    # branch moved since we staged: our manifest's
                    # parent/base segments are stale — rebase and retry
                    os.unlink(self._vpath(v))
                    continue
                self._write_ref(name, {"kind": "branch", "version": v})
                return v
            finally:
                _release()

    def latest_main_version(self) -> int:
        """Newest version NOT belonging to a branch — what plain
        ``read`` should resolve to."""
        for v in reversed(self.versions()):
            if "branch" not in self.manifest(v):
                return v
        return 0

    def fast_forward(self, name: str) -> int:
        """Publish a branch head into main (the WAP publish step): a
        new main version whose manifest copies the branch head's
        segments/stats verbatim — no data moves."""
        ref = self.refs().get(name)
        if ref is None or ref["kind"] != "branch":
            raise FileNotFoundError(f"{self.path}: no branch {name!r}")
        bm = self.manifest(ref["version"])
        while True:
            parent = self.latest_version()
            v = parent + 1
            body = {
                "version": v,
                "parent": parent,
                "mode": "overwrite",
                "data_change": True,
                "schema": bm.get("schema"),
                "committed_at": _time.time(),
                "segments": bm["segments"],
                "stats": bm.get("stats", {}),
            }
            tmp = os.path.join(self._log, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                json.dump(body, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, self._vpath(v))
                os.unlink(tmp)
                return v
            except FileExistsError:
                os.unlink(tmp)

    def read_as_of(self, spark: SparkSession, ts: float) -> DataFrame:
        """Timestamp time travel: the newest MAIN version committed at
        or before unix-seconds ``ts`` (manifests carry committed_at —
        pre-feature manifests sort as 0, i.e. 'always before')."""
        best = 0
        for v in self.versions():
            m = self.manifest(v)
            if "branch" in m:
                continue
            if m.get("committed_at", 0.0) <= ts and v > best:
                best = v
        if best < 1:
            raise FileNotFoundError(
                f"{self.path}: no main version at or before {ts}"
            )
        return self.read(spark, best)

    def optimize_zorder(
        self,
        spark: SparkSession,
        a_col: str,
        b_col: str,
        n_segments: int = 8,
    ) -> int:
        """OPTIMIZE ... ZORDER BY (a, b): rewrite the current snapshot
        into ``n_segments`` segments cut along the Morton curve of the
        two columns (operators/layout.py), published as ONE
        ``data_change=False`` overwrite — history stays
        time-travelable and streams/increments know no rows changed,
        exactly like plain optimize(). The payoff composes with the
        manifest zone maps: after the rewrite every segment's stats
        carry a SMALL bounding box on BOTH columns, so ``scan`` prunes
        conjunctive range filters on either — multi-dimensional data
        skipping at manifest granularity, the Delta OPTIMIZE ZORDER
        contract.

        Plan shape: one broadcast min/max, one repartitionByRange on
        the Morton key + within-partition sort (tight row-group stats
        too), one write; the per-partition files then become one
        segment each by driver-side rename — no second data pass."""
        from etl_migrate_api_spark.operators.layout import (
            scale_to_bits_int,
            zorder_key,
        )
        from pyspark.sql import functions as F

        parent = self.latest_main_version()
        df = self.read(spark, parent)
        bounds = df.agg(
            F.min(a_col).alias("alo"), F.max(a_col).alias("ahi"),
            F.min(b_col).alias("blo"), F.max(b_col).alias("bhi"),
        )
        keyed = (
            df.crossJoin(F.broadcast(bounds))
            .withColumn(
                "_zkey",
                zorder_key(
                    scale_to_bits_int(
                        F.col(a_col), F.col("alo"), F.col("ahi")
                    ),
                    scale_to_bits_int(
                        F.col(b_col), F.col("blo"), F.col("bhi")
                    ),
                ),
            )
            .drop("alo", "ahi", "blo", "bhi")
        )
        tmp = os.path.join(self._data, f".zorder-tmp-{uuid.uuid4().hex}")
        (
            keyed.repartitionByRange(n_segments, "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey")
            .write.mode("error")
            .parquet(tmp)
        )
        seg_rels: list[str] = []
        stats: dict[str, dict] = {}
        for fn in sorted(os.listdir(tmp)):
            if not fn.endswith(".parquet"):
                continue
            seg = os.path.join(self._data, f"seg-{uuid.uuid4().hex}")
            os.makedirs(seg)
            os.rename(os.path.join(tmp, fn), os.path.join(seg, fn))
            rel = os.path.relpath(seg, self.path)
            seg_rels.append(rel)
            stats[rel] = _segment_stats(seg)
        shutil.rmtree(tmp, ignore_errors=True)
        nv = self.latest_version() + 1
        body = {
            "version": nv,
            "parent": parent,
            "mode": "overwrite",
            "data_change": False,
            "schema": self.manifest(parent).get("schema"),
            "committed_at": _time.time(),
            "segments": seg_rels,
            "stats": stats,
        }
        tmpf = os.path.join(self._log, f".tmp-{uuid.uuid4().hex}")
        with open(tmpf, "w") as fh:
            json.dump(body, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmpf, self._vpath(nv))
        except FileExistsError:
            raise RuntimeError(
                f"{self.path}: concurrent commit during zorder optimize"
                " — re-run against the new current version"
            ) from None
        finally:
            os.unlink(tmpf)
        return nv

    # -- read ---------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        # default resolves the MAIN head: commits made on a branch are
        # numbered versions (time-travelable explicitly) but invisible
        # to plain readers until fast_forward publishes them
        v = self.latest_main_version() if version is None else version
        if v < 1:
            raise FileNotFoundError(f"{self.path}: no committed version")
        segs = [
            os.path.join(self.path, s) for s in self.manifest(v)["segments"]
        ]
        # mergeSchema: evolved appends read back with NULLs for columns
        # a segment predates
        return spark.read.option("mergeSchema", "true").parquet(*segs)

    def pruned_segments(
        self, filters, version: int | None = None
    ) -> tuple[list[str], list[str]]:
        """Split the version's segments into ``(kept, skipped)`` under
        the AND of ``filters`` using the manifest's zone maps — the
        Delta/Iceberg data-skipping core. A filter is a tuple
        ``(col, op, value)`` with op ∈ {=, <, <=, >, >=, in, between}
        (in → iterable, between → (lo, hi), both inclusive). Segments
        without stats (pre-stats manifests, evolved columns, long
        strings) are always KEPT; empty segments are always skipped.

        Defaults to the MAIN head like ``read`` — staged branch
        commits stay invisible unless ``version`` names them
        explicitly (branch isolation must hold for pruned reads too).

        100 TB: this is a manifest-only decision — O(#segments) driver
        work, zero data I/O. A date-partitioned append stream gives
        naturally disjoint zone maps, so a time-range query opens only
        the matching fraction of the table's files."""
        v = self.latest_main_version() if version is None else version
        filters = _norm_filters(filters)
        m = self.manifest(v)
        stats = m.get("stats", {})
        kept: list[str] = []
        skipped: list[str] = []
        for s in m["segments"]:
            st = stats.get(s)
            if st is None:
                kept.append(s)
                continue
            if st.get("rows") == 0:
                skipped.append(s)
                continue
            cols = st.get("cols", {})
            if any(_excluded(cols.get(c), op, val) for c, op, val in filters):
                skipped.append(s)
            else:
                kept.append(s)
        return kept, skipped

    def scan(
        self, spark: SparkSession, filters, version: int | None = None
    ) -> DataFrame:
        """Stat-pruned read: open only the segments whose zone maps MAY
        satisfy ``filters`` (see pruned_segments), then apply the full
        predicate on top — pruning is transparent, results are always
        identical to ``read().where(...)``. The residual filter also
        reaches the parquet scans as ordinary pushed filters, so row
        groups inside kept segments prune a second time. Defaults to
        the MAIN head, matching ``read``."""
        from pyspark.sql import functions as F

        v = self.latest_main_version() if version is None else version
        filters = _norm_filters(filters)
        kept, _ = self.pruned_segments(filters, version=v)
        pred = _filters_predicate(filters)
        if not kept:
            return self.read(spark, v).where(F.lit(False))
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.path, s) for s in kept]
        )
        return df.where(pred)

    def segments_added(self, v_from: int, v_to: int) -> list[str] | None:
        """Relative segment paths of rows ADDED after ``v_from`` up to
        ``v_to`` — the INCREMENT — walked down the MAIN chain via each
        manifest's recorded parent pointer (branch commits carry their
        own numbering but never sit on this chain): an append
        contributes the segments it added over its parent; a
        ``data_change=False`` commit (optimize) contributes nothing —
        its rewritten segment holds no new rows; a data-changing
        overwrite makes the increment undefined → None (callers fall
        back to read() + diff()). v_from = 0 means 'from empty'."""
        out: list[str] = []
        v = v_to
        while v > v_from and v >= 1:
            m = self.manifest(v)
            if m.get("branch"):
                return None  # not a main-chain version
            p = m.get("parent", v - 1)
            if not m.get("data_change", True):
                v = p
                continue  # compaction: same rows, new layout
            initial = p == 0 and v_from == 0
            if m["mode"] != "append" and not initial:
                return None
            parent_segs = (
                set(self.manifest(p)["segments"]) if p >= 1 else set()
            )
            out = [
                s for s in m["segments"] if s not in parent_segs
            ] + out
            v = p
        return out

    def read_increment(
        self, spark: SparkSession, v_from: int, v_to: int
    ) -> DataFrame:
        """Rows added between two versions of an APPEND chain, read
        from ONLY the new segments — the input an incremental
        view-maintenance pass aggregates instead of rescanning the
        table (raises if the range contains an overwrite)."""
        segs = self.segments_added(v_from, v_to)
        if segs is None:
            raise ValueError(
                f"{self.path}: v{v_from}->v{v_to} contains an overwrite; "
                "increment undefined — use read() + diff()"
            )
        if not segs:
            return self.read(spark, v_to).limit(0)
        return spark.read.parquet(
            *[os.path.join(self.path, s) for s in segs]
        )

    def diff(
        self,
        spark: SparkSession,
        v_old: int,
        v_new: int,
        keys: list[str],
    ) -> DataFrame:
        """Row-level change feed between two versions:
        (keys…, change ∈ added|removed|changed)."""
        from etl_migrate_api_spark.operators.diff import table_diff

        return table_diff(
            self.read(spark, v_old), self.read(spark, v_new), keys
        )

    def delete_where(self, spark: SparkSession, predicate) -> int:
        """Row-level DELETE as copy-on-write at SEGMENT granularity:
        one pass finds which segments actually contain matching rows
        (``input_file_name`` per matching row — the file list is
        bounded by the table's file count, never its row count),
        untouched segments carry over into the new manifest verbatim,
        and only the affected ones are rewritten without their matching
        rows. This is the GDPR-delete shape: deleting one user from a
        100 TB table rewrites the few files that hold them, not the
        table. Published as a data-changing non-append commit (streams
        on the default contract stop — deletes are not representable in
        an append feed; increments return None).

        NULL predicate rows are KEPT (SQL DELETE semantics: only rows
        where the predicate is TRUE are removed). Time travel still
        sees the pre-delete version. Returns the new version number."""
        from pyspark.sql import functions as F

        v = self.latest_main_version()
        segs = self.manifest(v)["segments"]
        cur = self.read(spark, v)
        hit_files = [
            r[0]
            for r in cur.where(predicate)
            .select(F.input_file_name())
            .distinct()
            .collect()
        ]
        # map files -> their segment dir (file URIs contain the
        # segment's relpath exactly once — segment names are uuid4)
        affected = [
            s for s in segs if any(("/" + s + "/") in f for f in hit_files)
        ]
        if not affected:
            return v  # nothing matched: no new version, no rewrite
        keep = [s for s in segs if s not in affected]
        survivors = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.path, s) for s in affected]
        ).where(~F.coalesce(predicate, F.lit(False)))
        new_seg = os.path.join(self._data, f"seg-{uuid.uuid4().hex}")
        survivors.write.mode("error").parquet(new_seg)
        return self._publish_snapshot(v, keep, new_seg, "delete")

    def _publish_snapshot(
        self, parent: int, keep: list[str], new_seg: str, mode: str
    ) -> int:
        """Publish a copy-on-write commit (delete/merge) computed
        against snapshot ``parent``. UNLIKE append, these cannot
        rebase: the keep-list describes a snapshot, so a lost
        publication race is a genuine write conflict (Delta's
        ConcurrentAppendException). The orphaned rewritten segment is
        vacuum's problem, by design."""
        nv = self.latest_version() + 1
        pm = self.manifest(parent)
        parent_stats = pm.get("stats", {})
        new_rel = os.path.relpath(new_seg, self.path)
        body = {
            "version": nv,
            "parent": parent,
            "mode": mode,
            "data_change": True,
            "schema": pm.get("schema"),
            "committed_at": _time.time(),
            "segments": keep + [new_rel],
            "stats": {
                **{s: parent_stats[s] for s in keep if s in parent_stats},
                new_rel: _segment_stats(new_seg),
            },
        }
        tmp = os.path.join(self._log, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(body, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._vpath(nv))
        except FileExistsError:
            raise RuntimeError(
                f"{self.path}: concurrent commit during {mode} — "
                "re-run against the new current version"
            ) from None
        finally:
            os.unlink(tmp)
        return nv

    def merge_by_key(
        self, spark: SparkSession, updates: DataFrame, keys: list[str]
    ) -> int:
        """MERGE (upsert): rows in ``updates`` REPLACE current rows
        sharing their key; keys not yet in the table INSERT. The same
        copy-on-write shape as delete_where — one pass finds the
        segments holding matched keys (semi-join → input_file_name),
        untouched segments carry over verbatim, and ONE new segment
        holds the affected segments' unmatched survivors plus every
        update row. Delta's whenMatched-updateAll /
        whenNotMatched-insertAll, at segment granularity.

        Contract: ``updates`` must be key-unique (two update rows with
        one key would both land — dedup upstream, e.g. last-write-wins
        by a seq column); NULL keys never match (SQL join semantics)
        and insert as new rows. Returns the new version."""
        from pyspark.sql import functions as F

        v = self.latest_main_version()
        segs = self.manifest(v)["segments"]
        cur = self.read(spark, v)
        kdf = updates.select(*keys).distinct()
        # attach the file name BELOW the join: input_file_name() must
        # sit over a single file source, and the updates side may well
        # be parquet-backed too (Spark's MULTI_SOURCES_UNSUPPORTED rule)
        tagged = cur.select(
            *keys, F.input_file_name().alias("__src_file")
        )
        hit_files = [
            r[0]
            for r in tagged.join(F.broadcast(kdf), keys, "left_semi")
            .select("__src_file")
            .distinct()
            .collect()
        ]
        affected = [
            s for s in segs if any(("/" + s + "/") in f for f in hit_files)
        ]
        keep = [s for s in segs if s not in affected]
        if affected:
            survivors = (
                spark.read.option("mergeSchema", "true")
                .parquet(*[os.path.join(self.path, s) for s in affected])
                .join(F.broadcast(kdf), keys, "left_anti")
            )
            new_rows = survivors.unionByName(
                updates, allowMissingColumns=True
            )
        else:
            new_rows = updates
        new_seg = os.path.join(self._data, f"seg-{uuid.uuid4().hex}")
        new_rows.write.mode("error").parquet(new_seg)
        return self._publish_snapshot(v, keep, new_seg, "merge")

    # -- maintenance ----------------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> dict:
        """Drop manifests older than the newest ``keep_last`` versions,
        then delete every segment directory no surviving manifest
        references (this also sweeps orphans from crashed commits).
        Returns counts. Phase order is the crash contract: manifests
        first, so a kept version can never lose a referenced segment.

        ``keep_last`` counts MAIN-CHAIN versions, not global numbers:
        branch commits take global numbers above the main head, so a
        staged (unpublished) branch would otherwise crowd the current
        main head out of the keep window and make the published table
        unreadable. The main head is ALWAYS kept, as is the global
        head and every ref-pinned version. Branch manifests inside the
        kept window (newer than the oldest kept main version) survive
        too — counting keep_last on the main chain must not silently
        shorten a live branch's own time-travel history to just its
        ref-pinned head."""
        vs = self.versions()
        branch_of = {v: self.manifest(v).get("branch") for v in vs}
        main_vs = [v for v in vs if branch_of[v] is None]
        keep = set(main_vs[-keep_last:]) if keep_last > 0 else set(vs)
        # branch versions share the retention window: anything newer
        # than the oldest kept main version stays (an abandoned
        # branch's manifests age out as main advances past them)
        if vs:
            floor = min(keep) if keep else min(vs)
            keep |= {v for v in vs if branch_of[v] is not None and v >= floor}
        # the published head and the global head survive unconditionally
        keep |= {self.latest_main_version(), self.latest_version()} & set(vs)
        # refs (tags, branch heads) PIN their versions: a named release
        # must stay time-travelable until the ref itself is deleted
        keep |= {
            r["version"] for r in self.refs().values() if r["version"] in vs
        }
        dropped = 0
        for v in vs:
            if v not in keep:
                os.unlink(self._vpath(v))
                dropped += 1
        referenced = {
            os.path.normpath(os.path.join(self.path, s))
            for v in keep
            for s in self.manifest(v)["segments"]
        }
        swept = 0
        for d in os.listdir(self._data) if os.path.isdir(self._data) else []:
            full = os.path.normpath(os.path.join(self._data, d))
            if full not in referenced:
                shutil.rmtree(full, ignore_errors=True)
                swept += 1
        # bloom sidecars of swept segments are derived data — sweep any
        # whose segment no longer exists
        blooms = 0
        broot = os.path.join(self.path, "_index", "bloom")
        ref_names = {os.path.basename(r) for r in referenced}
        for d in os.listdir(broot) if os.path.isdir(broot) else []:
            if d not in ref_names:
                shutil.rmtree(os.path.join(broot, d), ignore_errors=True)
                blooms += 1
        return {
            "manifests_dropped": dropped,
            "segments_swept": swept,
            "blooms_swept": blooms,
        }

    # -- bloom point-lookup index ---------------------------------------------
    #
    # Zone maps prune RANGE-clustered layouts; a point lookup on a key
    # that every segment's [min, max] spans (hash-distributed ingest,
    # surrogate keys) prunes nothing. The bloom sidecar is the Delta
    # bloom-filter-index answer: one fixed-size bit array per (segment,
    # column), built from the segment's own rows, probed driver-side
    # per lookup value. False positives only cost an extra file open;
    # false negatives are impossible (the property the test pins).
    # Sidecars are DERIVED data: missing/crashed ones lose pruning,
    # never correctness, and vacuum sweeps them with their segment.

    _BLOOM_FPP = 0.01

    @staticmethod
    def _bloom_check_values(values) -> list:
        """Probe parity holds only where Python's str(v) equals Spark's
        cast(col as string): integers and strings. bool ('True' vs
        'true'), float ('1e+16' vs '1.0E16'), date/timestamp and
        decimal render differently on the two sides, which would turn
        bloom probes into false NEGATIVES — silently dropped rows.
        Reject anything outside the parity set."""
        values = list(values)
        for v in values:
            if isinstance(v, bool) or not isinstance(v, (int, str)):
                raise TypeError(
                    "bloom lookup supports int and string keys only "
                    f"(got {type(v).__name__}: {v!r}) — Python str() and "
                    "Spark CAST AS STRING disagree for other types"
                )
        return values

    def _bloom_path(self, seg_rel: str, col: str) -> str:
        return os.path.join(
            self.path, "_index", "bloom", os.path.basename(seg_rel),
            f"{col}.json",
        )

    @staticmethod
    def _bloom_geometry(n: int, fpp: float | None = None) -> tuple[int, int]:
        """(m bits, k probes) for n values at the given (or default)
        false-positive rate — m rounded up to a multiple of 64."""
        p = VersionedTable._BLOOM_FPP if fpp is None else fpp
        n = max(n, 1)
        m = int(math.ceil(-n * math.log(p) / (math.log(2) ** 2)))
        m = ((m + 63) // 64) * 64
        k = max(1, round(m / n * math.log(2)))
        return m, min(k, 15)

    @staticmethod
    def _bloom_positions_py(v, m: int, k: int) -> list[int]:
        """Driver-side probe positions — EXACTLY the executor formula:
        two 60-bit md5 ints (matching Spark's
        conv(substring(md5(concat(cast(col as string), salt)), 1, 15)))
        reduced to base + i·stride mod m. str(int) == Spark's bigint
        cast, so int and string keys probe identically on both sides."""
        import hashlib

        h1 = int(
            hashlib.md5(f"{v}:b1".encode()).hexdigest()[:15], 16
        )
        h2 = int(
            hashlib.md5(f"{v}:b2".encode()).hexdigest()[:15], 16
        )
        base = h1 % m
        stride = h2 % (m - 1) + 1  # never 0: all k probes distinct-ish
        return [(base + i * stride) % m for i in range(k)]

    def build_bloom(
        self,
        spark: SparkSession,
        col: str,
        version: int | None = None,
        fpp: float | None = None,
    ) -> int:
        """Build the ``col`` bloom sidecar for every segment of the
        version that lacks one. Returns how many were built. One scan
        PER NEW SEGMENT only (the incremental-ingest shape: existing
        segments are immutable, their blooms never change); bits are
        folded per partition in numpy and OR-merged on the driver
        (#partitions × m/8 bytes, never the key stream).

        Only integer and string columns are indexable — the driver-side
        probe re-derives Spark's ``cast(col as string)`` via Python
        ``str()``, which agrees for exactly those types (see
        ``_bloom_check_values``); other types raise here rather than
        produce silent false negatives at probe time."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        v = self.latest_main_version() if version is None else version
        m_obj = self.manifest(v)
        stats = m_obj.get("stats", {})
        built = 0
        for seg in m_obj["segments"]:
            out_path = self._bloom_path(seg, col)
            if os.path.exists(out_path):
                continue
            seg_abs = os.path.join(self.path, seg)
            df = spark.read.parquet(seg_abs)
            if col not in df.columns:
                continue
            dt = df.schema[col].dataType
            if not isinstance(
                dt,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                 T.StringType),
            ):
                raise TypeError(
                    f"bloom index on {col!r}: unsupported type "
                    f"{dt.simpleString()} (int/string only — probe-side "
                    "str() must match Spark's cast-to-string)"
                )
            n = stats.get(seg, {}).get("rows")
            if n is None:
                n = df.count()
            if n == 0:
                continue
            m, k = self._bloom_geometry(n, fpp)
            c = F.col(col).cast("string")
            h1 = F.conv(
                F.substring(F.md5(F.concat(c, F.lit(":b1"))), 1, 15), 16, 10
            ).cast("bigint")
            h2 = F.conv(
                F.substring(F.md5(F.concat(c, F.lit(":b2"))), 1, 15), 16, 10
            ).cast("bigint")
            base = h1 % F.lit(m)
            stride = h2 % F.lit(m - 1) + F.lit(1)
            pos = df.where(F.col(col).isNotNull()).select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(k - 1)),
                        lambda i: (base + i * stride) % m,
                    )
                ).alias("pos")
            )

            def fold(batches, _m=m):
                import numpy as np
                import pandas as pd

                bits = np.zeros(_m // 8, dtype=np.uint8)
                seen = False
                for pdf in batches:
                    a = pdf["pos"].to_numpy("int64")
                    if len(a):
                        seen = True
                        # unbuffered |= : duplicate byte indices all land
                        np.bitwise_or.at(
                            bits,
                            a >> 3,
                            (1 << (a & 7)).astype(np.uint8),
                        )
                if seen:
                    yield pd.DataFrame({"bits": [bits.tobytes()]})

            parts = pos.mapInPandas(fold, schema="bits binary").collect()
            merged = bytearray(m // 8)
            for r in parts:
                b = r["bits"]
                for i, byte in enumerate(b):
                    merged[i] |= byte
            body = {
                "col": col,
                "m": m,
                "k": k,
                "n": int(n),
                "bits": base64.b64encode(bytes(merged)).decode(),
            }
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            tmp = out_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                json.dump(body, fh)
            os.replace(tmp, out_path)
            built += 1
        return built

    def bloom_prune(
        self, col: str, values, version: int | None = None
    ) -> tuple[list[str], list[str]]:
        """(kept, skipped) for a point lookup ``col IN values``: a
        segment is skipped iff its bloom PROVES none of the values can
        be present. Segments without a sidecar are kept. Defaults to
        the MAIN head, matching ``read``. Values must be int/string
        (probe parity — see ``_bloom_check_values``)."""
        v = self.latest_main_version() if version is None else version
        values = self._bloom_check_values(values)
        kept: list[str] = []
        skipped: list[str] = []
        for seg in self.manifest(v)["segments"]:
            p = self._bloom_path(seg, col)
            if not os.path.exists(p):
                kept.append(seg)
                continue
            with open(p) as fh:
                body = json.load(fh)
            bits = base64.b64decode(body["bits"])
            m, k = body["m"], body["k"]

            def maybe_present(val) -> bool:
                return all(
                    bits[q >> 3] & (1 << (q & 7))
                    for q in self._bloom_positions_py(val, m, k)
                )

            if any(maybe_present(val) for val in values):
                kept.append(seg)
            else:
                skipped.append(seg)
        return kept, skipped

    def lookup(
        self,
        spark: SparkSession,
        col: str,
        values,
        version: int | None = None,
    ) -> DataFrame:
        """Point lookup ``col IN values`` with BOTH pruning layers:
        zone maps first (free, from the manifest), blooms second (one
        sidecar read per surviving segment), then the real predicate on
        whatever still opens — results always identical to a full scan
        + filter. Defaults to the MAIN head, matching ``read``."""
        from pyspark.sql import functions as F

        v = self.latest_main_version() if version is None else version
        values = self._bloom_check_values(values)
        zm_kept, _ = self.pruned_segments([(col, "in", values)], version=v)
        bl_kept, _ = self.bloom_prune(col, values, version=v)
        kept = [s for s in zm_kept if s in set(bl_kept)]
        if not kept:
            return self.read(spark, v).where(F.lit(False))
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.path, s) for s in kept]
        )
        return df.where(F.col(col).isin(values))
