"""CLI facade — the operational surface of the reference, one
subcommand per route (reference ``src/routes/contactpoint.route.js`` +
``src/server.js``), so a user of the reference can trigger the same
jobs against this engine:

    python -m etl_migrate_api_spark run-etl       --base-dir DIR --input FILE   # GET /api/contactpoint/run-etl
    python -m etl_migrate_api_spark test-etl      --base-dir DIR --input FILE   # GET /api/contactpoint/test-etl (dry run, X6)
    python -m etl_migrate_api_spark refresh-state --base-dir DIR                # GET /api/contactpoint/refresh-redis (K8)
    python -m etl_migrate_api_spark migrate       --sf-dir DIR --out DIR        # GET /api/migrate (disabled by default, X7)
    python -m etl_migrate_api_spark query NAME    [--sf-dir DIR] [--limit N]    # any registered analytics query
    python -m etl_migrate_api_spark index build|add|staleness PATH --vectors T  # ANN index maintenance loop
    python -m etl_migrate_api_spark compact PATH                                # table maintenance (OPTIMIZE analogue)

``--input`` is a JSON/JSONL file of contact records ordered by ``id``;
it is paged through the same keyset contract the reference's upstream
HTTP API uses (``lastId``/``limit`` → next page WHERE id > lastId), so
the pipeline code path is identical to a live HTTP deployment — swap
the file fetch for ``fetch_http_page`` and nothing else changes.

Output is one JSON line per command (the reference returns JSON
responses with counters + step timings — X4 parity).
"""

from __future__ import annotations

import argparse
import json
import sys


BATCH_SCHEMA = "id bigint, hn_code string, firstname string, tel_no string"


def _load_records(path: str) -> list[dict]:
    """JSON array file or JSONL — records must carry an ``id`` key."""
    with open(path, encoding="utf-8") as f:
        head = f.read(1)
        f.seek(0)
        if head == "[":
            rows = json.load(f)
        else:
            rows = [json.loads(line) for line in f if line.strip()]
    return sorted(rows, key=lambda r: r["id"])


def make_file_fetch(path: str):
    """Keyset pager over a local records file — the same
    (lastId, limit] page contract as the reference's upstream API."""
    records = _load_records(path)

    def fetch(last_id: int, limit: int) -> dict:
        page = [r for r in records if r["id"] > last_id][:limit]
        return {"data": page, "count": len(page)}

    return fetch


def _get_spark():
    from etl_migrate_api_spark.session import get_spark

    return get_spark(app_name="etl-migrate-api-spark-cli")


def cmd_run_etl(args: argparse.Namespace, dry_run: bool = False) -> dict:
    from etl_migrate_api_spark.pipelines.contact_job import ContactEtlJob
    from etl_migrate_api_spark.sources.http_cursor import CursorSource

    spark = _get_spark()
    src = CursorSource(
        spark,
        make_file_fetch(args.input),
        schema=args.schema,
        limit=args.limit,
    )
    job = ContactEtlJob(spark, src, args.base_dir, dry_run=dry_run)
    res = job.run(last_id=args.last_id, max_batches=args.max_batches)
    return {
        "message": "All data synced",
        "dry_run": dry_run,
        "batches": res.batches,
        "record_count": res.record_count,
        "insert_count": res.insert_count,
        "update_count": res.update_count,
        "last_id": res.last_id,
        "step_durations": res.step_durations,
    }


def cmd_refresh_state(args: argparse.Namespace) -> dict:
    from etl_migrate_api_spark.pipelines.contact_job import ContactEtlJob
    from etl_migrate_api_spark.sources.http_cursor import CursorSource

    spark = _get_spark()
    # no source needed: rebuild reads the sink table (EP2 reads Postgres)
    src = CursorSource(
        spark, lambda last_id, limit: {"data": []}, schema=BATCH_SCHEMA
    )
    job = ContactEtlJob(spark, src, args.base_dir)
    n = job.rebuild_state()
    return {"message": "state rebuilt", "keys": n}


def cmd_migrate(args: argparse.Namespace) -> dict:
    # X7 parity: the reference short-circuits this route with
    # 400 {"message": "Disable Route"} (server.js:48-53)
    if not args.enable:
        return {"message": "Disable Route", "status": 400}
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    spark = _get_spark()
    df = QUERIES["po_projection_pipeline"].fn(spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = df.count()
    return {"message": "migrated", "rows": n, "out": args.out}


def cmd_query(args: argparse.Namespace) -> dict:
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    if args.name not in QUERIES:
        raise SystemExit(
            f"unknown query {args.name!r}; see COVERAGE.md for the registry"
        )
    spark = _get_spark()
    df = QUERIES[args.name].fn(spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        return {"query": args.name, "out": args.out}
    rows = df.limit(args.show).collect()
    return {
        "query": args.name,
        "columns": df.columns,
        "rows": [[r[c] for c in df.columns] for r in rows],
    }


def cmd_explain(args: argparse.Namespace) -> dict:
    """Physical-plan introspection for any registered query — the
    scale-audit surface (pushdown / broadcast / exchange placement)
    without leaving the CLI."""
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    if args.name not in QUERIES:
        raise SystemExit(
            f"unknown query {args.name!r}; see COVERAGE.md for the registry"
        )
    spark = _get_spark()
    df = QUERIES[args.name].fn(spark, args.sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            args.mode
        )
    )
    return {"query": args.name, "mode": args.mode, "plan": plan}


def cmd_profile(args: argparse.Namespace) -> dict:
    """Column profile of a testdata table or any parquet path — the
    pre-ingestion data-quality summary (operators/profile.py)."""
    from etl_migrate_api_spark.catalog import TABLES, load
    from etl_migrate_api_spark.operators.profile import profile_columns

    spark = _get_spark()
    if args.table in TABLES:
        df = load(spark, args.table, args.sf_dir)
    else:
        df = spark.read.parquet(args.table)
    rows = profile_columns(df, args.columns or None).collect()
    cols = ["column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"]
    return {
        "table": args.table,
        "profile": [[r[c] for c in cols] for r in rows],
        "columns": cols,
    }


def cmd_index(args: argparse.Namespace) -> dict:
    """ANN index maintenance surface: build a persisted IVF-PQ index,
    append new vectors against its frozen quantizers, or report the
    staleness (quantization-drift) metric — the operational loop for
    the 100 TB index story (operators/similarity.py)."""
    from etl_migrate_api_spark.catalog import TABLES, load
    from etl_migrate_api_spark.operators import similarity as sim

    spark = _get_spark()
    if args.vectors in TABLES:
        vecs = load(spark, args.vectors, args.sf_dir)
    else:
        vecs = spark.read.parquet(args.vectors)
    if args.action == "build":
        sim.write_ivfpq_index(
            vecs, args.path, k=args.cells, m=args.m, ksub=args.ksub
        )
        n = spark.read.parquet(args.path).count()
        return {"action": "build", "path": args.path, "codes": n}
    if args.action == "add":
        before = spark.read.parquet(args.path).count()
        sim.add_to_ivfpq_index(vecs, args.path)
        after = spark.read.parquet(args.path).count()
        return {
            "action": "add", "path": args.path,
            "added": after - before, "codes": after,
        }
    stale = sim.ivf_index_staleness(spark, args.path, vecs)
    return {"action": "staleness", "path": args.path, **stale}


def cmd_compact(args: argparse.Namespace) -> dict:
    """Table maintenance: rewrite an append-accumulated parquet table
    as one compacted copy (the plain-files analogue of OPTIMIZE —
    sinks/tables.py::ParquetTable.compact)."""
    from etl_migrate_api_spark.sinks.tables import ParquetTable

    spark = _get_spark()
    t = ParquetTable(spark, args.path)
    files_before = t.compact()
    return {"path": args.path, "files_before": files_before}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="etl_migrate_api_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_etl(name: str, help_: str) -> argparse.ArgumentParser:
        q = sub.add_parser(name, help=help_)
        q.add_argument("--base-dir", required=True, help="sink/state/log root")
        q.add_argument("--input", required=True, help="JSON/JSONL records file")
        q.add_argument("--schema", default=BATCH_SCHEMA)
        q.add_argument("--limit", type=int, default=1000)
        q.add_argument("--last-id", type=int, default=None)
        q.add_argument("--max-batches", type=int, default=None)
        return q

    add_etl("run-etl", "incremental contact ETL (EP1)")
    add_etl("test-etl", "dry run: full pipeline, no writes (X6)")

    r = sub.add_parser("refresh-state", help="rebuild state from sink (EP2/K8)")
    r.add_argument("--base-dir", required=True)

    m = sub.add_parser("migrate", help="PO migration flow (EP3; disabled)")
    m.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    m.add_argument("--out", default=None)
    m.add_argument("--enable", action="store_true",
                   help="the reference ships this route disabled")

    q = sub.add_parser("query", help="run a registered query by name")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None, help="write parquet instead of show")
    q.add_argument("--show", type=int, default=20)

    e = sub.add_parser("explain", help="physical plan of a registered query")
    e.add_argument("name")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    e.add_argument("--mode", default="formatted",
                   choices=["simple", "extended", "formatted", "cost", "codegen"])

    pr = sub.add_parser("profile", help="column profile of a table/parquet path")
    pr.add_argument("table", help="catalog table name or parquet path")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pr.add_argument("--columns", nargs="*", default=None)

    ix = sub.add_parser("index", help="ANN index maintenance (IVF-PQ)")
    ix.add_argument("action", choices=["build", "add", "staleness"])
    ix.add_argument("path", help="index root path")
    ix.add_argument("--vectors", default="embeddings",
                    help="catalog table or parquet path of (vec_id, embedding)")
    ix.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ix.add_argument("--cells", type=int, default=8)
    ix.add_argument("--m", type=int, default=32)
    ix.add_argument("--ksub", type=int, default=16)

    co = sub.add_parser("compact", help="compact an append-accumulated table")
    co.add_argument("path")
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    if args.cmd == "run-etl":
        out = cmd_run_etl(args)
    elif args.cmd == "test-etl":
        out = cmd_run_etl(args, dry_run=True)
    elif args.cmd == "refresh-state":
        out = cmd_refresh_state(args)
    elif args.cmd == "migrate":
        out = cmd_migrate(args)
    elif args.cmd == "explain":
        out = cmd_explain(args)
    elif args.cmd == "profile":
        out = cmd_profile(args)
    elif args.cmd == "index":
        out = cmd_index(args)
    elif args.cmd == "compact":
        out = cmd_compact(args)
    else:
        out = cmd_query(args)
    json.dump(out, sys.stdout, default=str)
    print()


if __name__ == "__main__":
    main()
