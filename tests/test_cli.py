"""CLI facade tests — the reference's route surface as subcommands
(run-etl / test-etl / refresh-state / migrate / query), one JSON line
out, mirroring the JSON responses + counters the reference returns."""

from __future__ import annotations

import json

import pytest

from etl_migrate_api_spark.__main__ import main, make_file_fetch

RECORDS = [
    {"id": 1, "hn_code": "N1", "firstname": "a", "tel_no": "11,22"},
    {"id": 2, "hn_code": "N2", "firstname": "b", "tel_no": "33"},
    {"id": 3, "hn_code": "N2", "firstname": "b2", "tel_no": "44; 33"},
    {"id": 4, "hn_code": "N3", "firstname": "c", "tel_no": ""},
    {"id": 5, "hn_code": "N4", "firstname": "d", "tel_no": "55"},
]


@pytest.fixture()
def records_file(tmp_path):
    p = tmp_path / "contacts.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in RECORDS))
    return str(p)


def _run(capsys, argv):
    main(argv)
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_file_fetch_keyset_contract(records_file):
    fetch = make_file_fetch(records_file)
    page = fetch(0, 3)
    assert [r["id"] for r in page["data"]] == [1, 2, 3] and page["count"] == 3
    page = fetch(3, 3)
    assert [r["id"] for r in page["data"]] == [4, 5]
    assert fetch(5, 3)["data"] == []  # exhausted → F4 empty-page stop
    # JSON-array files page identically
    import json as _json

    arr = records_file + ".array.json"
    with open(arr, "w") as f:
        _json.dump(RECORDS[::-1], f)  # unsorted on disk — loader sorts
    assert [r["id"] for r in make_file_fetch(arr)(0, 99)["data"]] == [1, 2, 3, 4, 5]


def test_cli_run_etl_then_refresh_and_dry_run(spark, tmp_path, records_file, capsys):
    base = str(tmp_path / "base")
    out = _run(capsys, ["run-etl", "--base-dir", base, "--input", records_file,
                        "--limit", "3"])
    assert out["batches"] == 2  # 5 records at limit 3 → two keyset pages
    assert out["record_count"] == 5
    assert out["insert_count"] == 4 and out["update_count"] == 1  # N2 repeats
    assert out["last_id"] == 5 and out["step_durations"]

    # incremental: nothing new → zero batches, watermark unchanged
    again = _run(capsys, ["run-etl", "--base-dir", base, "--input", records_file])
    assert again["batches"] == 0 and again["last_id"] == 5

    # dry-run replay from cursor 0 touches nothing (X6)
    dry = _run(capsys, ["test-etl", "--base-dir", base, "--input", records_file,
                        "--last-id", "0"])
    assert dry["dry_run"] and dry["record_count"] == 5
    assert dry["insert_count"] == 0 and dry["update_count"] == 5  # all known

    rebuilt = _run(capsys, ["refresh-state", "--base-dir", base])
    assert rebuilt["keys"] == 4  # N1 N2 N3 N4


def test_cli_migrate_disabled_by_default(capsys):
    out = _run(capsys, ["migrate"])
    assert out == {"message": "Disable Route", "status": 400}  # X7 parity


def test_cli_query_unknown_name_errors(capsys):
    with pytest.raises(SystemExit):
        main(["query", "no_such_query"])


def test_cli_explain_outputs_plan(spark, capsys):
    from etl_migrate_api_spark.__main__ import main

    main(["explain", "q6_forecast_revenue", "--mode", "simple"])
    out = json.loads(capsys.readouterr().out)
    assert out["query"] == "q6_forecast_revenue"
    assert "Physical Plan" in out["plan"] and "Scan parquet" in out["plan"]


def test_cli_explain_unknown_query_errors(capsys):
    import pytest

    from etl_migrate_api_spark.__main__ import main

    with pytest.raises(SystemExit):
        main(["explain", "nope_not_registered"])


def test_cli_profile_table(spark, capsys):
    from etl_migrate_api_spark.__main__ import main

    main(["profile", "nation"])
    out = json.loads(capsys.readouterr().out)
    rows = {r[0]: r for r in out["profile"]}
    assert rows["n_nationkey"][1] == 25  # n_rows
    assert rows["n_nationkey"][3] == 25  # n_distinct
    assert rows["n_regionkey"][3] == 5


def test_cli_index_build_add_staleness(spark, tmp_path, capsys):
    """The r7 maintenance loop end-to-end through the CLI: build on a
    base slice, append the growth slice, read the staleness metric."""
    import pyspark.sql.functions as F

    from etl_migrate_api_spark.catalog import load

    base = str(tmp_path / "base.pq")
    growth = str(tmp_path / "growth.pq")
    emb = load(spark, "embeddings", "/root/testdata/sf0.001")
    emb.where(F.col("vec_id") % 5 != 0).write.parquet(base)
    emb.where(F.col("vec_id") % 5 == 0).write.parquet(growth)
    idx = str(tmp_path / "index")

    out = _run(capsys, ["index", "build", idx, "--vectors", base])
    assert out["codes"] == emb.where(F.col("vec_id") % 5 != 0).count()
    out = _run(capsys, ["index", "add", idx, "--vectors", growth])
    assert out["added"] == emb.where(F.col("vec_id") % 5 == 0).count()
    out = _run(capsys, ["index", "staleness", idx, "--vectors", growth])
    assert 0.0 <= out["mean_dist"] <= out["max_dist"]
    assert out["n_vectors"] == emb.where(F.col("vec_id") % 5 == 0).count()


def test_cli_compact(spark, tmp_path, capsys):
    p = str(tmp_path / "log")
    for i in range(3):
        spark.range(5).write.mode("append").parquet(p)
    out = _run(capsys, ["compact", p])
    assert out["files_before"] >= 3
    assert spark.read.parquet(p).count() == 15
