"""bench.py per-query error isolation — the round-5 failure mode
(one broken query erased the whole bench run) must stay fixed."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_survives_broken_query(tmp_path):
    """Point bench at a data dir missing the events table: the events
    query must land in `errors`, the healthy query must still be timed,
    and the output must stay one parseable JSON line (rc=0)."""
    data = tmp_path / "sf"
    data.mkdir()
    src = "/root/testdata/sf0.001"
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):  # everything except events
        os.symlink(f"{src}/{t}.parquet", data / f"{t}.parquet")
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=str(data))
    out = subprocess.run(
        [sys.executable, "bench.py", "events_sessionize", "llm_exact_dedup",
         "--repeat", "1"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout
    payload = json.loads(json_lines[0])
    assert "llm_exact_dedup" in payload["queries"]
    assert payload["queries"]["llm_exact_dedup"] > 0
    assert "events_sessionize" in payload["errors"]
    assert "events_sessionize" not in payload["queries"]


def test_bench_emits_env_probe(tmp_path):
    """r9: every bench emission carries its own host-health evidence
    (bench.EnvProbe) so a throttled recording is adjudicable from the
    artifact alone — the r8 3.4x fleet swing was not. Contract:
    `env` holds samples / probe_sec_median / degraded_frac /
    env_factor, with sane ranges."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, "bench.py", "llm_exact_dedup", "--repeat", "1"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    probe = payload["env"]
    assert probe["samples"] >= 1
    assert 0.0 < probe["probe_sec_median"] < 10.0
    assert 0.0 <= probe["degraded_frac"] <= 1.0
    assert probe["env_factor"] > 0.0
