"""CLI surface: list/oracle run without a SparkSession (fast paths)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "mapreduce6240project_spark", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )


def test_list_names_every_registered_query():
    r = _cli("list")
    assert r.returncode == 0
    names = r.stdout.split()
    assert len(names) >= 177
    assert "kmedoids_k3" in names and "dedup_minhash_lsh" in names


def test_oracle_prints_sql():
    r = _cli("oracle", "global_count")
    assert r.returncode == 0
    assert "SELECT" in r.stdout and "lineitem" in r.stdout


def test_oracle_rows_only_exits_1():
    r = _cli("oracle", "kmeans_embeddings")
    assert r.returncode == 1


def test_unknown_query_exits_2():
    r = _cli("oracle", "no_such_query")
    assert r.returncode == 2


def test_sql_subcommand_runs_adhoc_query():
    r = _cli(
        "sql",
        "SELECT count(*) AS n FROM orders WHERE o_orderkey IS NOT NULL",
        "--limit",
        "5",
    )
    assert r.returncode == 0
    assert "| n " in r.stdout or "|n " in r.stdout or "n" in r.stdout
    assert "+--" in r.stdout  # a rendered result table
