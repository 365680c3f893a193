"""The maintenance CLI (maintain.py): subcommands run against a real
warehouse in their own python process (each owns its SparkSession) and
print one JSON line."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    from multi_table_plugins_spark.streaming import apply_cdc_batch

    d = str(tmp_path_factory.mktemp("maintwh"))
    rows = [
        (i, f"t{i % 2}", "I", f"d{i}", [i], 1, "s", "2024-01-01 00:00:01")
        for i in range(40)
    ] + [(100, "t0", "D", "d0", None, None, None, "2024-01-01 00:00:02")]
    feed = spark.createDataFrame(
        rows,
        "lsn long, table_name string, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    apply_cdc_batch(spark, feed, d, epoch=0, app_id="m", n_buckets=2)
    return d


def _run(*args):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "maintain.py"), *args],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_tables_compact_expire(wh):
    out = _run("tables", "--warehouse", wh)
    assert set(out["tables"]) == {"t0", "t1"}
    assert out["tables"]["t0"]["rows"] == 19  # d0 deleted
    assert out["tables"]["t1"]["rows"] == 20

    out = _run("compact", "--warehouse", wh, "--tables", "t0")
    assert list(out["tables"]) == ["t0"]

    out = _run(
        "expire-snapshots", "--warehouse", wh, "--keep-last", "1",
        "--remove-orphans",
    )
    assert set(out["tables"]) == {"t0", "t1"}

    # state intact after the maintenance ladder
    out = _run("tables", "--warehouse", wh)
    assert out["tables"]["t0"]["rows"] == 19
    assert out["tables"]["t1"]["rows"] == 20


def test_unknown_table_rejected(wh):
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "maintain.py"),
            "tables",
            "--warehouse",
            wh,
            "--tables",
            "nope",
        ],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert proc.returncode != 0
    assert "no such table" in proc.stderr


def test_delete_where_and_update_where_cli(wh, spark):
    from multi_table_plugins_spark.lakehouse import LakeTable

    out = _run(
        "update-where", "--warehouse", wh, "--src", "t1",
        "--where", '[["source","=","s"]]',
        "--set", '{"source":"crawl"}',
    )
    assert out["tables"]["t1"]["rows_applied"] == 20

    out = _run(
        "delete-where", "--warehouse", wh, "--src", "t1",
        "--where", '[["doc_id","=","d1"]]',
    )
    assert out["tables"]["t1"]["rows_applied"] == 1

    t1 = LakeTable(spark, os.path.join(wh, "t1"))
    rows = t1.read().collect()
    assert len(rows) == 19
    assert all(r["source"] == "crawl" for r in rows)
    assert not any(r["doc_id"] == "d1" for r in rows)


def test_tag_cli(wh):
    out = _run("tag", "--warehouse", wh, "--src", "t0", "--add", "rel1")
    assert "rel1" in out["tables"]["t0"]["tags"]
    out = _run("tag", "--warehouse", wh, "--src", "t0", "--drop", "rel1")
    assert out["tables"]["t0"]["tags"] == {}


def test_stats_columns_cli(wh):
    out = _run("stats-columns", "--warehouse", wh, "--src", "t0")
    assert out["tables"]["t0"]["stats_columns"] == []
    out = _run(
        "stats-columns", "--warehouse", wh, "--src", "t0",
        "--set", '["source"]',
    )
    assert out["tables"]["t0"]["stats_columns"] == ["source"]


def test_warehouse_wap_cli(wh, spark):
    from pyspark.sql import functions as F

    from multi_table_plugins_spark.lakehouse import LakeTable
    from multi_table_plugins_spark.streaming import stage_cdc_batch

    feed = spark.createDataFrame(
        [
            (500 + i, f"t{i % 2}", "U", f"wap{i}", [i], 1, "s",
             "2024-01-02 00:00:01")
            for i in range(6)
        ],
        "lsn long, table_name string, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    stage_cdc_batch(spark, feed, wh, epoch=7, app_id="m", n_buckets=2)

    def rows(t):
        return {
            r["doc_id"]
            for r in LakeTable(spark, os.path.join(wh, t)).read().collect()
        }

    assert not any(d.startswith("wap") for d in rows("t0") | rows("t1"))
    out = _run("publish-staged", "--warehouse", wh, "--branch", "wap-m-7")
    assert set(out["wap"]["tables"]) == {"t0", "t1"}
    assert out["wap"]["snapshot_seq"] is not None
    assert {f"wap{i}" for i in range(6)} <= (rows("t0") | rows("t1"))
    # nothing left staged; discard of a gone branch is a clean no-op
    out = _run("discard-staged", "--warehouse", wh, "--branch", "wap-m-7")
    assert out["wap"]["dropped"] == []


def test_branch_cli(wh):
    out = _run("branch", "--warehouse", wh, "--src", "t0", "--create", "wap")
    assert "wap" in out["tables"]["t0"]["branches"]
    # empty branch (no staged commits): fast-forward publishes nothing
    # and retires the branch
    out = _run(
        "branch", "--warehouse", wh, "--src", "t0", "--fast-forward", "wap"
    )
    assert out["tables"]["t0"]["fast_forwarded"]["published_versions"] == []
    assert out["tables"]["t0"]["branches"] == {}
    out = _run("branch", "--warehouse", wh, "--src", "t0", "--create", "x")
    out = _run("branch", "--warehouse", wh, "--src", "t0", "--drop", "x")
    assert out["tables"]["t0"]["branches"] == {}
