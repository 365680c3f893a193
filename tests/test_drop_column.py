"""Schema evolution downward (``drop_column``): metadata-only column
drops with NAME tombstoning — this engine maps columns by name (no
Iceberg field ids), so a dropped name can never evolve back in, or old
files would silently resurrect pre-drop values. Also the continuous
rollup-refresh poll loop.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from multi_table_plugins_spark.lakehouse import LakeTable

SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("a", LongType(), True),
        StructField("b", StringType(), True),
    ]
)
CH = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("k", LongType(), False),
        StructField("a", LongType(), True),
        StructField("b", StringType(), True),
    ]
)


def _b(spark, rows):
    return spark.createDataFrame(rows, CH)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="k")
    t.merge_into(
        _b(spark, [(i, "I", i, i * 10, f"s{i}") for i in range(5)]),
        app_id="d",
        epoch=0,
    )
    return t


def test_drop_is_metadata_only_and_reads_conform(table):
    files_before = table.manifest()["stats"]["total_files"]
    sv = table.drop_column("b")
    assert table.schema().fieldNames() == ["k", "a"]
    assert table.manifest()["stats"]["total_files"] == files_before
    rows = {r["k"]: r["a"] for r in table.read().collect()}
    assert rows == {i: i * 10 for i in range(5)}
    assert "b" not in table.read().columns
    # time travel to a pre-drop version still shows the column
    old = table.read(version=table.manifest()["version"] - 1)
    assert "b" in old.columns
    assert table.drop_column("b") == sv  # idempotent


def test_dropped_name_cannot_evolve_back(spark, table):
    table.drop_column("b")
    with pytest.raises(ValueError, match="previously dropped"):
        table.merge_into(
            _b(spark, [(10, "I", 10, 1, "resurrect?")]),
            app_id="d",
            epoch=1,
        )
    # a merge WITHOUT the dropped column proceeds normally
    narrow = StructType(
        [
            StructField("lsn", LongType(), False),
            StructField("op", StringType(), False),
            StructField("k", LongType(), False),
            StructField("a", LongType(), True),
        ]
    )
    table.merge_into(
        spark.createDataFrame([(10, "I", 10, 100)], narrow),
        app_id="d",
        epoch=1,
    )
    assert table.read().count() == 6


def test_drop_guards(spark, table):
    with pytest.raises(ValueError, match="key column"):
        table.drop_column("k")
    with pytest.raises(ValueError, match="bookkeeping"):
        table.drop_column("_lsn")
    table.add_constraint("a_pos", "a >= 0")
    with pytest.raises(ValueError, match="constraint"):
        table.drop_column("a")
    table.drop_constraint("a_pos")
    table.drop_column("a")
    assert table.schema().fieldNames() == ["k", "b"]


def test_rollup_continuous_poll_loop_cli(spark, tmp_path):
    """--continuous --max-polls 2: first poll builds the view, second
    is a ledger no-op; one JSON line per poll."""
    wh = tmp_path / "wh"
    os.makedirs(wh)
    t = LakeTable.create(spark, str(wh / "t0"), SCHEMA, key="k")
    t.merge_into(
        _b(spark, [(i, "I", i, i, "g") for i in range(6)]),
        app_id="d",
        epoch=0,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "maintain.py"),
            "refresh-rollup",
            "--warehouse",
            str(wh),
            "--src",
            "t0",
            "--view-path",
            str(tmp_path / "view"),
            "--group-by",
            "b",
            "--sum",
            "a",
            "--n-buckets",
            "2",
            "--continuous",
            "--poll-interval",
            "0.5",
            "--max-polls",
            "2",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [
        json.loads(line)
        for line in r.stdout.strip().splitlines()
        if line.startswith("{")
    ]
    assert len(lines) == 2
    assert lines[0]["refreshed"] is True
    assert lines[1]["refreshed"] is False  # no new source version
    view = LakeTable(spark, str(tmp_path / "view"))
    got = {r2["b"]: (r2["sum_a"], r2["row_count"]) for r2 in view.read().collect()}
    assert got == {"g": (15, 6)}
