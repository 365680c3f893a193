"""Table CHECK constraints (Delta-style expectations): registered in
the manifest, validated against existing data at add time, enforced on
every merge over LIVE events only (SQL CHECK semantics — NULL passes;
deletes exempt), with fail and drop-and-count violation modes. Cost is
one extra pass over the BATCH, never the table.

Reference parity: the skip-invalid / fail split mirrors the
reference's error-port semantics (RecordFilterOutputFormat.java:51-53)
applied to declarative table expectations it lacks.
"""

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

from multi_table_plugins_spark.lakehouse import (
    ConstraintViolation,
    LakeTable,
)

SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("n", LongType(), True),
        StructField("s", StringType(), True),
    ]
)
CH = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("k", LongType(), False),
        StructField("n", LongType(), True),
        StructField("s", StringType(), True),
    ]
)


def _b(spark, rows):
    return spark.createDataFrame(rows, CH)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="k")
    t.merge_into(
        _b(spark, [(i, "I", i, i, "ok") for i in range(1, 6)]),
        app_id="c",
        epoch=0,
    )
    return t


def test_add_list_drop_roundtrip(table):
    table.add_constraint("n_pos", "n > 0")
    table.add_constraint("s_short", "length(s) <= 10")
    assert table.constraints() == {
        "n_pos": "n > 0",
        "s_short": "length(s) <= 10",
    }
    table.add_constraint("n_pos", "n > 0")  # idempotent re-add
    with pytest.raises(ValueError, match="different expression"):
        table.add_constraint("n_pos", "n > 1")
    table.drop_constraint("s_short")
    table.drop_constraint("s_short")  # idempotent
    assert table.constraints() == {"n_pos": "n > 0"}


def test_add_rejects_bad_expressions(table):
    with pytest.raises(ValueError, match="does not analyze"):
        table.add_constraint("bad", "no_such_col > 0")
    with pytest.raises(ValueError, match="boolean"):
        table.add_constraint("bad", "n + 1")


def test_add_validates_existing_data(spark, table):
    # existing rows have n in 1..5 — a violated constraint is refused
    with pytest.raises(ConstraintViolation, match="existing rows"):
        table.add_constraint("n_big", "n > 3")
    assert table.constraints() == {}
    table.add_constraint("n_big", "n > 3", validate=False)  # forced
    assert table.constraints() == {"n_big": "n > 3"}


def test_merge_fail_mode_rejects_batch_before_writing(spark, table):
    table.add_constraint("n_pos", "n > 0")
    v = table.manifest()["version"]
    with pytest.raises(ConstraintViolation, match="n_pos"):
        table.merge_into(
            _b(spark, [(10, "I", 10, -1, "bad"), (11, "I", 11, 1, "ok")]),
            app_id="c",
            epoch=1,
        )
    # nothing committed, ledger not advanced — the batch is retryable
    assert table.manifest()["version"] == v
    assert table.last_committed_epoch("c") == 0


def test_merge_drop_mode_filters_and_counts(spark, table):
    table.add_constraint("n_pos", "n > 0")
    r = table.merge_into(
        _b(
            spark,
            [
                (10, "I", 10, -1, "bad"),
                (11, "I", 11, 7, "ok"),
                (12, "U", 1, -5, "bad"),
            ],
        ),
        app_id="c",
        epoch=1,
        on_violation="drop",
    )
    assert r["constraint_violations_dropped"] == 2
    state = {row["k"]: row["n"] for row in table.read().collect()}
    assert state[11] == 7 and 10 not in state
    assert state[1] == 1  # the violating update was dropped — old row wins


def test_null_passes_and_deletes_exempt(spark, table):
    table.add_constraint("n_pos", "n > 0")
    r = table.merge_into(
        _b(
            spark,
            [
                (10, "I", 10, None, "null-ok"),  # NULL → CHECK passes
                (11, "D", 2, None, None),  # delete exempt
            ],
        ),
        app_id="c",
        epoch=1,
    )
    assert not r.get("skipped")
    state = {row["k"]: row["n"] for row in table.read().collect()}
    assert state[10] is None and 2 not in state


def test_bad_violation_mode_rejected(spark, table):
    with pytest.raises(ValueError, match="on_violation"):
        table.merge_into(
            _b(spark, [(10, "I", 10, 1, "x")]),
            app_id="c",
            epoch=1,
            on_violation="ignore",
        )


def test_constraint_cli(spark, tmp_path):
    wh = tmp_path / "wh"
    os.makedirs(wh)
    t = LakeTable.create(spark, str(wh / "t0"), SCHEMA, key="k")
    t.merge_into(
        _b(spark, [(1, "I", 1, 5, "x")]), app_id="c", epoch=0
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "maintain.py"),
            "constraint",
            "--warehouse",
            str(wh),
            "--src",
            "t0",
            "--add",
            "n_pos",
            "n > 0",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["tables"]["t0"]["constraints"] == {"n_pos": "n > 0"}
    # the registration is visible to a fresh handle
    assert LakeTable(spark, str(wh / "t0")).constraints() == {
        "n_pos": "n > 0"
    }


# ---------------------------------------------------------------------------
# second review pass: fast path, patch semantics, races
# ---------------------------------------------------------------------------

MM_FEED = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("k", LongType(), False),
        StructField("n", LongType(), True),
        StructField("s", StringType(), True),
    ]
)


def test_fast_path_enforces_constraints(spark, tmp_path):
    """merge_many (the pipeline's default path) must enforce CHECK
    constraints too — drop mode filters + counts, unconstrained sibling
    tables stay on the zero-copy lane."""
    from multi_table_plugins_spark.lakehouse.multi_merge import merge_many

    wh = str(tmp_path / "wh")
    merge_many(
        spark,
        spark.createDataFrame(
            [("c0", 1, "I", 1, 5, "x"), ("c1", 2, "I", 1, 5, "x")], MM_FEED
        ),
        wh,
        app_id="mm",
        epoch=0,
        n_buckets=2,
        key_col="k",
    )
    LakeTable(spark, os.path.join(wh, "c0")).add_constraint("n_pos", "n > 0")
    r = merge_many(
        spark,
        spark.createDataFrame(
            [
                ("c0", 10, "I", 2, -1, "bad"),
                ("c0", 11, "I", 3, 7, "ok"),
                ("c1", 12, "I", 2, -1, "fine-here"),
            ],
            MM_FEED,
        ),
        wh,
        app_id="mm",
        epoch=1,
        n_buckets=2,
        key_col="k",
        on_violation="drop",
    )
    assert r["c0"]["constraint_violations_dropped"] == 1
    c0 = {row["k"]: row["n"]
          for row in LakeTable(spark, os.path.join(wh, "c0")).read().collect()}
    assert c0 == {1: 5, 3: 7}  # violating insert dropped
    # the UNconstrained table accepted its negative row untouched
    c1 = {row["k"]: row["n"]
          for row in LakeTable(spark, os.path.join(wh, "c1")).read().collect()}
    assert c1 == {1: 5, 2: -1}


def test_fast_path_fail_mode_raises_and_commits_nothing(spark, tmp_path):
    from multi_table_plugins_spark.lakehouse.multi_merge import merge_many

    wh = str(tmp_path / "wh")
    merge_many(
        spark,
        spark.createDataFrame([("c0", 1, "I", 1, 5, "x")], MM_FEED),
        wh,
        app_id="mm",
        epoch=0,
        n_buckets=2,
        key_col="k",
    )
    t = LakeTable(spark, os.path.join(wh, "c0"))
    t.add_constraint("n_pos", "n > 0")
    with pytest.raises(RuntimeError, match="n_pos"):
        merge_many(
            spark,
            spark.createDataFrame([("c0", 10, "I", 2, -1, "bad")], MM_FEED),
            wh,
            app_id="mm",
            epoch=1,
            n_buckets=2,
            key_col="k",
            on_violation="fail",
        )
    assert t.last_committed_epoch("mm") == 0  # batch retryable
    assert {row["k"] for row in t.read().collect()} == {1}


def test_patch_mode_checks_resolved_rows(spark, tmp_path):
    """CHECK a <= b with a patched and b carried forward: the raw patch
    event (b NULL) passes SQL CHECK, but the RESOLVED row violates —
    enforcement must see the resolved row."""
    from multi_table_plugins_spark.lakehouse import ConstraintViolation

    sch = StructType(
        [
            StructField("k", LongType(), False),
            StructField("a", LongType(), True),
            StructField("b", LongType(), True),
        ]
    )
    ch = StructType(
        [
            StructField("lsn", LongType(), False),
            StructField("op", StringType(), False),
            StructField("k", LongType(), False),
            StructField("a", LongType(), True),
            StructField("b", LongType(), True),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), sch, key="k")
    t.merge_into(
        spark.createDataFrame([(1, "I", 7, 1, 3)], ch), app_id="p", epoch=0
    )
    t.add_constraint("a_le_b", "a <= b")
    with pytest.raises(ConstraintViolation, match="a_le_b"):
        t.merge_into(
            spark.createDataFrame([(9, "U", 7, 5, None)], ch),
            app_id="p",
            epoch=1,
            update_mode="patch",
        )
    row = t.read().collect()[0]
    assert (row["a"], row["b"]) == (1, 3)  # nothing written


def test_add_constraint_revalidates_after_losing_race(
    spark, tmp_path, monkeypatch
):
    """A concurrent merge landing violating rows between the validation
    scan and the publish must be caught by the retry's re-scan."""
    from multi_table_plugins_spark.lakehouse import ConstraintViolation
    from multi_table_plugins_spark.lakehouse.table import CommitConflict

    p = str(tmp_path / "t")
    t = LakeTable.create(spark, p, SCHEMA, key="k")
    t.merge_into(
        _b(spark, [(1, "I", 1, 5, "x")]), app_id="c", epoch=0
    )
    other = LakeTable(spark, p)
    orig = t._publish
    state = {"n": 0}

    def racing_publish(m, added=None):
        if state["n"] == 0:
            state["n"] += 1
            # concurrent writer sneaks a violating row in first
            other.merge_into(
                _b(spark, [(10, "I", 2, -1, "bad")]), app_id="other", epoch=0
            )
            raise CommitConflict("simulated lost race")
        return orig(m, added=added)

    monkeypatch.setattr(t, "_publish", racing_publish)
    with pytest.raises(ConstraintViolation, match="existing rows"):
        t.add_constraint("n_pos", "n > 0")
    assert LakeTable(spark, p).constraints() == {}
