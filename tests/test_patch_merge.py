"""Partial-update (patch) merge mode: null payload columns mean
UNCHANGED. Oracle: a brute-force python replay applying each event's
non-null columns in lsn order (deletes reset the row), compared after
every epoch against ``read()``.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from multi_table_plugins_spark.lakehouse import LakeTable

SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("a", IntegerType(), True),
        StructField("b", StringType(), True),
    ]
)
CH = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("k", LongType(), False),
        StructField("a", IntegerType(), True),
        StructField("b", StringType(), True),
    ]
)


def _merge(spark, t, rows, epoch):
    t.merge_into(
        spark.createDataFrame(rows, CH),
        app_id="p",
        epoch=epoch,
        update_mode="patch",
    )


def _state(t):
    return {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}


def _brute(events):
    """Python oracle: apply events in lsn order; null = unchanged,
    delete resets the row."""
    state: dict = {}
    for lsn, op, k, a, b in sorted(events):
        if op == "D":
            state.pop(k, None)
            continue
        cur = state.get(k, (None, None))
        state[k] = (a if a is not None else cur[0], b if b is not None else cur[1])
    return state


def test_patch_merge_basic_and_cross_batch(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="k", n_buckets=4)
    e0 = [(1, "I", 1, 10, "x"), (2, "I", 2, 20, "y")]
    _merge(spark, t, e0, 0)
    # epoch 1 patches only ONE column of each key
    e1 = [(3, "U", 1, None, "x2"), (4, "U", 2, 25, None)]
    _merge(spark, t, e1, 1)
    assert _state(t) == _brute(e0 + e1) == {1: (10, "x2"), 2: (25, "y")}


def test_patch_delete_resets_row_within_and_across_batches(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="k", n_buckets=2)
    # within one batch: set, delete, partial re-insert — the pre-delete
    # column value must NOT leak through the delete
    e0 = [(1, "I", 1, 10, "x"), (2, "D", 1, None, None), (3, "I", 1, None, "z")]
    _merge(spark, t, e0, 0)
    assert _state(t) == _brute(e0) == {1: (None, "z")}
    # across batches: delete in epoch 1, partial re-insert in epoch 2
    e1 = [(4, "D", 1, None, None)]
    e2 = [(5, "I", 1, 77, None)]
    _merge(spark, t, e1, 1)
    _merge(spark, t, e2, 2)
    assert _state(t) == _brute(e0 + e1 + e2) == {1: (77, None)}


def test_patch_column_wise_lww_within_batch(spark, tmp_path):
    """Two events patch DIFFERENT columns of one key in one batch: both
    must land (whole-row LWW would drop the older event's column)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="k", n_buckets=2)
    e0 = [(1, "I", 7, 1, "a")]
    _merge(spark, t, e0, 0)
    e1 = [(10, "U", 7, 99, None), (11, "U", 7, None, "bb")]
    _merge(spark, t, e1, 1)
    assert _state(t) == _brute(e0 + e1) == {7: (99, "bb")}


def test_patch_mode_rejects_bad_mode_and_row_mode_unchanged(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="k", n_buckets=2)
    with pytest.raises(ValueError, match="update_mode"):
        t.merge_into(
            spark.createDataFrame([(1, "I", 1, 1, "x")], CH),
            update_mode="merge",
        )
    # row mode: the null OVERWRITES (set-to-null is expressible)
    t.merge_into(spark.createDataFrame([(1, "I", 1, 1, "x")], CH), epoch=0, app_id="r")
    t.merge_into(spark.createDataFrame([(2, "U", 1, None, "y")], CH), epoch=1, app_id="r")
    assert _state(t) == {1: (None, "y")}


def test_patch_replay_is_exactly_once(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="k", n_buckets=2)
    e0 = [(1, "I", 1, 10, "x")]
    e1 = [(2, "U", 1, None, "y")]
    _merge(spark, t, e0, 0)
    _merge(spark, t, e1, 1)
    v = t.manifest()["version"]
    _merge(spark, t, e1, 1)  # replay: ledger no-op
    assert t.manifest()["version"] == v
    assert _state(t) == {1: (10, "y")}


_events = st.lists(
    st.tuples(
        st.sampled_from("IUD"),
        st.integers(0, 5),
        st.one_of(st.none(), st.integers(0, 99)),
        st.one_of(st.none(), st.sampled_from(["p", "q", "r"])),
    ),
    min_size=1,
    max_size=24,
)


@given(_events)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_patch_merge_equals_brute_force_on_any_history(spark, evs):
    import shutil
    import tempfile

    events = [
        (i + 1, op, k, None if op == "D" else a, None if op == "D" else b)
        for i, (op, k, a, b) in enumerate(evs)
    ]
    cut = max(1, len(events) // 2)
    work = tempfile.mkdtemp(prefix="patch_prop_")
    try:
        t = LakeTable.create(spark, work + "/t", SCHEMA, key="k", n_buckets=2)
        _merge(spark, t, events[:cut], 0)
        if events[cut:]:
            _merge(spark, t, events[cut:], 1)
        assert _state(t) == _brute(events)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_patch_delete_then_reinsert_over_stored_live_row(spark, tmp_path):
    """THE leak case: the stored row is LIVE, and one batch deletes then
    partially re-inserts the key — the stored pre-delete value must not
    be resurrected through the coalesce (regression: the coalesce gate
    checked only the stored row's tombstone flag, not the in-batch
    delete)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="k", n_buckets=2)
    e0 = [(1, "I", 1, 10, "x")]
    _merge(spark, t, e0, 0)
    e1 = [(2, "D", 1, None, None), (3, "I", 1, None, "z")]
    _merge(spark, t, e1, 1)
    assert _state(t) == _brute(e0 + e1) == {1: (None, "z")}
    # and a batch WITHOUT a delete still coalesces from the stored row
    e2 = [(4, "U", 1, 55, None)]
    _merge(spark, t, e2, 2)
    assert _state(t) == _brute(e0 + e1 + e2) == {1: (55, "z")}


def test_patch_mode_on_keys_only_table_degrades_to_row_lww(spark, tmp_path):
    from pyspark.sql.types import StructField as _F, StructType as _T

    sch = _T([_F("k", LongType(), False)])
    ch = _T(
        [
            _F("lsn", LongType(), False),
            _F("op", StringType(), False),
            _F("k", LongType(), False),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), sch, key="k", n_buckets=2)
    t.merge_into(
        spark.createDataFrame([(1, "I", 1), (2, "I", 2), (3, "D", 1)], ch),
        app_id="p",
        epoch=0,
        update_mode="patch",
    )
    assert {r["k"] for r in t.read().collect()} == {2}
