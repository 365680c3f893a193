"""Round-2 additions: typed PK-range splitters, JDBC seam, text-encoder
bytes/nested policy, TIME mapping, lossy-widening refusal, LSH band
divisibility, error-channel replay idempotence, merge_into commit retry,
connected-components convergence."""

import datetime
import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    TimestampType,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_table_plugins_spark.schemas import (  # noqa: E402
    SchemaEvolutionError,
    jdbc_type_to_spark,
    merge_types,
    time_to_micros,
)
from multi_table_plugins_spark.sources.jdbc import (  # noqa: E402
    JdbcMultiTableSource,
    JdbcTableSpec,
    bounding_vals_query,
    build_split_query,
    split_where_clause,
)
from multi_table_plugins_spark.sources.multi_table import (  # noqa: E402
    MultiTableSource,
    assign_range_splits,
)


# ---------------------------------------------------------------------------
# typed PK-range splitters (S6, MultiTableDBInputFormat.java:217-251)
# ---------------------------------------------------------------------------

def test_splitter_date(spark):
    rows = [(datetime.date(2020, 1, 1 + i),) for i in range(10)]
    df = spark.createDataFrame(rows, "d date")
    out = assign_range_splits(df, "d", 2)
    got = {r["d"].day: r["split_id"] for r in out.collect()}
    assert got[1] == 0 and got[5] == 0 and got[6] == 1 and got[10] == 1


def test_splitter_boolean(spark):
    df = spark.createDataFrame([(True,), (False,), (True,)], "b boolean")
    out = {(r["b"], r["split_id"]) for r in assign_range_splits(df, "b", 4).collect()}
    assert out == {(True, 1), (False, 0)}


def test_splitter_decimal(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(100)], "x int"
    ).select(F.col("x").cast("decimal(10,2)").alias("x"))
    out = assign_range_splits(df, "x", 4)
    cnt = {r["split_id"]: r["n"] for r in out.groupBy("split_id").agg(F.count("*").alias("n")).collect()}
    assert set(cnt) == {0, 1, 2, 3}
    assert sum(cnt.values()) == 100


def test_splitter_text_orders_lexicographically(spark):
    df = spark.createDataFrame(
        [("apple",), ("banana",), ("yak",), ("zebra",)], "s string"
    )
    out = {r["s"]: r["split_id"] for r in assign_range_splits(df, "s", 2).collect()}
    assert out["apple"] == 0 and out["zebra"] == 1
    assert out["banana"] <= out["yak"]


def test_splitter_degenerate_single_value(spark):
    df = spark.createDataFrame([("same",)] * 3, "s string")
    assert {r["split_id"] for r in assign_range_splits(df, "s", 4).collect()} == {0}


def test_splitter_unsupported_type_raises(spark):
    df = spark.createDataFrame([([1],)], "a array<int>")
    with pytest.raises(TypeError, match="no range splitter"):
        assign_range_splits(df, "a", 2)


# ---------------------------------------------------------------------------
# JDBC seam (MultiTableDBSource.java:61-66, DBTableRecordReader.java:169-180)
# ---------------------------------------------------------------------------

def test_split_query_assembly_matches_reference():
    # DBTableSplit.getWhereClause: (( lo ) AND ( hi )), 1=1 for open bounds
    assert split_where_clause(None, None) == "(( 1=1 ) AND ( 1=1 ))"
    assert (
        split_where_clause("id >= 5", "id < 10")
        == "(( id >= 5 ) AND ( id < 10 ))"
    )
    # DBTableRecordReader.getQuery: user WHERE carries its own keyword
    assert (
        build_split_query("db.users", "WHERE active = 1", "id >= 5", "id < 10")
        == "SELECT * FROM db.users WHERE active = 1 AND (( id >= 5 ) AND ( id < 10 ))"
    )
    assert (
        build_split_query("db.users")
        == "SELECT * FROM db.users WHERE (( 1=1 ) AND ( 1=1 ))"
    )
    assert (
        bounding_vals_query("db.users", "id", "WHERE active = 1")
        == "SELECT MIN(id), MAX(id) FROM db.users WHERE active = 1"
    )


def test_jdbc_reader_options(spark):
    src = JdbcMultiTableSource(
        spark,
        url="jdbc:postgresql://host:5432/db",
        driver="org.postgresql.Driver",
        user="u",
        password="p",
        where_clause="WHERE updated_at > 0",
        fetch_size=500,
    )
    opts = src.reader_options(
        JdbcTableSpec(table="users", pk="id", lower=0, upper=100, num_partitions=4)
    )
    assert opts["dbtable"] == "(SELECT * FROM users WHERE updated_at > 0) users_flt"
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "4"
    assert opts["fetchsize"] == "500"
    # partitioned read without bounds must refuse, not scan unsplit
    with pytest.raises(ValueError, match="bounds"):
        src.reader_options(JdbcTableSpec(table="users", pk="id", num_partitions=4))


def test_jdbc_query_timeout_and_isolation_knobs(spark):
    # queryTimeoutSeconds (MultiTableConf.java:161-163, applied at
    # DBTableRecordReader.java:76-78) and the SERIALIZABLE-default
    # isolation seam (TransactionIsolationLevel.java:34-63) are
    # first-class reader options now
    src = JdbcMultiTableSource(
        spark,
        url="jdbc:postgresql://host:5432/db",
        query_timeout=30,
        isolation_level="serializable",
    )
    opts = src.reader_options(JdbcTableSpec(table="users"))
    assert opts["queryTimeout"] == "30"
    assert opts["sessionInitStatement"] == (
        "SET TRANSACTION ISOLATION LEVEL SERIALIZABLE"
    )
    # session_init alone is passed through verbatim
    src_si = JdbcMultiTableSource(
        spark,
        url="jdbc:postgresql://host:5432/db",
        session_init="SET statement_timeout = 60000",
    )
    assert src_si.reader_options(JdbcTableSpec(table="users"))[
        "sessionInitStatement"
    ] == "SET statement_timeout = 60000"
    # BOTH set refuses loudly: Spark executes ONE sessionInitStatement
    # and multi-statement strings break on many drivers — the caller
    # must compose them dialect-aware
    with pytest.raises(ValueError, match="both set"):
        JdbcMultiTableSource(
            spark,
            url="jdbc:postgresql://host:5432/db",
            isolation_level="serializable",
            session_init="SET statement_timeout = 60000",
        ).reader_options(JdbcTableSpec(table="users"))
    # underscore spelling normalizes; bogus levels refuse loudly
    src2 = JdbcMultiTableSource(
        spark, url="jdbc:h2:mem:", isolation_level="repeatable_read"
    )
    assert (
        src2.reader_options(JdbcTableSpec(table="t"))["sessionInitStatement"]
        == "SET TRANSACTION ISOLATION LEVEL REPEATABLE READ"
    )
    with pytest.raises(ValueError, match="isolation level"):
        JdbcMultiTableSource(
            spark, url="jdbc:h2:mem:", isolation_level="chaos"
        ).reader_options(JdbcTableSpec(table="t"))
    # unset knobs leave the option dict clean (no stray keys)
    plain = JdbcMultiTableSource(spark, url="jdbc:h2:mem:").reader_options(
        JdbcTableSpec(table="t")
    )
    assert "queryTimeout" not in plain and "sessionInitStatement" not in plain


def test_jdbc_allow_block_discovery(spark):
    src = JdbcMultiTableSource(
        spark, url="jdbc:h2:mem:", allow_list=("a", "b"), block_list=("b",)
    )
    assert src.discover(["a", "b", "c"]) == ["a"]


def test_multi_table_source_jdbc_backend(spark):
    src = MultiTableSource(
        spark,
        backend="jdbc",
        where="active = 1",
        block_list=("secrets",),
        jdbc_conf={"url": "jdbc:h2:mem:", "tables": ["users", "secrets"]},
    )
    assert src.tables == ["users"]
    assert src._jdbc.where_clause == "WHERE active = 1"
    with pytest.raises(ValueError, match="unknown backend"):
        MultiTableSource(spark, backend="bogus")


# ---------------------------------------------------------------------------
# type mapping + widening policy
# ---------------------------------------------------------------------------

def test_jdbc_type_mapping_survey_table():
    assert jdbc_type_to_spark("TINYINT") == IntegerType()
    assert jdbc_type_to_spark("BIGINT") == LongType()
    assert jdbc_type_to_spark("BIGINT", precision=20, signed=False) == DecimalType(20, 0)
    assert jdbc_type_to_spark("REAL") == FloatType()
    assert jdbc_type_to_spark("TIME") == LongType()  # TIME_MICROS
    assert jdbc_type_to_spark("TIMESTAMP") == TimestampType()
    with pytest.raises(SchemaEvolutionError):
        jdbc_type_to_spark("DECIMAL")  # precision 0 rejected
    with pytest.raises(SchemaEvolutionError):
        jdbc_type_to_spark("ARRAY")
    assert time_to_micros(1, 2, 3, 4) == 3723000004


def test_merge_types_rejects_lossy_long_to_double():
    with pytest.raises(SchemaEvolutionError, match="2\\^53"):
        merge_types(LongType(), DoubleType())
    with pytest.raises(SchemaEvolutionError):
        merge_types(FloatType(), LongType())
    # small integrals still widen to double exactly
    assert merge_types(IntegerType(), DoubleType()) == DoubleType()
    assert merge_types(FloatType(), IntegerType()) == DoubleType()


# ---------------------------------------------------------------------------
# LSH band divisibility
# ---------------------------------------------------------------------------

def test_lsh_band_divisibility_raises(spark):
    from multi_table_plugins_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    sigs = minhash_signatures(docs, num_hashes=10)
    with pytest.raises(ValueError, match="not divisible"):
        lsh_candidate_pairs(sigs, num_bands=3, num_hashes=10)


# ---------------------------------------------------------------------------
# csv sink policy (StructuredToTextTransformer.java:63-81 parity)
# ---------------------------------------------------------------------------

def test_csv_sink_rejects_nested_and_escapes_bytes(spark, tmp_path):
    from multi_table_plugins_spark.sinks.multi_sink import write_multi_table

    nested = spark.createDataFrame(
        [("t1", [1, 2])], "tablename string, arr array<int>"
    )
    with pytest.raises(ValueError, match="nested"):
        write_multi_table(nested, str(tmp_path / "a"), fmt="csv")

    binary = spark.createDataFrame(
        [("t1", bytearray(b"\x00\xff"))], "tablename string, payload binary"
    )
    out = str(tmp_path / "b")
    write_multi_table(binary, out, fmt="csv", ingest_time=1)
    got = (
        spark.read.option("sep", ",")
        .schema("payload string")
        .csv(out + "/tablename=t1/ingesttime=1")
        .collect()
    )
    import base64

    assert base64.b64decode(got[0]["payload"]) == b"\x00\xff"


# ---------------------------------------------------------------------------
# error channel: crash-replay of an epoch must not duplicate error rows
# ---------------------------------------------------------------------------

def test_error_channel_replay_idempotent(spark, tmp_path):
    from multi_table_plugins_spark.streaming.cdc_pipeline import (
        apply_cdc_batch,
        read_errors,
    )

    wh = str(tmp_path / "wh")
    bad = spark.createDataFrame(
        [
            (1, "t00", "U", "k1", [1, 2], 99, "web", datetime.datetime(2026, 1, 1)),
            (2, "t00", "U", "k2", [1, 2], 2, "web", datetime.datetime(2026, 1, 1)),
        ],
        "lsn long, table_name string, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string, ts timestamp",
    )
    apply_cdc_batch(spark, bad, wh, epoch=0, app_id="t", error_mode="error-port")
    n1 = read_errors(spark, wh).count()
    assert n1 == 1  # the n_tok=99 invariant violation
    # crash replay of the SAME epoch: data commit skips via ledger; error
    # rows must be overwritten, not appended
    apply_cdc_batch(spark, bad, wh, epoch=0, app_id="t", error_mode="error-port")
    assert read_errors(spark, wh).count() == n1


# ---------------------------------------------------------------------------
# merge_into publishes through the retrying commit path
# ---------------------------------------------------------------------------

def test_merge_into_retries_commit_conflict(spark, tmp_path, monkeypatch):
    from multi_table_plugins_spark.lakehouse.table import CommitConflict, LakeTable
    from multi_table_plugins_spark.schemas import TARGET_SCHEMA

    t = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    changes = spark.createDataFrame(
        [(1, "k1", [1], 1, "web", "U")],
        "lsn long, doc_id string, tokens array<int>, n_tok int, source string, op string",
    )
    real_publish = LakeTable._publish
    fails = {"n": 2}

    def flaky_publish(self, manifest, added=None):
        if fails["n"] > 0:
            fails["n"] -= 1
            self._manifest_cache_version = -1
            raise CommitConflict("simulated concurrent writer")
        return real_publish(self, manifest, added=added)

    monkeypatch.setattr(LakeTable, "_publish", flaky_publish)
    m = t.merge_into(changes, app_id="a", epoch=1)
    monkeypatch.setattr(LakeTable, "_publish", real_publish)
    assert not m["skipped"]
    assert m["rows_applied"] == 1
    assert t.read().count() == 1
    assert t.last_committed_epoch("a") == 1


# ---------------------------------------------------------------------------
# connected components: pointer jumping converges on a long chain
# ---------------------------------------------------------------------------

def test_connected_components_long_chain(spark):
    from multi_table_plugins_spark.operators.components import connected_components

    # a 40-node chain has label diameter 40 — pointer jumping must
    # converge well within max_iter=10 (O(log d) rounds).
    # small_graph_edges=0 forces the DISTRIBUTED path (the default would
    # route this tiny graph to driver-side union-find)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a int, id_b int"
    )
    comps = connected_components(pairs, max_iter=10, small_graph_edges=0).collect()
    assert {r["comp"] for r in comps} == {0}
    assert len(comps) == 41


def test_connected_components_raises_on_exhaustion(spark):
    from multi_table_plugins_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a int, id_b int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1, small_graph_edges=0)


# ---------------------------------------------------------------------------
# IVF ANN: probing every cell must reproduce exact brute force
# ---------------------------------------------------------------------------

def test_ivf_full_probe_equals_exact(spark):
    from multi_table_plugins_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 3")
    exact = {
        (r["query_id"], r["candidate_id"], r["rank"])
        for r in cosine_topk(q, emb, k=5).collect()
    }
    full_probe = {
        (r["query_id"], r["candidate_id"], r["rank"])
        for r in ivf_topk(q, emb, k=5, n_centroids=8, nprobe=8).collect()
    }
    assert full_probe == exact


def test_ivf_partial_probe_is_subset_with_recall(spark):
    from multi_table_plugins_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    exact = {
        (r["query_id"], r["candidate_id"])
        for r in cosine_topk(q, emb, k=10).collect()
    }
    approx = {
        (r["query_id"], r["candidate_id"])
        for r in ivf_topk(q, emb, k=10, n_centroids=8, nprobe=2).collect()
    }
    # structure sanity: approx only returns corpus members, k per query
    assert len(approx) == 50
    recall = len(approx & exact) / len(exact)
    assert recall > 0.05  # random embeddings; nprobe=2/8 cells


# ---------------------------------------------------------------------------
# S11: engine-reported streaming progress (StreamingQueryListener)
# ---------------------------------------------------------------------------

def test_progress_listener_records_engine_counters(spark, tmp_path):
    from multi_table_plugins_spark.feed import FeedSpec, generate_feed
    from multi_table_plugins_spark.streaming import run_cdc_stream
    from multi_table_plugins_spark.streaming.lineage import read_progress

    feed = str(tmp_path / "feed")
    generate_feed(feed, FeedSpec(n_events=2000, n_tables=2, keys_per_table=100, n_files=4, seed=7))
    wh = str(tmp_path / "wh")
    q = run_cdc_stream(
        spark, feed, wh, str(tmp_path / "ckpt"),
        app_id="prog", max_files_per_trigger=2, n_buckets=4,
        progress_listener=True,
    )
    q.awaitTermination()
    import time as _t

    recs = []
    for _ in range(40):  # listener delivery is async
        recs = read_progress(wh)
        if sum(r["num_input_rows"] for r in recs) >= 2000:
            break
        _t.sleep(0.25)
    spark.streams.removeListener(q._mtp_listener)
    assert sum(r["num_input_rows"] for r in recs) == 2000
    assert all(r["kind"] == "stream_progress" for r in recs)
    assert any(r["duration_ms"] for r in recs)


# ---------------------------------------------------------------------------
# bucket-pruned point lookup
# ---------------------------------------------------------------------------

def test_lookup_reads_only_the_keys_bucket(spark, tmp_path):
    from multi_table_plugins_spark.lakehouse.table import LakeTable
    from multi_table_plugins_spark.schemas import TARGET_SCHEMA

    t = LakeTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    rows = [(i, f"k{i}", [i, i + 1], 2, "web", "U") for i in range(40)]
    rows.append((100, "k7", [9], 1, "pdf", "U"))   # update k7
    rows.append((101, "k8", None, None, None, "D"))  # delete k8
    changes = spark.createDataFrame(
        rows,
        "lsn long, doc_id string, tokens array<int>, n_tok int, source string, op string",
    )
    t.merge_into(changes, app_id="a", epoch=1)

    got = t.lookup("k7").collect()
    assert len(got) == 1 and got[0]["tokens"] == [9] and got[0]["source"] == "pdf"
    assert t.lookup("k8").count() == 0      # tombstoned
    assert t.lookup("missing").count() == 0
    # equivalence with the full-scan read
    full = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert full["k7"] == [9] and "k8" not in full


# ---------------------------------------------------------------------------
# minor (delta-only) compaction
# ---------------------------------------------------------------------------

def test_minor_compaction_preserves_state_and_shrinks_deltas(spark, tmp_path):
    from multi_table_plugins_spark.lakehouse.table import LakeTable
    from multi_table_plugins_spark.schemas import TARGET_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4, compact_threshold=100
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        "lsn long, doc_id string, tokens array<int>, n_tok int, source string, op string",
    )
    t.merge_into(mk([(1, "a", [1], 1, "w", "U"), (2, "b", [2], 1, "w", "U")]), epoch=1)
    t.merge_into(mk([(3, "a", [3], 1, "w", "U"), (4, "c", [4], 1, "w", "U")]), epoch=2)
    t.merge_into(mk([(5, "b", None, None, None, "D")]), epoch=3)
    before = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    m0 = t.manifest()
    deltas_before = sum(len(v.get("delta", [])) for v in m0["buckets"].values())
    assert sum(len(v.get("base", [])) for v in m0["buckets"].values()) == 0

    r = t.compact_deltas()
    assert r["minor_compacted_buckets"]
    m1 = t.manifest()
    deltas_after = sum(len(v.get("delta", [])) for v in m1["buckets"].values())
    assert deltas_after < deltas_before
    # base untouched (still none), state identical, tombstone still wins
    assert sum(len(v.get("base", [])) for v in m1["buckets"].values()) == 0
    after = {r2["doc_id"]: r2["tokens"] for r2 in t.read().collect()}
    assert after == before and "b" not in after and after["a"] == [3]
    # a late lower-LSN update must STILL not resurrect the deleted key
    t.merge_into(mk([(4, "b", [9], 1, "w", "U")]), epoch=4, lsn_col="lsn")
    assert "b" not in {r3["doc_id"] for r3 in t.read().collect()}


def test_two_tier_compaction_policy(spark, tmp_path):
    """With minor_compact_threshold=2 and compact_threshold=100, repeated
    merges keep deltas folded by MINOR compaction only — base stays empty
    and per-bucket delta count stays bounded while state stays exact."""
    from multi_table_plugins_spark.lakehouse.table import LakeTable
    from multi_table_plugins_spark.schemas import TARGET_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2,
        compact_threshold=100, minor_compact_threshold=2,
    )
    mk = lambda lsn, k, tok: spark.createDataFrame(  # noqa: E731
        [(lsn, k, [tok], 1, "w", "U")],
        "lsn long, doc_id string, tokens array<int>, n_tok int, source string, op string",
    )
    for i in range(6):
        t.merge_into(mk(i + 1, f"k{i % 3}", i), epoch=i + 1)
    m = t.manifest()
    assert all(len(v.get("base", [])) == 0 for v in m["buckets"].values())
    assert all(len(v.get("delta", [])) <= 2 for v in m["buckets"].values())
    state = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert state == {"k0": [3], "k1": [4], "k2": [5]}


def test_salted_lww_collapses_exact_redelivery(spark):
    """An at-least-once feed redelivering the same (key, lsn) event twice
    must still yield exactly one row per key."""
    from multi_table_plugins_spark.operators.skew import salted_lww_dedup

    df = spark.createDataFrame(
        [(7, 1, "a"), (7, 1, "a"), (5, 1, "b"), (3, 2, "c"), (3, 2, "c")],
        "lsn long, key long, payload string",
    )
    got = salted_lww_dedup(df, key="key", lsn_col="lsn", payload_cols=["payload"]).collect()
    assert sorted((r["key"], r["payload"], r["lsn"]) for r in got) == [
        (1, "a", 7),
        (2, "c", 3),
    ]
