import duckdb

from multi_table_plugins_spark.feed import FeedSpec, generate_feed, expected_final_state


def test_feed_deterministic(tmp_path):
    spec = FeedSpec(n_events=2_000, n_tables=3, keys_per_table=100, n_files=4, seed=7)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    generate_feed(d1, spec)
    generate_feed(d2, spec)
    h1 = duckdb.sql(
        f"select count(*), sum(lsn), md5(string_agg(doc_id, '' order by lsn)) from parquet_scan('{d1}/*.parquet')"
    ).fetchone()
    h2 = duckdb.sql(
        f"select count(*), sum(lsn), md5(string_agg(doc_id, '' order by lsn)) from parquet_scan('{d2}/*.parquet')"
    ).fetchone()
    assert h1 == h2
    assert h1[0] == 2_000


def test_feed_shape_and_ops(tmp_path):
    d = str(tmp_path / "f")
    generate_feed(d, FeedSpec(n_events=1_000, n_files=2))
    row = duckdb.sql(
        f"""select
              count(*) filter (op='D' and tokens is not null),
              count(*) filter (op<>'D' and tokens is null),
              count(distinct table_name),
              max(lsn), min(lsn)
           from parquet_scan('{d}/*.parquet')"""
    ).fetchone()
    assert row[0] == 0  # deletes carry no payload
    assert row[1] == 0  # upserts always carry payload
    assert row[2] == 4
    assert (row[3], row[4]) == (1_000, 1)


def test_expected_final_state_oracle(tmp_path):
    d = str(tmp_path / "f")
    generate_feed(d, FeedSpec(n_events=500, n_tables=2, keys_per_table=20, n_files=2))
    state = expected_final_state(d)
    assert set(state) <= {"t00", "t01"}
    for t, pdf in state.items():
        # one row per key, no deletes survive
        assert pdf["doc_id"].is_unique
        assert (pdf["op"] != "D").all()
