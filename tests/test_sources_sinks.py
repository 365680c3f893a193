import os

from pyspark.sql import functions as F

from multi_table_plugins_spark.sources.multi_table import (
    MultiTableSource,
    assign_range_splits,
    run_sql_statements,
    split_bounds,
)
from multi_table_plugins_spark.sinks.multi_sink import read_back, write_multi_table

SF = "/root/testdata/sf0.001"


def test_multi_table_source_discovery_and_union(spark):
    src = MultiTableSource(
        spark, SF, allow_list=("region", "nation"), table_name_field="tablename"
    )
    assert src.tables == ["nation", "region"]
    u = src.read_union()
    assert "tablename" in u.columns
    counts = {r["tablename"]: r["cnt"] for r in u.groupBy("tablename").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"region": 5, "nation": 25}


def test_where_pushdown_reaches_scan(spark):
    src = MultiTableSource(spark, SF, allow_list=("orders",), where="o_orderkey <= 100")
    df = src.read_table("orders")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan
    assert df.count() == df.filter("o_orderkey <= 100").count()


def test_split_bounds_and_assignment(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    lo, hi = split_bounds(df, "o_orderkey")
    assert lo == df.agg(F.min("o_orderkey")).collect()[0][0]
    s = assign_range_splits(df, "o_orderkey", 4)
    got = {r["split_id"] for r in s.select("split_id").distinct().collect()}
    assert got == {0, 1, 2, 3}
    # every row assigned exactly one split; ranges are contiguous by pk
    bounds = (
        s.groupBy("split_id")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .orderBy("split_id")
        .collect()
    )
    for a, b in zip(bounds, bounds[1:]):
        assert a["hi"] < b["lo"]


def test_run_sql_statements_derived_names(spark):
    views = {
        "users": spark.createDataFrame([(1, "sam")], "id int, name string"),
        "comments": spark.createDataFrame([(1, "hi")], "uid int, body string"),
    }
    out = run_sql_statements(
        spark,
        "select * from users; select u.name, c.body from users u join comments c on u.id = c.uid; select 1 as one",
        aliases="",
        views=views,
    )
    assert set(out) == {"users", "users_comments", "sql_statement_2"}
    assert out["users_comments"].collect()[0]["body"] == "hi"
    # alias wins over derivation
    out2 = run_sql_statements(spark, "select * from users", aliases="people", views=views)
    assert set(out2) == {"people"}


def test_multi_sink_roundtrip_with_ingesttime(spark, tmp_path):
    src = MultiTableSource(spark, SF, allow_list=("region", "nation"))
    u = src.read_union().select("tablename", "r_regionkey", "r_name", "n_nationkey", "n_name", "n_regionkey")
    base = str(tmp_path / "out")
    paths = write_multi_table(u, base, ingest_time=12345, fmt="parquet")
    assert sorted(paths) == ["nation", "region"]
    assert os.path.isdir(os.path.join(base, "tablename=region", "ingesttime=12345"))
    back = read_back(spark, base, fmt="parquet")
    assert back.count() == 30
    assert {r["ingesttime"] for r in back.select("ingesttime").distinct().collect()} == {12345}
    # routing field restored as partition column, payload column dropped from files
    region = back.filter(F.col("tablename") == "region")
    assert region.count() == 5


def test_multi_sink_csv_format(spark, tmp_path):
    df = spark.createDataFrame(
        [("t1", 1, "a"), ("t2", 2, "b")], "tablename string, id int, v string"
    )
    base = str(tmp_path / "csv_out")
    write_multi_table(df, base, ingest_time=1, fmt="csv", delimiter="|")
    files = []
    for root, _, fns in os.walk(base):
        files += [os.path.join(root, f) for f in fns if f.endswith(".csv")]
    content = "".join(open(f).read() for f in files)
    assert "1|a" in content and "2|b" in content
