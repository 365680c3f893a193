from pyspark.sql import functions as F

from multi_table_plugins_spark.catalog import (
    derive_table_name,
    discover_tables,
    lake_fqn,
    split_statements,
)
from multi_table_plugins_spark.operators.router import route, route_all, union_tagged


def test_discover_allow_block():
    # MultiTableDBInputFormat.java:94-100 semantics
    cands = ["MULTI1", "MULTI2", "MULTI3", "BLACKLIST1", "BLACKLIST2"]
    assert discover_tables(cands, block_list=["BLACKLIST1", "BLACKLIST2"]) == [
        "MULTI1",
        "MULTI2",
        "MULTI3",
    ]
    assert discover_tables(cands, allow_list=["MULTI1"], block_list=["BLACKLIST1"]) == [
        "MULTI1"
    ]
    assert discover_tables(cands, name_pattern="MULTI*") == ["MULTI1", "MULTI2", "MULTI3"]


def test_derive_table_name_rules():
    # SQLStatementRecordReader.java:173-204: alias > tables '_'-joined
    # first-appearance (deduped) > sql_statement_<i>
    assert derive_table_name("select * from users", "mytbl", 0) == "mytbl"
    assert (
        derive_table_name(
            "select * from users u join comments c on u.id=c.uid", None, 0
        )
        == "users_comments"
    )
    assert (
        derive_table_name("select * from users u join users v on 1=1", None, 0)
        == "users"
    )
    assert derive_table_name("select 1", None, 3) == "sql_statement_3"
    assert derive_table_name("select * from db.schema.users", None, 0) == "users"


def test_split_statements_escaping():
    # MultiTableConfTest.java:26-39 semantics
    assert split_statements("select 1; select 2") == ["select 1", "select 2"]
    assert split_statements(r"select 'a\;b' from t; select 2") == [
        "select 'a;b' from t",
        "select 2",
    ]
    assert split_statements("  ;; select 1 ;") == ["select 1"]


def test_lake_fqn():
    assert lake_fqn("/w", "t1") == "lake:///w/t1"


def test_union_tagged_and_route(spark):
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([(2, "y", 5.0)], "id int, name string, score double")
    u = union_tagged({"ta": a, "tb": b})
    assert set(u.columns) == {"id", "name", "score", "tablename"}
    rows = {r["tablename"]: r for r in u.collect()}
    assert rows["ta"]["score"] is None  # null-filled missing column

    ra = route(u, "ta")
    assert "tablename" not in ra.columns
    assert ra.count() == 1

    both = route_all(u)
    assert sorted(both) == ["ta", "tb"]
    assert both["tb"].filter(F.col("score") == 5.0).count() == 1
