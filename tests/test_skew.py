from pyspark.sql import functions as F

from multi_table_plugins_spark.operators.skew import salted_lww_dedup


def test_salted_dedup_matches_plain(spark):
    # hot key "h" gets 10k versions; result must equal plain argmax-by-lsn
    rows = [(i, "h" if i % 2 == 0 else f"k{i % 37}", f"v{i}") for i in range(10_000)]
    df = spark.createDataFrame(rows, "lsn long, doc_id string, val string")
    salted = salted_lww_dedup(df, "doc_id", "lsn", ["val"], salt_buckets=8)
    plain = (
        df.groupBy("doc_id")
        .agg(
            F.max_by(F.struct("val"), F.col("lsn")).alias("_p"),
            F.max("lsn").alias("lsn"),
        )
        .select("doc_id", "_p.*", "lsn")
    )
    got = {r["doc_id"]: (r["val"], r["lsn"]) for r in salted.collect()}
    want = {r["doc_id"]: (r["val"], r["lsn"]) for r in plain.collect()}
    assert got == want
    assert got["h"] == ("v9998", 9998)
