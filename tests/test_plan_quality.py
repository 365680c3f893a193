"""Physical-plan assertions: the plans Catalyst picks are the plans we
designed for — no Python in hot paths, minimal exchanges, broadcast where
a side is small, pushdown reaching the scan. These guard against silent
plan regressions that would only show up at 100x data."""

from pyspark.sql import functions as F

from multi_table_plugins_spark.functions.textfns import doc_fingerprint, lang_id
from multi_table_plugins_spark.operators.similarity import cosine_topk
from multi_table_plugins_spark.schemas import DELETED_COL, LSN_COL

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cdc_write_plan_single_exchange_no_sort(spark):
    """The fast-path delta write: scan → project/filter → ONE exchange
    (repartition on table+bucket) → write. No sort (concurrent writers),
    no aggregate, no Python."""
    df = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
        "cast(l_orderkey as string) as doc_id",
        "array(l_linenumber) as tokens",
        "l_linenumber as n_tok",
        "'x' as source",
        "l_orderkey as lsn",
        "'I' as op",
        "'t0' as table_name",
    )
    norm = (
        df.withColumn(LSN_COL, F.col("lsn"))
        .withColumn(DELETED_COL, F.col("op") == "D")
        .withColumn("_table", F.col("table_name"))
        .withColumn("_bucket", F.pmod(F.hash("doc_id"), F.lit(16)))
        .repartition(F.col("_table"), F.col("_bucket"))
    )
    p = _plan(norm)
    assert p.count("Exchange") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Sort" not in p


def test_text_ops_stay_jvm_side(spark):
    from multi_table_plugins_spark.functions.textfns import token_count

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # fingerprint/lang-id build higher-order-function expressions: JVM-
    # evaluated (no Python), though HOF lambdas opt out of codegen
    p = _plan(docs.select(doc_fingerprint("text"), lang_id("text")))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # plain regexp expressions stay inside WholeStageCodegen ("*(n)" spans)
    p2 = _plan(docs.select(token_count("text")))
    assert "*(1)" in p2 and "EvalPython" not in p2


def test_cosine_topk_broadcasts_queries(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cosine_topk(emb.filter("vec_id < 3"), emb, k=5)
    p = _plan(out)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "BatchEvalPython" not in p


def test_filter_and_projection_pushed_to_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter("l_quantity < 5").select("l_orderkey", "l_quantity")
    p = _plan(q)
    assert "PushedFilters: [" in p and "l_quantity" in p.split("PushedFilters")[1][:200]
    # column pruning: ReadSchema carries only the two needed columns
    rs = p.split("ReadSchema")[1][:200]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_lww_dedup_uses_partial_aggregation(spark):
    """Keys-only argmax is a HashAggregate with a partial stage (map-side
    combine) — not a sort-based fallback."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    agg = ev.groupBy("user_id").agg(F.max("event_id").alias("m"))
    p = _plan(agg)
    assert "HashAggregate" in p
    assert "SortAggregate" not in p


def test_minhash_md5_pipeline_no_python_no_cartesian(spark):
    """The oracle-parity md5 MinHash path must keep the same plan shape
    as the murmur path: hash evaluation in JVM expressions, candidate
    join keyed on (band, band-hash), never a cartesian product."""
    from multi_table_plugins_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signatures(docs, num_hashes=8, hash_fn="md5")
    pairs = lsh_candidate_pairs(
        sigs, num_bands=4, threshold=0.3, num_hashes=8, band_hash="md5"
    )
    p = _plan(pairs)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    pairs.unpersist()


def test_axis_lsh_ann_bucket_join_no_cartesian(spark):
    from multi_table_plugins_spark.operators.similarity import hyperplane_lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = hyperplane_lsh_topk(
        emb.filter("vec_id < 3"), emb, k=5, n_planes=6, planes="axis"
    )
    p = _plan(out)
    # the only join is keyed on the LSH bucket with the query side
    # broadcast; element_at bucket bits are plain JVM expressions
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p
    assert "EvalPython" not in p


def test_salted_lww_hash_aggregates_only(spark):
    """The skew-proof LWW rewrite is keys-only aggregation (fixed-width
    buffers) + winner join-back — it must plan as HashAggregates with
    map-side partials, never the SortAggregate fallback that
    max_by(struct(<payload>), lsn) forces."""
    from multi_table_plugins_spark.operators.skew import salted_lww_dedup

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = salted_lww_dedup(
        ev, key="user_id", lsn_col="event_id", payload_cols=["event_type"]
    )
    p = _plan(out)
    assert "SortAggregate" not in p
    assert p.count("HashAggregate") >= 4  # 2 stages x (partial + final)


def test_typed_splitter_single_bounds_job_then_projection(spark):
    """assign_range_splits adds one projection — the split-id expression
    must not shuffle or invoke Python."""
    from multi_table_plugins_spark.sources.multi_table import assign_range_splits

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = assign_range_splits(orders, "o_totalprice", 4)
    p = _plan(out)
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_new_curation_ops_stay_jvm_side(spark):
    """dataset_split / sessionize / token shingles: pure JVM expressions
    (no Python eval nodes), and sessionize's only exchange is keyed on
    the user — the plans we designed for, guarded against regression."""
    from multi_table_plugins_spark.functions.tokens import token_shingles
    from multi_table_plugins_spark.operators.curation import dataset_split
    from multi_table_plugins_spark.operators.sessions import sessionize

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    split = docs.select(
        "doc_id",
        dataset_split(doc_fingerprint("text"), {"train": 0.9, "test": 0.1}),
    )
    p = _plan(split)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p  # zero-shuffle expression

    ev = spark.read.parquet(f"{SF}/events.parquet")
    sess = sessionize(ev, "user_id", "ts", 1800, tiebreak=("event_id",))
    p = _plan(sess)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "SinglePartition" not in p
    assert "hashpartitioning(user_id" in p

    toks = ev.select(
        token_shingles(F.array(F.col("event_id"), F.col("user_id")), 2)
    )
    p = _plan(toks)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_text_metrics_battery_is_one_scan_no_python(spark):
    """The consolidated text_metrics battery must plan as ONE parquet
    scan + one projection (no join of the four metric frames, no
    Python) — computing four per-doc metrics in a single pass is the
    point of the consolidation."""
    import __spark_entry__ as entrymod

    df = entrymod.q_text_metrics(spark, SF)
    p = _plan(df)
    assert p.count("Scan parquet") == 1, p
    assert "Exchange" not in p and "Join" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
