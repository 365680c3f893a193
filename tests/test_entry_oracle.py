"""Replicates the driver's correctness gate locally: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB — row count + column names + order-insensitive value hash."""

import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    import math
    from datetime import datetime

    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # %.10g, NOT %.6g: the driver's hash caught a 4th-decimal
        # disagreement on a value >= 1000 that six *significant* digits
        # normalized away (round-3 sessionization finding). Keep the
        # local gate at least as strict as the driver's.
        return f"{v:.10g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def con():
    return _duck()


QUERY_NAMES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, con, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    cur = con.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rows {len(srows)} vs {len(orows)}"
    sh = _value_hash(srows, scols)
    oh = _value_hash(orows, ocols)
    if sh != oh:
        # show a few diffs for debugging
        sset = {tuple(_norm_cell(c) for c in r) for r in srows}
        oset = {tuple(_norm_cell(c) for c in r) for r in orows}
        only_s = list(sset - oset)[:3]
        only_o = list(oset - sset)[:3]
        pytest.fail(f"{name}: value hash mismatch\n spark-only={only_s}\n oracle-only={only_o}")


def test_rows_only_queries_run(spark):
    for name, q in entrymod.queries().items():
        if name in entrymod.oracle_sql():
            continue
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"doc_id", "tokens", "n_tok", "source"} <= set(df.columns)
