"""Multi-table batch source: discover N tables, read them all in one job,
tag every row, optionally push a WHERE clause into every scan.

This is the Spark-native MultiTableDBSource (MultiTableDBSource.java:61-66):
  * discovery + allow/block (MultiTableDBInputFormat.java:84-100) →
    :func:`catalog.discover_parquet_tables` over a directory of parquet
    tables (or an explicit dict of DataFrames).
  * schema inference probe (``SELECT * WHERE 1=0``,
    MultiTableDBInputFormat.java:274-280) → free: `spark.read.parquet`
    reads footer metadata, no data scan.
  * per-table WHERE pushdown (DBTableRecordReader.java:169-180) →
    ``df.filter(expr(where))``; Catalyst pushes predicates into the
    parquet scan (visible as PushedFilters in explain).
  * PK-range parallel splits (MultiTableDBInputFormat.java:110-138) →
    Spark's own file splitting; :func:`split_bounds` reproduces the
    MIN/MAX bounding query and :func:`assign_range_splits` the typed
    range-splitter, exposed because downstream users route work by them.
  * tagged fan-in (DBTableRecordReader.java:83-85) → router.union_tagged.

Custom-SQL mode (MultiSQLStatementInputFormat.java:56-123): each
statement runs through ``spark.sql`` — Catalyst is the "remote database"
— and its result is tagged with the derived table name
(SQLStatementRecordReader.java:173-204 rules).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import derive_table_name, discover_parquet_tables, split_statements
from ..operators.router import union_tagged


class MultiTableSource:
    """Read many parquet tables as one tagged stream or a dict of frames."""

    def __init__(
        self,
        spark: SparkSession,
        directory: str,
        allow_list: tuple[str, ...] = (),
        block_list: tuple[str, ...] = (),
        name_pattern: str | None = None,
        where: str | None = None,
        table_name_field: str = "tablename",
    ):
        self.spark = spark
        self.directory = directory
        self.tables = discover_parquet_tables(
            directory,
            allow_list=allow_list,
            block_list=block_list,
            name_pattern=name_pattern,
        )
        self.where = where
        self.field = table_name_field

    def schema_of(self, table: str):
        """Schema inference 'probe' — parquet footer read, zero data IO."""
        return self.read_table(table).schema

    def read_table(self, table: str) -> DataFrame:
        df = self.spark.read.parquet(os.path.join(self.directory, f"{table}.parquet"))
        if self.where:
            df = df.filter(F.expr(self.where))
        return df

    def read_all(self) -> dict[str, DataFrame]:
        return {t: self.read_table(t) for t in self.tables}

    def read_union(self) -> DataFrame:
        """The tagged multi-table mixed stream (S9)."""
        return union_tagged(self.read_all(), self.field)


def split_bounds(df: DataFrame, pk: str) -> tuple:
    """The reference's split bounding query ``SELECT MIN(pk), MAX(pk)``
    (MultiTableDBInputFormat.java:253-257) — one partial-aggregated scan."""
    row = df.agg(F.min(pk).alias("lo"), F.max(pk).alias("hi")).collect()[0]
    return row["lo"], row["hi"]


def assign_range_splits(df: DataFrame, pk: str, num_splits: int) -> DataFrame:
    """Assign each row its PK-range split id, reproducing the integer
    splitter semantics of MultiTableDBInputFormat.java:191-251: equal-width
    ranges over [min, max], last range closed. Adds ``split_id``.

    In Spark this is informational (Spark parallelizes scans itself); it
    exists for parity tests and for routing work by range."""
    lo, hi = split_bounds(df, pk)
    width = (int(hi) - int(lo) + 1) / num_splits
    sid = F.least(
        F.floor((F.col(pk) - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(num_splits - 1),
    )
    return df.withColumn("split_id", sid)


def run_sql_statements(
    spark: SparkSession,
    raw_statements: str,
    aliases: str = "",
    views: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    r"""Custom-SQL mode: ``;``-separated statements (``\;`` escaped), each
    executed by Catalyst, keyed by derived table name. ``aliases`` is the
    ``;``-separated alias list, right-padded with "" like
    MultiSQLStatementInputFormat.java:73-97."""
    for name, df in (views or {}).items():
        df.createOrReplaceTempView(name)
    stmts = split_statements(raw_statements)
    alias_list = [a.strip() for a in aliases.split(";")] if aliases else []
    alias_list += [""] * (len(stmts) - len(alias_list))
    out: dict[str, DataFrame] = {}
    for i, stmt in enumerate(stmts):
        name = derive_table_name(stmt, alias_list[i] or None, i)
        out[name] = spark.sql(stmt)
    return out
