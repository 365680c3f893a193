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
    """Read many tables as one tagged stream or a dict of frames.

    ``backend="parquet"`` (default) discovers ``<directory>/<t>.parquet``
    tables; ``backend="jdbc"`` plans partitioned ``spark.read.jdbc``
    reads instead (see sources/jdbc.py) — ``jdbc_conf`` must carry
    ``url`` (+ optional driver/user/password/fetch_size/splits) and
    ``tables`` (the table list; live metadata enumeration needs a
    reachable server, which this sandbox does not have)."""

    def __init__(
        self,
        spark: SparkSession,
        directory: str | None = None,
        allow_list: tuple[str, ...] = (),
        block_list: tuple[str, ...] = (),
        name_pattern: str | None = None,
        where: str | None = None,
        table_name_field: str = "tablename",
        backend: str = "parquet",
        jdbc_conf: dict | None = None,
    ):
        self.spark = spark
        self.directory = directory
        self.backend = backend
        self.where = where
        self.field = table_name_field
        self._jdbc = None
        if backend == "jdbc":
            from .jdbc import JdbcMultiTableSource

            conf = dict(jdbc_conf or {})
            tables = conf.pop("tables", [])
            self._jdbc = JdbcMultiTableSource(
                spark,
                where_clause=f"WHERE {where}" if where else None,
                allow_list=allow_list,
                block_list=block_list,
                **conf,
            )
            self.tables = self._jdbc.discover(list(tables))
        elif backend == "parquet":
            self.tables = discover_parquet_tables(
                directory,
                allow_list=allow_list,
                block_list=block_list,
                name_pattern=name_pattern,
            )
        else:
            raise ValueError(f"unknown backend {backend!r}")

    def schema_of(self, table: str):
        """Schema inference 'probe' — parquet footer read (or the remote
        ``WHERE 1=0`` probe Spark's JDBC source performs), zero data IO."""
        return self.read_table(table).schema

    def read_table(self, table: str) -> DataFrame:
        if self._jdbc is not None:
            from .jdbc import JdbcTableSpec

            return self._jdbc.read_table(JdbcTableSpec(table=table))
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


def text_fraction_expr(col, max_chars: int = 8):
    """Map a string to a fraction in [0, 1) by base-256 interpolation over
    its first ``max_chars`` character codes — the same idea as Hadoop's
    TextSplitter (strings as base-N fractions), kept to plain ASCII
    arithmetic so it is reproducible in ANSI SQL.

    ``ascii()`` returns the full Unicode codepoint of the first character
    (can exceed 255), which would break the base-256 positional weights —
    frac() would stop being monotone in lexicographic order and split
    ranges could overlap. Codes are clamped to 255, so all non-ASCII
    characters collapse to one top-of-range code: coverage of [0, n)
    and per-position monotonicity always hold; ORDER fidelity between
    distinct non-ASCII characters is not preserved (documented ASCII
    assumption, same as Hadoop's TextSplitter ASCII warning)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(0.0)
    for i in range(1, max_chars + 1):
        code = F.when(
            F.length(c) >= i,
            F.least(F.ascii(F.substring(c, i, 1)), F.lit(255)),
        ).otherwise(F.lit(0))
        out = out + code.cast("double") / F.lit(float(256 ** i))
    return out


def assign_range_splits(df: DataFrame, pk: str, num_splits: int) -> DataFrame:
    """Assign each row its PK-range split id, reproducing the typed
    splitter dispatch of MultiTableDBInputFormat.java:217-251 (integer /
    date / float / decimal / boolean / text DBSplitters): equal-width
    ranges over [min, max], last range closed. Adds ``split_id``.

    Type dispatch (worked example docs/MultiTableDatabase-batchsource.md:
    148-153 is the integer case):
      * integral — width ``(hi - lo + 1) / n`` over the closed int range
      * date / timestamp — converted to epoch days / seconds, then the
        integer splitter (Hadoop DateSplitter semantics)
      * float / double / decimal — continuous width ``(hi - lo) / n``
        (BigDecimalSplitter semantics; decimals interpolate as double)
      * boolean — two splits: false -> 0, true -> min(1, n-1)
      * string — base-256 fraction interpolation over the first 8 chars
        (TextSplitter semantics), equal-width over [frac(lo), frac(hi)]

    In Spark this is informational (Spark parallelizes scans itself); it
    exists for parity tests and for routing work by range."""
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    dt = df.schema[pk].dataType
    col = F.col(pk)

    if isinstance(dt, BooleanType):
        sid = F.when(col, F.lit(min(1, num_splits - 1))).otherwise(F.lit(0))
        return df.withColumn("split_id", sid.cast("int"))

    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        val, closed = col.cast("long"), True
    elif isinstance(dt, DateType):
        # epoch days, then the integer splitter
        val, closed = F.datediff(col, F.lit("1970-01-01")).cast("long"), True
    elif isinstance(dt, (TimestampType, TimestampNTZType)):
        # epoch seconds, then the integer splitter (NTZ must route through
        # TIMESTAMP — session TZ is pinned UTC — before the long cast)
        val, closed = col.cast("timestamp").cast("long"), True
    elif isinstance(dt, (FloatType, DoubleType, DecimalType)):
        val, closed = col.cast("double"), False
    elif isinstance(dt, StringType):
        val, closed = text_fraction_expr(pk), False
    else:
        raise TypeError(f"no range splitter for PK type {dt.simpleString()!r}")

    row = df.select(val.alias("_v")).agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi")
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None or hi == lo:
        return df.withColumn("split_id", F.lit(0))
    width = (hi - lo + (1 if closed else 0)) / num_splits
    sid = F.least(
        F.floor((val - F.lit(lo)) / F.lit(width)).cast("int"),
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
