"""JDBC backend for the multi-table source — the seam that reads real
databases, the reference's raison d'être (MultiTableDBSource.java:61-66).

Spark's own JDBC data source replaces all of the reference's Hadoop
plumbing (driver shims, fetch-size connection wrappers, record readers):
``spark.read.jdbc`` probes the schema, pushes predicates, and
parallelizes with ``partitionColumn/lowerBound/upperBound/numPartitions``
— the exact splits-per-table × PK-range model of
MultiTableDBInputFormat.java:110-138. What this module adds is the
reference's *multi-table* orchestration on top: per-table split-query
assembly (DBTableRecordReader.java:169-180 semantics, reproduced
verbatim in :func:`build_split_query` so a user can audit the SQL each
task would run), allow/block filtering, and the tagged fan-in.

The sandbox has no network or database server, so tests cover the
clause assembly and reader-option planning (the driver-side logic);
the ``spark.read.jdbc`` call itself is config-switched behind
``MultiTableSource(backend="jdbc")`` and exercised structurally.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: Hadoop DataDrivenDBInputFormat's placeholder for an open bound
#: (DBTableSplit.java:29)
DEFAULT_CLAUSE = "1=1"


def split_where_clause(lower: str | None, upper: str | None) -> str:
    """The per-split predicate, exactly as DBTableSplit.getWhereClause
    (DBTableSplit.java:77-84): ``(( lo ) AND ( hi ))`` with ``1=1`` for
    an open bound."""
    return "(( %s ) AND ( %s ))" % (
        lower if lower is not None else DEFAULT_CLAUSE,
        upper if upper is not None else DEFAULT_CLAUSE,
    )


def build_split_query(
    table: str,
    where_clause: str | None = None,
    lower: str | None = None,
    upper: str | None = None,
) -> str:
    """The per-task SELECT, exactly as DBTableRecordReader.getQuery
    (DBTableRecordReader.java:169-180): the user's ``where_clause``
    carries its own ``WHERE`` keyword (reference config semantics,
    docs/MultiTableDatabase-batchsource.md:45-49) and the split range is
    ANDed onto it."""
    query = f"SELECT * FROM {table} "
    split = split_where_clause(lower, upper)
    if where_clause:
        return query + where_clause + " AND " + split
    return query + "WHERE " + split


def bounding_vals_query(
    table: str, split_col: str, where_clause: str | None = None
) -> str:
    """The split bounding query, as MultiTableDBInputFormat
    .getBoundingValsQuery (MultiTableDBInputFormat.java:253-257)."""
    q = f"SELECT MIN({split_col}), MAX({split_col}) FROM {table}"
    if where_clause:
        q += " " + where_clause
    return q


@dataclass
class JdbcTableSpec:
    """Resolved read plan for one table: what ``spark.read.jdbc`` needs."""

    table: str
    pk: str | None = None
    lower: int | None = None
    upper: int | None = None
    num_partitions: int = 1


@dataclass
class JdbcMultiTableSource:
    """Multi-table JDBC read planning (config mirrors MultiTableConf).

    ``reader_options(spec)`` returns the exact option dict for
    ``spark.read.format("jdbc")`` — unit-testable without a database;
    ``read_table`` executes it when a server is reachable.
    """

    spark: SparkSession
    url: str
    driver: str | None = None
    user: str | None = None
    password: str | None = None
    where_clause: str | None = None
    fetch_size: int = 1000  # MultiTableConf.java:85-90 default
    splits_per_table: int = 1  # MultiTableConf.java:143-147
    #: per-statement timeout in seconds (MultiTableConf.java:161-163,
    #: applied per statement at DBTableRecordReader.java:76-78); 0/None
    #: = no limit. Maps to Spark JDBC's ``queryTimeout`` read option.
    query_timeout: int | None = None
    #: transaction isolation for the read connection
    #: (TransactionIsolationLevel.java:34-63; the reference defaults to
    #: SERIALIZABLE). Spark's JDBC ``isolationLevel`` option only
    #: applies to WRITES, so reads carry it via ``sessionInitStatement``
    #: (SET TRANSACTION ISOLATION LEVEL ...), the documented seam for
    #: per-connection session setup.
    isolation_level: str | None = None
    #: raw session-init SQL executed on each connection before reading
    #: (composes after the isolation statement when both are set)
    session_init: str | None = None
    allow_list: tuple[str, ...] = ()
    block_list: tuple[str, ...] = ()
    extra_options: dict = field(default_factory=dict)

    _ISOLATION_LEVELS = (
        "READ UNCOMMITTED",
        "READ COMMITTED",
        "REPEATABLE READ",
        "SERIALIZABLE",
    )

    def discover(self, tables: list[str]) -> list[str]:
        """Allow/block filtering over a discovered table list
        (MultiTableDBInputFormat.java:94-100). The list itself comes from
        JDBC metadata at run time; injectable here for tests."""
        out = [
            t
            for t in tables
            if t not in self.block_list
            and (not self.allow_list or t in self.allow_list)
        ]
        return sorted(out)

    def reader_options(self, spec: JdbcTableSpec) -> dict:
        """Options for one table's partitioned JDBC read. With a PK and
        bounds, Spark generates the same N range predicates the
        reference's typed splitters produce; ``dbtable`` is a derived
        subquery when a WHERE clause pushes down."""
        if self.where_clause:
            # push the user's WHERE into the remote scan, like
            # DBTableRecordReader.getQuery - Spark requires a subquery.
            # The alias must be a bare identifier: schema-qualified names
            # ("db.users") would make "db.users_flt" invalid SQL.
            alias = spec.table.replace(".", "_").replace('"', "") + "_flt"
            dbtable = f"(SELECT * FROM {spec.table} {self.where_clause}) {alias}"
        else:
            dbtable = spec.table
        opts = {
            "url": self.url,
            "dbtable": dbtable,
            "fetchsize": str(self.fetch_size),
        }
        if self.query_timeout:
            # seconds, like the reference's queryTimeoutSeconds
            opts["queryTimeout"] = str(int(self.query_timeout))
        if self.isolation_level and self.session_init:
            # Spark carries ONE sessionInitStatement, executed via a
            # single Statement.execute(); joining two statements with
            # ';' fails on drivers that reject multi-statement strings
            # (MySQL Connector/J default allowMultiQueries=false). Make
            # the composition the caller's explicit, dialect-aware
            # choice instead of silently producing a string that breaks
            # every partition read.
            raise ValueError(
                "isolation_level and session_init both set: Spark's JDBC "
                "source accepts a single sessionInitStatement and many "
                "drivers reject multi-statement strings — fold the "
                "isolation SET into session_init in your dialect (e.g. "
                "session_init='SET TRANSACTION ISOLATION LEVEL "
                "SERIALIZABLE; ...' where the driver allows it)"
            )
        if self.isolation_level:
            level = self.isolation_level.upper().replace("_", " ")
            if level not in self._ISOLATION_LEVELS:
                raise ValueError(
                    f"unknown isolation level {self.isolation_level!r}; "
                    f"expected one of {self._ISOLATION_LEVELS}"
                )
            opts["sessionInitStatement"] = (
                f"SET TRANSACTION ISOLATION LEVEL {level}"
            )
        elif self.session_init:
            opts["sessionInitStatement"] = self.session_init
        if self.driver:
            opts["driver"] = self.driver
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if spec.pk and spec.num_partitions > 1:
            if spec.lower is None or spec.upper is None:
                raise ValueError(
                    f"partitioned read of {spec.table!r} needs lower/upper "
                    f"bounds for {spec.pk!r} (run bounding_vals_query)"
                )
            opts.update(
                partitionColumn=spec.pk,
                lowerBound=str(spec.lower),
                upperBound=str(spec.upper),
                numPartitions=str(spec.num_partitions),
            )
        opts.update({k: str(v) for k, v in self.extra_options.items()})
        return opts

    def read_table(self, spec: JdbcTableSpec) -> DataFrame:
        reader = self.spark.read.format("jdbc")
        for k, v in self.reader_options(spec).items():
            reader = reader.option(k, v)
        return reader.load()
