"""Table-name routing: fan-in tagging and fan-out filtering.

Reference parity:
  * fan-in — every row of every table gets a ``tablename`` STRING column
    (DBTableRecordReader.java:83-85); heterogeneous schemas union into one
    stream (docs/MultiTableDatabase-batchsource.md:155-174).
  * fan-out — the sink passes a record iff ``record[splitField] == t`` and
    then projects the routing field away (RecordFilterOutputFormat.java:
    121-138, 124-131). The reference pays an O(N_tables) string compare
    per record per sink; here routing is a partition-pruned filter that
    Catalyst collapses into the scan, or a single ``partitionBy`` write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tag_table(df: DataFrame, table: str, field: str = "tablename") -> DataFrame:
    """S9: append the routing column."""
    return df.withColumn(field, F.lit(table))


def union_tagged(
    tables: dict[str, DataFrame], field: str = "tablename"
) -> DataFrame:
    """Fan-in: tag each table's frame and union by name, null-filling the
    columns a table lacks — the multi-table mixed stream."""
    out: DataFrame | None = None
    for name, df in tables.items():
        t = tag_table(df, name, field)
        out = t if out is None else out.unionByName(t, allowMissingColumns=True)
    if out is None:
        raise ValueError("no tables to union")
    return out


def route(
    df: DataFrame, table: str, field: str = "tablename", drop_field: bool = True
) -> DataFrame:
    """Fan-out one table's records (R1) and drop the routing field (R2)."""
    out = df.filter(F.col(field) == table)
    return out.drop(field) if drop_field else out


def route_all(df: DataFrame, field: str = "tablename") -> dict[str, DataFrame]:
    """Fan-out to every distinct table present. The distinct() is one
    cheap job over the routing column only (column-pruned scan)."""
    names = [r[0] for r in df.select(field).distinct().collect()]
    return {t: route(df, t, field) for t in sorted(names)}
