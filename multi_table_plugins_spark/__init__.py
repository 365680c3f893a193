"""multi_table_plugins_spark — a PySpark-native multi-table CDC/ingest engine.

A from-scratch re-expression of the capabilities of CDAP
``data-integrations/multi-table-plugins`` (reference at /root/reference):
multi-table discovery + tagged fan-in (MultiTableDBSource.java:61-66),
table-name routing fan-out (RecordFilterOutputFormat.java:121-138),
dynamic per-table sinks with run-time partitioning
(DynamicMultiFilesetSink.java:70-104), a three-mode error channel
(MultiTableDBSource.java:135-154), and lineage emission
(MultiTableDBSource.java:176-187) — lifted from batch MapReduce to a
Structured-Streaming CDC engine with Iceberg-semantics tables,
last-writer-wins MERGE by log-sequence-number, schema evolution,
exactly-once replay, and explicit skew handling.

Everything here is idiomatic Spark DataFrame code: Catalyst plans the
scans/joins/aggregations; Python only orchestrates.
"""

__version__ = "0.1.0"
