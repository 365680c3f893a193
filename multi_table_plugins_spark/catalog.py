"""Table catalog helpers: discovery with allow/block lists, derived
table-name resolution, and lineage FQNs.

Reference parity:
  * allow/block filtering — MultiTableDBInputFormat.java:94-100 (keep a
    table iff not black-listed and (white list empty or contains it)),
    with fnmatch-style patterns standing in for schemaNamePattern /
    tableNamePattern (MultiTableDBInputFormat.java:84-85).
  * derived output-table naming for SQL-statement sources — alias >
    metadata table names joined '_' in first-appearance order > fallback
    ``sql_statement_<i>`` (SQLStatementRecordReader.java:173-204,
    MultiSQLStatementInputFormat.java:46-47,88-94).
  * FQN construction for lineage — FQNGenerator.java:33-74 produced
    ``dbtype://host:port/db.table``; ours is ``lake://<warehouse>/<table>``.
"""

from __future__ import annotations

import fnmatch
import os
import re
from collections import OrderedDict
from collections.abc import Iterable


def discover_tables(
    candidates: Iterable[str],
    allow_list: Iterable[str] = (),
    block_list: Iterable[str] = (),
    name_pattern: str | None = None,
) -> list[str]:
    """Filter the candidate table names the way the reference's source
    enumerates JDBC tables: pattern match, then block list, then allow
    list (empty allow list = everything)."""
    allow, block = set(allow_list), set(block_list)
    out = []
    for t in candidates:
        if name_pattern and not fnmatch.fnmatch(t, name_pattern):
            continue
        if t in block:
            continue
        if allow and t not in allow:
            continue
        out.append(t)
    return out


def discover_parquet_tables(directory: str, **kw) -> list[str]:
    """Enumerate ``<name>.parquet`` entries of a directory as the table
    catalog (the sandbox analog of DatabaseMetaData.getTables)."""
    names = sorted(
        n[: -len(".parquet")]
        for n in os.listdir(directory)
        if n.endswith(".parquet")
    )
    return discover_tables(names, **kw)


_SQL_FROM_RE = re.compile(
    r"\b(?:from|join)\s+([A-Za-z_][A-Za-z0-9_.]*)", re.IGNORECASE
)


def derive_table_name(
    statement: str, alias: str | None, statement_index: int
) -> str:
    """Output-table name for a SQL-statement source entry.

    Priority (SQLStatementRecordReader.java:173-204):
      1. the user alias, if non-empty;
      2. the statement's referenced table names, '_'-joined in first-
         appearance order with duplicates removed (LinkedHashSet order);
      3. fallback ``sql_statement_<i>`` (MultiSQLStatementInputFormat.java:46-47).
    """
    if alias:
        return alias
    seen: "OrderedDict[str, None]" = OrderedDict()
    for m in _SQL_FROM_RE.finditer(statement):
        name = m.group(1).split(".")[-1]
        seen.setdefault(name, None)
    if seen:
        return "_".join(seen.keys())
    return f"sql_statement_{statement_index}"


def split_statements(raw: str) -> list[str]:
    r"""Split a ``;``-delimited statement list honoring ``\;`` escapes
    (MultiTableConf.java:278-287, tested MultiTableConfTest.java:26-39)."""
    out, buf = [], []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == "\\" and i + 1 < len(raw) and raw[i + 1] == ";":
            buf.append(";")
            i += 2
            continue
        if c == ";":
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return out


def lake_fqn(warehouse: str, table: str) -> str:
    """Lineage FQN, e.g. ``lake:///warehouse/t01`` (FQNGenerator analog)."""
    return f"lake://{os.path.abspath(warehouse)}/{table}"
