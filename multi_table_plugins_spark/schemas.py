"""Data model: change-feed envelope, target table shape, error schema,
and schema-merge (evolution) rules.

Reference analogs:
  * tagged multi-table row stream — ``tablename`` field appended per row
    (DBTableRecordReader.java:83-85); here it is a first-class
    ``table_name`` column of the change-feed envelope.
  * dynamic schema registry — pipeline args ``multisink.<table>``
    (MultiTableDBSource.java:164-170); here the lakehouse manifest holds
    the authoritative schema and :func:`merge_schemas` evolves it.
  * JDBC type widening (DBTypes.java:84-94 widens TINYINT/SMALLINT→INT,
    special-cases unsigned BIGINT→DECIMAL); here :func:`merge_types`
    implements the safe-widening lattice int→long→double, float→double,
    decimal precision growth.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    ByteType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    DataType,
)

# ---------------------------------------------------------------------------
# Canonical shapes (FIXTURES.md §1-2, BASELINE.json input_hint)
# ---------------------------------------------------------------------------

#: Change-feed (binlog/WAL) envelope — one row per change event.
CHANGE_FEED_SCHEMA = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("table_name", StringType(), False),
        StructField("op", StringType(), False),  # 'I' | 'U' | 'D'
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),  # null for 'D'
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

#: User-visible schema of every CDC target table.
TARGET_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)

#: Engine bookkeeping columns persisted in data files but hidden on read.
LSN_COL = "_lsn"
DELETED_COL = "_deleted"
BOOKKEEPING_COLS = (LSN_COL, DELETED_COL)

#: Envelope columns that are routing/ordering metadata, not payload.
ENVELOPE_META_COLS = ("lsn", "table_name", "op", "ts")

#: Error-record schema (ErrorSchema.java:29-57).
ERROR_SCHEMA = StructType(
    [
        StructField("reference_name", StringType(), False),
        StructField("error_message", StringType(), True),
        StructField("exception_class_name", StringType(), True),
        StructField("table_name", StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Schema evolution
# ---------------------------------------------------------------------------

# Safe widening lattice. Key widens to value-set members.
_NUMERIC_RANK = {
    ByteType(): 0,
    ShortType(): 1,
    IntegerType(): 2,
    LongType(): 3,
    FloatType(): 4,  # float widens to double only (rank used within floats)
    DoubleType(): 5,
}

_INTEGRAL = {ByteType(), ShortType(), IntegerType(), LongType()}
_FRACTIONAL = {FloatType(), DoubleType()}


class SchemaEvolutionError(ValueError):
    """Raised when an incoming type cannot be safely merged."""


def merge_types(old: DataType, new: DataType, path: str = "") -> DataType:
    """Return the widened type covering both ``old`` and ``new``.

    Widening rules (one-way, lossless): integral → wider integral,
    integral → double, float → double, decimal(p1,s) + decimal(p2,s) →
    decimal(max,s). Anything else must match exactly.
    """
    if old == new:
        return old
    if old in _INTEGRAL and new in _INTEGRAL:
        return old if _NUMERIC_RANK[old] >= _NUMERIC_RANK[new] else new
    if (old in _INTEGRAL or old in _FRACTIONAL) and (
        new in _INTEGRAL or new in _FRACTIONAL
    ):
        # mixing integral and fractional (or float/double) → double
        if old in _FRACTIONAL and new in _FRACTIONAL:
            return DoubleType()
        return DoubleType()
    if isinstance(old, DecimalType) and isinstance(new, DecimalType):
        if old.scale == new.scale:
            return DecimalType(max(old.precision, new.precision), old.scale)
        raise SchemaEvolutionError(
            f"incompatible decimal scales at {path!r}: {old} vs {new}"
        )
    if isinstance(old, ArrayType) and isinstance(new, ArrayType):
        return ArrayType(
            merge_types(old.elementType, new.elementType, path + "[]"),
            old.containsNull or new.containsNull,
        )
    if isinstance(old, MapType) and isinstance(new, MapType):
        return MapType(
            merge_types(old.keyType, new.keyType, path + "<key>"),
            merge_types(old.valueType, new.valueType, path + "<val>"),
            old.valueContainsNull or new.valueContainsNull,
        )
    if isinstance(old, StructType) and isinstance(new, StructType):
        return merge_schemas(old, new, path + ".")
    raise SchemaEvolutionError(f"incompatible types at {path!r}: {old} vs {new}")


def merge_schemas(old: StructType, new: StructType, path: str = "") -> StructType:
    """Merge an incoming schema into the current table schema.

    Added columns append (nullable); shared columns widen via
    :func:`merge_types`; columns missing from ``new`` stay (null-filled on
    write). Mirrors Iceberg ``mergeSchema`` / the reference's re-derive-
    per-run behavior (MultiTableDBInputFormat.java:98) made monotonic.
    """
    by_name = {f.name: f for f in new.fields}
    fields: list[StructField] = []
    for f in old.fields:
        if f.name in by_name:
            nf = by_name.pop(f.name)
            merged = merge_types(f.dataType, nf.dataType, path + f.name)
            fields.append(StructField(f.name, merged, f.nullable or nf.nullable))
        else:
            # absent from incoming batch → becomes nullable
            fields.append(StructField(f.name, f.dataType, True))
    for f in new.fields:  # additions, in incoming order
        if f.name in by_name:
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)


def schema_from_json(s: str) -> StructType:
    import json

    return StructType.fromJson(json.loads(s))


def payload_schema_of_changes(change_schema: StructType) -> StructType:
    """User-payload schema carried by a change-feed frame: envelope minus
    routing/ordering metadata (``lsn/table_name/op/ts``)."""
    return StructType(
        [f for f in change_schema.fields if f.name not in ENVELOPE_META_COLS]
    )
