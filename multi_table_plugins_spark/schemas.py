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
    byte/short/int → double (exact: |int| < 2^53), float → double,
    decimal(p1,s) + decimal(p2,s) → decimal(max,s). LONG mixed with a
    fractional type is REJECTED — double has 53 mantissa bits, so
    long → double silently corrupts values above 2^53 (Iceberg's
    promotion rules likewise only allow int → long and float → double).
    Anything else must match exactly.
    """
    if old == new:
        return old
    if old in _INTEGRAL and new in _INTEGRAL:
        return old if _NUMERIC_RANK[old] >= _NUMERIC_RANK[new] else new
    if (old in _INTEGRAL or old in _FRACTIONAL) and (
        new in _INTEGRAL or new in _FRACTIONAL
    ):
        if LongType() in (old, new):
            raise SchemaEvolutionError(
                f"refusing lossy widening at {path!r}: {old} + {new} "
                "(long -> double corrupts values above 2^53)"
            )
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


def jdbc_type_to_spark(
    sql_type: str,
    precision: int | None = None,
    scale: int | None = None,
    signed: bool = True,
) -> DataType:
    """JDBC/SQL type name → Spark type, the DBTypes.java:73-135 mapping
    restated for Spark (SURVEY §1.2 table):

      * TINYINT/SMALLINT/INTEGER widen to INT (DBTypes.java:84-87)
      * signed BIGINT → LONG; unsigned BIGINT → DECIMAL(p,s) for
        overflow safety (DBTypes.java:89-94)
      * NUMERIC/DECIMAL require precision > 0 (DBTypes.java:100-102)
      * TIME → LONG micros since midnight (TIME_MICROS,
        DBTypes.java:108-109 — Spark has no TIME type)
      * TIMESTAMP → TimestampType in UTC (DBTypes.java:110-111)
      * ARRAY/STRUCT/REF are rejected like the reference
        (DBTypes.java:129-133); our engine's token arrays enter through
        the change-feed envelope, not a JDBC scan.
    """
    from pyspark.sql.types import BinaryType, BooleanType, DateType

    t = sql_type.strip().upper()
    if t in ("BOOLEAN", "BIT"):
        return BooleanType()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "INT"):
        return IntegerType()
    if t == "BIGINT":
        if signed:
            return LongType()
        if not precision:
            raise SchemaEvolutionError("unsigned BIGINT needs a precision")
        return DecimalType(precision, scale or 0)
    if t in ("REAL", "FLOAT"):
        return FloatType()
    if t == "DOUBLE":
        return DoubleType()
    if t in ("NUMERIC", "DECIMAL"):
        if not precision or precision <= 0:
            raise SchemaEvolutionError(
                f"{t} with undefined precision is not supported "
                "(DBTypes.java:137-147 rejects precision 0)"
            )
        return DecimalType(precision, scale or 0)
    if t == "DATE":
        return DateType()
    if t == "TIME":
        return LongType()  # micros since midnight (TIME_MICROS)
    if t == "TIMESTAMP":
        return TimestampType()
    if t in ("CHAR", "VARCHAR", "LONGVARCHAR", "CLOB", "NCHAR", "NVARCHAR", "NCLOB"):
        return StringType()
    if t in ("BINARY", "VARBINARY", "LONGVARBINARY", "BLOB"):
        return BinaryType()
    raise SchemaEvolutionError(f"unsupported SQL type {sql_type!r}")


def time_to_micros(hours: int, minutes: int, seconds: int, micros: int = 0) -> int:
    """TIME-of-day → the TIME_MICROS long the engine stores
    (DBTypes.java:163-164 read path)."""
    return ((hours * 60 + minutes) * 60 + seconds) * 1_000_000 + micros


def schema_from_json(s: str) -> StructType:
    import json

    return StructType.fromJson(json.loads(s))


def payload_schema_of_changes(change_schema: StructType) -> StructType:
    """User-payload schema carried by a change-feed frame: envelope minus
    routing/ordering metadata (``lsn/table_name/op/ts``)."""
    return StructType(
        [f for f in change_schema.fields if f.name not in ENVELOPE_META_COLS]
    )
