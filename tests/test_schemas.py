import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from multi_table_plugins_spark.schemas import (
    SchemaEvolutionError,
    merge_schemas,
    merge_types,
)


def test_widen_int_to_long():
    assert merge_types(IntegerType(), LongType()) == LongType()
    assert merge_types(LongType(), IntegerType()) == LongType()


def test_widen_float_double():
    assert merge_types(FloatType(), DoubleType()) == DoubleType()
    assert merge_types(IntegerType(), FloatType()) == DoubleType()


def test_array_element_widening():
    assert merge_types(ArrayType(IntegerType()), ArrayType(LongType())) == ArrayType(
        LongType()
    )


def test_incompatible_raises():
    with pytest.raises(SchemaEvolutionError):
        merge_types(StringType(), IntegerType())


def test_merge_schemas_add_and_widen():
    old = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("n_tok", IntegerType(), True),
        ]
    )
    new = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("n_tok", LongType(), True),
            StructField("lang", StringType(), True),
        ]
    )
    merged = merge_schemas(old, new)
    assert [f.name for f in merged.fields] == ["doc_id", "n_tok", "lang"]
    assert merged["n_tok"].dataType == LongType()
    # column missing from incoming batch becomes nullable
    dropped = merge_schemas(old, StructType([StructField("doc_id", StringType(), False)]))
    assert dropped["n_tok"].nullable is True
