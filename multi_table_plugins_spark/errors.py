"""Three-mode error channel (reference: MultiTableDBSource.java:135-154,
modes in MultiTableConf.java:48-50; error record shape
ErrorSchema.java:29-57; table-granular failure isolation
ErrorCollectingRecordReader.java:58-73).

Modes:
  * ``fail``   — first failing table aborts the whole batch (TableFailureException analog)
  * ``skip``   — failing table's records are dropped, others proceed
  * ``error-port`` — failing table emits ONE structured error row to the
    errors side-output, others proceed; row-level validation failures
    emit one error row per bad record.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schemas import ERROR_SCHEMA

FAIL = "fail"
SKIP = "skip"
ERROR_PORT = "error-port"
MODES = (FAIL, SKIP, ERROR_PORT)


class TableFailure(RuntimeError):
    """A single table's apply failed (format/error/TableFailureException.java)."""

    def __init__(self, table: str, cause: BaseException):
        super().__init__(f"table {table!r} failed: {cause}")
        self.table = table
        self.cause = cause


@dataclass
class ErrorRecord:
    reference_name: str
    error_message: str
    exception_class_name: str
    table_name: str | None = None

    def as_tuple(self):
        return (
            self.reference_name,
            self.error_message,
            self.exception_class_name,
            self.table_name,
        )


def error_df(spark: SparkSession, records: list[ErrorRecord]) -> DataFrame:
    return spark.createDataFrame([r.as_tuple() for r in records], ERROR_SCHEMA)


def invalid_condition():
    """The row-validity predicate of a change-feed frame, as a Column.

    Invariants checked (input_hint: ``n_tok = size(tokens)`` maintained):
      * upserts must carry tokens and a consistent n_tok
      * op must be one of I/U/D
    Returned separately from the projections so callers can count invalid
    rows with an Observation on the SAME job that applies the good rows —
    no second scan of the source.
    """
    is_del = F.col("op") == "D"
    bad_op = ~F.col("op").isin("I", "U", "D")
    bad_payload = ~is_del & (
        F.col("tokens").isNull()
        | F.col("n_tok").isNull()
        | (F.col("n_tok") != F.size("tokens"))
    )
    return bad_op | bad_payload


def error_projection(
    reference_name: str,
    table_col: str = "table_name",
    columns: "list[str] | None" = None,
):
    """Projection of an invalid change row into ERROR_SCHEMA shape — the
    Spark-native analog of the reference's InvalidEntry side output
    (RecordWrapper.java:25-50).

    Pass the frame's ``columns`` when the feed may not carry a
    ``doc_id`` column (e.g. compound-primary-key feeds keyed on other
    columns) so the message degrades instead of failing analysis."""
    bad_op = ~F.col("op").isin("I", "U", "D")
    key_desc = (
        F.col("doc_id").cast("string")
        if columns is None or "doc_id" in columns
        else F.lit("<none>")
    )
    return [
        F.lit(reference_name).alias("reference_name"),
        F.concat(
            F.lit("invalid record doc_id="),
            key_desc,
            F.lit(" lsn="),
            F.col("lsn").cast("string"),
            F.when(bad_op, F.lit(": unknown op ")).otherwise(
                F.lit(": n_tok/tokens invariant violated")
            ),
        ).alias("error_message"),
        F.lit("ValidationError").alias("exception_class_name"),
        F.col(table_col).alias("table_name"),
    ]


def split_valid_invalid(
    df: DataFrame,
    reference_name: str = "cdc",
    table_col: str = "table_name",
) -> tuple[DataFrame, DataFrame]:
    """Row-level validation of a change-feed frame → (good, errors)."""
    is_bad = invalid_condition()
    good = df.filter(~is_bad)
    errors = df.filter(is_bad).select(
        *error_projection(reference_name, table_col, columns=df.columns)
    )
    return good, errors
