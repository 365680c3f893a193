"""Skew handling: salted repartition for hot keys.

The reference has no skew story (one split per table — a hot table
serializes, SURVEY.md §4 gap). The north rule requires explicit handling:
a hot ``doc_id`` receiving a large share of a micro-batch would pin one
shuffle partition. Strategy:

  * **salted pre-aggregation**: LWW dedup is an associative reduce
    (argmax by lsn), so it can run in two stages — stage 1 groups on
    ``(key, salt)`` spreading a hot key over S reducers, stage 2 groups
    the S partials on ``key``. Stage-2 input is ≤ S rows per key no
    matter how hot the key was.
  * AQE skew-join splitting is enabled at the session level for the join
    paths (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "_salt"


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, salt_buckets: int = 8
) -> DataFrame:
    """Repartition on (key, salt) so one hot key spreads over
    ``salt_buckets`` partitions. Use when downstream work is per-row
    (e.g. a pandas UDF) rather than a keyed aggregation."""
    salted = df.withColumn(
        _SALT, F.pmod(F.hash(F.monotonically_increasing_id()), salt_buckets)
    )
    return salted.repartition(num_partitions, F.col(key), F.col(_SALT)).drop(_SALT)


def salted_lww_dedup(
    df: DataFrame,
    key: str,
    lsn_col: str,
    payload_cols: list[str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-stage argmax-by-lsn dedup that survives arbitrarily hot keys.

    Equivalent result to ``groupBy(key).agg(max_by(payload, lsn))`` but the
    first shuffle key is ``(key, salt)``: a key with 10^7 occurrences in a
    batch contributes at most ``salt_buckets`` rows to the final shuffle.
    (Spark's own partial aggregation gives much of this for free when the
    hash map fits; the explicit salt guarantees it under memory pressure.)
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    salted = df.withColumn(_SALT, F.pmod(F.col(lsn_col), salt_buckets))
    partial = salted.groupBy(key, _SALT).agg(
        F.max_by(payload, F.col(lsn_col)).alias("_p"),
        F.max(lsn_col).alias("_m"),
    )
    final = partial.groupBy(key).agg(
        F.max_by(F.col("_p"), F.col("_m")).alias("_p"),
        F.max("_m").alias(lsn_col),
    )
    return final.select(key, "_p.*", lsn_col)
