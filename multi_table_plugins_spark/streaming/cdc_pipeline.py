"""The CDC ingest pipeline: change-feed tail → validate → route by table →
key-partitioned LWW MERGE into lakehouse tables → lineage.

Two drivers over the same batch-apply core:

  * :func:`run_cdc_stream` — Structured Streaming file source tailing the
    binlog directory (``maxFilesPerTrigger`` batch sizing — the streaming
    analog of the reference's JDBC fetch-size knob,
    ConnectionWithFetchSize.java:40-47), ``foreachBatch`` apply,
    checkpointed offsets. Kill it and restart with the same checkpoint +
    app_id: offsets resume, and any batch that committed to a table but
    not to the checkpoint is skipped by the table's epoch ledger —
    exactly-once end to end.
  * :func:`replay_feed_batches` — a batch loop over file groups in LSN
    order that reads each group with its *own* schema, so mid-stream
    schema evolution (added column, widened type) exercises the lakehouse
    schema-merge path honestly. (Structured Streaming pins one source
    schema for the life of a query, so the streaming driver takes the
    union schema; evolution is still applied per-batch by the table layer.)

Fan-out parallelism: tables are applied concurrently from a thread pool —
Spark schedules the per-table merge jobs simultaneously, so many small
tables don't serialize (the reference's analog was one MapReduce split per
table running in parallel task slots).

Error channel: three modes per MultiTableConf.java:48-50 — ``fail`` aborts
the batch, ``skip`` drops the failing table's records, ``error-port``
emits one ERROR_SCHEMA row per failed table (plus row-level validation
errors) to ``<warehouse>/_errors``.
"""

from __future__ import annotations

import os
import traceback
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import errors as errmod
from ..catalog import discover_tables, lake_fqn
from ..errors import ERROR_PORT, FAIL, MODES, SKIP, TableFailure, split_valid_invalid
from ..lakehouse import LakeTable
from ..schemas import CHANGE_FEED_SCHEMA, payload_schema_of_changes
from .lineage import LineageLog


def _errors_path(warehouse: str) -> str:
    return os.path.join(warehouse, "_errors")


def write_errors(df: DataFrame, warehouse: str) -> None:
    df.write.mode("append").parquet(_errors_path(warehouse))


def read_errors(spark: SparkSession, warehouse: str) -> DataFrame:
    p = _errors_path(warehouse)
    if not os.path.isdir(p):
        return spark.createDataFrame([], errmod.ERROR_SCHEMA)
    return spark.read.schema(errmod.ERROR_SCHEMA).parquet(p)


def apply_cdc_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    warehouse: str,
    epoch: int,
    app_id: str = "cdc",
    error_mode: str = ERROR_PORT,
    allow_tables: tuple[str, ...] = (),
    block_tables: tuple[str, ...] = (),
    n_buckets: int = 32,
    table_mode: str = "mor",
    compact_threshold: int = 8,
    max_parallel_tables: int = 8,
    validate: bool = True,
    lineage: LineageLog | None = None,
) -> dict:
    """Apply one micro-batch of change events to the warehouse.

    Idempotent per (app_id, table, epoch): replaying a committed epoch is
    a no-op (see LakeTable.merge_into ledger).
    """
    assert error_mode in MODES, error_mode
    if lineage is None:
        lineage = LineageLog(warehouse)

    batch_df = batch_df.persist()
    try:
        if validate:
            good, bad = split_valid_invalid(batch_df, reference_name=app_id)
            # count via the same action that writes them
            bad = bad.persist()
            n_bad = bad.count()
            if n_bad:
                if error_mode == FAIL:
                    raise TableFailure("<validation>", ValueError(f"{n_bad} invalid records"))
                if error_mode == ERROR_PORT:
                    write_errors(bad, warehouse)
            bad.unpersist()
        else:
            good = batch_df

        names = sorted(
            r[0] for r in good.select("table_name").distinct().collect()
        )
        names = discover_tables(names, allow_tables, block_tables)
        payload_schema = payload_schema_of_changes(good.schema)

        # event-time high-water mark for this batch (watermark analog)
        wm_row = good.agg(
            F.max("ts").alias("wm"), F.max("lsn").alias("max_lsn")
        ).collect()[0]

        results: dict[str, dict] = {}
        failures: dict[str, BaseException] = {}

        def apply_one(t: str) -> None:
            try:
                changes = good.filter(F.col("table_name") == t).drop(
                    "table_name", "ts"
                )
                lt = LakeTable.get_or_create(
                    spark,
                    os.path.join(warehouse, t),
                    payload_schema,
                    n_buckets=n_buckets,
                    mode=table_mode,
                    compact_threshold=compact_threshold,
                )
                m = lt.merge_into(changes, app_id=app_id, epoch=epoch)
                results[t] = m
                lineage.emit(
                    {
                        "kind": "cdc_apply",
                        "app_id": app_id,
                        "epoch": epoch,
                        "table": t,
                        "fqn": lake_fqn(warehouse, t),
                        "fields": [f.name for f in lt.schema().fields],
                        "watermark": wm_row["wm"],
                        "max_lsn": wm_row["max_lsn"],
                        **m,
                    }
                )
            except BaseException as e:  # noqa: BLE001 — isolated per table
                failures[t] = e

        if max_parallel_tables > 1 and len(names) > 1:
            with ThreadPoolExecutor(max_workers=max_parallel_tables) as ex:
                list(ex.map(apply_one, names))
        else:
            for t in names:
                apply_one(t)

        for t, e in failures.items():
            if error_mode == FAIL:
                raise TableFailure(t, e)
            lineage.emit(
                {
                    "kind": "table_failure",
                    "app_id": app_id,
                    "epoch": epoch,
                    "table": t,
                    "error": str(e),
                }
            )
            if error_mode == ERROR_PORT:
                write_errors(
                    errmod.error_df(
                        spark,
                        [
                            errmod.ErrorRecord(
                                reference_name=app_id,
                                error_message="".join(
                                    traceback.format_exception_only(type(e), e)
                                ).strip(),
                                exception_class_name=type(e).__name__,
                                table_name=t,
                            )
                        ],
                    ),
                    warehouse,
                )
        return {"tables": results, "failed": sorted(failures), "epoch": epoch}
    finally:
        batch_df.unpersist()


def run_cdc_stream(
    spark: SparkSession,
    feed_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    app_id: str = "cdc",
    feed_schema=None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    watermark: str = "10 minutes",
    **apply_kw,
):
    """Start the streaming CDC query; returns the StreamingQuery.

    The change feed must have lsn/table_name/op/doc_id/ts plus payload.
    ``feed_schema`` defaults to CHANGE_FEED_SCHEMA; pass the union schema
    if the feed evolves mid-stream (see module docstring).
    """
    schema = feed_schema or CHANGE_FEED_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # latestFirst stays False: LSN order ≈ file order, keeping deltas small
    stream = reader.parquet(feed_dir).withWatermark("ts", watermark)

    lineage = LineageLog(warehouse)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        apply_cdc_batch(
            spark,
            batch_df,
            warehouse,
            epoch=epoch_id,
            app_id=app_id,
            lineage=lineage,
            **apply_kw,
        )

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(app_id)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def replay_feed_batches(
    spark: SparkSession,
    feed_files: list[str],
    warehouse: str,
    files_per_batch: int = 1,
    app_id: str = "cdc-replay",
    start_epoch: int = 0,
    **apply_kw,
) -> list[dict]:
    """Batch-mode replay in LSN order, one apply per group of files, each
    group read with its own (possibly evolved) schema."""
    out = []
    lineage = LineageLog(warehouse)
    groups = [
        feed_files[i : i + files_per_batch]
        for i in range(0, len(feed_files), files_per_batch)
    ]
    for i, g in enumerate(groups):
        df = spark.read.parquet(*g)
        out.append(
            apply_cdc_batch(
                spark,
                df,
                warehouse,
                epoch=start_epoch + i,
                app_id=app_id,
                lineage=lineage,
                **apply_kw,
            )
        )
    return out
