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


#: suffix of the per-table SCD2 version-log tables written by
#: ``apply_cdc_batch(history_tables=True)``
HISTORY_SUFFIX = "__history"


def _errors_path(warehouse: str) -> str:
    return os.path.join(warehouse, "_errors")


def read_history(
    spark: SparkSession,
    warehouse: str,
    table: str,
    key_cols: "tuple[str, ...] | list[str]" = ("doc_id",),
) -> DataFrame:
    """SCD2 validity intervals over a ``<table>__history`` version log
    captured by ``apply_cdc_batch(history_tables=True)``: one row per
    version with ``valid_from`` / ``valid_to`` / ``version_num`` /
    ``is_current`` (see operators/scd2.py), ordered by the change
    timestamp with the LSN as total-order tiebreak. Delete events appear
    as versions with ``change_op = 'D'`` — "what did this row look like
    at time T, and when was it deleted?" is one filter away
    (:func:`~multi_table_plugins_spark.operators.scd2.scd2_as_of`)."""
    from ..operators.scd2 import scd2_history

    lt = LakeTable(spark, os.path.join(warehouse, table + HISTORY_SUFFIX))
    df = lt.read()
    keys = list(key_cols)
    order = (["event_ts"] if "event_ts" in df.columns else []) + ["lsn_key"]
    payload = [c for c in df.columns if c not in keys and c not in order]
    return scd2_history(df, keys, order, payload)


def write_errors(
    df: DataFrame,
    warehouse: str,
    app_id: str | None = None,
    epoch: int | None = None,
    kind: str = "misc",
) -> None:
    """Write error rows to the side channel.

    With (app_id, epoch) the write goes to an epoch-keyed subdirectory in
    ``overwrite`` mode, so a crash-replayed epoch REWRITES its
    deterministic error rows instead of appending duplicates — the error
    channel gets the same exactly-once semantics as the data path (whose
    ledger skips the data commit on replay but used to re-append errors).
    Without an epoch (ad-hoc callers) it appends to the channel root.
    """
    if epoch is None:
        df.write.mode("append").parquet(_errors_path(warehouse))
        return
    sub = os.path.join(
        _errors_path(warehouse), f"{app_id or 'cdc'}-e{epoch:08d}-{kind}"
    )
    df.write.mode("overwrite").parquet(sub)


def read_errors(spark: SparkSession, warehouse: str) -> DataFrame:
    p = _errors_path(warehouse)
    if not os.path.isdir(p):
        return spark.createDataFrame([], errmod.ERROR_SCHEMA)
    return (
        spark.read.schema(errmod.ERROR_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(p)
    )


def apply_cdc_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    warehouse: str,
    epoch: int,
    app_id: str = "cdc",
    error_mode: str = ERROR_PORT,
    allow_tables: tuple[str, ...] = (),
    block_tables: tuple[str, ...] = (),
    n_buckets: int = 16,
    table_mode: str = "mor",
    compact_threshold: int = 16,
    minor_compact_threshold: int | None = None,
    max_parallel_tables: int = 8,
    validate: bool = True,
    fast_path: bool = True,
    batch_dedup: bool = False,
    lineage: LineageLog | None = None,
    io=None,
    key_col: "str | list[str]" = "doc_id",
    history_tables: bool = False,
    branch: "str | None" = None,
) -> dict:
    """Apply one micro-batch of change events to the warehouse.

    Idempotent per (app_id, table, epoch): replaying a committed epoch is
    a no-op (per-table epoch ledger).

    ``key_col`` — the primary key column(s); pass a list for compound
    keys (tables are created with / merged on the tuple).

    ``history_tables`` — SCD2 capture: besides the LWW current-state
    table, every change event (deletes included) is also upserted into
    ``<table>__history`` keyed on ``(key…, lsn_key)`` — each version is
    its own key, so the SAME idempotent-merge machinery yields an
    append-only, exactly-once version log (no new write path, no
    tombstone semantics to special-case: the original ``op`` rides along
    as the ``change_op`` payload column, ``ts`` as ``event_ts``). Read
    validity intervals back with :func:`read_history`.

    ``fast_path`` applies ALL tables with one Spark job
    (lakehouse.multi_merge) — validation/delete/watermark counts ride the
    job via Observation. If that job fails and ``error_mode`` is not
    ``fail``, the batch is retried on the per-table isolated path so a
    poison table cannot take down its siblings (E2/E3 semantics,
    ErrorCollectingRecordReader.java:58-73).

    ``branch`` — STAGE the batch instead of committing it: every
    touched table's commit lands on that named branch of the table
    (created at its current version if absent), invisible to main
    reads, the change feed, replicas, and the warehouse snapshot log
    until published. Use :func:`stage_cdc_batch` /
    :func:`publish_staged_batch` / :func:`discard_staged_batch`
    (streaming/wap.py) for the full warehouse-level
    write-audit-publish flow.
    """
    assert error_mode in MODES, error_mode
    from ..lakehouse.fileio import get_fileio

    # driver-side commit IO backend ("local" | "generic" | FileIO);
    # default resolves $MTP_FILEIO — see lakehouse/fileio.py
    io = get_fileio(io)
    if lineage is None:
        lineage = LineageLog(warehouse)

    if history_tables:
        from ..errors import invalid_condition as _invalid

        # refuse a clashing feed BEFORE any table commits: checking
        # after the main apply would permanently commit current-state
        # epochs (the ledger then skips them on replay) while capturing
        # no history for that epoch — a silent half-applied batch
        clash = {"change_op", "lsn_key", "event_ts"} & set(batch_df.columns)
        if clash:
            # withColumn would silently overwrite a user payload column
            # of the same name in the history table only — refuse loudly
            raise ValueError(
                f"history_tables=True reserves column name(s) {sorted(clash)} "
                "for the version log; rename the payload column(s)"
            )
        main = apply_cdc_batch(
            spark, batch_df, warehouse, epoch, app_id, error_mode,
            allow_tables, block_tables, n_buckets, table_mode,
            compact_threshold, minor_compact_threshold,
            max_parallel_tables, validate, fast_path, batch_dedup,
            lineage, io, key_col, history_tables=False, branch=branch,
        )
        src = batch_df.filter(~_invalid()) if validate else batch_df
        if allow_tables:
            src = src.filter(F.col("table_name").isin(*allow_tables))
        if block_tables:
            src = src.filter(~F.col("table_name").isin(*block_tables))
        # never capture history OF a history-suffixed table (no
        # x__history__history); a feed table literally named x__history
        # alongside x is refused downstream by merge_many's key guard
        # (LWW key vs (key, lsn_key) mismatch on the shared path)
        src = src.filter(~F.col("table_name").endswith(HISTORY_SUFFIX))
        hist = src.withColumn("change_op", F.col("op")).withColumn(
            "lsn_key", F.col("lsn")
        )
        if "ts" in src.columns:
            hist = hist.withColumn("event_ts", F.col("ts"))
        hist = hist.withColumn("op", F.lit("U")).withColumn(
            "table_name", F.concat(F.col("table_name"), F.lit(HISTORY_SUFFIX))
        )
        keys = [key_col] if isinstance(key_col, str) else list(key_col)
        hres = apply_cdc_batch(
            spark, hist, warehouse, epoch, app_id, error_mode,
            (), (), n_buckets, table_mode,
            compact_threshold, minor_compact_threshold,
            max_parallel_tables, False, fast_path, batch_dedup,
            lineage, io, keys + ["lsn_key"], history_tables=False,
            branch=branch,
        )
        main["history"] = hres["tables"]
        # a failed history merge must be as visible as a failed main
        # merge — monitoring keyed on result["failed"] sees both
        main["failed"] = list(main.get("failed", ())) + list(
            hres.get("failed", ())
        )
        return main

    from pyspark.sql import Observation

    from ..errors import error_projection, invalid_condition

    good = batch_df
    obs_v = None
    if validate:
        if error_mode == FAIL:
            # strict mode: know about invalid rows BEFORE applying anything
            good, bad = split_valid_invalid(batch_df, reference_name=app_id)
            _flush_validation_errors(
                spark, bad, warehouse, app_id, error_mode, epoch=epoch
            )
        else:
            # count invalid rows on the apply job itself (no extra scan);
            # materialize them afterwards only if the count is non-zero
            is_bad = invalid_condition()
            obs_v = Observation()
            observed = batch_df.observe(
                obs_v, F.sum(is_bad.cast("int")).alias("n_bad")
            )
            good = observed.filter(~is_bad)
    if allow_tables:
        good = good.filter(F.col("table_name").isin(*allow_tables))
    if block_tables:
        good = good.filter(~F.col("table_name").isin(*block_tables))

    if fast_path:
        try:
            from ..lakehouse.multi_merge import merge_many

            results = merge_many(
                spark,
                good,
                warehouse,
                app_id=app_id,
                epoch=epoch,
                n_buckets=n_buckets,
                table_mode=table_mode,
                compact_threshold=compact_threshold,
                minor_compact_threshold=minor_compact_threshold,
                batch_dedup=batch_dedup,
                io=io,
                key_col=key_col,
                # CHECK-constraint violations follow the pipeline's
                # error discipline: FAIL aborts the batch, skip /
                # error-port drop them with a counted metric
                on_violation="fail" if error_mode == FAIL else "drop",
                branch=branch,
            )
            batch_stats = results.pop("_batch", {})
            unsafe_names = batch_stats.get("unsafe_tables", [])
            for bad_name in unsafe_names:
                lineage.emit(
                    {
                        "kind": "table_rejected",
                        "app_id": app_id,
                        "epoch": epoch,
                        "table": bad_name,
                        "error": "unsafe table name",
                    }
                )
            if unsafe_names and error_mode == ERROR_PORT:
                write_errors(
                    errmod.error_df(
                        spark,
                        [
                            errmod.ErrorRecord(
                                reference_name=app_id,
                                error_message=f"unsafe table name {n!r} rejected",
                                exception_class_name="UnsafeTableName",
                                table_name=n,
                            )
                            for n in unsafe_names
                        ],
                    ),
                    warehouse,
                    app_id=app_id,
                    epoch=epoch,
                    kind="unsafe",
                )
            if obs_v is not None and (obs_v.get.get("n_bad") or 0) > 0:
                if error_mode == ERROR_PORT:
                    write_errors(
                        batch_df.filter(invalid_condition()).select(
                            *error_projection(
                                app_id, columns=batch_df.columns
                            )
                        ),
                        warehouse,
                        app_id=app_id,
                        epoch=epoch,
                        kind="validation",
                    )
            fields = [
                f.name for f in payload_schema_of_changes(good.schema).fields
            ]
            for t, m in results.items():
                lineage.emit(
                    {
                        "kind": "cdc_apply",
                        "app_id": app_id,
                        "epoch": epoch,
                        "table": t,
                        "fqn": lake_fqn(warehouse, t),
                        "fields": fields,
                        "watermark": batch_stats.get("watermark"),
                        "max_lsn": batch_stats.get("max_lsn"),
                        **m,
                    }
                )
            return {"tables": results, "failed": [], "epoch": epoch}
        except TableFailure:
            raise
        except Exception as e:  # KeyboardInterrupt/SystemExit must propagate
            if error_mode == FAIL:
                raise
            # tables that DID commit before a sibling failed carry their
            # metrics on the exception — emit their lineage now (the
            # isolated retry will only see their ledgers skip)
            partial = getattr(e, "partial_results", None) or {}
            pstats = getattr(e, "batch_stats", None) or {}
            for t, pm in partial.items():
                if not pm.get("skipped"):
                    lineage.emit(
                        {
                            "kind": "cdc_apply",
                            "app_id": app_id,
                            "epoch": epoch,
                            "table": t,
                            "fqn": lake_fqn(warehouse, t),
                            "watermark": pstats.get("watermark"),
                            "max_lsn": pstats.get("max_lsn"),
                            **pm,
                        }
                    )
            lineage.emit(
                {
                    "kind": "fast_path_fallback",
                    "app_id": app_id,
                    "epoch": epoch,
                    "error": str(e),
                }
            )
            # fall through to the isolated path

    return _apply_isolated(
        spark,
        batch_df,
        warehouse,
        epoch,
        app_id,
        error_mode,
        allow_tables,
        block_tables,
        n_buckets,
        table_mode,
        compact_threshold,
        minor_compact_threshold,
        max_parallel_tables,
        validate,
        lineage,
        io,
        key_col,
        branch,
    )


def _flush_validation_errors(
    spark, bad, warehouse, app_id, error_mode, epoch=None
) -> int:
    """Write row-level validation errors (one cheap job; only reached
    when the caller wants the error channel materialized)."""
    if error_mode == SKIP:
        return 0
    bad = bad.persist()
    try:
        n_bad = bad.count()
        if n_bad:
            if error_mode == FAIL:
                raise TableFailure(
                    "<validation>", ValueError(f"{n_bad} invalid records")
                )
            write_errors(
                bad, warehouse, app_id=app_id, epoch=epoch, kind="validation"
            )
        return n_bad
    finally:
        bad.unpersist()


def _apply_isolated(
    spark: SparkSession,
    batch_df: DataFrame,
    warehouse: str,
    epoch: int,
    app_id: str,
    error_mode: str,
    allow_tables: tuple[str, ...],
    block_tables: tuple[str, ...],
    n_buckets: int,
    table_mode: str,
    compact_threshold: int,
    minor_compact_threshold: int | None,
    max_parallel_tables: int,
    validate: bool,
    lineage: LineageLog,
    io=None,
    key_col: "str | list[str]" = "doc_id",
    branch: "str | None" = None,
) -> dict:
    """Per-table isolated apply: one merge job per table, failures
    contained to their table (slow path / error-isolation path)."""
    batch_df = batch_df.persist()
    try:
        if validate:
            good, bad = split_valid_invalid(batch_df, reference_name=app_id)
            _flush_validation_errors(
                spark, bad, warehouse, app_id, error_mode, epoch=epoch
            )
        else:
            good = batch_df

        from ..lakehouse.multi_merge import is_safe_table_name

        names = sorted(
            r[0] for r in good.select("table_name").distinct().collect()
        )
        names = discover_tables(names, allow_tables, block_tables)
        # same path-traversal guard as the fast path: feed-supplied names
        # become warehouse directory names
        unsafe_names = [n for n in names if not is_safe_table_name(n)]
        for bad_name in unsafe_names:
            names.remove(bad_name)
            lineage.emit(
                {
                    "kind": "table_rejected",
                    "app_id": app_id,
                    "epoch": epoch,
                    "table": bad_name,
                    "error": "unsafe table name",
                }
            )
        if unsafe_names and error_mode == ERROR_PORT:
            write_errors(
                errmod.error_df(
                    spark,
                    [
                        errmod.ErrorRecord(
                            reference_name=app_id,
                            error_message=f"unsafe table name {n!r} rejected",
                            exception_class_name="UnsafeTableName",
                            table_name=n,
                        )
                        for n in unsafe_names
                    ],
                ),
                warehouse,
                app_id=app_id,
                epoch=epoch,
                kind="unsafe",
            )
        payload_schema = payload_schema_of_changes(good.schema)

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
                    key=key_col,
                    n_buckets=n_buckets,
                    mode=table_mode,
                    compact_threshold=compact_threshold,
                    minor_compact_threshold=minor_compact_threshold,
                    io=io,
                    branch=branch,
                )
                m = lt.merge_into(
                    changes,
                    app_id=app_id,
                    epoch=epoch,
                    on_violation="fail" if error_mode == FAIL else "drop",
                )
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
            except Exception as e:  # isolated per table; interrupts propagate
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
        if failures and error_mode == ERROR_PORT:
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
                        for t, e in sorted(failures.items())
                    ],
                ),
                warehouse,
                app_id=app_id,
                epoch=epoch,
                kind="failure",
            )
        # a COMPLETE batch on the isolated path advances the warehouse
        # snapshot too (else a fast-path fallback or fast_path=False
        # would silently stall snapshot readers on ever-staler pins);
        # an incomplete batch publishes nothing — readers stay on the
        # last complete one
        if results and not failures and branch is None:
            versions = {
                t: m["version"]
                for t, m in results.items()
                if m.get("version") is not None
            }
            if versions:
                try:
                    from ..lakehouse.snapshots import publish_snapshot

                    publish_snapshot(
                        io, warehouse, versions, app_id=app_id, epoch=epoch
                    )
                except Exception:
                    pass
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
    progress_listener: bool = False,
    **apply_kw,
):
    """Start the streaming CDC query; returns the StreamingQuery.

    The change feed must have lsn/table_name/op/doc_id/ts plus payload.
    ``feed_schema`` defaults to CHANGE_FEED_SCHEMA; pass the union schema
    if the feed evolves mid-stream (see module docstring).

    ``progress_listener=True`` additionally registers a
    StreamingQueryListener that appends the ENGINE's per-trigger progress
    (numInputRows, rates, durations, offsets) to
    ``<warehouse>/_lineage/progress.jsonl`` — the streaming analog of the
    reference's split progress (DBTableRecordReader.java:121-124). The
    listener instance is attached to the returned query as
    ``_mtp_listener`` so callers can deregister it after termination.
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

    listener = None
    if progress_listener:
        from .lineage import ProgressListener

        listener = ProgressListener(warehouse)
        spark.streams.addListener(listener)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(app_id)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    try:
        q = writer.start()
    except BaseException:
        # a listener left registered with query_id forever None would
        # buffer (bounded) progress of every later query on the session
        # and never write a record — deregister before propagating
        if listener is not None:
            spark.streams.removeListener(listener)
        raise
    if listener is not None:
        # pin the listener to THIS query (the listener bus is
        # session-global). Events that fire between start() and this
        # assignment (possible with availableNow on a tiny feed) are
        # buffered by the listener and flushed — filtered to this query —
        # on assignment, so the race loses no events and admits no
        # foreign-query contamination.
        listener.query_id = str(q.id)
        q._mtp_listener = listener
    return q


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
