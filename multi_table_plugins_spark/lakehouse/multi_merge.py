"""Multi-table fast-path merge: apply one micro-batch to MANY tables with
ONE Spark job.

The per-table ``merge_into`` loop costs O(n_tables) job launches per
micro-batch — fine for 3 tables, fatal for 300 (and visibly
overhead-bound even at 8 tables on local[32]). This path restores the
reference's "read/write all tables in one job" shape
(MultiTableDBSource.java:61-66, one MapReduce job over N tables) on the
write side:

  1. validate + LWW-dedup the whole batch keyed ``(table_name, doc_id)``
     (one hash-agg shuffle, map-side partial);
  2. one ``partitionBy(table, bucket)`` parquet write to a staging dir
     (second shuffle co-locates each (table,bucket) into one file);
  3. driver: place each table's files into its table dir through the
     FileIO seam (hard links on local fs, copy/conditional-PUT on the
     generic/object-store backend — see fileio.py), read row counts
     from parquet footers (no job), and make one atomic ledger-checked
     manifest commit per table.

Row/delete/invalid counts ride the write job via ``Observation`` — zero
extra passes. Invalid rows are written in a (rare) second job only when
the observation reports any.

Crash safety: a crash after some tables committed and others not is
healed on replay — committed tables' ledgers skip, uncommitted apply.
Orphaned staging files are ignored by readers (only manifest-listed
files are visible) — a vacuum can reclaim them.
"""

from __future__ import annotations

import os
import re
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.sql.types import StructType

#: table names become warehouse directory names — anything else is an
#: injection risk (a change event with table_name='../x' must never
#: escape the warehouse root). Leading '_' and '.' are reserved for
#: engine directories (_errors/_lineage/_staging/_manifests) and hidden
#: files, so they are rejected too.
SAFE_TABLE_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.\-]{0,127}$")


def is_safe_table_name(name: str) -> bool:
    return bool(SAFE_TABLE_RE.match(name))

from ..schemas import DELETED_COL, LSN_COL, payload_schema_of_changes
from .fileio import FileIO, get_fileio
from .table import (
    DATA_DIR,
    DELTA_WRITE_OPTS,
    LakeTable,
    _STATS_V,
    _conform,
    _footer_meta,
)

_BUCKET_COL = "_bucket"
_TABLE_COL = "_table"


def merge_many(
    spark: SparkSession,
    batch_df: DataFrame,
    warehouse: str,
    app_id: str,
    epoch: int | None,
    n_buckets: int = 16,
    table_mode: str = "mor",
    compact_threshold: int = 16,
    minor_compact_threshold: int | None = None,
    table_col: str = "table_name",
    key_col: "str | list[str]" = "doc_id",
    lsn_col: str = "lsn",
    op_col: str = "op",
    allowed_tables: set[str] | None = None,
    batch_dedup: bool = False,
    io: FileIO | None = None,
    on_violation: str = "fail",
    branch: "str | None" = None,
) -> dict[str, dict]:
    """Apply a change-feed batch to every table it mentions; returns
    {table: merge metrics}. One Spark job (two if invalid rows exist).

    ``batch_dedup=False`` (default) appends every change version as an
    LSM-style sorted-run delta — read/compaction resolves LWW. This is
    the throughput path: the heavy token arrays are shuffled exactly once
    (for write co-location) and never sorted or aggregated.
    ``batch_dedup=True`` first reduces the batch to one row per key via a
    keys-only max(lsn) hash-agg (fixed-width buffer — fast) joined back
    broadcast — worth it when hot keys dominate the batch (e.g. a
    counter-like key receiving most of the feed).

    ``key_col`` may be a list for compound primary keys (reference
    parity: DBTableInfo.java:28-50 carries ``primaryKey: List<String>``);
    dedup, bucketing, and the per-table LWW merge then key on the column
    tuple in the given order.

    ``branch`` — stage the whole batch on that named branch of EVERY
    touched table instead of committing to main (warehouse-level
    write-audit-publish, streaming/wap.py): same one-job write, same
    per-table ledger semantics, but commits land on each table's branch
    manifest chain, no warehouse snapshot is published (snapshots pin
    MAIN versions only), and nothing is visible to main readers until
    the branches are fast-forwarded."""
    io = get_fileio(io)
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    payload_schema = payload_schema_of_changes(batch_df.schema)
    internal_fields = list(payload_schema.fields)
    internal_names = [f.name for f in internal_fields]

    norm = (
        batch_df.withColumn(LSN_COL, F.col(lsn_col).cast("long"))
        .withColumn(DELETED_COL, F.col(op_col) == F.lit("D"))
        .withColumn(_TABLE_COL, F.col(table_col))
    )
    if allowed_tables is not None:
        norm = norm.filter(F.col(_TABLE_COL).isin(*sorted(allowed_tables)))

    obs = Observation()
    norm = norm.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col(DELETED_COL).cast("int")).alias("deletes"),
        F.max("ts").alias("watermark") if "ts" in batch_df.columns else F.lit(None).alias("watermark"),
        F.max(lsn_col).alias("max_lsn"),
    )

    if batch_dedup:
        # keys-only argmax (fixed-width hash agg, map-side partial), then
        # broadcast-join winners back — arrays never enter an agg buffer.
        # NB: max_by(struct(<array>)) would fall back to a sort-based
        # aggregate (variable-length buffers don't fit HashAggregate).
        winners = norm.groupBy(_TABLE_COL, *key_cols).agg(
            F.max(LSN_COL).alias(LSN_COL)
        )
        # no broadcast hint: the winners set is bounded by the batch's
        # distinct-key count, which can be the whole batch — AQE picks a
        # broadcast join at runtime when it actually fits the threshold
        deduped = norm.join(winners, [_TABLE_COL, *key_cols, LSN_COL], "inner")
    else:
        deduped = norm
    keep = [_TABLE_COL, *key_cols] + [
        c for c in internal_names if c not in key_cols
    ] + [LSN_COL, DELETED_COL]
    # same murmur3-over-key-tuple expression as LakeTable._bucket_expr —
    # the write-side bucket ids must match the table layout exactly
    bucketed = deduped.select(*keep).withColumn(
        _BUCKET_COL,
        F.pmod(F.hash(*[F.col(k) for k in key_cols]), F.lit(n_buckets)),
    )

    staging_rel = f"_staging/e{epoch if epoch is not None else 'x'}-{uuid.uuid4().hex[:8]}"
    staging = os.path.join(warehouse, staging_rel)
    # implicit partition count: AQE size-coalesces the write side
    # (measured 40 tasks for a 1.6 GB batch at 32 cores). An explicit
    # cores-multiple count (4x32 even waves) was A/B-tested against this
    # in round 6 and showed no robust win under the bench's best-of
    # methodology — the wave-quantization loss and the per-task overhead
    # of 4x more tasks cancel out; keeping AQE is the scale-adaptive
    # choice (partitions track batch bytes, not a local constant).
    (
        bucketed.repartition(F.col(_TABLE_COL), F.col(_BUCKET_COL))
        .write.partitionBy(_TABLE_COL, _BUCKET_COL)
        .options(**DELTA_WRITE_OPTS)
        .mode("error")
        .parquet(staging)
    )
    got = obs.get

    results: dict[str, dict] = {}

    unsafe: list[str] = []

    def _commit_table_slow(lt: LakeTable, table: str, tdir: str) -> None:
        """Slow lane for tables the staged files can't serve directly:
        a bucket layout differing from the batch's (post-``rebucket``)
        and/or registered CHECK constraints. Re-reads ONLY this table's
        staged files (column-pruned parquet, page-cache hot), enforces
        constraints on the events, re-buckets with the TABLE's layout,
        and commits through the table's own write path — O(this
        table's share of the batch), the hot path untouched for every
        other table."""
        from .table import CommitConflict, ConstraintViolation

        sdir = os.path.join(staging, tdir)
        files = [
            os.path.join(sdir, b, f)
            for b in io.listdir(sdir)
            if b.startswith(f"{_BUCKET_COL}=")
            for f in io.listdir(os.path.join(sdir, b))
            if f.endswith(".parquet")
        ]
        if not files:
            results[table] = {"skipped": False, "rows_applied": 0}
            return
        file_schema = StructType(list(payload_schema.fields))
        file_schema = file_schema.add(LSN_COL, "long").add(
            DELETED_COL, "boolean"
        )
        df = spark.read.schema(file_schema).parquet(*files)
        n_viol = 0
        cons = lt.constraints()
        if cons:
            live = ~F.coalesce(F.col(DELETED_COL), F.lit(False))
            viol = F.lit(False)
            for cexpr in cons.values():
                viol = viol | ~F.coalesce(F.expr(cexpr), F.lit(True))
            viol = viol & live
            if on_violation == "fail":
                sample = df.filter(viol).limit(3).collect()
                if sample:
                    raise ConstraintViolation(
                        f"batch violates constraint(s) {sorted(cons)} on "
                        f"table {table!r}; sample: "
                        + "; ".join(str(r.asDict()) for r in sample)
                    )
            else:
                n_viol = df.filter(viol).count()
                if n_viol:
                    df = df.filter(~viol)
        for attempt in range(3):
            nb = lt.n_buckets
            bucketed2 = df.withColumn(_BUCKET_COL, lt._bucket_expr(nb))
            new_entries = lt._write_data_files(
                bucketed2, lt.manifest()["version"] + 1, "delta"
            )
            t0 = time.time()
            try:
                m = lt.commit_delta(
                    new_entries,
                    payload_schema,
                    app_id,
                    epoch,
                    expected_n_buckets=nb,
                )
            except CommitConflict:
                lt._discard_unreferenced(new_entries)
                lt._manifest_cache_version = -1
                if attempt == 2:
                    raise
                continue
            break
        m["commit_ms"] = round((time.time() - t0) * 1000, 1)
        if m.get("skipped"):
            lt._discard_unreferenced(new_entries)
        else:
            m["rows_applied"] = sum(
                e["rows"] for es in new_entries.values() for e in es
            )
            if n_viol:
                m["constraint_violations_dropped"] = n_viol
        results[table] = m

    def _commit_table(tdir: str) -> None:
        table = tdir.split("=", 1)[1]
        if not is_safe_table_name(table):
            unsafe.append(table)
            return
        tpath = os.path.join(warehouse, table)
        lt = LakeTable.get_or_create(
            spark,
            tpath,
            payload_schema,
            key=key_col,
            n_buckets=n_buckets,
            mode=table_mode,
            compact_threshold=compact_threshold,
            minor_compact_threshold=minor_compact_threshold,
            io=io,
            branch=branch,
        )
        if lt.key_cols != key_cols:
            # same corruption class as a bucket-count mismatch: the
            # bucket hash is order-sensitive over the key tuple, so a
            # reordered/different key would land every file in the
            # wrong bucket while committing cleanly
            raise ValueError(
                f"table {table!r} has key {lt.key_cols}, batch was "
                f"bucketed on {key_cols}; pass the table's key order"
            )
        if lt.n_buckets != n_buckets or lt.constraints():
            # the staged files were hashed with the BATCH's bucket count
            # and never constraint-checked — this table needs the slow
            # lane (re-bucket to the table's layout after a rebucket();
            # enforce CHECK constraints). Every other table stays on the
            # zero-copy fast lane below.
            _commit_table_slow(lt, table, tdir)
            return
        dest_rel = f"{DATA_DIR}/e{epoch if epoch is not None else 'x'}-{uuid.uuid4().hex[:8]}"
        entries: dict[str, list[dict]] = {}
        total_rows = 0
        for bdir in io.listdir(os.path.join(staging, tdir)):
            if not bdir.startswith(f"{_BUCKET_COL}="):
                continue
            bucket = bdir.split("=", 1)[1]
            io.makedirs(os.path.join(tpath, dest_rel, bdir))
            for fn in io.listdir(os.path.join(staging, tdir, bdir)):
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(staging, tdir, bdir, fn)
                rel = os.path.join(dest_rel, bdir, fn)
                dst = os.path.join(tpath, rel)
                io.add_file(src, dst)
                # same single footer read as the slow path: row count +
                # key/_lsn min/max so fast-path files are file-skippable
                rows, stats, rgs = _footer_meta(dst, key_cols + [LSN_COL], io)
                total_rows += rows
                entry = {
                    "path": rel,
                    "sv": 0,  # set by commit_delta
                    "bytes": io.getsize(dst),
                    "rows": rows,
                    "rgs": rgs,
                }
                if stats:
                    entry["stats"] = stats
                    entry["stats_v"] = _STATS_V
                entries.setdefault(bucket, []).append(entry)
        t0 = time.time()
        # expected_n_buckets: these entries were hashed with the bucket
        # count read at planning time — a concurrent rebucket() must
        # conflict here, not silently file rows under wrong bucket ids
        m = lt.commit_delta(
            entries,
            payload_schema,
            app_id,
            epoch,
            expected_n_buckets=n_buckets,
        )
        m["commit_ms"] = round((time.time() - t0) * 1000, 1)
        if m.get("skipped"):
            # epoch already committed (crash replay) — discard placed files
            io.remove_tree(os.path.join(tpath, dest_rel))
        else:
            m["rows_applied"] = total_rows
        results[table] = m

    tdirs = sorted(
        d for d in io.listdir(staging) if d.startswith(f"{_TABLE_COL}=")
    )
    # per-table registration is driver-side IO (link + footer + JSON) —
    # run it threaded so 100 tables don't serialize the micro-batch.
    # Exceptions are collected per table (not propagated out of ex.map)
    # and staging removal runs in finally: a failing table (e.g. the
    # n_buckets layout-mismatch refusal) must neither abort its siblings'
    # commits nor leak the staging directory on every fallback retry.
    from concurrent.futures import ThreadPoolExecutor

    commit_failures: dict[str, Exception] = {}

    def _commit_guarded(tdir: str) -> None:
        # Exception only: a KeyboardInterrupt/SystemExit during a commit
        # must propagate out of ex.map and abort the batch (the caller's
        # isolated-fallback retry is for table failures, not interrupts);
        # the finally below still reclaims staging on the way out.
        try:
            _commit_table(tdir)
        except Exception as e:
            commit_failures[tdir.split("=", 1)[1]] = e

    try:
        if len(tdirs) > 1:
            with ThreadPoolExecutor(max_workers=8) as ex:
                list(ex.map(_commit_guarded, tdirs))
        else:
            for d in tdirs:
                _commit_guarded(d)
    finally:
        io.remove_tree(staging)
        # remove the shared staging parent when no other batch is mid-flight
        io.remove_dir_if_empty(os.path.dirname(staging))

    if commit_failures:
        # committed tables' ledgers make the retry a no-op for them; the
        # caller's isolated fallback path re-applies only the failures.
        # Attach the successful tables' metrics so the caller can still
        # emit their lineage (the fallback would only see ledger-skips).
        first_t, first_e = sorted(commit_failures.items())[0]
        err = RuntimeError(
            f"commit failed for table(s) {sorted(commit_failures)}: "
            f"{first_t}: {first_e}"
        )
        err.partial_results = dict(results)
        err.batch_stats = {
            "rows_in": got.get("rows_in", 0),
            "deletes": got.get("deletes", 0) or 0,
            "watermark": got.get("watermark"),
            "max_lsn": got.get("max_lsn"),
            "unsafe_tables": sorted(unsafe),
        }
        raise err from first_e
    # every table committed → publish the cross-table-consistent
    # warehouse snapshot pinning each touched table's resulting version
    # (a crash before this point leaves readers on the last complete
    # batch — see lakehouse/snapshots.py). Best-effort: a snapshot
    # publish failure must not fail a durably committed batch.
    # pin the versions each commit ITSELF produced (never a re-read of
    # "latest" — a concurrent writer's half-committed batch must not
    # leak into the pin map); skipped replays pin their table's current
    # version, which with sequential per-app epochs already contains
    # the skipped batch
    versions = {
        t: m["version"]
        for t, m in results.items()
        if not t.startswith("_") and m.get("version") is not None
    }
    if branch is not None:
        versions = {}  # staged commits must never pin a snapshot
    if versions:
        try:
            from .snapshots import publish_snapshot

            publish_snapshot(
                io, warehouse, versions, app_id=app_id, epoch=epoch
            )
        except Exception:
            pass
    results["_batch"] = {
        "rows_in": got.get("rows_in", 0),
        "deletes": got.get("deletes", 0) or 0,
        "watermark": got.get("watermark"),
        "max_lsn": got.get("max_lsn"),
        "unsafe_tables": sorted(unsafe),
    }
    return results
