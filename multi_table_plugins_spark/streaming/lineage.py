"""Per-micro-batch lineage + metrics emission.

Reference analog: per-table read lineage ``Read_from_<table>`` with field
lists (MultiTableDBSource.java:176-187) and schema publication
(MultiTableDBSource.java:164-170). The north rule upgrades this to
per-partition/per-batch operational metrics: rows applied, bytes written,
event-time watermark, snapshot id — one JSON line per (batch, table),
appended to ``<warehouse>/_lineage/lineage.jsonl``.
"""

from __future__ import annotations

import json
import os
import threading
import time

_LOCK = threading.Lock()


class LineageLog:
    def __init__(self, warehouse: str):
        self.dir = os.path.join(warehouse, "_lineage")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "lineage.jsonl")

    def emit(self, record: dict) -> None:
        record = {"emitted_at": time.time(), **record}
        line = json.dumps(record, default=str)
        with _LOCK:
            with open(self.path, "a") as f:
                f.write(line + "\n")

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(l) for l in f if l.strip()]


class ProgressListener:
    """StreamingQueryListener appending each micro-batch's engine-reported
    progress (numInputRows, processedRowsPerSecond, batch/trigger
    durations, source offsets) to ``<warehouse>/_lineage/progress.jsonl``.

    The streaming analog of the reference's split progress reporting
    (DBTableRecordReader.getProgress, DBTableRecordReader.java:121-124):
    the engine's own counters, not ours, so it cross-checks the
    LineageLog numbers the apply path emits.

    Built lazily because StreamingQueryListener needs an active session.
    """

    def __new__(cls, warehouse: str):
        from pyspark.sql.streaming import StreamingQueryListener

        log = LineageLog(warehouse)
        path = os.path.join(log.dir, "progress.jsonl")

        class _L(StreamingQueryListener):
            """``query_id`` (set after start()) pins the listener to ONE
            query — the listener bus is SESSION-global, so without this
            filter a second concurrent stream's batches would
            cross-contaminate this warehouse's progress log.

            With availableNow triggers a tiny feed can complete its first
            micro-batch BEFORE the caller has assigned query_id, so events
            arriving while it is still None are BUFFERED, not written:
            on assignment the buffer is flushed filtered to the owning
            query, which keeps both the event (no loss to the race) and
            the isolation guarantee (no foreign-query contamination)."""

            #: pre-assignment buffer cap — a query_id always arrives
            #: within one trigger in practice; the cap only matters if a
            #: caller abandons the listener, where dropping the OLDEST
            #: events bounds driver memory instead of growing forever
            _PENDING_CAP = 256

            def __init__(self):
                super().__init__()
                self._qid: str | None = None
                self._pending: list[dict] = []

            @staticmethod
            def _append(rec: dict) -> None:
                with open(path, "a") as f:
                    f.write(json.dumps(rec, default=str) + "\n")

            @property
            def query_id(self) -> str | None:
                return self._qid

            @query_id.setter
            def query_id(self, qid: str | None) -> None:
                with _LOCK:
                    self._qid = qid
                    pending, self._pending = self._pending, []
                    for rec in pending:
                        if qid is None or rec["query_id"] == qid:
                            self._append(rec)

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                rec = {
                    "emitted_at": time.time(),
                    "kind": "stream_progress",
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "processed_rows_per_sec": p.processedRowsPerSecond,
                    "duration_ms": dict(p.durationMs or {}),
                    "sources": [
                        {
                            "description": s.description,
                            "start_offset": s.startOffset,
                            "end_offset": s.endOffset,
                            "num_input_rows": s.numInputRows,
                        }
                        for s in (p.sources or [])
                    ],
                }
                with _LOCK:
                    if self._qid is None:
                        self._pending.append(rec)
                        if len(self._pending) > self._PENDING_CAP:
                            del self._pending[: -self._PENDING_CAP]
                        return
                    if rec["query_id"] != self._qid:
                        return
                    self._append(rec)

            def onQueryTerminated(self, event):
                pass

        inst = _L()
        inst.progress_path = path
        return inst


def read_progress(warehouse: str) -> list[dict]:
    path = os.path.join(warehouse, "_lineage", "progress.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]
