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
