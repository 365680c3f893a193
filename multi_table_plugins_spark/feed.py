"""Deterministic synthetic change-feed (binlog/WAL) generator.

Produces a directory of parquet files in CHANGE_FEED_SCHEMA shape — the
Spark-native stand-in for the reference's "N tables read in one tagged
stream" (DBTableRecordReader.java:83-85) plus the LSN ordering the CDC
north rule requires. Files are written in LSN order so a Structured
Streaming file source replays the log faithfully.

All generation is numpy-vectorized and seeded: the same parameters always
produce byte-identical events (token arrays included), which is what makes
replay-equality tests meaningful.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: epoch seconds of 2026-01-01T00:00:00Z — fixed so runs are reproducible.
_BASE_TS = 1767225600


@dataclass(frozen=True)
class FeedSpec:
    """Parameters of a synthetic change feed."""

    n_events: int = 100_000
    n_tables: int = 4
    keys_per_table: int = 2_000
    #: fraction of events concentrated on the hot key set (skew dial)
    hot_fraction: float = 0.2
    #: number of hot keys per table
    hot_keys: int = 4
    #: op mix I/U/D
    p_insert: float = 0.5
    p_update: float = 0.4
    p_delete: float = 0.1
    avg_tokens: int = 64
    max_tokens: int = 128
    vocab: int = 50_000
    n_files: int = 16
    seed: int = 42
    #: if set, events with lsn >= evolve_at_lsn carry an added column
    #: ``lang`` and a widened ``n_tok`` (int64) — milestone M5 fixture.
    evolve_at_lsn: int | None = None
    table_names: tuple[str, ...] = field(default=None)  # type: ignore[assignment]

    def tables(self) -> list[str]:
        if self.table_names:
            return list(self.table_names)
        return [f"t{i:02d}" for i in range(self.n_tables)]


def _token_list_array(rng: np.random.Generator, lengths: np.ndarray, vocab: int) -> pa.ListArray:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    values = rng.integers(0, vocab, size=int(offsets[-1]), dtype=np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values))


def generate_feed(out_dir: str, spec: FeedSpec) -> list[str]:
    """Write the change feed as ``spec.n_files`` parquet files under
    ``out_dir`` (created). Returns the file paths in LSN order."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    tables = spec.tables()

    lsn = np.arange(1, n + 1, dtype=np.int64)
    table_idx = rng.integers(0, len(tables), size=n)

    # key choice: hot-set with prob hot_fraction, else uniform over the rest
    is_hot = rng.random(n) < spec.hot_fraction
    hot = rng.integers(0, max(spec.hot_keys, 1), size=n)
    cold = rng.integers(spec.hot_keys, max(spec.keys_per_table, spec.hot_keys + 1), size=n)
    key_idx = np.where(is_hot, hot, cold)

    opc = rng.random(n)
    op = np.where(
        opc < spec.p_insert, "I", np.where(opc < spec.p_insert + spec.p_update, "U", "D")
    )
    is_del = op == "D"

    lengths = np.clip(
        rng.poisson(spec.avg_tokens, size=n), 1, spec.max_tokens
    ).astype(np.int64)
    lengths[is_del] = 0
    tokens = _token_list_array(rng, lengths, spec.vocab)

    src_pool = np.array(["web", "pdf", "code", "wiki"])
    source = src_pool[rng.integers(0, len(src_pool), size=n)]

    ts = (_BASE_TS + lsn) * 1_000_000  # microseconds, strictly increasing

    table_arr = np.array(tables)[table_idx]
    doc_id = np.char.add(
        np.char.add(table_arr, "-k"), key_idx.astype("U8")
    )

    evolved = (
        lsn >= spec.evolve_at_lsn if spec.evolve_at_lsn is not None else np.zeros(n, bool)
    )
    lang_pool = np.array(["en", "de", "fr", "ja"])
    lang = lang_pool[rng.integers(0, len(lang_pool), size=n)]

    cols: dict[str, pa.Array] = {
        "lsn": pa.array(lsn),
        "table_name": pa.array(table_arr),
        "op": pa.array(op),
        "doc_id": pa.array(doc_id),
        "tokens": tokens,
        "n_tok": pa.array(lengths.astype(np.int32)),
        "source": pa.array(source),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }
    tbl = pa.table(cols)

    # null-out payload for deletes; n_tok widened + lang added if evolving
    del_mask = pa.array(is_del)
    tbl = tbl.set_column(4, "tokens", pa.compute.if_else(del_mask, pa.nulls(n, tbl.column("tokens").type), tbl.column("tokens")))
    tbl = tbl.set_column(5, "n_tok", pa.compute.if_else(del_mask, pa.nulls(n, pa.int32()), tbl.column("n_tok")))
    tbl = tbl.set_column(6, "source", pa.compute.if_else(del_mask, pa.nulls(n, pa.string()), tbl.column("source")))

    if spec.evolve_at_lsn is not None:
        lang_col = pa.compute.if_else(
            pa.array(evolved & ~is_del), pa.array(lang), pa.nulls(n, pa.string())
        )
        tbl = tbl.append_column("lang", lang_col)

    paths: list[str] = []
    per = (n + spec.n_files - 1) // spec.n_files
    for i in range(spec.n_files):
        lo, hi = i * per, min((i + 1) * per, n)
        if lo >= hi:
            break
        part = tbl.slice(lo, hi - lo)
        if spec.evolve_at_lsn is not None:
            # pre-evolution files must NOT carry the new column / wide type,
            # so schema change genuinely happens mid-stream
            if int(part.column("lsn")[-1].as_py()) < spec.evolve_at_lsn:
                part = part.drop_columns(["lang"])
            else:
                idx = part.schema.get_field_index("n_tok")
                part = part.set_column(
                    idx, "n_tok", part.column("n_tok").cast(pa.int64())
                )
        p = os.path.join(out_dir, f"feed-{i:05d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def expected_final_state(feed_dir: str) -> "dict[str, object]":
    """Batch oracle: compute the expected final per-table state of the feed
    with plain DuckDB (LWW by lsn per (table_name, doc_id); latest op 'D'
    → row absent). Returns {table_name: pandas.DataFrame sorted by doc_id}.

    Used by tests to assert streamed/merged state == batch-applied oracle.
    """
    import duckdb

    con = duckdb.connect()
    q = f"""
        WITH latest AS (
            SELECT *, row_number() OVER (
                PARTITION BY table_name, doc_id ORDER BY lsn DESC
            ) AS rn
            FROM parquet_scan('{feed_dir}/*.parquet', union_by_name=true)
        )
        SELECT * EXCLUDE (rn) FROM latest WHERE rn = 1 AND op <> 'D'
        ORDER BY table_name, doc_id
    """
    pdf = con.execute(q).df()
    return {t: g.reset_index(drop=True) for t, g in pdf.groupby("table_name")}
