#!/usr/bin/env python
"""Benchmark runner. Prints ONE JSON line.

Two parts:
  1. **CDC apply throughput** (the BASELINE.json metric): replay a
     deterministic synthetic change feed through the streaming engine
     (file-source tail → foreachBatch → LWW MERGE into lakehouse tables)
     at two parallelism levels — local[N/4] and local[N] (sandbox proxy
     for N vs 4N executors) — and report events/sec at both plus scaling
     efficiency = (eps_4N / eps_N) / 4.
  2. **Headline queries** at $SPARK_GRAFT_SF_DIR (default sf0.1): per-
     query wall seconds on the local[N] session.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
MTP_BENCH_EVENTS (default 1.5M), MTP_BENCH_SKIP_SCALING=1 to skip the
small-parallelism run (faster iteration).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_table_plugins_spark.feed import FeedSpec, generate_feed  # noqa: E402
from multi_table_plugins_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("MTP_BENCH_EVENTS", "8000000"))
CDC_REPS = int(os.environ.get("MTP_BENCH_REPS", "3"))
SKIP_SCALING = os.environ.get("MTP_BENCH_SKIP_SCALING") == "1"

# Memory-backed scratch when available: the scaling criterion measures
# CPU-side apply throughput (a cluster has NVMe/object-store bandwidth per
# executor); a single sandbox disk's dirty-page writeback stalls would
# otherwise dominate and corrupt the N-vs-4N comparison.
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

BENCH_SPEC = FeedSpec(
    n_events=N_EVENTS,
    n_tables=8,
    keys_per_table=150_000,
    hot_fraction=0.15,
    hot_keys=8,
    avg_tokens=64,
    n_files=128,  # scan parallelism: files per trigger ≥ cores
    seed=42,
)

HEADLINE = (
    "pricing_summary",
    "sql_statement_join",
    "lww_latest_by_key",
    "cdc_final_state",
    "hourly_rollup",
    "dedup_exact",
    "doc_fingerprint",
    "token_count_quality",
    "ann_cosine_topk",
    "minhash_near_dup",
    "lsh_ann_topk",
)


def _feed_dir() -> str:
    """Generate (once, cached) the bench feed outside the timed section."""
    key = f"{BENCH_SPEC.n_events}-{BENCH_SPEC.n_tables}-{BENCH_SPEC.seed}-{BENCH_SPEC.avg_tokens}-{BENCH_SPEC.n_files}"
    d = os.path.join(SCRATCH, f"mtp_bench_feed_{key}")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        generate_feed(d, BENCH_SPEC)
        open(marker, "w").close()
    return d


def _clean_scratch() -> None:
    import glob

    for d in glob.glob(os.path.join(SCRATCH, "mtp_bench_wh_*")):
        shutil.rmtree(d, ignore_errors=True)


def _one_cdc_run(cores: int, feed_dir: str) -> float:
    from multi_table_plugins_spark.streaming import run_cdc_stream

    spark = get_spark(
        f"mtp-bench-cdc-{cores}",
        cores=cores,
        extra_conf={
            "spark.local.dir": SCRATCH,
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g"),
        },
    )
    work = tempfile.mkdtemp(prefix=f"mtp_bench_wh_{cores}_", dir=SCRATCH)
    wh = os.path.join(work, "wh")
    ckpt = os.path.join(work, "ckpt")
    t0 = time.time()
    q = run_cdc_stream(
        spark,
        feed_dir,
        wh,
        ckpt,
        app_id="bench",
        max_files_per_trigger=32,
        n_buckets=16,
        compact_threshold=16,
        max_parallel_tables=8,
        validate=True,
    )
    q.awaitTermination()
    wall = time.time() - t0
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return wall


def run_scaling(core_levels: list[int], feed_dir: str, reps: int = CDC_REPS) -> dict:
    """Timed replays at every parallelism level, reps INTERLEAVED across
    levels (8,32,8,32,…) so slow drift in this shared-VM sandbox (hypervisor
    steal, page-cache state) hits all levels equally; per-level result is
    the best rep. The py4j JVM persists across runs, so after main()'s
    warmup every level executes equally JIT-compiled code."""
    walls: dict[int, list[float]] = {c: [] for c in core_levels}
    for _ in range(reps):
        for c in core_levels:
            _clean_scratch()
            walls[c].append(_one_cdc_run(c, feed_dir))
    out = {}
    for c in core_levels:
        wall = min(walls[c])
        out[c] = {
            "cores": c,
            "wall_sec": round(wall, 2),
            "wall_all": [round(w, 2) for w in walls[c]],
            "events_per_sec": round(BENCH_SPEC.n_events / wall, 1),
        }
    return out


def run_queries() -> tuple[dict, float]:
    import __spark_entry__ as entrymod

    spark = get_spark("mtp-bench-queries", cores=CPUS)
    qs = entrymod.queries()
    out = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        out[name] = round(dt, 3)
        total += dt
    spark.stop()
    return out, total


def main() -> None:
    feed_dir = _feed_dir()

    small_cores = max(CPUS // 4, 2)
    # JIT warmup: one throwaway replay in this JVM so the timed runs at
    # both parallelism levels execute C2-compiled code
    _clean_scratch()
    _one_cdc_run(CPUS, feed_dir)
    levels = [CPUS] if SKIP_SCALING else [small_cores, CPUS]
    scaling = run_scaling(levels, feed_dir)
    results = {"large": scaling[CPUS]}
    if not SKIP_SCALING:
        results["small"] = scaling[small_cores]

    if "small" in results:
        eff = (
            results["large"]["events_per_sec"]
            / results["small"]["events_per_sec"]
            / (CPUS / small_cores)
        )
    else:
        eff = None

    queries, _ = run_queries()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    line = {
        "metric": "cdc_apply_throughput",
        "value": results["large"]["events_per_sec"],
        "unit": "events/sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cdc": {
            "n_events": BENCH_SPEC.n_events,
            "n_tables": BENCH_SPEC.n_tables,
            f"local{small_cores}": results.get("small"),
            f"local{CPUS}": results["large"],
            "scaling_efficiency": round(eff, 3) if eff is not None else None,
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
