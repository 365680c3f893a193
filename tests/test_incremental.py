"""Incremental near-dup against a persisted signature index: the probe
must (a) equal the full recompute on old ∪ new restricted to pairs
touching the new batch, (b) read only band-matched index partitions,
and (c) refuse parameter-mismatched appends."""

import os

import pytest
from pyspark.sql import functions as F

from multi_table_plugins_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from multi_table_plugins_spark.operators.incremental import (
    _BUCKET,
    build_signature_index,
    incremental_near_dup,
)

SF_DIR = "/root/testdata/sf0.001"
PARAMS = dict(num_hashes=32, num_bands=16, shingle_k=3, hash_fn="md5", band_hash="md5")
THRESHOLD = 0.3


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _full_pairs_touching_new(docs):
    """Oracle-in-miniature: full LSH recompute over ALL docs, restricted
    to pairs where at least one side is in the new batch."""
    sigs = minhash_signatures(
        docs, num_hashes=32, shingle_k=3, hash_fn="md5"
    ).filter(F.size("shingles") > 0)
    pairs = lsh_candidate_pairs(
        sigs, num_bands=16, threshold=THRESHOLD, num_hashes=32, band_hash="md5"
    )
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 4))
        for r in pairs.collect()
        if r["id_a"] % 5 == 0 or r["id_b"] % 5 == 0
    }


def _probe_set(pairs_df):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 4))
        for r in pairs_df.collect()
    }


def test_incremental_equals_full_recompute(spark, docs, tmp_path):
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "idx")
    build_signature_index(old, idx, n_bh_buckets=32, **PARAMS)
    got = _probe_set(incremental_near_dup(spark, new, idx, threshold=THRESHOLD))
    want = _full_pairs_touching_new(docs)
    assert want, "fixture must produce at least one new-touching pair"
    assert got == want


def test_probe_reads_only_matched_partitions(spark, docs, tmp_path):
    old = docs.filter(F.col("doc_id") % 5 != 0)
    idx = str(tmp_path / "idx")
    build_signature_index(old, idx, n_bh_buckets=32, **PARAMS)
    n_parts = len(
        [d for d in os.listdir(os.path.join(idx, "bands")) if d.startswith(_BUCKET)]
    )
    # a tiny probe batch bands into far fewer buckets than the index has
    tiny = docs.filter(F.col("doc_id").isin(0, 5)).persist()
    assert tiny.count() == 2
    out = incremental_near_dup(spark, tiny, idx, threshold=THRESHOLD)
    out.collect()
    read_paths = out._mtp_probe_paths
    # 2 docs × 16 bands = at most 32 distinct buckets, and every read
    # path must be a real partition directory of the index
    assert 0 < len(read_paths) <= 32
    assert len(read_paths) < n_parts or n_parts <= 32
    for p in read_paths:
        assert os.path.isdir(p) and f"/{_BUCKET}=" in p
    tiny.unpersist()


def test_append_then_reprobe_is_stable(spark, docs, tmp_path):
    """Appending the new batch to the index and probing with it again
    must return the same pairs (self-matches are deduped, shingle store
    id collisions resolved), proving append + probe composes."""
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "idx")
    build_signature_index(old, idx, n_bh_buckets=32, **PARAMS)
    before = _probe_set(incremental_near_dup(spark, new, idx, threshold=THRESHOLD))
    build_signature_index(new, idx, n_bh_buckets=32, mode="append", **PARAMS)
    after = _probe_set(incremental_near_dup(spark, new, idx, threshold=THRESHOLD))
    assert after == before


def test_append_rejects_mismatched_family(spark, docs, tmp_path):
    old = docs.filter(F.col("doc_id") % 5 != 0)
    idx = str(tmp_path / "idx")
    build_signature_index(old, idx, n_bh_buckets=32, **PARAMS)
    bad = dict(PARAMS, num_bands=8)
    with pytest.raises(ValueError, match="hash families must match"):
        build_signature_index(old, idx, n_bh_buckets=32, mode="append", **bad)
