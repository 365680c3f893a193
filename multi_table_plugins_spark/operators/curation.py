"""Training-data curation operators beyond the reference's surface:
sequence packing, stratified sampling, benchmark-contamination checks,
repetition metrics, and PII scrubbing. These are the operations a
large-scale LLM data pipeline runs over the document corpus after
ingest; the reference (a CDC/multi-table ingest plugin) has no
counterpart, so there is no file:line parity citation — semantics are
the standard published ones (concat-and-chunk packing, Gopher-style
repetition signals, hash-based deterministic sampling).

Scale notes are per-function; every hot path is pure Catalyst (no
Python UDFs), and nothing here introduces a global single-partition
window — the one classic scale-killer for this operator family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.textfns import word_shingles, words
from ..sources.multi_table import assign_range_splits

# 2^48: the sample key is the first 12 hex digits of md5, so u48/2^48 is
# a uniform double in [0, 1) computed EXACTLY (u48 < 2^53) — bit-equal
# across engines, which makes hash-gated sampling reproducible anywhere.
_U48 = float(1 << 48)


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


from . import fan_out as _fan_out  # noqa: E402  (shared parallelism guard)


def sample_key(id_col: Column | str, seed: str = "") -> Column:
    """Deterministic uniform key in [0, 1): md5 of (seed || id) — the
    standard hash-gated sampling trick. Unlike ``df.sample`` this is
    reproducible across runs, partitionings, engines, and retries
    (Spark's sample is seed+partition dependent), which is what a
    curation pipeline needs for audit and resume."""
    h = F.md5(F.concat(F.lit(seed), _c(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") / F.lit(_U48)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep a row iff
    ``sample_key(id) < fractions[stratum]``. Pure Catalyst filter — no
    shuffle, predicate-pushdown friendly, and the kept set is a stable
    function of (id, seed) so incremental runs keep the same rows.

    At 100 TB this is the only sane design: a per-stratum exact-count
    sampler needs a global count + sort per stratum; the hash gate
    needs zero passes and deviates from the target fraction by
    O(1/sqrt(n)) — negligible at corpus scale."""
    frac = F.lit(float(default_fraction))
    for stratum, p in sorted(fractions.items()):
        frac = F.when(_c(stratum_col) == stratum, F.lit(float(p))).otherwise(frac)
    return df.where(sample_key(id_col, seed) < frac)


def sequence_pack(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_splits: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing plan: lay documents end to end
    in ``id_col`` order and cut a training sequence every ``budget``
    tokens. Returns ``(id, tokens, start_offset, seq_id,
    offset_in_seq)`` where ``start_offset`` is the exclusive prefix sum
    of token counts — the packing plan a loader uses to assemble fixed-
    length training sequences.

    The naive Spark expression — ``sum().over(Window.orderBy(id))`` —
    collapses the whole corpus into ONE partition (global ordered
    window). This implementation is the distributed two-stage prefix
    sum instead:

      1. assign each row a monotone equal-width range split over the id
         (reusing the typed PK splitter, ``assign_range_splits``);
      2. aggregate per-split token totals (one partial-agg scan,
         ``num_splits`` rows to the driver) and prefix them driver-side;
      3. window per split (shuffle keyed on ``split_id``, parallelism =
         ``num_splits``) and add the split's broadcast base offset.

    Cost at scale: one tiny bounds agg + one ``num_splits``-row agg +
    one keyed shuffle — no stage ever sees more than ~1/num_splits of
    the data in a single task. Ids need not be dense, only orderable by
    the integer/date/timestamp splitter family.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    if num_splits is None:
        num_splits = spark.sparkContext.defaultParallelism
    base = df.select(_c(id_col).alias(id_col), _c(tokens_col).cast("long").alias(tokens_col))
    split = assign_range_splits(base, id_col, num_splits)

    totals = (
        split.groupBy("split_id")
        .agg(F.sum(tokens_col).alias("t"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["split_id"]):
        offsets[row["split_id"]] = acc
        acc += row["t"] or 0
    if not offsets:
        offsets = {0: 0}
    off_map = F.create_map(
        *[lit for sid in sorted(offsets) for lit in (F.lit(sid), F.lit(offsets[sid]))]
    )

    w = Window.partitionBy("split_id").orderBy(id_col)
    start = (
        F.element_at(off_map, F.col("split_id"))
        + F.sum(tokens_col).over(w)
        - F.col(tokens_col)
    ).cast("long")
    return (
        split.withColumn("start_offset", start)
        .withColumn("seq_id", F.floor(F.col("start_offset") / budget).cast("long"))
        .withColumn("offset_in_seq", (F.col("start_offset") % budget).cast("long"))
        .drop("split_id")
    )


def contamination_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    eval_mod: int = 97,
) -> DataFrame:
    """Benchmark-contamination check: for every training document, the
    fraction of its distinct k-word shingles that appear anywhere in
    the held-out eval slice (``id % eval_mod == 0`` — a deterministic
    stand-in for a real benchmark set). High overlap ⇒ the doc leaks
    eval content and should be dropped before training.

    Plan shape: the eval slice's distinct shingle set is tiny relative
    to the corpus (1/eval_mod of docs), so it is **broadcast** — the
    train side is never shuffled for the membership probe; the only
    corpus-sized exchange is the final per-doc count aggregation, which
    partial-aggregates map-side to one row per (doc, hit/total) before
    the wire. At 100 TB with a real benchmark set (MBs), identical
    shape: broadcast probe + one keyed agg."""
    # persist the slim (id, shingles) frame: it feeds the eval branch,
    # the train branch, and the size filter — without the barrier the
    # interpreted shingle HOF chain re-evaluates per consumer (no CSE in
    # interpreted projections; measured 2x wall on this operator). The
    # size filter must sit ABOVE the persist: placed below, Catalyst
    # pushes the predicate (rewritten over text) beneath the fan-out
    # Exchange, evaluating the whole shingle chain a second time on the
    # unparallelized scan partition (measured 7x on a one-file corpus)
    sh_all = (
        _fan_out(docs)
        .select(
            _c(id_col).alias(id_col),
            F.array_distinct(word_shingles(text_col, k)).alias("shingles"),
        )
        .persist()
    )
    sh = sh_all.where(F.size("shingles") > 0)
    ev = (
        sh.where(F.col(id_col) % eval_mod == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    tr = sh.where(F.col(id_col) % eval_mod != 0).select(
        id_col, F.explode("shingles").alias("s")
    )
    hits = tr.join(F.broadcast(ev.withColumn("_hit", F.lit(1))), "s", "left")
    out = hits.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("_hit").alias("n_contaminated"),
        F.round(F.count("_hit") / F.count("*"), 4).alias("contamination_frac"),
    )
    out._mtp_cached = sh_all  # caller may unpersist once materialized
    return out


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    * ``dup_word_frac`` — 1 − distinct/total words (bulk repetition);
    * ``top_2gram_frac`` — share of all word 2-grams taken by the most
      frequent one (templated/boilerplate text scores high).

    The 2-gram mode is computed by explode → two hash aggregations
    keyed on (doc, gram) then (doc) — deliberately NOT a per-row
    higher-order-function fold: counting mode inside a HOF is O(n²)
    interpreted work per document with no common-subexpression
    elimination (measured trap — see simhash history), while the
    explode path partial-aggregates map-side and scales linearly."""
    # same persist rationale as contamination_overlap: (ws, grams) feed
    # two aggregation branches; the barrier caps the word/shingle HOF
    # chain at one evaluation per row
    base = _fan_out(docs).select(
        _c(id_col).alias(id_col),
        words(text_col).alias("ws"),
        word_shingles(text_col, 2).alias("grams"),
    ).persist()
    word_stats = base.select(
        id_col,
        F.when(
            F.size("ws") > 0,
            F.round(
                1.0 - F.size(F.array_distinct("ws")) / F.size("ws").cast("double"), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
    )
    gram_counts = (
        base.select(id_col, F.explode("grams").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.round(F.max("c") / F.sum("c").cast("double"), 4).alias("top_2gram_frac"))
    )
    out = word_stats.join(gram_counts, id_col, "left").fillna(
        {"top_2gram_frac": 0.0}
    )
    out._mtp_cached = base  # caller may unpersist once materialized
    return out


def dataset_split(
    split_key: Column | str,
    fractions: dict[str, float],
    seed: str = "",
) -> Column:
    """Deterministic train/val/test assignment: partition [0, 1) into
    contiguous ranges sized by ``fractions`` (insertion order) and place
    each row by ``sample_key(split_key)``. Pass a CONTENT key — e.g.
    ``doc_fingerprint(text)`` — rather than the row id: exact duplicates
    then hash to the same range, so a doc and its copies can never
    straddle train/test (the classic eval-leakage bug that a row-id
    split bakes in). Pure Catalyst expression; zero shuffle."""
    bad = {k: v for k, v in fractions.items() if not 0 < v <= 1}
    if bad:
        # a negative fraction would make a later WHEN branch unreachable
        # (the cumulative cascade already matched) — that split silently
        # gets zero rows, so refuse malformed inputs outright
        raise ValueError(f"fractions must be in (0, 1]: {bad}")
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)

    def assign(u: Column) -> Column:
        # the hash is bound to the lambda variable so the md5 chain
        # evaluates once per row, not once per threshold branch
        out = None
        hi = 0.0
        for name in names[:-1]:
            hi += fractions[name]
            cond = u < hi
            out = F.when(cond, name) if out is None else out.when(cond, name)
        last = F.lit(names[-1])
        return out.otherwise(last) if out is not None else last

    return F.element_at(
        F.transform(F.array(sample_key(split_key, seed)), assign), 1
    ).alias("split")


#: PII patterns — deliberately RE2-safe subsets (no backrefs/lookahead)
#: so Spark (Java regex) and any RE2 engine agree token for token.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
IDNUM_RE = r"\b\d{9,}\b"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII detection + redaction: count and replace emails, dotted-quad
    IPs, and long (≥9-digit) id-like numbers. Replacement order is
    fixed (email → ip → idnum) so the passes compose deterministically
    — emails are consumed before their digit runs can match IDNUM_RE —
    and each category is COUNTED on the text its pass actually sees
    (the previous pass's output), so the audit counts always equal the
    number of placeholders in the redacted text (counting every pattern
    on the raw text would overcount, e.g. the digits of
    ``1234567890@example.com`` as both an email and an id number).

    Pure Catalyst ``regexp_count``/``regexp_replace`` — codegen'd,
    zero Python, trivially linear at any scale. Returns the redacted
    text plus per-category counts for audit."""
    t = _c(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    redacted = F.regexp_replace(after_ip, IDNUM_RE, "<IDNUM>")
    return docs.select(
        _c(id_col).alias(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(after_ip, F.lit(IDNUM_RE)).cast("long").alias("n_idnums"),
        redacted.alias("redacted_text"),
    )
