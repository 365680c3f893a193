"""Connected components over near-duplicate pair graphs — the exact
cluster semantics for dedup at scale (pairwise greedy removal is only an
approximation when clusters aren't cliques; see dedup.minhash_dedup).

Algorithm: iterated min-label propagation (the DataFrame form of
large-star/small-star): every node adopts the minimum label in its
closed neighborhood until a fixpoint. Each round is one join + one
aggregation (both keyed shuffles); rounds needed = graph diameter in
label-space, which for near-dup clusters (tiny diameters) is 2-4. The
iteration count and convergence are driver-controlled — a genuinely
iterative algorithm the SQL oracle can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id of the component."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    from pyspark.sql import Observation

    comp_type = labels.schema["comp"].dataType
    converged = False
    for _ in range(max_iter):
        # propagate: each node's candidate = min(own comp, neighbors' comps).
        # Each node's PREVIOUS label rides along as ``_old`` (null on the
        # neighbor rows; min() ignores nulls and every node contributes
        # exactly one self row) so the convergence check below costs zero
        # extra jobs.
        neigh = (
            edges.join(labels, edges["b"] == labels["node"], "inner")
            .select(
                F.col("a").alias("node"),
                F.col("comp"),
                F.lit(None).cast(comp_type).alias("_old"),
            )
        )
        prop = (
            labels.select("node", "comp", F.col("comp").alias("_old"))
            .unionByName(neigh)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.min("_old").alias("_old"))
        )
        # pointer jumping: re-map every label to ITS label's label
        # (comp -> comp's comp), squaring the label graph — label depth
        # halves per round, so convergence is O(log diameter) rounds
        # instead of O(diameter)
        jump = prop.select(F.col("node").alias("_j_node"), F.col("comp").alias("_j_comp"))
        # the changed-row count is OBSERVED on the same job that
        # materializes the round (the eager localCheckpoint) — previously
        # this was a separate join + limit(1).count() per round, ~1/3 of
        # the query's jobs
        obs = Observation()
        new_labels = (
            prop.join(jump, prop["comp"] == jump["_j_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("_j_comp"), F.col("comp")).alias("comp"),
                "_old",
            )
            .observe(
                obs,
                F.sum((F.col("comp") != F.col("_old")).cast("long")).alias(
                    "changed"
                ),
            )
            .select("node", "comp")
            # localCheckpoint truncates the logical plan: the iterated
            # join otherwise nests the plan tree exponentially and blows
            # up the OPTIMIZER (heap) long before the data is large
            .localCheckpoint(eager=True)
        )
        changed = obs.get.get("changed") or 0
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # silently returning partial labels would split components and
        # leave duplicates behind in dedup_keep_canonical
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds (label-graph diameter too large); raise "
            "max_iter — pointer jumping needs only O(log diameter) rounds"
        )
    return labels.select("node", "comp")


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Exact cluster dedup: keep exactly one row (the min id) per
    connected component of the near-dup graph; rows in no pair survive."""
    comps = connected_components(pairs, src, dst)
    losers = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
