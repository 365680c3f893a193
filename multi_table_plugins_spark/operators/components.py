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


def _cc_union_find(edge_rows, node_type, spark) -> DataFrame:
    """Driver-side union-find with path compression over a bounded edge
    list — O(edges α(edges)) and instant, versus ~1 s of scheduling per
    distributed round. Only reached below ``small_graph_edges``."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # component id = MIN member id (the distributed path's labeling)
    min_of_root: dict = {}
    for n in parent:
        r = find(n)
        m = min_of_root.get(r)
        if m is None or n < m:
            min_of_root[r] = n
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField("node", node_type, False),
            StructField("comp", node_type, False),
        ]
    )
    rows = [(n, min_of_root[find(n)]) for n in parent]
    return spark.createDataFrame(rows, schema)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    small_graph_edges: int = 500_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id of the component.

    Adaptive execution: ONE ``limit(threshold+1).collect()`` both sizes
    the pair graph and fetches it — at or below ``small_graph_edges``
    the collected list IS the complete edge set and driver-side
    union-find solves it instantly (bounded: 500k edges ≈ tens of MB —
    near-dup pair graphs are usually minuscule next to the corpus, and
    each distributed round costs ~1 s of pure job scheduling regardless
    of size; union-find is duplicate-edge-insensitive, so no distinct
    pass is needed). Above the threshold the limit short-circuits
    cheaply and the distributed min-label-propagation + pointer-jumping
    loop runs — the 100 TB path (a billion-edge graph never touches the
    driver)."""
    # null endpoints participate in no pair on EITHER path (the
    # distributed equi-joins never match null; the union-find would
    # TypeError comparing None to an id) — drop them up front
    pairs = pairs.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
    undirected = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    probe = undirected.limit(small_graph_edges + 1).collect()
    if len(probe) <= small_graph_edges:
        # node type = the UNION-coerced type of both endpoint columns
        # (an int src / long dst frame must not label longs into an
        # int field) — schema analysis only, no job
        node_type = (
            pairs.select(F.col(src).alias("n"))
            .unionByName(pairs.select(F.col(dst).alias("n")))
            .schema["n"]
            .dataType
        )
        return _cc_union_find(
            [(r["a"], r["b"]) for r in probe],
            node_type,
            pairs.sparkSession,
        )
    edges = (
        undirected.unionByName(
            pairs.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
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
