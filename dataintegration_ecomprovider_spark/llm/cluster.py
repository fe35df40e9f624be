"""Connected-components clustering for near-duplicate groups.

LSH candidate generation (llm/dedup.py) yields PAIRS; a real dedup pass
needs GROUPS — if A~B and B~C, then {A,B,C} is one duplicate cluster and
exactly one representative survives.  That is connected components over
the candidate-pair graph.

Scale design: the classic PySpark trap is collecting edges to the driver
and running union-find — O(edges) driver memory.  This implementation is
pure DataFrame iteration, a hash-min label propagation with POINTER
JUMPING (label <- label(label) each round, the Shiloach-Vishkin shortcut),
so convergence is O(log(diameter)) rounds, not O(diameter): a 1M-node
duplicate chain converges in ~20 rounds where naive propagation needs 1M.
Each round is two shuffles (one groupBy, one self-join), lineage is cut
with localCheckpoint so the plan does not grow across iterations, and the
loop early-stops on a converged round (one count() action per round — the
operator is inherently iterative; the count rides on the checkpoint it
would materialize anyway).

Duplicate clusters from LSH are near-cliques of small diameter, so in
practice 2-3 rounds converge; the pointer-jumping bound is for the
adversarial chain case.

Reference has no graph operator (dedup there is per-key hashtables,
src/EcomDestinationWriter.cs:1269-1278); this is a north-star LLM-pipeline
extension (BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    the minimum node id reachable, so ids double as stable cluster keys.

    Deterministic: no RNG, no monotonically_increasing_id — output is a
    pure function of the edge set, identical across retries and cluster
    sizes.  Raises if max_rounds is exhausted before convergence (only
    reachable with a graph whose diameter exceeds 2^max_rounds)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).filter(
        F.col("a") != F.col("b")
    )
    # initial label: min(self, direct neighbors) — one shuffle
    nodes = e.select(F.col("a").alias("node")).distinct()
    e = e.localCheckpoint(eager=True)
    lab = (
        e.union(nodes.select(F.col("node").alias("a"), F.col("node").alias("b")))
        .groupBy("a")
        .agg(F.min("b").alias("label"))
        .withColumnRenamed("a", "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # propagate: candidate label for u = min over neighbors' labels
        prop = (
            e.join(lab.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "label")
        )
        new = (
            lab.select("node", "label")
            .union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label <- min(label, label(label)) — halves chain
        # depth every round (log-round convergence on path graphs)
        jumped = (
            new.alias("x")
            .join(
                new.select(
                    F.col("node").alias("label"), F.col("label").alias("label2")
                ).alias("y"),
                "label",
                "left",
            )
            .select(
                F.col("node"),
                F.least(F.col("label"), F.coalesce("label2", "label")).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.join(lab.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        lab = jumped
        if changed == 0:
            return lab.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Assign every document its duplicate-cluster id (min doc id in the
    component; singletons are their own cluster) and flag the canonical
    survivor.  Filtering `is_canonical` is the keep-one-per-cluster dedup.

    The docs side is only left-joined against the (small) component map —
    the corpus is never shuffled, so at 100 TB this costs one broadcast-ish
    join over however many docs actually had a near-dup candidate."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.join(
            comp.withColumnRenamed("node", id_col), id_col, "left"
        )
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )
