"""Duplicate-GROUP resolution: connected components over candidate pairs.

Every pair finder in this package (minhash/simhash/jaccard/embedding)
emits EDGES — (id_a, id_b) — but a dedup pipeline acts on GROUPS: all
transitively-connected documents form one duplicate cluster, of which one
canonical survivor is kept. A is a near-dup of B and B of C, yet the
(A, C) pair may be absent (distance just over threshold), so pair-level
survivorship (keep min id of each pair) double-keeps; group resolution is
the missing step between candidate pairs and an actual deletion list at
100 TB.

Algorithm: iterative min-label propagation as DataFrame joins — every
node starts labeled with itself; each round every node takes the min
label among itself and its neighbors; fixed point = components labeled
by their minimum member id. Rounds needed = the graph diameter, and
near-dup graphs are dense clusters with tiny diameters (threshold
overlaps chain only a few hops), so 2-5 rounds are typical. Per round:
ONE shuffle join (edges × labels, both keyed small tables — edges are
O(pairs), labels O(nodes-with-a-duplicate), a small fraction of the
corpus) + a min-aggregation; ``localCheckpoint`` cuts lineage every
round so the plan stays bounded (the same fix the DDL rename chain
uses). Convergence is detected by an any-label-changed probe and a
``max_iters`` bound fails loudly rather than looping forever. For
adversarial long-chain graphs the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce and Beyond") drops
into the same loop shape; min-label is the right default for dedup
workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(node, group_id) for every node appearing in ``pairs``;
    group_id = the component's minimum node id (deterministic canonical
    representative)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # eager: bounded plan + one compute per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("group_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "the pair graph's diameter exceeds the bound (raise max_iters, or "
        "use a star-contraction variant for adversarial chain graphs)"
    )


def duplicate_groups(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(doc_id, group_id, group_size, is_canonical) per document that has
    at least one near-duplicate — the actionable dedup output: keep rows
    with ``is_canonical`` (the group's min id), drop the rest."""
    cc = connected_components(pairs, src, dst, max_iters)
    w = Window.partitionBy("group_id")
    return cc.select(
        F.col("node").alias("doc_id"),
        "group_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("node") == F.col("group_id")).alias("is_canonical"),
    )
