"""Distributed connected components — the step that turns PAIRWISE
near-duplicate evidence into DEDUP GROUPS.

Every similarity stage in the engine (`dedup.token_set_jaccard_join`,
MinHash-LSH, SimHash, winnowing, embedding near-dup) emits candidate
PAIRS; production dedup must then cluster those pairs and keep one
document per cluster. Union-find is the single-machine answer and does
not distribute; the scalable formulation is iterative MIN-LABEL
propagation ("hash-min"): every node starts labeled with itself, and
each round takes the min of its own and its neighbors' labels. The
round count is the cluster DIAMETER — near-dup graphs are dense
clumps with tiny diameters (2-4 rounds in practice), which is why this
simple kernel is the one real text-dedup pipelines run; for
adversarially long path graphs the star-contraction family (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014)
converges in O(log n) rounds at the cost of mutating the edge set —
the label join below is the building block either way.

Scale shape per round: one shuffle to co-locate edge endpoints with
labels, one shuffle for the per-node min — both keyed on node id, so a
cluster-wide run reuses the same hash partitioning round to round. The
edge set itself is never mutated or collected; convergence is a
changed-label COUNT (one scalar action per round), not a driver-side
materialization. Labels are monotonically non-increasing, so the
algorithm cannot oscillate and `max_iter` is a safety bound, not a
tuning knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25,
                         out_node: str = "node",
                         out_component: str = "component") -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    `component` is the SMALLEST node id in the node's connected
    component — the canonical representative real dedup keeps.
    Undirected: each input pair is symmetrized. Self-loops and
    duplicate edges are harmless (min is idempotent). Raises if the
    propagation has not converged after `max_iter` rounds."""
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .union(edges.select(F.col(dst).alias("a"),
                             F.col(src).alias("b")))
         .distinct())
    labels = (e.select(F.col("a").alias("n")).distinct()
              .withColumn("lbl", F.col("n")))
    # cache both sides: the edge set is reused every round, and labels
    # feed two plans per round (the join and the convergence count)
    e = e.persist()
    labels = labels.persist()
    try:
        for _round in range(max_iter):
            neighbor_min = (e.join(labels, e.b == labels.n, "inner")
                            .groupBy("a").agg(F.min("lbl").alias("nmin")))
            new_labels = (labels.join(neighbor_min,
                                      labels.n == neighbor_min.a, "left")
                          .select(F.col("n"),
                                  F.least(F.col("lbl"),
                                          F.coalesce(F.col("nmin"),
                                                     F.col("lbl")))
                                  .alias("lbl"))
                          .persist())
            changed = (new_labels.alias("new")
                       .join(labels.alias("old"), "n")
                       .filter(F.col("new.lbl") != F.col("old.lbl"))
                       .count())
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels.select(F.col("n").alias(out_node),
                                     F.col("lbl").alias(out_component))
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds — pathological diameter; switch to star contraction")
    finally:
        e.unpersist()


def component_sizes(components: DataFrame,
                    component_col: str = "component") -> DataFrame:
    """(component, n_members) — the cluster-size histogram dedup
    reporting wants (one extra keyed agg, partial-aggregated)."""
    return (components.groupBy(component_col)
            .agg(F.count("*").alias("n_members")))


def keep_min_per_component(components: DataFrame,
                           node_col: str = "node",
                           component_col: str = "component") -> DataFrame:
    """The dedup decision: keep the canonical (minimum-id) member of
    every component — with min-labeling that is simply the rows where
    node == component, a filter, not another shuffle."""
    return components.filter(F.col(node_col) == F.col(component_col))
