"""Connected components by alternating large-star / small-star joins
(SURVEY §7.1 M6, J8) — the canonicalization kernel.

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public): maintain a parent pointer per node;
  large-star: for each edge (u,v), attach every neighbour larger than u
              to u's current minimum neighbour;
  small-star: attach u and its smaller neighbours to the overall min.
Implemented here as the simpler but equivalently-converging "hash-to-min"
variant: iterate  label(v) <- min(label(v), min over neighbours(label(u)))
until no label changes.  Each iteration is one shuffle join + one
aggregation; lineage is truncated with ``localCheckpoint`` every
iteration so the plan doesn't grow (SURVEY §4.3.3).

Works on arbitrary id types (we use string entity ids; min = lexical).
Converges in O(diameter) iterations; alias graphs are near-star-shaped so
3-5 iterations suffice.  A hard iteration cap guards pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 50) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node id
    per component (self-loops and duplicate/reversed edges welcome)."""
    # checkpoint the symmetrized edge set FIRST (r07): the initial
    # labels derive from it, so ordering the barriers sym -> labels
    # runs the (possibly expensive — LSH candidate generation in
    # resolve_duplicates) upstream edge pipeline ONCE; the old order
    # computed it under both checkpoints.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    ).localCheckpoint()
    # initial label: min(self, min neighbour)
    labels = (
        sym.groupBy("a").agg(F.min("b").alias("nb"))
        .select(F.col("a").alias("node"),
                F.least(F.col("a"), F.col("nb")).alias("comp"))
    ).localCheckpoint()

    for _ in range(max_iter):
        # propagate: candidate label for each node = min(label of neighbours)
        cand = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .groupBy("a").agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(cand.withColumnRenamed("a", "node"), on="node", how="left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias("comp"),
                (F.col("ncomp") < F.col("comp")).alias("changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.select("node", "comp")
        if changed == 0:
            # propagation fixpoint: comp(v) <= comp(u) across every
            # (symmetric) edge, so comp is CONSTANT per component and
            # equals the reachable min — the pointer jump below would
            # be the identity; returning here saves its barrier job
            # (r07; the result is provably identical).
            return labels
        # pointer-jumping (path doubling): comp <- label(comp); turns the
        # O(diameter) propagation into O(log diameter) rounds on chains.
        parent = labels.select(F.col("node").alias("comp"),
                               F.col("comp").alias("gcomp"))
        labels = (
            labels.join(parent, on="comp", how="left")
            .select("node",
                    F.least(F.col("comp"), F.coalesce("gcomp", "comp")).alias("comp"))
        ).localCheckpoint()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations")
