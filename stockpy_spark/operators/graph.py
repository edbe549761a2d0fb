"""Connected components — dedup clustering over near-dup pair graphs.

The missing last step of every near-dup pipeline: pair emitters
(word/ngram Jaccard, MinHash LSH, SimHash, embedding LSH — dedup.py)
produce EDGES, but what a training pipeline needs is one representative
per transitively-connected CLUSTER: if A~B and B~C, then A, B, C are one
group even when A~C was never emitted. That transitive closure is
connected components.

Implementation is iterative min-label propagation on the DataFrame API:
every vertex starts labeled with itself; each round every vertex takes
the min of its own label and its neighbors' labels; converged when no
label changes. Each round is ONE shuffle (edge-label join + min-combine,
both partial-aggregated map-side) and the loop runs O(graph diameter)
rounds — for dedup graphs, clusters are near-cliques (diameter 2-4), so
3-5 rounds at any corpus size. `localCheckpoint` truncates lineage per
round so plans don't grow; the convergence probe is an `isEmpty()` on
the changed-set, not a count. For adversarial long-chain graphs
(diameter ~n) the literature's fix is alternating large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond") — same join/groupBy primitives, O(log^2 n) rounds; not needed
for dedup-shaped graphs.

The driver holds only the loop counter and the converged flag — labels
never leave the cluster.

Reference parity: none (the reference has no graph ops); extension
surface per the LLM-pipeline brief. Oracle: DuckDB WITH RECURSIVE
reachability (registry_graph.py) — exact transitive closure, so a hash
match proves the fixpoint is the true component assignment, not an
early-stopped approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str,
    src: str,
    dst: str,
    max_iter: int = 50,
) -> DataFrame:
    """Per-vertex component labels for an undirected graph.

    Returns (``vertex_col``, component) where component = min vertex id
    reachable from the vertex (vertices absent from every edge keep
    themselves — singleton components). Edge endpoints absent from
    ``vertices`` still relay labels during propagation — components
    bridged only through such a vertex merge correctly — but they are
    excluded from the output. Edge direction is ignored.
    Raises RuntimeError if ``max_iter`` rounds don't converge (a dedup
    graph converging that slowly means the edge set is pathological —
    see the module docstring for the star-contraction alternative).
    """
    # materialize the (possibly expensive — an LSH or Jaccard pair
    # pipeline) edge derivation ONCE: without this the whole upstream
    # pair computation re-executes in every propagation round
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=False)
    )
    # Propagate over vertices ∪ edge endpoints: an endpoint missing from
    # `vertices` must still RELAY labels, else two components bridged
    # only through it would silently never merge. Endpoints not in
    # `vertices` are dropped from the output at the end.
    verts = vertices.select(F.col(vertex_col).alias("v"))
    all_v = verts.union(und.select(F.col("a").alias("v"))).distinct()
    labels = all_v.select("v", F.col("v").alias("label")).localCheckpoint(
        eager=False
    )

    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und["a"] == labels["v"])
            .groupBy(F.col("b").alias("v2"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["v"] == F.col("v2"), "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias(
                    "label"
                ),
                F.col("label").alias("__old"),
            )
        ).localCheckpoint(eager=True)
        converged = new_labels.where(
            F.col("label") != F.col("__old")
        ).isEmpty()
        labels = new_labels.drop("__old")
        if converged:
            # Restrict to the caller's vertices, then re-normalize each
            # component's label to the min id among those vertices (the
            # propagated min could be a relay endpoint's id, which must
            # not surface as a component label).
            final = labels.join(verts, "v", "semi")
            rep = final.groupBy("label").agg(F.min("v").alias("__rep"))
            return final.join(rep, "label").select(
                F.col("v").alias(vertex_col), F.col("__rep").alias("label")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the graph has extreme diameter — use star-contraction"
    )


def dedup_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    d1: str = "d1",
    d2: str = "d2",
) -> DataFrame:
    """Cluster documents by ANY near-dup pair emitter's output
    (dedup.py pair frames all emit (d1, d2, ...)). Returns one row per
    document: (id_col, component, is_representative) — keep
    ``is_representative`` rows to dedup a corpus with transitive
    closure, the policy every major corpus-dedup pipeline uses
    (min-id representative is deterministic and rerun-stable)."""
    cc = connected_components(docs, pairs, id_col, d1, d2)
    return cc.select(
        F.col(id_col),
        F.col("label").alias("component"),
        (F.col(id_col) == F.col("label")).alias("is_representative"),
    )
