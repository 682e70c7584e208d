"""Graph operators for dedup pipelines: connected components over
near-duplicate pair edges.

Pair mining (minhash / n-gram Jaccard / SRP cosine) yields EDGES; the unit
of deduplication is the CLUSTER — transitively-connected documents that
all collapse to one canonical id. That closure step is connected
components, the one dedup stage plain SQL can't express without recursion.

Two implementations, same fixpoint:

- ``connected_components``: iterative min-label propagation — every node
  starts labeled with itself; each round, a node adopts the minimum label
  among itself and its neighbors; converged when no label changes. Each
  round is one join + one grouped min (both shuffles on the node key), so
  a round costs O(|E|) and the round count is the cluster diameter — tiny
  for near-dup clusters (dups of a doc are dups of each other; diameters
  are 1-3).
- ``connected_components_pd``: the scale path for adversarial long-chain
  graphs — each round HOOKS (min over neighbors, as above) then POINTER
  JUMPS (label(n) <- label(label(n)), a self-join on the label table).
  The jump halves the depth of every label-pointer chain, so a
  diameter-D path converges in O(log D) rounds instead of O(D): a
  256-node chain finishes in ~9 rounds where plain propagation needs 255
  (property-tested in tests/test_llm_ops.py). The jump join shuffles the
  label table (O(|V|)), strictly smaller than the hook's O(|E|) — the
  extra round cost is bounded by what the hook already pays.

Determinism: min-label is order-free; the fixpoint is unique, so any
execution schedule yields identical clusters (the DuckDB recursive-CTE
oracle certifies this in queries_llm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.checkpoint import eager_checkpoint

# Below this many (undirected) edges the driver union-find path is used:
# each distributed round schedules ~6 jobs over near-empty shuffle
# partitions — measured ~4.1s for a 590-edge sf0.1 graph
# (.profiling/prof_exact_dedup_r10.py session) — while 100k edges
# union-find in well under a second in-process and the label table they
# span is at most 200k rows. Past the threshold the distributed loop
# runs unchanged; the collect is bounded by the guard, by construction.
CC_DRIVER_MAX_EDGES = 100_000


def _cc_driver(und: DataFrame, dtype) -> DataFrame:
    """Union-find over a collected (bounded, see CC_DRIVER_MAX_EDGES)
    edge list — same fixpoint as the distributed loops: every union
    attaches the larger root under the smaller, so inductively each
    component's root is its minimum node id."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in und.select("n", "m").collect():
        n, m = r[0], r[1]
        parent.setdefault(n, n)
        parent.setdefault(m, m)
        ra, rb = find(n), find(m)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = [(x, find(x)) for x in parent]
    schema = StructType(
        [StructField("node", dtype), StructField("cluster_id", dtype)]
    )
    return und.sparkSession.createDataFrame(labels, schema)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    driver_max_edges: int = CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Cluster assignment for every node appearing in ``edges``.

    Output: (node, cluster_id) — cluster_id is the minimum node id in the
    component (the canonical-document convention of exact_duplicates).
    Raises if not converged within ``max_iter`` rounds (diameter bound).

    Small graphs (at most ``driver_max_edges`` edges — known after the
    one mandatory materialization of the mined pairs) take a driver-side
    union-find instead of the iterative joins: identical fixpoint, none
    of the per-round job-scheduling constant that dominates below ~100k
    edges. Pass ``driver_max_edges=0`` to force the distributed loop.
    """
    # Materialize the edge set once: every round (and its convergence
    # count) re-reads it, and the upstream lineage is typically a whole
    # pair-mining pipeline — without this, each round recomputes that
    # pipeline from scratch.
    und = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .unionByName(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .transform(eager_checkpoint)
    )
    if und.count() <= 2 * driver_max_edges:
        return _cc_driver(und, edges.schema[src].dataType)
    labels = und.select("n").distinct().withColumn("label", F.col("n"))

    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels.withColumnRenamed("n", "m"), "m")
            .groupBy("n")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "n", "left")
            .select(
                "n",
                F.least(
                    "label", F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        # Checkpoint BEFORE the convergence count: the count is the round's
        # first action, and running it against the un-checkpointed plan
        # would execute the join once for the count and again for the
        # checkpoint — double work per round.
        new_labels = new_labels.transform(eager_checkpoint)
        # Convergence: no node improved its label this round. The count is
        # a small driver-side scalar (control flow, not data collection).
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "n")
            .filter(F.col("a.label") != F.col("b.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("n").alias("node"), F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds the bound — raise max_iter or use "
        "connected_components_pd (pointer doubling) for long-chain graphs"
    )


def connected_components_pd(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    driver_max_edges: int = CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Pointer-doubling connected components: hook + pointer jump per
    round, O(log D) rounds on a diameter-D graph (see module docstring).

    Same contract and fixpoint as ``connected_components`` — output
    (node, cluster_id), cluster_id = min node id in the component; raises
    past ``max_iter``. Min-label keeps the invariant label(n) <= n, and
    every label is itself a node, so the jump join always finds its
    target; label values only ever decrease, which makes the fixpoint
    unique and the convergence check (no change) exact. Small graphs
    take the same driver union-find fast path as
    ``connected_components`` (``driver_max_edges=0`` forces the loop)."""
    und = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .unionByName(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .transform(eager_checkpoint)
    )
    if und.count() <= 2 * driver_max_edges:
        return _cc_driver(und, edges.schema[src].dataType)
    labels = und.select("n").distinct().withColumn("label", F.col("n"))

    for _ in range(max_iter):
        # Hook: adopt the minimum label in the closed neighborhood.
        neighbor_min = (
            und.join(labels.withColumnRenamed("n", "m"), "m")
            .groupBy("n")
            .agg(F.min("label").alias("nbr_label"))
        )
        hooked = labels.join(neighbor_min, "n", "left").select(
            "n",
            F.least("label", F.coalesce("nbr_label", F.col("label"))).alias("label"),
        )
        # Pointer jump: label(n) <- label(label(n)). A label chain
        # n -> l -> l' flattens to n -> l' — depth halves every round.
        parent = hooked.select(
            F.col("n").alias("_pn"), F.col("label").alias("_plabel")
        )
        jumped = (
            hooked.join(parent, hooked.label == parent._pn, "left")
            .select(
                "n",
                F.least(
                    "label", F.coalesce("_plabel", F.col("label"))
                ).alias("label"),
            )
        )
        # Checkpoint BEFORE the convergence count (same double-execution
        # trap as the propagation variant).
        new_labels = jumped.transform(eager_checkpoint)
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "n")
            .filter(F.col("a.label") != F.col("b.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("n").alias("node"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"connected_components_pd did not converge in {max_iter} rounds "
        f"(covers diameter ~2^{max_iter}); the graph is adversarial even "
        "for pointer doubling — raise max_iter"
    )
