"""Connected-components resolution for near-duplicate pair graphs —
the keep-one stage of dedup (SURVEY.md §2.10).

Every near-dup operator in this engine (minhash / simhash / n-gram /
embedding LSH) emits verified PAIRS; a training-data pipeline needs the
final deduplicated corpus, which means resolving the pair graph into
components and keeping one representative per component. The reference
has no dedup at all (its corpus is 50 curated rows,
sql/03_seed_data.sql:2-51) — this is part of the [EXT] pipeline surface.

Spark-first shape: min-label propagation with path-halving pointer
jumping (the MapReduce connected-components recipe of Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature). Each round is two equi-joins + one min-aggregate, all
shuffle-partitioned on node id, and labels only ever decrease toward
the component minimum:

    propagate:  comp(v) ← min(comp(v), min over neighbors u of comp(u))
    jump:       comp(v) ← comp(comp(v))        (path halving)

Propagation alone needs O(diameter) rounds; the jump step halves label
paths each round, giving O(log d) convergence — near-dup components are
cliques/stars/short chains (d ≤ ~10 even for pathological boilerplate
chains), so 2-4 rounds in practice. Each round `localCheckpoint`s the
label frame: iterative self-joins otherwise stack lineage that Spark
re-executes from the scan every round (the classic iterative-algorithm
trap). Convergence is detected by a changed-label count hitting zero;
`max_iter` bounds the worst case.

At 100 TB the edge list is the near-dup pair output — orders of
magnitude smaller than the corpus (pairs ∝ duplicates, not documents) —
so every round's joins are cheap relative to the LSH stage that made
the pairs. The final keeper join back to the corpus is a left-anti on
the (small) non-keeper set — broadcastable whenever the duplicate count
is, and AQE decides that at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Resolve an undirected pair graph to components.

    (id_a, id_b) edges → (node, comp) where ``comp`` is the minimum
    node id in the node's connected component. Only nodes that appear
    in at least one pair are returned (isolated corpus rows are their
    own trivial components and never need a row here — keeper logic
    treats absence as "keep").
    """
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint()
    )
    prev_sum = object()  # sentinel: never equal to a real sum
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(edges["a"].alias("n2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        prop = (
            labels.join(nbr, labels["node"] == nbr["n2"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
        )
        ptr = prop.select(F.col("node").alias("p_node"), F.col("comp").alias("p_comp"))
        jumped = (
            prop.join(ptr, prop["comp"] == ptr["p_node"], "left")
            .select("node", F.coalesce("p_comp", "comp").alias("comp"))
            .localCheckpoint()
        )
        labels = jumped
        # labels only ever decrease, so Σcomp is a strictly-monotone
        # convergence witness: one cheap aggregate per round, no
        # changed-labels join. (sum() is None on an empty graph.)
        # decimal(38,0) sum: immune to long overflow at any node count
        label_sum = jumped.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    edges.unpersist()
    return labels


def keep_first(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Deduplicated corpus: resolve ``pairs`` to components and keep the
    minimum-id row of each component (plus every row in no pair at all).

    The drop set is the non-keeper nodes — |duplicates| rows, tiny next
    to the corpus — removed with a left-anti join (AQE broadcasts it
    when it fits).
    """
    comp = connected_components(pairs, id_a, id_b, max_iter)
    drop = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def dup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Component summary of a pair graph: (comp, n_members) per
    duplicate group (size ≥ 2 by construction — singletons never pair)."""
    comp = connected_components(pairs, id_a, id_b, max_iter)
    return comp.groupBy("comp").agg(F.count("*").alias("n_members"))
