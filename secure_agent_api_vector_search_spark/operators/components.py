"""Connected-components resolution for near-duplicate pair graphs —
the keep-one stage of dedup (SURVEY.md §2.10).

Every near-dup operator in this engine (minhash / simhash / n-gram /
embedding LSH) emits verified PAIRS; a training-data pipeline needs the
final deduplicated corpus, which means resolving the pair graph into
components and keeping one representative per component. The reference
has no dedup at all (its corpus is 50 curated rows,
sql/03_seed_data.sql:2-51) — this is part of the [EXT] pipeline surface.

Spark-first shape: the **alternating large-star / small-star**
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public literature), which rewrites the EDGE SET each
round instead of propagating labels over fixed edges:

    large-star(u): m = min(N(u) ∪ {u}); for v ∈ N(u), v > u: edge (v, m)
    small-star(u): over smaller neighbors S(u): m = min(S); edges
                   (x, m) for x ∈ (S ∪ {u}) \\ {m}

Each step preserves connectivity and strictly flattens the graph; the
fixpoint is a star per component centered on its minimum id, reached in
O(log² n) rounds (a handful in practice). Plain min-label propagation
was tried first and REJECTED: labels advance only one edge-hop per
round (pointer-jumping compresses label chains, not graph distance), so
a moderately dense 200-node graph still hadn't converged after 15
rounds — at 100 TB that shape is fatal, and worse, an iteration cap
turns it into silently wrong answers.

Scale notes: every round is two groupBy-min aggregates (map-side
combinable — a million-member boilerplate cluster costs a partial min,
never a collect_list) plus two node-keyed joins; edges are
`localCheckpoint`ed per round so iterative lineage never re-executes.
Convergence is detected by an order-insensitive edge-set signature
(count + sum of xxhash64); if `max_iter` is ever hit the operator
RAISES rather than returning a partially-merged labeling. The edge list
itself is the near-dup pair output — orders of magnitude smaller than
the corpus — and the final keeper join back to the corpus is a
left-anti on the (small) non-keeper set, broadcastable when it fits
(AQE decides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(df: DataFrame) -> DataFrame:
    """Canonical undirected edge form: (u, v) with u > v, deduped, no
    self-loops."""
    return (
        df.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Resolve an undirected pair graph to components.

    (id_a, id_b) edges → (node, comp) where ``comp`` is the minimum
    node id in the node's connected component. Only nodes that appear
    in at least one pair are returned (isolated corpus rows are their
    own trivial components and never need a row here — keeper logic
    treats absence as "keep").
    """
    edges = _canon(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    ).localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        # large-star: over the full neighborhood of u, hook every
        # LARGER neighbor to the neighborhood minimum
        both = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = (
            both.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        ls = (
            both.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        edges = _canon(ls).localCheckpoint()
        # small-star: among u and its SMALLER neighbors, star everything
        # onto the minimum
        smin = edges.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            edges.join(smin, "u")
            .select(F.col("v").alias("x"), F.col("m"))
            .union(smin.select(F.col("u").alias("x"), F.col("m")))
        )
        edges = _canon(
            ss.select(F.col("x").alias("u"), F.col("m").alias("v"))
        ).localCheckpoint()
        # order-insensitive edge-set signature: one aggregate per round
        row = edges.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        sig = (row["n"], row["s"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "raise max_iter (the alternating algorithm needs O(log^2 n) "
            "rounds; 30 covers any realistic graph)"
        )
    # fixpoint: one star per component, centered on the component min
    # (canonical edges are (member, center)); groupBy-min is belt and
    # braces against any ties
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    centers = edges.select(F.col("v").alias("node"), F.col("v").alias("comp"))
    return members.union(centers).groupBy("node").agg(F.min("comp").alias("comp"))


def keep_first(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
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
    max_iter: int = 30,
) -> DataFrame:
    """Component summary of a pair graph: (comp, n_members) per
    duplicate group (size ≥ 2 by construction — singletons never pair)."""
    comp = connected_components(pairs, id_a, id_b, max_iter)
    return comp.groupBy("comp").agg(F.count("*").alias("n_members"))
