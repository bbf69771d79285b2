"""Transitive clustering: match edges → connected components.

The reference stops at pairwise decisions; the north rule adds entity
clusters via connected components. GraphFrames is out (no external deps),
so this is the **alternating large-star / small-star** algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'13),
expressed purely as DataFrame joins/aggregations:

* ``large-star(u)``: connect every neighbor ``v > u`` to
  ``m = min(Γ(u) ∪ {u})``.
* ``small-star(u)``: orient edges toward the smaller endpoint; connect
  every ``v ∈ Γ⁻(u) ∪ {u}`` (v ≤ u, v ≠ m) to ``m = min(Γ⁻(u) ∪ {u})``.

Each round is two shuffles (one groupBy + one join per star op). The edge
set converges to disjoint stars rooted at the component minimum in
O(log² n) rounds; node ids need only a total order (string ids are fine).

Scale notes:

* ``localCheckpoint(eager=True)`` after every round truncates the join
  lineage — without it the plan doubles per iteration and the driver
  OOMs on plan serialization long before data is a problem. On a real
  cluster with an HA requirement use reliable ``checkpoint()`` into the
  job's checkpoint dir instead (the pipeline driver wires that).
* Convergence is detected from (edge_count, xor-of-hashes) — one tiny
  aggregate per round, no ``except()`` anti-join.
* Components are emitted as ``component_id = min(conv_id in component)``
  — deterministic labeling, stable across runs/partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    und = _symmetrize(edges)
    mins = und.groupBy("src").agg(F.min("dst").alias("_mn"))
    mins = mins.select("src", F.least(F.col("src"), F.col("_mn")).alias("m"))
    return (
        und.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    neighbor_links = (
        oriented.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_links = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        neighbor_links.unionByName(self_links)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor, not sum: ANSI-mode safe (no overflow) and a valid set
    # signature because the edge set is distinct
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components_edges(
    edges: DataFrame, max_iter: int = 25, use_local_checkpoint: bool = True
) -> DataFrame:
    """Run star rounds to convergence; returns the converged (star) edge
    set. Raises if ``max_iter`` rounds don't converge (log² n bound makes
    that an input error, not a tuning knob)."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e))
        if use_local_checkpoint:
            # LAZY checkpoint: the signature aggregate below is the
            # round's single action — it materializes the checkpoint AND
            # computes convergence in one job (eager=True would burn a
            # second full job per round purely on scheduling overhead)
            e = e.localCheckpoint(eager=False)
        sig = _signature(e)
        if sig == prev:
            return e
        prev = sig
    raise RuntimeError(f"connected components did not converge in {max_iter} rounds")


def components(nodes: DataFrame, edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """components(conv_id, component_id) for every node in ``nodes``
    (singletons map to themselves). ``nodes`` must have column
    ``conv_id``; ``edges`` columns ``src``/``dst``."""
    star = connected_components_edges(edges, max_iter=max_iter)
    und = _symmetrize(star)
    mapping = (
        und.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select(
            F.col("src").alias("conv_id"),
            F.least(F.col("src"), F.col("_mn")).alias("component_id"),
        )
    )
    return (
        nodes.select("conv_id")
        .distinct()
        .join(mapping, "conv_id", "left")
        .select(
            "conv_id",
            F.coalesce("component_id", "conv_id").alias("component_id"),
        )
    )
