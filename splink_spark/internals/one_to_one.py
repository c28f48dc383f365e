"""One-to-one clustering across duplicate-free datasets.

Reference: splink/internals/one_to_one_clustering.py:14-336 and
linker_components/clustering.py:180-342 (``cluster_using_single_best_links``):
each record may link to at most one record per other dataset; a link is
accepted when it is the mutual best (highest match probability) for both
endpoints; ties are dropped ('drop') or broken by lowest id ('lowest_id').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cluster_using_single_best_links(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = "node_id",
    source_dataset_col: str = "source_dataset",
    probability_col: str = "match_probability",
    threshold_match_probability: float = 0.5,
    ties: str = "drop",
) -> DataFrame:
    """edges: (node_id_l, node_id_r, source_dataset_l, source_dataset_r,
    match_probability); nodes: (node_id, source_dataset).
    Returns (node_id, source_dataset, cluster_id)."""
    if ties not in ("drop", "lowest_id"):
        raise ValueError("ties must be 'drop' or 'lowest_id'")
    e = edges.where(F.col(probability_col) >= threshold_match_probability).select(
        F.col(f"{node_col}_l").alias("l"),
        F.col(f"{node_col}_r").alias("r"),
        F.col(f"{source_dataset_col}_l").alias("sd_l"),
        F.col(f"{source_dataset_col}_r").alias("sd_r"),
        F.col(probability_col).alias("p"),
    )

    if ties == "drop":
        # a node with two equally-best links to the same other dataset links
        # to neither (one_to_one_clustering.py:14-100 group-count tie logic)
        w_l = Window.partitionBy("l", "sd_r")
        w_r = Window.partitionBy("r", "sd_l")
        e = (
            e.withColumn("best_l", F.max("p").over(w_l))
            .withColumn("n_best_l", F.sum((F.col("p") == F.col("best_l")).cast("int")).over(w_l))
            .withColumn("best_r", F.max("p").over(w_r))
            .withColumn("n_best_r", F.sum((F.col("p") == F.col("best_r")).cast("int")).over(w_r))
        )
        accepted = e.where(
            (F.col("p") == F.col("best_l")) & (F.col("n_best_l") == 1)
            & (F.col("p") == F.col("best_r")) & (F.col("n_best_r") == 1)
        )
    else:
        w_l = Window.partitionBy("l", "sd_r").orderBy(F.desc("p"), F.asc("r"))
        w_r = Window.partitionBy("r", "sd_l").orderBy(F.desc("p"), F.asc("l"))
        accepted = (
            e.withColumn("rk_l", F.row_number().over(w_l))
            .withColumn("rk_r", F.row_number().over(w_r))
            .where((F.col("rk_l") == 1) & (F.col("rk_r") == 1))
        )

    # Transitive closure over the accepted edges (reference
    # one_to_one_clustering.py:103-336 iterates min-label propagation to
    # stability). A one-shot min(endpoint) assignment splits chains that span
    # >= 3 datasets (A-B, B-C: B->min(A,B)=A but C->min(B,C)=B). The accepted
    # edge set is degree-bounded (<= one link per node per other dataset), so
    # connected components converges in ~log(chain length) rounds.
    from .connected_components import solve_connected_components

    accepted_edges = accepted.select("l", "r")
    members = (
        accepted_edges.select(F.col("l").alias("member"))
        .unionByName(accepted_edges.select(F.col("r").alias("member")))
        .distinct()
    )
    assigned = solve_connected_components(
        accepted_edges,
        members,
        node_col="member",
        edge_l_col="l",
        edge_r_col="r",
    ).select(F.col("member").alias("n"), "cluster_id")
    out = nodes.join(
        assigned, nodes[node_col] == assigned["n"], "left"
    ).select(
        nodes[node_col],
        nodes[source_dataset_col],
        F.coalesce(assigned["cluster_id"], nodes[node_col]).alias("cluster_id"),
    )
    return out


def cluster_at_multiple_thresholds(
    edges: DataFrame,
    nodes: DataFrame,
    thresholds: list[float],
    node_col: str = "node_id",
    edge_l_col: str = "node_id_l",
    edge_r_col: str = "node_id_r",
    probability_col: str = "match_probability",
    materialization=None,
) -> DataFrame:
    """Connected components at each threshold (reference clustering.py:
    158-601). Output: (threshold, node_id, cluster_id).

    Stable-cluster reuse (the reference's marginal-recompute design):
    thresholds are processed ascending; a cluster whose minimum internal edge
    probability >= the next threshold cannot split, so its assignment carries
    over unchanged and only the nodes of unstable clusters re-run CC (on the
    re-thresholded edges, which never cross cluster boundaries). Identical
    output to a full per-threshold re-run, but each step's CC input shrinks
    to the clusters actually at risk — the dominant cost saver when
    thresholds are dense or clusters are tight."""
    from .connected_components import solve_connected_components
    from .materialize import MaterializationPolicy

    mat = materialization or MaterializationPolicy(method="local_checkpoint")
    edges = mat.materialize(
        edges.select(edge_l_col, edge_r_col, probability_col), "clustering"
    )
    ts = sorted(thresholds)
    out = None
    assign = None
    prev_t = None
    for t in ts:
        live = edges.where(F.col(probability_col) >= t)
        if assign is None:
            assign = solve_connected_components(
                live, nodes, node_col=node_col,
                edge_l_col=edge_l_col, edge_r_col=edge_r_col,
                materialization=mat,
            )
        else:
            # min internal edge probability per cluster, over the edges that
            # formed the previous assignment (>= prev_t); clusters absent
            # from this table have no edges (singletons) and are stable
            cluster_of = assign.select(
                F.col(node_col).alias(edge_l_col), F.col("cluster_id")
            )
            cluster_minp = (
                edges.where(F.col(probability_col) >= prev_t)
                .join(cluster_of, on=edge_l_col)
                .groupBy("cluster_id")
                .agg(F.min(probability_col).alias("__min_p"))
            )
            unstable = cluster_minp.where(F.col("__min_p") < t).select("cluster_id")
            stable_assign = assign.join(unstable, on="cluster_id", how="left_anti")
            unstable_nodes = assign.join(unstable, on="cluster_id").select(
                F.col(node_col)
            )
            # edges >= t never cross previous cluster boundaries, so CC over
            # just the unstable nodes is exact
            sub_edges = live.join(
                unstable_nodes.select(F.col(node_col).alias(edge_l_col)),
                on=edge_l_col,
            )
            sub_assign = solve_connected_components(
                sub_edges, unstable_nodes, node_col=node_col,
                edge_l_col=edge_l_col, edge_r_col=edge_r_col,
                materialization=mat,
            )
            assign = stable_assign.select(node_col, "cluster_id").unionByName(
                sub_assign
            )
            assign = mat.materialize(assign, "clustering", iterative=True)
        step = assign.withColumn("threshold", F.lit(float(t)))
        out = step if out is None else out.unionByName(step)
        prev_t = t
    return out.select("threshold", node_col, "cluster_id")
