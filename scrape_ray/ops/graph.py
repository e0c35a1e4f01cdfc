"""Link-graph analysis operators (PageRank) for web-corpus curation.

A crawl corpus is a graph: pages/hosts are nodes, hyperlinks are
edges (the reference's link discovery feeds exactly this table —
``internal/scrape.go`` link harvesting → frontier). Curation
pipelines use link-centrality both for crawl prioritization (fetch
high-rank frontiers first) and for quality weighting of training
text. This module implements the standard damped PageRank power
iteration, INTEGER-SCALED so results are exactly reproducible across
engines (float summation order would otherwise make a distributed
run non-deterministic — the same permille-integer trick as
``textstats.tfidf_topk``).

Semantics (all int64 arithmetic, floor division on non-negatives):

    r_0(v)   = scale                                  (default 1e6)
    contrib  = r_i(u) // outdeg(u)       per edge (u, v)
    r_{i+1}(v) = base + (damp_num * S(v)) // damp_den
    base     = (scale * (damp_den - damp_num)) // damp_den
    S(v)     = sum of contrib over in-edges of v      (0 if none)

Dangling mass (nodes with outdeg 0) is dropped, the common
simplified variant; symmetrize the edge table upstream when a
dangling-free graph is wanted.

Distributed shape — per iteration at most ONE all-to-all exchange:

1. ``map_batches`` over the edge table looks up ``contrib[src]`` in
   a BROADCAST rank array (``ray.put`` once per iteration, read
   zero-copy by every task) and pre-aggregates per-batch partial
   sums by ``dst`` (np.unique + add.at — one row per batch-distinct
   dst, the combiner that keeps the exchange narrow);
2. the partials are merged one of two ways (``fold=``):
   ``"exchange"`` — ``groupby(node).sum``, an exchange over the
   NODE table (#nodes rows), never over the edge table — the
   100 TB path; ``"driver"`` — the per-block partials (each
   already combined, total rows ≤ #edges and typically
   #blocks × per-block-distinct-dst) come back as raw block refs
   and fold into the rank array with searchsorted + add — no
   exchange at all, the small/medium-graph fast path.
   ``"auto"`` (default) picks ``driver`` when the materialized
   edge count is ≤ ``driver_fold_max_edges`` (50 M);
3. the driver folds the summed table into the next rank array —
   O(#nodes) driver state, stated bound (the broadcast already
   requires it, so ``driver`` fold adds no new asymptotic cost,
   only the partial-row traffic).

The broadcast/driver O(#nodes) term is the small-to-medium regime
(ranks for 10^8 nodes ≈ 1.6 GB, still broadcastable). At 10^10
nodes, keep ranks as a Dataset hash-partitioned on node and replace
step 1's broadcast with the co-partitioned shuffle-join used by
``state/cache.py`` (fetch path) — the iteration count and exchange
count per iteration are unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pagerank", "node_degrees"]


def _partial_sum_by(keys: np.ndarray, vals: np.ndarray):
    """Per-batch combiner: int64-exact partial sums of vals by key."""
    u, inv = np.unique(keys, return_inverse=True)
    acc = np.zeros(len(u), dtype=np.int64)
    np.add.at(acc, inv, vals)
    return u, acc


def node_degrees(edges, src: str = "src", dst: str = "dst"):
    """One-exchange node table: (node, outdeg) over the UNION of both
    endpoint columns, so sink-only nodes appear with outdeg 0.
    Returns the aggregated Dataset (one row per node)."""

    def _partial(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.concatenate([s, d])
        vals = np.concatenate(
            [np.ones(len(s), dtype=np.int64), np.zeros(len(d), dtype=np.int64)]
        )
        u, acc = _partial_sum_by(keys, vals)
        return pa.table({"node": u, "outdeg": acc})

    return (
        edges.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .sum("outdeg")
    )


def pagerank(
    edges,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    fold: str = "auto",
    driver_fold_max_edges: int = 50_000_000,
):
    """Integer-scaled damped PageRank over an int64 edge Dataset.

    Returns a Dataset of (node:int64, rank:int64) for every node
    appearing in either endpoint column. ``iterations`` is fixed (a
    power-iteration prefix), which keeps the operator exactly
    SQL-expressible for the oracle gate; convergence loops would
    wrap this with a driver-side delta check on the O(#nodes) rank
    table. ``fold`` selects the partial-merge path (module
    docstring); both paths are int64-exact and bit-identical.
    """
    import ray
    import ray.data

    base = (scale * (damp_den - damp_num)) // damp_den

    # Pin the edge table once: every iteration (and the degree pass)
    # re-reads it, and re-executing the upstream lineage per iteration
    # would multiply the build cost by `iterations`. materialize() puts
    # the blocks in the object store (spilling if needed) — the standard
    # shape for iterative algorithms over a fixed input.
    edges = edges.materialize()
    if fold == "auto":
        fold = "driver" if edges.count() <= driver_fold_max_edges else "exchange"
    if fold not in ("driver", "exchange"):
        raise ValueError(f"fold must be auto|driver|exchange, got {fold!r}")

    from scrape_ray.util import dataset_to_table

    if fold == "driver":
        # Small/medium regime: pull per-block combined partials straight
        # back (total rows ≤ #edges) and fold with searchsorted + add —
        # zero exchanges for degrees AND for every iteration.
        refs = edges.to_arrow_refs()

        @ray.remote
        def _deg_part(t: pa.Table):
            if t.num_rows == 0 or src not in t.column_names:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
            keys = np.concatenate([s, d])
            vals = np.concatenate(
                [np.ones(len(s), np.int64), np.zeros(len(d), np.int64)]
            )
            return _partial_sum_by(keys, vals)

        parts = ray.get([_deg_part.remote(r) for r in refs])
        nodes = np.unique(
            np.concatenate([p[0] for p in parts] or [np.empty(0, np.int64)])
        )
        outdeg = np.zeros(len(nodes), dtype=np.int64)
        for u, acc in parts:
            outdeg[np.searchsorted(nodes, u)] += acc
    else:
        # Node universe + out-degrees: one exchange, then an O(#nodes)
        # driver collect (bound stated in module docstring; ranks must be
        # driver-visible to fold iteration i into the i+1 broadcast).
        deg_tbl = dataset_to_table(node_degrees(edges, src, dst))
        nodes = deg_tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        outdeg = deg_tbl["sum(outdeg)"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(nodes, kind="stable")
        nodes, outdeg = nodes[order], outdeg[order]

    safe_deg = np.maximum(outdeg, 1)  # deg-0 nodes never appear as src
    ranks = np.full(len(nodes), scale, dtype=np.int64)

    if fold == "driver":

        @ray.remote
        def _iter_part(t: pa.Table, node_arr, contrib):
            if t.num_rows == 0 or src not in t.column_names:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
            return _partial_sum_by(d, contrib[np.searchsorted(node_arr, s)])

        nodes_ref = ray.put(nodes)
        for _ in range(iterations):
            contrib_ref = ray.put(ranks // safe_deg)
            parts = ray.get(
                [_iter_part.remote(r, nodes_ref, contrib_ref) for r in refs]
            )
            s_in = np.zeros(len(nodes), dtype=np.int64)
            for u, acc in parts:
                s_in[np.searchsorted(nodes, u)] += acc
            ranks = base + (damp_num * s_in) // damp_den
        return ray.data.from_arrow(pa.table({"node": nodes, "rank": ranks}))

    for _ in range(iterations):
        contrib_ref = ray.put(ranks // safe_deg)
        nodes_ref = ray.put(nodes)

        def _partials(t: pa.Table) -> pa.Table:
            contrib = ray.get(contrib_ref)  # zero-copy shared read
            node_arr = ray.get(nodes_ref)
            s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(node_arr, s)
            u, acc = _partial_sum_by(d, contrib[idx])
            return pa.table({"node": u, "s": acc})

        summed = (
            edges.map_batches(_partials, batch_format="pyarrow", batch_size=None)
            .groupby("node")
            .sum("s")
        )
        stbl = dataset_to_table(summed)  # O(#nodes)
        snodes = stbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        svals = stbl["sum(s)"].to_numpy(zero_copy_only=False).astype(np.int64)
        ranks = np.full(len(nodes), base, dtype=np.int64)
        pos = np.searchsorted(nodes, snodes)
        ranks[pos] = base + (damp_num * svals) // damp_den

    return ray.data.from_arrow(pa.table({"node": nodes, "rank": ranks}))
