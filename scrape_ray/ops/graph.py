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
(ranks for 10^8 nodes ≈ 1.6 GB, still broadcastable). The 10^10-node
web-graph regime is ``fold="dataset"``: ranks never exist in one
place — they live as P per-bucket ``(node, outdeg, rank)`` shards in
the object store, co-partitioned with the edge blocks through the
SAME single-column hash that ``util.bucket_table_refs`` uses
(``(uint64(node) * GOLD) % P``), so

1. edges bucket by ``src`` ONCE (static across iterations — the
   graph doesn't change, only ranks do);
2. each iteration, bucket ``b``'s contribution task joins its edge
   shard against its OWN rank shard locally (srcs of bucket ``b``
   are exactly the nodes of rank shard ``b`` — no broadcast, no
   lookup traffic), partial-sums by ``dst``, and hash-slices the
   partials ``num_returns=P`` by the dst bucket;
3. bucket ``c``'s apply task folds the P partial slices addressed
   to it into its node vector and emits the next rank shard.

Per iteration that is ONE all-to-all exchange of combined partials
(P×P small slices, no driver rows) and O(#nodes / P) memory per
task; the driver holds only 2·P object refs. ``fold="auto"`` uses
the zero-exchange ``driver`` fold below the edge threshold and
``dataset`` above it.
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


def _node_bucket(v: np.ndarray, P: int) -> np.ndarray:
    """Bucket index of an int64 node id — MUST match what
    ``util.bucket_table_refs`` computes for a single int64 key column
    (``h = 0 * MIX ^ (v * GOLD)``), or the dataset fold's rank shards
    and edge shards stop being co-partitioned."""
    from scrape_ray.util import mixed_key_hash

    h = mixed_key_hash(v.astype(np.int64).view(np.uint64))
    return (h % np.uint64(P)).astype(np.int64)


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
    num_buckets: int = 32,
    stats: dict | None = None,
):
    """Integer-scaled damped PageRank over an int64 edge Dataset.

    Returns a Dataset of (node:int64, rank:int64) for every node
    appearing in either endpoint column. ``iterations`` is fixed (a
    power-iteration prefix), which keeps the operator exactly
    SQL-expressible for the oracle gate; convergence loops would
    wrap this with a driver-side delta check on a small per-shard
    delta reduction. ``fold`` selects the partial-merge path (module
    docstring); all paths are int64-exact and bit-identical.
    ``num_buckets`` sizes the ``dataset`` fold's shard count (scale
    with the cluster; each shard holds ~#nodes / P rows).
    ``stats``, when a dict, receives ``{"fold", "P",
    "bucket_nodes"}`` so tests can assert the per-task memory bound.
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
        fold = "driver" if edges.count() <= driver_fold_max_edges else "dataset"
    if fold not in ("driver", "exchange", "dataset"):
        raise ValueError(
            f"fold must be auto|driver|exchange|dataset, got {fold!r}")
    if stats is not None:
        stats["fold"] = fold

    if fold == "dataset":
        return _pagerank_dataset(
            edges, src, dst, iterations, scale, base, damp_num, damp_den,
            num_buckets, stats)

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


def _pagerank_dataset(
    edges, src, dst, iterations, scale, base, damp_num, damp_den,
    num_buckets, stats,
):
    """The 10^10-node fold (module docstring step-by-step): ranks as P
    co-partitioned object-store shards, edges bucketed by ``src``
    once, one P×P combined-partial exchange per iteration. Neither
    the driver nor any single task ever holds the full rank table —
    the driver keeps 2·P ObjectRefs and a P-length shard-size list
    (for ``stats``); each task holds one shard (~#nodes / P) plus
    its edge bucket."""
    import ray
    import ray.data

    from scrape_ray.util import bucket_table_refs, hash_groupby_sum

    _empty_nodes = pa.table({
        "node": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
    })

    refs = edges.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(_empty_nodes)
    # hash_groupby_sum clamps its P to len(refs); pin the SAME P for
    # every participant or the shards stop being co-partitioned.
    P = max(1, min(num_buckets, len(refs)))

    # --- node universe + out-degrees, sharded by node hash ---------
    @ray.remote
    def _deg_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "outdeg": pa.array([], pa.int64())})
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.concatenate([s, d])
        vals = np.concatenate(
            [np.ones(len(s), np.int64), np.zeros(len(d), np.int64)])
        u, acc = _partial_sum_by(keys, vals)
        return pa.table({"node": u, "outdeg": acc})

    deg_refs = [_deg_part.remote(r) for r in refs]
    deg_buckets = hash_groupby_sum(
        deg_refs, ["node"], ["outdeg"], P=P, resolve=False)

    @ray.remote(num_returns=2)
    def _init_shard(t: pa.Table):
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = t["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(n, kind="stable")
        n, o = n[order], o[order]
        return (n, np.maximum(o, 1), np.full(len(n), scale, np.int64)), len(n)

    inits = [_init_shard.remote(b) for b in deg_buckets]
    state = [i[0] for i in inits]
    if stats is not None:
        stats["P"] = P
        stats["bucket_nodes"] = ray.get([i[1] for i in inits])

    # --- edge shards by src hash (static across iterations) --------
    src_grid = bucket_table_refs(refs, [src], P)

    @ray.remote
    def _concat_edges(*slices):
        live = [x.select([src, dst]) for x in slices
                if x.num_rows and src in x.column_names]
        if not live:
            return pa.table({src: pa.array([], pa.int64()),
                             dst: pa.array([], pa.int64())})
        return pa.concat_tables(live, promote_options="default")

    edge_b = [
        _concat_edges.remote(*[src_grid[blk][b] for blk in range(len(refs))])
        for b in range(P)
    ]

    # --- power iterations -------------------------------------------
    @ray.remote
    def _contrib(et: pa.Table, shard, P: int):
        n, safe_deg, r = shard
        if et.num_rows == 0:
            out = [(np.empty(0, np.int64), np.empty(0, np.int64))] * P
            return out[0] if P == 1 else tuple(out)
        s = et[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = et[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        # srcs of edge bucket b are exactly shard b's nodes: local lookup
        contrib = (r // safe_deg)[np.searchsorted(n, s)]
        u, acc = _partial_sum_by(d, contrib)
        bkt = _node_bucket(u, P)
        order = np.argsort(bkt, kind="stable")
        u, acc, bkt = u[order], acc[order], bkt[order]
        cuts = np.searchsorted(bkt, np.arange(P + 1))
        out = [(u[cuts[p]:cuts[p + 1]], acc[cuts[p]:cuts[p + 1]])
               for p in range(P)]
        return out[0] if P == 1 else tuple(out)

    @ray.remote
    def _apply(shard, *parts):
        n, safe_deg, _ = shard
        s_in = np.zeros(len(n), np.int64)
        for u, acc in parts:
            if len(u):
                s_in[np.searchsorted(n, u)] += acc
        return (n, safe_deg, base + (damp_num * s_in) // damp_den)

    for _ in range(iterations):
        sliced = [
            _contrib.options(num_returns=P).remote(edge_b[b], state[b], P)
            for b in range(P)
        ]
        if P == 1:
            sliced = [[s] for s in sliced]
        state = [
            _apply.remote(state[c], *[sliced[b][c] for b in range(P)])
            for c in range(P)
        ]

    @ray.remote
    def _shard_table(shard) -> pa.Table:
        n, _, r = shard
        return pa.table({"node": pa.array(n, pa.int64()),
                         "rank": pa.array(r, pa.int64())})

    return ray.data.from_arrow_refs([_shard_table.remote(s) for s in state])
