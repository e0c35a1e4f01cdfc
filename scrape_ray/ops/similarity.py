"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast
once (``ray.put``), each ``map_batches`` task computes a numpy matmul
against its batch and emits only its local top-k; a final small
aggregation merges the per-block top-k lists. At 100 TB nothing but
(num_queries × k) rows ever leaves a worker.

Scale path: IVF-style coarse quantization — k-means-lite centroids
(deterministic seed) assign each vector to a cell in one pass; queries
probe only the ``nprobe`` nearest cells. The cell assignment is the
partition key, so at cluster scale a probe touches ~nprobe/num_cells
of the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from scrape_ray.util import vecs_to_numpy


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _merge_topk(local, k: int, score_col: str = "score",
                score_order: str = "descending"):
    """Distributed final merge of the per-block top-k partials: ONE
    ``groupby("query_id")`` exchange over the tiny (#blocks × q × k)
    partials table, Arrow-native head-k inside the group task — no
    #blocks-sized driver frame (the tree-merge the per-block partials
    make possible; driver state is zero). Sort order (score desc —
    or asc for distance metrics — then vec_id asc) matches the
    oracle's ROW_NUMBER tie-break."""
    import pyarrow.compute as pc

    def _head(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        idx = pc.sort_indices(
            g,
            sort_keys=[("query_id", "ascending"), (score_col, score_order),
                       ("vec_id", "ascending")],
        )
        gs = g.take(idx)
        qid = gs["query_id"].to_numpy(zero_copy_only=False)
        firsts = np.concatenate(([True], qid[1:] != qid[:-1]))
        starts = np.flatnonzero(firsts)
        seg = np.diff(np.concatenate((starts, [len(qid)])))
        within = np.arange(len(qid)) - np.repeat(starts, seg)
        return gs.filter(pa.array(within < k))

    return local.groupby("query_id").map_groups(_head, batch_format="pyarrow")


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
):
    """Cosine top-k of each query row against the dataset. Returns a
    small Dataset (query_id, vec_id, score) of exactly k rows per
    query (fewer if the table is smaller).

    ``queries``: (q, d) float array — broadcast via ``ray.put`` once;
    per-batch work is one (B,d)x(d,q) matmul.
    """
    import ray
    import ray.data

    qn = _normalize_rows(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(qn)

    def _local_topk(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        vecs = vecs_to_numpy(t[vec_col])
        ids = t[id_col].to_numpy()
        sims = _normalize_rows(vecs) @ q.T  # (B, nq)
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j in range(q.shape[0]):
            col = sims[:, j]
            # (score desc, vec_id asc) even inside the block — see
            # the integer probe's tie note
            idx = np.lexsort((ids, -col))[:kk]
            for i in idx:
                out_q.append(j)
                out_id.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.map_batches(_local_topk, batch_format="pyarrow", batch_size=batch_size)
    return _merge_topk(local, k)


def _bottom_k_sample(ds, id_col: str, vec_col: str, k: int):
    """Deterministic bounded sample: the k SMALLEST ids' vectors.
    ``ds.limit(k)`` takes whichever blocks finish first — membership
    varies run to run when the upstream has shuffles — while bottom-k
    by id is invariant to block order: each block contributes its own
    bottom-k (map_batches), the driver merges ≤ k×blocks narrow rows
    and keeps the global bottom-k. Returns (ids, (k,d) float32)."""
    import pyarrow.compute as pc
    import ray

    def _blk(t: pa.Table) -> pa.Table:
        t = t.select([id_col, vec_col])
        idx = pc.sort_indices(t[id_col])
        return t.take(idx.slice(0, k))

    from scrape_ray.util import collect_nonempty

    parts = collect_nonempty(
        ds.map_batches(_blk, batch_format="pyarrow", batch_size=None)
    )
    if not parts:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 0), dtype=np.float32)
    merged = pa.concat_tables(parts)
    idx = pc.sort_indices(merged[id_col]).slice(0, k)
    merged = merged.take(idx)
    from scrape_ray.util import vecs_to_numpy

    return merged[id_col].to_numpy(), vecs_to_numpy(merged[vec_col])


# ------------------------------------------------------------------ IVF
class IVFIndex:
    """Deterministic one-pass coarse quantizer: centroids = k-means on
    a fixed-seed sample (Lloyd, few iterations), then cell assignment
    per batch. Public-textbook IVF, nothing fancy."""

    def __init__(self, num_cells: int = 16, seed: int = 42, iters: int = 8) -> None:
        self.num_cells = num_cells
        self.seed = seed
        self.iters = iters
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize_rows(np.asarray(sample, dtype=np.float32))
        rng = np.random.RandomState(self.seed)
        idx = rng.choice(len(x), size=min(self.num_cells, len(x)), replace=False)
        c = x[idx].copy()
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                m = x[assign == j]
                if len(m):
                    c[j] = m.mean(axis=0)
            c = _normalize_rows(c)
        self.centroids = c
        return self

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize_rows(vecs) @ self.centroids.T, axis=1)


def build_ivf_index(
    ds,
    out_dir: str,
    num_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    seed: int = 42,
) -> "IVFIndex":
    """Index BUILD (write once, probe many) — the cell-partitioned IVF
    variant for real scale: fit centroids on a bounded sample, assign
    every vector its cell in one streaming pass, and write the table
    as Parquet partitioned by ``cell``. A probe then reads ONLY its
    nprobe cell directories — I/O-level pruning, so a query touches
    ~nprobe/num_cells of the data instead of scanning everything.
    Centroids persist beside the data (``_centroids.npy``; the
    underscore keeps Parquet discovery away from it)."""
    import os

    # deterministic sample MEMBERSHIP and order (bottom-k by id):
    # limit() takes whichever blocks finish first, so both the rows
    # sampled and the fitted centroids would drift run-to-run
    _, sample_vecs = _bottom_k_sample(ds, id_col, vec_col, sample_size)
    index = IVFIndex(num_cells=num_cells, seed=seed).fit(sample_vecs)

    def _assign(t: pa.Table) -> pa.Table:
        from scrape_ray.util import vecs_to_numpy

        cells = index.assign(vecs_to_numpy(t[vec_col]))
        return t.append_column("cell", pa.array(cells.astype(np.int32)))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(_assign, batch_format="pyarrow", batch_size=4096).write_parquet(
        out_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(out_dir, "_centroids.npy"), index.centroids)
    return index


def ivf_topk_indexed(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
):
    """Probe a ``build_ivf_index`` directory: load centroids, compute
    each query's nprobe cells, and ``read_parquet`` ONLY those cell
    partitions — unread cells never leave storage. Scoring mirrors
    ``ivf_topk`` (same centroids ⇒ identical results) but the scan is
    pruned at the file level instead of filtered after a full read."""
    import os

    import ray
    import ray.data

    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    qn = _normalize_rows(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]  # (q, nprobe)
    needed = sorted(int(c) for c in np.unique(probe))
    # expand probed cell dirs to their files (a LIST of paths must be
    # files for the parquet reader); hive partitioning still recovers
    # the cell column from the paths
    paths = []
    for c in needed:
        d = os.path.join(index_dir, f"cell={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    ds = ray.data.read_parquet(paths)  # hive: the cell column comes back
    state_ref = ray.put((qn, probe))

    def _score(t: pa.Table) -> pa.Table:
        q, probe_cells = ray.get(state_ref)
        vecs = vecs_to_numpy(t[vec_col])
        ids = t[id_col].to_numpy()
        # hive partition values arrive as strings
        cells = np.asarray(t["cell"].to_pylist(), dtype=np.int64)
        vn = _normalize_rows(vecs)
        out_q, out_id, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = np.isin(cells, probe_cells[j])
            if not mask.any():
                continue
            col = vn[mask] @ q[j]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            idx = np.lexsort((sub_ids, -col))[:kk]
            for i in idx:
                out_q.append(j)
                out_id.append(int(sub_ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.map_batches(_score, batch_format="pyarrow", batch_size=batch_size)
    return _merge_topk(local, k)


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    num_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    batch_size: int = 4096,
):
    """IVF-bucketed approximate top-k: fit centroids on a driver-side
    sample (small), broadcast (centroids, queries), and let each batch
    score only rows whose cell is among each query's nprobe cells."""
    import ray
    import ray.data

    # deterministic sample membership+order (see build_ivf_index)
    _, sample_vecs = _bottom_k_sample(ds, id_col, vec_col, sample_size)
    index = IVFIndex(num_cells=num_cells).fit(sample_vecs)
    qn = _normalize_rows(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :nprobe]  # (q, nprobe)
    state_ref = ray.put((index.centroids, qn, probe))

    def _probe_topk(t: pa.Table) -> pa.Table:
        centroids, q, probe_cells = ray.get(state_ref)
        vecs = vecs_to_numpy(t[vec_col])
        ids = t[id_col].to_numpy()
        vn = _normalize_rows(vecs)
        cells = np.argmax(vn @ centroids.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = np.isin(cells, probe_cells[j])
            if not mask.any():
                continue
            col = vn[mask] @ q[j]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            idx = np.lexsort((sub_ids, -col))[:kk]
            for i in idx:
                out_q.append(j)
                out_id.append(int(sub_ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.map_batches(_probe_topk, batch_format="pyarrow", batch_size=batch_size)
    return _merge_topk(local, k)


def grouped_centroid(ds, group_col: str, vec_col: str = "embedding",
                     scale: int = 1_000_000, batch_size: int | None = None):
    """Per-group embedding centroid, integer-quantized so the result
    is engine-exact: each component is rounded half-away-from-zero to
    ``q = round(float64(x) * scale)`` in int64 (bit-identical to SQL
    ``ROUND(CAST(x AS DOUBLE) * scale)`` — the DOUBLE cast matters:
    multiplying in float32 can land exactly on .5 where float64 does
    not), summed exactly in int64, and the centroid
    reported as the SQL-style truncating quotient ``sum(q) // n``
    (toward zero, matching SQL integer division on negative sums —
    numpy's ``//`` floors and would differ) — no float aggregate
    anywhere, so a DuckDB oracle reproduces every value.
    Output: one row per (group, dim): ``(group_col, dim, centroid_q,
    n)`` where ``n`` counts vectors carrying that dimension (ragged
    inputs supported).

    Scale shape: quantization + per-(group, dim) partial sums happen
    INSIDE the batch map (vectors never shuffle); the only exchange is
    a ``groupby([group, dim]).sum`` over #groups x dim partial rows
    per batch — O(groups * dims), data-size independent. int64 bound:
    |x| * scale * corpus_rows must stay < 2^63; lower ``scale`` for
    trillion-row corpora."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends = offs[:-1], offs[1:]
        lens = ends - starts
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        dim = np.arange(len(vals), dtype=np.int64) - np.repeat(starts, lens)
        x = vals * float(scale)
        q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
            np.int64)
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        enc = grp.dictionary_encode()
        gcodes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[parent]
        ndim = int(lens.max()) if len(lens) else 0
        pair = gcodes * max(ndim, 1) + dim
        uniq, inv, cnt = np.unique(pair, return_inverse=True,
                                   return_counts=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, q)
        out_g = pa.array(uniq // max(ndim, 1), pa.int64())
        return pa.table({
            group_col: enc.dictionary.take(out_g),
            "dim": pa.array(uniq % max(ndim, 1), pa.int64()),
            "__s": pa.array(sums, pa.int64()),
            "__n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=batch_size)
    agg = partials.groupby([group_col, "dim"]).aggregate(
        Sum("__s", alias_name="__s"), Sum("__n", alias_name="__n"))

    def _final(t: pa.Table) -> pa.Table:
        s = t["__s"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        quot = np.sign(s) * (np.abs(s) // n)  # truncate toward zero
        return pa.table({
            group_col: t[group_col],
            "dim": t["dim"],
            "centroid_q": pa.array(quot.astype(np.int64), pa.int64()),
            "n": pa.array(n, pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow", batch_size=None)


def kmeans_assign(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                  k: int = 8, iterations: int = 2, scale: int = 1_000_000,
                  batch_size: int = 4096):
    """Distributed Lloyd's k-means, INTEGER-EXACT so a SQL oracle can
    replay it bit-for-bit (the same quantization contract as
    :func:`grouped_centroid`): components are quantized once to
    ``q = round(float64(x) * scale)`` (half away from zero, int64),
    distances are exact int64 squared-L2 in quantized space, centroid
    updates are the SQL-style truncating quotient ``sum // n``.
    Initial centroids are the ``k`` smallest ids' vectors
    (deterministic, no RNG). ``iterations`` counts ASSIGNMENT passes:
    assign -> update -> assign -> ... ; the returned Dataset holds
    the final pass's (id_col, cluster, dist) rows, where ``cluster``
    is the ORIGINAL centroid index (ties -> lowest index; clusters
    emptied by an update drop out of later passes, exactly like the
    inner-join oracle).

    Scale shape — per iteration ONE broadcast and ZERO exchanges: the
    (k × d) centroid matrix ships via ``ray.put``; each task computes
    its batch's assignment with one int64 matmul and folds a (k × d)
    partial-sum matrix + k counts; the driver merges the per-block
    partials (k*d ints each — O(model), not O(data)) and updates the
    centroids. The quantized vectors are materialized once so the
    upstream lineage is not re-executed per pass (same trade as
    ops/graph.pagerank). int64 bound: scale^2 * d * batch rows stays
    < 2^63 for d=64, |x|<=1, scale=1e6.
    """
    import ray
    import ray.data

    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")

    qds = _quant_ds(ds, vec_col, id_col, scale, batch_size)
    refs = qds.to_arrow_refs()
    cents, live = _init_cents(ds, id_col, vec_col, k, scale)
    fold = ray.remote(_block_assign)
    cents, live = _lloyd_updates(refs, cents, live, iterations - 1,
                                 id_col, fold)

    # final pass stays distributed: one relabeled assignment block per
    # input block, stitched into a Dataset WITHOUT a driver collect
    cref = ray.put(cents)
    lref = ray.put(live)
    return ray.data.from_arrow_refs(
        [fold.remote(r, cref, lref, id_col) for r in refs])


def _quant_ds(ds, vec_col: str, id_col: str, scale: int, batch_size: int):
    """(id, q: fixed_size_list<int64>) quantized twin of the embedding
    table, materialized once so iterative passes don't re-execute the
    upstream lineage (same trade as ops/graph.pagerank)."""

    def _quant(t: pa.Table) -> pa.Table:
        m = vecs_to_numpy(t[vec_col]).astype(np.float64)
        x = m * float(scale)
        q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
            np.int64)
        d = q.shape[1] if q.size else 0
        flat = pa.array(q.reshape(-1), pa.int64())
        return pa.table({
            id_col: t[id_col],
            "q": pa.FixedSizeListArray.from_arrays(flat, d),
        })

    return ds.map_batches(_quant, batch_format="pyarrow",
                          batch_size=batch_size).materialize()


def _init_cents(ds, id_col: str, vec_col: str, k: int, scale: int):
    """Deterministic initial centroids: the k smallest ids' vectors,
    quantized. Returns (cents (k,d) int64, live = arange(k))."""
    init_ids, init_vecs = _bottom_k_sample(ds, id_col, vec_col, k)
    if len(init_ids) < k:
        raise ValueError(f"k={k} but only {len(init_ids)} rows")
    x0 = init_vecs.astype(np.float64) * float(scale)
    cents = np.where(x0 >= 0, np.floor(x0 + 0.5),
                     np.ceil(x0 - 0.5)).astype(np.int64)
    return cents, np.arange(k, dtype=np.int64)


def _block_assign(t: pa.Table, cent: np.ndarray, live_idx, id_col: str):
    """One quantized block's nearest-centroid assignment; returns the
    fold partials (sums, counts), or the relabeled assignment table
    when ``live_idx`` is given (maps live slot -> original centroid
    index). All arithmetic exact int64."""
    final = live_idx is not None
    if t.num_rows == 0:
        d = cent.shape[1]
        if final:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        return (np.zeros((len(cent), d), np.int64),
                np.zeros(len(cent), np.int64))
    col = t["q"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.type.list_size
    X = col.values.to_numpy(zero_copy_only=False).reshape(-1, d)
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2, all exact in int64
    xx = np.einsum("ij,ij->i", X, X)
    cc = np.einsum("ij,ij->i", cent, cent)
    dist = xx[:, None] - 2 * (X @ cent.T) + cc[None, :]
    a = dist.argmin(axis=1)  # first min = lowest live index
    if final:
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(live_idx[a], pa.int64()),
            "dist": pa.array(dist[np.arange(len(a)), a], pa.int64()),
        })
    sums = np.zeros((len(cent), d), np.int64)
    np.add.at(sums, a, X)
    cnts = np.bincount(a, minlength=len(cent)).astype(np.int64)
    return sums, cnts


def _lloyd_updates(refs, cents, live, n_updates: int, id_col: str, fold):
    """``n_updates`` Lloyd centroid updates over the quantized block
    refs. Per pass: ONE broadcast + per-block (k×d) partial folds —
    driver state is O(model) (k·d ints), never O(data). Updates use
    the SQL-style truncating quotient; emptied clusters drop out
    (``live`` keeps original labels)."""
    import ray

    for _ in range(n_updates):
        cref = ray.put(cents)
        parts = ray.get([fold.remote(r, cref, None, id_col) for r in refs])
        sums = sum(p[0] for p in parts)
        cnts = sum(p[1] for p in parts)
        keep = cnts > 0
        s, n = sums[keep], cnts[keep][:, None]
        cents = (np.sign(s) * (np.abs(s) // n)).astype(np.int64)
        live = live[keep]
    return cents, live


def ivf_topk_int(
    ds,
    query_ids,
    k_top: int = 10,
    num_cells: int = 8,
    nprobe: int = 4,
    iterations: int = 2,
    scale: int = 1_000_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
):
    """INTEGER-EXACT IVF probe — the oracle-checkable twin of
    :func:`ivf_topk` (VERDICT r4 "Next #3"): the coarse quantizer is
    the same integer Lloyd as :func:`kmeans_assign` (quantize to
    ``round(float64(x)*scale)``, exact int64 squared-L2, truncating
    centroid updates, deterministic bottom-k init), so cell
    assignment, the per-query nprobe probe list, AND the final
    distances are all bit-replayable by a SQL CTE. Queries are rows
    of ``ds`` selected by ``query_ids``; ``nprobe < num_cells`` makes
    this a genuinely PRUNED approximate search (each batch scores
    only rows whose cell is probed by each query), yet every emitted
    number is exact.

    Returns (query_id, vec_id, dist) — ``dist`` ascending top-k per
    query, ties broken by vec_id asc (the oracle's ROW_NUMBER order).

    Scale shape: quantized vectors materialize once; Lloyd is
    ``iterations - 1`` broadcast+O(k·d)-fold passes; scoring is one
    ``map_batches`` (per-batch bottom-k, only (q × k_top) rows per
    block leave the worker) + the tiny top-k merge exchange. The
    I/O-level pruning variant (cells as parquet partitions) is
    :func:`build_ivf_index`/:func:`ivf_topk_indexed`; this one prunes
    compute, not reads, and buys exactness for it."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    if nprobe < 1 or k_top < 1 or iterations < 1:
        raise ValueError("nprobe, k_top and iterations must be >= 1")

    qds = _quant_ds(ds, vec_col, id_col, scale, batch_size)
    refs = qds.to_arrow_refs()
    cents, live = _init_cents(ds, id_col, vec_col, num_cells, scale)
    fold = ray.remote(_block_assign)
    cents, live = _lloyd_updates(refs, cents, live, iterations - 1,
                                 id_col, fold)

    # query vectors: the requested rows of the QUANTIZED table (tiny
    # driver collect — len(query_ids) rows)
    qid_arr = np.asarray(sorted(set(int(q) for q in query_ids)), np.int64)

    def _pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=pa.array(
            qid_arr, pa.int64())))

    from scrape_ray.util import collect_nonempty

    parts = collect_nonempty(
        qds.map_batches(_pick, batch_format="pyarrow", batch_size=None))
    qtbl = pa.concat_tables(parts) if parts else None
    if qtbl is None or qtbl.num_rows < len(qid_arr):
        raise ValueError("some query_ids not present in the dataset")
    order = pc.sort_indices(qtbl[id_col])
    qtbl = qtbl.take(order)
    qcol = qtbl["q"].combine_chunks()
    d = qcol.type.list_size
    Q = qcol.values.to_numpy(zero_copy_only=False).reshape(-1, d)

    # per-query probe cells (driver: q × live-cells ints — O(model))
    qq = np.einsum("ij,ij->i", Q, Q)
    cc = np.einsum("ij,ij->i", cents, cents)
    qdist = qq[:, None] - 2 * (Q @ cents.T) + cc[None, :]
    npb = min(nprobe, len(live))
    # stable argsort + ascending `live` = ties -> lowest original label
    probe = live[np.argsort(qdist, axis=1, kind="stable")[:, :npb]]

    state_ref = ray.put((cents, live, Q, qid_arr, probe))

    def _score(t: pa.Table) -> pa.Table:
        cent, live_idx, q_mat, q_ids, probe_cells = ray.get(state_ref)
        out_q = [np.empty(0, np.int64)]
        out_id = [np.empty(0, np.int64)]
        out_d = [np.empty(0, np.int64)]
        if t.num_rows:
            col = t["q"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            dd = col.type.list_size
            X = col.values.to_numpy(zero_copy_only=False).reshape(-1, dd)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            xx = np.einsum("ij,ij->i", X, X)
            ccc = np.einsum("ij,ij->i", cent, cent)
            dmat = xx[:, None] - 2 * (X @ cent.T) + ccc[None, :]
            labels = live_idx[dmat.argmin(axis=1)]
            for j in range(len(q_ids)):
                mask = np.isin(labels, probe_cells[j])
                if not mask.any():
                    continue
                dj = (xx[mask] - 2 * (X[mask] @ q_mat[j])
                      + int(q_mat[j] @ q_mat[j]))
                sub_ids = ids[mask]
                kk = min(k_top, len(sub_ids))
                # (dist, vec_id) tie-break even inside the block: a
                # plain argpartition could drop the smaller-id member
                # of a distance tie before the merge ever sees it,
                # breaking the oracle's ROW_NUMBER ORDER BY dist, id
                idx = np.lexsort((sub_ids, dj))[:kk]
                out_q.append(np.full(kk, q_ids[j], np.int64))
                out_id.append(sub_ids[idx])
                out_d.append(dj[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "dist": pa.array(np.concatenate(out_d), pa.int64()),
        })

    local = qds.map_batches(_score, batch_format="pyarrow",
                            batch_size=batch_size)
    return _merge_topk(local, k_top, score_col="dist",
                       score_order="ascending")


def _block_assign_q(t: pa.Table, cent: np.ndarray, live_idx, id_col: str):
    """Final-pass assignment that also carries the quantized vector
    through (:func:`semdedup`'s prune needs it). :func:`_block_assign`
    emits rows in input order, so the ``q`` column appends aligned."""
    out = _block_assign(t, cent, live_idx, id_col).drop_columns(["dist"])
    if t.num_rows == 0:
        d = cent.shape[1]
        qcol = pa.FixedSizeListArray.from_arrays(
            pa.array([], pa.int64()), d)
    else:
        qcol = t["q"]
    return out.append_column("q", qcol)


def semdedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
             k: int = 8, iterations: int = 2, tau_num: int = 35,
             tau_den: int = 100, scale: int = 600,
             batch_size: int = 4096, chunk_rows: int = 1024):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding column with k-means, then prune semantic duplicates
    WITHIN each cluster — a row is removed when some other row in its
    cluster has cosine similarity > ``tau_num/tau_den`` and a LOWER
    id (the keep-lowest-id variant of the paper's one-representative-
    per-duplicate-group rule; deterministic, order-free).

    INTEGER-EXACT like :func:`kmeans_assign`, so a SQL oracle replays
    it bit-for-bit: the clusters come from the same quantize /
    int64-L2 / truncating-update Lloyd, and the cosine test needs no
    sqrt or float at all —

        cos(a, b) > tau  iff  dot > 0  and
        dot^2 * tau_den^2 > tau_num^2 * |a|^2 * |b|^2

    evaluated exactly in int64 on the quantized vectors.

    Returns one row per input row: ``(id_col, cluster, keep)`` with
    ``keep`` a 0/1 int64 (cluster = ORIGINAL centroid index, the
    :func:`kmeans_assign` contract).

    Scale shape: Lloyd is the :func:`kmeans_assign` fold (one (k×d)
    broadcast per pass, O(model) driver state, zero exchanges); the
    prune adds exactly ONE ``groupby(cluster)`` exchange and a
    per-cluster O(c^2) dot-product kernel chunked to
    O(chunk_rows × c) memory — the published algorithm's cost model,
    with ``k`` chosen so clusters stay ~10^4 rows at corpus scale
    (the paper runs k = 50 000 on LAION-440M). int64 bound: needs
    max|q|^2 * tau_den < 2^31.5 per vector (guarded at runtime);
    satisfied for d<=64, scale<=600, tau_den<=100, |x|<=1.
    """
    import math

    import pyarrow.compute as pc
    import ray
    import ray.data

    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    if not 0 < tau_num < tau_den:
        raise ValueError("require 0 < tau_num < tau_den")
    if chunk_rows < 1 or scale < 1:
        raise ValueError("chunk_rows and scale must be >= 1")

    qds = _quant_ds(ds, vec_col, id_col, scale, batch_size)
    refs = qds.to_arrow_refs()
    cents, live = _init_cents(ds, id_col, vec_col, k, scale)
    fold = ray.remote(_block_assign)
    cents, live = _lloyd_updates(refs, cents, live, iterations - 1,
                                 id_col, fold)
    cref = ray.put(cents)
    lref = ray.put(live)
    foldq = ray.remote(_block_assign_q)
    assigned = ray.data.from_arrow_refs(
        [foldq.remote(r, cref, lref, id_col) for r in refs])

    tn2 = tau_num * tau_num
    td2 = tau_den * tau_den
    # |dot| <= sqrt(na_i*na_j) <= na_max (Cauchy-Schwarz), so both
    # dot^2*td2 and tn2*na_i*na_j stay < 2^63 iff na_max^2*td2 does
    na_max_ok = math.isqrt((2 ** 63 - 1) // td2)

    def _prune(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.int64())})
        g = g.take(pc.sort_indices(g[id_col]))
        col = g["q"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = col.type.list_size
        Q = col.values.to_numpy(zero_copy_only=False).reshape(-1, d)
        na = np.einsum("ij,ij->i", Q, Q)
        if len(na) and int(na.max()) > na_max_ok:
            raise ValueError(
                f"max |q|^2 = {int(na.max())} exceeds the exact-int64 "
                f"bound {na_max_ok} for tau_den={tau_den}; lower "
                f"`scale`")
        c = len(Q)
        removed = np.zeros(c, bool)
        for i0 in range(1, c, chunk_rows):  # row 0 has no lower id
            i1 = min(i0 + chunk_rows, c)
            # only columns j < i <= i1-1 can remove a row — slicing to
            # Q[:i1] halves the flops/temporaries of the O(c^2) kernel
            G = Q[i0:i1] @ Q[:i1].T
            lhs = G * G * td2
            rhs = tn2 * np.outer(na[i0:i1], na[:i1])
            dup = (G > 0) & (lhs > rhs)
            jmask = np.arange(i1)[None, :] < np.arange(i0, i1)[:, None]
            removed[i0:i1] = (dup & jmask).any(axis=1)
        return pa.table({
            id_col: g[id_col],
            "cluster": g["cluster"],
            "keep": pa.array((~removed).astype(np.int64), pa.int64()),
        })

    return assigned.groupby("cluster").map_groups(
        _prune, batch_format="pyarrow")
