"""Sequence packing for training-data preparation.

GPT-style packing concatenates documents in a defined order and
slices the token stream into fixed-size chunks; the pack layout is
fully determined by each document's START OFFSET in the concatenated
stream — a prefix sum over the ordered size column. Ray Data has no
scan/prefix-sum primitive, so this implements the classic two-phase
distributed scan:

1. global ``sort(order_col)`` then materialize (block boundaries
   freeze; with ``batch_size=None`` each map batch is exactly one
   block),
2. phase 1: per-block (first_key, block_sum) partials — #blocks rows
   to the driver, NOT data rows,
3. phase 2: cumulative block offsets broadcast back (keyed by each
   block's first order value, unique because the sort key is);
   a vectorized local cumsum inside each block finishes the scan.

The sort is the one all-to-all exchange and is inherent to the
semantics (packing is defined by a total order); everything else is
O(rows) local work + O(#blocks) driver state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _scan_bases(sorted_ds, key_cols, ascending, size_col: str):
    """Phases 1+2 of the two-phase distributed prefix scan shared by
    :func:`pack_offsets` and :func:`budget_select`: per-block
    (first key, block_sum) partials — #blocks rows to the driver,
    never data rows — then cumulative block bases broadcast back as a
    ``ray.put`` dict keyed by each block's first-key TUPLE (unique
    because the sort key is). ``ascending`` gives the driver-side
    ordering of each key column (must match the upstream sort)."""
    import ray

    kcols = [f"k{j}" for j in range(len(key_cols))]

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {k: pa.array([], pa.int64()) for k in kcols}
            cols["block_sum"] = pa.array([], pa.int64())
            return pa.table(cols)
        cols = {k: pa.array([int(t[c][0].as_py())], pa.int64())
                for k, c in zip(kcols, key_cols)}
        cols["block_sum"] = pa.array(
            [int(np.sum(t[size_col].to_numpy()))], pa.int64())
        return pa.table(cols)

    parts = (
        sorted_ds.map_batches(
            _partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # O(#blocks) driver state, never O(rows)
        .sort_values(kcols, ascending=list(ascending))
    )
    offs = (
        np.concatenate([[0], np.cumsum(parts["block_sum"].to_numpy())[:-1]])
        if len(parts) else np.zeros(0, np.int64)
    )
    keys = (list(zip(*(parts[k].tolist() for k in kcols)))
            if len(parts) else [])
    return ray.put(dict(zip(keys, offs.tolist())))


def pack_offsets(ds, order_col: str, size_col: str, chunk: int):
    """Adds ``start_offset`` (position of the row's first token in the
    concatenated stream) and ``bin`` (``start_offset // chunk`` — the
    fixed-size chunk its first token lands in). Requires unique
    ``order_col`` values (document ids).

    Scale note: the sort pays the exchange on every byte of the input,
    so pass a NARROW (order, size) projection and join the offsets
    back by ``order_col`` when rows are wide (e.g. carry text) — the
    offsets table is two int64 columns regardless of corpus width."""
    import ray

    sorted_ds = ds.sort(order_col).materialize()
    off_map_ref = _scan_bases(sorted_ds, [order_col], [True], size_col)

    def _finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            t = t.append_column("start_offset", pa.array([], pa.int64()))
            return t.append_column("bin", pa.array([], pa.int64()))
        base = ray.get(off_map_ref)[(int(t[order_col][0].as_py()),)]
        sizes = t[size_col].to_numpy().astype(np.int64)
        starts = base + np.concatenate([[0], np.cumsum(sizes[:-1])])
        t = t.append_column("start_offset", pa.array(starts, pa.int64()))
        return t.append_column(
            "bin", pa.array(starts // chunk, pa.int64())
        )

    return sorted_ds.map_batches(
        _finish, batch_format="pyarrow", batch_size=None
    )


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    chunk_tokens: int = 128, overlap: int = 32,
                    batch_size: int | None = 2048):
    """HF-style stride chunking: each document's whitespace-token
    stream is sliced into windows of ``chunk_tokens`` starting every
    ``stride = chunk_tokens - overlap`` tokens (the standard
    ``return_overflowing_tokens`` layout for long-document training
    prep — the step BEFORE :func:`pack_offsets` when documents exceed
    the sequence length). Emits one row per window: ``(id, chunk_id,
    tok_start, n_tokens, chunk_text)``; whitespace-only documents emit
    no rows. Tokenization matches Python ``str.split()`` (runs of
    whitespace, no empty tokens).

    Stateless per-batch flat map — no shuffle, streams at any scale.
    Fully vectorized ragged-window machinery: Arrow splits the batch's
    texts into one flat token array, numpy builds the overlapping
    take-indices as ragged aranges, and a single ``take`` +
    ``binary_join`` materializes every window's text — no Python loop
    over rows or windows. Output is ~``chunk/stride``× the input token
    volume (the inherent cost of overlap), so size ``batch_size`` for
    the amplified output when overlap is large.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    stride = chunk_tokens - overlap

    import pyarrow.compute as pc

    def _empty() -> pa.Table:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "chunk_id": pa.array([], pa.int64()),
            "tok_start": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })

    def _f(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        if nrows == 0:
            return _empty()
        texts = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
        split = pc.utf8_split_whitespace(texts)
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        # Arrow's split emits empty tokens at string edges; drop them
        # (keeps parity with str.split()) while preserving order.
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, pa.scalar(""))
        flat = flat.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        n = np.bincount(parent, minlength=nrows).astype(np.int64)

        n_chunks = -(-n // stride)  # ceil; 0 tokens -> 0 chunks
        total_ch = int(n_chunks.sum())
        if total_ch == 0:
            return _empty()
        doc_idx = np.repeat(np.arange(nrows, dtype=np.int64), n_chunks)
        ch_excl = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        chunk_id = np.arange(total_ch, dtype=np.int64) - np.repeat(ch_excl, n_chunks)
        tok_start = chunk_id * stride
        n_rep = n[doc_idx]
        lens = np.minimum(tok_start + chunk_tokens, n_rep) - tok_start

        doc_off = np.concatenate(([0], np.cumsum(n)))
        flat_start = doc_off[doc_idx] + tok_start
        total_tok = int(lens.sum())
        lens_excl = np.concatenate(([0], np.cumsum(lens)))[:-1]
        idx = np.repeat(flat_start - lens_excl, lens) + np.arange(total_tok, dtype=np.int64)
        taken = flat.take(pa.array(idx, pa.int64()))
        offs = pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int64())
        windows = pa.LargeListArray.from_arrays(offs, taken)
        chunk_text = pc.binary_join(windows, " ")
        return pa.table({
            id_col: t[id_col].take(pa.array(doc_idx, pa.int64())),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "tok_start": pa.array(tok_start, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk_text": chunk_text.cast(pa.string()),
        })

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def budget_select(ds, score_col: str, size_col: str, budget: int,
                  id_col: str = "doc_id", out_col: str = "cum_tokens"):
    """Token-budget corpus selection — the "best documents until the
    token budget is spent" curation step (DataComp/Dolma-style): order
    rows by ``(score_col DESC, id_col ASC)`` and keep exactly the
    prefix whose running ``size_col`` total (including the row itself)
    stays ``<= budget``; the running total is emitted as ``out_col``,
    so the cut is replayable as SQL ``SUM(size) OVER (ORDER BY score
    DESC, id) <= budget`` (the (score, id) pair is unique, so the
    RANGE/ROWS frame distinction is moot). ``score_col``/``id_col``/
    ``size_col`` must be integers (the engine's exactness contract).

    Scale shape: the same two-phase distributed scan as
    :func:`pack_offsets` — ONE global sort (the inherent exchange:
    selection is defined by a total order), per-block
    (first_key, block_sum) partials (#blocks rows to the driver,
    never data rows), cumulative block bases broadcast back, then a
    vectorized local cumsum + filter inside each block. Pass a NARROW
    (id, score, size) projection and join survivors back by id when
    rows are wide."""
    import ray

    if budget < 0:
        raise ValueError("budget must be >= 0")

    sorted_ds = ds.sort(
        [score_col, id_col], descending=[True, False]).materialize()
    off_map_ref = _scan_bases(sorted_ds, [score_col, id_col],
                              [False, True], size_col)

    def _finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        base = ray.get(off_map_ref)[
            (int(t[score_col][0].as_py()), int(t[id_col][0].as_py()))]
        sizes = t[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = base + np.cumsum(sizes)
        t = t.append_column(out_col, pa.array(cum, pa.int64()))
        return t.filter(pa.array(cum <= budget))

    return sorted_ds.map_batches(
        _finish, batch_format="pyarrow", batch_size=None)
