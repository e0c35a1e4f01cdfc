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

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"first_key": pa.array([], pa.int64()),
                 "block_sum": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "first_key": pa.array(
                    [t[order_col][0].as_py()], pa.int64()
                ),
                "block_sum": pa.array(
                    [int(np.sum(t[size_col].to_numpy()))], pa.int64()
                ),
            }
        )

    parts = (
        sorted_ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # #blocks rows — driver state is O(blocks), never O(rows)
        .sort_values("first_key")
    )
    offsets = np.concatenate(
        [[0], np.cumsum(parts["block_sum"].to_numpy())[:-1]]
    ) if len(parts) else np.zeros(0, np.int64)
    off_map_ref = ray.put(
        dict(zip(parts["first_key"].tolist(), offsets.tolist()))
    )

    def _finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            t = t.append_column("start_offset", pa.array([], pa.int64()))
            return t.append_column("bin", pa.array([], pa.int64()))
        base = ray.get(off_map_ref)[t[order_col][0].as_py()]
        sizes = t[size_col].to_numpy().astype(np.int64)
        starts = base + np.concatenate([[0], np.cumsum(sizes[:-1])])
        t = t.append_column("start_offset", pa.array(starts, pa.int64()))
        return t.append_column(
            "bin", pa.array(starts // chunk, pa.int64())
        )

    return sorted_ds.map_batches(
        _finish, batch_format="pyarrow", batch_size=None
    )
