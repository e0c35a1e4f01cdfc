"""Key-partitioned temporal joins Ray Data does not ship.

``asof_join`` implements the classic backward as-of join: for every
left row, attach the latest right row whose ``on`` value is <= the
left row's, within the same ``by`` group (events → most recent prior
click, trade → last quote, request → active config version).

Ray-Data-first shape (no raw tasks): both sides are lifted to one
common schema with a side tag and ``union``-ed, so a SINGLE
``groupby(by)`` hash exchange co-locates each key's rows; the
per-group merge is one sort of the right side plus a vectorized
``np.searchsorted`` — O((L+R) log R) per group, no Python loop over
rows. Partitioning assumption: one ``by`` group fits in a task (the
same assumption every keyed groupby op in this repo documents); salt
hot keys upstream if a single entity's history exceeds a block.

Tie semantics: ``right.on == left.on`` rows DO match (<=), and among
equal ``on`` values the right row sorted last wins — callers needing
stronger determinism should dedup the right side per (by, on) first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(left, right, by: str, on: str,
              right_cols: list[str], suffix: str = "_r"):
    """Backward as-of join; returns the left dataset's columns plus
    ``<col><suffix>`` for each of ``right_cols`` (null when the group
    has no right row at or before the left row's ``on``)."""
    l_schema = left.schema()
    r_schema = right.schema()
    l_fields = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_fields = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    for c in (by, on):
        if c not in l_fields or c not in r_fields:
            raise ValueError(f"join column {c!r} missing from a side")
    left_cols = list(l_schema.names)
    out_right = [c + suffix for c in right_cols]

    def _lift_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__side", pa.array(
            np.ones(t.num_rows, np.int8)))
        for c, oc in zip(right_cols, out_right):
            t = t.append_column(oc, pa.nulls(t.num_rows, r_fields[c]))
        return t

    def _lift_right(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            by: t[by], on: t[on],
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
        }
        for c in left_cols:
            if c not in (by, on):
                cols[c] = pa.nulls(t.num_rows, l_fields[c])
        for c, oc in zip(right_cols, out_right):
            cols[oc] = t[c]
        return pa.table(cols)

    lifted_l = left.map_batches(
        _lift_left, batch_format="pyarrow", batch_size=None)
    lifted_r = right.map_batches(
        _lift_right, batch_format="pyarrow", batch_size=None)
    # align column order (union requires identical schemas)
    order = left_cols + ["__side"] + out_right
    u = lifted_l.select_columns(order).union(
        lifted_r.select_columns(order))

    out_cols = left_cols + out_right
    # the union carries null left-payloads on right rows, so pandas
    # group frames floatify integer left columns; cast them back (left
    # rows are never null in their own columns)
    import pyarrow.types as pat

    int_casts = {
        c: l_fields[c].to_pandas_dtype()
        for c in left_cols
        if pat.is_integer(l_fields[c])
    }

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        is_left = g["__side"].to_numpy() == 1
        lg = g[is_left]
        rg = g[~is_left].sort_values(on, kind="mergesort")
        out = lg[left_cols].reset_index(drop=True)
        for c, dt in int_casts.items():
            out[c] = out[c].astype(dt)
        if len(rg):
            pos = np.searchsorted(
                rg[on].to_numpy(), lg[on].to_numpy(), side="right") - 1
            safe = np.clip(pos, 0, len(rg) - 1)
            hit = pd.Series(pos >= 0)
            for c, oc in zip(right_cols, out_right):
                out[oc] = (
                    rg[oc].iloc[safe].reset_index(drop=True).where(hit)
                )
        else:
            for c, oc in zip(right_cols, out_right):
                out[oc] = pd.Series(
                    index=range(len(lg)), dtype=g[oc].dtype)
        return out[out_cols]

    return u.groupby(by).map_groups(_merge, batch_format="pandas")


def interval_join(left, right, by: str, on: str, lo: str, hi: str,
                  right_cols: list[str], suffix: str = "_r"):
    """Range join: attach to each left row the same-key right interval
    containing its ``on`` value (``lo <= on <= hi``) — events into
    session windows, timestamps into config-validity ranges.

    Same Ray-Data-first shape as :func:`asof_join` (lift + union →
    ONE ``groupby(by)`` exchange → per-group vectorized merge).
    Partitioning assumption: within a key the intervals are
    NON-OVERLAPPING (sessions, validity ranges) — the merge sorts
    intervals by ``lo`` and binary-searches each left ``on``; with
    overlapping intervals only the latest-starting match is returned.
    Left rows covered by no interval get nulls.
    """
    l_schema = left.schema()
    r_schema = right.schema()
    l_fields = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_fields = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    if by not in l_fields or on not in l_fields:
        raise ValueError(f"left side missing {by!r}/{on!r}")
    for c in (by, lo, hi):
        if c not in r_fields:
            raise ValueError(f"right side missing {c!r}")
    left_cols = list(l_schema.names)
    out_right = [c + suffix for c in right_cols]

    def _lift_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__side", pa.array(np.ones(t.num_rows, np.int8)))
        t = t.append_column("__lo", pa.nulls(t.num_rows, r_fields[lo]))
        t = t.append_column("__hi", pa.nulls(t.num_rows, r_fields[hi]))
        for c, oc in zip(right_cols, out_right):
            t = t.append_column(oc, pa.nulls(t.num_rows, r_fields[c]))
        return t

    def _lift_right(t: pa.Table) -> pa.Table:
        cols: dict = {
            by: t[by],
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
            "__lo": t[lo], "__hi": t[hi],
        }
        for c in left_cols:
            if c != by:
                cols[c] = pa.nulls(t.num_rows, l_fields[c])
        for c, oc in zip(right_cols, out_right):
            cols[oc] = t[c]
        return pa.table(cols)

    order = left_cols + ["__side", "__lo", "__hi"] + out_right
    u = left.map_batches(_lift_left, batch_format="pyarrow",
                         batch_size=None).select_columns(order).union(
        right.map_batches(_lift_right, batch_format="pyarrow",
                          batch_size=None).select_columns(order))

    out_cols = left_cols + out_right
    import pyarrow.types as pat

    int_casts = {
        c: l_fields[c].to_pandas_dtype()
        for c in left_cols if pat.is_integer(l_fields[c])
    }

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        is_left = g["__side"].to_numpy() == 1
        lg = g[is_left]
        rg = g[~is_left].sort_values("__lo", kind="mergesort")
        out = lg[left_cols].reset_index(drop=True)
        for c, dt in int_casts.items():
            out[c] = out[c].astype(dt)
        if len(rg):
            on_v = lg[on].to_numpy()
            pos = np.searchsorted(rg["__lo"].to_numpy(), on_v,
                                  side="right") - 1
            safe = np.clip(pos, 0, len(rg) - 1)
            hit = pd.Series(
                (pos >= 0)
                & (on_v <= rg["__hi"].to_numpy()[safe])
            )
            for c, oc in zip(right_cols, out_right):
                out[oc] = (
                    rg[oc].iloc[safe].reset_index(drop=True).where(hit)
                )
        else:
            for c, oc in zip(right_cols, out_right):
                out[oc] = pd.Series(index=range(len(lg)), dtype=g[oc].dtype)
        return out[out_cols]

    return u.groupby(by).map_groups(_merge, batch_format="pandas")
