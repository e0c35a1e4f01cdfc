"""Windowed aggregates over event streams — tumbling windows and
gap-based sessions.

No analog in the reference (its only reduce is the LWW upsert,
SURVEY.md §2.5); these are the training-pipeline/streaming extensions,
built the Ray-Data way:

- **Tumbling**: window assignment + PARTIAL per-batch aggregation
  inside ``map_batches`` (the combiner), then one hash-bucketed
  merge exchange over partials (``util.hash_groupby_sum`` — the
  exchange moves (keys × windows) rows, not events, and skips the
  sort Ray's aggregate would pay).
- **Sessions**: per-user gap splitting needs every user's events
  together once — ONE coarse hash exchange on ``user_id % P``, then a
  vectorized per-user split inside each task (no per-user UDF calls).

Money columns are aggregated in integer cents (``*_cents``) so
results are bit-exact regardless of summation order — float sums
would hash-differ between engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_aggregate(
    ds,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    width_s: int = 600,
):
    """count + sum(value_cents) per (key, window_start). Partial
    aggregation per batch, final aggregation per key — two-level, like
    a combiner."""

    def _partial(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)  # µs since epoch
        # numpy // FLOORS (true tumbling semantics for pre-1970
        # timestamps); Arrow's divide truncates toward zero
        w = width_s * 1_000_000
        win = pa.array((epoch // w) * w, pa.int64())
        # DuckDB ROUND is half-away-from-zero; Arrow's default is
        # half-to-even — pin the mode so exact-.5 cents agree with SQL
        cents = pc.cast(
            pc.round(
                pc.multiply(t[value_col], 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        g = pa.table(
            {
                key_col: t[key_col].combine_chunks(),
                "window_start": win,
                "cents": cents,
            }
        )
        # Arrow-native partial groupby — no pandas round-trip; threads
        # off because the batch already runs inside a Ray task
        res = pa.TableGroupBy(
            g, [key_col, "window_start"], use_threads=False
        ).aggregate([("cents", "count"), ("cents", "sum")])
        return pa.table(
            {
                key_col: res[key_col],
                "window_start": res["window_start"],
                "n_events": pc.cast(res["cents_count"], pa.int64()),
                "sum_cents": res["cents_sum"],
            }
        )

    partial = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    final = _hash_window_merge(partial, key_col)

    def _finish(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["window_start"], pa.timestamp("us"))
        return t.set_column(
            t.column_names.index("window_start"), "window_start", ts
        )

    return final.map_batches(_finish, batch_format="pyarrow", batch_size=None)


def _hash_window_merge(partial, key_col: str):
    """Final (key, window_start) sum via util.hash_groupby_sum: the
    per-batch partials barely compress (one event per window per user
    is the common case), so Ray's sort-based aggregate would pay a
    full range-partition sort over ~#events narrow rows for an
    unordered per-key sum — the manual bucketed exchange does one
    local Arrow groupby per bucket instead (~4.8 s -> ~1 s at
    sf0.1). Returns a Dataset with the same schema as the old
    groupby().aggregate() path."""
    import ray.data

    from scrape_ray.util import hash_groupby_sum

    refs = partial.materialize().to_arrow_refs()
    merged = hash_groupby_sum(
        refs, [key_col, "window_start"], ["n_events", "sum_cents"])
    return ray.data.from_arrow_refs(merged)


def hopping_aggregate(
    ds,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    width_s: int = 600,
    hop_s: int = 300,
):
    """Hopping (sliding) window: count + sum(value_cents) per
    (key, window_start) where windows are ``width_s`` long and start
    every ``hop_s`` (``width_s % hop_s == 0``). Each event belongs to
    exactly width/hop windows — the per-batch partial explodes events
    ×k into NARROW partial rows and pre-aggregates them, so the
    shuffle moves (keys × windows) partials, never k× the event
    stream."""

    if width_s % hop_s:
        raise ValueError("width_s must be a multiple of hop_s")
    k = width_s // hop_s
    hop_us = hop_s * 1_000_000

    def _partial(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64()).to_numpy()  # µs
        cents = (
            pc.cast(
                pc.round(
                    pc.multiply(t[value_col], 100.0),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .to_numpy()
            .astype(np.int64)
        )
        keys = t[key_col].to_numpy()
        base = (epoch // hop_us) * hop_us
        # window starts base, base-hop, ..., base-(k-1)*hop — all
        # contain ts because width = k*hop
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_us, len(base)
        )
        g = pa.table(
            {
                key_col: pa.array(np.repeat(keys, k)),
                "window_start": pa.array(starts, pa.int64()),
                "cents": pa.array(np.repeat(cents, k), pa.int64()),
            }
        )
        res = pa.TableGroupBy(
            g, [key_col, "window_start"], use_threads=False
        ).aggregate([("cents", "count"), ("cents", "sum")])
        return pa.table(
            {
                key_col: res[key_col],
                "window_start": res["window_start"],
                "n_events": pc.cast(res["cents_count"], pa.int64()),
                "sum_cents": res["cents_sum"],
            }
        )

    partial = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    final = _hash_window_merge(partial, key_col)

    def _finish(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["window_start"], pa.timestamp("us"))
        return t.set_column(
            t.column_names.index("window_start"), "window_start", ts
        )

    return final.map_batches(_finish, batch_format="pyarrow", batch_size=None)


def sessionize(
    ds,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_s: int = 1800,
    num_parts: int = 64,
    assign: bool = False,
):
    """Gap-based sessions: a new session starts when a user's
    inter-event gap exceeds ``gap_s``.

    ``assign=False`` (default): one row per session
    (key, session_start, session_end, n_events).

    ``assign=True``: the FUSED sessionize-and-join — one row per input
    EVENT with its containing session's bounds appended. This is the
    efficient form of ``interval_join(events, sessionize(events))``:
    the per-user co-location the gap split already needs is reused for
    the assignment, so the whole job is ONE read + ONE exchange
    instead of two scans and two exchanges.

    Arrow-native group task: sort indices + int64 timestamp math +
    reduceat — no pandas conversion, no per-user Python."""

    def _part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(
                pc.cast(t[key_col], pa.int64()), pa.scalar(num_parts - 1, pa.int64())
            ),
            pa.int32(),
        )
        return t.append_column("__part", part)

    gap_us = gap_s * 1_000_000
    ts_us = pa.timestamp("us")

    def _sessions(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            if assign:
                g = g.append_column("session_start", pa.array([], ts_us))
                return g.append_column("session_end", pa.array([], ts_us))
            return pa.table({
                key_col: g[key_col].combine_chunks(),
                "session_start": pa.array([], ts_us),
                "session_end": pa.array([], ts_us),
                "n_events": pa.array([], pa.int64()),
            })
        idx = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]
        )
        gs = g.take(idx)
        tcol = gs[ts_col]
        if pa.types.is_timestamp(tcol.type):
            tcol = tcol.cast(ts_us)
        ts = tcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
        karr = gs[key_col].combine_chunks()
        kcodes = karr.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_session = np.ones(n, dtype=bool)
        new_session[1:] = (kcodes[1:] != kcodes[:-1]) | (
            (ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(new_session)
        ends = np.concatenate((starts[1:], [n])) - 1
        sid = np.cumsum(new_session) - 1  # session index per sorted row
        s_start, s_end = ts[starts], ts[ends]
        if assign:
            gs = gs.append_column(
                "session_start",
                pa.array(s_start[sid], pa.int64()).cast(ts_us))
            return gs.append_column(
                "session_end", pa.array(s_end[sid], pa.int64()).cast(ts_us))
        return pa.table({
            key_col: karr.take(pa.array(starts, pa.int64())),
            "session_start": pa.array(s_start, pa.int64()).cast(ts_us),
            "session_end": pa.array(s_end, pa.int64()).cast(ts_us),
            "n_events": pa.array(ends - starts + 1, pa.int64()),
        })

    parted = ds.map_batches(_part, batch_format="pyarrow", batch_size=None)
    out = parted.groupby("__part").map_groups(_sessions, batch_format="pyarrow")
    return out.drop_columns(["__part"]) if assign else out


def extract_json_prop(ds, props_col: str = "props", key: str = "k",
                      out_col: str = "prop_k"):
    """JSON property extraction (the reference stores metadata as a
    JSON text blob, internal/storage/storage.go:83 — this is the read
    side, vectorized per batch)."""
    import json

    def _f(t: pa.Table) -> pa.Table:
        vals = []
        for s in t[props_col].to_pylist():
            try:
                v = json.loads(s).get(key) if s else None
            except (ValueError, AttributeError):
                v = None
            vals.append(v)
        return t.append_column(out_col, pa.array(vals, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=None)


def rolling_sum(ds, by: str, order_cols: list[str], value_col: str,
                k: int, out_col: str = "rolling_sum"):
    """Per-row trailing-window aggregate — SQL's
    ``SUM(value) OVER (PARTITION BY by ORDER BY order_cols ROWS
    BETWEEN k PRECEDING AND CURRENT ROW)`` — the rolling-feature
    primitive Ray Data lacks (moving totals/averages per user for
    feature engineering and drift monitors).

    Skew-safe two-phase shape (the same pattern as the temporal joins
    and ``packing.pack_offsets``):

    1. ONE global ``sort([by] + order_cols)`` — Ray's sampled range
       partitioning splits a hot key's rows across many balanced
       blocks instead of sending the whole key to one task;
    2. per-block O(k) boundary summaries → the driver threads a TAIL
       carry (the boundary key's last ≤ k values) from each block
       into the next (O(#blocks · k) driver state, never rows);
    3. per-block vectorized merge: one cumulative sum, window lower
       bound = ``max(i - k, segment_start)`` (the window clamps at
       each key change), carry rows prepended then dropped. No
       per-row Python, no per-key group task.

    ``value_col`` must be int64 (quantize floats upstream — integer
    sums are bit-exact under any split; float rolling sums are not).
    ``by`` must be numeric/temporal and ``[by] + order_cols`` should
    be unique per row for deterministic output."""
    import ray
    import ray.data

    if k < 0:
        raise ValueError("k must be >= 0")
    # empty output must keep the non-empty shape (all input columns +
    # out_col) — Ray erases the schema of fully-empty sorted datasets
    # (0-row COLUMN-LESS blocks), so anchor to the INPUT schema here
    in_sch = ds.schema()
    anchor = pa.schema(
        list(zip(in_sch.names, in_sch.types)) if in_sch is not None else [])

    sorted_ds = ds.sort([by] + order_cols)
    refs = list(sorted_ds.to_arrow_refs())
    if not refs:
        cols = {f.name: pa.array([], f.type) for f in anchor}
        cols[out_col] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))

    @ray.remote
    def _summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        if t[by].null_count or t[value_col].null_count:
            # nulls silently become int64 garbage through numpy —
            # fail loudly instead (SQL-style null-skipping would
            # change window membership semantics)
            raise ValueError(
                f"rolling_sum: null in {by!r}/{value_col!r}")
        byv = t[by].to_numpy(zero_copy_only=False)
        qv = t[value_col].to_numpy(zero_copy_only=False)
        last = byv[-1]
        run = int(t.num_rows - np.searchsorted(byv, last, side="left"))
        tail = (qv[-min(run, k):] if k > 0
                else qv[:0])  # k=0: window is the current row only
        return {
            "first": byv[0].item(), "last": last.item(),
            "tail": tail.astype(np.int64),
        }

    summaries = ray.get([_summary.remote(r) for r in refs])

    # thread the boundary-key tail carry block to block (driver holds
    # O(#blocks * k) values — the two-phase-scan pattern)
    carries: list[np.ndarray] = []
    prev_key, prev_tail = None, np.zeros(0, np.int64)
    for s in summaries:
        if s is None:
            carries.append(np.zeros(0, np.int64))
            continue
        carry = (prev_tail if prev_key is not None
                 and s["first"] == prev_key else np.zeros(0, np.int64))
        carries.append(carry)
        if s["first"] == s["last"]:
            joined = np.concatenate([carry, s["tail"]])
            prev_tail = joined[-k:] if k > 0 else joined[:0]
        else:
            prev_tail = s["tail"]
        prev_key = s["last"]

    @ray.remote
    def _roll(t: pa.Table, carry: np.ndarray):
        n = t.num_rows
        if n == 0:
            # schema-erased empty block: rebuild from the input anchor
            base = (t if t.num_columns
                    else pa.table({f.name: pa.array([], f.type)
                                   for f in anchor}))
            return base.append_column(out_col, pa.array([], pa.int64()))
        byv = t[by].to_numpy(zero_copy_only=False)
        qv = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = len(carry)
        qv2 = np.concatenate([carry, qv])
        by2 = np.concatenate([byv[:1].repeat(nc), byv])
        n2 = len(qv2)
        change = np.concatenate(([True], by2[1:] != by2[:-1]))
        seg_start = np.maximum.accumulate(
            np.where(change, np.arange(n2), 0))
        c = np.concatenate(([0], np.cumsum(qv2)))
        idx = np.arange(n2)
        lo = np.maximum(idx - k, seg_start)
        roll = c[idx + 1] - c[lo]
        return t.append_column(
            out_col, pa.array(roll[nc:], pa.int64()))

    out = [
        _roll.remote(r, carries[i]) for i, r in enumerate(refs)
    ]
    return ray.data.from_arrow_refs(out)


def windowed_distinct(ds, ts_col: str = "ts", key_col: str = "user_id",
                      width_s: int = 600, P: int = 32):
    """Exact distinct keys per tumbling window — the DAU/WAU-style
    "active users per interval" aggregate (COUNT(DISTINCT key) GROUP
    BY window). Naive groupby(window) ships every event to one task
    per window; this ships each DISTINCT (window, key) pair exactly
    once:

    1. per-batch pair dedup (one Arrow groupby — the combiner; the
       exchange then moves per-batch-distinct pairs, not events);
    2. ONE manual hash-bucketed exchange on the PAIR
       (``util.bucket_table_refs``) — each distinct pair lands in
       exactly one bucket, so per-bucket dedup + per-window counts
       SUM exactly, and a hot window's pairs spread over all P
       buckets (skew-safe, unlike bucketing by window alone);
    3. driver merge of the bounded partial (P × #windows rows).

    Returns (window_start timestamp, n_active int64), sorted."""
    import ray
    import ray.data

    from scrape_ray.util import bucket_table_refs

    width_us = width_s * 1_000_000

    def _partial(t: pa.Table) -> pa.Table:
        # normalize to µs first — inputs may be s/ms/ns timestamps
        # (sub-µs components truncate, like SQL's epoch_us)
        epoch = pc.cast(
            t[ts_col].combine_chunks().cast(
                pa.timestamp("us"), safe=False)
            if isinstance(t[ts_col], pa.ChunkedArray)
            else t[ts_col].cast(pa.timestamp("us"), safe=False),
            pa.int64())
        # numpy // FLOORS — same pre-1970 semantics as tumbling/hopping
        epoch_np = epoch.to_numpy(zero_copy_only=False)
        win = pa.array((epoch_np // width_us) * width_us, pa.int64())
        g = pa.table({"window_start": win,
                      key_col: t[key_col].combine_chunks()})
        return pa.TableGroupBy(
            g, ["window_start", key_col], use_threads=False
        ).aggregate([])

    partial = ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    ).materialize()
    refs = list(partial.to_arrow_refs())
    if not refs:
        return ray.data.from_arrow(pa.table({
            "window_start": pa.array([], pa.timestamp("us")),
            "n_active": pa.array([], pa.int64()),
        }))
    P = max(1, min(P, len(refs)))
    sliced = bucket_table_refs(refs, ["window_start", key_col], P)

    @ray.remote
    def _merge(*tables):
        live = [x for x in tables if x.num_rows]
        if not live:
            return pa.table({"window_start": pa.array([], pa.int64()),
                             "n_active": pa.array([], pa.int64())})
        t = pa.concat_tables(live, promote_options="default")
        dd = pa.TableGroupBy(
            t, ["window_start", key_col], use_threads=False
        ).aggregate([])
        res = pa.TableGroupBy(
            dd, ["window_start"], use_threads=False
        ).aggregate([(key_col, "count")])
        return pa.table({
            "window_start": res["window_start"],
            "n_active": pc.cast(res[f"{key_col}_count"], pa.int64()),
        })

    parts = ray.get([
        _merge.remote(*[sliced[b][p] for b in range(len(refs))])
        for p in range(P)
    ])  # bounded driver collect: <= P * #windows tiny rows
    merged = pa.concat_tables(
        [x for x in parts if x.num_rows] or parts[:1],
        promote_options="default")
    if merged.num_rows:
        g = pa.TableGroupBy(
            merged, ["window_start"], use_threads=False
        ).aggregate([("n_active", "sum")])
        merged = pa.table({
            "window_start": g["window_start"],
            "n_active": g["n_active_sum"],
        }).sort_by("window_start")
    out = pa.table({
        "window_start": pc.cast(merged["window_start"],
                                pa.timestamp("us")),
        "n_active": merged["n_active"],
    })
    return ray.data.from_arrow(out)
