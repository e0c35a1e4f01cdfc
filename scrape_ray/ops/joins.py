"""Skew-safe temporal joins Ray Data does not ship.

``asof_join`` implements the classic backward as-of join: for every
left row, attach the latest right row whose ``on`` value is <= the
left row's, within the same ``by`` group (events → most recent prior
click, trade → last quote, request → active config version).
``interval_join`` attaches the same-key right interval containing
each left row's ``on`` (events → session windows, ts → validity
ranges; intervals within a key must be non-overlapping).

Skew-safe range-partitioned shape (no per-key group tasks):

1. lift both sides to one common schema with a side tag and a shared
   ``__pos`` sort column (left: ``on``, right: ``on``/``lo``), union;
2. ONE global ``sort([by, __pos, __side])`` — Ray Data's sort SAMPLES
   key tuples for its range boundaries, so a hot key (one user with
   10^8 events at 100 TB) is split across many balanced blocks
   instead of landing in a single ``groupby(by)`` task;
3. boundary handoff: per sorted block, a tiny summary task extracts
   the last right row of the block's LAST key (O(1) per block); a
   driver scan over the #blocks summaries threads a one-row carry
   from each block into the next block of the same key — the same
   O(#blocks)-driver-state two-phase-scan pattern as
   ``packing.pack_offsets``, never O(rows);
4. per-block merge, fully Arrow/numpy-vectorized: because rows are
   sorted by (key, pos, side) with rights (side=0) before lefts
   (side=1) at equal pos, each left row's match is simply the LAST
   right row at a smaller index within its key — one
   ``np.maximum.accumulate`` plus gathers, no Python loop, no pandas
   (integer ``on`` columns never round-trip through float64).

The cross-block handoff is the one place the Dataset API genuinely
cannot express the semantics (a map over blocks with a per-boundary
value), so steps 3-4 run as raw Ray tasks over the sorted dataset's
block refs (zero-copy object-store reads) and are re-wrapped with
``ray.data.from_arrow_refs``.

Partitioning assumptions: ``by`` and the position columns are
non-null; within a key, right intervals are non-overlapping (with
overlap only the latest-starting match is returned). Tie semantics:
``right.on == left.on`` rows DO match (<=), and among equal ``on``
values an arbitrary right row wins (a distributed sort gives no
stable order among fully-equal keys) — callers needing determinism
should dedup the right side per (by, on) first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _block_summary(tbl: pa.Table, by: str, payload_cols: list[str]):
    """O(1)-output per-block summary for the boundary handoff:
    (rows, first key, last key, last right row of the last key as a
    payload dict or None). Runs as a raw Ray task per sorted block."""
    n = tbl.num_rows
    if n == 0:
        return {"n": 0}
    first_by = tbl[by][0].as_py()
    last_by = tbl[by][n - 1].as_py()
    side = tbl["__side"].to_numpy(zero_copy_only=False)
    keys = tbl[by]
    # the block is key-sorted, so the block's LAST right row is the
    # last right row of the last key IFF its key == last_by; otherwise
    # the last key has no right rows in this block — O(1) either way
    r_idx = np.flatnonzero(side == 0)
    payload = None
    if len(r_idx):
        i = int(r_idx[-1])
        if keys[i].as_py() == last_by:
            payload = {c: tbl[c][i].as_py() for c in payload_cols}
    return {"n": n, "first_by": first_by, "last_by": last_by,
            "payload": payload}


def _thread_carries(summaries: list[dict]) -> list:
    """Driver-side O(#blocks) scan: carry the last right row of each
    key across block boundaries. Returns per-block carry-in payloads
    (dict or None); a carry applies to a block only when the block's
    FIRST key continues the carried key."""
    carry_key, carry_payload = None, None
    carry_in: list = []
    for s in summaries:
        if s["n"] == 0:
            carry_in.append(None)
            continue
        if carry_payload is not None and s["first_by"] == carry_key:
            carry_in.append(carry_payload)
        else:
            carry_in.append(None)
        if s["payload"] is not None:
            carry_key, carry_payload = s["last_by"], s["payload"]
        elif carry_key == s["last_by"]:
            pass  # key continues with no new right rows: carry holds
        else:
            carry_key, carry_payload = s["last_by"], None
    return carry_in


def _one_row(schema: pa.Schema, values: dict) -> pa.Table:
    return pa.table(
        {f.name: pa.array([values.get(f.name)], type=f.type)
         for f in schema}
    )


def _merge_block(tbl: pa.Table, carry: dict | None, by: str, on: str,
                 left_cols: list[str], out_right: list[str],
                 check_hi: bool) -> pa.Table:
    """Vectorized in-block merge over the sorted (by, __pos, __side)
    rows: each left row's candidate is the last right row at a smaller
    index; validity = same key (+ ``on <= __hi`` for intervals). The
    carry (last right row of the first key from earlier blocks) is
    prepended as a virtual right row at index 0."""
    if carry is not None and tbl.num_rows:
        vals = dict(carry)
        vals[by] = tbl[by][0].as_py()
        vals["__side"] = 0
        tbl = pa.concat_tables([_one_row(tbl.schema, vals), tbl])
    n = tbl.num_rows
    out_schema_cols = left_cols + out_right
    if n == 0:
        return pa.table(
            {c: tbl[c].combine_chunks() for c in out_schema_cols}
        )
    side = tbl["__side"].to_numpy(zero_copy_only=False)
    karr = tbl[by]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    kcodes = karr.dictionary_encode().indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    last_right = np.maximum.accumulate(np.where(side == 0, idx, -1))
    left_pos = np.flatnonzero(side == 1)
    cand = last_right[left_pos]
    cand_safe = np.maximum(cand, 0)
    valid = (cand >= 0) & (kcodes[cand_safe] == kcodes[left_pos])
    lp = pa.array(left_pos, pa.int64())
    if check_hi:
        hi_at = tbl["__hi"].take(pa.array(cand_safe, pa.int64()))
        on_l = tbl[on].take(lp)
        in_range = pc.fill_null(pc.less_equal(on_l, hi_at), False)
        valid &= in_range.to_numpy(zero_copy_only=False)
    gather = pa.array(cand_safe, pa.int64(), mask=~valid)
    cols = {c: tbl[c].take(lp) for c in left_cols}
    for oc in out_right:
        cols[oc] = tbl[oc].take(gather)
    return pa.table(cols)


def _sorted_boundary_join(u, by: str, on: str, left_cols: list[str],
                          out_right: list[str], check_hi: bool,
                          num_partitions: int | None,
                          stats: dict | None):
    """Shared engine for both joins: sort → summaries → carry scan →
    per-block merge. ``stats`` (optional) receives ``block_rows`` so
    tests can assert the per-task bound under planted key skew."""
    import ray
    import ray.data

    if num_partitions:
        u = u.repartition(num_partitions)
    su = u.sort([by, "__pos", "__side"]).materialize()
    refs = su.to_arrow_refs()
    payload_cols = out_right + (["__hi"] if check_hi else [])

    summ_fn = ray.remote(num_cpus=0.5)(_block_summary)
    summaries = ray.get(
        [summ_fn.remote(r, by, payload_cols) for r in refs]
    )
    if stats is not None:
        stats["block_rows"] = [s["n"] for s in summaries]
    carries = _thread_carries(summaries)

    merge_fn = ray.remote(num_cpus=1)(_merge_block)
    out_refs = [
        merge_fn.remote(r, c, by, on, left_cols, out_right, check_hi)
        for r, c in zip(refs, carries)
    ]
    if not out_refs:
        return ray.data.from_arrow(
            pa.table({c: pa.array([]) for c in left_cols + out_right})
        )
    return ray.data.from_arrow_refs(out_refs)


def asof_join(left, right, by: str, on: str,
              right_cols: list[str], suffix: str = "_r",
              num_partitions: int | None = None,
              stats: dict | None = None):
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
        t = t.append_column("__pos", t[on])
        t = t.append_column("__side", pa.array(
            np.ones(t.num_rows, np.int8)))
        for c, oc in zip(right_cols, out_right):
            t = t.append_column(oc, pa.nulls(t.num_rows, r_fields[c]))
        return t

    def _lift_right(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            by: t[by], on: t[on], "__pos": t[on],
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
        }
        for c in left_cols:
            if c not in (by, on):
                cols[c] = pa.nulls(t.num_rows, l_fields[c])
        for c, oc in zip(right_cols, out_right):
            cols[oc] = t[c]
        return pa.table(cols)

    order = left_cols + ["__pos", "__side"] + out_right
    u = left.map_batches(
        _lift_left, batch_format="pyarrow", batch_size=None
    ).select_columns(order).union(
        right.map_batches(
            _lift_right, batch_format="pyarrow", batch_size=None
        ).select_columns(order)
    )
    return _sorted_boundary_join(
        u, by, on, left_cols, out_right, check_hi=False,
        num_partitions=num_partitions, stats=stats,
    )


def interval_join(left, right, by: str, on: str, lo: str, hi: str,
                  right_cols: list[str], suffix: str = "_r",
                  num_partitions: int | None = None,
                  stats: dict | None = None):
    """Range join: attach to each left row the same-key right interval
    containing its ``on`` value (``lo <= on <= hi``). Left rows
    covered by no interval get nulls. Intervals within a key must be
    non-overlapping (sessions, validity ranges); with overlap only the
    latest-starting match is returned."""
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
        t = t.append_column("__pos", t[on].cast(r_fields[lo]))
        t = t.append_column("__side", pa.array(np.ones(t.num_rows, np.int8)))
        t = t.append_column("__hi", pa.nulls(t.num_rows, r_fields[hi]))
        for c, oc in zip(right_cols, out_right):
            t = t.append_column(oc, pa.nulls(t.num_rows, r_fields[c]))
        return t

    def _lift_right(t: pa.Table) -> pa.Table:
        cols: dict = {
            by: t[by], "__pos": t[lo],
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
            "__hi": t[hi],
        }
        for c in left_cols:
            if c != by:
                cols[c] = pa.nulls(t.num_rows, l_fields[c])
        for c, oc in zip(right_cols, out_right):
            cols[oc] = t[c]
        return pa.table(cols)

    order = left_cols + ["__pos", "__side", "__hi"] + out_right
    u = left.map_batches(
        _lift_left, batch_format="pyarrow", batch_size=None
    ).select_columns(order).union(
        right.map_batches(
            _lift_right, batch_format="pyarrow", batch_size=None
        ).select_columns(order)
    )
    return _sorted_boundary_join(
        u, by, on, left_cols, out_right, check_hi=True,
        num_partitions=num_partitions, stats=stats,
    )


def hash_join(left, right, left_on, right_on=None,
              join_type: str = "inner", P: int = 32,
              right_suffix: str = "_r"):
    """Generic distributed equi-join between two Datasets — the
    classic big-x-big relational join (reference analog: the cache
    hit/miss semi/anti split, ``internal/storage/sqlite.go``'s id_map
    joins — here generalized to arbitrary tables and join types).

    Shape: ONE manual hash-bucketed exchange per side
    (``util.bucket_table_refs`` — per-block ``num_returns=P`` bucket
    slices, no distributed sort, no driver row traffic), then ``P``
    independent join tasks each running Arrow Acero's local hash join
    over its bucket pair. Equal keys hash identically on both sides,
    so bucket-local joins are globally exact; bucketing only co-locates
    — row equality is still decided by Acero on the real key values.
    Per-task memory is (|L|+|R|)/P for uniform keys; a single hot key
    lands in one bucket (inherent to every hash join — for a known
    hot-key set, pre-split with a broadcast join on those keys and
    union, as ``state/cache.py:attach`` does for the small-side case).

    ``left_on``/``right_on``: key column name(s), non-null; numeric/
    temporal keys bucket via their int64 views, string/binary keys
    (URLs — the web case) via the vectorized FNV fold; both sides of
    a key pair must share the numeric-vs-string kind so equal values
    hash alike. ``join_type``: any
    Acero type — "inner", "left outer", "right outer", "full outer",
    "left semi", "left anti", "right semi", "right anti". Right-side
    non-key name collisions take ``right_suffix``. Output row order is
    nondeterministic (P unordered bucket blocks); aggregate or sort
    downstream. Degenerate edge: Ray erases the schema of a FULLY
    empty dataset through some transforms (``schema()`` is None and
    every block is column-less) — such a side contributes only its
    key columns (typed from the other side), since its non-key
    columns are unknowable."""
    import ray
    import ray.data

    from scrape_ray.util import bucket_table_refs

    if isinstance(left_on, str):
        left_on = [left_on]
    if right_on is None:
        right_on = left_on
    elif isinstance(right_on, str):
        right_on = [right_on]
    if len(left_on) != len(right_on):
        raise ValueError("left_on and right_on must have equal length")

    @ray.remote
    def _block_schema(t: pa.Table):
        return t.schema

    def _empty_like(ds, refs) -> pa.Table:
        # Ray can drop a fully-empty dataset's schema (ds.schema() ->
        # None after e.g. repartition), but the materialized blocks
        # still carry theirs — ask them (B tiny remote results)
        s = ds.schema()
        if s is not None and s.names:
            return pa.table(
                {n: pa.array([], t) for n, t in zip(s.names, s.types)})
        schemas = ray.get([_block_schema.remote(r) for r in refs])
        best = max(schemas, key=lambda sc: len(sc.names),
                   default=pa.schema([]))
        return best.empty_table()

    lrefs = list(left.to_arrow_refs())
    rrefs = list(right.to_arrow_refs())
    # Schema anchors: UDF-skipped zero-row blocks keep their UPSTREAM
    # (sometimes column-less) schema, so a bucket whose slices are all
    # empty could lose the key/value columns entirely. Each join task
    # concats one authoritative empty table per side and drops the
    # zero-row slices instead of promoting their stale schemas.
    anchor_l = ray.put(_empty_like(left, lrefs))
    anchor_r = ray.put(_empty_like(right, rrefs))
    if not lrefs:
        lrefs = [anchor_l]
    if not rrefs:
        rrefs = [anchor_r]
    P = max(1, min(P, max(len(lrefs), len(rrefs))))
    ls = bucket_table_refs(lrefs, left_on, P)
    rs = bucket_table_refs(rrefs, right_on, P)

    @ray.remote
    def _join(nl: int, anchor_l: pa.Table, anchor_r: pa.Table,
              *tables):
        lt = pa.concat_tables(
            [anchor_l] + [x for x in tables[:nl] if x.num_rows],
            promote_options="default")
        rt = pa.concat_tables(
            [anchor_r] + [x for x in tables[nl:] if x.num_rows],
            promote_options="default")

        def _fix_keys(tbl, keys, other, other_keys):
            # a fully-empty side has an unknowable schema (zero-column
            # anchor); materialize its key columns (0 rows) typed from
            # the other side so Acero can still run the join
            for k, ok in zip(keys, other_keys):
                if k not in tbl.schema.names:
                    typ = (other[ok].type
                           if ok in other.schema.names else pa.int64())
                    tbl = tbl.append_column(k, pa.array([], typ))
            return tbl

        lt = _fix_keys(lt, left_on, rt, right_on)
        rt = _fix_keys(rt, right_on, lt, left_on)
        return lt.join(
            rt, keys=left_on, right_keys=right_on, join_type=join_type,
            right_suffix=right_suffix, use_threads=False,
        )

    out = [
        _join.remote(
            len(lrefs), anchor_l, anchor_r,
            *[ls[b][p] for b in range(len(lrefs))],
            *[rs[b][p] for b in range(len(rrefs))],
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)


def snapshot_diff(a, b, key, content_cols, P: int = 32,
                  include_unchanged: bool = True):
    """Diff two snapshots of a keyed table — the incremental-recrawl
    primitive (reference analog: the LWW cache upsert decides
    per-URL whether a refetch changed anything,
    ``internal/storage/sqlite.go`` Save/Fetch): classify every key as
    ``new`` (only in ``b``), ``deleted`` (only in ``a``), ``changed``
    (both, any content column differs) or ``unchanged``.

    Composition, fully distributed: tag each side with a presence
    marker, ONE full-outer :func:`hash_join` on ``key`` (bucketed
    exchange per side, coalesced key columns), then a vectorized
    per-batch content compare — no sort, no driver rows. ``key``
    column(s) must share names across sides (numeric/temporal,
    non-null); ``content_cols`` must exist on both sides (the right
    copy takes the ``_r`` suffix internally). Output: key cols +
    ``status`` (string), one row per distinct key; drop the
    ``unchanged`` majority with ``include_unchanged=False`` for the
    100-TB delta-feed shape (most of a recrawl is unchanged)."""
    import numpy as np
    import pyarrow.compute as pc

    keys = [key] if isinstance(key, str) else list(key)
    content_cols = list(content_cols)

    # the diff owns the marker names __a/__b and the _r right-suffix;
    # an input already using them would silently misclassify rows
    for side, ds_side in (("a", a), ("b", b)):
        sch = ds_side.schema()
        names = set(sch.names if sch is not None else ())
        bad = names & ({"__a", "__b"} | {f"{c}_r" for c in content_cols})
        if bad:
            raise ValueError(
                f"snapshot_diff: side {side!r} has reserved column "
                f"name(s) {sorted(bad)} (markers __a/__b and the _r "
                "content suffix are internal)")

    def _tag(name):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                name, pa.array(np.ones(t.num_rows, np.int8)))
        return f

    a2 = a.map_batches(_tag("__a"), batch_format="pyarrow",
                       batch_size=None)
    b2 = b.map_batches(_tag("__b"), batch_format="pyarrow",
                       batch_size=None)
    j = hash_join(a2, b2, keys, join_type="full outer", P=P,
                  right_suffix="_r")

    def _status(t: pa.Table) -> pa.Table:
        # a FULLY empty schema-erased side contributes no marker or
        # content columns to the join output (see hash_join's
        # degenerate-edge note) — absent column == absent side
        names = set(t.schema.names)

        def _col(name):
            return (t[name] if name in names
                    else pa.nulls(t.num_rows, pa.int8()))

        a_in = pc.is_valid(_col("__a")).to_numpy(zero_copy_only=False)
        b_in = pc.is_valid(_col("__b")).to_numpy(zero_copy_only=False)
        diff = np.zeros(t.num_rows, bool)
        for c in content_cols:
            have_a, have_b = c in names, f"{c}_r" in names
            ref_t = (t[c].type if have_a
                     else t[f"{c}_r"].type if have_b else pa.int8())
            av = t[c] if have_a else pa.nulls(t.num_rows, ref_t)
            bv = t[f"{c}_r"] if have_b else pa.nulls(t.num_rows, ref_t)
            # IS DISTINCT FROM semantics: null vs null is EQUAL, null
            # vs value is different (SQL <>'s null-propagation would
            # call both 'unchanged', which is wrong for a diff)
            ne = pc.fill_null(pc.not_equal(av, bv), False)
            ne = pc.or_(ne, pc.xor(pc.is_null(av), pc.is_null(bv)))
            diff |= ne.to_numpy(zero_copy_only=False).astype(bool)
        status = np.select(
            [~a_in, ~b_in, diff], ["new", "deleted", "changed"],
            default="unchanged")
        out = t.select(keys).append_column(
            "status", pa.array(status.astype(object), pa.string()))
        if not include_unchanged:
            out = out.filter(pa.array(status != "unchanged"))
        return out

    return j.map_batches(_status, batch_format="pyarrow",
                         batch_size=None)
