"""Sharded URL-seen set — cuckoo filter fast path + exact confirmation.

The reference's seen-set is the ``urls`` table's 63-bit primary key
(/root/reference/internal/storage/README.md:11); at 10^10-URL scale a
point-lookup table is replaced by the north rule's **sharded cuckoo
filter** keyed by the canonicalized+hashed URL key, with the key's top
7 bits (``host_shard = key >> 56``, internal/storage/README.md:13,22)
routing each URL to its shard.

Exactness contract (SURVEY.md §7.4.3): a cuckoo false-positive would
*drop* a URL the reference would fetch, so the filter is only the fast
path — cuckoo-positives are confirmed against the shard's exact key
set before a URL is discarded. In this build the exact tier is an
in-actor uint64 hash set persisted per epoch; at 100 TB it is the
shard's keyed cache partition (same lookup, out-of-core).

Determinism contract: during an epoch the shards are **query-only**
(membership frozen at epoch start); newly fetched keys are bulk-added
at epoch commit. Within-epoch duplicates are resolved by an exact
``groupby(key).min(seed_seq)`` instead — so the surviving set never
depends on task arrival order (SURVEY.md §7.4.2).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# splitmix64-style mixing constants
_C1 = np.uint64(0xFF51AFD7ED558CCD)
_C2 = np.uint64(0xC4CEB9FE1A85EC53)
_FP_BITS = 16
_SLOTS = 4


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(33)
        x *= _C1
        x ^= x >> np.uint64(33)
        x *= _C2
        x ^= x >> np.uint64(33)
    return x


class CuckooFilter:
    """Vectorized (num_buckets × 4-slot) cuckoo filter with 16-bit
    fingerprints; ~98% load capacity, deterministic eviction (seeded
    per filter). All batch ops are numpy table lookups — no Python
    loop on the contains() fast path."""

    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0) -> None:
        nb = 1
        while nb * _SLOTS < capacity:
            nb <<= 1
        self.num_buckets = nb
        self.mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.RandomState(seed)

    # ------------------------------------------------------------ hashing
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix(keys) >> np.uint64(64 - _FP_BITS)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (_mix(keys ^ _C2) & self.mask).astype(np.int64)

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = _mix(fp.astype(np.uint64))
        return ((idx.astype(np.uint64) ^ h) & self.mask).astype(np.int64)

    # ----------------------------------------------------------- queries
    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership test → bool array."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        keys = np.asarray(keys, dtype=np.uint64)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        b1 = self.table[i1]  # (n, SLOTS)
        b2 = self.table[i2]
        return ((b1 == fp[:, None]) | (b2 == fp[:, None])).any(axis=1)

    # ----------------------------------------------------------- inserts
    def _insert_one(self, idx: int, fp: int) -> bool:
        i2 = int(self._alt(np.array([idx]), np.array([fp], dtype=np.uint16))[0])
        for i in (idx, i2):
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict loop
        i = idx if self._rng.randint(2) else i2
        cur = fp
        for _ in range(self.MAX_KICKS):
            s = self._rng.randint(_SLOTS)
            cur, self.table[i, s] = int(self.table[i, s]), cur
            i = int(self._alt(np.array([i]), np.array([cur], dtype=np.uint16))[0])
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        return False  # table over capacity

    def add(self, keys: np.ndarray) -> int:
        """Insert keys (idempotence not enforced — callers pre-check
        contains()). Returns number inserted.

        Bulk fast path: vectorized slot placement — for each of the
        two candidate buckets and each slot, place every key whose
        slot is empty (first-come per bucket via np.unique), re-check
        per pass. Only keys that find no empty slot (rare below ~85%
        load) fall back to the per-key eviction loop."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return 0
        fps = self._fp(keys)
        i1s = self._i1(keys)
        i2s = self._alt(i1s, fps)
        remaining = np.ones(len(keys), dtype=bool)
        for idx_arr in (i1s, i2s):
            for s in range(_SLOTS):
                cand = np.flatnonzero(remaining & (self.table[idx_arr, s] == 0))
                if not len(cand):
                    continue
                # one key per bucket per pass; same-bucket peers retry
                _, first = np.unique(idx_arr[cand], return_index=True)
                chosen = cand[first]
                self.table[idx_arr[chosen], s] = fps[chosen]
                remaining[chosen] = False
            if not remaining.any():
                break
        ok = int(len(keys) - remaining.sum())
        for i in np.flatnonzero(remaining):  # eviction path
            if self._insert_one(int(i1s[i]), int(fps[i])):
                ok += 1
        self.count += ok
        return ok

    # ------------------------------------------------------- persistence
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, num_buckets: int, seed: int = 0) -> "CuckooFilter":
        f = cls(num_buckets * _SLOTS, seed=seed)
        f.table = np.frombuffer(data, dtype=np.uint16).reshape(
            num_buckets, _SLOTS
        ).copy()
        f.count = int((f.table != 0).sum())
        return f


class SeenShardState:
    """One shard's two-tier seen set: cuckoo fast path + exact tier as
    SORTED uint64/int64 numpy arrays (16 bytes per key — a Python dict
    costs ~100; at 10^8 keys/shard the dict dies, the arrays don't).
    Membership is a vectorized ``searchsorted``; adds buffer new keys
    in a small bounded dict and merge-sort it into the main arrays
    once it reaches ``_MERGE_THRESHOLD`` (amortized O(log n) per key).
    Pure-Python object so it is testable without Ray; the Ray actor
    below is a thin wrapper.

    TTL semantics mirror the reference's cache-expiry rule
    (internal/storage/storage.go:184-186, test storage_test.go:192-218):
    an entry older than ``now - ttl`` is treated as NOT seen, so the
    crawl re-fetches it — the incremental-recrawl path. Times are
    caller-supplied epoch seconds (logical clock), never wall clock,
    so expiry is deterministic under any parallelism."""

    _MERGE_THRESHOLD = 1 << 16

    def __init__(self, shard_id: int, capacity: int = 1 << 16) -> None:
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity, seed=shard_id)
        self._keys = np.empty(0, dtype=np.uint64)   # sorted
        self._times = np.empty(0, dtype=np.int64)   # aligned with _keys
        self._pending: dict[int, int] = {}          # bounded overlay

    # ------------------------------------------------------------ lookup
    def _find_main(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(found mask, positions) of keys in the sorted main tier."""
        if not len(self._keys):
            return np.zeros(len(keys), dtype=bool), np.zeros(len(keys), np.int64)
        pos = np.searchsorted(self._keys, keys)
        pos = np.clip(pos, 0, len(self._keys) - 1)
        return self._keys[pos] == keys, pos

    def contains(
        self, keys: np.ndarray, min_fetch_time: int | None = None
    ) -> np.ndarray:
        """Membership; with ``min_fetch_time`` an entry fetched before
        it counts as expired ⇒ unseen."""
        keys = np.asarray(keys, dtype=np.uint64)
        maybe = self.filter.contains(keys)  # fast path: most new URLs exit here
        out = np.zeros(len(keys), dtype=bool)
        if maybe.any():
            # exact confirmation — a cuckoo false-positive must not
            # drop a URL (reference PK semantics are exact)
            idx = np.where(maybe)[0]
            sub = keys[idx]
            found, pos = self._find_main(sub)
            times = (
                np.where(found, self._times[pos], np.int64(-1))
                if len(self._times)
                else np.full(len(sub), -1, dtype=np.int64)
            )
            if self._pending:
                pend = self._pending
                for j in np.flatnonzero(~found):
                    t = pend.get(int(sub[j]))
                    if t is not None:
                        found[j] = True
                        times[j] = t
            if min_fetch_time is None:
                out[idx] = found
            else:
                out[idx] = found & (times >= min_fetch_time)
        return out

    # ------------------------------------------------------------- write
    def add(self, keys: np.ndarray, fetch_time: int = 0) -> int:
        """Insert/refresh keys at ``fetch_time``. Returns the number
        not previously present (refreshed entries update their time
        but don't count as new — LWW upsert semantics, G1). Batches at
        least ``_MERGE_THRESHOLD`` wide merge straight into the sorted
        arrays (one concatenate + argsort), bypassing the dict."""
        keys = np.asarray(keys, dtype=np.uint64)
        if not len(keys):
            return 0
        keys = np.unique(keys)
        # grow the cuckoo filter ahead of over-capacity inserts (a full
        # filter silently drops keys ⇒ false NEGATIVES ⇒ refetches)
        cap = self.filter.num_buckets * _SLOTS
        if self.filter.count + len(keys) > int(0.90 * cap):
            self._rebuild_filter(max((self.filter.count + len(keys)) * 2, cap * 2))
        in_filter = self.filter.contains(keys)
        self.filter.add(keys[~in_filter])
        t = int(fetch_time)
        if len(keys) >= self._MERGE_THRESHOLD:
            self._merge_pending()  # bulk path needs an empty overlay
        found, pos = self._find_main(keys)
        if found.any():
            # refresh existing entries in place (vectorized max)
            np.maximum.at(self._times, pos[found], t)
        new = keys[~found]
        if len(new) >= self._MERGE_THRESHOLD:
            # pending is empty and `new` ∉ main: all fresh, one merge
            order_keys = np.concatenate([self._keys, new])
            order_times = np.concatenate(
                [self._times, np.full(len(new), t, dtype=np.int64)]
            )
            order = np.argsort(order_keys, kind="stable")
            self._keys = np.ascontiguousarray(order_keys[order])
            self._times = np.ascontiguousarray(order_times[order])
            return len(new)
        fresh = 0
        pend = self._pending
        for k in new:
            ki = int(k)
            old = pend.get(ki)
            if old is None:
                fresh += 1
                pend[ki] = t
            elif t > old:
                pend[ki] = t
        if len(pend) >= self._MERGE_THRESHOLD:
            self._merge_pending()
        return fresh

    def _rebuild_filter(self, capacity: int) -> None:
        f = CuckooFilter(capacity, seed=self.shard_id)
        if len(self._keys):
            f.add(self._keys)
        if self._pending:
            f.add(
                np.fromiter(
                    self._pending.keys(), dtype=np.uint64, count=len(self._pending)
                )
            )
        self.filter = f

    def _merge_pending(self) -> None:
        if not self._pending:
            return
        n = len(self._pending)
        pk = np.fromiter(self._pending.keys(), dtype=np.uint64, count=n)
        pt = np.fromiter(self._pending.values(), dtype=np.int64, count=n)
        order = np.argsort(pk, kind="stable")
        keys = np.concatenate([self._keys, pk[order]])
        times = np.concatenate([self._times, pt[order]])
        order = np.argsort(keys, kind="stable")
        self._keys = np.ascontiguousarray(keys[order])
        self._times = np.ascontiguousarray(times[order])
        self._pending = {}

    def __len__(self) -> int:
        return len(self._keys) + len(self._pending)

    def mem_bytes(self) -> int:
        """Structural memory of the exact tier + filter (the test
        budget: < 200 MB per 10 M keys)."""
        return (
            self._keys.nbytes
            + self._times.nbytes
            + self.filter.table.nbytes
            + len(self._pending) * 100  # dict overhead estimate
        )

    # ------------------------------------------------------- persistence
    def snapshot(self, path: str) -> None:
        self._merge_pending()
        pq.write_table(
            pa.table(
                {
                    "key": pa.array(self._keys, pa.uint64()),
                    "fetch_time": pa.array(self._times, pa.int64()),
                }
            ),
            path,
        )

    @classmethod
    def restore(cls, shard_id: int, path: str, capacity: int = 1 << 16) -> "SeenShardState":
        st = cls(shard_id, capacity=capacity)
        if os.path.exists(path):
            t = pq.read_table(path)
            keys = t["key"].to_numpy().astype(np.uint64)
            times = (
                t["fetch_time"].to_numpy().astype(np.int64)
                if "fetch_time" in t.column_names
                else np.zeros(len(keys), dtype=np.int64)
            )
            if len(keys):
                order = np.argsort(keys, kind="stable")
                st._keys = np.ascontiguousarray(keys[order])
                st._times = np.ascontiguousarray(times[order])
                cap = max(capacity, int(len(keys) * 1.3))
                st.filter = CuckooFilter(cap, seed=shard_id)
                st.filter.add(st._keys)
        return st


def make_seen_actors(num_shards: int, capacity_per_shard: int = 1 << 16,
                     snapshot_dir: str | None = None):
    """Spawn the shard actor pool (detached=false; the crawl driver
    owns their lifetime). Shard routing: ``host_shard % num_shards``
    keeps same-host URLs on one actor — the partitioning the key's top
    bits were designed for."""
    import ray

    @ray.remote(num_cpus=0.25)
    class SeenShard:
        def __init__(self, shard_id: int) -> None:
            if snapshot_dir is not None:
                self.state = SeenShardState.restore(
                    shard_id,
                    os.path.join(snapshot_dir, f"seen-{shard_id:03d}.parquet"),
                    capacity=capacity_per_shard,
                )
            else:
                self.state = SeenShardState(shard_id, capacity=capacity_per_shard)
            self._stat_n = 0
            self._stat_added = 0
            self._stat_shards: set[int] = set()
            self._commit_tokens: set[int] = set()

        def contains(
            self, keys: np.ndarray, min_fetch_time: int | None = None
        ) -> np.ndarray:
            return self.state.contains(keys, min_fetch_time=min_fetch_time)

        def add(self, keys: np.ndarray, fetch_time: int = 0) -> int:
            return self.state.add(keys, fetch_time=fetch_time)

        def commit(self, keys: np.ndarray, host_shards: np.ndarray,
                   fetch_time: int = 0, token: int | None = None) -> int:
            """add() + epoch-stats accumulation (row count, newly-added
            count, touched host shards) so a pass-through router can
            commit from inside another consumer's execution and the
            driver recovers exact counters via drain_epoch_stats().

            ``token`` makes the commit IDEMPOTENT under Ray task
            retries / object reconstruction: re-executed map tasks
            replay their side effects, and while ``add`` is a set
            (naturally idempotent), the counters are not — a replayed
            batch would inflate ``_stat_n``. Callers pass a
            content-derived batch token; a repeat is acknowledged and
            ignored. Tokens are held until the next drain (retries can
            only happen within the execution the drain barriers on)."""
            if token is not None:
                if token in self._commit_tokens:
                    return 0
                self._commit_tokens.add(token)
            added = self.state.add(keys, fetch_time=fetch_time)
            self._stat_n += int(len(keys))
            self._stat_added += int(added)
            self._stat_shards.update(int(h) for h in host_shards)
            return added

        def drain_epoch_stats(self) -> tuple[int, int, list[int]]:
            out = (self._stat_n, self._stat_added, sorted(self._stat_shards))
            self._stat_n = 0
            self._stat_added = 0
            self._stat_shards = set()
            self._commit_tokens = set()
            return out

        def size(self) -> int:
            return len(self.state)

        def snapshot(self, directory: str) -> str:
            os.makedirs(directory, exist_ok=True)
            p = os.path.join(directory, f"seen-{self.state.shard_id:03d}.parquet")
            self.state.snapshot(p)
            return p

    return [SeenShard.remote(i) for i in range(num_shards)]


def filter_unseen(ds, actors, key_col: str = "key",
                  shard_col: str = "host_shard", batch_size: int = 8192,
                  min_fetch_time: int | None = None):
    """Drop rows whose key is already in the sharded seen set
    (query-only — does NOT mutate the shards; epoch-commit calls
    ``add``). With ``min_fetch_time``, entries fetched before it are
    expired ⇒ kept for re-fetch (the reference's TTL-miss rule).
    Each map task splits its batch by shard and queries the owning
    actors — no shuffle; the actors are the serialization points and
    stay O(batch) per call."""
    import ray

    num_shards = len(actors)

    def _filt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keys = t[key_col].to_numpy().astype(np.uint64)
        shards = t[shard_col].to_numpy().astype(np.int64) % num_shards
        seen = np.zeros(len(keys), dtype=bool)
        refs, idxs = [], []
        for s in np.unique(shards):
            idx = np.where(shards == s)[0]
            refs.append(
                actors[int(s)].contains.remote(
                    keys[idx], min_fetch_time=min_fetch_time
                )
            )
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(refs)):
            seen[idx] = res
        return t.filter(pa.array(~seen))

    return ds.map_batches(_filt, batch_format="pyarrow", batch_size=batch_size)


def bulk_add(actors, keys: np.ndarray, shards: np.ndarray,
             fetch_time: int = 0) -> int:
    """Driver-side add of a small key array (tests / tools). The crawl
    loop uses ``seen_commit_router`` fused into its frontier write —
    keys route to shard actors from the map tasks, never through the
    driver."""
    import ray

    num_shards = len(actors)
    shards = np.asarray(shards, dtype=np.int64) % num_shards
    keys = np.asarray(keys, dtype=np.uint64)
    refs = []
    for s in np.unique(shards):
        refs.append(
            actors[int(s)].add.remote(keys[shards == s], fetch_time=fetch_time)
        )
    return int(sum(ray.get(refs)))


def seen_commit_router(actors, key_col: str = "key",
                       shard_col: str = "host_shard", fetch_time: int = 0,
                       mask_col: str = "admitted"):
    """Pass-through batch fn: routes the batch's admitted keys to the
    owning shard actors and returns the batch UNCHANGED, so the
    seen-commit rides inside another consumer's execution (the crawl
    fuses it into the deferred-rows frontier write) instead of paying
    its own dataset pass. Exact counters accumulate on the actors
    (``SeenShard.commit``); collect them with ``drain_seen_stats``
    AFTER the host execution finishes — the in-task ``ray.get`` below
    is the completion barrier that makes that ordering sound.

    Retry safety: Ray replaces a lost task's block OUTPUT exactly
    once, but the task's SIDE EFFECTS replay — so each per-actor
    commit carries a content-derived token (FNV over the routed key
    bytes + fetch_time) and ``SeenShard.commit`` ignores repeats.
    Within an epoch keys are deduped (politeness D1), so two distinct
    batches can't share a token by content."""
    import ray

    num_shards = len(actors)

    def _route(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        adm = t.filter(t[mask_col]) if mask_col in t.column_names else t
        if adm.num_rows:
            keys = adm[key_col].to_numpy().astype(np.uint64)
            raw = adm[shard_col].to_numpy().astype(np.int64)
            act = raw % num_shards
            refs = []
            for s in np.unique(act):
                m = act == s
                payload = keys[m]
                # deterministic across worker processes (builtin hash()
                # is PYTHONHASHSEED-salted — a retry on another worker
                # would mint a fresh token and defeat the dedup)
                import hashlib

                token = int.from_bytes(
                    hashlib.blake2b(
                        payload.tobytes() + int(fetch_time).to_bytes(8, "little"),
                        digest_size=8,
                    ).digest(),
                    "little",
                )
                refs.append(
                    actors[int(s)].commit.remote(
                        payload, np.unique(raw[m]), fetch_time=fetch_time,
                        token=token,
                    )
                )
            ray.get(refs)
        return t

    return _route


def drain_seen_stats(actors) -> tuple[int, int, list[int]]:
    """(rows committed, newly added, touched host shards) since the
    last drain, summed across shard actors; resets the counters."""
    import ray

    res = ray.get([a.drain_epoch_stats.remote() for a in actors])
    return (
        int(sum(r[0] for r in res)),
        int(sum(r[1] for r in res)),
        sorted({int(s) for r in res for s in r[2]}),
    )


def commit_seen_ds(ds, actors, key_col: str = "key",
                   shard_col: str = "host_shard", fetch_time: int = 0,
                   batch_size: int = 8192):
    """Distributed epoch-commit as its OWN dataset pass: every map task
    routes its batch's keys to the owning shard actors directly (same
    in-task fan-out as ``filter_unseen``); only per-(batch, shard)
    counters flow back. Returns ``(n_rows, newly_added, sorted shard
    ids)`` — the driver never sees a key. Exactness: within an epoch
    keys are already deduped (politeness D1), so per-shard ``fresh``
    counts sum exactly. Standalone/library variant; the crawl loop
    instead fuses ``seen_commit_router`` into its frontier write to
    save the extra execution."""
    import ray

    num_shards = len(actors)

    def _commit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "added": pa.array([], pa.int64()),
                }
            )
        keys = t[key_col].to_numpy().astype(np.uint64)
        raw_shards = t[shard_col].to_numpy().astype(np.int64)
        actor_shards = raw_shards % num_shards
        refs, out_shards, out_n = [], [], []
        for s in np.unique(actor_shards):
            m = actor_shards == s
            refs.append(
                actors[int(s)].add.remote(keys[m], fetch_time=fetch_time)
            )
        total_added = int(sum(ray.get(refs)))
        # rows keyed by HOST shard (manifest lineage); the batch's
        # newly-added total rides on the first row (only sums matter)
        uniq_host = np.unique(raw_shards)
        added_col = [0] * len(uniq_host)
        added_col[0] = total_added
        return pa.table(
            {
                "shard": pa.array(uniq_host, pa.int64()),
                "n": pa.array(
                    [int((raw_shards == h).sum()) for h in uniq_host], pa.int64()
                ),
                "added": pa.array(added_col, pa.int64()),
            }
        )

    stats = ds.map_batches(
        _commit, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()  # ≤ (batches × shards) rows — tiny
    if stats.empty:
        return 0, 0, []
    return (
        int(stats["n"].sum()),
        int(stats["added"].sum()),
        sorted(int(s) for s in stats["shard"].unique()),
    )
