"""Deduplication operators — exact and near-duplicate.

Exact URL dedup is the reference's D1 (u63 PK enforces one row per
canonical URL, internal/storage/README.md:11); the content-level
variants (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine) are
the training-data-pipeline extensions this engine adds as first-class
operators.

Scale notes per operator are in each docstring; the common theme is:
hash/shingle/sketch vectorized inside ``map_batches`` (stateless, no
shuffle), then ONE small shuffle on the sketch key, never an
all-pairs comparison.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_hash_column(
    ds,
    text_col: str,
    out_col: str = "content_hash",
    batch_size: int = 8192,
):
    """Vectorized FNV-1a-64 content hash column (reuses the engine's key
    kernel)."""
    from scrape_ray.functions.keys import fnv1a64_arrow

    def _h(t: pa.Table) -> pa.Table:
        s = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
        return t.append_column(
            out_col, pa.array(fnv1a64_arrow(s), pa.uint64()))

    return ds.map_batches(_h, batch_format="pyarrow", batch_size=batch_size)


def dedup_exact(ds, key_col: str, order_col: str, keep: str = "first",
                num_parts: int = 64):
    """One row per key, ordered by ``order_col`` (LWW upsert G1 /
    exact dedup D1). ONE all-to-all exchange: keys hash into
    ``num_parts`` coarse partitions (so the per-group UDF runs
    num_parts times, not once per key — measured ~10× faster), then a
    vectorized sort + drop_duplicates keeps the min/max-order row per
    key. At scale pre-partitioning by host_shard keeps the exchange
    local per shard."""
    asc = keep == "first"

    def _dedup(g: pa.Table) -> pa.Table:
        return _group_head_arrow(g, key_col, order_col, asc, 1)

    parted = ds.map_batches(
        _hash_part(key_col, num_parts), batch_format="pyarrow",
        batch_size=None)
    out = parted.groupby("__part").map_groups(_dedup, batch_format="pyarrow")
    return out.drop_columns(["__part"])


def _hash_part(key_col: str, num_parts: int):
    """Coarse-partition stamping map shared by the keyed-group ops:
    FNV over the Arrow buffer for string keys (zero-copy), masked int
    for numeric keys."""

    def _part(t: pa.Table) -> pa.Table:
        k = t[key_col]
        if pa.types.is_string(k.type) or pa.types.is_large_string(k.type):
            from scrape_ray.functions.keys import fnv1a64_arrow

            h = fnv1a64_arrow(
                pc.coalesce(k, pa.scalar("", pa.string())))
            part = pa.array((h % num_parts).astype(np.int32))
        else:
            part = pc.cast(
                pc.bit_wise_and(
                    pc.cast(k, pa.int64(), safe=False),
                    pa.scalar(num_parts - 1, pa.int64()),
                ),
                pa.int32(),
            )
        return t.append_column("__part", part)

    return _part


def _group_head_arrow(g: pa.Table, key_col: str, order_col: str,
                      asc: bool, k: int) -> pa.Table:
    """Arrow-native per-key head-k inside a coarse partition: one
    stable sort of the group block, adjacent-key segmentation over
    dictionary codes, boolean filter — no pandas conversion (pandas
    floatifies int columns when other rows carry nulls and copies
    every string)."""
    if g.num_rows == 0:
        return g
    idx = pc.sort_indices(
        g,
        sort_keys=[(key_col, "ascending"),
                   (order_col, "ascending" if asc else "descending")],
    )
    gs = g.take(idx)
    karr = gs[key_col]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    # fill_null(-1): all-null keys form ONE group, matching pandas
    # drop_duplicates/groupby semantics
    kc = pc.fill_null(karr.dictionary_encode().indices, -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    firsts = np.concatenate(([True], kc[1:] != kc[:-1]))
    if k == 1:
        return gs.filter(pa.array(firsts))
    starts = np.flatnonzero(firsts)
    seg = np.diff(np.concatenate((starts, [len(kc)])))
    within = np.arange(len(kc)) - np.repeat(starts, seg)
    return gs.filter(pa.array(within < k))


def per_key_topk(ds, key_col: str, order_col: str, k: int = 1,
                 keep: str = "first", num_parts: int = 64):
    """Per-key cap / group top-k: at most ``k`` rows per key — the
    ``k`` smallest (``keep='first'``) or largest (``'last'``) by
    ``order_col``. This is the domain-mixing primitive for corpus
    curation (cap documents per host so one domain can't dominate the
    training set) and the general group-top-k. Same ONE
    coarse-partition exchange as ``dedup_exact`` (its k=1 case):
    Arrow-native sort + per-key head inside the partition task, so the
    per-group UDF runs ``num_parts`` times, not once per key."""
    asc = keep == "first"

    def _topk(g: pa.Table) -> pa.Table:
        return _group_head_arrow(g, key_col, order_col, asc, k)

    parted = ds.map_batches(
        _hash_part(key_col, num_parts), batch_format="pyarrow",
        batch_size=None)
    out = parted.groupby("__part").map_groups(_topk, batch_format="pyarrow")
    return out.drop_columns(["__part"])


# ------------------------------------------------------------------ shingles
def char_ngrams(text: str, n: int = 5) -> set[str]:
    if len(text) < n:
        return {text} if text else set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = text.split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def word_ngram_list(text: str, n: int = 3) -> list[str]:
    """Like word_ngrams but keeps duplicates (~30% faster than the
    set). MinHash's min is duplicate-insensitive, so signatures are
    unchanged; SimHash's per-bit VOTE is not — a repeated shingle votes
    once per occurrence (multiset semantics; texts with unequally
    repeated shingles hash differently than under set semantics).
    ``simhash64_batch`` deliberately uses multiset voting — recompute,
    don't mix, if comparing against set-semantics simhashes."""
    words = text.split()
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _shingle_hashes_flat(
    texts: list[str], ngram: int
) -> tuple[np.ndarray, np.ndarray]:
    """All docs' word-shingle FNV hashes in one flat uint64 array plus
    a per-doc count vector — ONE vectorized hash pass per batch
    instead of one numpy round-trip per document."""
    from scrape_ray.functions.keys import fnv1a64

    all_shingles: list[bytes] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        sh = word_ngram_list(t or "", ngram)
        counts[i] = len(sh)
        all_shingles.extend(s.encode("utf-8") for s in sh)
    hv = fnv1a64(all_shingles) if all_shingles else np.zeros(0, np.uint64)
    return hv, counts


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# ------------------------------------------------------------------- minhash
class MinHasher:
    """Vectorized MinHash signatures over word shingles.

    num_perm multiply-shift hash "permutations"
    h_i(x) = a_i * x + b_i  (mod 2^64, odd a_i — a bijection on u64,
    so min-stability holds exactly like a modular family) over 64-bit
    FNV shingle hashes; seeds fixed ⇒ deterministic. One (num_perm ×
    n_shingles) numpy broadcast per doc — no Python inner loop."""

    def __init__(self, num_perm: int = 128, ngram: int = 3, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.ngram = ngram
        a = rng.randint(0, np.iinfo(np.int64).max, size=num_perm).astype(np.uint64)
        self.a = a | np.uint64(1)  # odd ⇒ invertible mod 2^64
        self.b = rng.randint(0, np.iinfo(np.int64).max, size=num_perm).astype(
            np.uint64
        )

    def signature(self, text: str) -> np.ndarray:
        return self.signatures_batch([text])[0]

    # chunk size: (num_perm × _CHUNK) uint64 ≈ 2 MB at 64 perms —
    # stays in L2/L3; big flat temporaries page-fault and dominate
    _CHUNK = 4096

    def signatures_batch(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 signatures — one flat hash pass,
        then per ~4k-shingle chunk a broadcast into a REUSED buffer +
        segmented min (np.minimum.reduceat). No per-document numpy
        round-trips, no large allocations."""
        n = len(texts)
        out = np.zeros((n, self.num_perm), dtype=np.uint64)
        hv, counts = _shingle_hashes_flat(texts, self.ngram)
        if not len(hv):
            return out
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        nonempty = np.flatnonzero(counts)
        budget = self._CHUNK
        buf = np.empty((self.num_perm, budget), dtype=np.uint64)
        a_col = self.a[:, None]
        b_col = self.b[:, None]
        lo = 0
        with np.errstate(over="ignore"):
            while lo < len(nonempty):
                hi = lo
                tot = 0
                while hi < len(nonempty) and (
                    tot == 0 or tot + counts[nonempty[hi]] <= budget
                ):
                    tot += counts[nonempty[hi]]
                    hi += 1
                docs = nonempty[lo:hi]
                s0 = starts[docs[0]]
                end = starts[docs[-1]] + counts[docs[-1]]
                seg = hv[s0:end]
                w = len(seg)
                if w > budget:  # single doc wider than the buffer
                    buf2 = np.empty((self.num_perm, w), dtype=np.uint64)
                    np.multiply(a_col, seg[None, :], out=buf2)
                    buf2 += b_col
                    m = buf2
                else:
                    m = buf[:, :w]
                    np.multiply(a_col, seg[None, :], out=m)
                    m += b_col
                bounds = (starts[docs] - s0).astype(np.int64)
                mins = np.minimum.reduceat(m, bounds, axis=1)
                out[docs] = mins.T
                lo = hi
        return out


_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRM = np.uint64(0x100000001B3)


def _band_bucket_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 bucket keys: FNV-style fold of each
    band's signature values (vectorized over docs × bands). Equal band
    contents always collide, which is all LSH recall needs."""
    n, perm = sigs.shape
    r = perm // bands
    s = sigs.reshape(n, bands, r)
    h = np.full((n, bands), _FNV_OFF, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(r):
            h = (h ^ s[:, :, j]) * _FNV_PRM
    return h


class MinHashStage:
    """Actor-pool map_batches stage: text → minhash signature + LSH
    band keys. Permutation tables built once per actor."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 64,
        bands: int = 16,
        ngram: int = 3,
    ) -> None:
        assert num_perm % bands == 0
        self.hasher = MinHasher(num_perm=num_perm, ngram=ngram)
        self.text_col = text_col
        self.id_col = id_col
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        texts = t[self.text_col].to_pylist()
        sigs = self.hasher.signatures_batch(texts)
        buckets = _band_bucket_matrix(sigs, self.bands)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.bands))
        return pa.table(
            {
                self.id_col: pc.take(t[self.id_col].combine_chunks(), idx),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n)
                ),
                "bucket": pa.array(buckets.reshape(-1), pa.uint64()),
            }
        )


def minhash_lsh_pairs(ds, text_col: str, id_col: str, num_perm=64, bands=16, ngram=3,
                      concurrency=None, max_bucket_width: int | None = None):
    """Near-dup CANDIDATE pairs via MinHash+LSH (no exact verify —
    ``near_dup_pairs`` is the verified variant): signature per doc
    (actor-pool map_batches) → explode to (band, bucket, id) — never
    text — → coarse hash partitions → in-task bucketing → distinct
    pairs. Only bucket-mates pair; buckets wider than
    ``max_bucket_width`` truncate to star pairs around the
    representative — the output keeps a bool ``truncated`` column so
    callers can see which candidates came from a capped bucket
    (``max_bucket_width=None`` for full emission, no flag column)."""
    kwargs = dict(
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, ngram=ngram
        ),
        batch_format="pyarrow",
        batch_size=2048,
    )
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        banded = ds.map_batches(MinHashStage, **kwargs)
    else:
        banded = ds.map_batches(
            MinHashStage(text_col=text_col, id_col=id_col, num_perm=num_perm,
                         bands=bands, ngram=ngram),
            batch_format="pyarrow",
            batch_size=2048,
        )

    keyed = banded.map_batches(
        _combine_band_bucket, batch_format="pyarrow", batch_size=None
    )
    if max_bucket_width is None:
        return _distinct_pairs(
            grouped_pairs(keyed, "band_bucket", id_col, max_bucket_width=None)
        )
    return _distinct_pairs(
        grouped_pairs(keyed, "band_bucket", id_col, max_bucket_width=max_bucket_width),
        order_col="truncated",
    )


def near_dup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 32,
    batch_size: int = 2048,
    max_bucket_width: int | None = None,
    num_partitions: int | None = None,
):
    """Verified near-duplicate pairs: MinHash-LSH candidate generation
    followed by EXACT word-trigram Jaccard confirmation — output is
    exactly {pairs with J(a,b) ≥ threshold} (probabilistic only in the
    negligible band-miss tail: with r=2, b=32, P[miss | J=0.7] ≈ 5e-10)
    — EXCEPT inside buckets wider than ``max_bucket_width``: those emit
    UNVERIFIED star edges around the bucket representative instead of
    all N² verified pairs (logged per bucket). The star edges are kept
    in the output without the Jaccard test — dropping edges that fail
    against the representative would silently erase cluster members
    whose true near-dup is another member. The DEFAULT is
    ``max_bucket_width=None`` — strict exact semantics (every emitted
    pair truly meets the threshold) at O(N²) worst-case bucket cost;
    truncation is the explicit opt-in for boilerplate-heavy corpora at
    scale (pass e.g. ``max_bucket_width=4096``), and it changes the
    output contract, so oracle-verified callers must not enable it.

    Scale design (the 100 TB path): the banded explode carries ONLY
    (id, band, bucket) — never text, so the LSH exchange moves
    ~20 bytes × bands per doc instead of the document body × bands.
    Cross-band pair dedup stays DISTRIBUTED (candidates can exceed
    output scale on skewed corpora); only the unique candidate ID
    ARRAY (bounded by the doc count) is pulled to the driver for the
    broadcast semi-join that filters the corpus down to candidate
    texts — so the verify stage touches candidate rows only, never the
    full text table.
    """
    import ray
    import ray.data

    # ds is consumed twice (banding + the candidate-text filter). Ray
    # re-executes the input lineage per consumer — fine for a parquet
    # read (columnar, pruned); pre-``materialize()`` the input yourself
    # if its upstream is expensive.
    docs = ds

    stage = MinHashStage(
        text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, ngram=3
    )
    banded = docs.map_batches(stage, batch_format="pyarrow", batch_size=batch_size)
    keyed = banded.map_batches(
        _combine_band_bucket, batch_format="pyarrow", batch_size=None
    )
    raw_pairs = grouped_pairs(
        keyed, "band_bucket", id_col, max_bucket_width=max_bucket_width
    )
    if max_bucket_width is None:
        raw_pairs = raw_pairs.map_batches(
            lambda t: t.append_column(
                "truncated", pa.array([False] * t.num_rows, pa.bool_())
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    # distributed cross-band dedup (candidate pair count can exceed
    # output scale — never concentrate it on the driver). A pair seen
    # untruncated in ANY bucket keeps truncated=False (sorts first), so
    # it goes through the normal verify.
    cands = _distinct_pairs(raw_pairs, order_col="truncated").materialize()

    # only the unique candidate ID ARRAY reaches the driver — bounded
    # by the number of candidate documents, not candidate pairs
    def _uniq_ids(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate([t["id_a"].to_numpy(), t["id_b"].to_numpy()])
        )
        return pa.table({"id": pa.array(u)})

    from scrape_ray.util import collect_nonempty

    id_parts = collect_nonempty(
        cands.map_batches(_uniq_ids, batch_format="pyarrow", batch_size=None)
    )
    if not id_parts:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
        )
    cand_ids = np.unique(
        np.concatenate([t["id"].to_numpy() for t in id_parts])
    )
    ids_ref = ray.put(cand_ids)

    def _only_candidates(t: pa.Table) -> pa.Table:
        arr = ray.get(ids_ref)
        v = t[id_col].to_numpy()
        pos = np.clip(np.searchsorted(arr, v), 0, len(arr) - 1)
        return t.filter(pa.array(arr[pos] == v))

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(8, cpus))

    texts = docs.select_columns([id_col, text_col]).map_batches(
        _only_candidates, batch_format="pyarrow", batch_size=None
    ).materialize()  # candidate texts only — object store, tiny

    if texts.size_bytes() < 256 * 1024 * 1024:
        # broadcast-verify fast path: the filtered text table fits a
        # broadcast, so skip the join shuffles entirely — ship it once
        # via ray.put and look both sides up per pair batch
        t_tbl = pa.concat_tables(collect_nonempty(texts))
        order = pc.sort_indices(t_tbl[id_col])
        t_tbl = t_tbl.take(order)
        texts_ref = ray.put(
            (t_tbl[id_col].to_numpy(), t_tbl[text_col].to_pylist())
        )

        def _verify_bcast(t: pa.Table) -> pa.Table:
            ids_sorted, txts = ray.get(texts_ref)
            cache: dict = {}

            def sh(i):
                v = cache.get(i)
                if v is None:
                    pos = int(np.searchsorted(ids_sorted, i))
                    txt = (
                        txts[pos]
                        if pos < len(ids_sorted) and ids_sorted[pos] == i
                        else ""
                    )
                    v = cache[i] = word_ngrams(txt or "", 3)
                return v

            ia = t["id_a"].to_numpy()
            ib = t["id_b"].to_numpy()
            trunc = t["truncated"].to_pylist()
            # truncated star edges bypass the test (see docstring)
            keep = [
                tr or jaccard(sh(int(x)), sh(int(y))) >= threshold
                for x, y, tr in zip(ia, ib, trunc)
            ]
            return t.filter(pa.array(keep)).select(["id_a", "id_b"])

        return cands.map_batches(
            _verify_bcast, batch_format="pyarrow", batch_size=None
        )

    def _rename_to(col: str):
        def _f(t: pa.Table) -> pa.Table:
            drop = [c for c in (id_col,) if c in t.column_names]
            t = t.drop_columns(drop) if drop else t
            i = t.column_names.index(text_col)
            return t.set_column(i, col, t[text_col])

        return _f

    j = cands.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_a",),
        right_on=(id_col,),
    ).map_batches(_rename_to("__text_a"), batch_format="pyarrow", batch_size=None)
    j = j.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_b",),
        right_on=(id_col,),
    ).map_batches(_rename_to("__text_b"), batch_format="pyarrow", batch_size=None)

    def _verify(t: pa.Table) -> pa.Table:
        a = t["__text_a"].to_pylist()
        b = t["__text_b"].to_pylist()
        cache: dict = {}

        def sh(i, txt):
            v = cache.get(i)
            if v is None:
                v = cache[i] = word_ngrams(txt or "", 3)
            return v

        ids_a = t["id_a"].to_pylist()
        ids_b = t["id_b"].to_pylist()
        trunc = t["truncated"].to_pylist()
        keep = [
            tr or jaccard(sh(ia, ta), sh(ib, tb)) >= threshold
            for ia, ta, ib, tb, tr in zip(ids_a, a, ids_b, b, trunc)
        ]
        return t.filter(pa.array(keep)).select(["id_a", "id_b"])

    return j.map_batches(_verify, batch_format="pyarrow", batch_size=None)


def _combine_band_bucket(t: pa.Table) -> pa.Table:
    """(band, bucket) → one int64 bucket key for grouped_pairs."""
    key = pc.bit_wise_xor(
        pc.multiply(
            pc.cast(t["band"], pa.int64()), pa.scalar(0x9E3779B9, pa.int64())
        ),
        pc.cast(
            pc.bit_wise_and(t["bucket"], pa.scalar((1 << 62) - 1, pa.uint64())),
            pa.int64(),
        ),
    )
    return t.append_column("band_bucket", key)


def _emit_bucket_pairs(members, cap, out_a, out_b, out_t, seen_pairs=None):
    """Append a bucket's pairs. Past ``cap`` members the full O(N²)
    emission is truncated to a STAR around the min id — the
    skewed-bucket guard for boilerplate-heavy corpora. Star edges keep
    every member attached to the bucket representative (connected
    components survive), but pairwise relations between
    non-representative members are NOT emitted — downstream verifiers
    must keep truncated edges unverified rather than filter them, or
    members whose only emitted edge fails the similarity test would
    vanish. Truncated rows are flagged; the event is logged once per
    bucket."""
    ms = sorted(set(members))
    if len(ms) < 2:
        return
    if cap is not None and len(ms) > cap:
        import logging

        logging.getLogger("scrape_ray.ops.dedup").warning(
            "bucket width %d > cap %d: emitting %d star pairs instead of "
            "%d full pairs",
            len(ms), cap, len(ms) - 1, len(ms) * (len(ms) - 1) // 2,
        )
        rep = ms[0]
        for m in ms[1:]:
            p = (rep, m)
            if seen_pairs is not None:
                if p in seen_pairs:
                    continue
                seen_pairs.add(p)
            out_a.append(rep)
            out_b.append(m)
            out_t.append(True)
        return
    for x in range(len(ms)):
        for y in range(x + 1, len(ms)):
            p = (ms[x], ms[y])
            if seen_pairs is not None:
                if p in seen_pairs:
                    continue
                seen_pairs.add(p)
            out_a.append(ms[x])
            out_b.append(ms[y])
            out_t.append(False)


def grouped_pairs(ds, key_col: str, id_col: str, num_parts: int = 64,
                  max_bucket_width: int | None = None):
    """All (id_a < id_b) pairs sharing ``key_col`` — one coarse hash
    exchange (num_parts partitions), in-task bucketing. The building
    block for fingerprint/exact-content dup-pair reports.

    ``max_bucket_width``: past this many members a bucket emits star
    pairs around its min id instead of all N² pairs (see
    ``_emit_bucket_pairs``) and the output gains a bool ``truncated``
    column. None (default) keeps exact full-pair semantics."""

    def _part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(
                pc.cast(t[key_col], pa.int64(), safe=False),
                pa.scalar(num_parts - 1, pa.int64()),
            ),
            pa.int32(),
        )
        return t.append_column("__part", part)

    def _pairs(g: pa.Table) -> pa.Table:
        # Arrow-native: one lexsort groups the keys (members sorted
        # ascending, matching the id_a < id_b contract); the Python
        # loop runs only over MULTI-member buckets (the rare dups),
        # never per row
        if g.num_rows == 0 or id_col not in g.column_names:
            cols = {"id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64())}
            if max_bucket_width is not None:
                cols["truncated"] = pa.array([], pa.bool_())
            return pa.table(cols)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        keys = g[key_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        ks, vs = keys[order], ids[order]
        new = np.ones(len(ks), bool)
        new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(ks)))
        out_a: list = []
        out_b: list = []
        out_t: list = []
        multi = counts > 1
        for s, c in zip(starts[multi], counts[multi]):
            _emit_bucket_pairs(
                vs[s:s + c].tolist(), max_bucket_width, out_a, out_b, out_t)
        id_type = g[id_col].type if g.num_columns else pa.int64()
        cols = {"id_a": pa.array(out_a, id_type),
                "id_b": pa.array(out_b, id_type)}
        if max_bucket_width is not None:
            cols["truncated"] = pa.array(out_t, pa.bool_())
        return pa.table(cols)

    parted = ds.map_batches(_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("__part").map_groups(_pairs, batch_format="pyarrow")


def _distinct_pairs(pairs_ds, order_col: str = "id_a"):
    """Distinct (id_a, id_b) — a pair surfaces from several bands.
    ``order_col`` picks which duplicate row survives (ascending, keep
    first): e.g. ``truncated`` keeps an untruncated sighting of a pair
    over a star-truncated one."""
    pairs_ds = pairs_ds.map_batches(
        lambda t: t.append_column(
            "pair_key",
            pc.add(
                pc.multiply(
                    pc.cast(t["id_a"], pa.int64()), pa.scalar(1 << 32, pa.int64())
                ),
                pc.cast(t["id_b"], pa.int64()),
            ),
        ),
        batch_format="pyarrow",
    )
    return dedup_exact(pairs_ds, "pair_key", order_col).drop_columns(["pair_key"])


# -------------------------------------------------------------------- simhash
def simhash64(text: str, ngram: int = 3) -> int:
    """64-bit SimHash over word n-gram FNV hashes (deterministic)."""
    return int(simhash64_batch([text], ngram)[0])


def simhash64_batch(texts: list[str], ngram: int = 3) -> np.ndarray:
    """Vectorized SimHash for a batch: one flat shingle-hash pass, one
    bit-unpack + segmented vote sum (np.add.reduceat) per ~2^18-shingle
    chunk. Duplicate shingles vote twice — same as hashing a list; the
    per-bit majority is order-invariant."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    hv, counts = _shingle_hashes_flat(texts, ngram)
    if not len(hv):
        return out
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    nonempty = np.flatnonzero(counts)
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
    budget = 4096  # (budget × 64) int64 ≈ 2 MB reused buffer
    bitbuf = np.empty((budget, 64), dtype=np.int64)
    lo = 0
    while lo < len(nonempty):
        hi = lo
        tot = 0
        while hi < len(nonempty) and (tot == 0 or tot + counts[nonempty[hi]] <= budget):
            tot += counts[nonempty[hi]]
            hi += 1
        docs = nonempty[lo:hi]
        s0 = starts[docs[0]]
        seg = hv[s0 : starts[docs[-1]] + counts[docs[-1]]]
        w = len(seg)
        bits = bitbuf[:w] if w <= budget else np.empty((w, 64), dtype=np.int64)
        np.bitwise_and(seg[:, None] >> shifts, np.uint64(1), out=bits, casting="unsafe")
        sums = np.add.reduceat(bits, (starts[docs] - s0).astype(np.int64), axis=0)
        vote = sums * 2 - counts[docs][:, None]
        out[docs] = (vote > 0).astype(np.uint64) @ powers
        lo = hi
    return out


def add_simhash_column(ds, text_col: str, out_col: str = "simhash", ngram: int = 3):
    def _s(t: pa.Table) -> pa.Table:
        vals = simhash64_batch(t[text_col].to_pylist(), ngram)
        return t.append_column(out_col, pa.array(vals, pa.uint64()))

    return ds.map_batches(_s, batch_format="pyarrow", batch_size=2048)


def simhash_dup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    ngram: int = 3,
    batch_size: int = 2048,
    max_bucket_width: int | None = None,
):
    """SimHash near-dup pairs with EXACT recall: split the 64-bit
    simhash into ``max_hamming + 1`` blocks — any pair within the
    hamming radius shares ≥1 identical block (pigeonhole), so
    bucketing by (block_idx, block_value) plus an in-bucket hamming
    verify finds exactly {pairs: hamming(a,b) ≤ max_hamming}. One
    shuffle (the bucket groupby), ×(max_hamming+1) explode of narrow
    columns only.

    EXCEPTION — skew guard: buckets wider than ``max_bucket_width``
    emit UNVERIFIED star edges around the representative (logged);
    those are kept in the output regardless of their hamming distance
    (the ``hamming`` column reports the true distance, which may
    exceed ``max_hamming`` on star edges) — dropping them would erase
    cluster members whose true near-dup is a non-representative
    member. The DEFAULT ``max_bucket_width=None`` is strictly exact at
    O(N²) worst-case bucket cost; truncation is the explicit scale
    opt-in and changes the output contract."""
    nblocks = max_hamming + 1
    bits = 64 // nblocks

    def _band(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sh = simhash64_batch(t[text_col].to_pylist(), ngram)  # (n,)
        shift = (np.arange(nblocks, dtype=np.uint64) * np.uint64(bits))[None, :]
        mask = np.uint64((1 << bits) - 1)
        vals = (sh[:, None] >> shift) & mask  # (n, nblocks)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), nblocks))
        return pa.table(
            {
                id_col: pc.take(t[id_col].combine_chunks(), idx),
                "simhash": pa.array(np.repeat(sh, nblocks), pa.uint64()),
                "block": pa.array(np.tile(np.arange(nblocks, dtype=np.int32), n)),
                "block_val": pa.array(vals.reshape(-1), pa.uint64()),
            }
        )

    banded = ds.map_batches(_band, batch_format="pyarrow", batch_size=batch_size)

    # ONE coarse exchange (same pattern as near_dup_pairs): hash
    # (block, block_val) into 64 partitions, bucket locally per task —
    # a per-(block,block_val) map_groups runs the UDF once per bucket
    num_parts = 64

    def _part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(
                pc.add(
                    pc.multiply(
                        pc.cast(t["block"], pa.int64()),
                        pa.scalar(1_000_003, pa.int64()),
                    ),
                    pc.cast(
                        pc.bit_wise_and(
                            t["block_val"], pa.scalar((1 << 62) - 1, pa.uint64())
                        ),
                        pa.int64(),
                    ),
                ),
                pa.scalar(num_parts - 1, pa.int64()),
            ),
            pa.int32(),
        )
        return t.append_column("part", part)

    def _verify_part(g: pa.Table) -> pa.Table:
        # Arrow-native: one lexsort groups the (block, block_val)
        # buckets with members ascending by id; Python touches only
        # MULTI-member buckets and the (few) candidate pairs
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if g.num_rows == 0 or id_col not in g.column_names:
            return empty
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = g["block"].to_numpy(zero_copy_only=False).astype(np.int64)
        bvl = g["block_val"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shv = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, bvl, blk))
        sid, sbk, sbv, ssh = ids[order], blk[order], bvl[order], shv[order]
        new = np.ones(len(sid), bool)
        new[1:] = (sbk[1:] != sbk[:-1]) | (sbv[1:] != sbv[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(sid)))
        seen_pairs: set = set()
        cand_a: list = []
        cand_b: list = []
        cand_t: list = []
        hashes: dict = {}
        multi = counts > 1
        for s, c in zip(starts[multi], counts[multi]):
            members = sid[s:s + c].tolist()
            for i, h in zip(members, ssh[s:s + c].tolist()):
                hashes[i] = h
            _emit_bucket_pairs(
                members, max_bucket_width, cand_a, cand_b, cand_t,
                seen_pairs=seen_pairs,
            )
        out_a, out_b, out_d = [], [], []
        for a, b, tr in zip(cand_a, cand_b, cand_t):
            d = bin(hashes[a] ^ hashes[b]).count("1")
            # truncated star edges are kept unverified (see docstring)
            if tr or d <= max_hamming:
                out_a.append(a)
                out_b.append(b)
                out_d.append(d)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_d, pa.int64())})

    pairs = banded.map_batches(_part, batch_format="pyarrow", batch_size=None)
    pairs = pairs.groupby("part").map_groups(
        _verify_part, batch_format="pyarrow")
    return _distinct_pairs(pairs)


# ------------------------------------------------------- embedding near-dup
def embedding_dup_pairs(ds, vec_col: str, id_col: str, threshold: float = 0.95,
                        n_planes: int = 12, seed: int = 7):
    """Embedding-cosine near-dup via random-hyperplane LSH: bucket by
    sign pattern (map_batches, no shuffle), then exact cosine only
    within buckets (groupby bucket). At 100 TB the bucket groupby is
    the one exchange; n_planes bounds bucket width."""
    state = {"planes": None, "seed": seed, "n_planes": n_planes}

    def _bucket(t: pa.Table) -> pa.Table:
        from scrape_ray.util import vecs_to_numpy

        vecs = vecs_to_numpy(t[vec_col])
        if state["planes"] is None or state["planes"].shape[1] != vecs.shape[1]:
            rng = np.random.RandomState(state["seed"])
            state["planes"] = rng.normal(size=(state["n_planes"], vecs.shape[1])).astype(
                np.float32
            )
        signs = (vecs @ state["planes"].T) > 0
        buckets = (signs * (1 << np.arange(state["n_planes"]))).sum(axis=1)
        return pa.table(
            {
                id_col: t[id_col].combine_chunks(),
                vec_col: t[vec_col].combine_chunks(),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", batch_size=4096)

    # coarse partitions (not per-bucket groups): one exchange, then
    # per-bucket exact cosine locally inside each of the 64 tasks
    num_parts = 64

    def _part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        part = pc2.cast(
            pc2.bit_wise_and(t["bucket"], pa.scalar(num_parts - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("__part", part)

    def _exact(g: pa.Table) -> pa.Table:
        # Arrow-native: lexsort groups the LSH buckets; the numpy
        # cosine block runs once per MULTI-member bucket
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if g.num_rows == 0 or id_col not in g.column_names:
            return empty
        from scrape_ray.util import vecs_to_numpy

        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = g["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs_all = vecs_to_numpy(g[vec_col]).astype(np.float32)
        order = np.lexsort((ids, bkt))
        sid, sbk = ids[order], bkt[order]
        svecs = vecs_all[order]
        new = np.ones(len(sid), bool)
        new[1:] = sbk[1:] != sbk[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(sid)))
        out_a, out_b, out_c = [], [], []
        multi = counts > 1
        for s, c in zip(starts[multi], counts[multi]):
            vecs = svecs[s:s + c]
            bids = sid[s:s + c]
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1
            sims = (vecs / norms) @ (vecs / norms).T
            ia, ib = np.where(np.triu(sims >= threshold, k=1))
            a, b = bids[ia], bids[ib]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(sims[ia, ib].astype(np.float64))
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
        })

    parted = bucketed.map_batches(_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("__part").map_groups(_exact, batch_format="pyarrow")


# ------------------------------------------------- components / keep-list
def _union_find_arrays(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Exact union-find over an in-memory edge list → (doc_id,
    component) with ``component`` = MIN member id (deterministic
    canonical label). Runs inside shard group tasks (bounded edge
    slices) and on the driver for the tiny boundary-label graph."""
    if not len(a):
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        )
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    parent = np.arange(len(nodes), dtype=np.int64)
    ia, ib = inv[: len(a)], inv[len(a):]

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(ia, ib):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by MIN node id so the root IS the canonical label
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(nodes))])
    return pa.table(
        {"doc_id": pa.array(nodes, pa.int64()),
         "component": pa.array(nodes[roots], pa.int64())}
    )


def connected_components(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                         num_shards: int = 16):
    """Near-dup pair Dataset → ``(doc_id, component)`` pa.Table, where
    ``component`` is the MIN member id of each connected cluster
    (deterministic canonical label). Transitivity matters: a~b and b~c
    puts a,b,c in ONE cluster even when a~c was never emitted as a
    pair (LSH star truncation, chained near-dups).

    Scale design — shard-wise union-find + boundary merge, two phases:

    1. Edges partition by ``min(id_a, id_b) % num_shards`` (ONE narrow
       exchange of int64 pairs; text never moves). Each shard's group
       task runs an exact local union-find over its edge slice and
       emits ``(doc_id, label)`` rows, ``label`` = min member of the
       node's LOCAL component.
    2. A node whose edges landed in several shards carries one label
       per shard; those labels are, by transitivity, the same global
       component. The driver gathers the (node, label) table — O(docs
       that appear in any pair), i.e. OUTPUT-sized, never edge-sized —
       finds multi-labelled nodes with one numpy sort, and runs
       union-find on the boundary LABEL graph only (labels ≤ boundary
       nodes ≪ pairs). Global component = boundary-resolved label.

    Correctness of two phases (no iteration needed): within a shard
    connectivity is fully collapsed, so any global component is a
    union of per-shard components glued at shared nodes — exactly the
    edges of the label graph. Driver state: O(output) for the label
    table + O(boundary) for the merge; the EDGE table (which can
    exceed output size on skewed corpora) never concentrates anywhere.
    """
    import ray.data

    if isinstance(pairs_ds, pa.Table):
        pairs = pairs_ds
        a = pairs[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = pairs[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return _union_find_arrays(a, b)
    if not isinstance(pairs_ds, ray.data.Dataset):
        pairs = pa.table(pairs_ds)
        a = pairs[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = pairs[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return _union_find_arrays(a, b)

    def _part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__cc_shard": pa.array([], pa.int32()),
                             id_a: pa.array([], pa.int64()),
                             id_b: pa.array([], pa.int64())})
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (np.minimum(a, b) % num_shards).astype(np.int32)
        return pa.table({"__cc_shard": pa.array(shard),
                         id_a: pa.array(a), id_b: pa.array(b)})

    def _local_cc(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or id_a not in g.column_names:
            return _union_find_arrays(
                np.empty(0, np.int64), np.empty(0, np.int64))
        a = g[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = g[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return _union_find_arrays(a, b)

    labels = (
        pairs_ds.select_columns([id_a, id_b])
        .map_batches(_part, batch_format="pyarrow", batch_size=None)
        .groupby("__cc_shard")
        .map_groups(_local_cc, batch_format="pyarrow")
    )
    from scrape_ray.util import dataset_to_table

    lt = dataset_to_table(labels)  # (doc_id, label) — OUTPUT-sized
    if lt.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        )
    node = lt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = lt["component"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((lab, node))
    node, lab = node[order], lab[order]
    # boundary label edges: consecutive distinct labels of one node
    same_node = node[1:] == node[:-1]
    diff_lab = lab[1:] != lab[:-1]
    m = same_node & diff_lab
    if m.any():
        res = _union_find_arrays(lab[:-1][m], lab[1:][m])
        rk = res["doc_id"].to_numpy()  # sorted (np.unique output)
        rv = res["component"].to_numpy()
        pos = np.clip(np.searchsorted(rk, lab), 0, len(rk) - 1)
        hit = rk[pos] == lab
        lab = np.where(hit, rv[pos], lab)
    # one row per node (multi-shard nodes collapsed; labels now agree)
    keep = np.concatenate([[True], node[1:] != node[:-1]])
    return pa.table(
        {"doc_id": pa.array(node[keep], pa.int64()),
         "component": pa.array(lab[keep], pa.int64())}
    )


def dedup_near_keep(ds, pairs, id_col: str = "doc_id"):
    """Keep-list filter: drop every doc that belongs to a near-dup
    cluster but is not its canonical (min-id) member. The dropped-id
    set is derived from ``connected_components`` (small), broadcast
    once via ``ray.put``, and applied per batch with a vectorized
    ``pc.is_in`` — streaming over the corpus, no shuffle."""
    import ray

    comp = connected_components(pairs) if not isinstance(pairs, pa.Table) or \
        "component" not in getattr(pairs, "column_names", []) else pairs
    mask = pc.not_equal(comp["doc_id"], comp["component"])
    dropped = comp.filter(mask)["doc_id"].combine_chunks()
    dropped_ref = ray.put(dropped)

    def _keep(t: pa.Table) -> pa.Table:
        drop = ray.get(dropped_ref)
        return t.filter(
            pc.invert(pc.is_in(t[id_col], value_set=drop))
        )

    return ds.map_batches(_keep, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------ deterministic split
def hash_split(ds, key_col: str, holdout_permille: int = 100,
               out_col: str = "split", batch_size: int | None = None):
    """Deterministic train/holdout assignment: FNV-1a-64 of the key's
    utf8 bytes mod 1000 < ``holdout_permille`` ⇒ ``holdout``, else
    ``train``. Pure per-batch map — no shuffle, no sampling state, and
    the assignment is reproducible across runs, nodes and engines (the
    standard leakage-safe split for training corpora: a document's
    split never depends on what else is in the batch). Keys should be
    the DEDUP-stable identity (canonical url, content hash) so
    near-identical rows land in one split."""
    from scrape_ray.functions.keys import fnv1a64

    def _f(t: pa.Table) -> pa.Table:
        vals = t[key_col].to_pylist()
        hv = fnv1a64([("" if v is None else str(v)).encode("utf-8") for v in vals])
        hold = (hv % np.uint64(1000)) < np.uint64(holdout_permille)
        split = np.where(hold, "holdout", "train")
        return t.append_column(out_col, pa.array(split, pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)
