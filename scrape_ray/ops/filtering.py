"""Corpus-hygiene operators: PII redaction and benchmark
decontamination — the cleaning passes a training-data pipeline runs
after extraction and before packing.

Both are Ray-Data-first: redaction is a stateless vectorized
``map_batches`` (Arrow's RE2 kernels, same regex engine DuckDB uses,
so oracles match byte-for-byte); decontamination broadcasts the SMALL
side (the benchmark's shingle hashes, one ``ray.put``) and probes it
per batch with ``np.isin`` — a broadcast semi-join, never a shuffle
of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible patterns (Arrow and DuckDB both use RE2). Order of
# application is part of the contract: email first, then IPv4, then
# phone — a phone pattern must not eat an already-redacted token.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d-]{7,}\d"


def redact_pii(ds, text_col: str = "text", out_col: str = "clean_text",
               batch_size: int | None = None):
    """Replace emails / IPv4s / phone-shaped tokens with fixed
    placeholder tags and count each kind (``n_emails``, ``n_ips``,
    ``n_phones``). Pure vectorized map — ``pc.replace_substring_regex``
    and ``pc.count_substring_regex`` run RE2 over the whole column
    with no Python per row."""

    def _f(t: pa.Table) -> pa.Table:
        col = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
        n_email = pc.count_substring_regex(col, EMAIL_RE)
        s = pc.replace_substring_regex(col, EMAIL_RE, "<EMAIL>")
        n_ip = pc.count_substring_regex(s, IPV4_RE)
        s = pc.replace_substring_regex(s, IPV4_RE, "<IP>")
        n_phone = pc.count_substring_regex(s, PHONE_RE)
        s = pc.replace_substring_regex(s, PHONE_RE, "<PHONE>")
        t = t.append_column(out_col, s)
        t = t.append_column("n_emails", pc.cast(n_email, pa.int64()))
        t = t.append_column("n_ips", pc.cast(n_ip, pa.int64()))
        return t.append_column("n_phones", pc.cast(n_phone, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def boilerplate_strip(ds, host_col: str = "domain", text_col: str = "text",
                      min_frac: float = 0.5, num_parts: int = 64):
    """Cross-document boilerplate removal: a line that appears in
    > ``min_frac`` of a host's documents is nav/footer chrome, not
    content — drop it from every document of that host (the
    RefinedWeb/C4 site-level cleaning rule; presence per document,
    not occurrence count, so a line repeated inside ONE doc doesn't
    qualify).

    Ray design: ONE coarse hash exchange on the host column
    (``groupby(host_hash % num_parts)``), then line frequencies AND
    the filter both run inside the group task — the line-stats never
    leave the worker, there is no second join. Docs of one host
    co-locate by construction; ``num_parts`` bounds UDF invocations.
    Scale note: a group task holds its partition's documents in
    memory, so size ``num_parts`` to corpus_bytes / worker_heap (the
    host is the true partitioning unit — any num_parts that keeps one
    partition's hosts in heap is semantically equivalent).

    Output replaces ``text_col`` with the stripped text and adds
    ``n_boiler_lines`` (lines removed per doc)."""

    def _part(t: pa.Table) -> pa.Table:
        from scrape_ray.functions.keys import fnv1a64

        h = fnv1a64([(v or "").encode() for v in t[host_col].to_pylist()])
        return t.append_column(
            "__part", pa.array((h % num_parts).astype(np.int32))
        )

    def _strip(g: pa.Table) -> pa.Table:
        """Fully vectorized, Arrow-native: the group's text column is
        split into a line LIST column in one kernel; line identity
        comes from ``dictionary_encode`` (C++ hash table, byte-exact
        strings — no collision risk a 64-bit line hash would carry);
        presence counts and the boiler filter run over flat (doc,
        host, line-code) integer arrays; stripped text is rebuilt with
        one ``pc.binary_join`` over a reassembled list array. No
        ``to_dict("records")``, no per-doc Python loop, and the text
        bytes never pass through Python objects — this group task is
        the whole per-partition cost at 100 TB. All hosts of the
        partition are processed in ONE pass (votes key on (host,
        line), so hosts never mix)."""
        n = g.num_rows
        if n == 0:
            g = g.append_column("n_boiler_lines", pa.array([], pa.int64()))
            return g
        # large_string end-to-end: a hot host partition can exceed 2 GB of
        # text bytes / 2^31 lines, which 32-bit string/list offsets can't
        # index (ArrowInvalid) — so every intermediate here is 64-bit.
        texts = pc.coalesce(
            g[text_col].cast(pa.large_string()).combine_chunks(),
            pa.scalar("", pa.large_string()),
        )
        lines = pc.split_pattern(texts, "\n")  # large_list<large_string>
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines).to_numpy()  # doc idx per line
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        n_codes = len(enc.dictionary)
        hosts = pc.coalesce(
            g[host_col].combine_chunks(), pa.scalar("", pa.string())
        )
        hid = hosts.dictionary_encode().indices.to_numpy().astype(np.int64)
        n_docs_per_host = np.bincount(hid)
        # presence: each doc votes once per distinct line -> unique
        # (doc, code) pairs, then count DOCS per (host, code)
        dc = np.unique(parent * n_codes + codes) if n_codes else np.zeros(0, np.int64)
        d_of = dc // n_codes if n_codes else dc
        hc = hid[d_of] * n_codes + (dc % n_codes) if n_codes else dc
        hc_uniq, hc_counts = np.unique(hc, return_counts=True)
        cut = min_frac * n_docs_per_host  # per host
        boiler = hc_uniq[hc_counts > cut[(hc_uniq // n_codes)]] if n_codes else hc_uniq
        # per-occurrence keep mask via sorted-membership probe
        occ_key = hid[parent] * n_codes + codes if n_codes else codes
        pos = np.clip(np.searchsorted(boiler, occ_key), 0, max(len(boiler) - 1, 0))
        drop = (boiler[pos] == occ_key) if len(boiler) else np.zeros(len(occ_key), bool)
        keep = ~drop
        kept_per_doc = np.bincount(parent[keep], minlength=n)
        total_per_doc = np.bincount(parent, minlength=n)
        offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int64)
        kept_vals = flat.take(pa.array(np.nonzero(keep)[0], pa.int64()))
        la = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept_vals)
        joined = pc.binary_join(la, pa.scalar("\n", pa.large_string()))
        g = g.set_column(g.column_names.index(text_col), text_col, joined)
        return g.append_column(
            "n_boiler_lines",
            pa.array((total_per_doc - kept_per_doc).astype(np.int64), pa.int64()),
        )

    parted = ds.map_batches(_part, batch_format="pyarrow", batch_size=None)
    out = parted.groupby("__part").map_groups(_strip, batch_format="pyarrow")
    return out.drop_columns(["__part"])


def benchmark_shingle_hashes(bench_ds, text_col: str = "text",
                             ngram: int = 5) -> np.ndarray:
    """Distinct FNV-1a-64 hashes of the benchmark's word n-grams,
    collected to the driver for broadcast. The benchmark is the SMALL
    side by definition (eval sets are thousands of documents, not
    billions); the per-task partials are already unique'd so the
    driver merge is bounded by distinct-shingle count."""
    from scrape_ray.ops.dedup import _shingle_hashes_flat

    def _h(t: pa.Table) -> pa.Table:
        hv, _ = _shingle_hashes_flat(t[text_col].to_pylist(), ngram)
        return pa.table({"h": pa.array(np.unique(hv), pa.uint64())})

    from scrape_ray.util import collect_nonempty

    parts = bench_ds.map_batches(_h, batch_format="pyarrow", batch_size=None)
    # collect_nonempty, NOT raw to_arrow_refs: zero-row blocks skip the
    # UDF and keep the input schema (no "h" column) — fires only at
    # high parallelism, when the read splits finely enough that a
    # filter empties some blocks (round-2 driver failure at 32 CPUs).
    arrays = [t["h"].to_numpy(zero_copy_only=False)
              for t in collect_nonempty(parts)]
    if not arrays:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(arrays))


def decontaminate(ds, bench_hashes_ref, text_col: str = "text",
                  ngram: int = 5, batch_size: int | None = None):
    """Mark documents sharing ANY word n-gram with the benchmark
    (``contaminated`` bool + ``n_hits`` overlap count) — the standard
    eval-decontamination pass (n-gram overlap). ``bench_hashes_ref``
    is a ``ray.put`` handle to the sorted benchmark hash array: shipped
    once per worker, probed per batch with vectorized ``np.isin`` over
    the batch's flat shingle-hash array. No shuffle; the corpus
    streams."""
    import ray

    from scrape_ray.ops.dedup import _shingle_hashes_flat

    def _f(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_hashes_ref)  # zero-copy from object store
        hv, counts = _shingle_hashes_flat(t[text_col].to_pylist(), ngram)
        hits = np.isin(hv, bench)
        # per-doc hit counts via segment sums over the flat array
        ends = np.cumsum(counts)
        starts = ends - counts
        csum = np.concatenate([[0], np.cumsum(hits)])
        n_hits = csum[ends] - csum[starts]
        t = t.append_column(
            "contaminated", pa.array(n_hits > 0, pa.bool_())
        )
        return t.append_column("n_hits", pa.array(n_hits, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)
