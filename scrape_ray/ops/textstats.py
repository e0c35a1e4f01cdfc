"""Text-analysis operators for training-data pipelines: token
counting, quality scoring, language identification, document
fingerprinting. All run as stateless ``map_batches`` over Arrow
batches; scoring rules are closed-form so DuckDB oracles can verify
them (see __ray_entry__.oracle_sql).

These have no analog in the reference (it stops at extraction) — they
are the engine's training-data extension surface, applied downstream
of ``content_text``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbol
# (the GPT-2 pre-tokenizer's coarse shape, public knowledge).
TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
TOKEN_RE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_PUNCT_RE = re.compile(r"[^\w\s]")

# Closed vocabulary of stopword markers per language — deterministic
# voting; ties break by list order (en first).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour"),
    "es": ("el", "los", "las", "es", "una", "en", "que", "por", "para"),
    "it": ("il", "gli", "che", "di", "non", "una", "per", "sono", "con"),
}
EN_STOPWORDS = LANG_MARKERS["en"]


def token_stats(ds, text_col: str = "text", batch_size: int = 4096):
    """Adds ``n_ws_tokens`` (whitespace tokens), ``n_bpe_tokens``
    (regex pre-tokenizer runs) and ``n_chars`` columns. Fully
    vectorized: whitespace counts come from the flat token array
    (:func:`_ws_tokens_flat` + bincount), BPE-run counts from one RE2
    ``count_substring_regex`` kernel — no Python per row."""

    def _f(t: pa.Table) -> pa.Table:
        texts = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
        _, parent = _ws_tokens_flat(t, text_col)
        ws = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        bpe = pc.count_substring_regex(texts, TOKEN_RE_SQL).cast(pa.int64())
        t = t.append_column("n_ws_tokens", pa.array(ws, pa.int64()))
        t = t.append_column("n_bpe_tokens", bpe)
        return t.append_column(
            "n_chars", pc.coalesce(pc.utf8_length(t[text_col]), pa.scalar(0, pa.int32())).cast(pa.int64())
        )

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def quality_stats(ds, text_col: str = "text", batch_size: int = 4096):
    """Quality-signal columns (all integer counts ⇒ bit-exact oracle):

    - ``n_ws_tokens``, ``n_chars``
    - ``n_punct``: punctuation chars
    - ``n_stop_en``: English stopword occurrences (whitespace tokens,
      casefolded, exact match)
    - ``mean_word_len_x100``: (n_chars_in_words*100) // n_ws_tokens

    Vectorized on the flat token array: stopword membership is one
    ``pc.is_in`` + bincount, word-char sums a weighted bincount,
    punctuation one RE2 count kernel — zero Python per document."""
    stop_arr = pa.array(list(EN_STOPWORDS), pa.string())

    def _f(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        texts = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
        flat, parent = _ws_tokens_flat(t, text_col)
        n_punct = pc.count_substring_regex(texts, r"[^\w\s]").cast(pa.int64())
        low = pc.utf8_lower(flat)
        stop_mask = pc.is_in(low, value_set=stop_arr).to_numpy(
            zero_copy_only=False)
        n_stop = np.bincount(parent[stop_mask], minlength=nrows).astype(np.int64)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        # float64 weighted bincount is exact below 2^53 total chars/doc
        wchars = np.bincount(
            parent, weights=tok_len, minlength=nrows).astype(np.int64)
        nw = np.bincount(parent, minlength=nrows).astype(np.int64)
        mwl = np.where(nw > 0, (wchars * 100) // np.maximum(nw, 1), 0)
        t = t.append_column("n_punct", n_punct)
        t = t.append_column("n_stop_en", pa.array(n_stop, pa.int64()))
        return t.append_column("mean_word_len_x100", pa.array(mwl, pa.int64()))

    return token_stats(ds, text_col, batch_size).map_batches(
        _f, batch_format="pyarrow", batch_size=batch_size
    )


def langid_vote(text: str) -> str:
    """Stopword-marker voting: language with the most marker hits
    (whitespace tokens, casefolded); ties → first in LANG_MARKERS
    order; zero hits → 'und'."""
    words = [w.lower() for w in (text or "").split()]
    if not words:
        return "und"
    best_lang, best = "und", 0
    for lang, markers in LANG_MARKERS.items():
        m = frozenset(markers)
        c = sum(1 for w in words if w in m)
        if c > best:
            best_lang, best = lang, c
    return best_lang


def add_langid(ds, text_col: str = "text", out_col: str = "lang_pred",
               batch_size: int = 4096):
    """Dataset form of :func:`langid_vote`, vectorized: per language
    one ``pc.is_in`` membership over the batch's flat lowercased
    tokens + bincount; the argmax over the (lang, doc) count matrix
    reproduces the scalar first-max tie-break."""
    langs = list(LANG_MARKERS)
    marker_arrays = [
        pa.array(list(LANG_MARKERS[lg]), pa.string()) for lg in langs
    ]
    choices = pa.array(langs + ["und"], pa.string())

    def _f(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        flat, parent = _ws_tokens_flat(t, text_col)
        low = pc.utf8_lower(flat)
        counts = np.zeros((len(langs), nrows), np.int64)
        for i, markers in enumerate(marker_arrays):
            m = pc.is_in(low, value_set=markers).to_numpy(
                zero_copy_only=False)
            counts[i] = np.bincount(parent[m], minlength=nrows)
        best = counts.argmax(axis=0)  # first max wins, like the scalar
        idx = np.where(counts.max(axis=0) == 0, len(langs), best)
        return t.append_column(
            out_col, choices.take(pa.array(idx, pa.int64())))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


# ------------------------------------------------- intra-doc repetition
def dedup_lines(ds, text_col: str = "text", batch_size: int = 4096):
    """C4/Gopher-style intra-document repetition filter (the standard
    corpus-cleaning pass BEFORE cross-document dedup). Adds:

    - ``clean_text``: duplicate lines removed — first occurrence kept,
      original order preserved (C4's dedup-by-line rule, exact match)
    - ``n_lines`` / ``n_dup_lines``: line count and removed count
    - ``top_word_frac_x1000``: occurrences of the most frequent
      whitespace token × 1000 // n_words (Gopher's top-word repetition
      signal; 0 for empty text). Integer so the oracle is bit-exact.

    Pure per-batch map, no shuffle — and fully vectorized: line
    identity via ``dictionary_encode`` over the batch's flat line
    array, first-occurrence keep via one ``np.unique`` over (doc,
    line-code) pairs, top-word counts via a second unique over (doc,
    token-code) pairs + ``maximum.reduceat``. No Python per document."""

    def _f(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        if nrows == 0:
            for c, ty in (("clean_text", pa.string()),
                          ("n_lines", pa.int64()),
                          ("n_dup_lines", pa.int64()),
                          ("top_word_frac_x1000", pa.int64())):
                t = t.append_column(c, pa.array([], ty))
            return t
        texts = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lines = pc.split_pattern(texts, "\n")  # "" -> [""], like str.split("\n")
        flat = pc.list_flatten(lines)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        n_lines = np.bincount(parent, minlength=nrows).astype(np.int64)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_codes = max(len(enc.dictionary), 1)
        # first occurrence of each (doc, line) pair, original order kept
        _, first_idx = np.unique(parent * n_codes + codes, return_index=True)
        keep = np.zeros(len(parent), bool)
        keep[first_idx] = True
        kept_per_doc = np.bincount(parent[keep], minlength=nrows).astype(np.int64)
        kept_vals = flat.take(pa.array(np.flatnonzero(keep), pa.int64()))
        offs = pa.array(
            np.concatenate(([0], np.cumsum(kept_per_doc))), pa.int64())
        clean = pc.binary_join(
            pa.LargeListArray.from_arrays(offs, kept_vals), "\n")
        # Gopher top-word signal: max occurrence count of any token
        tflat, tparent = _ws_tokens_flat(t, text_col)
        n_words = np.bincount(tparent, minlength=nrows).astype(np.int64)
        topfrac = np.zeros(nrows, np.int64)
        if len(tflat):
            tenc = tflat.dictionary_encode()
            tcodes = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            tv = max(len(tenc.dictionary), 1)
            pair, cnt = np.unique(
                tparent.astype(np.int64) * tv + tcodes, return_counts=True)
            d_of = pair // tv  # sorted ascending (pair is doc-major)
            starts = np.flatnonzero(
                np.concatenate(([True], d_of[1:] != d_of[:-1])))
            mx = np.maximum.reduceat(cnt, starts)
            topfrac[d_of[starts]] = mx * 1000 // n_words[d_of[starts]]
        t = t.append_column("clean_text", clean.cast(pa.string()))
        t = t.append_column("n_lines", pa.array(n_lines, pa.int64()))
        t = t.append_column(
            "n_dup_lines", pa.array(n_lines - kept_per_doc, pa.int64()))
        return t.append_column(
            "top_word_frac_x1000", pa.array(topfrac, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


# ----------------------------------------------------------- fingerprint
def winnow_fingerprint(text: str, k: int = 5, window: int = 4) -> int:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    rolling FNV hash over k-grams of words, min-sample every window,
    XOR-fold the selected mins to one u64. Equal texts ⇒ equal
    fingerprints; robust id for dedup bucketing."""
    from scrape_ray.functions.keys import fnv1a64

    words = (text or "").split()
    if not words:
        return 0
    grams = [" ".join(words[i : i + k]) for i in range(max(1, len(words) - k + 1))]
    hv = fnv1a64([g.encode("utf-8") for g in grams])
    if len(hv) <= window:
        mins = hv
    else:
        # min of each sliding window (vectorized via stride trick)
        sw = np.lib.stride_tricks.sliding_window_view(hv, window)
        mins = sw.min(axis=1)
        mins = np.unique(mins)
    out = 0
    for m in mins:
        out ^= (int(m) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    return out


def _winnow_batch(flat: pa.Array, parent: np.ndarray, nrows: int,
                  k: int, window: int) -> np.ndarray:
    """Whole-batch winnowing (same semantics as the scalar
    :func:`winnow_fingerprint`, verified row-for-row in tests) with no
    Python per document or per gram: ragged-arange ``take`` +
    ``binary_join`` builds every doc's k-gram strings at once, ONE
    zero-copy FNV sweep hashes them all, a single global sliding-window
    min (validity-masked at doc boundaries) picks the winnowed minima,
    and a per-doc ``bitwise_xor.reduceat`` folds them."""
    GOLD = np.uint64(0x9E3779B97F4A7C15)
    out = np.zeros(nrows, np.uint64)
    n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)
    has = n_tok > 0
    if not has.any():
        return out
    # docs with n_w tokens form max(1, n_w - k + 1) grams; short docs
    # (< k tokens) form ONE truncated gram — the scalar slice semantics
    n_g = np.where(has, np.maximum(1, n_tok - k + 1), 0)
    total_g = int(n_g.sum())
    doc_of_gram = np.repeat(np.arange(nrows, dtype=np.int64), n_g)
    g_excl = np.concatenate(([0], np.cumsum(n_g)))[:-1]
    gram_id = np.arange(total_g, dtype=np.int64) - np.repeat(g_excl, n_g)
    glen = np.minimum(k, n_tok[doc_of_gram] - gram_id)
    tok_off = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
    flat_start = tok_off[doc_of_gram] + gram_id
    total_tok = int(glen.sum())
    lens_excl = np.concatenate(([0], np.cumsum(glen)))[:-1]
    idx = np.repeat(flat_start - lens_excl, glen) + np.arange(
        total_tok, dtype=np.int64)
    taken = flat.take(pa.array(idx, pa.int64()))
    if isinstance(taken, pa.ChunkedArray):
        taken = taken.combine_chunks()
    offs = pa.array(np.concatenate(([0], np.cumsum(glen))), pa.int64())
    grams = pc.binary_join(pa.LargeListArray.from_arrays(offs, taken), " ")
    from scrape_ray.functions.keys import fnv1a64_arrow

    hv = fnv1a64_arrow(grams)

    # short docs (n_g <= window): every gram is a min, duplicates kept
    # (they XOR out pairwise, matching the scalar no-unique branch)
    short_doc = n_g <= window
    short_g = short_doc[doc_of_gram]
    sel_docs = [doc_of_gram[short_g]]
    sel_vals = [hv[short_g]]
    if total_g >= window:
        sw = np.lib.stride_tricks.sliding_window_view(hv, window).min(axis=1)
        vstart = doc_of_gram[: total_g - window + 1]
        vend = doc_of_gram[window - 1:]
        valid = (vstart == vend) & ~short_doc[vstart]
        md, mv = vstart[valid], sw[valid]
        # per-doc unique of the window minima (the scalar np.unique)
        order = np.lexsort((mv, md))
        md, mv = md[order], mv[order]
        keep = np.ones(len(md), bool)
        keep[1:] = (md[1:] != md[:-1]) | (mv[1:] != mv[:-1])
        sel_docs.append(md[keep])
        sel_vals.append(mv[keep])
    docs_all = np.concatenate(sel_docs)
    vals_all = np.concatenate(sel_vals)
    with np.errstate(over="ignore"):
        z = vals_all * GOLD
    order = np.argsort(docs_all, kind="stable")
    docs_s, z_s = docs_all[order], z[order]
    if len(docs_s):
        starts = np.flatnonzero(
            np.concatenate(([True], docs_s[1:] != docs_s[:-1])))
        out[docs_s[starts]] = np.bitwise_xor.reduceat(z_s, starts)
    return out


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint",
                    k: int = 5, window: int = 4, batch_size: int = 4096):
    def _f(t: pa.Table) -> pa.Table:
        flat, parent = _ws_tokens_flat(t, text_col)
        fp = _winnow_batch(flat, parent, t.num_rows, k, window)
        return t.append_column(out_col, pa.array(fp, pa.uint64()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def _ws_tokens_flat(t: pa.Table, text_col: str):
    """Batch texts → (flat token array, per-token parent row index),
    matching Python ``str.split()`` (no empty tokens). Vectorized:
    Arrow whitespace split, edge-empty filter, no Python per row."""
    texts = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
    split = pc.utf8_split_whitespace(texts)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(split)
    keep = pc.not_equal(flat, pa.scalar(""))
    flat = flat.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, parent[keep.to_numpy(zero_copy_only=False)]


def term_frequencies(ds, text_col: str = "text", batch_size: int = 4096,
                     n: int = 1):
    """Global (token, tf, df) table: ``tf`` = total occurrences across
    the corpus, ``df`` = number of distinct documents containing the
    token — the statistics behind vocabulary building, IDF weighting
    and stopword discovery. With ``n > 1`` the unit is the
    space-joined word n-gram (bigram/trigram LM count tables).

    Scale shape: the classic pre-aggregated wide op. Each task
    dictionary-encodes its batch's tokens and emits PARTIAL (token,
    tf, df) counts — one row per distinct token per batch, not per
    occurrence — so the single ``groupby("token")`` exchange moves
    the batch-distinct vocabulary (Zipf-bounded), never the token
    stream. No driver state."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def _partial(t: pa.Table) -> pa.Table:
        flat, parent = _ws_tokens_flat(t, text_col)
        if n > 1 and len(flat):
            # n-grams: join n shifted views; valid where all n tokens
            # share the parent doc (vectorized, no Python per gram)
            m = len(flat) - (n - 1)
            if m <= 0:
                flat = flat.slice(0, 0)
                parent = parent[:0]
            else:
                views = [flat.slice(i, m) for i in range(n)]
                grams = views[0]
                for v in views[1:]:
                    grams = pc.binary_join_element_wise(grams, v, " ")
                valid = parent[: m] == parent[n - 1:]
                flat = grams.filter(pa.array(valid))
                if isinstance(flat, pa.ChunkedArray):
                    flat = flat.combine_chunks()
                parent = parent[:m][valid]
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_vocab = len(enc.dictionary)
        tf = np.bincount(codes, minlength=n_vocab)
        # df partial: distinct (doc, token) pairs in this batch
        pair = np.unique(parent.astype(np.int64) * np.int64(n_vocab) + codes)
        df = np.bincount((pair % n_vocab).astype(np.int64), minlength=n_vocab)
        return pa.table({"token": enc.dictionary,
                         "tf": pa.array(tf, pa.int64()),
                         "df": pa.array(df, pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=batch_size)
    agg = parts.groupby("token").sum(["tf", "df"])
    return agg.rename_columns({"sum(tf)": "tf", "sum(df)": "df"})


def top_vocabulary(ds, text_col: str = "text", k: int = 1000,
                   n: int = 1) -> pa.Table:
    """The corpus's top-``k`` tokens by total frequency (ties broken
    by token text, so the vocabulary is deterministic across layouts
    and engines). Returns a DRIVER-side Arrow table — k rows, the
    broadcastable side of :func:`vocab_coverage`. The sort runs on the
    already-aggregated term table (distinct tokens, Zipf-small), not
    the corpus."""
    from scrape_ray.util import dataset_to_table

    tdf = term_frequencies(ds, text_col, n=n)
    t = dataset_to_table(
        tdf.sort(["tf", "token"], descending=[True, False]).limit(k)
    )
    return t.select(["token", "tf", "df"])


def tfidf_topk(ds, text_col: str = "text", id_col: str = "doc_id",
               k: int = 3, scale: int = 1_000_000,
               batch_size: int = 4096):
    """Per-document top-``k`` TF-IDF terms, integer-scaled so the
    result is engine-exact (no float aggregate; the DuckDB oracle
    reproduces every value bit-for-bit):

    ``score_ppm = (tf * scale * N_docs) // (n_tok_doc * df)``

    — tf/n_tok normalized term frequency × the reciprocal document
    frequency N/df (the log-free IDF variant), floor-divided in int64.
    Output: one row per (doc, top-term): ``(id, token, score_ppm,
    rank)`` with rank 1..k by (score desc, token asc); zero-token docs
    emit nothing.

    Scale shape: per-(doc, token) tf, n_tok and the top-k selection
    all happen INSIDE the batch map (a document's tokens never leave
    their batch) — no per-doc shuffle. The only exchange is
    :func:`term_frequencies`' pre-aggregated vocabulary groupby; the
    (token, df) table is then driver-collected and broadcast once via
    ``ray.put`` (Zipf-bounded — for an open web-scale vocabulary swap
    the broadcast for a hash join on token). int64 bound: tf * scale *
    N_docs must stay < 2^63 — lower ``scale`` for trillion-doc corpora.
    """
    import ray

    from scrape_ray.util import dataset_to_table

    n_docs = ds.count()
    dft = dataset_to_table(
        term_frequencies(ds, text_col).select_columns(["token", "df"])
    )
    df_ref = ray.put(dft)

    def _empty(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col].slice(0, 0),
            "token": pa.array([], pa.string()),
            "score_ppm": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        })

    def _f(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        flat, parent = _ws_tokens_flat(t, text_col)
        if len(flat) == 0:
            return _empty(t)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(enc.dictionary)
        n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)
        pair, tf = np.unique(
            parent.astype(np.int64) * v + codes, return_counts=True)
        p_doc, p_code = pair // v, pair % v
        dft_local = ray.get(df_ref)
        pos = pc.index_in(enc.dictionary, value_set=dft_local["token"])
        df_per_code = dft_local["df"].take(pos).to_numpy(
            zero_copy_only=False).astype(np.int64)
        score = (tf.astype(np.int64) * scale * n_docs) // (
            n_tok[p_doc] * df_per_code[p_code])
        # deterministic order: (doc, score desc, token asc) — token
        # order via the sort rank of the batch dictionary
        dict_order = pc.sort_indices(enc.dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_rank = np.empty(v, np.int64)
        tok_rank[dict_order] = np.arange(v)
        order = np.lexsort((tok_rank[p_code], -score, p_doc))
        d_s = p_doc[order]
        firsts = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        start_idx = np.flatnonzero(firsts)
        seg_len = np.diff(np.concatenate((start_idx, [len(d_s)])))
        within = np.arange(len(d_s)) - np.repeat(start_idx, seg_len)
        keep = within < k
        sel = order[keep]
        return pa.table({
            id_col: t[id_col].take(pa.array(p_doc[sel], pa.int64())),
            "token": enc.dictionary.take(pa.array(p_code[sel], pa.int64())),
            "score_ppm": pa.array(score[sel], pa.int64()),
            "rank": pa.array(within[keep] + 1, pa.int64()),
        })

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def vocab_coverage(ds, vocab: pa.Table | list[str],
                   text_col: str = "text", batch_size: int = 4096):
    """Vocabulary-coverage quality signal: per document, total token
    count and how many tokens fall OUTSIDE the given vocabulary
    (``n_oov``) — the standard LM-pipeline proxy for junk/ non-target-
    language/ boilerplate-encoded text (high OOV rate ⇒ drop).

    The vocabulary (small: top-k tokens) is broadcast once via
    ``ray.put``; each batch counts membership with a vectorized
    ``pc.is_in`` + bincount. Streaming map — no shuffle."""
    import ray

    words = vocab["token"] if isinstance(vocab, pa.Table) else pa.array(
        list(vocab), pa.string())
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    vocab_ref = ray.put(words)

    def _f(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        flat, parent = _ws_tokens_flat(t, text_col)
        n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)
        if len(flat):
            oov_mask = pc.invert(
                pc.is_in(flat, value_set=ray.get(vocab_ref))
            ).to_numpy(zero_copy_only=False)
            n_oov = np.bincount(
                parent[oov_mask], minlength=nrows).astype(np.int64)
        else:
            n_oov = np.zeros(nrows, np.int64)
        t = t.append_column("n_tokens", pa.array(n_tok, pa.int64()))
        return t.append_column("n_oov", pa.array(n_oov, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                   df_min: int = 1, batch_size: int = 4096):
    """Inverted index build: one row per token with its document
    frequency and the full posting list (doc ids ascending, comma-
    joined) — the search-engine-side counterpart of the reference's
    extract pipeline (crawl → extract → index; reference stores pages
    by URL key, `internal/storage/sqlite/store.go`, and an index over
    the extracted text is the canonical downstream consumer).

    Scale shape: stage 1 emits per-batch DISTINCT (token, doc) pairs
    (vectorized lexsort dedup on dictionary codes — one row per
    batch-distinct pair, never per occurrence); the single
    ``groupby("token")`` exchange then moves the pair table, which is
    sum-of-per-doc-vocabularies sized (Zipf-bounded), not the token
    stream. Posting-list assembly is per-group: sort + one join per
    token, vocabulary-bounded work. Assumes ``id_col`` is unique per
    input row (a doc appearing twice would double-post).

    At 100 TB the posting list of a stopword-grade token is itself
    huge — real index builds shard postings by doc-id range. Keep
    ``df_min``/a stopword cut upstream, or partition the doc space
    and build one index per partition dir (same pattern as
    ``similarity.build_ivf_index``)."""

    empty = pa.table({"token": pa.array([], pa.string()),
                      id_col: pa.array([], pa.int64())})

    def _pairs(t: pa.Table) -> pa.Table:
        flat, parent = _ws_tokens_flat(t, text_col)
        if len(flat) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = ids[parent]
        # distinct (token, doc) within the batch: lexsort + neighbor diff
        order = np.lexsort((doc, codes))
        sc, sd = codes[order], doc[order]
        first = np.ones(len(sc), dtype=bool)
        first[1:] = (sc[1:] != sc[:-1]) | (sd[1:] != sd[:-1])
        return pa.table({
            "token": enc.dictionary.take(pa.array(sc[first])),
            id_col: pa.array(sd[first], pa.int64()),
        })

    def _assemble(g: pa.Table) -> pa.Table:
        ids = np.sort(g[id_col].to_numpy(zero_copy_only=False))
        # one join per token group — vocabulary-bounded, not corpus-bounded
        posting = ",".join(map(str, ids.tolist()))
        return pa.table({
            "token": g["token"].slice(0, 1),
            "df": pa.array([len(ids)], pa.int64()),
            "posting": pa.array([posting], pa.string()),
        })

    pairs = ds.map_batches(_pairs, batch_format="pyarrow",
                           batch_size=batch_size)
    idx = pairs.groupby("token").map_groups(_assemble, batch_format="pyarrow")
    if df_min > 1:
        idx = idx.filter(expr=f"df >= {df_min}")
    return idx


def _build_dup_gram_set(ds, text_col: str, n: int, batch_size: int,
                        broadcast_max_hashes: int = 16_000_000,
                        dup_path: str = "auto"):
    """Shared count pass of the ExactSubstr pair
    (:func:`dup_span_stats` / :func:`remove_dup_spans`): per-batch
    polynomial-mixed FNV word-``n``-gram hashes pre-aggregated to
    (hash, count) partials, merged through the manual hash-bucketed
    exchange into P sorted shards of the duplicated-hash set (global
    count >= 2).

    Returns ``(ctx, gram_hashes, tok_grams)``:

    - ``gram_hashes(t) -> (int64 hashes at VALID starts, parents)``
      and ``tok_grams(t) -> (flat, parent, h, valid)`` — the single
      source of the FNV+polynomial gram hash for every pass;
    - ``ctx`` selects the probe path (the broadcast/shuffle
      auto-switch of VERDICT r4 "Next #4", mirroring
      ``state/cache.py``'s fetch-path switch):

      * ``{"mode": "broadcast", "dup_ref": ...}`` when the dup set
        fits ``broadcast_max_hashes`` (int64 hashes; 16 M ≈ 128 MB):
        one sorted array, ``ray.put`` once, probed per batch — the
        clean-corpus fast path (duplicated n-grams are the Zipf
        head);
      * ``{"mode": "shuffle", "block_refs": [...], "pos_refs":
        [...]}`` when it doesn't (raw-Common-Crawl boilerplate can
        push billions of duplicated 8-grams): the dup set NEVER
        reaches the driver or any single worker. Each input block
        emits its (gram-hash, flat-start-position) pairs sliced to
        the P dup shards (``num_returns=P``, same ``% P`` bucketing
        as the count merge, so probe rows meet their shard without
        re-hashing); each shard task runs the sorted-membership
        probe and routes hit POSITIONS back per block
        (``num_returns=B``); a per-block gather sorts them. Callers
        then score/clean each block from its resolved dup-start
        positions — two exchanges total, O(shard) memory per task.

    ``dup_path`` forces ``"broadcast"``/``"shuffle"`` (tests; default
    ``"auto"`` sizes the merged shards first)."""
    import ray

    from scrape_ray.functions.keys import fnv1a64_arrow

    if n < 1:
        raise ValueError("n must be >= 1")
    if dup_path not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"dup_path must be auto|broadcast|shuffle,"
                         f" got {dup_path!r}")
    MIX = np.uint64(0x100000001B3)

    def _tok_grams(t: pa.Table):
        """(flat tokens, token parent rows, int64 gram hash per START
        position, validity mask) — start ``j`` is valid iff its n
        tokens share a doc. The SINGLE source of the FNV+polynomial
        gram hash for the count, score and removal passes."""
        flat, parent = _ws_tokens_flat(t, text_col)
        m = len(flat) - (n - 1)
        if m <= 0:
            return flat, parent, np.zeros(0, np.int64), np.zeros(0, bool)
        th = fnv1a64_arrow(flat)
        with np.errstate(over="ignore"):
            h = th[:m].copy()
            for i in range(1, n):
                h = h * MIX ^ th[i:i + m]
        valid = parent[:m] == parent[n - 1:]
        # int64 bit-view: Ray groupby keys round-trip through Python
        # ints, and uint64 values above 2^63 overflow that path
        return flat, parent, h.view(np.int64), valid

    def _gram_hashes(t: pa.Table):
        """(gram_hash int64, parent row) at the VALID starts only."""
        _, parent, h, valid = _tok_grams(t)
        return h[valid], parent[:len(h)][valid]

    def _count_partial(t: pa.Table) -> pa.Table:
        h, _ = _gram_hashes(t)
        u, cnt = np.unique(h, return_counts=True)
        return pa.table({"gh": pa.array(u, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    # Manual hash-partitioned count exchange instead of
    # groupby("gh").sum: n-gram hashes are mostly batch-unique, so the
    # partials are near gram-stream-sized and Ray's sort-based
    # aggregate pays a full range-partition sort for keys we only need
    # BUCKETED (measured 25x slower than this shape at sf0.1). Each
    # block's partial splits into P hash buckets (num_returns=P, so a
    # merge task pulls ONLY its bucket's slices — O(B*P) small
    # objects, never a global sort); P merge tasks then sum counts and
    # keep the >= 2 survivors. P scales with the cluster at 100 TB;
    # each per-bucket merge holds total_grams/P rows.
    parts_ds = ds.map_batches(_count_partial, batch_format="pyarrow",
                              batch_size=batch_size).materialize()

    def _dups(hs: np.ndarray, cs: np.ndarray) -> np.ndarray:
        u, inv = np.unique(hs, return_inverse=True)
        acc = np.zeros(len(u), np.int64)
        np.add.at(acc, inv, cs)
        return u[acc >= 2]  # np.unique output: each shard stays sorted

    from scrape_ray.util import bucketed_key_merge

    part_refs = parts_ds.to_arrow_refs()
    dup_shard_refs = bucketed_key_merge(
        part_refs, "gh", "cnt", _dups, resolve=False)

    @ray.remote
    def _shard_len(a: np.ndarray) -> int:
        return len(a)

    shard_sizes = ray.get([_shard_len.remote(r) for r in dup_shard_refs])
    total_dups = int(sum(shard_sizes))
    mode = dup_path
    if mode == "auto":
        mode = ("broadcast" if total_dups <= broadcast_max_hashes
                else "shuffle")

    if mode == "broadcast" or not dup_shard_refs:
        dup_sorted = np.sort(np.concatenate(
            ray.get(dup_shard_refs) or [np.empty(0, np.int64)]))
        ctx = {"mode": "broadcast", "dup_ref": ray.put(dup_sorted)}
        return ctx, _gram_hashes, _tok_grams

    # ---- shuffle path: the dup set stays sharded ----------------------
    # bucketed_key_merge buckets by uint64(gh) % P; emit with the SAME
    # formula so probe rows land on their shard.
    P = len(dup_shard_refs)
    block_refs = ds.materialize().to_arrow_refs()
    B = len(block_refs)

    @ray.remote
    def _emit_positions(t: pa.Table, P: int):
        """One block's (gh, flat-start-pos) pairs, sliced per dup
        shard."""
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        if t.num_rows == 0 or text_col not in t.column_names:
            out = [empty] * P
            return out[0] if P == 1 else tuple(out)
        _, _, h, valid = _tok_grams(t)
        starts = np.flatnonzero(valid).astype(np.int64)
        gh = h[valid]
        b = (gh.view(np.uint64) % np.uint64(P)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        gh, starts, b = gh[order], starts[order], b[order]
        cuts = np.searchsorted(b, np.arange(P + 1))
        out = [(gh[cuts[p]:cuts[p + 1]], starts[cuts[p]:cuts[p + 1]])
               for p in range(P)]
        return out[0] if P == 1 else tuple(out)

    @ray.remote
    def _shard_hits(dup_shard: np.ndarray, *slices):
        """One dup shard's membership probe over every block's slice;
        routes hit POSITIONS back per block."""
        out = [pos[_sorted_member(dup_shard, gh)] for gh, pos in slices]
        return out[0] if len(out) == 1 else tuple(out)

    emitted = [_emit_positions.options(num_returns=P).remote(r, P)
               for r in block_refs]
    if P == 1:
        emitted = [[e] for e in emitted]
    hits = [
        _shard_hits.options(num_returns=B).remote(
            dup_shard_refs[p], *[emitted[b][p] for b in range(B)])
        for p in range(P)
    ]
    if B == 1:
        hits = [[h] for h in hits]

    @ray.remote
    def _gather_pos(*pos_arrays) -> np.ndarray:
        return np.sort(np.concatenate(
            pos_arrays or [np.empty(0, np.int64)]))

    pos_refs = [
        _gather_pos.remote(*[hits[p][b] for p in range(P)])
        for b in range(B)
    ]
    ctx = {"mode": "shuffle", "block_refs": block_refs,
           "pos_refs": pos_refs}
    return ctx, _gram_hashes, _tok_grams


def _sorted_member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``vals`` in a SORTED int64 array —
    the broadcast-dup-set probe shared by the ExactSubstr passes."""
    if not len(sorted_arr) or not len(vals):
        return np.zeros(len(vals), bool)
    pos = np.searchsorted(sorted_arr, vals)
    return (pos < len(sorted_arr)) & (
        sorted_arr[np.minimum(pos, len(sorted_arr) - 1)] == vals)


def dup_span_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 8, batch_size: int = 4096,
                   scale: int = 1000,
                   broadcast_max_hashes: int = 16_000_000,
                   dup_path: str = "auto"):
    """Exact-substring duplication profile (the ExactSubstr statistic
    of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499, at word-n-gram granularity):
    for every document, how many of its word ``n``-gram positions are
    occupied by an n-gram that occurs >= 2 times ANYWHERE in the
    corpus (including elsewhere in the same document). Output is one
    row per input doc: (id_col, n_pos, dup_pos, dup_permille) with
    ``dup_permille = dup_pos * scale // n_pos`` (0 for docs shorter
    than ``n`` tokens) — the per-doc score training pipelines
    threshold on to drop boilerplate-heavy pages. No reference analog
    (it stops at extraction); downstream of ``content_text``.

    Scale shape — two streaming passes, ONE exchange total:

    1. Count pass: each batch tokenizes (Arrow whitespace kernel),
       FNV-hashes tokens once (``functions.keys.fnv1a64_arrow``) and
       combines ``n`` shifted hash views with a polynomial mix — an
       O(n)-vector-op gram hash with no gram-string materialization —
       then pre-aggregates occurrence counts per batch-distinct hash.
       The partials merge through a MANUAL hash-bucketed exchange
       (per-block ``num_returns=P`` bucket slices + P merge tasks):
       per-key counts don't need the global sort Ray's groupby
       aggregate would pay for (inline comment has the numbers).
    2. The duplicated-hash set (global count >= 2) is pulled sorted
       to the driver and BROADCAST with ``ray.put`` — duplicated
       n-grams are the Zipf head, far smaller than the vocabulary.
       Score pass: re-tokenize, re-hash, ``searchsorted`` membership,
       ``bincount`` per parent row — zero further exchanges.

    When the dup set outgrows ``broadcast_max_hashes`` (raw Common
    Crawl boilerplate: billions of duplicated 8-grams), step 2
    switches to the sharded shuffle probe (``_build_dup_gram_set``
    docstring) — exchanges go 1 -> 2, per-doc aggregation shape
    unchanged, and the dup set never reaches the driver or any single
    worker. Hash collisions (FNV-1a 64 + mix) would fuse two distinct
    grams; at 2^64 the expected collision count stays < 1 up to ~10^9
    distinct grams per corpus.
    """
    import ray
    import ray.data

    ctx, _gram_hashes, _ = _build_dup_gram_set(
        ds, text_col, n, batch_size, broadcast_max_hashes, dup_path)

    def _stats_tbl(t: pa.Table, n_pos: np.ndarray,
                   dup_pos: np.ndarray) -> pa.Table:
        permille = np.zeros(len(n_pos), dtype=np.int64)
        nz = n_pos > 0
        permille[nz] = dup_pos[nz] * scale // n_pos[nz]
        return pa.table({
            id_col: t[id_col],
            "n_pos": pa.array(n_pos, pa.int64()),
            "dup_pos": pa.array(dup_pos, pa.int64()),
            "dup_permille": pa.array(permille, pa.int64()),
        })

    if ctx["mode"] == "broadcast":
        dup_ref = ctx["dup_ref"]

        def _score(t: pa.Table) -> pa.Table:
            dup = ray.get(dup_ref)  # zero-copy shared read
            h, parent = _gram_hashes(t)
            nrows = t.num_rows
            n_pos = np.bincount(parent, minlength=nrows).astype(np.int64)
            hit = _sorted_member(dup, h)
            dup_pos = np.bincount(
                parent[hit], minlength=nrows).astype(np.int64)
            return _stats_tbl(t, n_pos, dup_pos)

        return ds.map_batches(_score, batch_format="pyarrow",
                              batch_size=batch_size)

    def _score_block(t: pa.Table, dup_start_pos: np.ndarray) -> pa.Table:
        """Shuffle path: dup-start flat positions already resolved —
        no probe, no hashing; just per-doc fold."""
        if t.num_rows == 0 or text_col not in t.column_names:
            # anchor id type to the real block schema when present —
            # a fabricated int64 would mix schemas for string doc ids
            id_arr = (t[id_col].slice(0, 0)
                      if id_col in t.column_names
                      else pa.array([], pa.int64()))
            return pa.table({
                id_col: id_arr,
                "n_pos": pa.array([], pa.int64()),
                "dup_pos": pa.array([], pa.int64()),
                "dup_permille": pa.array([], pa.int64()),
            })
        flat, parent = _ws_tokens_flat(t, text_col)
        nrows = t.num_rows
        m = len(flat) - (n - 1)
        if m <= 0:
            z = np.zeros(nrows, np.int64)
            return _stats_tbl(t, z, z)
        valid = parent[:m] == parent[n - 1:]
        n_pos = np.bincount(
            parent[:m][valid], minlength=nrows).astype(np.int64)
        dup_pos = np.bincount(
            parent[dup_start_pos], minlength=nrows).astype(np.int64)
        return _stats_tbl(t, n_pos, dup_pos)

    rem = ray.remote(_score_block)
    return ray.data.from_arrow_refs([
        rem.remote(r, p)
        for r, p in zip(ctx["block_refs"], ctx["pos_refs"])
    ])


def lm_rank_score(ds, text_col: str = "text", id_col: str = "doc_id",
                  vocab_k: int = 16, scale: int = 1000,
                  batch_size: int = 4096):
    """Rank-based unigram LM quality score — the integer-exact analog
    of the LM-perplexity corpus filter (CCNet / Wenzek et al. 2020):
    every token costs its corpus frequency RANK (1 = most frequent,
    ties broken by token text) capped at the top-``vocab_k``
    vocabulary; out-of-vocabulary tokens cost ``vocab_k + 1``. A
    document's score is the scaled mean token cost::

        score_permille = (rank_sum * scale) // n_tokens

    Low = built from common tokens (fluent, boilerplate-like), high =
    rare-token-heavy (noisy/junk under a unigram model). Rank costs
    replace -log p so every value is int64 and the DuckDB oracle
    reproduces each score bit-for-bit (the float-log trap documented
    on tfidf_topk applies here too). Zero-token docs score 0.

    Scale shape: one pre-aggregated vocabulary exchange
    (:func:`term_frequencies`), a driver-side top-``vocab_k`` sort of
    the Zipf-bounded term table, ONE ``ray.put`` broadcast of the
    k-row rank table, then a pure per-batch map: ``pc.index_in`` of
    the flat token array against the rank-ordered vocab (position + 1
    IS the rank), per-doc segment sums via ``np.add.at`` — tokens
    never shuffle, no per-doc Python. Two passes over ``ds`` (stats +
    score), like every corpus-relative filter."""
    import ray

    vocab = top_vocabulary(ds, text_col=text_col, k=vocab_k)
    vocab_ref = ray.put(vocab["token"].combine_chunks())
    oov = vocab_k + 1

    def _score(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        flat, parent = _ws_tokens_flat(t, text_col)
        n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)
        rank_sum = np.zeros(nrows, np.int64)
        if len(flat):
            pos = pc.index_in(flat, value_set=ray.get(vocab_ref))
            cost = pos.to_numpy(zero_copy_only=False)
            cost = np.where(np.isnan(cost), oov - 1, cost).astype(
                np.int64) + 1
            np.add.at(rank_sum, parent, cost)
        score = np.zeros(nrows, np.int64)
        nz = n_tok > 0
        score[nz] = rank_sum[nz] * scale // n_tok[nz]
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "rank_sum": pa.array(rank_sum, pa.int64()),
            "score_permille": pa.array(score, pa.int64()),
        })

    return ds.map_batches(_score, batch_format="pyarrow",
                          batch_size=batch_size)


def _removal_from_flags(t: pa.Table, flat, parent: np.ndarray,
                        dup_start: np.ndarray, n: int,
                        id_col: str) -> pa.Table:
    """Coverage + rebuild shared by both remove_dup_spans paths:
    ``dup_start`` flags (one per flat token position) -> windowed-OR
    coverage via one cumulative sum (gram starts never span docs, so
    the window cannot leak across documents), surviving tokens
    gathered into a LargeList (64-bit offsets) and joined with one
    Arrow ``binary_join`` — no per-doc Python."""
    nrows = t.num_rows
    N = len(flat)
    # covered[t] = any dup start in (t-n, t]
    c = np.concatenate(([0], np.cumsum(dup_start)))
    idx = np.arange(N)
    covered = (c[idx + 1] - c[np.maximum(idx - (n - 1), 0)]) > 0
    keep = ~covered
    kept_parent = parent[keep]
    kept = pc.cast(flat.filter(pa.array(keep)), pa.large_string())
    if isinstance(kept, pa.ChunkedArray):
        kept = kept.combine_chunks()
    n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)
    n_kept = np.bincount(kept_parent, minlength=nrows).astype(np.int64)
    offsets = pa.array(
        np.concatenate(([0], np.cumsum(n_kept))), pa.int64())
    clean = pc.binary_join(
        pa.LargeListArray.from_arrays(offsets, kept),
        pa.scalar(" ", pa.large_string()))
    return pa.table({
        id_col: t[id_col],
        "clean_text": clean,
        "n_tokens": pa.array(n_tok, pa.int64()),
        "n_removed": pa.array(n_tok - n_kept, pa.int64()),
    })


def remove_dup_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                     n: int = 8, batch_size: int = 4096,
                     broadcast_max_hashes: int = 16_000_000,
                     dup_path: str = "auto"):
    """ExactSubstr REMOVAL (the actual dedup step of Lee et al. 2022,
    arXiv:2107.06499, at word-``n``-gram granularity — the companion
    of :func:`dup_span_stats`, which only profiles): delete every
    token covered by a word n-gram that occurs >= 2 times anywhere in
    the corpus, and rebuild the document from the surviving tokens
    (single-space joined — token-level rebuild, like the
    tokenizer-level original). Output: one row per input doc,
    ``(id_col, clean_text, n_tokens, n_removed)``; docs shorter than
    ``n`` tokens pass through untouched, fully-duplicated docs come
    back empty.

    Scale shape: the shared count pass (ONE manual bucketed exchange —
    :func:`_build_dup_gram_set`), then a pure per-batch removal map
    from dup-start flags (:func:`_removal_from_flags`). The flags come
    from the broadcast probe when the dup set fits the budget, or from
    the sharded shuffle probe when it doesn't (``dup_path`` /
    ``broadcast_max_hashes`` as in :func:`dup_span_stats`) — either
    way no per-doc Python and no dup-set copy per batch task."""
    import ray
    import ray.data

    ctx, _, _tok_grams = _build_dup_gram_set(
        ds, text_col, n, batch_size, broadcast_max_hashes, dup_path)

    if ctx["mode"] == "broadcast":
        dup_ref = ctx["dup_ref"]

        def _clean(t: pa.Table) -> pa.Table:
            dup = ray.get(dup_ref)  # zero-copy shared read
            flat, parent, h, valid = _tok_grams(t)
            dup_start = np.zeros(len(flat), np.int64)
            if len(h):
                hit = valid & _sorted_member(dup, h)
                dup_start[:len(h)][hit] = 1
            return _removal_from_flags(
                t, flat, parent, dup_start, n, id_col)

        return ds.map_batches(_clean, batch_format="pyarrow",
                              batch_size=batch_size)

    def _clean_block(t: pa.Table, dup_start_pos: np.ndarray) -> pa.Table:
        """Shuffle path: dup-start positions already resolved."""
        if t.num_rows == 0 or text_col not in t.column_names:
            id_arr = (t[id_col].slice(0, 0)
                      if id_col in t.column_names
                      else pa.array([], pa.int64()))
            return pa.table({
                id_col: id_arr,
                "clean_text": pa.array([], pa.large_string()),
                "n_tokens": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
            })
        flat, parent = _ws_tokens_flat(t, text_col)
        dup_start = np.zeros(len(flat), np.int64)
        dup_start[dup_start_pos] = 1
        return _removal_from_flags(
            t, flat, parent, dup_start, n, id_col)

    rem = ray.remote(_clean_block)
    return ray.data.from_arrow_refs([
        rem.remote(r, p)
        for r, p in zip(ctx["block_refs"], ctx["pos_refs"])
    ])
