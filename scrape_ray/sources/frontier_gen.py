"""Deterministic synthetic Common-Crawl-style frontier generator.

BASELINE.json's ``input_hint`` mandates an input table
``(url, warc_ts, html, text, lang)``; the sandbox has no such corpus, so
we synthesize one **as a pure closed-form function of the driver's
``documents`` table** (seeded, read-only). Purity matters twice:

1. ``extract(generate(row))`` inverts the generator **byte-identically**
   (the per-row invariant the driver checks), because the generator
   embeds the expected ``content_text`` and the extractor's spec strips
   exactly the boilerplate the generator adds — the reference's
   smoker.html strategy (fetch/trafilatura/fetcher_test.go:113-178).
2. Every generated field has a closed-form ANSI-SQL expression over
   ``documents``, so DuckDB oracles can verify the Ray pipelines.

Closed forms (doc_id d, text t, lang l, source s):

- host(d)       = 'host0.example.com' if d%5<2 else 'host{d%50}.example.com'
                  (≈40 % of rows on one host — the skew of the
                  reference's real seed corpus, internal/testdata/global_urls.csv)
- base(d)       = 'https://{host}/doc/{d}'
- url(d)        = base + {0: '?utm_source=feed&ref={d%7}', 1: '?utm_campaign=x',
                  2: '#frag', 3: ''}[d%4]          (dirty input)
- clean(d)      = base + ('?ref={d%7}' if d%4==0 else '')
- status(d)     = 404 if d%29==0 else 200
- ctype(d)      = 'application/pdf' if d%29!=0 and d%31==0 else 'text/html'
- empty page    : d%37==0 (and not an error row) → page with no content
- canonical(d)  = 'https://{host}/canonical/{d}' if d%10==3 else clean(d)
- title(d)      = 'Doc {d}'
- content(d)    = 'Doc {d} ' || t        (null on error/empty rows)
- warc_ts(d)    = TIMESTAMP '2024-01-01' + d seconds
- author(d)     = 'Author {d%11}';  tags = [s];  categories = ['Cat{d%3}']
- date(d)       = DATE '2024-01-01' + (d%365) days;  page_type = 'article'
"""

from __future__ import annotations

from datetime import datetime, timedelta
from html import escape

import pyarrow as pa

EPOCH0 = datetime(2024, 1, 1)

_PAGE_TMPL = """<!DOCTYPE html>
<html lang="{lang}">
<head>
<meta charset="utf-8" />
<title>{title}</title>
<meta name="description" content="{description}">
<meta name="keywords" content="{keywords}">
<meta name="author" content="{author}">
<meta property="og:type" content="article">
<meta property="article:published_time" content="{date}">
<meta property="article:section" content="{section}">
{canonical_tag}<script>var tracker = "junk && <nonsense>";</script>
<style>.x {{ color: red }}</style>
</head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="{link1}">Next</a> <a href="{link2}">Related</a></nav>
<header><h2>Site Header Boilerplate</h2></header>
<article>
{paragraphs}
</article>
<aside>Related links sidebar junk</aside>
<footer>&copy; 2024 example inc.</footer>
</body>
</html>"""


def host_of(doc_id: int) -> str:
    return (
        "host0.example.com" if doc_id % 5 < 2 else f"host{doc_id % 50}.example.com"
    )


def base_url(doc_id: int) -> str:
    return f"https://{host_of(doc_id)}/doc/{doc_id}"


def dirty_url(doc_id: int) -> str:
    b = base_url(doc_id)
    m = doc_id % 4
    if m == 0:
        return f"{b}?utm_source=feed&ref={doc_id % 7}"
    if m == 1:
        return f"{b}?utm_campaign=x"
    if m == 2:
        return f"{b}#frag"
    return b


def clean_url_expected(doc_id: int) -> str:
    b = base_url(doc_id)
    return f"{b}?ref={doc_id % 7}" if doc_id % 4 == 0 else b


def status_of(doc_id: int) -> int:
    return 404 if doc_id % 29 == 0 else 200


def ctype_of(doc_id: int) -> str:
    if doc_id % 29 != 0 and doc_id % 31 == 0:
        return "application/pdf"
    return "text/html"


def is_empty_page(doc_id: int) -> bool:
    return doc_id % 37 == 0 and status_of(doc_id) == 200 and ctype_of(doc_id) == "text/html"


def is_content_row(doc_id: int) -> bool:
    return (
        status_of(doc_id) == 200
        and ctype_of(doc_id) == "text/html"
        and not is_empty_page(doc_id)
    )


def canonical_of(doc_id: int) -> str:
    if doc_id % 10 == 3:
        return f"https://{host_of(doc_id)}/canonical/{doc_id}"
    return clean_url_expected(doc_id)


def expected_content(doc_id: int, text: str) -> str | None:
    if not is_content_row(doc_id):
        return None
    return f"Doc {doc_id} {text}"


def link_targets(doc_id: int) -> tuple[int, int]:
    """The two doc-ids a page links to (nav 'Next'/'Related'): cycle
    within the page's own decade of doc-ids, so every target exists in
    any documents table whose size is a multiple of 10.
    SQL: (d//10)*10 + (d+1)%10 and (d//10)*10 + (d+3)%10."""
    base = (doc_id // 10) * 10
    return base + (doc_id + 1) % 10, base + (doc_id + 3) % 10


def expected_links(doc_id: int) -> list[str]:
    """Closed-form absolute link set a parsed content page yields (in
    document order): site chrome (/, /about on the page's own host)
    then the two doc links on their true hosts. Pages that extract
    empty or fail the gates yield no links."""
    h = host_of(doc_id)
    n1, n2 = link_targets(doc_id)
    return [
        f"https://{h}/",
        f"https://{h}/about",
        base_url(n1),
        base_url(n2),
    ]


from functools import lru_cache


@lru_cache(maxsize=512)
def _date_str(day: int) -> str:
    return (EPOCH0 + timedelta(days=day)).strftime("%Y-%m-%d")


def page_html(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """Deterministic page whose extraction equals the closed forms above."""
    if is_empty_page(doc_id):
        # no <title>, no body text → the reference's empty-extraction error
        return (
            b'<!DOCTYPE html>\n<html lang="en"><head>'
            b"<script>var x = 1;</script></head>"
            b"<body><nav>Home</nav></body></html>"
        )
    words = text.split(" ")
    third = max(1, len(words) // 3)
    paras = [
        " ".join(words[:third]),
        " ".join(words[third : 2 * third]),
        " ".join(words[2 * third :]),
    ]
    paragraphs = "\n".join(f"<p>{escape(p)}</p>" for p in paras if p)
    canonical_tag = ""
    if doc_id % 10 == 3:
        canonical_tag = (
            f'<meta property="og:url" content="{canonical_of(doc_id)}">\n'
        )
    n1, n2 = link_targets(doc_id)
    page = _PAGE_TMPL.format(
        lang=lang,
        link1=base_url(n1),
        link2=base_url(n2),
        title=f"Doc {doc_id}",
        description=escape(f"Synthetic doc {doc_id} from {source}"),
        keywords=escape(source),
        author=f"Author {doc_id % 11}",
        date=_date_str(doc_id % 365),
        section=f"Cat{doc_id % 3}",
        canonical_tag=canonical_tag,
        paragraphs=paragraphs,
    )
    return page.encode("utf-8")


def synth_batch(batch: pa.Table) -> pa.Table:
    """documents batch → frontier batch (map_batches body; Arrow in/out).

    Output columns: the input_hint five (url, warc_ts, html, text, lang)
    plus sidecar fetch-response columns (status_code, content_type) and
    ``seed_seq`` (= doc_id, the ingest-order stamp for the crawl-order
    contract, SURVEY.md §2.9)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()

    urls, htmls, exp_text, status, ctypes = [], [], [], [], []
    for d, t, lg, s in zip(doc_ids, texts, langs, sources):
        urls.append(dirty_url(d))
        htmls.append(page_html(d, t, lg, s))
        exp_text.append(expected_content(d, t))
        status.append(status_of(d))
        ctypes.append(ctype_of(d))
    import numpy as np

    ts_arr = np.datetime64("2024-01-01", "us") + np.asarray(
        doc_ids, dtype="int64"
    ) * np.timedelta64(1_000_000, "us")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_arr, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(exp_text, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "status_code": pa.array(status, pa.int32()),
            "content_type": pa.array(ctypes, pa.string()),
            "seed_seq": pa.array(doc_ids, pa.int64()),
        }
    )


DUP_SEQ_OFFSET = 1_000_000


def url_inputs_with_dups(sf_dir: str):
    """URL-only input stream with planted exact duplicates: every even
    doc_id re-enters as ``base?utm_term=dup#f2`` (cleans to the bare
    base URL) with seed_seq = doc_id + DUP_SEQ_OFFSET. Exercises D1
    exact dedup with a closed SQL form."""
    import ray.data

    def _gen(t: pa.Table) -> pa.Table:
        urls, seqs = [], []
        for d in t["doc_id"].to_pylist():
            urls.append(dirty_url(d))
            seqs.append(d)
            if d % 2 == 0:
                urls.append(f"{base_url(d)}?utm_term=dup#f2")
                seqs.append(d + DUP_SEQ_OFFSET)
        return pa.table(
            {"url": pa.array(urls, pa.string()), "seed_seq": pa.array(seqs, pa.int64())}
        )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(_gen, batch_format="pyarrow", batch_size=2048)


def robots_txt_for(host: str) -> str:
    """Closed-form synthetic robots.txt per host: every host disallows
    ``/private/`` and sets Crawl-delay = 1 + (k % 3) for host{k}
    (host0 ⇒ 1). Deterministic ⇒ SQL-expressible for oracles."""
    k = 0
    if host.startswith("host"):
        try:
            k = int(host.split(".", 1)[0][4:])
        except ValueError:
            k = 0
    return f"User-agent: *\nDisallow: /private/\nCrawl-delay: {1 + (k % 3)}\n"


def crawl_delay_of(doc_id: int) -> int:
    """delay(host(doc_id)) in closed form (mirrors robots_txt_for)."""
    k = 0 if doc_id % 5 < 2 else doc_id % 50
    return 1 + (k % 3)


def crawl_seed_urls(sf_dir: str, include_private: bool = True) -> list[str]:
    """Deterministic crawl seed list in doc_id order: every dirty URL,
    plus a robots-blocked ``/private/{d}`` alias for d % 11 == 5 rows
    (exercising the robots filter with a closed SQL form)."""
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    urls = []
    for d in sorted(ids):
        urls.append(dirty_url(d))
        if include_private and d % 11 == 5:
            urls.append(f"https://{host_of(d)}/private/{d}")
    return urls


def frontier_dataset(sf_dir: str, repeat: int = 1, override_num_blocks: int | None = None):
    """Streaming frontier over ``{sf_dir}/documents.parquet`` — the
    generator runs inside map_batches, so frontier synthesis scales with
    the cluster instead of materializing on the driver.

    ``repeat``: deterministic amplification for benchmarks — each doc
    yields ``repeat`` frontier rows with doc_id' = doc_id + r*10^7
    (distinct URLs/hosts via the same closed forms). The correctness
    queries use repeat=1."""
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=override_num_blocks,
    )
    if repeat > 1:

        def _amplify(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            parts = []
            for r in range(repeat):
                s = t.set_column(
                    t.column_names.index("doc_id"),
                    "doc_id",
                    pc.add(t["doc_id"], r * 10_000_000),
                )
                parts.append(s)
            return pa.concat_tables(parts)

        docs = docs.map_batches(_amplify, batch_format="pyarrow", batch_size=None)
    return docs.map_batches(synth_batch, batch_format="pyarrow", batch_size=None)
