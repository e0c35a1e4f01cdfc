"""CLI — the reference's ``scrape`` command re-expressed over the
corpus-mode engine (/root/reference/cmd/scrape/main.go):

    python -m scrape_ray [-notext] [--csv FILE] [--csv-column N]
                         [--corpus SF_DIR] [url ...]
    python -m scrape_ray --feed FILE.xml [-U]

Takes URLs from positional args (S1) or a CSV column (S2), runs the
fetch+extract spine against the synthetic corpus (the ``file://``
transport analog — no network in this sandbox), and prints a JSON
array of WebPage records to stdout (S3); ``-notext`` blanks
content_text (M11). Exit code 0 even when individual URLs fail —
errors are rows, not exceptions (M18).

``--feed`` is the ``scrape-feed`` command analog
(/root/reference/cmd/scrape-feed/main.go): parse one RSS/Atom feed
(from a local XML file — the corpus-mode transport) and print the
feed JSON, or just the item links with ``-U``. A feed that fails to
parse exits 1, like the reference.

This entry point OWNS its Ray session (guarded init + shutdown);
library modules never do.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="scrape_ray")
    ap.add_argument("urls", nargs="*", help="URLs to fetch+extract")
    ap.add_argument("--csv", help="CSV file of URLs")
    ap.add_argument("--csv-column", type=int, default=0,
                    help="0-based CSV column holding the URL (default 0)")
    ap.add_argument("-notext", action="store_true",
                    help="omit content_text from the output")
    ap.add_argument("--corpus", default="/root/testdata/sf0.001",
                    help="corpus sf dir backing the synthetic fetch")
    ap.add_argument("--feed", help="parse an RSS/Atom feed XML file")
    ap.add_argument("-U", action="store_true",
                    help="with --feed: output only the item URLs")
    args = ap.parse_args(argv)

    if args.feed:
        from scrape_ray.sources.feeds import parse_feed

        with open(args.feed, "rb") as f:
            parsed = parse_feed(f.read())
        if parsed["error"] is not None:
            print(f"Error fetching {args.feed}: {parsed['error']}",
                  file=sys.stderr)
            return 1
        if args.U:
            json.dump(parsed["item_links"], sys.stdout, indent=2)
        else:
            json.dump(
                {"title": parsed["title"], "item_links": parsed["item_links"]},
                sys.stdout, indent=2,
            )
        print()
        return 0

    if not args.urls and not args.csv:
        ap.error("need URLs or --csv")

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from scrape_ray.pipelines.crawl import CorpusFetcher, load_corpus_ref
        from scrape_ray.sources.urls import urls_from_csv, urls_from_items
        from scrape_ray.stages.extract import ExtractStage
        from scrape_ray.stages.normalize import normalize

        src = (
            urls_from_csv(args.csv, args.csv_column)
            if args.csv
            else urls_from_items(args.urls)
        )
        ds = normalize(src)
        ds = ds.map_batches(
            CorpusFetcher,
            fn_constructor_kwargs={"corpus_ref": load_corpus_ref(args.corpus)},
            batch_format="pyarrow",
            batch_size=None,
            concurrency=2,
        )
        ds = ds.map_batches(ExtractStage(), batch_format="pyarrow", batch_size=None)

        drop = ["key", "host_shard", "seed_seq"]
        if args.notext:
            drop.append("content_text")
        rows = []
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            b = b.drop_columns([c for c in drop if c in b.column_names])
            rows.extend(b.to_pylist())
        rows.sort(key=lambda r: r.get("requested_url") or "")
        json.dump(rows, sys.stdout, default=str, indent=1)
        print()
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
