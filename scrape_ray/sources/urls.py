"""URL batch sources + sinks — the reference's CLI input surface.

- S1 args source   (cmd/scrape/main.go:72-77)   → from_items
- S2 CSV source    (cmd/scrape/main.go:95-122)  → read_csv + column pick
- S3 JSON sink     (cmd/scrape/main.go:78-92)   → write_json
- M11 -notext      (cmd/scrape/main.go:84-86)   → drop content_text
"""

from __future__ import annotations


def urls_from_items(urls: list[str]):
    """S1: positional-args source; seed_seq = input order (the FIFO
    order contract)."""
    import ray.data

    return ray.data.from_items(
        [{"url": u, "seed_seq": i} for i, u in enumerate(urls)]
    )


def urls_from_csv(path: str, column: int | str = 0):
    """S2: CSV source; ``column`` picks by index (reference default:
    first column) or by header name. Rows with a missing/empty value
    are dropped (the reference skips blank fields).

    Read happens driver-side with pyarrow.csv — a CLI seed file, not
    the 10^10 frontier — because seed_seq must be the exact file
    order (streaming block order is not guaranteed)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.csv as pacsv
    import ray.data

    t = pacsv.read_csv(path)
    col = t.column_names[column] if isinstance(column, int) else column
    urls = t[col].cast("string")
    out = pa.table({"url": urls}).append_column(
        "seed_seq", pa.array(range(t.num_rows), pa.int64())
    )
    mask = pc.and_(pc.is_valid(urls), pc.not_equal(urls, ""))
    out = out.filter(mask)
    # renumber seed_seq densely over surviving rows (input order)
    out = out.set_column(
        out.column_names.index("seed_seq"),
        "seed_seq",
        pa.array(range(out.num_rows), pa.int64()),
    )
    return ray.data.from_arrow(out)


def write_json_sink(ds, path: str, notext: bool = False):
    """S3/M11: JSON output; ``notext`` drops content_text."""
    if notext and "content_text" in ds.schema().names:
        ds = ds.drop_columns(["content_text"])
    ds.write_json(path)
    return path
