"""URL source/sink tests (S1/S2/S3/M11)."""

import json
import os

from scrape_ray.sources.urls import urls_from_csv, urls_from_items, write_json_sink


def test_urls_from_items(ray_session):
    out = urls_from_items(["https://a.com/1", "https://b.com/2"]).to_pandas()
    assert out["url"].tolist() == ["https://a.com/1", "https://b.com/2"]
    assert out["seed_seq"].tolist() == [0, 1]


def test_urls_from_csv(ray_session, tmp_path):
    p = tmp_path / "urls.csv"
    p.write_text("link,rank\nhttps://a.com/1,5\nhttps://b.com/2,3\n,9\n")
    out = urls_from_csv(str(p), column=0).to_pandas()
    assert out["url"].tolist() == ["https://a.com/1", "https://b.com/2"]
    assert out["seed_seq"].tolist() == [0, 1]
    by_name = urls_from_csv(str(p), column="link").to_pandas()
    assert by_name["url"].tolist() == out["url"].tolist()


def test_write_json_sink_notext(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": ["https://a.com"],
                "content_text": ["secret body"],
                "title": ["T"],
            }
        )
    )
    out_dir = str(tmp_path / "out")
    write_json_sink(ds, out_dir, notext=True)
    rows = []
    for f in os.listdir(out_dir):
        with open(os.path.join(out_dir, f)) as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    assert len(rows) == 1
    assert "content_text" not in rows[0]
    assert rows[0]["title"] == "T"


def test_cli_main(ray_session, capsys, tmp_path):
    """python -m scrape_ray parity: args + CSV sources, -notext, JSON
    array output, error rows not exceptions."""
    import json

    from scrape_ray.__main__ import main

    rc = main(
        ["-notext", "https://host0.example.com/doc/5?utm_campaign=x", "not-a-url"]
    )
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 2
    by_url = {r["original_url"]: r for r in rows}
    ok = by_url["https://host0.example.com/doc/5?utm_campaign=x"]
    assert ok["title"] == "Doc 5"
    assert "content_text" not in ok
    bad = by_url["not-a-url"]
    assert bad["error"] is not None

    p = tmp_path / "u.csv"
    p.write_text("url\nhttps://host7.example.com/doc/7\n")
    assert main(["--csv", str(p)]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["title"] == "Doc 7"
    assert rows[0]["content_text"].startswith("Doc 7 ")
