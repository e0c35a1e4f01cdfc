"""Corpus-hygiene operators: PII redaction, benchmark decontamination."""

import numpy as np
import pyarrow as pa

from scrape_ray.ops.filtering import (
    benchmark_shingle_hashes,
    decontaminate,
    redact_pii,
)


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


def test_redact_pii(ray_session):
    texts = [
        "write to alice@corp.example.org or bob.smith+x@mail.co today",
        "server at 192.168.0.1 and 10.0.255.7 port 80",
        "call +1-555-123-4567 now",
        "clean text with no pii at all",
        None,
    ]
    out = (
        redact_pii(_ds({"doc_id": list(range(5)), "text": texts}))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_emails"] == 2
    assert out.loc[0, "clean_text"] == "write to <EMAIL> or <EMAIL> today"
    assert out.loc[1, "n_ips"] == 2
    assert out.loc[1, "clean_text"] == "server at <IP> and <IP> port 80"
    assert out.loc[2, "n_phones"] == 1
    assert out.loc[2, "clean_text"] == "call <PHONE> now"
    assert out.loc[3, "clean_text"] == texts[3]
    assert (out.loc[3, ["n_emails", "n_ips", "n_phones"]] == 0).all()
    assert out.loc[4, "clean_text"] == ""  # null -> empty, no crash


def test_decontaminate(ray_session):
    import ray

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = [
        bench_text,  # full overlap
        "xx yy " + bench_text,  # contains benchmark 5-grams
        "alpha beta gamma delta different tail entirely here now",  # shares 1 shingle? no: 5-gram needs 5 in a row
        "totally unrelated words with zero overlap whatsoever here",
    ]
    bench = _ds({"doc_id": [0], "text": [bench_text]})
    ref = ray.put(benchmark_shingle_hashes(bench, ngram=5))
    out = (
        decontaminate(_ds({"doc_id": list(range(4)), "text": corpus}), ref, ngram=5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out["contaminated"].tolist() == [True, True, False, False]
    # doc 0 has 4 shingles (8 words, n=5), all hits
    assert out.loc[0, "n_hits"] == 4
    # doc 2: "alpha beta gamma delta different" is not a benchmark shingle
    assert out.loc[2, "n_hits"] == 0

    # empty benchmark flags nothing
    ref0 = ray.put(np.zeros(0, dtype=np.uint64))
    out0 = decontaminate(
        _ds({"doc_id": [0], "text": ["alpha beta gamma delta epsilon"]}), ref0
    ).to_pandas()
    assert not out0["contaminated"][0]


def test_boilerplate_strip(ray_session):
    from scrape_ray.ops.filtering import boilerplate_strip

    # host a: NAV in 3/3 docs (boiler), FOOT in 2/3 (boiler: 2 > 1.5),
    # EDGE in 1/3 (kept); host b shares the NAV string but only 1/2
    # docs have it (1 > 1.0 false -> kept there)
    rows = {
        "doc_id": [0, 1, 2, 3, 4],
        "domain": ["a", "a", "a", "b", "b"],
        "text": [
            "NAV\nbody zero\nFOOT",
            "NAV\nbody one\nFOOT",
            "NAV\nbody two\nEDGE",
            "NAV\nbody three",
            "body four",
        ],
    }
    out = (
        boilerplate_strip(_ds(rows), host_col="domain", min_frac=0.5)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "text"] == "body zero"
    assert out.loc[0, "n_boiler_lines"] == 2
    assert out.loc[2, "text"] == "body two\nEDGE"
    assert out.loc[2, "n_boiler_lines"] == 1
    # host b: NAV present in only half -> not boilerplate there
    assert out.loc[3, "text"] == "NAV\nbody three"
    assert out.loc[3, "n_boiler_lines"] == 0
    assert out.loc[4, "text"] == "body four"


def test_boilerplate_strip_matches_reference_loop(ray_session):
    """The vectorized group task ≡ the obvious per-doc Python loop on
    a many-host partition with empty docs, shared lines across hosts
    (must NOT mix votes), and single-doc hosts (every line >50% by
    itself -> all dropped)."""
    import numpy as np

    from scrape_ray.ops.filtering import boilerplate_strip

    rng = np.random.RandomState(3)
    hosts = [f"h{i % 7}.example" for i in range(60)]
    rows = []
    for i, h in enumerate(hosts):
        lines = [f"NAV {h}"] if i % 3 else []
        lines += [f"body {i} line {j}" for j in range(rng.randint(0, 4))]
        if i % 11 == 0:
            lines.append("COMMON FOOTER")  # appears across hosts
        rows.append({"doc_id": i, "domain": h, "text": "\n".join(lines)})
    rows.append({"doc_id": 60, "domain": "solo.example", "text": "only doc\nhere"})

    out = (
        boilerplate_strip(_ds(
            {k: [r[k] for r in rows] for k in ("doc_id", "domain", "text")}
        ), host_col="domain", min_frac=0.5)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # reference: per-host presence count, strict > cut
    by_host = {}
    for r in rows:
        by_host.setdefault(r["domain"], []).append(r)
    exp_text, exp_n = {}, {}
    for h, docs in by_host.items():
        freq = {}
        for r in docs:
            for ln in set(r["text"].split("\n")):
                freq[ln] = freq.get(ln, 0) + 1
        boiler = {ln for ln, c in freq.items() if c > 0.5 * len(docs)}
        for r in docs:
            lines = r["text"].split("\n")
            kept = [ln for ln in lines if ln not in boiler]
            exp_text[r["doc_id"]] = "\n".join(kept)
            exp_n[r["doc_id"]] = len(lines) - len(kept)

    assert len(out) == len(rows)
    for d in exp_text:
        assert out.loc[d, "text"] == exp_text[d], d
        assert out.loc[d, "n_boiler_lines"] == exp_n[d], d
