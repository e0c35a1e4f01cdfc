"""Deterministic hash-threshold sampling: reproducibility across
block layouts, per-stratum rates, null-stratum fallback."""

import numpy as np

from scrape_ray.functions.keys import fnv1a64


def _expected(rows, rates, default):
    keep = set()
    for r in rows:
        hv = int(fnv1a64([str(r["doc_id"]).encode()])[0])
        if hv % 1000 < rates.get(r["lang"], default):
            keep.add(r["doc_id"])
    return keep


def test_stratified_sample_matches_reference(ray_session):
    import ray.data

    from scrape_ray.ops.sampling import stratified_sample

    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr", None][i % 4]}
        for i in range(2000)
    ]
    rates = {"en": 500, "de": 250, "fr": 125}
    want = _expected(rows, rates, default=50)
    got = (
        stratified_sample(
            ray.data.from_items(rows).repartition(17),
            "lang", "doc_id", rates, default_permille=50,
        )
        .to_pandas()
    )
    assert set(got["doc_id"]) == want
    # rates actually differ per stratum (en keeps ~4x fr)
    by_lang = got.groupby("lang")["doc_id"].count()
    assert by_lang["en"] > by_lang["de"] > by_lang["fr"]


def test_stratified_sample_layout_independent(ray_session):
    import ray.data

    from scrape_ray.ops.sampling import stratified_sample

    rows = [{"doc_id": i, "lang": "en" if i % 3 else "de"} for i in range(500)]
    rates = {"en": 300, "de": 700}
    picks = []
    for parts in (1, 7, 31):
        out = stratified_sample(
            ray.data.from_items(rows).repartition(parts),
            "lang", "doc_id", rates,
        ).to_pandas()
        picks.append(frozenset(out["doc_id"]))
    assert picks[0] == picks[1] == picks[2]


def test_deterministic_sample_rate_and_agreement_with_split(ray_session):
    import ray.data

    from scrape_ray.ops.dedup import hash_split
    from scrape_ray.ops.sampling import deterministic_sample

    rows = [{"doc_id": i} for i in range(3000)]
    ds = ray.data.from_items(rows)
    got = deterministic_sample(ds, "doc_id", 100).to_pandas()
    # the 100-permille sample IS hash_split's holdout set (same fold)
    split = hash_split(
        ray.data.from_items(
            [{"url": str(i), "doc_id": i} for i in range(3000)]
        ),
        "url", holdout_permille=100,
    ).to_pandas()
    hold = set(split[split["split"] == "holdout"]["doc_id"])
    assert set(got["doc_id"]) == hold
    assert abs(len(got) / 3000 - 0.1) < 0.03  # ~10% rate
    assert np.all(np.diff(sorted(got["doc_id"])) > 0)


def test_reservoir_per_stratum_exact_k_and_determinism(ray_session):
    import ray.data

    from scrape_ray.ops.sampling import reservoir_per_stratum

    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr"][i % 3]} for i in range(300)
    ] + [{"doc_id": 1000 + i, "lang": "zh"} for i in range(3)]
    k = 10
    a = reservoir_per_stratum(
        ray.data.from_items(rows).repartition(3), "lang", "doc_id", k=k
    ).to_pandas()
    b = reservoir_per_stratum(
        ray.data.from_items(rows).repartition(17), "lang", "doc_id", k=k
    ).to_pandas()
    counts = a["lang"].value_counts().to_dict()
    assert counts == {"en": k, "de": k, "fr": k, "zh": 3}  # small stratum kept whole
    sa = a.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    sb = b.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    assert sa.equals(sb)  # layout-independent selection


def test_mixture_sample_multiplicity_and_layout_independence(ray_session):
    import ray.data

    from scrape_ray.functions.keys import fnv1a64_arrow
    from scrape_ray.ops.sampling import mixture_sample

    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr", "zh"][i % 4]}
        for i in range(400)
    ]
    w = {"en": 2000, "de": 1000, "fr": 300, "zh": 1500}
    a = mixture_sample(
        ray.data.from_items(rows).repartition(3), "lang", "doc_id", w
    ).to_pandas()
    b = mixture_sample(
        ray.data.from_items(rows).repartition(17), "lang", "doc_id", w
    ).to_pandas()
    sa = a.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    sb = b.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    assert sa.equals(sb)  # layout-independent

    # exact per-row multiplicity: w//1000 + (fnv(key)%1000 < w%1000)
    import pyarrow as pa

    hv = fnv1a64_arrow(pa.array([str(r["doc_id"]) for r in rows]))
    for r, h in zip(rows, hv):
        ww = w[r["lang"]]
        want = ww // 1000 + (int(h) % 1000 < ww % 1000)
        got = (a["doc_id"] == r["doc_id"]).sum()
        assert got == want, (r, ww, int(h) % 1000)
        if want:
            copies = sorted(a[a["doc_id"] == r["doc_id"]]["copy_idx"])
            assert copies == list(range(want))  # 0-based dense copy ids

    # integer weights reproduce exact epoch counts
    assert (a["lang"] == "en").sum() == 2 * 100
    assert (a["lang"] == "de").sum() == 100


def test_mixture_sample_default_and_guards(ray_session):
    import ray.data

    import pytest as _pytest

    from scrape_ray.ops.sampling import mixture_sample

    rows = [{"doc_id": i, "lang": "xx"} for i in range(100)]
    # default_permille=0 drops unknown strata entirely
    out = mixture_sample(
        ray.data.from_items(rows), "lang", "doc_id", {"en": 1000},
        default_permille=0,
    ).to_pandas()
    assert len(out) == 0

    with _pytest.raises(ValueError, match=">= 0"):
        mixture_sample(ray.data.from_items(rows), "lang", "doc_id",
                       {"en": -1})

    # copy_idx collision with the input schema is a hard error
    rows2 = [{"doc_id": 1, "lang": "en", "copy_idx": 9}]
    with _pytest.raises(Exception, match="copy_idx"):
        mixture_sample(ray.data.from_items(rows2), "lang", "doc_id",
                       {"en": 1000}).to_pandas()
