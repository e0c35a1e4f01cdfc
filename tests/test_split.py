"""hash_split: deterministic leakage-safe train/holdout assignment."""

import numpy as np
import pyarrow as pa

from scrape_ray.functions.keys import fnv1a64
from scrape_ray.ops.dedup import hash_split


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


KEYS = [f"https://host{i % 37}.example.com/doc/{i}" for i in range(2000)]


def test_hash_split_matches_scalar_model(ray_session):
    ds = hash_split(_ds({"k": KEYS}), "k", holdout_permille=100)
    out = ds.to_pandas().set_index("k")["split"]
    hv = fnv1a64([k.encode("utf-8") for k in KEYS])
    want = np.where(hv % np.uint64(1000) < np.uint64(100), "holdout", "train")
    assert list(out.loc[KEYS]) == list(want)


def test_hash_split_batch_independent(ray_session):
    """A key's split must not depend on what else is in the batch."""
    full = (
        hash_split(_ds({"k": KEYS}), "k", holdout_permille=250)
        .to_pandas()
        .set_index("k")["split"]
    )
    sample = KEYS[::97]
    alone = (
        hash_split(_ds({"k": sample}), "k", holdout_permille=250, batch_size=1)
        .to_pandas()
        .set_index("k")["split"]
    )
    for k in sample:
        assert alone[k] == full[k]


def test_hash_split_fraction_and_edges(ray_session):
    out = hash_split(_ds({"k": KEYS}), "k", holdout_permille=100).to_pandas()
    frac = (out["split"] == "holdout").mean()
    assert 0.05 < frac < 0.15  # ~10% with 2000-key sampling noise
    # permille 0 / 1000 are total
    assert (
        hash_split(_ds({"k": KEYS[:50]}), "k", holdout_permille=0).to_pandas()["split"]
        == "train"
    ).all()
    assert (
        hash_split(_ds({"k": KEYS[:50]}), "k", holdout_permille=1000)
        .to_pandas()["split"]
        == "holdout"
    ).all()


def test_hash_split_null_key(ray_session):
    ds = _ds({"k": pa.array(["a", None, "b"], pa.string())})
    out = hash_split(ds, "k", holdout_permille=100).to_pandas()
    # nulls hash as "" deterministically, never crash
    assert len(out) == 3
    assert set(out["split"]) <= {"train", "holdout"}


def test_per_key_topk(ray_session):
    from scrape_ray.ops.dedup import per_key_topk

    t = pa.table(
        {
            "domain": pa.array(
                ["a.com"] * 5 + ["b.com"] * 2 + ["c.com"], pa.string()
            ),
            "doc_id": pa.array([5, 3, 9, 1, 7, 20, 10, 42], pa.int64()),
        }
    )
    import ray.data

    out = (
        per_key_topk(ray.data.from_arrow(t), "domain", "doc_id", k=2)
        .to_pandas()
        .sort_values(["domain", "doc_id"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.values.tolist())) == [
        ("a.com", 1),
        ("a.com", 3),
        ("b.com", 10),
        ("b.com", 20),
        ("c.com", 42),
    ]
    # keep='last' takes the k largest
    hi = (
        per_key_topk(ray.data.from_arrow(t), "domain", "doc_id", k=1, keep="last")
        .to_pandas()
        .sort_values("domain")
    )
    assert hi["doc_id"].tolist() == [9, 20, 42]
