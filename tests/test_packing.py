"""Sequence-packing offsets: distributed prefix sum correctness."""

import numpy as np
import pyarrow as pa

from scrape_ray.ops.packing import pack_offsets


def test_pack_offsets_exact_scan(ray_session):
    import ray.data

    rng_sizes = [(i * 7919) % 300 + 1 for i in range(2000)]  # deterministic
    t = pa.table(
        {
            "doc_id": pa.array(range(2000), pa.int64()),
            "n_tok": pa.array(rng_sizes, pa.int64()),
        }
    )
    # many small blocks so the scan really crosses block boundaries
    ds = ray.data.from_arrow(t).repartition(37)
    out = (
        pack_offsets(ds, "doc_id", "n_tok", chunk=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sizes = np.array(rng_sizes, dtype=np.int64)
    want = np.concatenate([[0], np.cumsum(sizes[:-1])])
    assert np.array_equal(out["start_offset"].to_numpy(), want)
    assert np.array_equal(out["bin"].to_numpy(), want // 512)
    # contiguity: next start == this start + this size (stream packs tight)
    s = out["start_offset"].to_numpy()
    assert np.array_equal(s[1:], s[:-1] + sizes[:-1])


def test_pack_offsets_unsorted_input(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([3, 0, 2, 1], pa.int64()),
            "n_tok": pa.array([10, 5, 7, 2], pa.int64()),
        }
    )
    out = (
        pack_offsets(ray.data.from_arrow(t), "doc_id", "n_tok", chunk=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # order is doc_id: sizes 5,2,7,10 -> starts 0,5,7,14
    assert out["start_offset"].tolist() == [0, 5, 7, 14]
    assert out["bin"].tolist() == [0, 0, 0, 1]
