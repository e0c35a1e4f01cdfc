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


def _py_chunks(doc_id, text, chunk, overlap):
    toks = text.split()
    stride = chunk - overlap
    return [
        (doc_id, ci, st, len(toks[st:st + chunk]), " ".join(toks[st:st + chunk]))
        for ci, st in enumerate(range(0, len(toks), stride))
    ]


def test_chunk_documents_matches_python_reference(ray_session):
    import ray.data

    from scrape_ray.ops.packing import chunk_documents

    docs = [
        (1, "  a b c d e f g h i j  "),       # edge whitespace
        (2, ""),                               # empty -> no chunks
        (3, "one two"),                        # shorter than chunk
        (4, "\t \n"),                          # whitespace-only -> none
        (5, " ".join(f"w{i}" for i in range(13))),  # partial tail window
        (6, " ".join(f"x{i}" for i in range(8))),   # exact multiple
    ]
    want = []
    for d, t in docs:
        want += _py_chunks(d, t, chunk=4, overlap=2)
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs]
    ).repartition(5)  # chunks must not depend on block layout
    got = (
        chunk_documents(ds, chunk_tokens=4, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_chunk_documents_rejects_bad_overlap(ray_session):
    import pytest as _pytest
    import ray.data

    from scrape_ray.ops.packing import chunk_documents

    ds = ray.data.from_items([{"doc_id": 1, "text": "a"}])
    with _pytest.raises(ValueError):
        chunk_documents(ds, chunk_tokens=4, overlap=4)


def test_chunk_documents_empty_blocks_keep_schema(ray_session):
    """Blocks whose docs are all whitespace-only must still emit the
    output schema (the round-2 empty-block passthrough hazard)."""
    import ray.data

    from scrape_ray.ops.packing import chunk_documents
    from scrape_ray.util import dataset_to_table

    rows = [{"doc_id": i, "text": "" if i % 2 else "alpha beta gamma"}
            for i in range(64)]
    ds = ray.data.from_items(rows).repartition(32)
    t = dataset_to_table(chunk_documents(ds, chunk_tokens=2, overlap=1))
    assert set(t.column_names) == {
        "doc_id", "chunk_id", "tok_start", "n_tokens", "chunk_text"
    }
    assert t.num_rows == 32 * 3  # 3 tokens, stride 1 -> windows at 0,1,2


def _budget_replay(rows, budget):
    """(id, score, size) -> selected {id: cum} by (score DESC, id ASC)."""
    cum, out = 0, {}
    for rid, score, size in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += size
        if cum <= budget:
            out[rid] = cum
    return out


def test_budget_select_matches_replay_and_boundaries(ray_session):
    import ray.data

    from scrape_ray.ops.packing import budget_select

    # heavy score ties + varied sizes; deterministic
    rows = [(i, (i * 7) % 5, (i * 3) % 11 + 1) for i in range(200)]
    items = [{"doc_id": r[0], "score": r[1], "size": r[2]} for r in rows]
    total = sum(r[2] for r in rows)

    from scrape_ray.util import dataset_to_table

    for budget in (0, total // 3, total, total + 5):
        got = dataset_to_table(budget_select(
            ray.data.from_items(items).repartition(7), "score", "size",
            budget, id_col="doc_id", out_col="cum",
        ))  # arrow path: schema survives even an all-filtered result
        want = _budget_replay(rows, budget)
        assert dict(zip(got["doc_id"].to_pylist(),
                        got["cum"].to_pylist())) == want
        if budget >= total:
            assert got.num_rows == len(rows)  # whole corpus fits

    # exact-boundary row is INCLUDED (cum <= budget, not <)
    srt = sorted(rows, key=lambda r: (-r[1], r[0]))
    edge = srt[0][2] + srt[1][2]  # cum after the 2nd-ranked row
    got = budget_select(
        ray.data.from_items(items).repartition(3), "score", "size",
        edge, id_col="doc_id", out_col="cum",
    ).to_pandas()
    assert len(got) == 2 and int(got["cum"].max()) == edge


def test_budget_select_layout_independent_and_guard(ray_session):
    import pytest as _pytest
    import ray.data

    from scrape_ray.ops.packing import budget_select

    items = [{"doc_id": i, "score": i % 4, "size": 2} for i in range(90)]
    a = budget_select(ray.data.from_items(items).repartition(2),
                      "score", "size", 60).to_pandas()
    b = budget_select(ray.data.from_items(items).repartition(31),
                      "score", "size", 60).to_pandas()
    sa = a.sort_values("doc_id").reset_index(drop=True)
    sb = b.sort_values("doc_id").reset_index(drop=True)
    assert sa.equals(sb)

    with _pytest.raises(ValueError, match=">= 0"):
        budget_select(ray.data.from_items(items), "score", "size", -1)
