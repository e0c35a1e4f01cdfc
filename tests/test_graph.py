"""PageRank / node-degree operator tests against a pure-numpy
reference implementation on hand-built graphs."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_pagerank(edge_list, iterations=2, scale=1_000_000,
                  damp_num=85, damp_den=100):
    """Single-process int64 reference: same semantics as ops/graph.py."""
    src = np.array([e[0] for e in edge_list], dtype=np.int64)
    dst = np.array([e[1] for e in edge_list], dtype=np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    deg = {int(n): 0 for n in nodes}
    for s in src:
        deg[int(s)] += 1
    base = (scale * (damp_den - damp_num)) // damp_den
    r = {int(n): scale for n in nodes}
    for _ in range(iterations):
        s_in = {int(n): 0 for n in nodes}
        for s, d in zip(src, dst):
            s_in[int(d)] += r[int(s)] // deg[int(s)]
        r = {int(n): base + (damp_num * s_in[int(n)]) // damp_den
             for n in nodes}
    return r


def _edges_ds(ray, edge_list, parallelism=4):
    t = pa.table({
        "src": pa.array([e[0] for e in edge_list], pa.int64()),
        "dst": pa.array([e[1] for e in edge_list], pa.int64()),
    })
    import ray.data

    return ray.data.from_arrow(t).repartition(parallelism)


def test_node_degrees_counts_sinks(ray_session):
    from scrape_ray.ops.graph import node_degrees
    from scrape_ray.util import dataset_to_table

    # node 3 is a pure sink: must appear with outdeg 0
    edges = _edges_ds(ray_session, [(1, 2), (1, 3), (2, 3)])
    t = dataset_to_table(node_degrees(edges)).sort_by("node")
    assert t["node"].to_pylist() == [1, 2, 3]
    assert t["sum(outdeg)"].to_pylist() == [2, 1, 0]


@pytest.mark.parametrize("fold", ["driver", "exchange", "dataset"])
@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_pagerank_matches_reference(ray_session, iterations, fold):
    from scrape_ray.ops.graph import pagerank
    from scrape_ray.util import dataset_to_table

    # small directed graph with a cycle, a hub and a sink; both fold
    # paths must be bit-identical to the reference
    edge_list = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (4, 2),
                 (4, 3), (5, 4), (3, 6)]
    expect = _ref_pagerank(edge_list, iterations=iterations)
    got = dataset_to_table(
        pagerank(_edges_ds(ray_session, edge_list), iterations=iterations,
                 fold=fold)
    )
    ranks = dict(zip(got["node"].to_pylist(), got["rank"].to_pylist()))
    assert ranks == expect


def test_pagerank_hub_outranks_leaf(ray_session):
    """Sanity on the semantics: a node every other node points at
    ends with a strictly higher rank than a leaf nobody points at."""
    from scrape_ray.ops.graph import pagerank
    from scrape_ray.util import dataset_to_table

    star = [(i, 99) for i in range(1, 9)] + [(99, 1)]
    got = dataset_to_table(pagerank(_edges_ds(ray_session, star)))
    ranks = dict(zip(got["node"].to_pylist(), got["rank"].to_pylist()))
    # mass oscillates hub<->backlink on this near-bipartite star, so
    # only the leaf comparison is iteration-parity-stable
    assert ranks[99] > ranks[2] and ranks[1] > ranks[2]


def test_pagerank_many_blocks_with_empties(ray_session):
    """High parallelism (more blocks than rows in some stages) must
    not break the driver folds — the empty-block schema trap."""
    from scrape_ray.ops.graph import pagerank
    from scrape_ray.util import dataset_to_table

    edge_list = [(1, 2), (2, 1)]
    got = dataset_to_table(
        pagerank(_edges_ds(ray_session, edge_list, parallelism=16))
    )
    expect = _ref_pagerank(edge_list)
    ranks = dict(zip(got["node"].to_pylist(), got["rank"].to_pylist()))
    assert ranks == expect


def test_pagerank_dataset_fold_bounds_per_task_state(ray_session):
    """The 10^10-node contract (VERDICT r4 #1): with fold="dataset",
    ranks live as P co-partitioned shards — NO task and NOT the driver
    holds the full rank table. Asserted via the stats hook: ≥ 2 real
    shards, every shard strictly smaller than the node universe, and
    the shard sizes partition it exactly. Results stay bit-identical
    to the single-process int64 reference on a random multigraph."""
    from scrape_ray.ops.graph import pagerank
    from scrape_ray.util import dataset_to_table

    rng = np.random.default_rng(5)
    n_nodes = 2_000
    edge_list = list(zip(
        rng.integers(0, n_nodes, 30_000).tolist(),
        rng.integers(0, n_nodes, 30_000).tolist(),
    ))
    expect = _ref_pagerank(edge_list, iterations=3)

    stats: dict = {}
    got = dataset_to_table(
        pagerank(_edges_ds(ray_session, edge_list, parallelism=16),
                 iterations=3, fold="dataset", num_buckets=8, stats=stats)
    )
    ranks = dict(zip(got["node"].to_pylist(), got["rank"].to_pylist()))
    assert ranks == expect

    total = len(expect)
    shards = stats["bucket_nodes"]
    assert stats["fold"] == "dataset" and stats["P"] == 8
    assert sum(shards) == total  # shards PARTITION the node universe
    assert len([s for s in shards if s]) >= 2
    assert max(shards) < total  # no task ever held the full rank table
    # hash sharding should be roughly balanced on random int ids
    assert max(shards) < 2 * (total // stats["P"] + 1), shards


def test_pagerank_dataset_fold_empty_and_tiny(ray_session):
    """Edge cases through the sharded path: a 2-node cycle over more
    blocks than rows (empty-block schema trap) and P clamped to the
    block count."""
    from scrape_ray.ops.graph import pagerank
    from scrape_ray.util import dataset_to_table

    edge_list = [(1, 2), (2, 1)]
    got = dataset_to_table(
        pagerank(_edges_ds(ray_session, edge_list, parallelism=16),
                 fold="dataset")
    )
    expect = _ref_pagerank(edge_list)
    ranks = dict(zip(got["node"].to_pylist(), got["rank"].to_pylist()))
    assert ranks == expect


def test_inverted_index_postings(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import inverted_index
    from scrape_ray.util import dataset_to_table

    docs = pa.table({
        "doc_id": pa.array([10, 3, 7, 5], pa.int64()),
        "text": pa.array(
            ["the cat sat", "the the dog", "", "cat  cat\tdog"],
            pa.string(),
        ),
    })
    ds = ray.data.from_arrow(docs).repartition(4)
    t = dataset_to_table(inverted_index(ds)).sort_by("token")
    rows = {
        tok: (df, posting)
        for tok, df, posting in zip(
            t["token"].to_pylist(), t["df"].to_pylist(),
            t["posting"].to_pylist(),
        )
    }
    # df counts DISTINCT docs (doc 3 has "the" twice, doc 5 "cat" twice)
    assert rows == {
        "the": (2, "3,10"),
        "cat": (2, "5,10"),
        "sat": (1, "10"),
        "dog": (2, "3,5"),
    }


def test_inverted_index_df_min(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import inverted_index
    from scrape_ray.util import dataset_to_table

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b", "a c"], pa.string()),
    })
    ds = ray.data.from_arrow(docs)
    t = dataset_to_table(inverted_index(ds, df_min=2))
    assert t["token"].to_pylist() == ["a"]
    assert t["posting"].to_pylist() == ["1,2"]
