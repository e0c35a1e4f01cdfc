"""Resumable partitioned sink: per-partition _SUCCESS commit, skip of
finished partitions on re-run, pruning of crashed-run debris."""

import os
import shutil
import tempfile

import pyarrow as pa
import pytest
import ray.data

from scrape_ray.sinks import (
    committed_partitions,
    read_partitioned,
    write_partitioned,
)


def _mk_ds(n=80, parts=8):
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "pk": pa.array([i % parts for i in range(n)], pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(n)]),
        }
    )
    return ray.data.from_arrow(t)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="scrape_ray_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_write_commits_every_partition(ray_session, root):
    stats = write_partitioned(_mk_ds(), root, "pk")
    assert stats == {
        "written_partitions": 8,
        "skipped_partitions": 0,
        "pruned_partitions": 0,
    }
    assert len(committed_partitions(root, "pk")) == 8
    back = read_partitioned(root, "pk").to_pandas()
    assert len(back) == 80
    assert sorted(back["doc_id"]) == list(range(80))


def test_rerun_skips_committed_and_prunes_debris(ray_session, root):
    write_partitioned(_mk_ds(), root, "pk")
    # simulate a crash: partition 3 lost its marker mid-write and holds
    # a stale partial file that MUST not double-count after resume
    crashed = os.path.join(root, "pk=3")
    os.remove(os.path.join(crashed, "_SUCCESS"))
    committed_before = {
        v: os.path.getmtime(p)
        for v, p in committed_partitions(root, "pk").items()
    }
    assert "3" not in committed_before

    stats = write_partitioned(_mk_ds(), root, "pk")
    assert stats["written_partitions"] == 1  # only the crashed one
    assert stats["skipped_partitions"] == 7
    assert stats["pruned_partitions"] == 1
    # committed partitions untouched (no rewrite, no append)
    for v, p in committed_partitions(root, "pk").items():
        if v != "3":
            assert os.path.getmtime(p) == committed_before[v]
    back = read_partitioned(root, "pk").to_pandas()
    assert len(back) == 80  # exactly once — no dup rows from the resume
    assert sorted(back["doc_id"]) == list(range(80))


def test_skip_existing_false_rewrites_all(ray_session, root):
    write_partitioned(_mk_ds(), root, "pk")
    stats = write_partitioned(_mk_ds(n=40, parts=4), root, "pk",
                              skip_existing=False)
    assert stats["pruned_partitions"] == 8
    assert stats["written_partitions"] == 4
    back = read_partitioned(root, "pk").to_pandas()
    assert len(back) == 40


def test_reader_ignores_uncommitted(ray_session, root):
    write_partitioned(_mk_ds(), root, "pk")
    os.remove(os.path.join(root, "pk=5", "_SUCCESS"))
    back = read_partitioned(root, "pk").to_pandas()
    assert len(back) == 70  # 8 partitions x 10 rows minus the torn one
    assert not (back["pk"] == 5).any()
