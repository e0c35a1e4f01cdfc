"""Resumable partitioned Parquet output — the write discipline the
100 TB brief mandates: one directory per partition-key value, each
committed with a ``_SUCCESS`` marker only after every file in it is
durably written, so a re-run of a failed job skips finished
partitions and redoes only the rest.

Protocol (the classic Hadoop-style per-partition commit):

1. Before writing, directories WITHOUT a marker are pruned — they are
   by definition debris of a crashed run (markers are written strictly
   after ``write_parquet`` returns, and parquet part files accumulate,
   so stale partials would double-count rows on re-read).
2. Rows whose partition value is already committed are filtered out
   INSIDE the streaming pipeline (broadcast value-set + ``pc.is_in``)
   — skipped partitions cost no compute, no I/O, and the filter never
   materializes the dataset.
3. The write itself is Ray Data's hive-partitioned ``write_parquet``
   (``partition_cols``): blocks stream straight from upstream
   operators to per-partition part files with no extra exchange.
4. Markers land after the write returns: at that point every
   partition of the filtered dataset is fully durable, and step 1
   guarantees any unmarked directory is exactly the set written by
   this run.

The crawl's :class:`~scrape_ray.state.frontier.FrontierStore` applies
the same idea at epoch granularity (manifest-after-write); this sink
is the generic, per-key-range version for curation/export pipelines.
Partition keys should be integers or plain strings (hive directory
names are the string form of the value)."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

_MARKER = "_SUCCESS"


def _partition_dirs(root: str, partition_col: str) -> dict[str, str]:
    """Map partition VALUE (string form) → directory path for every
    hive-style ``col=value`` directory under ``root``."""
    prefix = partition_col + "="
    if not os.path.isdir(root):
        return {}
    out = {}
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if d.startswith(prefix) and os.path.isdir(p):
            out[d[len(prefix):]] = p
    return out


def committed_partitions(root: str, partition_col: str) -> dict[str, str]:
    """Partition values already committed (directory carries the
    ``_SUCCESS`` marker) → their directory paths."""
    return {
        v: p
        for v, p in _partition_dirs(root, partition_col).items()
        if os.path.exists(os.path.join(p, _MARKER))
    }


def write_partitioned(ds, root: str, partition_col: str,
                      skip_existing: bool = True, **write_kwargs) -> dict:
    """Write ``ds`` to ``root`` partitioned by ``partition_col`` with
    per-partition commit markers; re-runs skip committed partitions.

    Returns ``{"written_partitions", "skipped_partitions",
    "pruned_partitions"}``. ``skip_existing=False`` discards all
    existing partitions first (full rewrite)."""
    os.makedirs(root, exist_ok=True)
    dirs = _partition_dirs(root, partition_col)
    committed = {
        v for v, p in dirs.items()
        if os.path.exists(os.path.join(p, _MARKER))
    }
    if not skip_existing:
        committed = set()
    pruned = 0
    for v, p in dirs.items():
        if v not in committed:
            shutil.rmtree(p, ignore_errors=True)
            pruned += 1

    if committed:
        vals = pa.array(sorted(committed), pa.string())

        def _drop_committed(t: pa.Table) -> pa.Table:
            sv = pc.cast(t[partition_col], pa.string())
            return t.filter(pc.invert(pc.is_in(sv, value_set=vals)))

        ds = ds.map_batches(
            _drop_committed, batch_format="pyarrow", batch_size=None
        )

    ds.write_parquet(root, partition_cols=[partition_col], **write_kwargs)

    written = 0
    for v, p in _partition_dirs(root, partition_col).items():
        marker = os.path.join(p, _MARKER)
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
            written += 1
    return {
        "written_partitions": written,
        "skipped_partitions": len(committed),
        "pruned_partitions": pruned,
    }


def read_partitioned(root: str, partition_col: str, **read_kwargs):
    """Read back ONLY committed partitions (uncommitted debris from a
    live or crashed writer is invisible to readers). Reads from the
    root so hive partition-column inference applies, then filters to
    the committed value set inside the stream."""
    import ray.data

    committed = sorted(committed_partitions(root, partition_col))
    if not committed:
        raise FileNotFoundError(f"no committed partitions under {root}")
    vals = pa.array(committed, pa.string())
    ds = ray.data.read_parquet(root, **read_kwargs)

    def _keep_committed(t: pa.Table) -> pa.Table:
        sv = pc.cast(t[partition_col], pa.string())
        return t.filter(pc.is_in(sv, value_set=vals))

    return ds.map_batches(
        _keep_committed, batch_format="pyarrow", batch_size=None
    )
