"""Priority-queue frontier as epoch-committed partitioned Parquet.

The reference's incremental state is its cache DB — every completed
fetch is persisted before being considered seen
(/root/reference/internal/scrape.go:127-136); its ``feed_refresh``
table's due-first ordering index is the embryo of a priority frontier
(database/sqlite/migrations/00003_feed_refresh.sql:18-22). The north
rule scales that to a 10^10-URL frontier: partitioned Parquet epochs,
each committed atomically with lineage metadata, resumable exactly.

Layout under ``root/``:

    frontier/epoch=K/shard=S/part-*.parquet   pending URLs for epoch K
    out/epoch=K/...                           WebPage results of epoch K
    seen/epoch=K/seen-NNN.parquet             seen-set snapshots AFTER K
    manifests/epoch-K.json                    commit marker (atomic rename)

A manifest carries the north rule's lineage triple (frontier epoch,
host shards touched, checkpoint id) plus per-partition fetch/extract
counters. An epoch directory without its manifest is garbage from a
killed run: ``resume_scrub()`` deletes it, and the crawl loop restarts
from ``last_committed()+1`` with the seen shards restored from that
epoch's snapshot — byte-exact resume (north-rule requirement; stronger
than the reference, which can lose in-flight async saves,
internal/scrape_test.go:219-220).

Writes are one file per (epoch, shard) slice — never one giant file —
so a 256-node run commits partitions independently and a re-run skips
finished epochs wholesale.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

FRONTIER_COLUMNS = ("url", "seed_seq", "priority", "host_shard")


class FrontierStore:
    def __init__(self, root: str) -> None:
        self.root = root
        for d in ("frontier", "out", "seen", "manifests"):
            os.makedirs(os.path.join(root, d), exist_ok=True)

    # ------------------------------------------------------------ paths
    def frontier_dir(self, epoch: int) -> str:
        return os.path.join(self.root, "frontier", f"epoch={epoch}")

    def out_dir(self, epoch: int) -> str:
        return os.path.join(self.root, "out", f"epoch={epoch}")

    def seen_dir(self, epoch: int) -> str:
        return os.path.join(self.root, "seen", f"epoch={epoch}")

    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.root, "manifests", f"epoch-{epoch}.json")

    # --------------------------------------------------------- manifests
    def committed_epochs(self) -> list[int]:
        md = os.path.join(self.root, "manifests")
        out = []
        for f in os.listdir(md):
            if f.startswith("epoch-") and f.endswith(".json"):
                out.append(int(f[len("epoch-") : -len(".json")]))
        return sorted(out)

    def last_committed(self) -> int:
        eps = self.committed_epochs()
        return eps[-1] if eps else -1

    def read_manifest(self, epoch: int) -> dict:
        with open(self.manifest_path(epoch)) as f:
            return json.load(f)

    def commit(self, epoch: int, counters: dict, shards: list[int],
               extra: dict | None = None) -> dict:
        """Atomic commit marker: write manifest to a temp file, rename
        into place. Everything referenced (out partitions, next-epoch
        frontier, seen snapshots) must already be durably written."""
        manifest = {
            "epoch": epoch,
            "checkpoint_id": uuid.uuid4().hex,
            "host_shards": sorted(int(s) for s in shards),
            "counters": counters,
            **(extra or {}),
        }
        tmp = self.manifest_path(epoch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path(epoch))
        return manifest

    # ------------------------------------------------------------ writes
    def write_frontier_table(self, t: pa.Table, epoch: int) -> list[int]:
        """Write pending rows partitioned by host_shard; one file per
        shard slice. Returns the shard ids written."""
        d = self.frontier_dir(epoch)
        os.makedirs(d, exist_ok=True)
        if t.num_rows == 0:
            return []
        import pyarrow.compute as pc

        shards = pc.unique(t["host_shard"]).to_pylist()
        for s in shards:
            sub = t.filter(pc.equal(t["host_shard"], s))
            sd = os.path.join(d, f"shard={int(s)}")
            os.makedirs(sd, exist_ok=True)
            pq.write_table(
                sub, os.path.join(sd, f"part-{uuid.uuid4().hex[:8]}.parquet")
            )
        return [int(s) for s in shards]

    def write_frontier_ds(self, ds, epoch: int) -> None:
        """Dataset variant: streaming write partitioned by host_shard."""
        d = self.frontier_dir(epoch)
        os.makedirs(d, exist_ok=True)
        ds.write_parquet(d, partition_cols=["host_shard"])

    def write_output(self, ds, epoch: int) -> int:
        """Streaming write of the epoch's WebPage rows. Returns row
        count (from written file metadata — no driver materialize)."""
        d = self.out_dir(epoch)
        os.makedirs(d, exist_ok=True)
        ds.write_parquet(d)
        return self.count_rows(d)

    # ------------------------------------------------------------- reads
    @staticmethod
    def count_rows(directory: str) -> int:
        n = 0
        for root, _, files in os.walk(directory):
            for f in files:
                if f.endswith(".parquet"):
                    n += pq.read_metadata(os.path.join(root, f)).num_rows
        return n

    def has_frontier(self, epoch: int) -> bool:
        d = self.frontier_dir(epoch)
        if not os.path.isdir(d):
            return False
        return any(f.endswith(".parquet") for _, _, fs in os.walk(d) for f in fs)

    def read_frontier(self, epoch: int):
        """Pending rows of an epoch as a streaming Dataset."""
        import ray.data

        return ray.data.read_parquet(self.frontier_dir(epoch))

    def read_frontier_table(self, epoch: int) -> pa.Table:
        return pads.dataset(self.frontier_dir(epoch)).to_table()

    def read_output(self, epoch: int):
        import ray.data

        return ray.data.read_parquet(self.out_dir(epoch))

    # ------------------------------------------------------------ resume
    def resume_scrub(self) -> list[int]:
        """Delete epoch data not covered by a manifest (partial writes
        from a killed run). Returns the scrubbed epochs. The frontier
        partition of epoch last+1 was *written by* epoch last's commit,
        so it is preserved — only deeper uncommitted data goes."""
        last = self.last_committed()
        scrubbed = []
        for sub in ("out", "seen"):
            base = os.path.join(self.root, sub)
            for d in os.listdir(base):
                if d.startswith("epoch="):
                    ep = int(d.split("=", 1)[1])
                    if ep > last:
                        shutil.rmtree(os.path.join(base, d))
                        scrubbed.append(ep)
        base = os.path.join(self.root, "frontier")
        for d in os.listdir(base):
            if d.startswith("epoch="):
                ep = int(d.split("=", 1)[1])
                if ep > last + 1:
                    shutil.rmtree(os.path.join(base, d))
                    scrubbed.append(ep)
        return sorted(set(scrubbed))
