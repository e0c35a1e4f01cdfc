"""Frontier-scale crawl rehearsal (VERDICT r4 "Next #9").

Drives ONE full crawl epoch — seed → dedup → seen-filter → politeness
→ fetch → extract → committed checkpoint — over an amplified frontier
(default sf0.1 × 2000 = 10 M rows, ~50× the bench scale) and reports
the bounds the north rule cares about before any real multi-node run:

- peak driver RSS (ru_maxrss) — the frontier must NEVER materialize
  on the driver; growth here is O(#blocks + counters), not O(rows);
- object-store spill totals (Ray memory summary) — the streaming
  executor is expected to spill under a 10 M-row epoch on one node,
  and the run must complete regardless;
- wall time / URLs per second for the whole epoch.

The frontier is synthesized DISTRIBUTED (map_batches over the docs
table, written via ``FrontierStore.write_frontier_ds``): each doc
yields REPEAT rows ``{base}?p={r}`` — distinct canonical URLs (CleanURL
keeps non-tracking params) that still resolve in the corpus transport
(path doc id unchanged). host_of's 50-host skew (host0 ≈ 40 % of rows)
is kept on purpose: the rehearsal exercises the hot-host politeness
path at frontier scale.

Usage: python tools/rehearse_frontier.py  (env: GRAFT_SF_DIR,
REHEARSE_REPEAT, RAY_GRAFT_CPUS). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("REHEARSE_REPEAT", "2000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> None:
    import pyarrow as pa
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from scrape_ray.functions.keys import key_columns
    from scrape_ray.pipelines.crawl import crawl, load_corpus_ref
    from scrape_ray.sources.frontier_gen import base_url, robots_txt_for
    from scrape_ray.state.frontier import FrontierStore
    from scrape_ray.state.politeness import RobotsProvider

    def _amplify(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        urls, seqs = [], []
        for d in ids:
            b = base_url(d)
            for r in range(REPEAT):
                urls.append(f"{b}?p={r}")
                seqs.append(d * REPEAT + r)
        key, shard = key_columns(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "seed_seq": pa.array(seqs, pa.int64()),
            "priority": pa.array([0] * len(urls), pa.int64()),
            "host_shard": shard,
        })

    root = tempfile.mkdtemp(prefix="scrape_ray_rehearse_")
    rss0_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    try:
        store = FrontierStore(root)
        t_seed = time.perf_counter()
        frontier = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id"],
            override_num_blocks=NUM_CPUS * 4,
        ).map_batches(_amplify, batch_format="pyarrow", batch_size=256)
        store.write_frontier_ds(frontier, epoch=0)
        seed_sec = time.perf_counter() - t_seed

        t0 = time.perf_counter()
        manifests = crawl(
            store,
            corpus_ref=load_corpus_ref(SF_DIR),
            robots_provider=RobotsProvider(robots_txt_for),
            num_seen_shards=8,
            max_epochs=1,
        )
        sec = time.perf_counter() - t0
        fetched = sum(m["counters"]["fetched"] for m in manifests)
        counters = manifests[0]["counters"] if manifests else {}

        spilled_mb = restored_mb = None
        try:
            from ray._private.internal_api import memory_summary

            summary = memory_summary(stats_only=True)
            for line in summary.splitlines():
                if "Spilled" in line and "MiB" in line:
                    spilled_mb = float(line.split("Spilled")[1].split("MiB")[0])
                if "Restored" in line and "MiB" in line:
                    restored_mb = float(
                        line.split("Restored")[1].split("MiB")[0])
        except Exception:
            summary = ""

        peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        print(json.dumps({
            "metric": "frontier_rehearsal_epoch_sec",
            "value": round(sec, 1),
            "unit": "sec",
            "sf_dir": SF_DIR,
            "repeat": REPEAT,
            "num_cpus": NUM_CPUS,
            "frontier_rows": 5000 * REPEAT if "sf0.1" in SF_DIR else None,
            "seed_write_sec": round(seed_sec, 1),
            "fetched": fetched,
            "urls_per_sec": round(fetched / sec, 1) if sec else None,
            "counters": {k: int(v) for k, v in counters.items()},
            "driver_rss_start_mb": round(rss0_kb / 1024, 1),
            "driver_rss_peak_mb": round(peak_kb / 1024, 1),
            "object_store_spilled_mb": spilled_mb,
            "object_store_restored_mb": restored_mb,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
