"""scrape_ray — a Ray-Data-native fetch+extract engine.

From-scratch reimplementation of what efixler/scrape computes (URL-keyed
storage-backed fetch + trafilatura-style extraction), re-expressed as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, with actor pools for stateful stages, a sharded cuckoo-filter
URL-seen set, per-host politeness budgets and an epoch-checkpointed
partitioned-Parquet frontier.

Library code never calls ``ray.init()`` / ``ray.shutdown()`` — the
caller (driver, bench.py, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"
