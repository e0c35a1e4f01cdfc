"""Per-host politeness buckets + robots.txt rules — the north-rule
pacing layer the reference only roadmaps ("Outbound request pacing",
/root/reference/README.md:513-517; its ``domain_settings`` table is the
per-host policy hook this generalizes,
/root/reference/internal/settings/domain.go:43-49).

Determinism contract (SURVEY.md §7.4.2): politeness is enforced on a
**logical clock**, never wall time. Within an epoch, each host's
admitted fetches are ordered by ``seed_seq`` and assigned
``fetch_slot = rank_in_host * crawl_delay(host)`` (seconds of logical
time). Rows whose slot falls past the epoch budget are *deferred* to
the next epoch instead of sleeping — the crawl never blocks a worker,
and the admitted set + emission order are pure functions of the input.

Robots rules: no network in this sandbox, so rules come from a
``RobotsProvider`` (host → RobotsPolicy). The default provider parses
robots.txt text from a host→bytes mapping; the crawl pipeline uses the
deterministic synthetic provider in sources/frontier_gen. Parsing
covers the User-agent/Disallow/Allow/Crawl-delay subset (longest-match
precedence, Google-style).
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa


from functools import lru_cache


@lru_cache(maxsize=4096)
def _rule_regex(pattern: str):
    """Google-style robots path pattern → compiled regex: ``*`` spans
    any characters, a trailing ``$`` anchors end-of-path, everything
    else is literal; match is start-anchored prefix otherwise."""
    import re as _re

    end = pattern.endswith("$")
    body = pattern[:-1] if end else pattern
    rx = "".join(".*" if c == "*" else _re.escape(c) for c in body)
    return _re.compile(rx + (r"\Z" if end else ""))


def _rule_matches(pattern: str, path: str) -> bool:
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)  # fast path: plain prefix
    return _rule_regex(pattern).match(path) is not None


@dataclass(frozen=True)
class RobotsPolicy:
    """Parsed robots rules for one host (agent-group ``*``)."""

    disallow: tuple[str, ...] = ()
    allow: tuple[str, ...] = ()
    crawl_delay: float = 1.0

    def allowed(self, path: str) -> bool:
        """Longest-pattern-wins between Allow and Disallow (Google
        precedence: rule specificity = pattern length, Allow wins
        ties); ``*``/``$`` wildcards supported; no match ⇒ allowed."""
        best_len, best_allow = -1, True
        for p in self.disallow:
            if p and len(p) > best_len and _rule_matches(p, path):
                best_len, best_allow = len(p), False
        for p in self.allow:
            if p and len(p) >= best_len and _rule_matches(p, path):
                best_len, best_allow = len(p), True
        return best_allow


def parse_robots_txt(text: str, default_delay: float = 1.0) -> RobotsPolicy:
    """Minimal robots.txt parser: the ``User-agent: *`` group's
    Disallow/Allow/Crawl-delay lines."""
    disallow: list[str] = []
    allow: list[str] = []
    delay = default_delay
    in_star = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        k, v = line.split(":", 1)
        k, v = k.strip().lower(), v.strip()
        if k == "user-agent":
            in_star = v == "*"
        elif in_star and k == "disallow":
            if v:
                disallow.append(v)
        elif in_star and k == "allow":
            if v:
                allow.append(v)
        elif in_star and k == "crawl-delay":
            try:
                delay = float(v)
            except ValueError:
                pass
    return RobotsPolicy(tuple(disallow), tuple(allow), delay)


class RobotsProvider:
    """host → RobotsPolicy with per-instance memo cache. Subclass /
    pass ``fetch_fn(host) -> str | None`` for other rule sources; None
    ⇒ permissive default (no robots file)."""

    def __init__(self, fetch_fn=None, default_delay: float = 1.0) -> None:
        self._fetch = fetch_fn or (lambda host: None)
        self._default = RobotsPolicy(crawl_delay=default_delay)
        self._cache: dict[str, RobotsPolicy] = {}

    def policy(self, host: str) -> RobotsPolicy:
        pol = self._cache.get(host)
        if pol is None:
            txt = self._fetch(host)
            pol = self._default if txt is None else parse_robots_txt(
                txt, self._default.crawl_delay
            )
            self._cache[host] = pol
        return pol


@dataclass
class HostBucket:
    """Logical-clock token bucket for one host: next free slot in
    logical seconds. Carried across epochs via the frontier manifest."""

    next_slot: float = 0.0
    fetched: int = 0


class PolitenessStage:
    """Actor-pool ``map_batches`` stage over host-grouped batches.

    Input rows must arrive grouped per host (the crawl pipeline feeds
    it via ``groupby(host).map_groups`` or sorted host-shard
    partitions). Adds columns:

    - ``robots_allowed`` (bool): path passes the host's robots rules
    - ``fetch_slot`` (float64): logical fetch time; -1 for disallowed
    - ``admitted`` (bool): slot < epoch_budget (deferred otherwise)

    Robots cache built once per actor in ``__init__`` (A9 / A1
    analog); slot assignment is vectorized per host group.
    """

    def __init__(
        self,
        robots_provider: RobotsProvider | None = None,
        epoch_budget: float = float("inf"),
        order_col: str = "seed_seq",
        priority_col: str = "priority",
    ) -> None:
        self.robots = robots_provider or RobotsProvider()
        self.epoch_budget = epoch_budget
        self.order_col = order_col
        self.priority_col = priority_col

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t
        urls = t["url"].to_pylist()
        order = t[self.order_col].to_numpy()
        # priority-queue semantics (O3 due-first): lower priority value
        # = more urgent; ties broken by seed_seq. Absent column ⇒ FIFO.
        if self.priority_col in t.column_names:
            prio = t[self.priority_col].to_numpy()
        else:
            prio = np.zeros(n, dtype=np.int64)
        if "hostname_full" in t.column_names:
            # upstream exchange already extracted hosts — reuse
            hosts = np.array(
                [h or "" for h in t["hostname_full"].to_pylist()]
            )
            paths = [urlsplit(u).path or "/" for u in urls]
        else:
            parsed = [urlsplit(u) for u in urls]
            hosts = np.array([p.hostname or "" for p in parsed])
            paths = [p.path or "/" for p in parsed]

        # ONE pass over the partition: encode hosts to dense ids, look
        # up each policy once, then rank every host's admitted rows via
        # a single lexsort + segment-boundary subtraction. The previous
        # per-host ``np.where(hosts == h)`` rescan was O(hosts × rows)
        # per partition — quadratic-ish at crawl scale, where one
        # partition holds thousands of hosts.
        uniq_hosts, hid = np.unique(hosts, return_inverse=True)
        pols = [self.robots.policy(h) for h in uniq_hosts]
        delays = np.array([p.crawl_delay for p in pols], dtype=np.float64)
        # robots path matching is per-row string logic (rule lists are
        # tiny); the policy OBJECT lookup is O(1) via the dense id
        allowed = np.fromiter(
            (pols[hid[i]].allowed(paths[i]) for i in range(n)),
            dtype=bool,
            count=n,
        )
        slots = np.full(n, -1.0)
        adm = np.flatnonzero(allowed)
        if len(adm):
            # group by host, order by (priority, seed_seq) within host
            srt = np.lexsort((order[adm], prio[adm], hid[adm]))
            h_sorted = hid[adm][srt]
            seg_start = np.concatenate(
                [[0], np.flatnonzero(h_sorted[1:] != h_sorted[:-1]) + 1]
            )
            seg_len = np.diff(np.concatenate([seg_start, [len(h_sorted)]]))
            rank_sorted = np.arange(len(h_sorted)) - np.repeat(seg_start, seg_len)
            slots[adm[srt]] = rank_sorted * delays[h_sorted]
        admitted = allowed & (slots < self.epoch_budget) & (slots >= 0)
        t = t.append_column("robots_allowed", pa.array(allowed))
        t = t.append_column("fetch_slot", pa.array(slots, pa.float64()))
        t = t.append_column("admitted", pa.array(admitted))
        return t


def apply_politeness(
    ds,
    robots_provider: RobotsProvider | None = None,
    epoch_budget: float = float("inf"),
    order_col: str = "seed_seq",
    host_col: str = "hostname_full",
    num_parts: int = 64,
    dedup_key: str | None = None,
):
    """Assign robots verdicts + logical fetch slots. ONE coarse
    exchange: hosts hash into ``num_parts`` partitions (co-locating
    each host's rows so slot ranks are global per host), then the
    per-host ranking runs vectorized inside each task — the UDF fires
    num_parts times, not once per host (millions of hosts at crawl
    scale). At 100 TB the partition key folds into ``host_shard``
    (key's top bits), making this exchange shard-local.

    ``dedup_key``: optional column (the 63-bit url key) to exact-dedup
    on INSIDE the same exchange — duplicate URLs share a host, so
    their rows land in the same partition and a per-partition
    keep-first (by ``order_col``) equals a global dedup. Fuses the
    crawl's D1 dedup with the politeness shuffle (one all-to-all
    instead of two)."""
    import pandas as pd

    stage = PolitenessStage(robots_provider, epoch_budget, order_col)

    def _add_host(t: pa.Table) -> pa.Table:
        from scrape_ray.functions.keys import fnv1a64

        hosts = [urlsplit(u).hostname or "" for u in t["url"].to_pylist()]
        h = fnv1a64([x.encode() for x in hosts])
        t = t.append_column(host_col, pa.array(hosts, pa.string()))
        return t.append_column(
            "__part", pa.array((h % num_parts).astype("int32"))
        )

    def _per_part(g: pd.DataFrame) -> pd.DataFrame:
        if dedup_key is not None:
            g = g.sort_values([dedup_key, order_col], kind="mergesort")
            g = g.drop_duplicates(subset=[dedup_key], keep="first")
        out = stage(
            pa.Table.from_pandas(g.drop(columns="__part"), preserve_index=False)
        )
        return out.to_pandas()

    with_host = ds.map_batches(_add_host, batch_format="pyarrow", batch_size=None)
    return with_host.groupby("__part").map_groups(_per_part, batch_format="pandas")


def apply_politeness_salted(
    ds,
    robots_provider: RobotsProvider | None = None,
    epoch_budget: float = float("inf"),
    order_col: str = "seed_seq",
    priority_col: str = "priority",
    salt_width: int = 1024,
    num_parts: int = 64,
):
    """Skew-proof politeness: identical output to ``apply_politeness``
    but no single task ever holds a whole hot host.

    A 40%-of-the-crawl host (the reference's real seed corpus shape,
    internal/testdata/global_urls.csv) makes the per-host exchange
    skewed: one partition gets 40% of the rows. This variant SALTS the
    hot key — a distributed rank in two phases:

    1. rows exchange on (host, priority, seed_seq // salt_width): each
       salt range ranks independently (ordering within a range is by
       seed_seq, and ranges are disjoint, ordered slices of the global
       (priority, seed_seq) order);
    2. the per-(host, priority, salt) ALLOWED counts — a table ~rows /
       salt_width, tiny next to the data — come back to the driver,
       prefix-sums give each range its global offset, and the offsets
       broadcast (``ray.put``) into a final stateless map:
       ``slot = (offset + local_rank) * crawl_delay``.

    Deterministic and equal to the unsalted path (equality test in
    tests/test_politeness.py)."""
    import pandas as pd
    import ray

    robots = robots_provider or RobotsProvider()

    def _add_keys(t: pa.Table) -> pa.Table:
        from scrape_ray.functions.keys import fnv1a64

        urls = t["url"].to_pylist()
        hosts = [urlsplit(u).hostname or "" for u in urls]
        order = t[order_col].to_numpy()
        salt = (order // salt_width).astype(np.int64)
        if priority_col in t.column_names:
            prio = t[priority_col].to_numpy()
        else:
            prio = np.zeros(len(urls), dtype=np.int64)
        h = fnv1a64([x.encode() for x in hosts])
        part = ((h ^ salt.astype(np.uint64) ^ (prio.astype(np.uint64) << np.uint64(32)))
                % num_parts).astype(np.int32)
        t = t.append_column("hostname_full", pa.array(hosts, pa.string()))
        t = t.append_column("__salt", pa.array(salt, pa.int64()))
        t = t.append_column("__prio", pa.array(prio, pa.int64()))
        return t.append_column("__part", pa.array(part))

    def _local_rank(g: pd.DataFrame) -> pd.DataFrame:
        """One pass per partition (same treatment as PolitenessStage):
        one lexsort groups rows by (host, prio, salt) and orders them
        by seed_seq; local ranks come from a cumulative count of
        allowed rows minus each segment's base — no per-group rescan."""
        n = len(g)
        if n == 0:
            return g.assign(
                robots_allowed=pd.Series(dtype=bool),
                __local_rank=pd.Series(dtype="int64"),
            )
        hosts = g["hostname_full"].to_numpy()
        prio = g["__prio"].to_numpy()
        salt = g["__salt"].to_numpy()
        order = g[order_col].to_numpy()
        uniq_hosts, hid = np.unique(hosts, return_inverse=True)
        pols = [robots.policy(h) for h in uniq_hosts]
        paths = [urlsplit(u).path or "/" for u in g["url"]]
        allowed = np.fromiter(
            (pols[hid[i]].allowed(paths[i]) for i in range(n)),
            dtype=bool,
            count=n,
        )
        srt = np.lexsort((order, salt, prio, hid))
        hs, ps, ss = hid[srt], prio[srt], salt[srt]
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = (hs[1:] != hs[:-1]) | (ps[1:] != ps[:-1]) | (ss[1:] != ss[:-1])
        adm_sorted = allowed[srt]
        cum = np.cumsum(adm_sorted)  # allowed rows seen so far (1-based)
        seg_id = np.cumsum(new_seg) - 1
        seg_base = np.concatenate([[0], cum[:-1]])[new_seg]  # allowed before seg
        local = (cum - 1) - seg_base[seg_id]
        lr_sorted = np.where(adm_sorted, local, -1)
        lr = np.empty(n, dtype=np.int64)
        lr[srt] = lr_sorted
        return g.assign(robots_allowed=allowed, __local_rank=lr)

    keyed = ds.map_batches(_add_keys, batch_format="pyarrow", batch_size=None)
    ranked = keyed.groupby("__part").map_groups(_local_rank, batch_format="pandas")
    ranked = ranked.materialize()

    # phase 2: tiny counts table → per-range global offsets
    from ray.data.aggregate import Count

    counts = (
        ranked.filter(expr="robots_allowed == True")
        .groupby(["hostname_full", "__prio", "__salt"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    counts = counts.sort_values(["hostname_full", "__prio", "__salt"])
    counts["offset"] = (
        counts.groupby("hostname_full")["n"].cumsum() - counts["n"]
    )
    offsets = {
        (h, p, s): o
        for h, p, s, o in zip(
            counts["hostname_full"], counts["__prio"], counts["__salt"],
            counts["offset"],
        )
    }
    off_ref = ray.put(offsets)

    def _finalize(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        hosts = np.asarray(t["hostname_full"].to_pylist(), dtype=object)
        prios = t["__prio"].to_numpy()
        salts = t["__salt"].to_numpy()
        lr = t["__local_rank"].to_numpy()
        allowed = t["robots_allowed"].to_numpy(zero_copy_only=False)
        # Python lookups (offset dict, robots policy) only per UNIQUE
        # (host, prio, salt) triple — the row-wise math is numpy
        trip = pd.MultiIndex.from_arrays([hosts, prios, salts])
        codes, uniqs = pd.factorize(trip)
        base_u = np.fromiter(
            (off.get((h, int(p), int(s)), 0) for h, p, s in uniqs),
            dtype=np.float64,
            count=len(uniqs),
        )
        delay_u = np.fromiter(
            (robots.policy(h).crawl_delay for h, _, _ in uniqs),
            dtype=np.float64,
            count=len(uniqs),
        )
        slots = np.where(
            allowed, (base_u[codes] + lr) * delay_u[codes], -1.0
        )
        admitted = allowed & (slots >= 0) & (slots < epoch_budget)
        t = t.append_column("fetch_slot", pa.array(slots, pa.float64()))
        t = t.append_column("admitted", pa.array(admitted))
        return t.drop_columns(["__salt", "__prio", "__local_rank", "__part"])

    return ranked.map_batches(_finalize, batch_format="pyarrow", batch_size=None)
