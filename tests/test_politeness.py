"""Politeness tests: robots parsing, longest-match precedence,
logical-clock slot assignment, budget admission."""

import pyarrow as pa

from scrape_ray.state.politeness import (
    PolitenessStage,
    RobotsPolicy,
    RobotsProvider,
    parse_robots_txt,
)


def test_parse_robots_basic():
    pol = parse_robots_txt(
        "User-agent: googlebot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n"
        "Crawl-delay: 2.5\n# comment\n"
    )
    assert pol.crawl_delay == 2.5
    assert pol.disallow == ("/private/",)
    assert pol.allow == ("/private/ok/",)
    assert not pol.allowed("/private/x")
    assert pol.allowed("/private/ok/y")  # longest match wins
    assert pol.allowed("/doc/1")


def test_robots_default_permissive():
    pol = RobotsPolicy()
    assert pol.allowed("/anything")
    prov = RobotsProvider()
    assert prov.policy("nohost.example").allowed("/x")


def test_slot_assignment_per_host():
    prov = RobotsProvider(
        lambda h: "User-agent: *\nCrawl-delay: 2\nDisallow: /private/\n"
    )
    stage = PolitenessStage(prov, epoch_budget=float("inf"))
    t = pa.table(
        {
            "url": pa.array(
                [
                    "https://a.com/doc/3",
                    "https://a.com/doc/1",
                    "https://b.com/doc/2",
                    "https://a.com/private/9",
                ]
            ),
            "seed_seq": pa.array([3, 1, 2, 0], pa.int64()),
        }
    )
    out = stage(t).to_pandas().set_index("url")
    # a.com admitted rows ranked by seed_seq: doc/1 (seq1)→slot0, doc/3 (seq3)→slot2
    assert out.loc["https://a.com/doc/1", "fetch_slot"] == 0.0
    assert out.loc["https://a.com/doc/3", "fetch_slot"] == 2.0
    assert out.loc["https://b.com/doc/2", "fetch_slot"] == 0.0
    assert not out.loc["https://a.com/private/9", "robots_allowed"]
    assert out.loc["https://a.com/private/9", "fetch_slot"] == -1.0


def test_budget_admission_and_deferral():
    prov = RobotsProvider(lambda h: "User-agent: *\nCrawl-delay: 1\n")
    stage = PolitenessStage(prov, epoch_budget=2.0)
    t = pa.table(
        {
            "url": pa.array([f"https://h.com/doc/{i}" for i in range(5)]),
            "seed_seq": pa.array(range(5), pa.int64()),
        }
    )
    out = stage(t).to_pandas()
    # slots 0,1 admitted (< 2.0); 2,3,4 deferred
    assert out["admitted"].sum() == 2
    assert out[out["admitted"]]["seed_seq"].tolist() == [0, 1]
    assert out["robots_allowed"].all()


def test_determinism_shuffled_input():
    prov = RobotsProvider(lambda h: "User-agent: *\nCrawl-delay: 3\n")
    stage = PolitenessStage(prov)
    urls = [f"https://h.com/doc/{i}" for i in range(10)]
    seqs = list(range(10))
    fwd = stage(
        pa.table({"url": pa.array(urls), "seed_seq": pa.array(seqs, pa.int64())})
    ).to_pandas()
    rev = stage(
        pa.table(
            {"url": pa.array(urls[::-1]), "seed_seq": pa.array(seqs[::-1], pa.int64())}
        )
    ).to_pandas()
    a = fwd.sort_values("seed_seq")["fetch_slot"].tolist()
    b = rev.sort_values("seed_seq")["fetch_slot"].tolist()
    assert a == b == [i * 3.0 for i in range(10)]


def test_priority_queue_ordering():
    """O3 due-first: lower priority value wins the earlier slot; ties
    fall back to seed_seq FIFO."""
    import pyarrow as pa

    prov = RobotsProvider(lambda h: "User-agent: *\nCrawl-delay: 1\n")
    stage = PolitenessStage(prov)
    t = pa.table(
        {
            "url": pa.array([f"https://h.com/doc/{i}" for i in range(4)]),
            "seed_seq": pa.array([0, 1, 2, 3], pa.int64()),
            "priority": pa.array([5, 0, 0, 1], pa.int64()),
        }
    )
    out = stage(t).to_pandas().set_index("seed_seq")["fetch_slot"]
    # priority 0 rows first (seq 1 then 2), then priority 1 (seq 3),
    # then priority 5 (seq 0)
    assert out[1] == 0.0 and out[2] == 1.0 and out[3] == 2.0 and out[0] == 3.0


def test_salted_equals_unsalted(ray_session):
    """The skew-proof two-phase rank must produce exactly the same
    verdicts and slots as the per-host exchange."""
    import pyarrow as pa
    import ray.data

    from scrape_ray.sources.frontier_gen import (
        crawl_seed_urls,
        robots_txt_for,
    )
    from scrape_ray.state.politeness import (
        apply_politeness,
        apply_politeness_salted,
    )

    urls = crawl_seed_urls("/root/testdata/sf0.001")
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "seed_seq": pa.array(range(len(urls)), pa.int64()),
        }
    )
    prov = robots_txt_for
    base = ray.data.from_arrow(t)
    a = (
        apply_politeness(base, RobotsProvider(prov), epoch_budget=50.0)
        .to_pandas()
        .sort_values("seed_seq")
        .reset_index(drop=True)
    )
    b = (
        apply_politeness_salted(
            base, RobotsProvider(prov), epoch_budget=50.0, salt_width=37
        )
        .to_pandas()
        .sort_values("seed_seq")
        .reset_index(drop=True)
    )
    assert a["robots_allowed"].tolist() == b["robots_allowed"].tolist()
    assert a["fetch_slot"].tolist() == b["fetch_slot"].tolist()
    assert a["admitted"].tolist() == b["admitted"].tolist()
    # the hot host really was split across many salt ranges
    n_host0 = sum("host0.example.com" in u for u in urls)
    assert n_host0 // 37 > 3


def test_salted_offsets_are_arrays_not_dicts(ray_session):
    """VERDICT r4 #3: the salted path's broadcast offset state must be
    flat 16-byte-per-triple arrays, never Python objects — asserted on
    a many-host frontier with priorities, plus exact equality with the
    unsalted path."""
    import pyarrow as pa
    import ray.data

    from scrape_ray.state.politeness import (
        apply_politeness,
        apply_politeness_salted,
    )

    n = 4_000
    urls = [f"https://h{i % 97}.example.com/p/{i}" for i in range(n)]
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "seed_seq": pa.array(range(n), pa.int64()),
        "priority": pa.array([i % 3 for i in range(n)], pa.int64()),
    })
    base = ray.data.from_arrow(t).repartition(8)
    prov = RobotsProvider(lambda h: "User-agent: *\nCrawl-delay: 2\n")

    stats: dict = {}
    b = (
        apply_politeness_salted(base, prov, salt_width=64, stats=stats)
        .to_pandas().sort_values("seed_seq").reset_index(drop=True)
    )
    a = (
        apply_politeness(base, prov)
        .to_pandas().sort_values("seed_seq").reset_index(drop=True)
    )
    assert a["fetch_slot"].tolist() == b["fetch_slot"].tolist()
    assert a["robots_allowed"].tolist() == b["robots_allowed"].tolist()
    # ~97 hosts x 3 prios x ceil(4000/64) salt ranges intersected with
    # actual rows -> a few thousand triples, 16 bytes each
    assert stats["n_triples"] > 97
    assert stats["offsets_nbytes"] == 16 * stats["n_triples"]
    assert stats["offsets_nbytes"] < 200_000  # flat arrays, not objects


def test_robots_wildcard_patterns():
    """Google-style * and $ wildcards with longest-pattern precedence
    (Allow wins length ties)."""
    from scrape_ray.state.politeness import RobotsPolicy, parse_robots_txt

    p = RobotsPolicy(disallow=("/*.pdf$", "/private*", "/tmp/"),
                     allow=("/private/ok",))
    assert not p.allowed("/docs/file.pdf")
    assert p.allowed("/docs/file.pdfx")          # $ anchors the end
    assert not p.allowed("/private/secret")
    assert p.allowed("/private/ok/page")         # longer Allow wins
    assert not p.allowed("/tmp/x")
    assert p.allowed("/pub/file.html")

    # * spans path segments; parse round-trip keeps patterns verbatim
    pol = parse_robots_txt(
        "User-agent: *\nDisallow: /a/*/c\nAllow: /a/b/c$\nCrawl-delay: 2\n"
    )
    assert pol.crawl_delay == 2.0
    assert not pol.allowed("/a/x/c/d")
    assert pol.allowed("/a/b/c")                 # Allow exact, len tie -> allow
    assert pol.allowed("/a/b")


def test_stage_one_pass_ranking_equals_per_host_scan(ray_session):
    """The lexsort+segment ranking must reproduce the old per-host
    np.where rescan exactly on a many-host partition with mixed
    priorities, disallowed paths, and per-host crawl delays."""
    import numpy as np
    import pyarrow as pa

    from scrape_ray.state.politeness import (
        PolitenessStage,
        RobotsProvider,
    )

    rng = np.random.RandomState(11)
    n = 600
    hosts = [f"h{i}.example" for i in rng.randint(0, 80, n)]
    urls = [
        f"https://{h}/{'private' if rng.rand() < 0.2 else 'page'}/{i}"
        for i, h in enumerate(hosts)
    ]
    order = rng.permutation(n).astype(np.int64)
    prio = rng.randint(0, 3, n).astype(np.int64)
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "seed_seq": pa.array(order),
        "priority": pa.array(prio),
    })

    def fetch_fn(host):
        # vary crawl delay per host; disallow /private everywhere
        d = 1 + (hash(host) % 3)
        return f"User-agent: *\nDisallow: /private\nCrawl-delay: {d}\n"

    out = PolitenessStage(RobotsProvider(fetch_fn), epoch_budget=5.0)(t)

    # reference: the old per-host scan
    from urllib.parse import urlsplit

    robots = RobotsProvider(fetch_fn)
    hosts_np = np.array([urlsplit(u).hostname or "" for u in urls])
    paths = [urlsplit(u).path or "/" for u in urls]
    allowed = np.zeros(n, dtype=bool)
    slots = np.full(n, -1.0)
    for h in np.unique(hosts_np):
        pol = robots.policy(h)
        idx = np.where(hosts_np == h)[0]
        ok = np.array([pol.allowed(paths[i]) for i in idx])
        allowed[idx] = ok
        adm = idx[ok]
        sort_idx = np.lexsort((order[adm], prio[adm]))
        rank = np.empty(len(adm), dtype=np.int64)
        rank[sort_idx] = np.arange(len(adm))
        slots[adm] = rank * pol.crawl_delay
    admitted = allowed & (slots < 5.0) & (slots >= 0)

    assert out["robots_allowed"].to_pylist() == allowed.tolist()
    assert out["fetch_slot"].to_pylist() == slots.tolist()
    assert out["admitted"].to_pylist() == admitted.tolist()


def test_hosts_paths_differential_vs_urlsplit():
    """_hosts_paths (RE2 fast path + scalar fallback) must be
    bit-identical to stdlib urlsplit semantics for every shape: fast
    rows, userinfo, IPv6 brackets, embedded tab/CR/LF (bpo-43882),
    schemeless, ports, empty, unicode, query/fragment cuts."""
    from urllib.parse import urlsplit

    from scrape_ray.state.politeness import _hosts_paths

    urls = [
        "http://example.com/a/b?q=1#f",
        "https://EXAMPLE.org",                      # no path, upper host
        "https://example.com:8080/x",               # port
        "http://user:pw@example.com/secret",        # userinfo
        "http://[2001:db8::1]:443/v6",              # IPv6 + port
        "http://exa\tmple.com/pa\nth",              # bpo-43882 stripping
        "ftp+ssh://odd.scheme/x",                   # exotic scheme
        "//protocol-relative.com/p",                # no scheme
        "not a url at all",
        "",
        "http://",                                  # empty netloc
        "https://xn--bcher-kva.example/päth?ä=ö",   # idn + unicode path
        "http://example.com/%2F/enc?x#y",
        "mailto:someone@example.com",               # no netloc scheme
        "http://example.com\r/trail",
    ]
    col = pa.array(urls, type=pa.string())
    hosts, paths = _hosts_paths(col)
    for i, u in enumerate(urls):
        p = urlsplit(u)
        assert hosts[i] == (p.hostname or ""), (u, hosts[i], p.hostname)
        assert paths[i] == (p.path or "/"), (u, paths[i], p.path)
    # want_hosts=False returns None hosts but identical paths
    none_hosts, paths2 = _hosts_paths(col, want_hosts=False)
    assert none_hosts is None
    assert list(paths2) == list(paths)
