"""User-extension surface — the Ray-native analog of the reference's
interface + functional-option pattern (SURVEY.md §2.10:
fetch.URLFetcher/Client interfaces fetch/fetch.go:29-44,
fetch/client.go:19-135; server assembly options
internal/server/api/server.go:28-77).

Stages are pluggable by shape, not registry magic:

- a **batch fn** is any ``Callable[[pa.Table], pa.Table]``
- a **stateful stage** is any class whose instances are batch fns
  (setup in ``__init__``, used with ``map_batches(Cls, concurrency=N)``)

The Protocols below document those shapes for type checkers; the
``PipelineBuilder`` is the option-function analog — an ordered list of
named steps assembled into one Dataset plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class BatchTransform(Protocol):
    """One stage: Arrow batch in → Arrow batch out."""

    def __call__(self, batch: pa.Table) -> pa.Table: ...


@runtime_checkable
class Fetcher(Protocol):
    """Adds html/status_code/content_type columns for a batch of urls
    (the fetch.URLFetcher analog). CorpusFetcher implements this."""

    def __call__(self, batch: pa.Table) -> pa.Table: ...


@runtime_checkable
class SeenSet(Protocol):
    """Membership + insert over uint64 keys (state/seen.py shapes)."""

    def contains(self, keys) -> Any: ...

    def add(self, keys) -> int: ...


class HeadlessFetcher:
    """A2 analog: browser-rendered fetching with a per-actor tab
    budget (the reference runs Chrome with MaxTabs(6) server-side,
    internal/headless/fetch_client.go:26-41). No browser exists in
    this environment, so the render kernel is pluggable:
    ``render_fn(url) -> bytes`` — pass a real Playwright/CDP call in
    production; the default raises NotImplementedError. The actor-pool
    plumbing (tab semaphore, batch loop, output schema) is real."""

    def __init__(self, max_tabs: int = 6, render_fn=None) -> None:
        self.max_tabs = max_tabs
        self.render = render_fn or self._no_browser

    @staticmethod
    def _no_browser(url: str) -> bytes:
        raise NotImplementedError(
            "no headless browser in this environment — pass render_fn"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        htmls, statuses = [], []
        # tab budget: at most max_tabs renders outstanding. The kernel
        # here is synchronous, so the budget degenerates to a chunked
        # loop; an async kernel would hold a semaphore instead.
        for i in range(0, len(urls), self.max_tabs):
            for u in urls[i : i + self.max_tabs]:
                htmls.append(self.render(u))
                statuses.append(200)
        t = t.append_column("html", pa.array(htmls, pa.binary()))
        t = t.append_column("status_code", pa.array(statuses, pa.int32()))
        t = t.append_column(
            "content_type", pa.array(["text/html"] * len(urls), pa.string())
        )
        # ClientIdentifier = chromium-headless (resource/fetch_method.go)
        t = t.append_column(
            "fetch_method", pa.array([2] * len(urls), pa.int8())
        )
        return t


def playwright_render_fn(
    timeout_s: float = 30.0,
    user_agent: str | None = None,
    wait_until: str = "load",
    proxy_url: str | None = None,
):
    """Real render kernel for ``HeadlessFetcher`` backed by Playwright
    Chromium (the reference drives real Chrome via CDP,
    internal/headless/fetch_client.go:26-41). OPTIONAL dependency:
    raises ImportError with install guidance where playwright is
    absent — the fetcher's default stub and all fake-kernel tests are
    unaffected.

    The browser launches lazily on FIRST render and is reused for the
    worker's lifetime (launch is ~1 s; per-URL cost is a tab). One
    page per render, closed in ``finally`` — the tab budget stays
    ``HeadlessFetcher.max_tabs``'s job."""
    try:
        from playwright.sync_api import sync_playwright  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "playwright is not installed; `pip install playwright && "
            "playwright install chromium` to enable headless rendering, "
            "or pass your own render_fn(url) -> bytes"
        ) from e

    state: dict = {}

    def _render(url: str) -> bytes:  # pragma: no cover - needs browser
        if "ctx" not in state:
            from playwright.sync_api import sync_playwright

            pw = sync_playwright().start()
            launch_kwargs = {}
            if proxy_url:
                launch_kwargs["proxy"] = {"server": proxy_url}
            browser = pw.chromium.launch(headless=True, **launch_kwargs)
            ctx = (
                browser.new_context(user_agent=user_agent)
                if user_agent
                else browser.new_context()
            )
            state.update(pw=pw, browser=browser, ctx=ctx)
        page = state["ctx"].new_page()
        try:
            page.goto(url, timeout=timeout_s * 1000, wait_until=wait_until)
            return page.content().encode("utf-8")
        finally:
            page.close()

    return _render


@dataclass
class Step:
    name: str
    fn: Any  # batch fn or callable class
    kwargs: dict = field(default_factory=dict)


@dataclass
class PipelineBuilder:
    """Ordered, named steps → one Dataset plan. The option-function
    analog: assemble, override, inspect by name."""

    steps: list[Step] = field(default_factory=list)

    def add(self, name: str, fn, **kwargs) -> "PipelineBuilder":
        self.steps.append(Step(name, fn, kwargs))
        return self

    def replace(self, name: str, fn, **kwargs) -> "PipelineBuilder":
        for i, s in enumerate(self.steps):
            if s.name == name:
                self.steps[i] = Step(name, fn, kwargs)
                return self
        raise KeyError(name)

    def build(self, ds):
        for s in self.steps:
            kw = {"batch_format": "pyarrow", "batch_size": None, **s.kwargs}
            ds = ds.map_batches(s.fn, **kw)
        return ds
