"""Extension-surface tests: protocols, pipeline builder, headless stub."""

import pyarrow as pa
import pytest

from scrape_ray.protocols import HeadlessFetcher, PipelineBuilder


def test_headless_stub_raises_without_browser():
    hf = HeadlessFetcher()
    t = pa.table({"url": pa.array(["https://a.com"])})
    with pytest.raises(NotImplementedError):
        hf(t)


def test_headless_with_fake_renderer():
    hf = HeadlessFetcher(max_tabs=2, render_fn=lambda u: f"<p>{u}</p>".encode())
    t = pa.table({"url": pa.array([f"https://a.com/{i}" for i in range(5)])})
    out = hf(t)
    assert out["html"][0].as_py() == b"<p>https://a.com/0</p>"
    assert out["status_code"].to_pylist() == [200] * 5


def test_pipeline_builder(ray_session):
    import ray.data

    def add_one(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(0, "x", pc.add(t["x"], 1))

    def double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(0, "x", pc.multiply(t["x"], 2))

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    pb = PipelineBuilder().add("inc", add_one).add("dbl", double)
    assert pb.build(ds).to_pandas()["x"].tolist() == [4, 6, 8]
    # option-style override by name
    pb.replace("dbl", add_one)
    assert pb.build(ds).to_pandas()["x"].tolist() == [3, 4, 5]
    with pytest.raises(KeyError):
        pb.replace("missing", add_one)


def test_protocol_shapes():
    from scrape_ray.protocols import BatchTransform, SeenSet
    from scrape_ray.state.seen import SeenShardState
    from scrape_ray.stages.extract import ExtractStage

    assert isinstance(ExtractStage(), BatchTransform)
    assert isinstance(SeenShardState(0), SeenSet)


def test_playwright_render_fn_optional_dependency():
    """Where playwright is absent, building the kernel raises a clear
    ImportError (and nothing else breaks); where it exists, the
    builder returns a callable without launching a browser."""
    import pytest

    from scrape_ray.protocols import playwright_render_fn

    try:
        import playwright  # noqa: F401
        has_pw = True
    except ImportError:
        has_pw = False

    if has_pw:
        fn = playwright_render_fn()
        assert callable(fn)  # browser launch is lazy — no render here
    else:
        with pytest.raises(ImportError, match="playwright"):
            playwright_render_fn()


@pytest.mark.skipif(
    not __import__("importlib").util.find_spec("playwright"),
    reason="playwright not installed in this environment",
)
def test_playwright_render_integration(ray_session):
    """Full HeadlessFetcher round-trip over a real browser — runs only
    where playwright + chromium exist (skipped in the sandbox)."""
    import pyarrow as pa

    from scrape_ray.protocols import HeadlessFetcher, playwright_render_fn

    f = HeadlessFetcher(max_tabs=2, render_fn=playwright_render_fn())
    out = f(pa.table({"url": pa.array(["https://example.com/"])}))
    assert out["status_code"][0].as_py() == 200
    assert b"<html" in out["html"][0].as_py().lower()
