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
