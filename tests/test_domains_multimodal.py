"""Domain-settings functions + multimodal stage plumbing tests."""

import numpy as np
import pytest

from scrape_ray.functions.domains import (
    canonical_mime_key,
    canonicalize_headers,
    expand_user_agent,
    fetch_method_from_text,
    fetch_method_to_text,
    fold_domain,
    match_domains,
    validate_domain,
    wildcard_to_regex,
)


# mirror of the reference's domain_test.go matrix shape
@pytest.mark.parametrize(
    "domain,ok",
    [
        ("example.com", True),
        ("sub.example.com", True),
        ("EXAMPLE.COM", True),  # folded before validation
        ("xn--bcher-kva.example", True),  # punycode '--' allowed
        ("a.co", True),
        ("ab", False),  # too short
        ("example", False),  # no TLD
        ("-bad.example.com", False),  # leading dash
        ("bad-.example.com", False),  # trailing dash
        ("ba--d.example.com", False),  # interior '--' (non-punycode)
        ("example.c0m", False),  # non-alpha TLD
        ("example.c", False),  # 1-char TLD
        ("", False),
        (None, False),
        ("a" * 64 + ".com", False),  # label > 63
        ("a." + "b" * 250 + ".com", False),  # total > 253
    ],
)
def test_validate_domain(domain, ok):
    assert validate_domain(domain) is ok


def test_fold_and_wildcard():
    assert fold_domain("  Example.COM ") == "example.com"
    rx = wildcard_to_regex("*foo*")
    assert rx.match("afoob")
    assert not rx.match("bar")
    assert wildcard_to_regex("ba$d") is None  # charset whitelist
    assert match_domains(["afoo.com", "bar.com", None], "*foo*") == [
        True,
        False,
        False,
    ]
    exact = wildcard_to_regex("foo.com")
    assert exact.match("foo.com") and not exact.match("xfoo.com")


def test_ua_alias():
    assert expand_user_agent(":firefox:").startswith("Mozilla/5.0")
    assert expand_user_agent("custom-agent") == "custom-agent"


def test_mime_canonicalization():
    assert canonical_mime_key("user-agent") == "User-Agent"
    assert canonical_mime_key("CONTENT-TYPE") == "Content-Type"
    assert canonicalize_headers({"x-my-header": "v"}) == {"X-My-Header": "v"}


def test_fetch_method_enum():
    assert fetch_method_to_text(1) == "direct"
    assert fetch_method_to_text(2) == "chromium-headless"
    assert fetch_method_from_text("direct") == 1
    with pytest.raises(ValueError):
        fetch_method_from_text("bogus")


# ------------------------------------------------------------ multimodal
def test_image_decode_stage(ray_session):
    from scrape_ray.ops.multimodal import decode_images, synthetic_media_dataset

    out = decode_images(synthetic_media_dataset(32), concurrency=2).to_pandas()
    assert len(out) == 32
    assert "payload" not in out.columns  # wide column dropped
    assert all(len(v) == 3 for v in out["feat_mean"])
    # deterministic: same payload → same features
    out2 = decode_images(synthetic_media_dataset(32), concurrency=2).to_pandas()
    a = out.sort_values("media_id")["feat_mean"].tolist()
    b = out2.sort_values("media_id")["feat_mean"].tolist()
    assert [list(x) for x in a] == [list(x) for x in b]


def test_frame_sampling(ray_session):
    from scrape_ray.ops.multimodal import sample_frames, synthetic_media_dataset

    vids = synthetic_media_dataset(8, kind="video")
    out = sample_frames(vids, every_ms=1000).to_pandas()
    # durations 3000-4500ms → 3-5 frames each
    counts = out.groupby("media_id").size()
    assert counts.min() >= 3 and counts.max() <= 5
    assert (out["frame_ts_ms"] % 1000 == 0).all()


def test_stub_decoder_raises():
    from scrape_ray.ops.multimodal import ImageDecodeStage

    import pyarrow as pa

    stage = ImageDecodeStage(decoder="stub")
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "url": pa.array(["u"]),
            "payload": pa.array([b"x"], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        stage(t)


def test_image_resize_stage(ray_session):
    from scrape_ray.ops.multimodal import resize_images, synthetic_media_dataset

    out = resize_images(
        synthetic_media_dataset(16), target_h=2, target_w=3
    ).to_pandas()
    assert len(out) == 16
    assert (out["height"] == 2).all() and (out["width"] == 3).all()
    assert all(len(b) == 2 * 3 * 3 for b in out["pixels_rgb"])  # h*w*rgb
    # deterministic
    out2 = resize_images(
        synthetic_media_dataset(16), target_h=2, target_w=3
    ).to_pandas()
    a = out.sort_values("media_id")["pixels_rgb"].tolist()
    b = out2.sort_values("media_id")["pixels_rgb"].tolist()
    assert a == b


def test_audio_features(ray_session):
    from scrape_ray.ops.multimodal import audio_features, synthetic_media_dataset

    out = audio_features(synthetic_media_dataset(8, kind="audio")).to_pandas()
    # 1s @ 16kHz / 25ms frames = 40 frames per clip
    counts = out.groupby("media_id").size()
    assert (counts == 40).all()
    assert (out["rms"] > 0).all()
    assert out["zcr"].between(0, 1).all()
