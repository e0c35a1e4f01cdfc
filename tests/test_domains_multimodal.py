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


def test_validate_domains_batch_matches_scalar():
    """The Arrow fast path (RE2 whole-domain regex + '--' fallback)
    must be bit-identical to row-wise validate_domain on every edge
    shape, including punycode, unicode, whitespace and nulls."""
    import pyarrow as pa

    from scrape_ray.functions.domains import validate_domains_batch

    cases = [
        "example.com", "sub.example.com", "EXAMPLE.COM",
        "xn--bcher-kva.example", "a.co", "ab", "example",
        "-bad.example.com", "bad-.example.com", "ba--d.example.com",
        "xn--a--b.example.com", "a.xn--p1ai", "x--y.xn--p1ai",
        "example.c0m", "example.c", "", None, "  padded.com  ",
        "a" * 63 + ".com", "a" * 64 + ".com",
        "a." + "b" * 250 + ".com", "a..com", "a.com.",
        ".a.com", "héllo.com", "a_b.com", "a b.com",
        "xn--1.com" * 30,  # long, many '--' labels
        "ab\n.com",  # Python re's $-before-trailing-newline quirk
        "ab.com\n", "a\nb.com",
    ]
    t = pa.table({"domain": pa.array(cases, pa.string())})
    got = validate_domains_batch(t)["domain_valid"].to_pylist()
    want = [validate_domain(c) for c in cases]
    assert got == want


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


# --------------------------------------------------- real codec kernels
def _make_ppm(img):
    return b"P6\n# comment\n%d %d\n255\n" % (img.shape[1], img.shape[0]) + img.tobytes()


def _make_bmp(img):
    import struct

    h, w = img.shape[:2]
    row = (w * 3 + 3) & ~3
    pad = row - w * 3
    # bottom-up BGR rows with padding
    body = b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    data_off = 14 + 40
    size = data_off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + body


def _make_wav(wavf, sr=16000, ch=1):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(wavf.tobytes())
    return buf.getvalue()


def test_ppm_decode_roundtrip():
    import numpy as np

    from scrape_ray.ops.multimodal import ppm_decode

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (ppm_decode(_make_ppm(img)) == img).all()


def test_bmp_decode_roundtrip_with_padding():
    import numpy as np

    from scrape_ray.ops.multimodal import bmp_decode

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)  # 5*3=15 -> pad 1
    assert (bmp_decode(_make_bmp(img)) == img).all()


def test_wav_decode_roundtrip_and_stereo_mixdown():
    import numpy as np

    from scrape_ray.ops.multimodal import wav_decode

    rng = np.random.RandomState(3)
    mono = (rng.standard_normal(1600) * 3000).astype(np.int16)
    assert (wav_decode(_make_wav(mono)) == mono).all()
    stereo = np.stack([mono, mono + 10], axis=1).reshape(-1)
    mixed = wav_decode(_make_wav(stereo, ch=2))
    assert np.abs(mixed.astype(np.int32) - (mono.astype(np.int32) + 5)).max() <= 1


def test_sniff_decode_dispatch_and_stub():
    import numpy as np
    import pytest

    from scrape_ray.ops.multimodal import sniff_decode

    img = np.zeros((2, 2, 3), np.uint8)
    assert sniff_decode(_make_ppm(img)).shape == (2, 2, 3)
    assert sniff_decode(_make_bmp(img)).shape == (2, 2, 3)
    wavf = np.zeros(160, np.int16)
    assert len(sniff_decode(_make_wav(wavf))) == 160
    with pytest.raises(NotImplementedError):
        sniff_decode(b"\x00unknown-container")  # unrecognized -> stub


def test_compressed_image_routes_to_pil_seam():
    """JPEG/PNG magic bytes route to the optional Pillow path: absent
    Pillow (this sandbox) the error names the missing capability;
    present Pillow a real decode round-trips."""
    import numpy as np
    import pytest

    from scrape_ray.ops.multimodal import pil_decode, sniff_decode

    try:
        from PIL import Image  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False

    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            sniff_decode(b"\xff\xd8\xff\xe0JFIF")
        with pytest.raises(NotImplementedError, match="Pillow"):
            sniff_decode(b"\x89PNG\r\n\x1a\n....")
        return
    import io

    img = Image.fromarray(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = pil_decode(buf.getvalue())
    assert out.shape == (4, 4, 3)
    assert (out == np.arange(48, dtype=np.uint8).reshape(4, 4, 3)).all()
    assert sniff_decode(buf.getvalue()).shape == (4, 4, 3)


def test_compressed_video_routes_to_ffmpeg_seam():
    """Non-VID0 video payloads route to the optional ffmpeg path:
    absent ffmpeg (this sandbox) the error names the capability;
    present ffmpeg the demux yields (nframes, h, w, 3)."""
    import shutil

    import pytest

    from scrape_ray.ops.multimodal import ffmpeg_demux, sniff_demux, vid_demux

    # VID0 demuxes natively regardless of ffmpeg presence
    import struct

    vid = b"VID0" + struct.pack("<HHH", 2, 2, 1) + bytes(12)
    assert sniff_demux(vid).shape == (1, 2, 2, 3)
    assert vid_demux(vid).shape == (1, 2, 2, 3)

    if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            sniff_demux(b"\x00\x00\x00\x18ftypmp42....")
        return
    # with ffmpeg present, exercise it on a tiny synthesized container:
    # encode one VID0 raster to rawvideo-in-avi via ffmpeg, then demux.
    import subprocess
    import tempfile

    import numpy as np

    frames = np.arange(2 * 8 * 8 * 3, dtype=np.uint8).reshape(2, 8, 8, 3)
    with tempfile.NamedTemporaryFile(suffix=".avi") as f:
        subprocess.run(
            ["ffmpeg", "-v", "error", "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-s", "8x8", "-r", "4", "-i", "pipe:0", "-c:v", "rawvideo",
             "-pix_fmt", "rgb24", "-y", f.name],
            input=frames.tobytes(), check=True,
        )
        out = ffmpeg_demux(open(f.name, "rb").read())
    assert out.shape[1:] == (8, 8, 3)


def test_image_stage_with_real_ppm_codec(ray_session):
    """ImageDecodeStage over REAL payloads end-to-end in Ray: features
    must equal numpy's own channel stats."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.multimodal import decode_images, sniff_decode

    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(8)]
    t = pa.table(
        {
            "media_id": pa.array(range(8), pa.int64()),
            "url": pa.array([f"https://cdn.example/{i}.ppm" for i in range(8)]),
            "payload": pa.array([_make_ppm(im) for im in imgs], pa.binary()),
        }
    )
    out = (
        decode_images(ray.data.from_arrow(t), decoder=sniff_decode, concurrency=1)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    for i, im in enumerate(imgs):
        got = np.array(out.loc[i, "feat_mean"])
        exp = im.reshape(-1, 3).mean(axis=0)
        assert np.allclose(got, exp, atol=1e-4)
        assert out.loc[i, "decoded_h"] == 6 and out.loc[i, "decoded_w"] == 6


def test_audio_stage_with_real_wav_codec(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.multimodal import audio_features, wav_decode

    rng = np.random.RandomState(5)
    wavf = (rng.standard_normal(16000) * 2000).astype(np.int16)
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([_make_wav(wavf)], pa.binary()),
        }
    )
    out = audio_features(
        ray.data.from_arrow(t), decoder=wav_decode, concurrency=1
    ).to_pandas()
    assert len(out) == 40  # 1 s / 25 ms
    frames = wavf[: 40 * 400].reshape(40, 400).astype(np.float32)
    exp_rms = np.sqrt((frames**2).mean(axis=1))
    assert np.allclose(out["rms"].to_numpy(), exp_rms, rtol=1e-5)


def test_audio_energy_stage_exact_integers(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.multimodal import audio_energy, wav_decode

    rng = np.random.RandomState(11)
    wavf = (rng.standard_normal(16000) * 2000).astype(np.int16)
    t = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([_make_wav(wavf)], pa.binary()),
        }
    )
    out = (
        audio_energy(ray.data.from_arrow(t), decoder=wav_decode, concurrency=1)
        .to_pandas()
        .sort_values("frame_idx")
    )
    assert len(out) == 40
    frames = wavf[: 40 * 400].astype(np.int64).reshape(40, 400)
    exp_energy = (frames * frames).sum(axis=1)
    exp_zc = (np.diff(frames < 0, axis=1) != 0).sum(axis=1)
    assert (out["energy"].to_numpy() == exp_energy).all()
    assert (out["n_zc"].to_numpy() == exp_zc).all()
    assert (out["media_id"] == 7).all()


def test_vid_demux_roundtrip_and_errors():
    import struct

    import numpy as np
    import pytest

    from scrape_ray.ops.multimodal import VID_MAGIC, vid_demux

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(5, 4, 6, 3), dtype=np.uint8)
    payload = VID_MAGIC + struct.pack("<HHH", 6, 4, 5) + frames.tobytes()
    got = vid_demux(payload)
    assert got.shape == (5, 4, 6, 3)
    assert (got == frames).all()
    with pytest.raises(ValueError):
        vid_demux(b"nope")
    with pytest.raises(ValueError):
        vid_demux(payload[:-1])  # truncated raster


def test_video_frame_means_closed_form(ray_session):
    import numpy as np

    from scrape_ray.ops.multimodal import (
        synthetic_vid_dataset,
        video_frame_means,
    )

    out = (
        video_frame_means(synthetic_vid_dataset(4), concurrency=1)
        .to_pandas()
        .sort_values(["media_id", "frame_ts_ms", "channel"])
        .reset_index(drop=True)
    )
    assert len(out) == 4 * 4 * 3  # media x frames x channels
    j = np.arange(64, dtype=np.int64)
    for _, row in out.iterrows():
        m, ts, c = int(row.media_id), int(row.frame_ts_ms), int(row.channel)
        f = ts // 1000
        exp = (((m * 31 + f * 17 + (3 * j + c) * 7) % 256).sum()) / 64.0
        assert row.chan_mean == exp  # exact: integer sum / 2^6
