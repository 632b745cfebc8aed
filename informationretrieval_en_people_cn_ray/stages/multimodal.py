"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
sidecar metadata; decode / feature-extract / resize / frame-sample are
stateful actor-pool ``map_batches`` stages.

Decoding is REAL — pure Python/numpy codecs in ``mediacodecs`` — for
the compressed image formats PNG (zlib + numpy defilter), JPEG
(baseline SOF0: Huffman + IDCT) and GIF (LZW), plus the uncompressed
interchange formats: BMP (24-bit), PPM (P6), WAV (PCM16), Y4M
(YUV4MPEG2 4:2:0). Features are real pixel/sample math (luminance
histograms, rFFT band magnitudes); resize is a real nearest-neighbor
resample re-encoded in the source format. The remaining COMPRESSED
codecs (MP3/MP4…) need ffmpeg, which is NOT in this container: those
payloads fall back to a deterministic fake in non-strict mode, and
``strict=True`` raises ``NotImplementedError`` the moment one is seen.
Animated GIFs are first-class video: frame counting, per-frame resize
and frame sampling all run on real decoded frames
(``decode_gif_frames`` / ``encode_gif_frames``).

Schema contract:

    media(media_id:int64, kind:string, payload:binary, meta:string-JSON)
      → decoded(media_id, kind, width:int32, height:int32,
                n_frames:int32, feature:list<float>)

Dimension semantics per kind: image (w, h, 1); video (w, h, n_frames);
audio (width=sample_rate, height=channels, n_frames=n_samples).

Batch-size note (scale): with multi-MB payloads, ``batch_size`` must be
small (16-64) and ``target_max_block_size`` raised so Ray doesn't split
blocks absurdly small — a batch × concurrency must fit the worker heap
(see the guide's memory-aware sizing).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from . import mediacodecs as mc

DECODED_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)

FEATURE_DIM = 16

_STUB_MSG = (
    "payload is not one of the real pure-python codecs "
    "(PNG/JPEG/GIF/BMP/PPM/WAV/Y4M); other compressed formats need "
    "ffmpeg which is not in this container — run with strict=False to "
    "apply the deterministic fake decoder"
)

_IMG_DECODERS = {
    "png": "decode_png",
    "bmp": "decode_bmp",
    "ppm": "decode_ppm",
    "gif": "decode_gif",
    "jpeg": "decode_jpeg",
}

_IMG_ENCODERS = {
    "png": "encode_png",
    "bmp": "encode_bmp",
    "ppm": "encode_ppm",
    "gif": "encode_gif",
    "jpeg": "encode_jpeg",
}


def real_decode(payload: bytes) -> dict | None:
    """Real decode for the formats ``mediacodecs`` covers; None if the
    payload is not one of them (caller picks strict/fake handling)."""
    fmt = mc.sniff(payload)
    if fmt is None:
        return None
    if fmt in _IMG_DECODERS:
        img = getattr(mc, _IMG_DECODERS[fmt])(payload)
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            # an animated GIF is a short clip; all other image formats
            # are single-frame
            "n_frames": (
                int(mc.gif_frame_count(payload)) if fmt == "gif" else 1
            ),
            "feature": mc.luma_histogram(img, FEATURE_DIM).tolist(),
        }
    if fmt == "wav":
        samples, rate, ch = mc.decode_wav(payload)
        return {
            "width": int(rate),
            "height": int(ch),
            "n_frames": int(len(samples) // max(ch, 1)),
            "feature": mc.spectral_bands(samples, FEATURE_DIM).tolist(),
        }
    frames = mc.decode_y4m(payload)  # y4m
    n, h, w = frames.shape
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": int(n),
        "feature": mc.luma_histogram(frames, FEATURE_DIM).tolist(),
    }


def fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the codec call on formats the real
    decoders don't cover: stable pseudo-dimensions and a unit-norm
    feature vector derived from the payload bytes."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    n_frames = 1 if kind == "image" else 1 + h[2] % 64
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint8).astype(
        np.float32
    )[:FEATURE_DIM]
    norm = float(np.linalg.norm(raw)) or 1.0
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "feature": (raw / norm).tolist(),
    }


class MediaDecode:
    """Actor-pool stage: decode binary media + extract features.

    Usage:
        ds.map_batches(MediaDecode, batch_size=32, batch_format="pyarrow",
                       concurrency=N, num_cpus=1)
    """

    def __init__(self, strict: bool = False, keep_payload: bool = False):
        self.strict = strict
        self.keep_payload = keep_payload  # for decode→resize chaining

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        width, height, n_frames, feats = [], [], [], []
        for p, k in zip(payloads, kinds):
            d = real_decode(p)
            if d is None:
                if self.strict:
                    raise NotImplementedError(_STUB_MSG)
                d = fake_decode(p, k)
            width.append(d["width"])
            height.append(d["height"])
            n_frames.append(d["n_frames"])
            feats.append(d["feature"])
        cols = {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "width": pa.array(width, pa.int32()),
            "height": pa.array(height, pa.int32()),
            "n_frames": pa.array(n_frames, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        }
        if self.keep_payload:
            cols["payload"] = batch["payload"]
        return pa.table(cols)


class MediaResize:
    """Actor-pool stage: fit image/video dimensions into a target box
    (aspect-preserving). For the real codecs the pixels are genuinely
    resampled (nearest-neighbor) and re-encoded in the source format —
    PNG/BMP/PPM per image, Y4M per frame; audio passes through.
    Unrecognized (compressed) payloads keep the honestly-stubbed fake
    (payload bytes scaled with pixel area) unless ``strict=True``."""

    def __init__(self, max_w: int = 128, max_h: int = 128, strict: bool = False):
        self.max_w, self.max_h = max_w, max_h
        self.strict = strict

    def _fit(self, w: int, h: int) -> tuple[int, int]:
        scale = min(self.max_w / w, self.max_h / h)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_w, out_h, out_payload = [], [], []
        for p, k, w, h in zip(
            batch["payload"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            if k == "audio" or (w <= self.max_w and h <= self.max_h):
                out_w.append(w)
                out_h.append(h)
                out_payload.append(p)
                continue
            fmt = mc.sniff(p)
            nw, nh = self._fit(w, h)
            if fmt == "gif":
                # multi-frame aware: every frame genuinely resampled,
                # re-encoded as one animated GIF (single-frame included)
                frames = mc.decode_gif_frames(p)
                small = np.stack(
                    [mc.resize_nearest(f, nw, nh) for f in frames]
                )
                body = mc.encode_gif_frames(small)
            elif fmt in _IMG_DECODERS:
                img = getattr(mc, _IMG_DECODERS[fmt])(p)
                small = mc.resize_nearest(img, nw, nh)
                body = getattr(mc, _IMG_ENCODERS[fmt])(small)
            elif fmt == "y4m":
                frames = mc.decode_y4m(p)
                nw -= nw % 2  # 4:2:0 needs even dims
                nh -= nh % 2
                nw, nh = max(nw, 2), max(nh, 2)
                small = np.stack(
                    [mc.resize_nearest(f, nw, nh) for f in frames]
                ) if len(frames) else np.zeros((0, nh, nw), np.uint8)
                body = mc.encode_y4m(small)
            else:
                if self.strict:
                    raise NotImplementedError(_STUB_MSG)
                # fake resample: payload shrinks with pixel area; content
                # stays payload-determined (deterministic, testable)
                keep = max(1, int(len(p) * (nw * nh) / (w * h)))
                body = p[:keep]
            out_w.append(nw)
            out_h.append(nh)
            out_payload.append(body)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "n_frames": batch["n_frames"],
                "payload": pa.array(out_payload, pa.binary()),
            }
        )


class FrameSample:
    """Actor-pool stage: sample every k-th frame index of video rows —
    the flat_map-shaped (1 row → n rows) media transform. ``n_frames``
    comes from the (now real, for Y4M) decode stage."""

    def __init__(self, every: int = 8):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame = [], []
        for mid, kind, nf in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["n_frames"].to_pylist(),
        ):
            if kind != "video":
                continue
            for f in range(0, int(nf), self.every):
                out_id.append(mid)
                out_frame.append(f)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_frame, pa.int32()),
            }
        )


def synthesize_media_table(n: int, seed: int = 42, real: bool = True) -> pa.Table:
    """Deterministic media rows for tests/benchmarks.

    ``real=True`` (default) emits REAL payloads the pure-python codecs
    decode — PNG/BMP/PPM gradient images, Y4M moving-gradient clips, WAV sine
    tones; ``real=False`` keeps the legacy opaque random bytes that
    exercise the compressed-format fallback path."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "video", "audio"]
    rows_kind = [kinds[i % 3] for i in range(n)]
    if not real:
        payloads = [
            rng.bytes(128 + int(rng.randint(0, 512))) for _ in range(n)
        ]
    else:
        payloads = []
        for i, k in enumerate(rows_kind):
            if k == "image":
                w = int(rng.randint(20, 90))
                h = int(rng.randint(20, 90))
                x = np.arange(w, dtype=np.uint8)[None, :]
                y = np.arange(h, dtype=np.uint8)[:, None]
                img = np.stack(
                    [
                        np.broadcast_to((x * 3 + i) % 256, (h, w)),
                        np.broadcast_to((y * 5) % 256, (h, w)),
                        np.full((h, w), i % 256),
                    ],
                    axis=-1,
                ).astype(np.uint8)
                enc = (
                    lambda im: mc.encode_png(im, filter_type="mixed"),
                    mc.encode_ppm,
                    mc.encode_jpeg,
                    mc.encode_bmp,
                    mc.encode_gif,
                    lambda im: mc.encode_jpeg(im, subsample=True),
                )[i % 6]
                payloads.append(enc(img))
            elif k == "video":
                w = 2 * int(rng.randint(8, 32))
                h = 2 * int(rng.randint(8, 32))
                nf = int(rng.randint(2, 12))
                base = (
                    np.arange(w, dtype=np.uint16)[None, :]
                    + np.arange(h, dtype=np.uint16)[:, None]
                )
                frames = np.stack(
                    [((base + 7 * f + i) % 256).astype(np.uint8) for f in range(nf)]
                )
                if i % 2:  # animated GIF clips alternate with Y4M
                    rgb = np.stack(
                        [frames, (frames * 2) % 256, np.full_like(frames, i % 256)],
                        axis=-1,
                    ).astype(np.uint8)
                    payloads.append(mc.encode_gif_frames(rgb))
                else:
                    payloads.append(mc.encode_y4m(frames))
            else:
                rate = 8000
                dur = int(rng.randint(200, 2000))
                t = np.arange(dur)
                freq = 100 + 50 * (i % 7)
                tone = (
                    3000 * np.sin(2 * np.pi * freq * t / rate)
                ).astype(np.int16)
                payloads.append(mc.encode_wav(tone, rate, 1))
    meta = [json.dumps({"src": f"media/{i}"}) for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(rows_kind, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(meta, pa.string()),
        }
    )
