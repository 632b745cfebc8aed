"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
sidecar metadata; decode / feature-extract / resize / frame-sample are
stateful actor-pool ``map_batches`` stages. The decode libraries (PIL,
ffmpeg, torchvision, …) are NOT in this container, so the codec calls are
stubbed behind ``import``-guards / a deterministic fake — but everything
Ray-side is real and tested: the schema contract, actor signature, batch
sizing for large binary payloads, and the output layout.

Schema contract:

    media(media_id:int64, kind:string, payload:binary, meta:string-JSON)
      → decoded(media_id, kind, width:int32, height:int32,
                n_frames:int32, feature:list<float>)

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


def _try_real_decoder():
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the codec call: derives stable
    pseudo-dimensions and a unit-norm feature vector from the payload
    bytes. Replace with the real decoder where the libs exist."""
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
        self.have_real = _try_real_decoder()
        self.keep_payload = keep_payload  # for decode→resize chaining
        if strict and not self.have_real:
            raise NotImplementedError(
                "real media decoding needs PIL/ffmpeg which are not in "
                "this container; run with strict=False to use the "
                "deterministic fake decoder"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        width, height, n_frames, feats = [], [], [], []
        for p, k in zip(payloads, kinds):
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
    (aspect-preserving) and re-emit the payload — the resize math and
    the Ray plumbing (binary in/out, metadata update) are real; the
    pixel resample itself is the honestly-stubbed fake (payload bytes
    scaled proportionally to the area change), same guard contract as
    MediaDecode."""

    def __init__(self, max_w: int = 128, max_h: int = 128, strict: bool = False):
        self.max_w, self.max_h = max_w, max_h
        self.have_real = _try_real_decoder()
        if strict and not self.have_real:
            raise NotImplementedError(
                "real media resampling needs PIL/ffmpeg which are not in "
                "this container; run with strict=False to use the "
                "deterministic fake"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_w, out_h, out_payload = [], [], []
        for p, k, w, h in zip(
            batch["payload"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            if k == "audio" or (w <= self.max_w and h <= self.max_h):
                nw, nh = w, h
                body = p
            else:
                scale = min(self.max_w / w, self.max_h / h)
                nw = max(1, int(w * scale))
                nh = max(1, int(h * scale))
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
    demonstrates the flat_map-shaped (1 row → n rows) media transform."""

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


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "video", "audio"]
    rows_kind = [kinds[i % 3] for i in range(n)]
    payloads = [rng.bytes(128 + int(rng.randint(0, 512))) for _ in range(n)]
    meta = [json.dumps({"src": f"media/{i}"}) for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(rows_kind, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(meta, pa.string()),
        }
    )
