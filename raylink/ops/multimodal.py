"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
sandbox): ``DecodeImage``/``ExtractAudioFeatures`` raise
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder exercises the real Ray-side plumbing — schema, batch sizing,
actor signature, output layout — which is what these tests pin down.

Batch sizes for binary payloads must be small (a batch × concurrency must
fit the worker heap — SURVEY-level guidance: size ``batch_size`` so
``batch_size * avg_payload ≤ ~64 MiB``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from raylink.util import actor_pool_size

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # 'image' | 'audio' | 'video'
        ("format", pa.string()),  # e.g. 'png', 'wav'
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
        ("payload", pa.binary()),
    ]
)


def fake_media_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic opaque media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["format"].append({"image": "png", "audio": "wav", "video": "mp4"}[kind])
        rows["width"].append(64 if kind != "audio" else 0)
        rows["height"].append(48 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else int(rng.integers(100, 5000)))
        rows["payload"].append(rng.bytes(int(rng.integers(256, 2048))))
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor stage: binary payload → decoded pixel features.

    Real decoders (PIL/libjpeg) are not in this container; with
    ``fake=True`` a deterministic digest-based stand-in produces the same
    output schema (``feat``: FixedSizeList<float32>[dim]) the real kernel
    would, so downstream stages and tests are honest about layout."""

    def __init__(self, dim: int = 16, fake: bool = False):
        self.dim = dim
        self.fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an image library not present in "
                "this sandbox; construct with fake=True for plumbing tests"
            )
        dig = hashlib.blake2b(payload, digest_size=self.dim * 4).digest()
        v = np.frombuffer(dig, dtype=np.uint32).astype(np.float32)
        return v / np.float32(2**32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._decode(p) for p in payloads])
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.dim
        )
        return batch.drop_columns(["payload"]).append_column("feat", arr)


class FrameSample:
    """Video frame sampling stub: emits one row per sampled frame index
    (real frame extraction NotImplemented; plumbing = row expansion)."""

    def __init__(self, every_ms: int = 1000, fake: bool = False):
        self.every_ms = every_ms
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decoding requires codecs not present in this sandbox; "
                "construct with fake=True for plumbing tests"
            )
        ids = batch.column("media_id").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        kinds = batch.column("kind").to_pylist()
        out_id, out_frame = [], []
        for i, d, k in zip(ids, durs, kinds):
            if k != "video":
                continue
            for t in range(0, d, self.every_ms):
                out_id.append(i)
                out_frame.append(t)
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_ms": pa.array(out_frame, type=pa.int32()),
            }
        )


def decode_images(
    ds: ray.data.Dataset, dim: int = 16, fake: bool = False, batch_size: int = 64
) -> ray.data.Dataset:
    """Actor-pool decode stage; small batch_size because payloads are fat."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"dim": dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, actor_pool_size()),
    )


def sample_frames(
    ds: ray.data.Dataset, every_ms: int = 1000, fake: bool = False
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every_ms": every_ms, "fake": fake},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
    )
