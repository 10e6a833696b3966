"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels are REAL for every format a pure-stdlib codec can
handle — PPM/BMP/PNG images, PCM WAV audio, and uncompressed Y4M video
(``raylink.ops.imagecodec``: zlib inflate + PNG unfiltering, struct
headers, raw YUV planes) — so ``DecodeImage``, ``ExtractAudioFeatures``
and ``FrameSample`` do actual pixel/sample work. Formats that
genuinely require external codecs (JPEG, MP3, mp4/webm containers) raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic digest stand-in keeps the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — exercised and honest.

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
from raylink.ops.imagecodec import (
    decode_qoi,
    encode_qoi,
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_gif,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_png,
    encode_ppm,
    encode_wav,
    encode_y4m,
    sniff_format,
)
from raylink.ops.webpcodec import decode_webp, encode_webp
from raylink.ops.flaccodec import decode_flac, encode_flac

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

_IMG_DECODERS = {
    "png": decode_png,
    "bmp": decode_bmp,
    "ppm": decode_ppm,
    "jpeg": decode_jpeg,
    "gif": decode_gif,
    "webp": decode_webp,
    "qoi": decode_qoi,
}


def _test_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic gradient + noise RGB test card."""
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    img = np.stack(
        [x + 0 * y, y + 0 * x, (x + y) / 2], axis=2
    ) + rng.integers(-16, 16, size=(h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _test_video(rng: np.random.Generator, w: int, h: int, n: int) -> np.ndarray:
    """Deterministic (n, h, w) uint8 luma frames: horizontal gradient
    brightening by 5/frame (wraps mod 256) so per-frame mean luma is
    predictable by regenerating."""
    x = np.linspace(0, 200, w, dtype=np.float64)[None, :]
    base = np.broadcast_to(x, (h, w))
    return np.stack([(base + 5.0 * f) % 256 for f in range(n)]).astype(np.uint8)


def fake_media_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic media rows. Image payloads are REAL encoded PNG / BMP
    / PPM / JPEG / GIF / lossless WebP (cycling; the JPEG rows alternate
    4:4:4, 4:2:0, restart-marker and PROGRESSIVE (SOF2) variants, the WebP
    rows cycle transform stacks — all decoded for
    real), audio payloads are real PCM WAV,
    and video payloads cycle real uncompressed Y4M / real COMPRESSED
    MJPEG AVI (per-frame baseline JPEG) / opaque 'mp4' bytes — so the
    decode kernels run for real while the fake/stub path stays exercised
    on the one container class (inter-frame codecs) the sandbox cannot
    decode."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    img_fmts = ["png", "bmp", "ppm", "jpeg", "gif", "webp", "qoi"]
    img_encoders = {
        "png": encode_png,
        "bmp": encode_bmp,
        "ppm": encode_ppm,
        "gif": encode_gif,
        "qoi": encode_qoi,
    }
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    n_img = 0
    for i in range(n):
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        if kind == "image":
            fmt = img_fmts[n_img % len(img_fmts)]
            w, h = 32 + int(rng.integers(0, 32)), 24 + int(rng.integers(0, 24))
            img = _test_image(rng, w, h)
            if fmt == "webp":
                # lossless VP8L, cycling transform stacks so every decoder
                # branch (predictor, cross-color+subtract-green, color
                # cache + RLE backrefs) sees real gate traffic
                variant = (n_img // len(img_fmts)) % 3
                if variant == 0:
                    payload = encode_webp(img, subtract_green=True, predictor_mode=11)
                elif variant == 1:
                    payload = encode_webp(img, cache_bits=6, use_rle=True)
                else:
                    payload = encode_webp(
                        img, color_transform=(23, 250, 13), predictor_mode=12
                    )
            elif fmt == "jpeg":
                if n_img % 24 >= 16:
                    # progressive (SOF2) variant — decodes to pixels
                    # IDENTICAL to the baseline encoding of the same
                    # image (same quantized coefficients), so swapping
                    # it in changes payload bytes, never features
                    payload = encode_jpeg_progressive(
                        img, quality=90, subsample=bool(n_img % 8 >= 4)
                    )
                else:
                    payload = encode_jpeg(
                        img,
                        quality=90,
                        subsample=bool(n_img % 8 >= 4),
                        restart_interval=2 if n_img % 12 >= 8 else 0,
                    )
            else:
                payload = img_encoders[fmt](img)
            n_img += 1
            dur = 0
        elif kind == "audio":
            dur = int(rng.integers(100, 2000))
            t = np.arange(int(8000 * dur / 1000))
            freq = float(rng.integers(100, 1000))
            wave = np.sin(2 * np.pi * freq * t / 8000) * 0.5
            pcm = (wave * 32767).astype(np.int16)
            # audio rows cycle PCM-WAV / G.711 μ-law WAV / FLAC / IMA
            # ADPCM WAV so the decode stage exercises every native audio
            # codec (FLAC and PCM carry identical samples; μ-law adds
            # companding noise, ADPCM differential quantization noise)
            r = (i // 3) % 4
            if r == 2:
                fmt = "flac"
                payload = encode_flac(pcm, rate=8000)
            elif r == 1:
                fmt = "wav"
                payload = encode_wav(pcm, codec="ulaw")
            elif r == 3:
                fmt = "wav"
                payload = encode_wav(pcm, codec="adpcm")
            else:
                fmt = "wav"
                payload = encode_wav(pcm)
            w = h = 0
        elif (i // 3) % 3 == 2:
            fmt = "mp4"
            dur = int(rng.integers(100, 5000))
            payload = rng.bytes(int(rng.integers(256, 2048)))
            w, h = 64, 48
        else:
            # alternate uncompressed Y4M and REAL compressed MJPEG AVI
            w, h = 32, 24
            fps = 8
            nfr = int(rng.integers(4, 12))
            vid = _test_video(rng, w, h, nfr)
            if (i // 3) % 3 == 1:
                from raylink.ops.imagecodec import encode_avi_mjpeg

                fmt = "avi"
                payload = encode_avi_mjpeg(vid, fps, quality=90)
            else:
                fmt = "y4m"
                payload = encode_y4m(vid, fps, 1)
            dur = nfr * 1000 // fps
        rows["format"].append(fmt)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
        rows["payload"].append(payload)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _pool_grid(dim: int) -> tuple[int, int]:
    g = int(np.sqrt(dim))
    return (g, g) if g * g == dim else (1, dim)


class DecodeImage:
    """Actor stage: binary payload → decoded pixel features.

    REAL decode for PPM/BMP/PNG/baseline+progressive JPEG/GIF/lossless
    WebP (pure-stdlib codecs); the feature is a ``dim``-cell adaptive
    mean-pool of the grayscale image in [0, 1] — i.e. decode → grayscale
    → fixed-grid downsample, the canonical decode/resize/featurize shape
    of a training-data pipeline. Formats needing external codecs (lossy
    WebP, HEIC…) raise unless ``fake=True``, which substitutes a
    digest-based stand-in with the same output layout."""

    def __init__(self, dim: int = 16, fake: bool = False):
        self.dim = dim
        self.fake = fake
        self.grid = _pool_grid(dim)

    def _fake_feat(self, payload: bytes) -> np.ndarray:
        dig = hashlib.blake2b(payload, digest_size=self.dim * 4).digest()
        v = np.frombuffer(dig, dtype=np.uint32).astype(np.float32)
        return v / np.float32(2**32)

    def _decode(self, payload: bytes) -> np.ndarray:
        fmt = sniff_format(payload)
        dec = _IMG_DECODERS.get(fmt)
        if dec is None:
            if self.fake:
                return self._fake_feat(payload)
            raise NotImplementedError(
                f"image format {fmt or 'unknown'} requires codecs not in "
                "this sandbox (PPM/BMP/PNG decode natively; construct with "
                "fake=True to stub other formats)"
            )
        try:
            img = dec(payload)
        except NotImplementedError:
            # e.g. a lossy-VP8 payload inside a sniffed WebP container
            if self.fake:
                return self._fake_feat(payload)
            raise
        if img.ndim == 3 and img.shape[2] >= 3:
            gray = img[:, :, :3].astype(np.float64) @ [0.299, 0.587, 0.114]
        else:
            gray = img.reshape(img.shape[0], img.shape[1], -1)[:, :, 0].astype(
                np.float64
            )
        gh, gw = self.grid
        h, w = gray.shape
        ys = np.linspace(0, h, gh + 1).astype(np.int64)
        xs = np.linspace(0, w, gw + 1).astype(np.int64)
        feat = np.empty(self.dim, dtype=np.float32)
        idx = 0
        for i in range(gh):
            for j in range(gw):
                cell = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                            xs[j] : max(xs[j + 1], xs[j] + 1)]
                feat[idx] = cell.mean() / 255.0
                idx += 1
        return feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._decode(p) for p in payloads]) if payloads else (
            np.empty((0, self.dim), dtype=np.float32)
        )
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.dim
        )
        return batch.drop_columns(["payload"]).append_column("feat", arr)


class ExtractAudioFeatures:
    """Actor stage: WAV or FLAC payload → (rms, zero-crossing rate,
    spectral centroid in Hz) — real sample-domain features via
    stdlib decode + numpy rfft. Other audio raises unless ``fake=True``."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _features(self, payload: bytes) -> tuple[float, float, float]:
        fmt = sniff_format(payload)
        if fmt not in ("wav", "flac"):
            if self.fake:
                dig = hashlib.blake2b(payload, digest_size=12).digest()
                v = np.frombuffer(dig, dtype=np.uint32).astype(np.float64) / 2**32
                return float(v[0]), float(v[1]), float(v[2] * 4000)
            raise NotImplementedError(
                "only PCM WAV and FLAC decode natively; construct with "
                "fake=True to stub other compressed audio"
            )
        if fmt == "flac":
            from raylink.ops.flaccodec import flac_stream_info

            ints, rate = decode_flac(payload)
            bps = flac_stream_info(payload)["bits_per_sample"]
            # same normalization as decode_wav: floats in [-1, 1], so a
            # FLAC and a WAV of the same PCM yield identical features
            samples = ints.astype(np.float64) / float(1 << (bps - 1))
        else:
            samples, rate = decode_wav(payload)
        mono = samples.mean(axis=1)
        rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
        zcr = (
            float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
            if len(mono) > 1
            else 0.0
        )
        if len(mono) >= 2:
            spec = np.abs(np.fft.rfft(mono))
            freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)
            tot = spec.sum()
            centroid = float((freqs * spec).sum() / tot) if tot > 0 else 0.0
        else:
            centroid = 0.0
        return rms, zcr, centroid

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._features(p) for p in payloads]
        rms = pa.array([f[0] for f in feats], type=pa.float64())
        zcr = pa.array([f[1] for f in feats], type=pa.float64())
        cen = pa.array([f[2] for f in feats], type=pa.float64())
        return (
            batch.drop_columns(["payload"])
            .append_column("rms", rms)
            .append_column("zcr", zcr)
            .append_column("centroid_hz", cen)
        )


class FrameSample:
    """Video frame sampling: one row per sampled timestamp.

    REAL decode for Y4M (uncompressed YUV4MPEG2 — plain-text header + raw
    planes, parsed by ``imagecodec.decode_y4m``): the sampled row carries
    the actual frame index and the frame's mean luma, i.e. genuine pixel
    work per sampled frame. Compressed containers (mp4/webm) need codecs
    this sandbox lacks: they raise unless ``fake=True``, which emits
    digest stand-in rows (frame_idx = -1) over the metadata duration with
    the same output schema."""

    def __init__(self, every_ms: int = 1000, fake: bool = False):
        self.every_ms = every_ms
        self.fake = fake

    def _rows(self, mid: int, dur: int, payload: bytes):
        fmt = sniff_format(payload)
        if fmt in ("y4m", "avi"):
            if fmt == "y4m":
                frames, num, den = decode_y4m(payload)
                means = frames.mean(axis=(1, 2)) if len(frames) else frames
            else:
                from raylink.ops.imagecodec import decode_avi_mjpeg

                flist, num, den = decode_avi_mjpeg(payload)
                frames = flist
                # Rec.601 luma for RGB MJPEG frames; luma frames pass through
                means = np.array([
                    float((f @ [0.299, 0.587, 0.114]).mean())
                    if f.ndim == 3 else float(f.mean())
                    for f in flist
                ])
            if len(frames) == 0:
                return
            total_ms = len(frames) * 1000 * den // num
            for t in range(0, max(total_ms, 1), self.every_ms):
                idx = min(len(frames) - 1, t * num // (1000 * den))
                yield mid, t, idx, int(round(float(means[idx]) * 1000))
            return
        if not self.fake:
            raise NotImplementedError(
                "compressed video containers other than MJPEG AVI require "
                "codecs not present in this sandbox (Y4M and MJPEG AVI "
                "decode natively; construct with fake=True to stub mp4/webm)"
            )
        for t in range(0, dur, self.every_ms):
            dig = hashlib.blake2b(
                payload + t.to_bytes(8, "little"), digest_size=4
            ).digest()
            yield mid, t, -1, int(int.from_bytes(dig, "little") % 256000)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {"media_id": [], "frame_ms": [], "frame_idx": [], "mean_luma_e3": []}
        for i, d, k, p in zip(ids, durs, kinds, payloads):
            if k != "video":
                continue
            for mid, t, idx, luma in self._rows(i, d, p):
                out["media_id"].append(mid)
                out["frame_ms"].append(t)
                out["frame_idx"].append(idx)
                out["mean_luma_e3"].append(luma)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], type=pa.int64()),
                "frame_ms": pa.array(out["frame_ms"], type=pa.int32()),
                "frame_idx": pa.array(out["frame_idx"], type=pa.int32()),
                "mean_luma_e3": pa.array(out["mean_luma_e3"], type=pa.int64()),
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


def extract_audio_features(
    ds: ray.data.Dataset, fake: bool = False, batch_size: int = 64
) -> ray.data.Dataset:
    return ds.map_batches(
        ExtractAudioFeatures,
        fn_constructor_kwargs={"fake": fake},
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
