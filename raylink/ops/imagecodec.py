"""Pure-stdlib image + audio codecs for the multimodal decode kernels.

No image/audio libraries exist in this sandbox, but five image container
formats are decodable with nothing beyond ``zlib``/``struct``/numpy —
binary PPM (P6), uncompressed 24-bit BMP, non-interlaced 8-bit PNG
(zlib inflate + the five scanline filters), baseline-DCT JPEG
(Huffman + dequant + numpy IDCT), PROGRESSIVE JPEG (SOF2: spectral
selection + DC/AC successive approximation, the T.81 G.2 / libjpeg
jdphuff algorithms), and GIF87a/89a (variable-width LZW, local/global
palettes, interlacing) — and PCM WAV needs only ``struct``.
These make ``DecodeImage``/``ExtractAudioFeatures`` REAL kernels for the
formats a real corpus is dominated by; lossless WebP (VP8L) decodes for
real too (see :mod:`raylink.ops.webpcodec`). Formats that genuinely need
external codecs (lossy WebP/VP8, MP3/AAC, compressed video)
remain behind the documented fake path.

Encoders are provided too so tests and the gate can generate real payloads
deterministically (PNG encoding = filter-0 scanlines + zlib + CRC chunks;
JPEG encoding = quality-scaled Annex-K quant tables + spec-conformant
fixed canonical Huffman tables written to DHT).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# PPM (P6, binary, maxval 255)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 PPM."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM → (H, W, 3) uint8. Handles comments and arbitrary
    whitespace in the header, per the netpbm spec."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    px = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


# --------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up)


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += img[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hsize, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = (row + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        line = np.frombuffer(data, dtype=np.uint8, count=row, offset=off + i * stride)
        y = h - 1 - i if flip else i
        out[y] = line.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return out


# --------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, non-interlaced)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, {1,3,4}) uint8 → PNG (filter 0 scanlines)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five PNG scanline filters. Up/None/Average vectorize per
    row; Sub/Paeth are sequential in x (intra-row data dependence) but run
    inside the actor-pool worker, once per scanline."""
    out = np.zeros((h, stride), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = line
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = depth = color = interlace = None
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    px = _unfilter(raw, h, stride, channels)
    return px.reshape(h, w, channels)


# --------------------------------------------------------------------------
# WAV (PCM 16-bit + G.711 μ-law/A-law mono/stereo)
#
# G.711 is CLOSED-FORM (segment/exponent companding, ITU-T G.711 — the
# telephony codec real speech corpora ship as 8-bit WAV format tags 7/6):
# the 256-word decode codebook below is the standard expansion, and the
# encoder is its exact nearest-codeword inverse (midpoint searchsorted),
# so encode(decode(b)) == b for every codeword and round-trip error is
# bounded by half a segment step — both pinned in tests.


def _g711_ulaw_table() -> np.ndarray:
    """μ-law byte → linear int16 (±32124 full scale)."""
    u = np.arange(256, dtype=np.int64) ^ 0xFF  # stored complemented
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _g711_alaw_table() -> np.ndarray:
    """A-law byte → linear int16 (±32256 full scale; no exact zero)."""
    a = np.arange(256, dtype=np.int64) ^ 0x55  # even bits inverted
    mant = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(
        seg == 0, mant + 8,
        np.where(seg == 1, mant + 0x108, (mant + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_TABLE = _g711_ulaw_table()
_ALAW_TABLE = _g711_alaw_table()


def _g711_encoder(table: np.ndarray):
    """Nearest-codeword quantizer for a 256-entry decode table: sort the
    codebook once, split on midpoints, break exact-midpoint ties toward
    the lower codeword index (deterministic)."""
    order = np.argsort(table.astype(np.int64), kind="stable")
    vals = table.astype(np.int64)[order]
    mids = (vals[:-1] + vals[1:] + 1) // 2  # value >= mid → upper cell

    def _enc(x: np.ndarray) -> np.ndarray:
        cell = np.searchsorted(mids, np.asarray(x, dtype=np.int64), side="right")
        return order[cell].astype(np.uint8)

    return _enc


_ULAW_ENCODE = _g711_encoder(_ULAW_TABLE)
_ALAW_ENCODE = _g711_encoder(_ALAW_TABLE)

_WAV_FMT_PCM16, _WAV_FMT_ALAW, _WAV_FMT_ULAW = 1, 6, 7
_WAV_FMT_IMA_ADPCM = 0x11

# ----------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11): 4-bit differential coding with the
# standard 89-entry step table and per-nibble step-index adaptation
# (IMA "Recommended Practices for Enhancing Digital Audio Compatibility",
# rev 3.00 — the algorithm every player implements bit-identically). The
# encoder quantizes diff against (step, step/2, step/4) and updates its
# predictor with the DECODER's reconstruction rule, so encode → decode is
# deterministic and drift-free; 4:1 compression vs PCM16.

_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64
)


def _ima_decode_nibbles(nibbles: np.ndarray, predictor: int, index: int) -> np.ndarray:
    """Decode a (n,) uint8 nibble stream given the block-header state.
    Sequential recurrence (each step's quantizer depends on the previous
    reconstruction) — the per-block loop is the codec, not a shortcut."""
    out = np.empty(len(nibbles), dtype=np.int16)
    for i, n in enumerate(nibbles):
        step = int(_IMA_STEP_TABLE[index])
        diff = step >> 3
        if n & 4:
            diff += step
        if n & 2:
            diff += step >> 1
        if n & 1:
            diff += step >> 2
        predictor = predictor - diff if n & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        out[i] = predictor
        index = max(0, min(88, index + int(_IMA_INDEX_TABLE[n])))
    return out


def _ima_encode_block(samples: np.ndarray, index: int) -> tuple[bytes, int]:
    """Encode one mono block: samples[0] rides the 4-byte header verbatim;
    the rest become nibbles. Returns (block bytes, final step index)."""
    predictor = int(samples[0])
    header = struct.pack("<hBB", predictor, index, 0)
    nibbles = []
    for s in samples[1:]:
        step = int(_IMA_STEP_TABLE[index])
        diff = int(s) - predictor
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        # reconstruct with the decoder's rule so encoder state == decoder state
        rec = step >> 3
        if nib & 4:
            rec += step
        if nib & 2:
            rec += step >> 1
        if nib & 1:
            rec += step >> 2
        predictor = predictor - rec if nib & 8 else predictor + rec
        predictor = max(-32768, min(32767, predictor))
        nibbles.append(nib)
        index = max(0, min(88, index + int(_IMA_INDEX_TABLE[nib])))
    if len(nibbles) % 2:
        nibbles.append(0)
    arr = np.asarray(nibbles, dtype=np.uint8)
    packed = (arr[0::2] | (arr[1::2] << 4)).tobytes()  # low nibble first
    return header + packed, index


def encode_wav(
    samples: np.ndarray,
    rate: int = 8000,
    codec: str = "pcm16",
    block_align: int = 256,
) -> bytes:
    """(n,) int16 mono → WAV. ``codec``: 'pcm16' (default), 'ulaw' /
    'alaw' (G.711 8-bit companded, WAV format tags 7/6), or 'adpcm'
    (IMA ADPCM 4-bit, tag 0x11; ``block_align`` bytes per coded block)."""
    assert samples.dtype == np.int16
    if codec == "adpcm":
        spb = (block_align - 4) * 2 + 1  # header sample + 2 nibbles/byte
        body = bytearray()
        index = 0
        for off in range(0, len(samples), spb):
            chunk = samples[off : off + spb]
            blk, index = _ima_encode_block(chunk, index)
            body += blk + bytes(block_align - len(blk))
        fmt_body = struct.pack(
            "<HHIIHHHH",
            _WAV_FMT_IMA_ADPCM, 1, rate,
            rate * block_align // spb, block_align, 4, 2, spb,
        )
        return (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt_body) + 12 + 8 + len(body))
            + b"WAVEfmt "
            + struct.pack("<I", len(fmt_body))
            + fmt_body
            + b"fact"
            + struct.pack("<II", 4, len(samples))
            + b"data"
            + struct.pack("<I", len(body))
            + bytes(body)
        )
    if codec == "pcm16":
        fmt, bits, body = _WAV_FMT_PCM16, 16, samples.tobytes()
    elif codec == "ulaw":
        fmt, bits, body = _WAV_FMT_ULAW, 8, _ULAW_ENCODE(samples).tobytes()
    elif codec == "alaw":
        fmt, bits, body = _WAV_FMT_ALAW, 8, _ALAW_ENCODE(samples).tobytes()
    else:
        raise ValueError(f"unknown WAV codec {codec!r}")
    block = bits // 8
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, fmt, 1, rate, rate * block, block, bits)
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV → ((n, channels) float64 in [-1, 1], sample_rate). Supports
    16-bit PCM, G.711 μ-law/A-law (format tags 1/7/6) and IMA ADPCM
    (tag 0x11, mono)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, fmt, pcm = 12, None, None, None, None
    block_align, spb, n_samples = None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt, channels, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt == _WAV_FMT_PCM16 and bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
            if fmt in (_WAV_FMT_ULAW, _WAV_FMT_ALAW) and bits != 8:
                raise ValueError("G.711 WAV must be 8-bit")
            if fmt == _WAV_FMT_IMA_ADPCM:
                if bits != 4 or channels != 1:
                    raise ValueError("IMA ADPCM WAV must be 4-bit mono")
                (spb,) = struct.unpack_from("<H", body, 18)
            elif fmt not in (_WAV_FMT_PCM16, _WAV_FMT_ULAW, _WAV_FMT_ALAW):
                raise ValueError(f"unsupported WAV format tag {fmt}")
        elif tag == b"fact":
            (n_samples,) = struct.unpack_from("<I", body)
        elif tag == b"data":
            pcm = body
    if pcm is None or rate is None or fmt is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt == _WAV_FMT_IMA_ADPCM:
        if block_align is None or spb is None:
            raise ValueError("ADPCM WAV missing block layout")
        chunks = []
        for off in range(0, len(pcm) - 3, block_align):
            blk = pcm[off : off + block_align]
            predictor, index, _ = struct.unpack_from("<hBB", blk)
            packed = np.frombuffer(blk[4:], dtype=np.uint8)
            nibbles = np.empty(len(packed) * 2, dtype=np.uint8)
            nibbles[0::2] = packed & 0x0F
            nibbles[1::2] = packed >> 4
            want = min(spb, (n_samples - off // block_align * spb)
                       if n_samples is not None else spb)
            dec = _ima_decode_nibbles(nibbles[: max(want - 1, 0)],
                                      predictor, index)
            chunks.append(np.concatenate(
                [np.array([predictor], dtype=np.int16), dec]))
        ints = np.concatenate(chunks) if chunks else np.empty(0, np.int16)
        if n_samples is not None:
            ints = ints[:n_samples]
    elif fmt == _WAV_FMT_ULAW:
        ints = _ULAW_TABLE[np.frombuffer(pcm, dtype=np.uint8)]
    elif fmt == _WAV_FMT_ALAW:
        ints = _ALAW_TABLE[np.frombuffer(pcm, dtype=np.uint8)]
    else:
        ints = np.frombuffer(pcm, dtype=np.int16)
    arr = ints.astype(np.float64) / 32768.0
    return arr.reshape(-1, channels), rate


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — uncompressed video; plain-text header + raw planes,
# decodable with nothing beyond numpy. This makes the video frame-sample
# kernel REAL for the one video container a deterministic pipeline can
# generate in-sandbox (compressed containers — mp4/webm — still need
# external codecs and stay behind the fake path).


def encode_y4m(frames: np.ndarray, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """(n, h, w) uint8 luma frames → Y4M C420jpeg bytes (neutral chroma).
    Width/height must be even (4:2:0 subsampling)."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w) uint8")
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even width/height")
    header = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C420jpeg\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    parts = [header]
    for f in frames:
        parts.append(b"FRAME\n")
        parts.append(f.tobytes())
        parts.append(chroma)
        parts.append(chroma)
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[np.ndarray, int, int]:
    """Y4M → ((n, h, w) uint8 luma frames, fps_num, fps_den). Chroma planes
    are skipped (every consumer here is luma-only). Supports C420*/C444/
    C422 plane geometries, progressive, any frame rate."""
    nl = data.index(b"\n")
    tokens = data[:nl].decode("ascii", "replace").split(" ")
    if tokens[0] != "YUV4MPEG2":
        raise ValueError("not a Y4M stream")
    w = h = 0
    fps_num, fps_den = 25, 1
    colorspace = "420"
    for t in tokens[1:]:
        if not t:
            continue
        tag, val = t[0], t[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            a, b = val.split(":")
            fps_num, fps_den = int(a), int(b)
        elif tag == "C":
            colorspace = val
    if w <= 0 or h <= 0:
        raise ValueError("Y4M missing W/H")
    if colorspace.startswith("420"):
        chroma_sz = 2 * ((w // 2) * (h // 2))
    elif colorspace.startswith("422"):
        chroma_sz = 2 * ((w // 2) * h)
    elif colorspace.startswith("444"):
        chroma_sz = 2 * (w * h)
    elif colorspace.startswith("mono"):
        chroma_sz = 0
    else:
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    luma_sz = w * h
    pos = nl + 1
    frames = []
    while pos < len(data):
        fe = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M: expected FRAME marker")
        pos = fe + 1
        if pos + luma_sz > len(data):
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=luma_sz, offset=pos).reshape(h, w)
        )
        pos += luma_sz + chroma_sz
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps_num, fps_den


# --------------------------------------------------------------------------
# AVI / MJPEG (RIFF 'AVI ' container, 'MJPG' video stream) — every frame is
# an independent baseline JFIF JPEG, so the container work is pure RIFF
# chunk plumbing (hdrl: avih + strl(strh/strf), movi: 00dc chunks, idx1)
# and the pixel work reuses encode_jpeg/decode_jpeg above. This is REAL
# compressed video — inter-frame-free, but a format actual capture
# hardware and OpenCV emit — closing the "compressed video containers are
# fake-only" boundary for one genuine codec.


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def encode_avi_mjpeg(
    frames: np.ndarray, fps: int = 25, quality: int = 90
) -> bytes:
    """(n, h, w) luma or (n, h, w, 3) RGB uint8 → MJPEG AVI bytes."""
    n, h, w = frames.shape[:3]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_sz = max((len(j) for j in jpegs), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, max_sz * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_sz, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n, max_sz, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = _riff_chunk(
        b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_body = bytearray(b"movi")
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(j))
        movi_body += _riff_chunk(b"00dc", j)
    movi = _riff_chunk(b"LIST", bytes(movi_body))
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[list[np.ndarray], int, int]:
    """MJPEG AVI → (frames, fps_num, fps_den). Frames are whatever
    decode_jpeg yields per stored image ((h, w) luma or (h, w, 3) RGB)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    rate, scale = None, None
    frames: list[np.ndarray] = []

    def walk(buf: bytes) -> None:
        nonlocal rate, scale
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
            if tag == b"LIST":
                walk(body[4:])
            elif tag == b"strh" and body[:4] == b"vids":
                scale, rate = struct.unpack_from("<II", body, 20)
            elif tag[2:] in (b"dc", b"db") and body[:3] == b"\xff\xd8\xff":
                frames.append(decode_jpeg(body))

    walk(data[12:])
    if rate is None or scale is None or scale == 0:
        raise ValueError("AVI missing a vids stream header")
    return frames, rate, scale


# --------------------------------------------------------------------------
# JPEG (baseline DCT, ITU-T T.81 / JFIF)
#
# Decoder: general baseline — SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS parsing,
# 1- or 3-component scans, per-component sampling factors up to 2 (4:4:4,
# 4:2:2, 4:2:0), restart markers, 0xFF00 byte unstuffing, Huffman tables
# read from the stream. Pure numpy IDCT (8×8 DCT-II matrix).
#
# Encoder: baseline 4:4:4 (or 4:2:0 via ``subsample=True``) with
# quality-scaled Annex-K quantization tables and simple VALID canonical
# Huffman tables (all 12 DC symbols at 4 bits, all 162 AC symbols at
# 8 bits) — compression is modest but the stream is fully spec-conformant,
# and the decoder reads whatever DHT a real encoder would write instead.


def _zigzag() -> np.ndarray:
    """Scan-order → raster-index mapping, generated (not transcribed)."""
    out = []
    for d in range(15):
        for i in range(d + 1):
            r = i if d % 2 else d - i
            c = d - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag()

# Annex K example luminance/chrominance quantization tables (raster order)
_QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QCHR = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64,
)


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → per-entry divisors in [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = np.cos((2 * x + 1) * u * np.pi / 16.0) * 0.5
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m  # F = M @ f @ M.T ; f = M.T @ F @ M


_DCT = _dct_matrix()

# Encoder Huffman layout: BITS[i] = #codes of length i+1 (DHT wire format).
# 12 DC size categories at 4 bits each (code 11 < 0b1111: the all-ones
# code stays unused, as T.81 requires); 162 AC (run, size) symbols at
# 8 bits each (code 161 < 0xFF).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): symbol → (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for bit-serial decoding."""
    return {(ln, c): s for s, (c, ln) in _huff_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        # truncate the accumulator to the pending bits — an unmasked
        # Python bigint grows one bit per bit ever written and turns
        # encoding quadratic in output size
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1-bits per spec


def _fwd_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(H, W) plane (multiple of 8) → (n_blocks, 64) quantized zigzag
    coefficients, fully vectorized (one einsum DCT over all blocks)."""
    h, w = plane.shape
    f = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(
        np.float64
    ) - 128.0
    coef = np.einsum("ux,nmxy,vy->nmuv", _DCT, f, _DCT)
    q = np.round(coef.reshape(-1, 64) / quant[np.newaxis, :]).astype(np.int64)
    return q[:, _ZZ]


def _cat(v: int) -> int:
    """Size category: minimal bit length of |v| (0 for v == 0)."""
    return int(v != 0 and int(abs(v)).bit_length())


def _encode_plane_block(
    bw: _BitWriter, zz: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    diff = int(zz[0]) - pred
    s = _cat(diff)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _cat(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
    return int(zz[0])


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _jpeg_prepare(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half (baseline + progressive): color convert,
    optional 4:2:0 chroma subsample, MCU padding, per-component quantized
    zigzag blocks in MCU-raster block order."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scale_quant(_QLUM, quality)
    qc = _scale_quant(_QCHR, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        tqs = [0]
    else:
        rgb = img[:, :, :3].astype(np.float64)
        y = rgb @ [0.299, 0.587, 0.114]
        cb = 128.0 + rgb @ [-0.168736, -0.331264, 0.5]
        cr = 128.0 + rgb @ [0.5, -0.418688, -0.081312]
        if subsample:
            cbp = _pad_to(cb, 2)
            crp = _pad_to(cr, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        tqs = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component quantized zigzag blocks, in MCU-raster block order
    comp_blocks = []
    for plane, (sh, sv), tq in zip(planes, samp, tqs):
        p = np.clip(plane, 0, 255)
        p = np.pad(
            p,
            ((0, mcuy * sv * 8 - p.shape[0]), (0, mcux * sh * 8 - p.shape[1])),
            mode="edge",
        )
        comp_blocks.append(
            (_fwd_blocks(p, ql if tq == 0 else qc), sh, sv, mcux * sh)
        )
    return gray, h, w, ql, qc, samp, tqs, hmax, vmax, mcux, mcuy, comp_blocks


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) or (H, W) uint8 → baseline JFIF JPEG bytes.

    Color images are encoded as YCbCr (BT.601 full range), 4:4:4 by
    default or 4:2:0 with ``subsample=True`` (2×2-mean chroma, MCU of four
    luma blocks — exercises the decoder's general MCU path).
    ``restart_interval`` > 0 writes DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart resynchronization)."""
    (gray, h, w, ql, qc, samp, tqs, hmax, vmax, mcux, mcuy, comp_blocks) = (
        _jpeg_prepare(img, quality, subsample)
    )

    dc_codes = _huff_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _huff_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    preds = [0] * len(comp_blocks)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.flush()
                bw.buf += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                preds = [0] * len(comp_blocks)
            for ci, (blocks, sh, sv, bw_blocks) in enumerate(comp_blocks):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bw_blocks + (mx * sh + bx)
                        preds[ci] = _encode_plane_block(
                            bw, blocks[bi], preds[ci], dc_codes, ac_codes
                        )
            mcu_count += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql[_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qc[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comp_blocks))
    for ci, ((sh, sv), tq) in enumerate(zip(samp, tqs)):
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, tq)
    out += seg(0xFFC0, sof)
    out += seg(
        0xFFC4, b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    )
    out += seg(
        0xFFC4, b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comp_blocks)])
    for ci in range(len(comp_blocks)):
        sos += struct.pack(">BB", ci + 1, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (T.81 G.1.2.2)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_eobrun(bw: _BitWriter, ac_codes: dict, st: dict) -> None:
    """Flush a pending EOB run plus its buffered correction bits."""
    n = st["eobrun"]
    if n:
        cat = n.bit_length() - 1
        code, ln = ac_codes[cat << 4]
        bw.put(code, ln)
        if cat:
            bw.put(n - (1 << cat), cat)
        st["eobrun"] = 0
    for b in st["bits"]:
        bw.put(b, 1)
    st["bits"] = []


def _enc_ac_first(bw, zz, ss, se, al, ac_codes, st) -> None:
    """AC spectral-selection first pass (Ah=0) for one block."""
    r = 0
    for k in range(ss, se + 1):
        v = _pt_ac(int(zz[k]), al)
        if v == 0:
            r += 1
            continue
        _emit_eobrun(bw, ac_codes, st)
        while r > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            r -= 16
        s = _cat(v)
        code, ln = ac_codes[(r << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    if r:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, ac_codes, st)


def _enc_ac_refine(bw, zz, ss, se, al, ac_codes, st) -> None:
    """AC successive-approximation refinement (Ah=Al+1) for one block —
    the jcphuff encode_mcu_AC_refine correction-bit algorithm."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_k = ss - 1  # last newly-significant position (absv == 1)
    for i, k in enumerate(range(ss, se + 1)):
        if absv[i] == 1:
            eob_k = k
    r = 0
    br: list[int] = []  # this block's pending correction bits
    for i, k in enumerate(range(ss, se + 1)):
        temp = absv[i]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            _emit_eobrun(bw, ac_codes, st)
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            r -= 16
            for b in br:
                bw.put(b, 1)
            br = []
        if temp > 1:  # already significant: buffer its correction bit
            br.append(temp & 1)
            continue
        # newly significant (magnitude exactly 1 at this precision)
        _emit_eobrun(bw, ac_codes, st)
        code, ln = ac_codes[(r << 4) | 1]
        bw.put(code, ln)
        bw.put(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br:
            bw.put(b, 1)
        br = []
        r = 0
    if r or br:
        st["eobrun"] += 1
        st["bits"].extend(br)
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, ac_codes, st)


# Progressive AC table: baseline's symbols plus the EOBn run-length codes
# (0x10..0xE0) progressive EOB-run coding needs. 176 symbols, all 8 bits —
# canonical-valid (codes 0..175 < 255, all-ones stays unused per T.81).
_ENC_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS_PROG = (
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(H, W, 3) or (H, W) uint8 → PROGRESSIVE (SOF2) JFIF JPEG with the
    libjpeg-style scan script: interleaved DC first pass (Al=1), per-
    component AC spectral-selection first passes at Al=2 (bands 1–5 and
    6–63), two per-component AC refinement passes (Al=1 then 0), and a DC
    refinement pass — i.e. BOTH progressive mechanisms (spectral
    selection and successive approximation) are exercised. The quantized
    coefficients equal :func:`encode_jpeg`'s, so a full decode is pixel-
    identical to the baseline encoding of the same image."""
    (gray, h, w, ql, qc, samp, tqs, hmax, vmax, mcux, mcuy, comp_blocks) = (
        _jpeg_prepare(img, quality, subsample)
    )
    nc = len(comp_blocks)
    dc_codes = _huff_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _huff_codes(_ENC_AC_BITS_PROG, _ENC_AC_VALS_PROG)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += struct.pack(">BB", ci + 1, 0x00)
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql[_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qc[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, ((sh, sv), tq) in enumerate(zip(samp, tqs)):
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, tq)
    out += seg(0xFFC2, sof)  # SOF2: progressive Huffman
    out += seg(0xFFC4, b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += seg(
        0xFFC4, b"\x10" + bytes(_ENC_AC_BITS_PROG) + bytes(_ENC_AC_VALS_PROG)
    )

    # ---- scan 1: DC first pass, interleaved, Al=1 ----
    out += sos_header(list(range(nc)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (blocks, sh, sv, stride) in enumerate(comp_blocks):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * stride + (mx * sh + bx)
                        v = int(blocks[bi][0]) >> 1  # DC pt: arithmetic shift
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _cat(diff)
                        code, ln = dc_codes[s]
                        bw.put(code, ln)
                        if s:
                            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += bw.buf

    # per-component true rasters for the non-interleaved AC scans
    rasters = []
    for blocks, sh, sv, stride in comp_blocks:
        rows, cols = _comp_raster(h, w, sh, sv, hmax, vmax)
        rasters.append((blocks, stride, rows, cols))

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        blocks, stride, rows, cols = rasters[ci]
        bw = _BitWriter()
        st = {"eobrun": 0, "bits": []}
        enc = _enc_ac_first if ah == 0 else _enc_ac_refine
        for rrow in range(rows):
            for rcol in range(cols):
                enc(bw, blocks[rrow * stride + rcol], ss, se, al, ac_codes, st)
        _emit_eobrun(bw, ac_codes, st)
        bw.flush()
        return sos_header([ci], ss, se, ah, al) + bw.buf

    # ---- scans 2..: AC first passes at Al=2 (two spectral bands) ----
    for ci in range(nc):
        out += ac_scan(ci, 1, 5, 0, 2)
        out += ac_scan(ci, 6, 63, 0, 2)
    # ---- AC refinement passes: Al 2->1, then 1->0 ----
    for ci in range(nc):
        out += ac_scan(ci, 1, 63, 2, 1)
    for ci in range(nc):
        out += ac_scan(ci, 1, 63, 1, 0)
    # ---- DC refinement: interleaved, Ah=1 Al=0, raw bits ----
    out += sos_header(list(range(nc)), 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (blocks, sh, sv, stride) in enumerate(comp_blocks):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * stride + (mx * sh + bx)
                        bw.put(int(blocks[bi][0]) & 1, 1)
    bw.flush()
    out += bw.buf

    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Bit-serial reader over unstuffed entropy-coded bytes."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, lookup: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JFIF JPEG → (H, W, 3)
    uint8 (or (H, W) for grayscale). Progressive covers spectral
    selection and successive approximation (DC + AC refinement scans)."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → lookup
    frame = None
    restart_interval = 0
    progressive = False
    scans: list = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip padding before reading the marker code
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                o += 1
                if pq:
                    tbl = np.frombuffer(
                        body[o : o + 128], dtype=">u2"
                    ).astype(np.int64)
                    o += 128
                else:
                    tbl = np.frombuffer(
                        body[o : o + 64], dtype=np.uint8
                    ).astype(np.int64)
                    o += 64
                raster = np.empty(64, dtype=np.int64)
                raster[_ZZ] = tbl
                quant[tq] = raster
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                huff[(tc, th)] = _huff_lookup(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker == 0xC3 or 0xC5 <= marker <= 0xCF:
            raise ValueError("only baseline/progressive Huffman JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            # entropy-coded data: up to the next non-RST/non-stuffing marker
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] != 0x00 and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            # snapshot the Huffman tables + DRI in force AT THIS SCAN —
            # progressive streams may redefine them between scans
            scans.append(
                (
                    scan_comps,
                    int(ss),
                    int(se),
                    ahal >> 4,
                    ahal & 15,
                    data[pos:end],
                    dict(huff),
                    restart_interval,
                )
            )
            pos = end
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    if progressive:
        return _decode_progressive(frame, scans, quant)
    if len(scans) > 1:
        # a second scan means non-interleaved multi-scan baseline (or DNL
        # tricks) — decoding only one scan would return garbage pixels
        # silently; fail loudly instead
        raise ValueError(
            "multi-scan baseline JPEG not supported (single "
            "interleaved SOS only)"
        )

    fh, fw, comps = frame
    scan_comps, _ss, _se, _ah, _al, entropy, huff, restart_interval = scans[0]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes = {
        cid: np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.float64)
        for cid, h, v, _ in comps
    }

    # split at restart markers, unstuff each interval
    segments = []
    seg_start = 0
    i = 0
    while i < len(entropy) - 1:
        if entropy[i] == 0xFF and 0xD0 <= entropy[i + 1] <= 0xD7:
            segments.append(entropy[seg_start:i])
            seg_start = i + 2
            i += 2
        else:
            i += 1
    segments.append(entropy[seg_start:])
    readers = [
        _BitReader(s.replace(b"\xff\x00", b"\xff")) for s in segments
    ]

    seg_i = 0
    br = readers[0]
    preds = {cid: 0 for cid, _, _ in scan_comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_i += 1
                br = readers[seg_i]
                preds = {cid: 0 for cid in preds}
            for cid, td, ta in scan_comps:
                _, ch, cv, tq = by_id[cid]
                qt = quant[tq]
                dc_lut = huff[(0, td)]
                ac_lut = huff[(1, ta)]
                for by in range(cv):
                    for bx in range(ch):
                        coef = np.zeros(64, dtype=np.float64)
                        s = br.decode(dc_lut)
                        diff = _extend(br.receive(s), s) if s else 0
                        preds[cid] += diff
                        coef[0] = preds[cid] * qt[0]
                        k = 1
                        while k <= 63:
                            rs = br.decode(ac_lut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[_ZZ[k]] = (
                                _extend(br.receive(s), s) * qt[_ZZ[k]]
                            )
                            k += 1
                        blk = _DCT.T @ coef.reshape(8, 8) @ _DCT + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    return _jpeg_finish(planes, comps, hmax, vmax, fh, fw)


def _jpeg_finish(
    planes: dict, comps: list, hmax: int, vmax: int, fh: int, fw: int
) -> np.ndarray:
    """Shared decoder back half: chroma upsample, crop, YCbCr → RGB."""
    out_planes = []
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        if ch < hmax or cv < vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:fh, :fw])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _comp_raster(fh: int, fw: int, sh: int, sv: int, hmax: int, vmax: int):
    """True (non-MCU-padded) data-unit raster of one component for
    non-interleaved scans: (block rows, block cols)."""
    cw = -(-(fw * sh) // hmax)
    ch = -(-(fh * sv) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _split_restarts(entropy: bytes) -> list["_BitReader"]:
    """Split entropy data at RSTn markers and unstuff each interval."""
    segments = []
    seg_start = 0
    i = 0
    while i < len(entropy) - 1:
        if entropy[i] == 0xFF and 0xD0 <= entropy[i + 1] <= 0xD7:
            segments.append(entropy[seg_start:i])
            seg_start = i + 2
            i += 2
        else:
            i += 1
    segments.append(entropy[seg_start:])
    return [_BitReader(s.replace(b"\xff\x00", b"\xff")) for s in segments]


def _decode_progressive(frame, scans, quant) -> np.ndarray:
    """Progressive (SOF2) Huffman JPEG: accumulate dequantized-domain
    COEFFICIENTS across scans (spectral selection bands, DC/AC successive
    approximation first + refinement passes — the T.81 G.2 / libjpeg
    jdphuff algorithms), then one vectorized IDCT over every block."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    # raw (quantizer-free) coefficients in NATURAL (raster) order, over the
    # MCU-padded block raster, stride = mcux*sh blocks per row
    coefs = {
        cid: np.zeros((mcuy * sv * mcux * sh, 64), dtype=np.int64)
        for cid, sh, sv, _ in comps
    }

    for scan_comps, ss, se, ah, al, entropy, huff, ri in scans:
        readers = _split_restarts(entropy)
        seg_i = 0
        br = readers[0]
        st = {"eobrun": 0}
        preds = {cid: 0 for cid, _, _ in scan_comps}

        def _next_segment():
            nonlocal seg_i, br
            seg_i += 1
            br = readers[seg_i]
            st["eobrun"] = 0
            for c in preds:
                preds[c] = 0

        if len(scan_comps) > 1 or (ss == 0 and len(scan_comps) == len(comps)):
            # interleaved scan (DC only, per T.81): MCU raster order
            if ss != 0 or se != 0:
                raise ValueError("interleaved progressive AC scan is illegal")
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and unit and unit % ri == 0:
                        _next_segment()
                    for cid, td, _ta in scan_comps:
                        _, sh, sv, _tq = by_id[cid]
                        lut = huff[(0, td)]
                        arr = coefs[cid]
                        stride = mcux * sh
                        for iy in range(sv):
                            for ix in range(sh):
                                bi = (my * sv + iy) * stride + (mx * sh + ix)
                                if ah == 0:
                                    s = br.decode(lut)
                                    diff = _extend(br.receive(s), s) if s else 0
                                    preds[cid] += diff
                                    arr[bi, 0] = preds[cid] << al
                                else:
                                    if br.bit():
                                        arr[bi, 0] |= 1 << al
                    unit += 1
        else:
            # non-interleaved scan: one component, its true block raster
            cid, td, ta = scan_comps[0]
            _, sh, sv, _tq = by_id[cid]
            rows, cols = _comp_raster(fh, fw, sh, sv, hmax, vmax)
            stride = mcux * sh
            arr = coefs[cid]
            zz_nat = _ZZ  # zigzag index k -> natural index
            unit = 0
            for rrow in range(rows):
                for rcol in range(cols):
                    if ri and unit and unit % ri == 0:
                        _next_segment()
                    bi = rrow * stride + rcol
                    blk = arr[bi]
                    if ss == 0:
                        # non-interleaved DC scan
                        if ah == 0:
                            lut = huff[(0, td)]
                            s = br.decode(lut)
                            diff = _extend(br.receive(s), s) if s else 0
                            preds[cid] += diff
                            blk[0] = preds[cid] << al
                        else:
                            if br.bit():
                                blk[0] |= 1 << al
                    elif ah == 0:
                        _dec_ac_first(br, blk, ss, se, al, huff[(1, ta)], st, zz_nat)
                    else:
                        _dec_ac_refine(br, blk, ss, se, al, huff[(1, ta)], st, zz_nat)
                    unit += 1

    # dequantize + one einsum IDCT over all blocks per component
    planes = {}
    for cid, sh, sv, tq in comps:
        qt = quant[tq]
        stride = mcux * sh
        nrows = mcuy * sv
        c = (coefs[cid] * qt[np.newaxis, :]).astype(np.float64)
        c = c.reshape(nrows, stride, 8, 8)
        px = np.einsum("xu,nmuv,yv->nxmy", _DCT.T, c, _DCT.T) + 128.0
        planes[cid] = px.reshape(nrows * 8, stride * 8)
    return _jpeg_finish(planes, comps, hmax, vmax, fh, fw)


def _dec_ac_first(br, blk, ss, se, al, lut, st, zz_nat) -> None:
    """AC spectral-selection first pass (Ah=0): EOB-run coding."""
    if st["eobrun"] > 0:
        st["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode(lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                st["eobrun"] = (1 << r) - 1
                if r:
                    st["eobrun"] += br.receive(r)
                return
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("progressive JPEG AC index overflow")
        blk[zz_nat[k]] = _extend(br.receive(s), s) << al
        k += 1


def _dec_ac_refine(br, blk, ss, se, al, lut, st, zz_nat) -> None:
    """AC successive-approximation refinement (Ah=Al+1): correction bits
    on history-nonzero coefficients, ±1<<Al for newly significant ones
    (T.81 G.2 / jdphuff decode_mcu_AC_refine)."""
    p1 = np.int64(1) << al
    m1 = -p1
    k = ss
    if st["eobrun"] == 0:
        while k <= se:
            rs = br.decode(lut)
            r, s = rs >> 4, rs & 15
            if s:
                val = p1 if br.bit() else m1
            else:
                if r != 15:
                    st["eobrun"] = 1 << r
                    if r:
                        st["eobrun"] += br.receive(r)
                    break
                val = np.int64(0)  # ZRL: pass over 16 zero-history coeffs
            while k <= se:
                z = zz_nat[k]
                if blk[z] != 0:
                    if br.bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                blk[zz_nat[k]] = val
            k += 1
    if st["eobrun"] > 0:
        while k <= se:
            z = zz_nat[k]
            if blk[z] != 0:
                if br.bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        st["eobrun"] -= 1


# --------------------------------------------------------------------------
# GIF (87a/89a, LZW) — single-frame decode (first frame of an animation),
# global/local color tables, interlacing, transparency ignored (composited
# against the first palette entry is out of scope for feature extraction).


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    CLEAR/EOI codes, dictionary grows to 4095 then freezes until CLEAR."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    pos = 0

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1, None

    table, width, prev = reset()
    next_code = eoi + 1
    while n_out < n_pixels and pos + width <= len(bits):
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            table, width, prev = reset()
            next_code = eoi + 1
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF pixel data truncated")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (dict of byte-strings; emits CLEAR at start
    and on dictionary overflow, EOI at end)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []

    def emit(code: int, width: int) -> None:
        for i in range(width):
            out_bits.append((code >> i) & 1)

    table = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    cur = b""
    for px in indices.astype(np.uint8).tobytes():
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        cur = bytes([px])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    packed = np.packbits(
        np.array(out_bits, dtype=np.uint8), bitorder="little"
    ).tobytes()
    return packed


def encode_gif(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → single-frame GIF89a with a 256-entry global color
    table built by 3-3-2 bit quantization (deterministic; lossy like any
    ≤256-color GIF)."""
    h, w, _ = img.shape
    # 3-3-2 palette: index = rrrgggbb
    idx = (
        (img[:, :, 0] >> 5).astype(np.uint8) << 5
        | (img[:, :, 1] >> 5).astype(np.uint8) << 2
        | (img[:, :, 2] >> 6).astype(np.uint8)
    )
    pal = np.zeros((256, 3), dtype=np.uint8)
    codes = np.arange(256, dtype=np.uint16)
    pal[:, 0] = ((codes >> 5) & 7) * 255 // 7
    pal[:, 1] = ((codes >> 2) & 7) * 255 // 7
    pal[:, 2] = (codes & 3) * 255 // 3
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out += bytes([8])  # LZW min code size
    lzw = _lzw_encode(idx.reshape(-1), 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a → (H, W, 3) uint8 (first image block only)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            x0, y0, iw, ih, iflags = struct.unpack(
                "<HHHHB", data[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(lzw), min_code, iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                rows = np.concatenate(
                    [np.arange(0, ih, 8), np.arange(4, ih, 8),
                     np.arange(2, ih, 4), np.arange(1, ih, 2)]
                )
                deinter = np.empty_like(idx)
                deinter[rows] = idx
                idx = deinter
            img = pal[np.minimum(idx, len(pal) - 1)]
            full = np.zeros((h, w, 3), dtype=np.uint8)
            full[y0 : y0 + ih, x0 : x0 + iw] = img[: h - y0, : w - x0]
            return full
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image block")


# --------------------------------------------------------------------------
# Sniffing


def sniff_format(data: bytes) -> str | None:
    """Container detection by magic bytes; None = needs external codecs."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"P6"):
        return "ppm"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"qoif":
        return "qoi"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:4] == b"fLaC":
        return "flac"
    if data.startswith(b"YUV4MPEG2 "):
        return "y4m"
    return None


# --------------------------------------------------------------------------
# QOI (Quite OK Image format, qoiformat.org — public single-page spec):
# byte-oriented lossless RGB(A) with a 64-slot running hash index,
# delta/luma ops and run-length packing. Small enough to implement exactly
# and fast enough to be a realistic lossless interchange format for the
# multimodal decode stage.

_QOI_MAGIC = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"


def encode_qoi(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image as QOI (channels=3,
    colorspace=0). Sequential per-pixel loop — encode is test-fixture
    machinery, decode is the operator-side kernel."""
    import struct

    h, w, _ = img.shape
    out = bytearray()
    out += _QOI_MAGIC + struct.pack(">IIBB", w, h, 3, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa_ = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, 3)
    for r, g, b in flat:
        r, g, b = int(r), int(g), int(b)
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
        else:
            if run:
                out.append(0xC0 | (run - 1))
                run = 0
            k = (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
            if index[k] == (r, g, b, 255):
                out.append(k)
            else:
                index[k] = (r, g, b, 255)
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                else:
                    dr_dg = dr - dg
                    db_dg = db - dg
                    if -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                        out.append(0x80 | (dg + 32))
                        out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                    else:
                        out += bytes((0xFE, r, g, b))
            pr, pg, pb = r, g, b
        # index slot is also refreshed on RUN start in the spec only when
        # the pixel was emitted; runs repeat the previous pixel whose slot
        # is already current
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)


def decode_qoi(data: bytes) -> np.ndarray:
    """Decode QOI to (h, w, 3) uint8 RGB (alpha dropped if channels=4).
    Full spec: RGB/RGBA literals, INDEX, DIFF, LUMA, RUN, 64-slot hash
    index, 8-byte end marker."""
    import struct

    if data[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI stream")
    w, h, channels, _cs = struct.unpack(">IIBB", data[4:14])
    n_px = w * h
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = np.zeros((64, 4), dtype=np.uint8)
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    mv = data
    while i < n_px:
        byte = mv[pos]
        pos += 1
        if byte == 0xFE:  # RGB
            r, g, b = mv[pos], mv[pos + 1], mv[pos + 2]
            pos += 3
        elif byte == 0xFF:  # RGBA
            r, g, b, a = mv[pos], mv[pos + 1], mv[pos + 2], mv[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # INDEX
                r, g, b, a = index[byte]
            elif tag == 1:  # DIFF
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == 2:  # LUMA
                dg = (byte & 0x3F) - 32
                nxt = mv[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0x0F) - 8) % 256
            else:  # RUN
                run = (byte & 0x3F) + 1
                out[i : i + run] = (r, g, b, a)
                i += run
                continue
        index[(int(r) * 3 + int(g) * 5 + int(b) * 7 + int(a) * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[pos : pos + 8] != _QOI_END:
        raise ValueError("QOI stream missing end marker")
    rgb = out[:, :3].reshape(h, w, 4 - 1) if channels in (3, 4) else None
    if rgb is None:
        raise ValueError(f"unsupported QOI channels={channels}")
    return rgb
