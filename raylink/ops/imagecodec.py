"""Pure-stdlib image + audio codecs for the multimodal decode kernels.

No image/audio libraries exist in this sandbox, but three image container
formats are decodable with nothing beyond ``zlib``/``struct``/numpy —
binary PPM (P6), uncompressed 24-bit BMP, and non-interlaced 8-bit PNG
(zlib inflate + the five scanline filters) — and PCM WAV needs only
``struct``. These make ``DecodeImage``/``ExtractAudioFeatures`` REAL
kernels for the formats a deterministic pipeline can produce; compressed
formats that genuinely need external codecs (JPEG, MP3/AAC, video) remain
behind the documented fake path.

Encoders are provided too so tests and the gate can generate real payloads
deterministically (PNG encoding = filter-0 scanlines + zlib + CRC chunks).
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
# WAV (PCM 16-bit mono/stereo)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n,) int16 mono PCM → WAV."""
    assert samples.dtype == np.int16
    body = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV → ((n, channels) float64 in [-1, 1], sample_rate). PCM 16-bit."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
        elif tag == b"data":
            pcm = body
    if pcm is None or rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(pcm, dtype=np.int16).astype(np.float64) / 32768.0
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
# Sniffing


def sniff_format(data: bytes) -> str | None:
    """Container detection by magic bytes; None = needs external codecs."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"P6"):
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data.startswith(b"YUV4MPEG2 "):
        return "y4m"
    return None
