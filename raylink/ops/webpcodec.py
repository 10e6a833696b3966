"""Pure-stdlib WebP-lossless (VP8L) codec.

Implements the public "WebP Lossless Bitstream Specification"
(webmproject.org / RFC 9649 container) with nothing beyond ``struct``
and numpy: the RIFF/VP8X container walk, the LSB-first bit stream,
simple + normal (code-length-coded) canonical prefix codes, the
meta-prefix (entropy image) grouping, the color cache, LZ77 backward
references with the 120-entry 2D distance map, and all four transforms
(predictor ×14 modes, cross-color, subtract-green, color-indexing with
pixel bundling) — the complete lossless decode surface, so a real
``cwebp -lossless`` file decodes to pixels here.

Lossy WebP (``VP8 `` chunks — boolean arithmetic coder + loop filter)
stays behind the documented fake path in :mod:`raylink.ops.multimodal`.

An encoder is included so tests and the media gate can generate real
VP8L payloads deterministically (each transform, the color cache, RLE
backrefs and multi-group meta coding can be forced on, which is how the
decoder's branches are round-trip-tested without external tools).

Reference parity note: the reference repo (fuzzylink, R) has no media
surface at all; this module serves the training-data-pipeline scope the
build brief adds on top of it (multimodal columns).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# --------------------------------------------------------------------------
# constants from the spec
# --------------------------------------------------------------------------

_SIG = 0x2F  # VP8L signature byte
# order in which code-length-code lengths are transmitted
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_CLC_REPEAT_EXTRA = {16: 2, 17: 3, 18: 7}
_CLC_REPEAT_OFFSET = {16: 3, 17: 3, 18: 11}
_NUM_LENGTH_CODES = 24  # LZ77 length prefix codes appended to the green alphabet
_NUM_DISTANCE_CODES = 40
_CACHE_BASE = 256 + _NUM_LENGTH_CODES  # first color-cache symbol in green
_HASH_MUL = 0x1E35A7BD

# 2D distance map: LZ77 plane codes 1..120 address the recent 2-D pixel
# neighborhood (sorted near-to-far); codes >120 are direct distances
# minus 120. Entry byte: yoffset = b >> 4, xoffset = 8 - (b & 0xF).
_CODE_TO_PLANE = (
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
)

_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEXING = 0, 1, 2, 3


def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
    if plane_code > len(_CODE_TO_PLANE):
        return plane_code - len(_CODE_TO_PLANE)
    b = _CODE_TO_PLANE[plane_code - 1]
    dist = (b >> 4) * xsize + (8 - (b & 0xF))
    return dist if dist >= 1 else 1


# --------------------------------------------------------------------------
# LSB-first bit IO
# --------------------------------------------------------------------------


class _LSBReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            byte = d[(p + i) >> 3]
            v |= ((byte >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v


class _LSBWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are transmitted MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


# --------------------------------------------------------------------------
# canonical prefix codes
# --------------------------------------------------------------------------


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order (length asc, symbol asc)."""
    syms = sorted((l, s) for s, l in lengths.items() if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in syms:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _PrefixDecoder:
    """Decode one symbol at a time by accumulating MSB-first code bits."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: dict[int, int]):
        nz = {s: l for s, l in lengths.items() if l > 0}
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        self.single = next(iter(nz)) if len(nz) == 1 else None
        self.table = {
            (l, c): s for s, (c, l) in _canonical_codes(nz).items()
        }

    @classmethod
    def explicit(cls, pairs: dict[int, tuple[int, int]], single=None):
        o = cls.__new__(cls)
        o.single = single
        o.table = {(l, c): s for s, (c, l) in pairs.items()}
        return o

    def read(self, br: _LSBReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        length = 0
        t = self.table
        while True:
            acc = (acc << 1) | br.read(1)
            length += 1
            s = t.get((length, acc))
            if s is not None:
                return s
            if length > 15:
                raise ValueError("corrupt prefix stream")


def _read_prefix_code(br: _LSBReader, alphabet_size: int) -> _PrefixDecoder:
    if br.read(1):  # simple code: 1 or 2 symbols, explicit
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            return _PrefixDecoder.explicit({}, single=s0)
        s1 = br.read(8)
        # two 1-bit codes, assigned canonically by symbol value (libwebp
        # builds the table from code lengths, so transmitted order is
        # irrelevant)
        lo, hi = (s0, s1) if s0 <= s1 else (s1, s0)
        return _PrefixDecoder.explicit({lo: (0, 1), hi: (1, 1)})
    # normal: code lengths are themselves prefix-coded
    num_clc = 4 + br.read(4)
    clc_lengths: dict[int, int] = {}
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixDecoder({s: l for s, l in clc_lengths.items() if l > 0})
    if br.read(1):  # explicit max-symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    symbol = 0
    prev_code_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            if code_len:
                lengths[symbol] = code_len
                prev_code_len = code_len
            symbol += 1
        else:
            repeat = br.read(_CLC_REPEAT_EXTRA[code_len]) + _CLC_REPEAT_OFFSET[code_len]
            if symbol + repeat > alphabet_size:
                raise ValueError("corrupt code-length stream")
            if code_len == 16:
                for _ in range(repeat):
                    lengths[symbol] = prev_code_len
                    symbol += 1
            else:
                symbol += repeat
    return _PrefixDecoder(lengths)


# --------------------------------------------------------------------------
# LZ77 prefix-value coding (lengths and distances share the scheme)
# --------------------------------------------------------------------------


def _prefix_value_decode(br: _LSBReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_value_encode(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    for p in range(4, 40):
        extra = (p - 2) >> 1
        offset = (2 + (p & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return p, value - offset - 1, extra
    raise ValueError(f"value {value} out of prefix range")


# --------------------------------------------------------------------------
# entropy-coded image (the core of VP8L; used for the main image and for
# every sub-image: transform data, entropy image, palette)
# --------------------------------------------------------------------------


def _decode_image_stream(
    br: _LSBReader, w: int, h: int, is_level0: bool
) -> tuple[np.ndarray, list]:
    """Returns (argb uint32 array of w*h, transforms list).

    Transforms only exist at level 0; each entry is
    (type, size_bits, data_argb) or (type,) for subtract-green, or
    (type, palette_argb, width_bits, packed_w) for color indexing.
    """
    transforms: list = []
    xsize = w
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype == _T_SUBTRACT_GREEN:
                transforms.append((ttype,))
            elif ttype in (_T_PREDICTOR, _T_COLOR):
                size_bits = br.read(3) + 2
                tw = (xsize + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                data, _ = _decode_image_stream(br, tw, th, False)
                transforms.append((ttype, size_bits, data))
            elif ttype == _T_COLOR_INDEXING:
                palette_size = br.read(8) + 1
                pal, _ = _decode_image_stream(br, palette_size, 1, False)
                # entries are per-channel deltas from the previous entry
                pal = (
                    np.cumsum(
                        pal.view(np.uint8).reshape(-1, 4).astype(np.int64), axis=0
                    )
                    & 0xFF
                ).astype(np.uint8).reshape(-1, 4).copy().view(np.uint32).reshape(-1)
                if palette_size <= 2:
                    width_bits = 3
                elif palette_size <= 4:
                    width_bits = 2
                elif palette_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                packed_w = (xsize + (1 << width_bits) - 1) >> width_bits
                transforms.append((ttype, pal, width_bits, xsize))
                xsize = packed_w  # pixel data is decoded at the packed width
            else:  # pragma: no cover - read(2) is exhaustive
                raise ValueError("bad transform type")

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix groups (level-0 only)
    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img, _ = _decode_image_stream(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1

    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, _NUM_DISTANCE_CODES),
            )
        )

    n = xsize * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    mw = (xsize + (1 << meta_bits) - 1) >> meta_bits if meta is not None else 0
    while pos < n:
        x = pos % xsize
        y = pos // xsize
        if meta is not None:
            g = groups[int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:  # literal
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < _CACHE_BASE:  # LZ77 backward reference
            length = _prefix_value_decode(br, s - 256)
            dist_sym = g[4].read(br)
            plane = _prefix_value_decode(br, dist_sym)
            dist = _plane_code_to_distance(xsize, plane)
            if dist > pos or pos + length > n:
                raise ValueError("corrupt backward reference")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            out[pos] = cache[s - _CACHE_BASE]
            pos += 1
    return out, transforms


# --------------------------------------------------------------------------
# inverse transforms
# --------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.uint16) + b.astype(np.uint16)) >> 1


_BLACK = np.array([0xFF, 0, 0, 0], dtype=np.int64)  # (a, r, g, b)


def _predict_pixel(ref: np.ndarray, y: int, x: int, w: int, mode: int) -> np.ndarray:
    """Spec predictor for the interior (y>0, x>0); ``ref`` holds the
    neighbor pixels (reconstructed on decode, original on encode — for a
    lossless codec they are the same values)."""
    L = ref[y, x - 1]
    T = ref[y - 1, x]
    TL = ref[y - 1, x - 1]
    # top-right of the last column wraps (contiguous-buffer semantics
    # from the spec): the current row's first pixel
    TR = ref[y - 1, x + 1] if x + 1 < w else ref[y, 0]
    if mode == 0:
        return _BLACK
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        pL = int(np.abs(T - TL).sum())
        pT = int(np.abs(L - TL).sum())
        return L if pL < pT else T
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        ave = _avg2(L, T).astype(np.int64)
        d = ave - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))  # C trunc-toward-zero
        return np.clip(ave + half, 0, 255)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(channels: np.ndarray, size_bits: int, tdata: np.ndarray) -> None:
    """channels: (h, w, 4) uint8 residuals, reconstructed in place."""
    h, w, _ = channels.shape
    tw = (w + (1 << size_bits) - 1) >> size_bits
    modes = ((tdata >> 8) & 0xFF).astype(np.int64)
    c = channels.astype(np.int64)
    out = np.zeros_like(c)
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = _BLACK
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                m = int(modes[(y >> size_bits) * tw + (x >> size_bits)])
                pred = _predict_pixel(out, y, x, w, m)
            out[y, x] = (c[y, x] + pred) & 0xFF
    channels[:] = out.astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """signed 3.5 fixed-point color-transform delta, vectorized."""
    ts = t.astype(np.int64)
    ts = np.where(ts > 127, ts - 256, ts)
    cs = c.astype(np.int64)
    cs = np.where(cs > 127, cs - 256, cs)
    return (ts * cs) >> 5


def _inv_color_transform(
    channels: np.ndarray, size_bits: int, tdata: np.ndarray
) -> None:
    h, w, _ = channels.shape
    tw = (w + (1 << size_bits) - 1) >> size_bits
    tile = tdata.reshape(-1)
    ty = np.arange(h)[:, None] >> size_bits
    tx = np.arange(w)[None, :] >> size_bits
    elem = tile[ty * tw + tx]  # (h, w) uint32
    g2r = elem & 0xFF
    g2b = (elem >> 8) & 0xFF
    r2b = (elem >> 16) & 0xFF
    g = channels[:, :, 2]
    r = (channels[:, :, 1].astype(np.int64) + _ct_delta(g2r, g)) & 0xFF
    b = (
        channels[:, :, 3].astype(np.int64)
        + _ct_delta(g2b, g)
        + _ct_delta(r2b, r.astype(np.uint8))
    ) & 0xFF
    channels[:, :, 1] = r.astype(np.uint8)
    channels[:, :, 3] = b.astype(np.uint8)


def _apply_inverse_transforms(
    argb: np.ndarray, w: int, h: int, transforms: list
) -> np.ndarray:
    """argb: flat uint32 at the (possibly packed) decode width. Returns the
    full-size (h, w) uint32 image after undoing transforms in reverse
    stream order."""
    for t in reversed(transforms):
        if t[0] == _T_COLOR_INDEXING:
            pal, width_bits, full_w = t[1], t[2], t[3]
            packed_w = (full_w + (1 << width_bits) - 1) >> width_bits
            idx_img = (argb.reshape(h, packed_w) >> 8) & 0xFF
            bits = 8 >> width_bits
            mask = (1 << bits) - 1
            sub = np.arange(full_w) & ((1 << width_bits) - 1)
            shift = (sub * bits).astype(np.uint32)
            packed = idx_img[:, np.arange(full_w) >> width_bits]
            idx = (packed >> shift[None, :]) & mask
            safe = np.where(idx < len(pal), idx, 0)
            px = pal[safe]
            px = np.where(idx < len(pal), px, 0)
            argb = px.astype(np.uint32).reshape(-1)
        elif t[0] == _T_SUBTRACT_GREEN:
            ch = _to_channels(argb, h)
            g = ch[:, :, 2].astype(np.uint16)
            ch[:, :, 1] = ((ch[:, :, 1] + g) & 0xFF).astype(np.uint8)
            ch[:, :, 3] = ((ch[:, :, 3] + g) & 0xFF).astype(np.uint8)
            argb = _from_channels(ch)
        elif t[0] == _T_PREDICTOR:
            ch = _to_channels(argb, h)
            _inv_predictor(ch, t[1], t[2])
            argb = _from_channels(ch)
        elif t[0] == _T_COLOR:
            ch = _to_channels(argb, h)
            _inv_color_transform(ch, t[1], t[2])
            argb = _from_channels(ch)
    return argb.reshape(h, w)


def _to_channels(argb: np.ndarray, h: int) -> np.ndarray:
    """flat uint32 -> (h, w, 4) uint8 in (a, r, g, b) order."""
    a = argb.reshape(h, -1)
    return np.stack(
        [(a >> 24) & 0xFF, (a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF], axis=2
    ).astype(np.uint8)


def _from_channels(ch: np.ndarray) -> np.ndarray:
    c = ch.astype(np.uint32)
    return (
        (c[:, :, 0] << 24) | (c[:, :, 1] << 16) | (c[:, :, 2] << 8) | c[:, :, 3]
    ).reshape(-1)


# --------------------------------------------------------------------------
# public decode
# --------------------------------------------------------------------------


def decode_webp(data: bytes) -> np.ndarray:
    """WebP (lossless VP8L) → (H, W, 3) or (H, W, 4) uint8.

    Walks the RIFF container (plain or VP8X-extended) to the VP8L chunk;
    lossy ``VP8 `` payloads raise ``NotImplementedError`` (the documented
    sandbox codec boundary)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"VP8L":
            payload = body
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs codecs not in this sandbox"
            )
    if payload is None:
        raise ValueError("no VP8L chunk")
    if payload[0] != _SIG:
        raise ValueError("bad VP8L signature")
    br = _LSBReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    argb, transforms = _decode_image_stream(br, w, h, True)
    img = _apply_inverse_transforms(argb, w, h, transforms)
    ch = _to_channels(img.reshape(-1), h)  # (h, w, 4) a,r,g,b
    rgb = ch[:, :, [1, 2, 3]]
    if alpha_hint and not bool((ch[:, :, 0] == 255).all()):
        return np.concatenate([rgb, ch[:, :, :1]], axis=2)
    return rgb


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _huffman_lengths(counts: dict[int, int], max_len: int = 15) -> dict[int, int]:
    items = [(c, s) for s, c in counts.items() if c > 0]
    if len(items) <= 2:
        return {s: 1 for _, s in items}
    heap = [(c, i, (s,)) for i, (c, s) in enumerate(items)]
    heapq.heapify(heap)
    nxt = len(heap)
    depth: dict[int, int] = {s: 0 for _, s in items}
    while len(heap) > 1:
        c1, _, g1 = heapq.heappop(heap)
        c2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, nxt, g1 + g2))
        nxt += 1
    if max(depth.values()) > max_len:
        # rare fallback: flat fixed-length code over the used symbols
        flat = max(1, (len(items) - 1).bit_length())
        return {s: flat for _, s in items}
    return depth


def _write_prefix_code(
    bw: _LSBWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Writes the code to the stream, returns symbol -> (code, length)."""
    nz = sorted(s for s, l in lengths.items() if l > 0)
    if len(nz) == 0:
        # degenerate: encode symbol 0 as a single-symbol simple code
        bw.write(1, 1)
        bw.write(0, 1)  # num_symbols - 1 = 0
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(0, 1)
        return {0: (0, 0)}
    if len(nz) <= 2 and max(nz) < 256:
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if nz[0] >= 2:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        else:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        if len(nz) == 1:
            return {nz[0]: (0, 0)}
        bw.write(nz[1], 8)
        return {nz[0]: (0, 1), nz[1]: (1, 1)}
    bw.write(0, 1)  # normal code
    last = max(nz)
    lens = [lengths.get(s, 0) for s in range(last + 1)]
    # code-length-code over the literal lengths used (no 16/17/18 repeats:
    # simplicity over density; these streams are test/gate scale)
    clc_counts: dict[int, int] = {}
    for l in lens:
        clc_counts[l] = clc_counts.get(l, 0) + 1
    clc_len = _huffman_lengths(clc_counts)
    if len(clc_len) == 1:
        # a lone code-length symbol still needs a 1-bit code to be readable
        clc_len = {next(iter(clc_len)): 1}
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19 (all, in _CLC_ORDER)
    for i in range(19):
        bw.write(clc_len.get(_CLC_ORDER[i], 0), 3)
    clc_codes = _canonical_codes(clc_len)
    # explicit symbol count so trailing zeros are implicit
    max_symbol = last + 1
    nbits_sel = 0
    while 2 + ((1 << (2 + 2 * nbits_sel)) - 1) < max_symbol:
        nbits_sel += 1
    bw.write(1, 1)
    bw.write(nbits_sel, 3)
    bw.write(max_symbol - 2, 2 + 2 * nbits_sel)
    for l in lens:
        if len(clc_codes) == 1:
            # single distinct length: canonical code is 0 of length 1
            c, cl = 0, 1
        else:
            c, cl = clc_codes[l]
        bw.write_code(c, cl)
    return _canonical_codes({s: l for s, l in lengths.items() if l > 0})


def _tokenize(
    argb: np.ndarray,
    xsize: int,
    cache_bits: int,
    use_rle: bool,
) -> list[tuple]:
    """Pixel stream -> tokens: ('lit', a, r, g, b) | ('cache', idx) |
    ('copy', length, distance)."""
    tokens: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(argb)
    pos = 0
    px = argb
    while pos < n:
        if use_rle and pos > 0:
            run = 0
            prev = px[pos - 1]
            while pos + run < n and px[pos + run] == prev and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 1))
                if cache is not None:
                    v = int(prev)
                    cache[((_HASH_MUL * v) & 0xFFFFFFFF) >> (32 - cache_bits)] = v
                pos += run
                continue
        v = int(px[pos])
        if cache is not None:
            slot = ((_HASH_MUL * v) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == v:
                tokens.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = v
        tokens.append(
            ("lit", (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
        )
        pos += 1
    return tokens


def _encode_image_stream(
    bw: _LSBWriter,
    argb: np.ndarray,
    xsize: int,
    ysize: int,
    cache_bits: int = 0,
    use_rle: bool = False,
    meta_bits: int = 0,
    level0: bool = False,
) -> None:
    """Write one entropy-coded image (no transform headers here). Only the
    level-0 image carries the meta-prefix bit; sub-images never do."""
    # color cache header
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)

    groups_of_pos = None
    num_groups = 1
    if meta_bits:
        # simple spatial grouping: tile-row index modulo 2 → 2 groups,
        # exercising the meta-prefix decode path
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_vals = (np.arange(mh)[:, None] % 2) * np.ones((1, mw), dtype=np.int64)
        num_groups = 2
        bw.write(1, 1)  # use meta prefix
        bw.write(meta_bits - 2, 3)
        meta_argb = (0xFF000000 | (meta_vals.astype(np.uint32) << 8)).reshape(-1)
        _encode_image_stream(bw, meta_argb, mw, mh)
        ys = np.arange(ysize)[:, None] >> meta_bits
        xs = np.arange(xsize)[None, :] >> meta_bits
        groups_of_pos = meta_vals[ys, xs].reshape(-1)
    elif level0:
        bw.write(0, 1)

    tokens = _tokenize(argb, xsize, cache_bits, use_rle)
    # token index -> pixel position (for group routing)
    token_group = []
    p = 0
    for t in tokens:
        gidx = int(groups_of_pos[p]) if groups_of_pos is not None else 0
        token_group.append(gidx)
        p += t[1] if t[0] == "copy" else 1

    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    all_codes = []
    plans: list[list[tuple]] = [[] for _ in range(num_groups)]
    for t, gi in zip(tokens, token_group):
        plans[gi].append(t)
    for gi in range(num_groups):
        counts = [dict() for _ in range(5)]

        def bump(ci, s):
            counts[ci][s] = counts[ci].get(s, 0) + 1

        for t in plans[gi]:
            if t[0] == "lit":
                bump(0, t[3])
                bump(1, t[2])
                bump(2, t[4])
                bump(3, t[1])
            elif t[0] == "cache":
                bump(0, _CACHE_BASE + t[1])
            else:
                lp, _, _ = _prefix_value_encode(t[1])
                bump(0, 256 + lp)
                dp, _, _ = _prefix_value_encode(t[2] + len(_CODE_TO_PLANE))
                bump(4, dp)
        # every code must be readable even if unused in this group
        for ci, alpha in ((0, green_alpha), (1, 256), (2, 256), (3, 256), (4, 40)):
            if not counts[ci]:
                counts[ci][0] = 1
        lengths = [_huffman_lengths(c) for c in counts]
        codes = [
            _write_prefix_code(bw, lengths[ci], alpha)
            for ci, alpha in (
                (0, green_alpha),
                (1, 256),
                (2, 256),
                (3, 256),
                (4, _NUM_DISTANCE_CODES),
            )
        ]
        all_codes.append(codes)

    def emit(codes: dict[int, tuple[int, int]], s: int) -> None:
        c, l = codes[s]
        if l:
            bw.write_code(c, l)

    for t, gi in zip(tokens, token_group):
        green, red, blue, alpha_c, dist = all_codes[gi]
        if t[0] == "lit":
            emit(green, t[3])
            emit(red, t[2])
            emit(blue, t[4])
            emit(alpha_c, t[1])
        elif t[0] == "cache":
            emit(green, _CACHE_BASE + t[1])
        else:
            lp, lev, leb = _prefix_value_encode(t[1])
            emit(green, 256 + lp)
            if leb:
                bw.write(lev, leb)
            dp, dev, deb = _prefix_value_encode(t[2] + len(_CODE_TO_PLANE))
            emit(dist, dp)
            if deb:
                bw.write(dev, deb)


def _fwd_predictor(ch: np.ndarray, size_bits: int, mode: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward predictor transform at a single mode for every tile.
    Returns (residual channels, tile data argb)."""
    h, w, _ = ch.shape
    tw = (w + (1 << size_bits) - 1) >> size_bits
    th = (h + (1 << size_bits) - 1) >> size_bits
    tdata = (0xFF000000 | (np.uint32(mode) << 8)) * np.ones(tw * th, dtype=np.uint32)
    src = ch.astype(np.int64)
    res = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = np.array([0xFF, 0, 0, 0])
            elif y == 0:
                pred = src[0, x - 1]
            elif x == 0:
                pred = src[y - 1, 0]
            else:
                pred = _predict_pixel(src, y, x, w, mode)
            res[y, x] = (src[y, x] - pred) & 0xFF
    return res.astype(np.uint8), tdata


def encode_webp(
    img: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    use_rle: bool = False,
    meta_bits: int = 0,
) -> bytes:
    """(H, W, 3|4) uint8 → lossless WebP bytes.

    Every decoder branch can be forced on: transforms compose in the
    listed order (palette excludes the pixel transforms, mirroring real
    encoders)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    alpha = (
        img[:, :, 3]
        if img.shape[2] == 4
        else np.full((h, w), 255, dtype=np.uint8)
    )
    ch = np.stack([alpha, img[:, :, 0], img[:, :, 1], img[:, :, 2]], axis=2)

    bw = _LSBWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(img.shape[2] == 4), 1)
    bw.write(0, 3)  # version

    xsize = w
    if palette:
        if subtract_green or predictor_mode is not None or color_transform:
            raise ValueError("palette excludes the pixel transforms")
        flat = _from_channels(ch)
        pal_vals, inv = np.unique(flat, return_inverse=True)
        if len(pal_vals) > 256:
            raise ValueError("palette overflow (>256 distinct pixels)")
        ps = len(pal_vals)
        width_bits = 3 if ps <= 2 else 2 if ps <= 4 else 1 if ps <= 16 else 0
        bw.write(1, 1)
        bw.write(_T_COLOR_INDEXING, 2)
        bw.write(ps - 1, 8)
        deltas = pal_vals.astype(np.uint32).view(np.uint8).reshape(-1, 4).astype(np.int64)
        deltas[1:] = (deltas[1:] - deltas[:-1]) & 0xFF
        pal_img = deltas.astype(np.uint8).reshape(-1).view(np.uint32)
        _encode_image_stream(bw, pal_img, ps, 1)
        # bundle indices into the green channel of a packed-width image
        bits = 8 >> width_bits
        packed_w = (w + (1 << width_bits) - 1) >> width_bits
        idx = inv.reshape(h, w).astype(np.uint32)
        packed = np.zeros((h, packed_w), dtype=np.uint32)
        for sub in range(1 << width_bits):
            cols = np.arange(sub, w, 1 << width_bits)
            packed[:, : len(cols)] |= idx[:, cols] << (sub * bits)
        data = (0xFF000000 | (packed << 8)).reshape(-1)
        xsize = packed_w
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(_T_SUBTRACT_GREEN, 2)
            g = ch[:, :, 2].astype(np.int64)
            ch[:, :, 1] = ((ch[:, :, 1] - g) & 0xFF).astype(np.uint8)
            ch[:, :, 3] = ((ch[:, :, 3] - g) & 0xFF).astype(np.uint8)
        if color_transform is not None:
            g2r, g2b, r2b = (v & 0xFF for v in color_transform)
            size_bits = 4
            bw.write(1, 1)
            bw.write(_T_COLOR, 2)
            bw.write(size_bits - 2, 3)
            tw = (w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            elem = np.uint32(0xFF000000 | (r2b << 16) | (g2b << 8) | g2r)
            tdata = elem * np.ones(tw * th, dtype=np.uint32)
            _encode_image_stream(bw, tdata, tw, th)
            g = ch[:, :, 2]
            r0 = ch[:, :, 1].astype(np.int64)
            b0 = ch[:, :, 3].astype(np.int64)
            ga = np.full_like(g, g2r, dtype=np.uint32)
            r_new = (r0 - _ct_delta(np.full(g.shape, g2r, np.uint32), g)) & 0xFF
            b_new = (
                b0
                - _ct_delta(np.full(g.shape, g2b, np.uint32), g)
                - _ct_delta(np.full(g.shape, r2b, np.uint32), ch[:, :, 1])
            ) & 0xFF
            ch[:, :, 1] = r_new.astype(np.uint8)
            ch[:, :, 3] = b_new.astype(np.uint8)
        if predictor_mode is not None:
            size_bits = 4
            bw.write(1, 1)
            bw.write(_T_PREDICTOR, 2)
            bw.write(size_bits - 2, 3)
            res, tdata = _fwd_predictor(ch, size_bits, predictor_mode)
            tw = (w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            _encode_image_stream(bw, tdata, tw, th)
            ch = res
        data = _from_channels(ch)
    bw.write(0, 1)  # end of transforms

    _encode_image_stream(
        bw, data, xsize, h, cache_bits=cache_bits, use_rle=use_rle,
        meta_bits=meta_bits, level0=True,
    )
    payload = bytes([_SIG]) + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
