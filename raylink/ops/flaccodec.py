"""Pure-stdlib FLAC codec (decode + a fixed-predictor encoder).

Implements the public FLAC format (xiph.org / RFC 9639) with ``struct``,
``hashlib`` and numpy: STREAMINFO + metadata-block walk, frame headers
(UTF-8-coded frame numbers, CRC-8), all subframe types — CONSTANT,
VERBATIM, FIXED orders 0–4, and LPC with signed quantized coefficients —
wasted bits, Rice/Rice2 partitioned residuals with the raw-bits escape,
stereo decorrelation (left/side, right/side, mid/side) and the frame
CRC-16. That is the complete lossless decode surface for 8/16/24-bit
fixed-blocksize streams, the shape real FLAC corpora have.

The encoder emits fixed-predictor subframes (best of orders 0–2 per
channel, Rice partition order 0) — compact, spec-conformant output used
by tests and the media gate to generate real payloads deterministically.

The reference repo has no audio surface; this module extends the
training-data-pipeline scope (multimodal columns) alongside
:mod:`raylink.ops.imagecodec` and :mod:`raylink.ops.webpcodec`.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# --------------------------------------------------------------------------
# MSB-first bit IO (FLAC is big-endian bit-packed, unlike VP8L)
# --------------------------------------------------------------------------


class _MSBReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.data
        if p + n > len(d) * 8:
            raise ValueError("truncated FLAC stream")
        for i in range(n):
            byte = d[(p + i) >> 3]
            v = (v << 1) | ((byte >> (7 - ((p + i) & 7))) & 1)
        self.pos = p + n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _MSBWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# --------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005, both init 0)
# --------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# --------------------------------------------------------------------------
# frame-number UTF-8 (like UTF-8 but up to 36 bits / 7 bytes)
# --------------------------------------------------------------------------


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for nbytes in range(2, 8):
        if v < (1 << (1 + 5 * nbytes)):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (v >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((v >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode(br: _MSBReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("bad UTF-8 frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_RATE_TABLE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}

_SIZE_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def _read_residual(br: _MSBReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for part in range(nparts):
        n = (blocksize >> porder) - (order if part == 0 else 0)
        param = br.read(param_bits)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(n):
                q = br.read_unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out[idx] = (v >> 1) ^ -(v & 1)  # un-zigzag
                idx += 1
    return out


def _read_subframe(br: _MSBReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(bps), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = pred + res[i - order]
    elif ftype >= 32:  # LPC, order = low 5 bits + 1
        order = (ftype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs)) >> shift
            out[i] = pred + res[i - order]
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(data: bytes, verify_md5: bool = False) -> tuple[np.ndarray, int]:
    """FLAC bytes → (samples (n, channels) int32, sample_rate).

    Full lossless decode: every subframe type, Rice/Rice2/escape
    residuals, stereo decorrelation modes, CRC-8/16 verified per frame.
    """
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    si = None
    while True:
        hdr = data[pos]
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if hdr & 0x7F == 0:  # STREAMINFO
            si = body
        pos += 4 + ln
        if hdr & 0x80:
            break
    if si is None:
        raise ValueError("missing STREAMINFO")
    sib = _MSBReader(si)
    sib.read(16)  # min blocksize
    sib.read(16)  # max blocksize
    sib.read(24)
    sib.read(24)
    rate = sib.read(20)
    nch = sib.read(3) + 1
    bps = sib.read(5) + 1
    total = sib.read(36)
    md5_expect = si[18:34]

    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    got = 0
    while got < total and pos < len(data):
        frame_start = pos
        br = _MSBReader(data, pos * 8)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        size_code = br.read(3)
        br.read(1)  # reserved
        _utf8_decode(br)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code != 0 and rate_code not in _RATE_TABLE:
            raise ValueError("invalid sample-rate code")
        fbps = _SIZE_TABLE.get(size_code, bps) if size_code else bps
        br.align()
        hdr_end = br.pos >> 3
        if _crc8(data[frame_start:hdr_end]) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("channel count mismatch")
            sub = [_read_subframe(br, blocksize, fbps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _read_subframe(br, blocksize, fbps)
                side = _read_subframe(br, blocksize, fbps + 1)
                sub = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, blocksize, fbps + 1)
                right = _read_subframe(br, blocksize, fbps)
                sub = [right + side, right]
            else:  # mid/side
                mid = _read_subframe(br, blocksize, fbps)
                side = _read_subframe(br, blocksize, fbps + 1)
                m2 = (mid << 1) | (side & 1)
                sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        body_end = br.pos >> 3
        crc = br.read(16)
        if _crc16(data[frame_start:body_end]) != crc:
            raise ValueError("frame CRC-16 mismatch")
        for c in range(nch):
            chans[c].append(sub[c])
        got += blocksize
        pos = br.pos >> 3

    out = np.stack([np.concatenate(c)[:total] for c in chans], axis=1).astype(
        np.int32
    )
    if verify_md5:
        width = (bps + 7) // 8
        raw = bytearray()
        flat = out.reshape(-1)
        for v in flat.tolist():
            raw += int(v).to_bytes(width, "little", signed=True)
        if hashlib.md5(bytes(raw)).digest() != md5_expect:
            raise ValueError("decoded-audio MD5 mismatch")
    return out, rate


def flac_stream_info(data: bytes) -> dict:
    """STREAMINFO fields without decoding audio: rate / channels /
    bits_per_sample / total_samples."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    while True:
        hdr = data[pos]
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        if hdr & 0x7F == 0:
            br = _MSBReader(data[pos + 4 : pos + 4 + ln])
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            return {
                "rate": br.read(20),
                "channels": br.read(3) + 1,
                "bits_per_sample": br.read(5) + 1,
                "total_samples": br.read(36),
            }
        pos += 4 + ln
        if hdr & 0x80:
            raise ValueError("missing STREAMINFO")


# --------------------------------------------------------------------------
# encode (fixed predictors, Rice partition order 0)
# --------------------------------------------------------------------------


def _best_rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    zig = (np.abs(res.astype(np.int64)) * 2 - (res < 0)).astype(np.uint64)
    best_k, best_cost = 0, None
    for k in range(15):
        cost = int((zig >> k).sum()) + len(zig) * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _write_residual(bw: _MSBWriter, res: np.ndarray) -> None:
    bw.write(0, 2)  # Rice, 4-bit params
    bw.write(0, 4)  # partition order 0
    k = _best_rice_param(res)
    bw.write(k, 4)
    for v in res.tolist():
        zig = (-v << 1) - 1 if v < 0 else v << 1
        bw.write_unary(zig >> k)
        if k:
            bw.write(zig & ((1 << k) - 1), k)


def _encode_subframe(bw: _MSBWriter, samples: np.ndarray, bps: int) -> None:
    s = samples.astype(np.int64)
    if np.all(s == s[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(int(s[0]) & ((1 << bps) - 1), bps)
        return
    # pick the fixed order 0-2 with the smallest residual magnitude sum
    cands = {0: s.copy()}
    if len(s) > 1:
        cands[1] = np.concatenate([s[:1], np.diff(s)])
    if len(s) > 2:
        d2 = s[2:] - 2 * s[1:-1] + s[:-2]
        cands[2] = np.concatenate([s[:2], d2])
    order = min(cands, key=lambda o: int(np.abs(cands[o][o:]).sum()))
    res = cands[order][order:]
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)
    for v in s[:order].tolist():
        bw.write(int(v) & ((1 << bps) - 1), bps)
    _write_residual(bw, res)


def encode_flac(
    samples: np.ndarray, rate: int = 8000, blocksize: int = 4096
) -> bytes:
    """(n,) or (n, channels) int16 → FLAC bytes (16-bit, fixed blocksize)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype != np.int16:
        raise ValueError("encode_flac expects int16 samples")
    n, nch = s.shape
    bps = 16

    raw = bytearray()
    for v in s.reshape(-1).tolist():
        raw += int(v).to_bytes(2, "little", signed=True)
    md5 = hashlib.md5(bytes(raw)).digest()

    si = _MSBWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + md5

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = s[start : start + blocksize]
        bs = len(blk)
        hw = _MSBWriter()
        hw.write(0b11111111111110, 14)
        hw.write(0, 1)
        hw.write(0, 1)  # fixed-blocksize stream: number is the frame index
        hw.write(7, 4)  # blocksize: 16-bit at end of header
        hw.write(0, 4)  # rate: from STREAMINFO
        hw.write(nch - 1, 4)  # independent channels
        hw.write(0b100, 3)  # 16-bit
        hw.write(0, 1)
        for b in _utf8_encode(fi):
            hw.write(b, 8)
        hw.write(bs - 1, 16)
        header = hw.getvalue()
        body = _MSBWriter()
        for b in header:
            body.write(b, 8)
        body.write(_crc8(header), 8)
        for c in range(nch):
            _encode_subframe(body, blk[:, c], bps)
        body.align()
        frame = body.getvalue()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)
