"""FLAC codec: encoder round-trips, handcrafted decode-only paths (LPC,
stereo decorrelation, wasted bits, Rice escapes), and the audio-feature
integration. All single-process (no Ray session needed)."""

import hashlib

import numpy as np
import pytest

from raylink.ops.flaccodec import (
    _MSBWriter,
    _crc8,
    _crc16,
    _utf8_encode,
    _write_residual,
    decode_flac,
    encode_flac,
    flac_stream_info,
)
from raylink.ops.imagecodec import encode_wav, sniff_format


# ---------------------------------------------------------------- helpers


def _container(frames: bytes, n: int, nch: int, rate: int, bps: int,
               pcm: np.ndarray, blocksize: int) -> bytes:
    """Wrap raw frame bytes in fLaC magic + STREAMINFO (with real MD5)."""
    width = (bps + 7) // 8
    raw = b"".join(
        int(v).to_bytes(width, "little", signed=True)
        for v in pcm.reshape(-1).tolist()
    )
    si = _MSBWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + hashlib.md5(raw).digest()
    return (b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
            + streaminfo + frames)


def _frame(subframe_writer, blocksize: int, nch_code: int, frame_idx: int = 0,
           size_code: int = 0b100) -> bytes:
    """One frame: header (16-bit blocksize-at-end form) + CRC-8, the
    caller-supplied subframe bits, padding, CRC-16."""
    hw = _MSBWriter()
    hw.write(0b11111111111110, 14)
    hw.write(0, 1)
    hw.write(0, 1)
    hw.write(7, 4)            # blocksize: 16-bit at end of header
    hw.write(0, 4)            # rate from STREAMINFO
    hw.write(nch_code, 4)
    hw.write(size_code, 3)
    hw.write(0, 1)
    for b in _utf8_encode(frame_idx):
        hw.write(b, 8)
    hw.write(blocksize - 1, 16)
    header = hw.getvalue()
    body = _MSBWriter()
    for b in header:
        body.write(b, 8)
    body.write(_crc8(header), 8)
    subframe_writer(body)
    body.align()
    frame = body.getvalue()
    return frame + _crc16(frame).to_bytes(2, "big")


def _verbatim(bw: _MSBWriter, samples, bps: int, wasted: int = 0) -> None:
    bw.write(0, 1)
    bw.write(1, 6)            # VERBATIM
    if wasted:
        bw.write(1, 1)
        bw.write(1, wasted)   # unary(wasted-1): (wasted-1) zeros then a 1
    else:
        bw.write(0, 1)
    eff = bps - wasted
    for v in samples:
        bw.write(int(v) & ((1 << eff) - 1), eff)


# ---------------------------------------------------------------- round-trips


@pytest.mark.parametrize("nch", [1, 2])
def test_roundtrip_noise(nch):
    rng = np.random.default_rng(7 + nch)
    pcm = rng.normal(0, 2500, (5000, nch)).astype(np.int16)
    enc = encode_flac(pcm, rate=8000, blocksize=1024)
    assert sniff_format(enc) == "flac"
    dec, rate = decode_flac(enc, verify_md5=True)
    assert rate == 8000
    assert np.array_equal(dec, pcm.astype(np.int32))


def test_roundtrip_sine_compresses():
    t = np.arange(16000)
    pcm = (np.sin(2 * np.pi * 440 * t / 8000) * 16000).astype(np.int16)
    enc = encode_flac(pcm, rate=8000)
    dec, _ = decode_flac(enc, verify_md5=True)
    assert np.array_equal(dec[:, 0], pcm.astype(np.int32))
    # a smooth tone must beat raw PCM through the fixed predictors
    assert len(enc) < 2 * len(pcm)


def test_roundtrip_constant_and_tail_block():
    # 2500 % 1024 != 0 exercises the short final frame
    pcm = np.full(2500, -1234, dtype=np.int16)
    enc = encode_flac(pcm, blocksize=1024)
    dec, _ = decode_flac(enc, verify_md5=True)
    assert np.array_equal(dec[:, 0], pcm.astype(np.int32))
    info = flac_stream_info(enc)
    assert info == {"rate": 8000, "channels": 1, "bits_per_sample": 16,
                    "total_samples": 2500}


def test_extremes_roundtrip():
    pcm = np.array([-32768, 32767, 0, -1, 1, -32768, 32767, 12345],
                   dtype=np.int16)
    dec, _ = decode_flac(encode_flac(pcm), verify_md5=True)
    assert np.array_equal(dec[:, 0], pcm.astype(np.int32))


def test_md5_verification_catches_tampering():
    pcm = np.arange(-500, 500, dtype=np.int16)
    enc = bytearray(encode_flac(pcm))
    # corrupt the STREAMINFO MD5 (last byte of the metadata block)
    enc[4 + 4 + 34 - 1] ^= 0xFF
    decode_flac(bytes(enc))  # frames themselves are intact
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc), verify_md5=True)


def test_crc_detects_corruption():
    pcm = np.arange(-500, 500, dtype=np.int16)
    enc = bytearray(encode_flac(pcm))
    enc[-1] ^= 0x01  # corrupt the stored CRC-16 of the last frame
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(enc))
    # a bit flip inside entropy-coded data derails the reader instead of
    # reaching the CRC — that must still surface as ValueError, not IndexError
    enc2 = bytearray(encode_flac(pcm))
    enc2[-10] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(enc2))


# ------------------------------------------------- handcrafted decode paths


def test_decode_verbatim_and_wasted_bits():
    pcm = (np.arange(-64, 64, dtype=np.int64) * 4)  # all multiples of 4
    def w(bw):
        _verbatim(bw, pcm >> 2, 16, wasted=2)
    data = _container(_frame(w, 128, nch_code=0), 128, 1, 8000, 16,
                      pcm.astype(np.int16), 128)
    dec, _ = decode_flac(data, verify_md5=True)
    assert np.array_equal(dec[:, 0], pcm.astype(np.int32))


def test_decode_lpc_subframe():
    # order-2 LPC with coefs [2, -1] and shift 0 == fixed order 2
    rng = np.random.default_rng(3)
    pcm = np.cumsum(rng.integers(-20, 21, 256)).astype(np.int64)
    res = pcm[2:] - 2 * pcm[1:-1] + pcm[:-2]

    def w(bw):
        bw.write(0, 1)
        bw.write(32 | 1, 6)   # LPC, order 2
        bw.write(0, 1)
        for v in pcm[:2]:
            bw.write(int(v) & 0xFFFF, 16)
        bw.write(4, 4)        # precision 5 bits
        bw.write(0, 5)        # shift 0
        bw.write(2 & 0x1F, 5)
        bw.write(-1 & 0x1F, 5)
        _write_residual(bw, res)

    data = _container(_frame(w, 256, nch_code=0), 256, 1, 8000, 16,
                      pcm.astype(np.int16), 256)
    dec, _ = decode_flac(data, verify_md5=True)
    assert np.array_equal(dec[:, 0], pcm.astype(np.int32))


def test_decode_lpc_with_shift():
    # coef 1 with shift 1 → pred = prev >> 1 (decaying, stays in range)
    pcm = [1000]
    for _ in range(63):
        pcm.append((pcm[-1] >> 1) + 1)  # residual all-ones
    pcm = np.array(pcm, dtype=np.int64)

    def w(bw):
        bw.write(0, 1)
        bw.write(32 | 0, 6)   # LPC, order 1
        bw.write(0, 1)
        bw.write(int(pcm[0]) & 0xFFFF, 16)
        bw.write(3, 4)        # precision 4 bits
        bw.write(1, 5)        # shift 1
        bw.write(1, 4)        # coef 1
        _write_residual(bw, np.ones(63, dtype=np.int64))

    data = _container(_frame(w, 64, nch_code=0), 64, 1, 8000, 16,
                      pcm.astype(np.int16), 64)
    dec, _ = decode_flac(data, verify_md5=True)
    assert np.array_equal(dec[:, 0], pcm.astype(np.int32))


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_decode_stereo_decorrelation(mode):
    rng = np.random.default_rng(11)
    left = rng.integers(-3000, 3000, 128).astype(np.int64)
    right = (left + rng.integers(-50, 50, 128)).astype(np.int64)
    side = left - right
    code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]

    def w(bw):
        if mode == "left_side":
            _verbatim(bw, left, 16)
            _verbatim(bw, side, 17)
        elif mode == "right_side":
            _verbatim(bw, side, 17)
            _verbatim(bw, right, 16)
        else:
            mid = (left + right) >> 1
            _verbatim(bw, mid, 16)
            _verbatim(bw, side, 17)

    pcm = np.stack([left, right], axis=1).astype(np.int16)
    data = _container(_frame(w, 128, nch_code=code), 128, 2, 44100, 16,
                      pcm, 128)
    dec, rate = decode_flac(data, verify_md5=True)
    assert rate == 44100
    assert np.array_equal(dec, pcm.astype(np.int32))


def test_decode_rice_escape_and_rice2():
    pcm = np.array([7, -7, 3, -3, 1, -1, 0, 5] * 8, dtype=np.int64)

    def w(bw):
        # FIXED order 0, residual = the samples themselves
        bw.write(0, 1)
        bw.write(8, 6)
        bw.write(0, 1)
        # method 0 (Rice 4-bit), partition order 0, param 15 = escape
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(15, 4)
        bw.write(5, 5)        # raw 5-bit residuals
        for v in pcm:
            bw.write(int(v) & 0x1F, 5)

    data = _container(_frame(w, 64, nch_code=0), 64, 1, 8000, 16,
                      pcm.astype(np.int16), 64)
    dec, _ = decode_flac(data, verify_md5=True)
    assert np.array_equal(dec[:, 0], pcm.astype(np.int32))

    def w2(bw):
        bw.write(0, 1)
        bw.write(8, 6)
        bw.write(0, 1)
        # method 1 (Rice2 5-bit params), partition order 0, k=2
        bw.write(1, 2)
        bw.write(0, 4)
        bw.write(2, 5)
        for v in pcm:
            zig = (-int(v) << 1) - 1 if v < 0 else int(v) << 1
            bw.write_unary(zig >> 2)
            bw.write(zig & 3, 2)

    data2 = _container(_frame(w2, 64, nch_code=0), 64, 1, 8000, 16,
                       pcm.astype(np.int16), 64)
    dec2, _ = decode_flac(data2, verify_md5=True)
    assert np.array_equal(dec2[:, 0], pcm.astype(np.int32))


def test_decode_multi_partition_residual():
    rng = np.random.default_rng(5)
    pcm = rng.integers(-100, 100, 256).astype(np.int64)

    def w(bw):
        bw.write(0, 1)
        bw.write(8, 6)        # FIXED order 0
        bw.write(0, 1)
        bw.write(0, 2)        # Rice 4-bit
        bw.write(2, 4)        # partition order 2 → 4 partitions of 64
        for part in range(4):
            chunk = pcm[part * 64:(part + 1) * 64]
            bw.write(6, 4)    # k = 6
            for v in chunk:
                zig = (-int(v) << 1) - 1 if v < 0 else int(v) << 1
                bw.write_unary(zig >> 6)
                bw.write(zig & 63, 6)

    data = _container(_frame(w, 256, nch_code=0), 256, 1, 8000, 16,
                      pcm.astype(np.int16), 256)
    dec, _ = decode_flac(data, verify_md5=True)
    assert np.array_equal(dec[:, 0], pcm.astype(np.int32))


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFF....WAVE")


# ---------------------------------------------------------------- features


def test_audio_features_flac_equals_wav():
    """A FLAC and a WAV of the same PCM must yield identical features —
    the contract fake_media_table relies on."""
    from raylink.ops.multimodal import ExtractAudioFeatures

    t = np.arange(16000)
    pcm = (np.sin(2 * np.pi * 500 * t / 8000) * 16384).astype(np.int16)
    stage = ExtractAudioFeatures()
    fw = stage._features(encode_wav(pcm))
    ff = stage._features(encode_flac(pcm, rate=8000))
    assert fw == pytest.approx(ff, abs=1e-12)
    assert abs(ff[2] - 500) < 25


def test_fake_media_table_ships_flac_rows():
    from raylink.ops.multimodal import fake_media_table

    media = fake_media_table(36, seed=3).to_pandas()
    audio = media[media["kind"] == "audio"]
    assert set(audio["format"]) == {"wav", "flac"}
    for _, row in audio.iterrows():
        assert sniff_format(row["payload"]) == row["format"]
