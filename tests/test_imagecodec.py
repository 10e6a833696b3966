"""Pure-stdlib codec kernels (raylink.ops.imagecodec) and the real
multimodal decode stages built on them."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.ops.imagecodec import (
    decode_bmp,
    decode_jpeg,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_png,
    encode_ppm,
    encode_wav,
    sniff_format,
    _png_chunk,
    _PNG_SIG,
)
from raylink.ops.multimodal import (
    DecodeImage,
    ExtractAudioFeatures,
    decode_images,
    extract_audio_features,
    fake_media_table,
)


def _img(h=13, w=17, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8) if c else (
        rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    )


def test_ppm_roundtrip():
    img = _img()
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header comments per netpbm spec
    data = encode_ppm(img)
    commented = b"P6\n# a comment\n" + data[3:]
    assert np.array_equal(decode_ppm(commented), img)


def test_bmp_roundtrip_with_padding():
    # width 17 → row stride not a multiple of 4: exercises padding
    img = _img(h=5, w=17)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_roundtrip(c):
    img = _img(c=c) if c > 1 else _img(c=0)
    out = decode_png(encode_png(img))
    want = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(out, want)


def _filter_scanlines(img: np.ndarray, ftype: int) -> bytes:
    """Apply a PNG filter forward to build raw filtered scanlines."""
    import struct, zlib

    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(c, dtype=np.int32), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, dtype=np.int32), prev[:-c]])
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = (cur - left) & 0xFF
        elif ftype == 2:
            enc = (cur - prev) & 0xFF
        elif ftype == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            p = left + prev - upleft
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) & 0xFF
        raw += bytes([ftype]) + enc.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filters_decode(ftype):
    img = _img(h=7, w=9)
    assert np.array_equal(decode_png(_filter_scanlines(img, ftype)), img)


def test_wav_roundtrip_and_sniff():
    t = np.arange(8000)
    wave = (np.sin(2 * np.pi * 440 * t / 8000) * 16384).astype(np.int16)
    data = encode_wav(wave, rate=8000)
    assert sniff_format(data) == "wav"
    samples, rate = decode_wav(data)
    assert rate == 8000 and samples.shape == (8000, 1)
    assert np.allclose(samples[:, 0], wave / 32768.0)
    assert sniff_format(encode_png(_img())) == "png"
    assert sniff_format(encode_bmp(_img())) == "bmp"
    assert sniff_format(encode_ppm(_img())) == "ppm"
    assert sniff_format(b"\x00\x01garbage") is None


def test_decode_image_real_feature_semantics():
    """A uniform-gray image mean-pools to exactly gray/255 in every cell,
    whatever the container format."""
    img = np.full((24, 36, 3), 120, dtype=np.uint8)
    for enc in (encode_png, encode_bmp, encode_ppm):
        feat = DecodeImage(dim=4)._decode(enc(img))
        assert feat.shape == (4,)
        assert np.allclose(feat, 120 / 255.0, atol=1e-6)


def test_decode_image_unknown_format_raises_or_fakes():
    # lossy (VP8) webp: sniffed, but no stdlib codec — the documented
    # boundary (lossless VP8L decodes for real, see test_webp.py)
    lossy = (
        b"RIFF\x14\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError):
        DecodeImage(dim=4)._decode(lossy)
    f = DecodeImage(dim=4, fake=True)._decode(lossy)
    assert f.shape == (4,) and (0 <= f).all() and (f <= 1).all()
    # a format nothing sniffs
    payload = b"\x00\x01HEIC-ish opaque bytes"
    with pytest.raises(NotImplementedError):
        DecodeImage(dim=4)._decode(payload)
    f = DecodeImage(dim=4, fake=True)._decode(payload)
    assert f.shape == (4,) and (0 <= f).all() and (f <= 1).all()


def _smooth_img(h=40, w=56):
    """JPEG-friendly deterministic test card (gradients + a flat patch)."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=2
    ).astype(np.uint8)
    img[10:20, 10:30] = [200, 30, 60]
    return img


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_roundtrip_color(subsample):
    img = _smooth_img()
    enc = encode_jpeg(img, quality=95, subsample=subsample)
    assert sniff_format(enc) == "jpeg"
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(float) - img.astype(float)).mean()
    assert err < (3.0 if subsample else 1.5)


def test_jpeg_roundtrip_gray_and_odd_sizes():
    g = _smooth_img()[:37, :51, 1]
    dec = decode_jpeg(encode_jpeg(g, quality=92))
    assert dec.shape == g.shape
    assert np.abs(dec.astype(float) - g.astype(float)).mean() < 1.5
    c = _smooth_img()[:33, :41]  # odd dims + 4:2:0 padding path
    dec = decode_jpeg(encode_jpeg(c, quality=92, subsample=True))
    assert dec.shape == c.shape


def test_jpeg_restart_markers_bit_identical():
    """DRI/RSTn resynchronization must not change a single pixel."""
    img = _smooth_img()
    base = decode_jpeg(encode_jpeg(img, quality=88, subsample=True))
    for ri in (1, 3, 7):
        withr = decode_jpeg(
            encode_jpeg(img, quality=88, subsample=True, restart_interval=ri)
        )
        assert np.array_equal(base, withr)


def test_jpeg_pinned_pixels():
    """Encoder and decoder are both deterministic: pin the decoded pixel
    digest so a silent change to DCT/quant/Huffman arithmetic fails loudly.
    (Regenerate the pin ONLY for an intentional codec change.)"""
    import hashlib

    img = _smooth_img(24, 32)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    digest = hashlib.sha256(dec.tobytes()).hexdigest()[:16]
    assert dec.shape == (24, 32, 3)
    assert digest == PINNED_JPEG_DIGEST, digest


PINNED_JPEG_DIGEST = "47b89022654eeae1"


def test_jpeg_mislabeled_progressive_rejected():
    """A baseline stream relabeled SOF2 carries an interleaved full-band
    scan, which is ILLEGAL in progressive mode — it must fail loudly
    (real SOF2 streams decode; see TestProgressiveJpeg)."""
    img = _smooth_img(16, 16)  # already (H, W, 3)
    enc = bytearray(encode_jpeg(img))
    idx = enc.find(b"\xff\xc0")
    enc[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="interleaved progressive"):
        decode_jpeg(bytes(enc))


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes — pad the
    DQT marker and expect a bit-identical decode."""
    img = _smooth_img(16, 16)
    enc = encode_jpeg(img, quality=90)
    idx = enc.find(b"\xff\xdb")
    padded = enc[:idx] + b"\xff\xff\xff" + enc[idx:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(enc))


def test_jpeg_multiscan_rejected():
    """A second SOS (non-interleaved multi-scan) must fail loudly — the
    decoder supports a single interleaved scan only."""
    img = _smooth_img(16, 16)
    enc = encode_jpeg(img, quality=90)
    assert enc.endswith(b"\xff\xd9")
    extra_sos = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00" + b"\x7f"
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(enc[:-2] + extra_sos + b"\xff\xd9")


def test_audio_features_sine():
    t = np.arange(16000)
    wave = (np.sin(2 * np.pi * 500 * t / 8000) * 16384).astype(np.int16)
    rms, zcr, centroid = ExtractAudioFeatures()._features(encode_wav(wave))
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01
    assert abs(centroid - 500) < 25  # spectral centroid at the tone
    assert abs(zcr - 2 * 500 / 8000) < 0.01  # 2 crossings per cycle


def test_multimodal_stage_real_decode(ray_session):
    media = rd.from_arrow(fake_media_table(18, seed=3))
    images = media.filter(expr="kind == 'image'")
    feats = decode_images(images, dim=16, fake=False).to_pandas()
    assert len(feats) == 6 and all(len(f) == 16 for f in feats["feat"])
    # features are normalized pixel means — strictly inside (0, 1) for the
    # gradient test card
    assert all(0.0 < float(f[0]) < 1.0 for f in feats["feat"])
    audio = media.filter(expr="kind == 'audio'")
    af = extract_audio_features(audio, fake=False).to_pandas()
    assert len(af) == 6 and (af["rms"] > 0.1).all()
    assert (af["centroid_hz"].between(50, 2000)).all()


def test_y4m_roundtrip_and_sniff():
    from raylink.ops.imagecodec import decode_y4m, encode_y4m, sniff_format

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, size=(5, 24, 32)).astype(np.uint8)
    data = encode_y4m(frames, fps_num=8, fps_den=1)
    assert sniff_format(data) == "y4m"
    got, num, den = decode_y4m(data)
    assert (num, den) == (8, 1)
    assert got.shape == frames.shape and (got == frames).all()


def test_frame_sample_real_y4m_luma(ray_session):
    from raylink.ops.multimodal import _test_video, sample_frames

    media = rd.from_arrow(fake_media_table(18, seed=3))
    # fake=False: the Y4M rows decode for real; the one mp4 row in 18 is
    # filtered out first (it would raise, as documented)
    videos = media.filter(expr="kind == 'video' and format == 'y4m'")
    frames = sample_frames(videos, every_ms=250, fake=False).to_pandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] >= 0).all()
    # replay the generator: frame f of a 32x24 test video has mean luma
    # mean((linspace(0,200,32) + 5f) % 256)
    x = np.linspace(0, 200, 32)
    for _, row in frames.head(8).iterrows():
        f = int(row["frame_idx"])
        expect = float(np.mean((x + 5.0 * f) % 256))
        assert abs(row["mean_luma_e3"] / 1000 - expect) < 0.5
    # mp4 rows still raise without fake=True, and stub with it
    mp4 = media.filter(expr="format == 'mp4'")
    with pytest.raises(Exception):
        sample_frames(mp4, fake=False).take(1)
    stub = sample_frames(mp4, every_ms=1000, fake=True).to_pandas()
    assert (stub["frame_idx"] == -1).all() and len(stub) > 0


def test_avi_mjpeg_roundtrip():
    from raylink.ops.imagecodec import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        sniff_format,
    )
    from raylink.ops.multimodal import _test_video

    rng = np.random.default_rng(7)
    frames = _test_video(rng, 32, 24, 6)
    data = encode_avi_mjpeg(frames, fps=8, quality=90)
    assert sniff_format(data) == "avi"
    assert data == encode_avi_mjpeg(frames, fps=8, quality=90)  # deterministic
    got, num, den = decode_avi_mjpeg(data)
    assert (num, den) == (8, 1) and len(got) == 6
    for g, f in zip(got, frames):
        assert g.shape == (24, 32)
        assert np.abs(g.astype(int) - f.astype(int)).max() <= 3  # JPEG q90
    # RGB frames round-trip through the 3-component JPEG path
    rgb = np.stack([np.stack([f, f // 2, 255 - f], axis=2) for f in frames])
    got3, num3, _ = decode_avi_mjpeg(encode_avi_mjpeg(rgb, fps=25))
    assert num3 == 25 and got3[0].shape == (24, 32, 3)
    assert np.abs(got3[2].astype(int) - rgb[2].astype(int)).max() <= 24


def test_frame_sample_real_avi_luma(ray_session):
    from raylink.ops.multimodal import sample_frames

    media = rd.from_arrow(fake_media_table(18, seed=3))
    videos = media.filter(expr="kind == 'video' and format == 'avi'")
    frames = sample_frames(videos, every_ms=250, fake=False).to_pandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] >= 0).all()
    # decoded MJPEG luma tracks the generator within JPEG quantization error
    x = np.linspace(0, 200, 32)
    for _, row in frames.head(8).iterrows():
        f = int(row["frame_idx"])
        expect = float(np.mean((x + 5.0 * f) % 256))
        assert abs(row["mean_luma_e3"] / 1000 - expect) < 1.5


def test_jpeg_roundtrip_property():
    """Property check: any smooth-ish small image round-trips within the
    quantization error budget at q=90, for both sampling modes and
    arbitrary (odd) sizes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        h=st.integers(9, 40),
        w=st.integers(9, 40),
        seed=st.integers(0, 10**6),
        subsample=st.booleans(),
    )
    def check(h, w, seed, subsample):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=2
        )
        img = np.clip(img + rng.integers(-10, 10, img.shape), 0, 255).astype(
            np.uint8
        )
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(float) - img.astype(float)).mean()
        assert err < 12.0

    check()


def test_gif_roundtrip_and_palette_exact():
    """GIF is palette-lossy (3-3-2 quantization) on arbitrary input, but
    must be bit-exact on input already on the palette grid — and the
    second pass through the codec must be idempotent."""
    from raylink.ops.imagecodec import decode_gif, encode_gif

    img = _smooth_img(37, 51)
    enc = encode_gif(img)
    assert sniff_format(enc) == "gif"
    dec = decode_gif(enc)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img.astype(float)).mean() < 24.0
    assert np.array_equal(decode_gif(encode_gif(dec)), dec)


def test_gif_interlaced_decode():
    """Interlace flag: rows arrive in 4-pass order; the decoder must
    de-shuffle them back (build the interlaced variant by reordering the
    encoder's row stream)."""
    import struct

    from raylink.ops.imagecodec import _lzw_decode, _lzw_encode, decode_gif, encode_gif

    img = _smooth_img(23, 17)
    plain = decode_gif(encode_gif(img))  # palette-grid truth
    # re-encode with the interlace flag and rows in interlaced order
    h, w = 23, 17
    idx332 = (
        (plain[:, :, 0] >> 5).astype(np.uint8) << 5
        | (plain[:, :, 1] >> 5).astype(np.uint8) << 2
        | (plain[:, :, 2] >> 6).astype(np.uint8)
    )
    rows = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8),
         np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    lzw = _lzw_encode(idx332[rows].reshape(-1), 8)
    base = encode_gif(plain)
    head_end = 13 + 768  # header + GCT
    out = bytearray(base[:head_end])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out += bytes([8])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    assert np.array_equal(decode_gif(bytes(out)), plain)


class TestProgressiveJpeg:
    """SOF2 decode: spectral selection + DC/AC successive approximation.
    The encoder shares the baseline's quantized coefficients, so a full
    progressive decode must be PIXEL-IDENTICAL to decoding the baseline
    encoding of the same image — the strongest possible pin."""

    def test_parity_gray_and_color(self):
        rng = np.random.default_rng(3)
        for img, sub in [
            (rng.integers(0, 256, (24, 31), dtype=np.uint8), False),
            (rng.integers(0, 256, (33, 45, 3), dtype=np.uint8), False),
            (rng.integers(0, 256, (35, 45, 3), dtype=np.uint8), True),
        ]:
            kw = {"quality": 80}
            if img.ndim == 3:
                kw["subsample"] = sub
            base = decode_jpeg(encode_jpeg(img, **kw))
            prog = decode_jpeg(encode_jpeg_progressive(img, **kw))
            assert np.array_equal(base, prog)

    def test_parity_sparse_blocks_long_eob_runs(self):
        # a nearly-flat image quantizes to mostly-zero AC -> cross-block
        # EOB runs and buffered refinement correction bits get exercised
        img = np.full((64, 96, 3), 128, dtype=np.uint8)
        img[10, 20] = [255, 0, 0]
        img[40, 70] = [0, 0, 255]
        base = decode_jpeg(encode_jpeg(img, quality=60))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=60))
        assert np.array_equal(base, prog)

    def test_sof2_header_and_multiscan(self):
        img = np.zeros((16, 16), dtype=np.uint8)
        data = encode_jpeg_progressive(img)
        assert b"\xff\xc2" in data  # SOF2 marker present
        # six+ SOS markers (DC first, 2 AC bands, 2 AC refines, DC refine)
        assert data.count(b"\xff\xda") >= 6

    def test_media_table_has_progressive_row_and_decodes(self):
        from raylink.ops.imagecodec import sniff_format
        from raylink.ops.multimodal import DecodeImage, fake_media_table

        media = fake_media_table(64, seed=42)
        jpegs = [
            r for r in media.to_pylist()
            if r["kind"] == "image" and r["format"] == "jpeg"
        ]
        prog = [r for r in jpegs if b"\xff\xc2" in r["payload"][:400]]
        assert prog, "expected at least one progressive JPEG row"
        d = DecodeImage(dim=8, fake=False)
        import pyarrow as pa_

        out = d(pa.table({
            "media_id": pa.array([r["media_id"] for r in prog], type=pa.int64()),
            "payload": pa.array([r["payload"] for r in prog], type=pa.binary()),
        }))
        assert len(out) == len(prog)
        assert sniff_format(prog[0]["payload"]) == "jpeg"


def test_g711_codebooks_are_itu_shaped():
    """Closed-form G.711 pins: full-scale ±32124 (μ) / ±32256 (A), two
    zero codewords in μ-law, no zero in A-law (min magnitude 8), and
    encode = exact nearest-codeword inverse of decode."""
    from raylink.ops.imagecodec import (
        _ALAW_ENCODE,
        _ALAW_TABLE,
        _ULAW_ENCODE,
        _ULAW_TABLE,
    )

    assert int(_ULAW_TABLE.max()) == 32124 and int(_ULAW_TABLE.min()) == -32124
    assert int(_ALAW_TABLE.max()) == 32256 and int(_ALAW_TABLE.min()) == -32256
    assert np.count_nonzero(_ULAW_TABLE == 0) == 2  # +0 and -0 codewords
    assert np.abs(_ALAW_TABLE.astype(np.int64)).min() == 8
    for tab, enc in ((_ULAW_TABLE, _ULAW_ENCODE), (_ALAW_TABLE, _ALAW_ENCODE)):
        b = np.arange(256, dtype=np.uint8)
        assert np.array_equal(tab[enc(tab[b])], tab[b])  # codebook idempotence
        x = np.arange(-32768, 32768, dtype=np.int64)
        err = np.abs(tab[enc(x)].astype(np.int64) - x)
        steps = np.diff(np.sort(tab.astype(np.int64)))
        assert err.max() <= steps.max() // 2 + (32768 - int(tab.max()))


@pytest.mark.parametrize("codec,min_snr", [("ulaw", 30.0), ("alaw", 35.0)])
def test_g711_wav_roundtrip_snr(codec, min_snr):
    from raylink.ops.imagecodec import decode_wav, encode_wav

    t = np.arange(16000)
    pcm = (np.sin(2 * np.pi * 500 * t / 8000) * 16384).astype(np.int16)
    enc = encode_wav(pcm, rate=8000, codec=codec)
    assert len(enc) < 16000 + 60  # one byte per sample + headers
    dec, rate = decode_wav(enc)
    assert rate == 8000
    ref = pcm / 32768.0
    noise = dec[:, 0] - ref
    snr = 10 * np.log10(np.sum(ref**2) / np.sum(noise**2))
    assert snr > min_snr
    # companded features stay close to the PCM ones (companding noise is
    # broadband, so the centroid drifts up a little — wider band than PCM)
    rms, zcr, centroid = ExtractAudioFeatures()._features(enc)
    assert abs(centroid - 500) < 120 and abs(zcr - 2 * 500 / 8000) < 0.01


def test_fake_media_table_cycles_audio_codecs():
    from raylink.ops.imagecodec import decode_wav
    from raylink.ops.multimodal import fake_media_table

    media = fake_media_table(64, seed=42).to_pandas()
    audio = media[media["kind"] == "audio"]
    assert set(audio["format"]) == {"wav", "flac"}
    fmts = set()
    for _, row in audio.iterrows():
        if row["format"] == "wav":
            import struct as _s

            tag = _s.unpack_from("<H", row["payload"], 20)[0]
            fmts.add({1: "pcm", 7: "ulaw", 6: "alaw", 0x11: "adpcm"}[tag])
    assert fmts == {"pcm", "ulaw", "adpcm"}


def test_ima_adpcm_roundtrip():
    from raylink.ops.imagecodec import decode_wav, encode_wav

    t = np.arange(9000)  # not a multiple of samples-per-block (505)
    pcm = (np.sin(2 * np.pi * 440 * t / 8000) * 12000).astype(np.int16)
    enc = encode_wav(pcm, rate=8000, codec="adpcm")
    # ~4:1 vs PCM16 (4 bits/sample + 4-byte header per 505-sample block,
    # final block zero-padded to block_align)
    assert len(enc) < len(pcm) * 2 * 0.27
    dec, rate = decode_wav(enc)
    assert rate == 8000 and dec.shape == (9000, 1)
    ref = pcm / 32768.0
    noise = dec[:, 0] - ref
    snr = 10 * np.log10(np.sum(ref**2) / np.sum(noise**2))
    assert snr > 22.0
    # each block header carries its first sample verbatim
    assert dec[0, 0] == pcm[0] / 32768.0 and dec[505, 0] == pcm[505] / 32768.0
    # deterministic, and second generation is lossless (decoder states align)
    assert enc == encode_wav(pcm, rate=8000, codec="adpcm")
    g2 = (dec[:, 0] * 32768).astype(np.int16)
    enc2 = encode_wav(g2, rate=8000, codec="adpcm")
    dec2, _ = decode_wav(enc2)
    assert np.array_equal((dec2[:, 0] * 32768).astype(np.int16), g2)


def test_ima_adpcm_nibble_semantics():
    # hand-decoded reference: predictor 0, index 0 (step 7), nibbles
    # [1, 8, 15]:
    #   n=1  → diff = 7>>3 + 7>>2 = 0+1 = 1,  pred 1,  index 0-1→0
    #   n=8  → diff = 0 (sign only),          pred 1,  index 0
    #   n=15 → diff = 0+7+3+1 = 11, sign → pred -10, index +8 → 8
    from raylink.ops.imagecodec import _ima_decode_nibbles

    out = _ima_decode_nibbles(np.array([1, 8, 15], dtype=np.uint8), 0, 0)
    assert out.tolist() == [1, 1, -10]


def test_qoi_roundtrip_all_ops():
    import numpy as np

    from raylink.ops.imagecodec import decode_qoi, encode_qoi, sniff_format

    rng = np.random.default_rng(21)
    # gradient (LUMA/DIFF ops) + noise (RGB literals + INDEX hits) + flat
    # rows (RUN, incl. >62-px runs)
    img = np.clip(
        np.linspace(0, 255, 48 * 70 * 3).reshape(48, 70, 3).astype(np.int64)
        + rng.integers(-9, 9, (48, 70, 3)),
        0, 255,
    ).astype(np.uint8)
    img[:3] = 128
    enc = encode_qoi(img)
    assert sniff_format(enc) == "qoi"
    dec = decode_qoi(enc)
    assert dec.dtype == np.uint8 and (dec == img).all()


def test_qoi_rejects_garbage():
    import pytest as _pytest

    from raylink.ops.imagecodec import decode_qoi

    with _pytest.raises(ValueError):
        decode_qoi(b"nope" + b"\x00" * 20)
