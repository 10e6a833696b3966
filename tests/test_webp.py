"""VP8L (WebP lossless) codec: spec tables, round-trips through every
transform / entropy branch, container handling, and the DecodeImage
integration. All single-process (no Ray session needed)."""

import numpy as np
import pyarrow as pa
import pytest

from raylink.ops.webpcodec import (
    _CODE_TO_PLANE,
    _plane_code_to_distance,
    _prefix_value_encode,
    decode_webp,
    encode_webp,
)


def _gradient(h, w, seed=1):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)[None, :]
    y = np.linspace(0, 255, h)[:, None]
    img = np.stack([x + 0 * y, y + 0 * x, (x + y) / 2], axis=2)
    return np.clip(img + rng.integers(-9, 9, (h, w, 3)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- tables


def test_distance_map_is_the_near_neighborhood():
    """The 120 plane codes are exactly the (y 0..7, x -7..8) pixels that
    precede the current one in raster order, each appearing once."""
    pairs = set()
    for b in _CODE_TO_PLANE:
        y, x = b >> 4, 8 - (b & 0xF)
        assert (y > 0) or (x > 0)
        assert 0 <= y <= 7 and -7 <= x <= 8
        pairs.add((y, x))
    assert len(pairs) == 120


def test_plane_code_to_distance():
    # code 2 is (y=0, x=1): the previous pixel at any width
    assert _plane_code_to_distance(100, 2) == 1
    # code 1 is (y=1, x=0): exactly one row back
    assert _plane_code_to_distance(37, 1) == 37
    # codes beyond the map are direct distances
    assert _plane_code_to_distance(100, 121) == 1
    assert _plane_code_to_distance(100, 500) == 380
    # narrow images can make a mapped offset non-positive; clamped to 1
    assert _plane_code_to_distance(1, 2) == 1


def test_prefix_value_codes_cover_the_range():
    for v in list(range(1, 300)) + [4095, 4096]:
        p, bits, nbits = _prefix_value_encode(v)
        if p < 4:
            assert v == p + 1 and nbits == 0
        else:
            extra = (p - 2) >> 1
            offset = (2 + (p & 1)) << extra
            assert v == offset + bits + 1
            assert nbits == extra


# ------------------------------------------------------------ round-trips


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subtract_green": True},
        {"cache_bits": 4},
        {"use_rle": True},
        {"color_transform": (23, 250, 13)},
        {"subtract_green": True, "color_transform": (5, 10, 200), "predictor_mode": 12},
        {"meta_bits": 3},
        {"meta_bits": 2, "cache_bits": 3, "use_rle": True},
    ],
)
def test_roundtrip_transform_stacks(kw):
    img = _gradient(21, 33)
    assert np.array_equal(decode_webp(encode_webp(img, **kw)), img)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_all_predictor_modes(mode):
    img = _gradient(15, 22, seed=mode)
    assert np.array_equal(decode_webp(encode_webp(img, predictor_mode=mode)), img)


@pytest.mark.parametrize("n_colors,label", [(2, "1bit"), (4, "2bit"), (13, "4bit"), (200, "8bit")])
def test_roundtrip_palette_bundling(n_colors, label):
    rng = np.random.default_rng(7)
    idx = rng.integers(0, n_colors, (17, 29))
    lut = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = lut[idx]
    assert np.array_equal(decode_webp(encode_webp(img, palette=True)), img)


def test_roundtrip_rgba_and_alpha_shape():
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (11, 13, 4), dtype=np.uint8)
    dec = decode_webp(encode_webp(rgba))
    assert dec.shape == (11, 13, 4)
    assert np.array_equal(dec, rgba)
    # fully-opaque alpha collapses to RGB
    rgb = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    assert decode_webp(encode_webp(rgb)).shape == (5, 6, 3)


def test_roundtrip_extreme_sizes():
    rng = np.random.default_rng(9)
    one = rng.integers(0, 256, (1, 1, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(one)), one)
    row = rng.integers(0, 256, (1, 40, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(row, use_rle=True)), row)
    col = rng.integers(0, 256, (40, 1, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(col, predictor_mode=2)), col)


def test_constant_image_compresses_via_rle():
    img = np.full((64, 64, 3), 77, dtype=np.uint8)
    enc = encode_webp(img, use_rle=True)
    assert len(enc) < 200  # 12k pixels collapse into a handful of backrefs
    assert np.array_equal(decode_webp(enc), img)


# ------------------------------------------------------------- container


def test_container_and_errors():
    img = _gradient(8, 8)
    enc = encode_webp(img)
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WEBP" and enc[12:16] == b"VP8L"
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVEdata")
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all----")
    # lossy VP8 chunk is the documented boundary
    lossy = b"RIFF" + b"\x14\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x04\x00\x00\x00" + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)


def test_sniff_format_webp():
    from raylink.ops.imagecodec import sniff_format

    assert sniff_format(encode_webp(_gradient(4, 4))) == "webp"


# ------------------------------------------------------------ integration


def test_decode_image_actor_handles_webp():
    from raylink.ops.multimodal import DecodeImage

    img = _gradient(16, 16)
    payloads = [
        encode_webp(img, subtract_green=True, predictor_mode=11),
        encode_webp(img, cache_bits=6, use_rle=True),
    ]
    d = DecodeImage(dim=4, fake=False)
    out = d(
        pa.table(
            {
                "media_id": pa.array([0, 1], type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )
    )
    feats = np.asarray(out.column("feat").to_pylist())
    # identical pixels through two different transform stacks → identical
    # features, bit for bit
    assert np.array_equal(feats[0], feats[1])


def test_media_table_has_real_webp_rows():
    from raylink.ops.multimodal import DecodeImage, fake_media_table

    media = fake_media_table(64, seed=42)
    rows = [r for r in media.to_pylist() if r["format"] == "webp"]
    assert rows, "expected webp rows in the 64-row media table"
    d = DecodeImage(dim=8, fake=False)
    out = d(
        pa.table(
            {
                "media_id": pa.array([r["media_id"] for r in rows], type=pa.int64()),
                "payload": pa.array([r["payload"] for r in rows], type=pa.binary()),
            }
        )
    )
    assert len(out) == len(rows)
