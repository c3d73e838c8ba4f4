"""Baseline JPEG codec (operators/minijpeg.py): round trips, exactness,
restart markers, subsampling, and loud rejection of unsupported modes.

No PIL/opencv in the container, so the decoder is exercised against the
module's own encoder — which is NOT circular for correctness because the
oracle-gated registry query `mm_jpeg_features` pins the decoded pixel
values to a DuckDB computation from the raw text bytes; these tests add
the paths the gate's DC-only fixtures don't reach (non-zero AC, ZRL,
chroma, 4:2:0, lossy quant).
"""

from __future__ import annotations

import numpy as np
import pytest

from unstract_spark.operators.minijpeg import decode_jpeg, encode_jpeg


def _rng():
    return np.random.default_rng(20260814)


def test_block_constant_gray_is_bit_exact():
    # the property the SQL oracle gate relies on: constant 8x8 tiles
    # survive DCT + unit quant exactly
    vals = _rng().integers(0, 256, size=(8, 8), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_block_constant_exact_across_full_byte_range():
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_random_gray_unit_quant_within_one_level():
    # arbitrary content exercises non-zero AC run/size codes; unit quant
    # bounds the round-trip error to coefficient rounding (max +/-1)
    img = _rng().integers(0, 256, size=(24, 40), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_non_multiple_of_8_dimensions_crop_back():
    img = _rng().integers(0, 256, size=(13, 21), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (13, 21)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_zrl_long_zero_runs():
    # one bright pixel per block bottom-right forces >16-zero AC runs
    img = np.zeros((16, 16), dtype=np.uint8)
    img[7::8, 7::8] = 255
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_restart_markers_reset_predictors():
    img = _rng().integers(0, 256, size=(40, 56), dtype=np.uint8)
    data = encode_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_rgb_444_round_trip():
    img = _rng().integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (16, 16, 3)
    # YCbCr forward/backward float conversions cost up to ~2 levels
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_rgb_420_subsampled_tiles_exact():
    # 16x16-constant tiles make 2x2 chroma box-averaging lossless, so
    # the subsampled path round-trips within conversion rounding
    v = _rng().integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(v, 16, axis=0), 16, axis=1)
    out = decode_jpeg(encode_jpeg(img, subsample=(2, 2), restart_interval=2))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_lossy_quant_decodes_and_degrades_gracefully():
    img = _rng().integers(0, 256, size=(32, 32), dtype=np.uint8)
    q = np.full((8, 8), 16, dtype=np.int64)
    out = decode_jpeg(encode_jpeg(img, quant=q))
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert 0 < err < 16  # lossy but sane


def test_smooth_gradient_compresses_well_lossy():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    q = np.full((8, 8), 8, dtype=np.int64)
    out = decode_jpeg(encode_jpeg(img, quant=q))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_arithmetic_and_lossless_sofs_rejected_loudly():
    # progressive (SOF2) is supported since r8; the still-unsupported
    # coding classes must keep failing loudly, never silently
    for sof in (0xC3, 0xC9, 0xCB):
        with pytest.raises(ValueError, match="unsupported"):
            decode_jpeg(
                b"\xff\xd8\xff" + bytes([sof]) + b"\x00\x0b\x08" + b"\x00" * 8
            )


def test_non_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_truncated_entropy_data_raises():
    img = _rng().integers(0, 256, size=(16, 16), dtype=np.uint8)
    data = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])


def test_multimodal_dispatch_routes_jpeg():
    from unstract_spark.operators.multimodal import _decode_one

    vals = _rng().integers(0, 256, size=(8, 8), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    assert np.array_equal(_decode_one(encode_jpeg(img), fake=False), img)


# ---------------------------------------------------------------------
# Progressive (SOF2): decode gated against the oracle-gated baseline —
# both containers carry the same quantized coefficients, so decodes
# must agree bit-for-bit on every pixel.
# ---------------------------------------------------------------------

from unstract_spark.operators.minijpeg import encode_jpeg_progressive


@pytest.mark.parametrize(
    "shape,subsample,dc_al,ac_al,ri",
    [
        ((64, 64), (1, 1), 1, 1, 0),       # gray, successive approx
        ((64, 64), (1, 1), 0, 0, 0),       # gray, spectral selection only
        ((40, 56), (1, 1), 2, 2, 0),       # non-multiple-of-8, deep approx
        ((64, 64, 3), (1, 1), 1, 1, 0),    # RGB 4:4:4
        ((64, 64, 3), (2, 2), 1, 1, 0),    # RGB 4:2:0
        ((64, 64), (1, 1), 1, 1, 4),       # restarts inside every scan
        ((48, 48, 3), (2, 1), 1, 2, 3),    # 4:2:2 + restarts + mixed Al
    ],
)
def test_progressive_decodes_identically_to_baseline(
    shape, subsample, dc_al, ac_al, ri
):
    img = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample=subsample))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img, subsample=subsample, dc_al=dc_al, ac_al=ac_al,
            restart_interval=ri,
        )
    )
    assert np.array_equal(base, prog)


def test_progressive_lossy_quant_matches_baseline():
    # a real quant table drives long zero runs -> EOB runs, ZRL, and
    # refinement correction bits all exercise
    q = np.clip(np.arange(1, 65).reshape(8, 8) * 3, 1, 255)
    img = _rng().integers(0, 256, size=(96, 80), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quant=q))
    prog = decode_jpeg(encode_jpeg_progressive(img, quant=q, ac_al=2))
    assert np.array_equal(base, prog)


def test_progressive_smooth_gradient_eob_runs():
    # smooth content -> most blocks have empty AC bands -> long
    # cross-block EOB runs in both first and refinement scans
    x = np.linspace(0, 255, 128)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_progressive_block_constant_is_bit_exact():
    # the mm_jpeg_features gate property holds for the progressive
    # container too: constant tiles + unit quant round-trip exactly
    vals = _rng().integers(0, 256, size=(8, 8), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(img)), img)


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    # Splice fill runs before the 2nd SOS and before EOI — both the
    # main marker walk and the post-scan resync must skip them.
    img = _rng().integers(0, 256, size=(24, 24), dtype=np.uint8)
    data = encode_jpeg_progressive(img)
    second_sos = data.index(b"\xff\xda", data.index(b"\xff\xda") + 2)
    padded = (
        data[:second_sos]
        + b"\xff\xff\xff"
        + data[second_sos:-2]
        + b"\xff\xff"
        + data[-2:]
    )
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))
