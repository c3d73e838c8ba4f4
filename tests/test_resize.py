"""multimodal.box_downscale / resize_images: the thumbnail stage."""

from __future__ import annotations

import numpy as np
import pytest

from unstract_spark.operators.multimodal import (
    box_downscale,
    encode_pgm,
    encode_ppm,
    resize_images,
)


def test_box_downscale_block_constant_recovers_values():
    vals = np.random.default_rng(1).integers(0, 256, (8, 8), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 4, axis=0), 4, axis=1)
    assert np.array_equal(box_downscale(img, 4), vals)


def test_box_downscale_floor_division_semantics():
    # mean of [0, 1, 2, 4] = 1.75 -> floor -> 1 (int domain, oracle-able)
    img = np.array([[0, 1], [2, 4]], dtype=np.uint8)
    assert box_downscale(img, 2)[0, 0] == 1


def test_box_downscale_crops_trailing_remainder():
    img = np.arange(9 * 11, dtype=np.uint8).reshape(9, 11)
    out = box_downscale(img, 4)
    assert out.shape == (2, 2)


def test_box_downscale_rgb_keeps_channels():
    img = np.random.default_rng(2).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    out = box_downscale(img, 2)
    assert out.shape == (4, 4, 3)
    assert out.dtype == np.uint8


def test_box_downscale_too_small_raises():
    with pytest.raises(ValueError, match="smaller"):
        box_downscale(np.zeros((3, 3), np.uint8), 4)


def test_resize_images_distributed_with_error_isolation(spark):
    vals = np.random.default_rng(3).integers(0, 256, (8, 8), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 4, axis=0), 4, axis=1)
    rgb = np.random.default_rng(4).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("gray.pgm", bytearray(encode_pgm(img))),
            ("color.ppm", bytearray(encode_ppm(rgb))),
            ("broken.bin", bytearray(b"not an image")),
        ],
        "file_path string, content binary",
    )
    rows = {r.file_path: r for r in resize_images(df, factor=4, fake=False).collect()}
    g = rows["gray.pgm"]
    assert (g.width, g.height, g.channels) == (8, 8, 1)
    assert np.array_equal(
        np.frombuffer(g.pixels, np.uint8).reshape(8, 8), vals
    )
    c = rows["color.ppm"]
    assert (c.width, c.height, c.channels) == (2, 2, 3)
    assert c.resize_error is None
    b = rows["broken.bin"]
    assert b.pixels is None and b.resize_error  # row-level isolation


def test_downsample_audio_exact_and_partial_group(spark):
    import numpy as np

    from unstract_spark.operators.multimodal import (
        decode_wav,
        downsample_audio,
        encode_wav16,
    )

    samples = np.array([10, 20, 30, 40, -7, -8, -9], dtype=np.int16)
    wav = encode_wav16(samples, rate=8000)
    df = spark.createDataFrame([(1, wav), (2, b"junk")], "doc_id long, content binary")
    rows = {r.doc_id: r for r in downsample_audio(df, factor=4).collect()}
    out, rate = decode_wav(bytes(rows[1].content))
    # groups: floor(mean(10,20,30,40))=25; floor(mean(-7,-8,-9))=-8
    assert list(out) == [25, -8]
    assert rate == 2000 and rows[1].n_samples == 2
    assert rows[2].content is None and "Error" in rows[2].resample_error


def test_downsample_audio_factor_validation(spark):
    import pytest

    from unstract_spark.operators.multimodal import downsample_audio

    df = spark.createDataFrame([(1, b"")], "doc_id long, content binary")
    with pytest.raises(ValueError, match="factor"):
        downsample_audio(df, factor=0)
