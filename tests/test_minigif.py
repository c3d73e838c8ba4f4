"""GIF87a/89a codec (minigif.py) + its _decode_one wiring.

The corpus gate is mm_resize_pixels (GIF is container %4==3); these
tests pin the codec contracts directly: LZW round trips (real
dictionary-growing compression AND the uncompressed-literal spelling),
interlaced row order, palette color, truncation errors.
"""

import numpy as np
import pytest

from unstract_spark.operators.minigif import decode_gif, encode_gif
from unstract_spark.operators.multimodal import _decode_one


def test_gray_roundtrip_compressed_and_uncompressed():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(17, 23), dtype=np.uint8)
    for compress in (True, False):
        data = encode_gif(px, compress=compress)
        assert data[:6] == b"GIF89a"
        out = decode_gif(data)
        assert np.array_equal(out, px)


def test_lzw_dictionary_growth_kwkwk():
    # long runs force KwKwK sequences and code-width growth past 9 bits
    px = np.tile(np.arange(64, dtype=np.uint8).repeat(8), (64, 1))[:64, :512]
    out = decode_gif(encode_gif(px, compress=True))
    assert np.array_equal(out, px)


def test_color_palette_roundtrip():
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[0] = (255, 0, 0)
    pal[1] = (0, 255, 0)
    pal[2] = (0, 0, 255)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    out = decode_gif(encode_gif(idx, palette=pal))
    assert out.shape == (2, 2, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[1, 0]) == (0, 0, 255)


def test_decode_one_dispatches_gif():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = _decode_one(encode_gif(px), fake=False)
    assert np.array_equal(out, px)


def test_gif_error_paths():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    good = encode_gif(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(Exception):
        decode_gif(good[:20])  # truncated mid-header/LZW
    with pytest.raises(ValueError):
        encode_gif(np.zeros((2, 2, 3), dtype=np.uint8))  # RGB input: encoder wants indices


def test_interlaced_rows_deinterlaced():
    # build a VALID interlaced GIF: store rows in the 4-pass schedule
    # order, then set the interlace flag in the image descriptor
    h, w = 13, 7
    target = (np.arange(h * w, dtype=np.uint8).reshape(h, w) * 3) % 251
    schedule = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                for r in range(start, h, step)]
    stored = target[schedule]
    data = bytearray(encode_gif(stored, compress=True))
    desc = 13 + 768  # header+LSD, then 256-entry GCT
    assert data[desc] == 0x2C
    data[desc + 9] |= 0x40  # interlace flag
    out = decode_gif(bytes(data))
    assert np.array_equal(out, target)


def test_animated_roundtrip_and_first_frame():
    from unstract_spark.operators.minigif import decode_gif_frames, encode_gif_frames

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, size=(5, 7), dtype=np.uint8) for _ in range(5)]
    data = encode_gif_frames(frames)
    out = decode_gif_frames(data)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    assert np.array_equal(decode_gif(data), frames[0])  # first-frame view


def test_animated_strictness_partial_and_transparent():
    from unstract_spark.operators.minigif import decode_gif_frames, encode_gif_frames

    frames = [np.zeros((4, 4), dtype=np.uint8), np.ones((4, 4), dtype=np.uint8)]
    data = bytearray(encode_gif_frames(frames))
    first = 13 + 768  # header + LSD + 256-entry GCT (0x2c can occur IN the palette)
    assert data[first] == 0x2C
    # walk past the first image block (descriptor + min_code + sub-blocks)
    pos = first + 10 + 1
    while data[pos] != 0:
        pos += 1 + data[pos]
    second = pos + 1
    assert data[second] == 0x2C
    # shrink the second image descriptor's width -> partial frame
    data[second + 5 : second + 7] = (3).to_bytes(2, "little")
    with pytest.raises(ValueError, match="partial|unexpected|truncated|range"):
        decode_gif_frames(bytes(data))
    # inject a GCE with the transparency flag before an image block
    data2 = bytearray(encode_gif_frames(frames))
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    data2[first:first] = gce
    with pytest.raises(ValueError, match="transparent"):
        decode_gif_frames(bytes(data2))


def test_frame_sample_gif_and_avi_parity(spark):
    from unstract_spark.operators.miniavi import encode_avi
    from unstract_spark.operators.minigif import encode_gif_frames
    from unstract_spark.operators.multimodal import decode_pnm, frame_sample

    rng = np.random.RandomState(13)
    frames = [rng.randint(0, 256, size=(4, 4), dtype=np.uint8) for _ in range(6)]
    df = spark.createDataFrame(
        [
            ("avi", bytearray(encode_avi(frames))),
            ("gif", bytearray(encode_gif_frames(frames))),
        ],
        "file_path string, content binary",
    )
    out = frame_sample(df, every_n=2).collect()
    by = {}
    for r in out:
        assert r.decode_error is None
        by.setdefault(r.file_path, {})[r.frame_number] = decode_pnm(bytes(r.frame))
    assert set(by["avi"]) == set(by["gif"]) == {0, 2, 4}
    for fn in (0, 2, 4):
        # both containers reproduce the same source frame (AVI stores
        # RGB replication of the gray frame; GIF the gray ramp palette)
        for container in ("avi", "gif"):
            img = by[container][fn]
            assert np.array_equal(img[:, :, 0], frames[fn])
