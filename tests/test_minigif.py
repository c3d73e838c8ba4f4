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
