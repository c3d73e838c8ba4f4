"""AVI mux/demux + video frame-sampling operators.

Gates the pure-stdlib RIFF codec (miniavi.py) byte-for-byte and the
Spark-side fan-out operators (multimodal.frame_sample /
video_frame_features) including sampling arithmetic and row-level
error isolation. The SQL-oracle twin is queries.mm_video_features.
"""

import numpy as np
import pytest

from unstract_spark.operators.miniavi import (
    AviMeta,
    decode_frame,
    demux_avi,
    encode_avi,
)
from unstract_spark.operators.multimodal import (
    decode_pnm,
    frame_sample,
    video_frame_features,
)


def _frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_avi_roundtrip_rgb():
    frames = _frames(6, 8, 8)
    meta, raw = demux_avi(encode_avi(frames, fps=25))
    assert meta == AviMeta(width=8, height=8, bpp=24, n_frames=6, usec_per_frame=40000)
    assert len(raw) == 6
    for f, r in zip(frames, raw):
        assert np.array_equal(decode_frame(meta, r), f)


def test_avi_roundtrip_odd_stride():
    # w=5 -> 15-byte rows padded to 16: exercises the 4-byte alignment
    frames = _frames(3, 4, 5, seed=1)
    meta, raw = demux_avi(encode_avi(frames))
    assert (meta.width, meta.height) == (5, 4)
    for f, r in zip(frames, raw):
        assert np.array_equal(decode_frame(meta, r), f)


def test_avi_gray_input_replicates_channels():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    meta, raw = demux_avi(encode_avi([g]))
    d = decode_frame(meta, raw[0])
    for c in range(3):
        assert np.array_equal(d[:, :, c], g)


def test_avi_rejects_garbage_truncation_and_compressed():
    with pytest.raises(ValueError):
        demux_avi(b"")
    with pytest.raises(ValueError):
        demux_avi(b"RIFF\x08\x00\x00\x00WAVEfmt ")  # RIFF but not AVI
    good = encode_avi(_frames(2, 4, 4))
    with pytest.raises(ValueError):
        demux_avi(good[:40])  # truncated chunk run
    # flip biCompression in strf (offset: find 'strf' fourcc)
    i = good.index(b"strf")
    bad = bytearray(good)
    bad[i + 8 + 16 : i + 8 + 20] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        demux_avi(bytes(bad))
    # a '00dc' (compressed-frame) chunk is rejected loudly
    bad2 = bytearray(good)
    j = bad2.index(b"00db")
    bad2[j : j + 4] = b"00dc"
    with pytest.raises(ValueError, match="00dc|dc"):
        demux_avi(bytes(bad2))


def test_avi_encode_validations():
    with pytest.raises(ValueError):
        encode_avi([])
    with pytest.raises(ValueError):
        encode_avi([np.zeros((4, 4), np.uint8), np.zeros((5, 4), np.uint8)])


def test_frame_sample_real_and_error_rows(spark):
    frames = _frames(10, 4, 4, seed=2)
    avi = encode_avi(frames)
    df = spark.createDataFrame(
        [("v0", bytearray(avi)), ("bad", bytearray(b"not a video"))],
        "file_path string, content binary",
    )
    out = frame_sample(df, every_n=3).collect()
    good = sorted(
        (r for r in out if r.file_path == "v0"), key=lambda r: r.frame_number
    )
    assert [r.frame_number for r in good] == [0, 3, 6, 9]
    for r in good:
        img = decode_pnm(bytes(r.frame))
        assert np.array_equal(img, frames[r.frame_number])
        assert (r.width, r.height) == (4, 4)
    (err,) = [r for r in out if r.file_path == "bad"]
    assert err.decode_error and err.frame is None


def test_video_frame_features_match_numpy(spark):
    frames = _frames(4, 4, 4, seed=3)
    df = spark.createDataFrame(
        [("v", bytearray(encode_avi(frames)))], "file_path string, content binary"
    )
    rows = {
        r.frame_number: r.feat
        for r in video_frame_features(df, every_n=2).collect()
    }
    assert set(rows) == {0, 2}
    for fn in (0, 2):
        luma = frames[fn].astype(np.int64).sum(axis=2) // 3
        flat = luma.reshape(-1)
        mean = flat.sum() / flat.size
        std = float(np.sqrt(max((flat * flat).sum() / flat.size - mean * mean, 0)))
        feat = rows[fn]
        assert feat[0] == round(mean, 6) and feat[1] == round(std, 6)
        assert feat[2:] == [float(((flat // 64).clip(0, 3) == i).sum()) for i in range(4)]
