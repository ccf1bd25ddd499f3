"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the *decode* kernels are
deterministic fakes behind a clearly-marked seam (`_decode_image_stub`),
while everything Spark-side — schemas, batch iteration, partitioning,
output shapes — is real and tested.  Swapping the stub for PIL/ffmpeg is a
one-function change that does not touch any plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake 'pixels' from the payload bytes.

    Real deployment: ``PIL.Image.open(io.BytesIO(payload))``.  The fake keeps
    the contract (bytes -> HxWx3 uint8) so downstream feature extraction,
    resize, and batching are exercised for real.
    """
    h = (len(payload) % 7) + 2
    w = (len(payload) % 5) + 2
    arr = np.frombuffer(
        (payload * ((h * w * 3) // max(len(payload), 1) + 1))[: h * w * 3], dtype=np.uint8
    )
    return arr.reshape(h, w, 3)


def _feature_vec(img: np.ndarray, dim: int = 8) -> np.ndarray:
    """Cheap channel-histogram feature (real numpy, not stubbed)."""
    flat = img.reshape(-1, 3).astype(np.float32)
    means = flat.mean(axis=0)
    stds = flat.std(axis=0)
    mx = flat.max(axis=0) if len(flat) else np.zeros(3, np.float32)
    vec = np.concatenate([means, stds, mx[:2]])[:dim]
    return (vec / 255.0).astype(np.float32)


def decode_and_featurize(media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas stage: binary payload -> (dims, bytes, feature vector).

    Arrow batches stream through the worker; no row ever crosses the
    JVM/Python boundary alone.  Partitioning of the input is preserved —
    decode is embarrassingly parallel, so there is no shuffle at all.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            ids = pdf[id_col]
            rows = []
            for i, p in zip(ids.to_numpy(), payloads.to_numpy()):
                b = bytes(p) if p is not None else b""
                img = _decode_image_stub(b)
                rows.append(
                    (
                        int(i),
                        "image",
                        int(img.shape[1]),
                        int(img.shape[0]),
                        len(b),
                        _feature_vec(img).tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "width", "height", "n_bytes", "feature"]
            )

    return media.mapInPandas(_batches, IMAGE_META_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas UDTF-style stage: one video payload -> N sampled frame rows
    (the multimodal analog of the reference's one-record->N-blocks enforcer,
    SURVEY.md §2.9).  Frame decode is the same stub seam."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, p in zip(pdf[id_col].to_numpy(), pdf[payload_col].to_numpy()):
                b = bytes(p) if p is not None else b""
                n_frames = max(len(b) % 10, 1)
                for f in range(0, n_frames, every_n):
                    img = _decode_image_stub(b + bytes([f]))
                    rows.append((int(i), f, _feature_vec(img).tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "feature"])

    return media.mapInPandas(_batches, out_schema)
