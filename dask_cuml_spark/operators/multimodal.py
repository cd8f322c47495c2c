"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata; SURVEY.md task brief).

The container has no image/audio codecs, so decode is STUBBED with a
deterministic fake (documented below) — but every Spark-side piece is
real: binary columns, struct metadata, Arrow-batched mapInPandas with an
explicit output schema, and batch-shape-preserving UDF signatures. Swap
`_fake_decode` for PIL/ffmpeg on a real cluster and nothing else changes.

Scale notes: mapInPandas streams Arrow batches (no per-row Python), and
binary payloads never pass through a shuffle here — decode is a narrow
map; downstream aggregates only carry the small extracted features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def attach_fake_binary(
    df: DataFrame, text_col: str = "text", binary_col: str = "payload"
) -> DataFrame:
    """Simulate an image/audio payload column: deterministic bytes derived
    from existing data (stand-in for a real binary column read from
    parquet/webdataset)."""
    return df.withColumn(
        binary_col, F.encode(F.col(text_col), "UTF-8").cast("binary")
    ).withColumn(
        "media_meta",
        F.struct(
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.lit("fake/raw").alias("mime"),
        ),
    )


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", FloatType()),
        StructField("feature_vec", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder. Deterministically expands bytes into a (h, w) uint8
    'image'. A real deployment replaces this with PIL.Image.open /
    torchvision / ffmpeg — the surrounding Arrow plumbing is unchanged.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(arr.size)), 1)
    return np.resize(arr, (side, side))


def _pil_decode(payload: bytes) -> np.ndarray:
    """Real decoder: PIL → grayscale uint8 array. Only reachable when the
    worker can import PIL (feature-detected at task time)."""
    import io as _io

    from PIL import Image

    with Image.open(_io.BytesIO(payload)) as img:
        return np.asarray(img.convert("L"), dtype=np.uint8)


def resolve_decoder(mode: str = "auto"):
    """Pick the decode branch: "fake" (stub), "pil" (require PIL), or
    "auto" — PIL when importable on THIS worker, else the stub. Called
    inside the UDF so each executor feature-detects its own environment;
    on a capable cluster the stub disappears with no code change."""
    if mode == "fake":
        return _fake_decode
    if mode == "pil":
        return _pil_decode
    try:
        import PIL  # noqa: F401

        return _pil_decode
    except ImportError:
        return _fake_decode


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    decode_mode: str = "fake",
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    Output: (doc_id, width, height, mean_luma, feature_vec[8]) — an
    8-bin intensity histogram as the stand-in embedding. decode_mode
    "fake"/"pil"/"auto" selects the decoder per worker (resolve_decoder);
    the fixture payloads are synthetic bytes, so the default stays "fake".
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _decode = resolve_decoder(decode_mode)
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                img = _decode(bytes(payload))
                hist = np.histogram(img, bins=8, range=(0, 256))[0]
                total = max(hist.sum(), 1)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "mean_luma": float(img.mean()),
                        "feature_vec": (hist / total).astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return df.select(id_col, binary_col).mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    every_n: int = 4,
) -> DataFrame:
    """'Video' frame sampling stub: split the payload into fixed-size
    chunks (frames) and keep every n-th — demonstrates the
    one-row-to-many mapInPandas shape used for real frame extraction."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                buf = bytes(payload)
                frame_size = 64
                n_frames = max(len(buf) // frame_size, 1)
                for i in range(0, n_frames, every_n):
                    chunk = buf[i * frame_size : (i + 1) * frame_size]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": int(i),
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return df.select(id_col, binary_col).mapInPandas(batches, schema)
