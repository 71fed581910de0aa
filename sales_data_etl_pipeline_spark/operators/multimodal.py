"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each Python worker processes
whole record batches (never row-at-a-time).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment —
the decode kernels below are **deterministic stand-ins, clearly marked**:
they parse only byte-length-derived pseudo-metadata. The Spark-side
contract — schemas, batch iteration, partitioning, UDF signatures — is
real and tested; swapping a real codec in changes one inner function.

Scale design: binary payloads dominate row size, so operators (a) select
only the columns they touch (column pruning keeps payload scans out of
metadata-only queries), (b) repartition by id before compute-heavy
decode so every core gets work, and (c) emit fixed-size features/frames
so downstream shuffles are payload-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried alongside every payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def attach_metadata(
    df: DataFrame, *, payload_col: str = "payload", media_type: str = "image"
) -> DataFrame:
    """Derive the typed metadata struct from the payload column
    (JVM-side — ``octet_length``, no Python)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("format"),
            F.octet_length(payload_col).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode_dims(n_bytes: int) -> tuple[int, int, int]:
    """STUB — deterministic pseudo-decode. A real implementation parses
    the image header (PIL.Image.open). Stands in because image libs are
    not in this container."""
    return (64 + n_bytes % 512, 64 + (n_bytes * 7) % 512, 3)


def decode_images(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode image payloads → (media_id, width, height, channels).

    ``mapInPandas``: Arrow record batches in, pandas frames out; the
    decode kernel sees a whole batch of payloads per call.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode_dims(len(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(decode, DECODED_IMAGE_SCHEMA)
    )


def extract_features(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Fixed-dim feature vector per payload (STUB kernel: byte-histogram
    folded to FEATURE_DIM floats — a real one runs a vision/audio model
    over the batch)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                total = max(len(arr), 1)
                feats.append((hist / total).astype("float32"))
            yield pd.DataFrame({"media_id": pdf[id_col], "feature": feats})

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(featurize, FEATURE_SCHEMA)
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame_bytes: int = 256,
    every_nth: int = 4,
) -> DataFrame:
    """Frame sampling for video payloads: split the byte stream into
    fixed-size chunks, keep every Nth (STUB chunking — a real one seeks
    keyframes via the container index). One input row → many frame rows."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                n_frames = max(len(raw) // frame_bytes, 1)
                for i in range(0, n_frames, every_nth):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    sc = df.sparkSession.sparkContext
    return (
        df.select(id_col, payload_col)
        .repartition(sc.defaultParallelism, id_col)
        .mapInPandas(sample, FRAME_SCHEMA)
    )
