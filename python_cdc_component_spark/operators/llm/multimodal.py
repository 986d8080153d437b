"""Multimodal columns: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video content rides as an
opaque ``binary`` column with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The real codec libraries are not in this
container, so ``decode_frames`` uses a **deterministic fake decode**
(fixed-size byte frames + md5 per frame) behind the same signature the
real decoder would have, and ``extract_features`` is an explicit
``NotImplementedError`` stub; the Spark-side plumbing — schema,
partitioning, batch shape — is real and tested.

Scale notes: mapInPandas streams Arrow batches; payload bytes never
materialize on the driver. Frame explosion multiplies rows, so the
operator repartitions by content id first to keep output partitions
balanced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_BYTES = 256

MULTIMODAL_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video|text
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("n_bytes", T.LongType()),
        T.StructField("encoding", T.StringType()),
        T.StructField("source", T.StringType()),
    ]), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_bytes", T.IntegerType(), False),
    T.StructField("frame_hash", T.StringType(), False),
])


def to_multimodal(df: DataFrame, id_col: str, payload_col: str,
                  media_type: str = "text",
                  source_col: str | None = None) -> DataFrame:
    """Wrap a raw column into the multimodal contract (payload binary +
    metadata struct)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("content_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
            (F.col(source_col) if source_col else F.lit(None).cast("string"))
            .alias("source"),
        ).alias("meta"))


def decode_frames(df: DataFrame, frame_bytes: int = FRAME_BYTES,
                  partitions: int | None = None) -> DataFrame:
    """Fake-decode each payload into fixed-size frames (deterministic:
    frame i = payload[i*N:(i+1)*N], hash = md5(frame)).

    A real decoder (PIL/ffmpeg) drops into the same mapInPandas body —
    only the bytes → frames function changes.
    """
    src = df.select("content_id", "payload")
    if partitions:
        src = src.repartition(partitions, "content_id")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"content_id": [], "frame_idx": [], "frame_bytes": [],
                   "frame_hash": []}
            for cid, payload in zip(pdf["content_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                for i in range(0, max(len(data), 1), frame_bytes):
                    chunk = data[i:i + frame_bytes]
                    out["content_id"].append(cid)
                    out["frame_idx"].append(i // frame_bytes)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
])

N_FEATURE_BINS = 16


def extract_features(df: DataFrame, backend: str = "histogram") -> DataFrame:
    """Feature-extract each payload into ``(content_id, embedding)`` via
    an Arrow-batched ``mapInPandas`` stage — the exact plumbing a model
    encoder plugs into.

    ``backend='histogram'`` is the DETERMINISTIC FAKE encoder (the real
    codec/model libraries are not in this container): a 16-bin byte
    histogram of the payload, L2-normalized, elements rounded to 9 dp.
    It is a real featurizer (byte-distribution signature), so the whole
    pipeline — binary column in, Arrow batches through Python, dense
    vector out — is testable end-to-end and oracled by the driver.
    ``backend='model'`` is the declared extension point and raises."""
    if backend != "histogram":
        raise NotImplementedError(
            "model feature extraction requires image/audio libraries; "
            "plug the encoder into this mapInPandas body")

    import math

    import numpy as np

    src = df.select("content_id", "payload")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for cid, payload in zip(pdf["content_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(data >> 4, minlength=N_FEATURE_BINS)
                hist = hist[:N_FEATURE_BINS].astype(np.float64)
                norm = math.sqrt(float((hist * hist).sum())) or 1.0
                ids.append(cid)
                vecs.append([round(float(c) / norm, 9) for c in hist])
            yield pd.DataFrame({"content_id": ids, "embedding": vecs})

    return src.mapInPandas(encode, schema=FEATURE_SCHEMA)
