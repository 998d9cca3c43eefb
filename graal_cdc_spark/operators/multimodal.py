"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs. The
Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
signatures, partition sizing — is real and tested; the actual codec
calls are STUBBED (this container has no image/audio libraries):
``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic content-hash-seeded
feature vector so the pipeline shape is exercisable end-to-end.

Scale notes: media bytes dominate I/O, so the operators keep binary
payloads in Arrow record batches (no JVM→Python row serialization),
never collect them, and cap batch sizes via
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
large blobs cannot OOM a Python worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapt the documents table into the media schema (text bytes as
    the opaque payload) — the fixture for multimodal plumbing tests."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(F.col(text_col), 256).alias("sha256"),
        ).alias("meta"),
    )


def documents_as_media_mixed(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mixed-modality variant of :func:`documents_as_media`: modality
    assigned deterministically by id (id%3 → image/audio/video) so
    per-modality routing and mix accounting are exercisable without
    real media files."""
    media = documents_as_media(df, id_col, text_col)
    return media.withColumn(
        "media_type",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("media_id") % 3 + 1).cast("int"),
        ),
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: bytes → sha256 →
    FEATURE_DIM floats in [0, 1)."""
    d = hashlib.sha256(payload).digest()
    return [int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65536.0 for i in range(FEATURE_DIM)]


def decode_image_batch(payloads, fake: bool = False):
    """Decode a batch of image payloads → feature vectors.

    Real decode requires PIL/cv2 (absent in this container) — the
    plumbing around this call is the deliverable; swap in a real
    encoder on a cluster with the libs installed.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/cv2; pass fake=True for the "
            "deterministic content-hash feature stub"
        )
    return [_fake_feature(p) for p in payloads]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over media payloads.

    Arrow-batched: each pandas chunk holds a bounded number of
    payloads; output is a typed feature array column.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = decode_image_batch(list(pdf["payload"]), fake=fake)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, target: int = 64) -> DataFrame:
    """Image-resize stub: payload → (media_id, width, height, payload_out).

    Real resize needs PIL/cv2 (absent here); the deterministic fake
    derives "dimensions" from payload length and truncates the payload,
    preserving the real operator's shape: binary-in/binary-out
    mapInPandas with bounded Arrow batches — the 1→1 heavy-byte
    transform pattern (decode → transform → re-encode).
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [target] * len(pdf),
                    "height": [target] * len(pdf),
                    "payload_out": [p[: target * target // 16] for p in pdf["payload"]],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload_out", T.BinaryType()),
        ]
    )
    return media.mapInPandas(run, schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: emits (media_id, frame_no) rows for
    every ``every_n``-th synthetic frame — exercises the 1→N explode
    shape (mapInPandas output cardinality > input) used by real
    frame extraction."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, frames = [], []
            for mid, nb in zip(pdf["media_id"], pdf["meta"]):
                n_frames = max(1, int(nb["n_bytes"]) // 100)
                for f in range(0, n_frames, every_n):
                    ids.append(mid)
                    frames.append(f)
            yield pd.DataFrame({"media_id": ids, "frame_no": frames})

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
        ]
    )
    return media.mapInPandas(run, schema)
