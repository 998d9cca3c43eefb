"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs. The
Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
signatures, partition sizing — is real and tested. Codec status is
per-format and honest about it:

- **REAL** (pure numpy, validated, oracle-gated round-trips): BMP
  (BI_RGB 24-bit — ``encode_bmp``/``decode_bmp``/``resize_bmp_nn``,
  mm07), WAV (RIFF mono 16-bit PCM — ``encode_wav``/``decode_wav``,
  mm08), the BMP reel video container (length-prefixed frame
  walk + sampled per-frame decode — ``iter_bmp_reel``/
  ``decode_bmp_reel``/``reel_frame_stats``, mm09), and PNG
  (8-bit truecolor, stdlib-zlib DEFLATE + all five scanline filters,
  per-chunk CRC validation — ``encode_png``/``decode_png``, mm11):
  the COMPRESSED format the environment does not block.
- **STUBBED** (needs PIL/cv2/ffmpeg, absent in this container):
  other compressed formats (JPEG/FLAC/...) — ``decode_image_batch`` raises
  ``NotImplementedError`` unless ``fake=True``, which substitutes a
  deterministic content-hash feature vector so the pipeline shape is
  exercisable end-to-end (mm02–mm04).

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


# ---------------------------------------------------------------------------
# REAL codec leg: BMP (BI_RGB 24-bit), pure numpy — no external image
# library needed, so this container can run an actual decode path end
# to end. PIL/cv2-needing formats (JPEG/...) stay honestly
# stubbed above; everything below is a real encoder/decoder pair with
# strict validation, plus the real resize built on it.
# ---------------------------------------------------------------------------

import struct

BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a BI_RGB 24-bit BMP
    (bottom-up rows, BGR byte order, 4-byte row padding — the classic
    Windows 3.x layout every viewer reads)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3 or px.shape[0] < 1 or px.shape[1] < 1:
        raise ValueError(f"encode_bmp: need (h, w, 3) pixels, got {px.shape}")
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = b"BM" + struct.pack("<IHHI", BMP_HEADER_SIZE + img_size, 0, 0,
                                 BMP_HEADER_SIZE)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - w * 3)
    rows = [
        px[y, :, ::-1].tobytes() + pad  # RGB -> BGR, bottom-up
        for y in range(h - 1, -1, -1)
    ]
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes):
    """Decode a BI_RGB 24-bit BMP into an (h, w, 3) uint8 RGB array.

    Strict: every header field that this decoder relies on is
    validated and a truncated or lying payload raises ``ValueError``
    (the kafka-wire bounds-check rule — malformed media must fail
    loudly, not mis-parse)."""
    import numpy as np

    if len(payload) < BMP_HEADER_SIZE:
        raise ValueError("bmp: truncated header")
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr, w, h, planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr != 40:
        raise ValueError(f"bmp: unsupported DIB header size {hdr}")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"bmp: only BI_RGB 24-bit supported (planes={planes}, "
            f"bpp={bpp}, compression={comp})"
        )
    if w < 1 or h < 1:
        raise ValueError(f"bmp: bad dimensions {w}x{h}")
    row_size = (w * 3 + 3) & ~3
    need = offset + row_size * h
    if len(payload) < need:
        raise ValueError(
            f"bmp: truncated pixel array ({len(payload)} < {need})"
        )
    data = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=offset
    ).reshape(h, row_size)
    bgr = data[:, : w * 3].reshape(h, w, 3)[::-1]  # bottom-up -> top-down
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def resize_bmp_nn(payload: bytes, target_h: int, target_w: int) -> bytes:
    """REAL nearest-neighbor resize: decode → index-map → re-encode.
    The binary-in/binary-out transform ``resize_stub`` only mimed."""
    import numpy as np

    if target_h < 1 or target_w < 1:
        raise ValueError("resize_bmp_nn: target dims must be >= 1")
    px = decode_bmp(payload)
    h, w, _ = px.shape
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return encode_bmp(px[ys][:, xs])


def documents_as_bmp(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic BMP fixture: each document becomes a REAL
    ``4+(id%4) × 4+(id%3)`` image whose flat RGB bytes are the doc's
    character codes mod 256, cycled — an arithmetic a SQL oracle can
    restate exactly (see mm07), so the encode→decode round-trip is
    oracle-checkable. Arrow-batched mapInPandas, binary out."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads, heights, widths = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    raise ValueError(
                        f"documents_as_bmp: empty text for id {mid}"
                    )
                h = 4 + int(mid) % 4
                w = 4 + int(mid) % 3
                # CODEPOINTS mod 256 (not an encoding) — exactly what
                # a SQL oracle states as ascii(substr(...)) % 256,
                # vectorized via the fixed-width utf-32 view
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ) % 256
                ).astype(np.uint8)
                idx = np.arange(h * w * 3) % len(codes)
                payloads.append(
                    encode_bmp(codes[idx].reshape(h, w, 3))
                )
                heights.append(h)
                widths.append(w)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": payloads,
                    "height": heights,
                    "width": widths,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def bmp_decode_stats(media: DataFrame) -> DataFrame:
    """Decode REAL BMP payloads and emit integer pixel statistics —
    dims from the parsed header, per-channel byte sums from the pixel
    array. Computed from the DECODED image, so the result proves the
    encoder and decoder invert each other on every payload."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "height": [], "width": [],
                    "sum_r": [], "sum_g": [], "sum_b": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp(bytes(payload))
                rows["media_id"].append(mid)
                rows["height"].append(px.shape[0])
                rows["width"].append(px.shape[1])
                sums = px.reshape(-1, 3).sum(axis=0, dtype="int64")
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# REAL audio leg: WAV (RIFF, 16-bit PCM) — same rule as the BMP leg:
# a format this container can encode AND decode for real, with strict
# validation, so the audio plumbing is exercised by an actual codec.
# ---------------------------------------------------------------------------

WAV_HEADER_SIZE = 44  # RIFF + fmt(16) + data chunk headers


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode an int16 array as a mono 16-bit PCM WAV (the canonical
    44-byte RIFF/fmt/data layout)."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1 or s.size < 1:
        raise ValueError(f"encode_wav: need a non-empty 1-d array, got {s.shape}")
    if sample_rate < 1:
        raise ValueError("encode_wav: sample_rate must be >= 1")
    data = s.tobytes()
    byte_rate = sample_rate * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                byte_rate, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes):
    """Decode a mono 16-bit PCM WAV → (samples int16 array, rate).
    Truncated or non-PCM payloads raise ``ValueError``."""
    import numpy as np

    if len(payload) < WAV_HEADER_SIZE:
        raise ValueError("wav: truncated header")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: bad magic")
    if payload[12:16] != b"fmt ":
        raise ValueError("wav: missing fmt chunk")
    (fmt_size, audio_fmt, channels, rate, _brate, _align, bits) = (
        struct.unpack_from("<IHHIIHH", payload, 16)
    )
    if fmt_size != 16 or audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"wav: only mono 16-bit PCM supported (fmt={audio_fmt}, "
            f"ch={channels}, bits={bits}, fmt_size={fmt_size})"
        )
    if payload[36:40] != b"data":
        raise ValueError("wav: missing data chunk")
    n_bytes = struct.unpack_from("<I", payload, 40)[0]
    if n_bytes % 2 != 0:
        raise ValueError("wav: odd data length for 16-bit samples")
    if len(payload) < WAV_HEADER_SIZE + n_bytes:
        raise ValueError(
            f"wav: truncated data ({len(payload)} < {WAV_HEADER_SIZE + n_bytes})"
        )
    samples = np.frombuffer(
        payload, dtype="<i2", count=n_bytes // 2, offset=WAV_HEADER_SIZE
    )
    return samples.copy(), rate


def documents_as_wav(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic WAV fixture: ``16 + (id % 16)`` samples, sample j
    = ``(codepoint(text[j mod len]) mod 256) * 64 - 8192`` — centered
    int16 values a SQL oracle restates exactly (mm08)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads, counts = [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    raise ValueError(
                        f"documents_as_wav: empty text for id {mid}"
                    )
                n = 16 + int(mid) % 16
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ) % 256
                ).astype(np.int64)
                idx = np.arange(n) % len(codes)
                samples = (codes[idx] * 64 - 8192).astype(np.int16)
                payloads.append(encode_wav(samples))
                counts.append(n)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": payloads,
                    "n_samples": counts,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_samples", T.IntegerType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def wav_decode_stats(media: DataFrame) -> DataFrame:
    """Decode REAL WAV payloads → integer sample statistics (count,
    sum, min, max) from the DECODED samples — the encoder/decoder
    inversion proof for the audio leg."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "n_samples": [], "sum_s": [],
                    "min_s": [], "max_s": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = decode_wav(bytes(payload))
                rows["media_id"].append(mid)
                rows["n_samples"].append(int(samples.size))
                rows["sum_s"].append(int(samples.sum(dtype="int64")))
                rows["min_s"].append(int(samples.min()))
                rows["max_s"].append(int(samples.max()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("sum_s", T.LongType()),
            T.StructField("min_s", T.LongType()),
            T.StructField("max_s", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)


def wav_feature_stats(media: DataFrame, frame: int = 8) -> DataFrame:
    """Audio FEATURE EXTRACTION over real decoded WAV samples — the
    windowed-analysis leg of the audio family (mm08 proves the codec
    inversion; this computes the features a training pipeline
    actually derives from the decoded signal). Per clip, integer
    EXACT so a SQL oracle restates it bit-for-bit:

    - ``n_frames``: full ``frame``-sample analysis windows (the
      ragged tail is dropped — standard framing);
    - ``energy``: sum of squared samples over the FULL frames (frame
      energy summed — int64, no floats);
    - ``zero_crossings``: strict sign changes between adjacent
      samples across the WHOLE clip (s_j * s_{j+1} < 0);
    - ``peak``: max absolute sample.

    Scale shape: Arrow-batched mapInPandas, numpy-vectorized per
    clip; one map stage, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "n_frames": [], "energy": [],
                    "zero_crossings": [], "peak": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                nf = s.size // frame
                head = s[: nf * frame]
                rows["media_id"].append(mid)
                rows["n_frames"].append(int(nf))
                rows["energy"].append(int((head * head).sum()))
                rows["zero_crossings"].append(
                    int(((s[:-1] * s[1:]) < 0).sum())
                )
                rows["peak"].append(int(np.abs(s).max()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("energy", T.LongType()),
            T.StructField("zero_crossings", T.LongType()),
            T.StructField("peak", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# REAL video leg: a BMP "reel" — length-prefixed concatenated BMP
# frames (each frame self-describes its byte length in its own
# header, so the container walk is a real length-prefixed record
# parse, the same discipline as the Kafka RecordBatch reader). Frame
# sampling then decodes only the selected frames — the mm03 shape
# with an actual codec underneath.
# ---------------------------------------------------------------------------


def encode_bmp_reel(frames) -> bytes:
    """Concatenate (h, w, 3) uint8 RGB frames as back-to-back BMPs."""
    if not frames:
        raise ValueError("encode_bmp_reel: need at least one frame")
    return b"".join(encode_bmp(f) for f in frames)


def iter_bmp_reel(payload: bytes):
    """Walk a BMP reel WITHOUT decoding pixel data: yields
    ``(frame_no, offset, length)`` by reading each frame's declared
    file size — the container parse is O(frames), not O(bytes
    decoded), so sampling can skip frames it never touches.
    Truncated or lying frames raise ``ValueError``."""
    pos, frame_no = 0, 0
    total = len(payload)
    while pos < total:
        if total - pos < BMP_HEADER_SIZE:
            raise ValueError(
                f"bmp reel: trailing garbage at offset {pos}"
            )
        if payload[pos : pos + 2] != b"BM":
            raise ValueError(f"bmp reel: bad frame magic at offset {pos}")
        size = struct.unpack_from("<I", payload, pos + 2)[0]
        if size < BMP_HEADER_SIZE or pos + size > total:
            raise ValueError(
                f"bmp reel: frame {frame_no} declares {size} bytes at "
                f"offset {pos}, payload has {total - pos} left"
            )
        yield frame_no, pos, size
        pos += size
        frame_no += 1
    if frame_no == 0:
        raise ValueError("bmp reel: empty payload")


def decode_bmp_reel(payload: bytes, frame_filter=None):
    """Decode reel frames → list of (frame_no, pixels). With
    ``frame_filter`` (a predicate on frame_no) only matching frames
    are pixel-decoded; the rest are skipped via the header walk."""
    out = []
    for frame_no, pos, size in iter_bmp_reel(payload):
        if frame_filter is None or frame_filter(frame_no):
            out.append(
                (frame_no, decode_bmp(payload[pos : pos + size]))
            )
    return out


def documents_as_bmp_reel(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic video fixture: ``2 + (id % 3)`` frames of the
    mm07 image, frame ``f`` pixel = ``(code + f) mod 256`` — the
    wraparound is deliberate so an oracle must restate the exact
    arithmetic, not a shortcut."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads, counts = [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    raise ValueError(
                        f"documents_as_bmp_reel: empty text for id {mid}"
                    )
                h = 4 + int(mid) % 4
                w = 4 + int(mid) % 3
                n_frames = 2 + int(mid) % 3
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ) % 256
                ).astype(np.int64)
                idx = np.arange(h * w * 3) % len(codes)
                base = codes[idx]
                frames = [
                    ((base + f) % 256).astype(np.uint8).reshape(h, w, 3)
                    for f in range(n_frames)
                ]
                payloads.append(encode_bmp_reel(frames))
                counts.append(n_frames)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": payloads,
                    "n_frames": counts,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def reel_frame_stats(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every ``every_n``-th frame of each reel (REAL container
    walk + per-frame decode) and emit per-frame channel sums — the
    1→N mapInPandas explode shape over decoded video frames."""
    if every_n < 1:
        raise ValueError("reel_frame_stats: every_n must be >= 1")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "sum_r": [],
                    "sum_g": [], "sum_b": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_bmp_reel(
                    bytes(payload), lambda f: f % every_n == 0
                )
                for frame_no, px in decoded:
                    sums = px.reshape(-1, 3).sum(axis=0, dtype="int64")
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(frame_no)
                    rows["sum_r"].append(int(sums[0]))
                    rows["sum_g"].append(int(sums[1]))
                    rows["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)


def bmp_channel_histogram(media: DataFrame, bin_width: int = 64) -> DataFrame:
    """REAL feature extraction over decoded BMPs: per-channel pixel
    histograms (``256 // bin_width`` bins) computed from the DECODED
    image — the real-codec upgrade of the mm02 fake-feature stub.
    Emits one row per non-empty ``(media_id, channel, bin)``:
    ``(media_id, channel, bin, n_px)``.

    Scale shape: one Arrow-batched mapInPandas over the binary
    payloads (numpy bincount per image — no per-pixel Python); the
    histogram output is O(images × channels × bins), tiny next to the
    pixel data, so nothing pixel-sized ever shuffles.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "channel": [], "bin": [], "n_px": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp(bytes(payload))
                for c in range(3):
                    counts = np.bincount(px[:, :, c].reshape(-1) // bin_width)
                    for b, n in enumerate(counts):
                        if n:
                            rows["media_id"].append(mid)
                            rows["channel"].append(c)
                            rows["bin"].append(b)
                            rows["n_px"].append(int(n))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("channel", T.IntegerType()),
            T.StructField("bin", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# REAL compressed-image leg: PNG (RFC 2083) — the one compressed
# format this container can implement for real: DEFLATE comes from
# stdlib ``zlib`` and the five scanline filters (None/Sub/Up/Average/
# Paeth) are numpy + small per-row reconstruction loops. Same rules as
# the BMP leg: strict validation (signature, chunk CRCs, IHDR fields,
# inflated-length check) so malformed media fail loudly, and an
# oracle-gated encode→decode round-trip (mm11).
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    # RFC 2083 §6.6 predictor: nearest of left/up/up-left to a+b-c,
    # ties broken left, up, up-left.
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG.

    Each scanline is forward-filtered with filter type ``y % 5`` —
    deterministic, and it exercises ALL five PNG filters in every
    image taller than 4 rows, so the mm11 round-trip gate covers the
    whole filter set, not just the easy ones.
    """
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3 or px.shape[0] < 1 or px.shape[1] < 1:
        raise ValueError(f"encode_png: need (h, w, 3) pixels, got {px.shape}")
    h, w, _ = px.shape
    bpp = 3
    raw = px.reshape(h, w * bpp).astype(np.int16)
    lines = []
    zero = np.zeros(w * bpp, dtype=np.int16)
    for y in range(h):
        cur = raw[y]
        prior = raw[y - 1] if y > 0 else zero
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int16), prior[:-bpp]])
        f = y % 5
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - (left + prior) // 2
        else:
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prior, ul)),
                dtype=np.int16,
                count=w * bpp,
            )
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), level)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode an 8-bit truecolor (color type 2, no interlace) PNG into
    an (h, w, 3) uint8 RGB array.

    Strict: signature, per-chunk CRC32, IHDR fields, and the inflated
    byte count are all validated — a truncated, bit-flipped, or lying
    payload raises ``ValueError`` (the kafka-wire bounds-check rule).
    """
    import zlib

    import numpy as np

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("png: bad signature")
    pos = len(PNG_SIG)
    ihdr = None
    idat_parts = []
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("png: truncated chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data_end = pos + 8 + length
        if data_end + 4 > len(payload):
            raise ValueError(f"png: truncated {ctype!r} chunk")
        data = payload[pos + 8 : data_end]
        (crc,) = struct.unpack_from(">I", payload, data_end)
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"png: CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat_parts.append(data)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are CRC-checked and skipped
        pos = data_end + 4
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    if len(ihdr) != 13:
        raise ValueError(f"png: IHDR must be 13 bytes, got {len(ihdr)}")
    if not seen_iend:
        raise ValueError("png: missing IEND")
    if not idat_parts:
        raise ValueError("png: missing IDAT")
    w, h, depth, ctype_f, comp, filt_m, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ctype_f != 2:
        raise ValueError(
            f"png: only 8-bit truecolor supported (depth={depth}, "
            f"color_type={ctype_f})"
        )
    if comp != 0 or filt_m != 0:
        raise ValueError("png: bad compression/filter method")
    if interlace != 0:
        raise ValueError("png: interlaced images not supported")
    if w < 1 or h < 1:
        raise ValueError(f"png: bad dimensions {w}x{h}")
    raw = zlib.decompress(b"".join(idat_parts))
    bpp = 3
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"png: inflated size {len(raw)} != expected {h * (stride + 1)}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            recon = line
        elif f == 2:
            recon = (line + prior) & 0xFF
        elif f in (1, 3, 4):
            # left-dependent filters reconstruct sequentially within
            # the row (RFC 2083 §6.5-6.6); rows stay numpy int32 and
            # the loop is per-byte over ONE scanline
            recon = line.copy()
            for x in range(stride):
                a = int(recon[x - bpp]) if x >= bpp else 0
                if f == 1:
                    recon[x] = (recon[x] + a) & 0xFF
                elif f == 3:
                    recon[x] = (recon[x] + (a + int(prior[x])) // 2) & 0xFF
                else:
                    c = int(prior[x - bpp]) if x >= bpp else 0
                    recon[x] = (
                        recon[x] + _paeth(a, int(prior[x]), c)
                    ) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {f} in row {y}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out.reshape(h, w, 3)


def documents_as_png(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic PNG fixture: the SAME generative pixel arithmetic
    as :func:`documents_as_bmp` (codepoints mod 256, cycled, RGB
    interleave, ``4+(id%4) × 4+(id%3)`` dims) — so the mm11 oracle can
    restate the decoded pixels straight from the text — but encoded
    through the REAL compressed path: five rotating scanline filters +
    DEFLATE. Arrow-batched mapInPandas, binary out."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads, heights, widths, sizes = [], [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    raise ValueError(
                        f"documents_as_png: empty text for id {mid}"
                    )
                h = 4 + int(mid) % 4
                w = 4 + int(mid) % 3
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ) % 256
                ).astype(np.uint8)
                idx = np.arange(h * w * 3) % len(codes)
                payload = encode_png(codes[idx].reshape(h, w, 3))
                payloads.append(payload)
                heights.append(h)
                widths.append(w)
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": payloads,
                    "height": heights,
                    "width": widths,
                    "n_bytes": sizes,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("n_bytes", T.IntegerType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def png_decode_stats(media: DataFrame) -> DataFrame:
    """Decode REAL PNG payloads and emit integer pixel statistics —
    dims from the parsed IHDR, per-channel byte sums from the
    reconstructed pixel array. Any error in the DEFLATE leg, a filter
    reconstruction, or chunk parsing breaks the sums, so the mm11
    hash-match proves the compressed round-trip end to end."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "height": [], "width": [],
                    "sum_r": [], "sum_g": [], "sum_b": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png(bytes(payload))
                rows["media_id"].append(mid)
                rows["height"].append(px.shape[0])
                rows["width"].append(px.shape[1])
                sums = px.reshape(-1, 3).sum(axis=0, dtype="int64")
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)


def png_pipeline_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    resize_to: tuple[int, int] | None = None,
) -> DataFrame:
    """Fused synthesize→encode→(resize)→decode→stats census in ONE
    ``mapInPandas`` stage. The chained form (``documents_as_png`` →
    ``png_resize`` → ``png_decode_stats``) ships every compressed
    payload across the JVM↔Python Arrow boundary once per stage —
    4–6 binary crossings per image whose cost dwarfs the codec itself
    (measured: the full 1,667-image encode+decode is 0.45 s of Python,
    the chained query 1.2–2.0 s). Fusing keeps the payload inside the
    worker: text in, six integer stat columns out. The REAL codec legs
    are unchanged — the bytes still round-trip through
    :func:`encode_png` / :func:`resize_png_nn` / :func:`decode_png`,
    so the census proves exactly what the chained form proves. The
    composable per-stage operators remain for pipelines that persist
    intermediate payloads."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "height": [], "width": [],
                    "sum_r": [], "sum_g": [], "sum_b": []}
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    raise ValueError(
                        f"png_pipeline_stats: empty text for id {mid}"
                    )
                h = 4 + int(mid) % 4
                w = 4 + int(mid) % 3
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ) % 256
                ).astype(np.uint8)
                idx = np.arange(h * w * 3) % len(codes)
                payload = encode_png(codes[idx].reshape(h, w, 3))
                if resize_to is not None:
                    payload = resize_png_nn(payload, *resize_to)
                px = decode_png(payload)
                rows["media_id"].append(mid)
                rows["height"].append(px.shape[0])
                rows["width"].append(px.shape[1])
                sums = px.reshape(-1, 3).sum(axis=0, dtype="int64")
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def jpeg_pipeline_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    progressive: bool = False,
    sa_levels: int = 0,
) -> DataFrame:
    """Fused synthesize→JPEG-encode→decode→stats census (mm13) in one
    ``mapInPandas`` stage — the mm11 PNG pattern applied to the REAL
    baseline JPEG codec (``operators/jpeg.py``: T.81 DCT + Annex-K
    Huffman + JFIF framing).

    JPEG is lossy in general, so the gate fixture synthesizes images
    of FLAT 8×8 blocks — block (i, j) holds the constant value
    ``codepoint(text[(i·bw + j) mod len]) mod 256`` on a
    ``(2 + id mod 3) × (2 + id mod 2)`` block grid. A flat block's DCT
    is DC-only and the DC quantizer (8) divides the level-shifted DC
    ``8·(v − 128)`` exactly, so the round-trip is bit-exact for this
    fixture and the DuckDB oracle restates the decoded sums straight
    from the text. The positional weighted sum (block value × linear
    block index, sampled from the DECODED array) catches block-order
    and raster bugs a global sum would miss. General-image loss bounds
    are property-tested in ``tests/test_multimodal.py``."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from graal_cdc_spark.operators.jpeg import (
            decode_jpeg_gray,
            decode_jpeg_gray_progressive,
            encode_jpeg_gray,
            encode_jpeg_gray_progressive,
        )

        for pdf in batches:
            rows = {"media_id": [], "height": [], "width": [],
                    "sum_px": [], "wsum_blocks": []}
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    raise ValueError(
                        f"jpeg_pipeline_stats: empty text for id {mid}"
                    )
                bh = 2 + int(mid) % 3
                bw = 2 + int(mid) % 2
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ) % 256
                ).astype(np.uint8)
                idx = np.arange(bh * bw) % len(codes)
                blocks = codes[idx].reshape(bh, bw)
                img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                if progressive:
                    # SOF2 scan script: same quantized coefficients,
                    # delivered across a DC scan + two AC band scans
                    # (mm15); sa_levels > 0 additionally splits every
                    # scan into successive-approximation bit planes
                    # (mm16: first scans at Al=sa_levels, then one
                    # refinement scan per remaining plane)
                    decoded = decode_jpeg_gray_progressive(
                        encode_jpeg_gray_progressive(img, al=sa_levels)
                    )
                else:
                    decoded = decode_jpeg_gray(encode_jpeg_gray(img))
                rows["media_id"].append(mid)
                rows["height"].append(decoded.shape[0])
                rows["width"].append(decoded.shape[1])
                rows["sum_px"].append(int(decoded.sum(dtype="int64")))
                # per-block top-left sample x (linear block index + 1)
                samples = decoded[::8, ::8].astype("int64")
                weights = np.arange(1, bh * bw + 1).reshape(bh, bw)
                rows["wsum_blocks"].append(int((samples * weights).sum()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("sum_px", T.LongType()),
            T.StructField("wsum_blocks", T.LongType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def jpeg_color_pipeline_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fused synthesize→color-JPEG-encode→decode→stats census (mm14):
    the mm13 pattern through the COLOR leg of ``operators/jpeg.py`` —
    JFIF YCbCr, interleaved scan, 4:2:0 chroma subsampling, three DC
    predictors.

    Fixture: GRAY-VALUED RGB (r=g=b=v) images of flat 16×16
    macroblocks — macroblock (i, j) holds
    ``codepoint(text[(i·bw + j) mod len]) mod 256`` on a
    ``(1 + id mod 2) × (1 + id mod 3)`` macroblock grid. Gray RGB maps
    to Y=v, Cb=Cr=128 EXACTLY under the JFIF equations, every
    component block is DC-only, and the DC quantizer (8) divides
    ``8·(v−128)`` exactly, so the FULL color path (subsampling,
    interleaving, per-component predictors, upsampling, inverse color
    transform) round-trips bit-exactly and the oracle restates the
    per-channel sums from the text. All three channel sums are
    censused separately: a chroma-path bug breaks their equality even
    though the fixture is gray. General-color loss bounds are
    property-tested in ``tests/test_multimodal.py``."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from graal_cdc_spark.operators.jpeg import (
            decode_jpeg_color,
            encode_jpeg_color,
        )

        for pdf in batches:
            rows = {"media_id": [], "height": [], "width": [],
                    "sum_r": [], "sum_g": [], "sum_b": [],
                    "wsum_blocks": []}
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    raise ValueError(
                        f"jpeg_color_pipeline_stats: empty text for id {mid}"
                    )
                bh = 1 + int(mid) % 2
                bw = 1 + int(mid) % 3
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ) % 256
                ).astype(np.uint8)
                idx = np.arange(bh * bw) % len(codes)
                blocks = codes[idx].reshape(bh, bw)
                gray = np.kron(blocks, np.ones((16, 16), dtype=np.uint8))
                img = np.stack([gray, gray, gray], axis=-1)
                decoded = decode_jpeg_color(encode_jpeg_color(img))
                rows["media_id"].append(mid)
                rows["height"].append(decoded.shape[0])
                rows["width"].append(decoded.shape[1])
                for k, ch in zip(("sum_r", "sum_g", "sum_b"), range(3)):
                    rows[k].append(int(decoded[:, :, ch].sum(dtype="int64")))
                samples = decoded[::16, ::16, 0].astype("int64")
                weights = np.arange(1, bh * bw + 1).reshape(bh, bw)
                rows["wsum_blocks"].append(int((samples * weights).sum()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("wsum_blocks", T.LongType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def resize_png_nn(payload: bytes, target_h: int, target_w: int) -> bytes:
    """REAL nearest-neighbor resize through the COMPRESSED path:
    inflate + defilter → index-map → refilter + deflate. The PNG
    sibling of :func:`resize_bmp_nn` — the mm04 stub's real upgrade
    for a compressed format."""
    import numpy as np

    if target_h < 1 or target_w < 1:
        raise ValueError("resize_png_nn: target dims must be >= 1")
    px = decode_png(payload)
    h, w, _ = px.shape
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return encode_png(px[ys][:, xs])


def png_resize(media: DataFrame, target_h: int, target_w: int) -> DataFrame:
    """Batch PNG resize: binary-in/binary-out Arrow-batched
    mapInPandas (the 1→1 heavy-byte transform pattern), every payload
    re-encoded through the real DEFLATE+filter path. Pixels never
    leave the Python worker; only (id, payload) rides the stream."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        resize_png_nn(bytes(p), target_h, target_w)
                        for p in pdf["payload"]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)
