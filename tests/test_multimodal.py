"""Multimodal codec tests — the REAL BMP leg (pure numpy) plus the
fixture/decode mapInPandas plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graal_cdc_spark.operators.multimodal import (
    bmp_decode_stats,
    decode_bmp,
    documents_as_bmp,
    encode_bmp,
    resize_bmp_nn,
)
from graal_cdc_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("h,w", [(1, 1), (4, 7), (13, 5), (8, 8), (3, 16)])
def test_bmp_roundtrip_exact(h, w):
    rng = np.random.default_rng(h * 100 + w)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


def test_bmp_row_padding_and_order():
    """A 1x1 red image pins channel order (BGR on disk, RGB in API)
    and the 4-byte row padding byte-for-byte."""
    px = np.array([[[255, 0, 0]]], dtype=np.uint8)
    raw = encode_bmp(px)
    assert len(raw) == 54 + 4  # one padded row
    assert raw[54:57] == b"\x00\x00\xff"  # blue, green, red
    assert raw[57] == 0  # padding
    assert (decode_bmp(raw) == px).all()


def test_bmp_decode_rejects_malformed():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_bmp(px)
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated header"):
        decode_bmp(good[:20])
    with pytest.raises(ValueError, match="truncated pixel"):
        decode_bmp(good[:-4])
    bad = bytearray(good)
    bad[28] = 8  # bpp
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bad))
    bad = bytearray(good)
    bad[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bad))


def test_resize_nn_matches_numpy_reference():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    out = decode_bmp(resize_bmp_nn(encode_bmp(px), 5, 3))
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(3) * 6) // 3
    assert (out == px[ys][:, xs]).all()
    up = decode_bmp(resize_bmp_nn(encode_bmp(px), 20, 12))
    assert up.shape == (20, 12, 3)
    with pytest.raises(ValueError, match="target dims"):
        resize_bmp_nn(encode_bmp(px), 0, 3)


def test_documents_as_bmp_payloads_decode_to_stated_dims(spark):
    docs = load_table(spark, SF, "documents").filter(
        (F.length("text") > 0) & (F.col("doc_id") < 20)
    )
    rows = documents_as_bmp(docs).collect()
    assert rows
    for r in rows:
        px = decode_bmp(bytes(r["payload"]))
        assert px.shape == (r["height"], r["width"], 3)
        assert r["height"] == 4 + r["media_id"] % 4
        assert r["width"] == 4 + r["media_id"] % 3


def test_bmp_decode_stats_plan_is_arrow_batched_map(spark):
    from graal_cdc_spark.plans import audit

    docs = load_table(spark, SF, "documents").filter(F.length("text") > 0)
    a = audit(bmp_decode_stats(documents_as_bmp(docs)))
    assert a.plan.count("MapInPandas (") == 2, a.plan  # synth + decode
    assert "Exchange" not in a.plan, a.plan  # map-only, no shuffle


# ---------------------------------------------------------------------------
# REAL WAV leg
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact():
    from graal_cdc_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    for n in (1, 7, 256):
        s = rng.integers(-32768, 32768, n, dtype=np.int16)
        out, rate = decode_wav(encode_wav(s, sample_rate=16000))
        assert rate == 16000
        assert (out == s).all()


def test_wav_decode_rejects_malformed():
    from graal_cdc_spark.operators.multimodal import decode_wav, encode_wav

    good = encode_wav(np.arange(10, dtype=np.int16))
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="truncated header"):
        decode_wav(good[:30])
    with pytest.raises(ValueError, match="truncated data"):
        decode_wav(good[:-2])
    bad = bytearray(good)
    bad[22] = 2  # channels = stereo
    with pytest.raises(ValueError, match="mono 16-bit"):
        decode_wav(bytes(bad))


def test_documents_as_wav_payloads_decode(spark):
    from graal_cdc_spark.operators.multimodal import (
        decode_wav,
        documents_as_wav,
    )

    docs = load_table(spark, SF, "documents").filter(
        (F.length("text") > 0) & (F.col("doc_id") < 20)
    )
    for r in documents_as_wav(docs).collect():
        samples, rate = decode_wav(bytes(r["payload"]))
        assert samples.size == r["n_samples"] == 16 + r["media_id"] % 16
        assert rate == 8000
        assert samples.min() >= -8192 and samples.max() <= 255 * 64 - 8192


# ---------------------------------------------------------------------------
# REAL BMP-reel (video) leg
# ---------------------------------------------------------------------------


def test_bmp_reel_walk_and_selective_decode():
    from graal_cdc_spark.operators.multimodal import (
        decode_bmp_reel,
        encode_bmp_reel,
        iter_bmp_reel,
    )

    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 256, (4, 5, 3), dtype=np.uint8) for _ in range(5)
    ]
    reel = encode_bmp_reel(frames)
    walked = list(iter_bmp_reel(reel))
    assert [f for f, _, _ in walked] == [0, 1, 2, 3, 4]
    assert sum(size for _, _, size in walked) == len(reel)
    # selective decode touches only even frames, values exact
    decoded = decode_bmp_reel(reel, lambda f: f % 2 == 0)
    assert [f for f, _ in decoded] == [0, 2, 4]
    for f, px in decoded:
        assert (px == frames[f]).all()


def test_bmp_reel_rejects_malformed():
    from graal_cdc_spark.operators.multimodal import (
        decode_bmp_reel,
        encode_bmp_reel,
    )

    frames = [np.zeros((2, 2, 3), dtype=np.uint8) for _ in range(2)]
    reel = encode_bmp_reel(frames)
    with pytest.raises(ValueError, match="trailing garbage"):
        decode_bmp_reel(reel + b"xx")
    with pytest.raises(ValueError, match="declares"):
        decode_bmp_reel(reel[:-4])
    from graal_cdc_spark.operators.multimodal import iter_bmp_reel

    off1 = list(iter_bmp_reel(reel))[1][1]
    bad = bytearray(reel)
    bad[off1] = 0  # corrupt the 2nd frame's magic
    with pytest.raises(ValueError, match="magic"):
        decode_bmp_reel(bytes(bad))
    with pytest.raises(ValueError, match="empty"):
        decode_bmp_reel(b"")
    with pytest.raises(ValueError, match="at least one"):
        encode_bmp_reel([])


def test_documents_as_bmp_reel_frames_decode(spark):
    from graal_cdc_spark.operators.multimodal import (
        decode_bmp_reel,
        documents_as_bmp_reel,
    )

    docs = load_table(spark, SF, "documents").filter(
        (F.length("text") > 0) & (F.col("doc_id") < 15)
    )
    for r in documents_as_bmp_reel(docs).collect():
        frames = decode_bmp_reel(bytes(r["payload"]))
        assert len(frames) == r["n_frames"] == 2 + r["media_id"] % 3
        # consecutive frames differ by +1 mod 256 everywhere
        for (fa, pa), (fb, pb) in zip(frames, frames[1:]):
            assert ((pa.astype(int) + 1) % 256 == pb).all()


# --- PNG (the real COMPRESSED leg: zlib DEFLATE + 5 scanline filters) ---


@pytest.mark.parametrize("h,w", [(1, 1), (4, 7), (13, 5), (8, 8), (5, 1), (32, 24)])
def test_png_roundtrip_exact(h, w):
    from graal_cdc_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(h * 100 + w)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


def test_png_every_filter_type_reconstructs():
    """encode_png filters row y with type y%5, so a 10-row image
    exercises None/Sub/Up/Average/Paeth twice each — gradient +
    noise content makes each predictor's arithmetic non-trivial."""
    from graal_cdc_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    grad = np.linspace(0, 255, 10 * 9 * 3).reshape(10, 9, 3)
    noise = rng.integers(0, 64, (10, 9, 3))
    px = ((grad + noise) % 256).astype(np.uint8)
    raw = encode_png(px)
    assert (decode_png(raw) == px).all()
    # the stored filter bytes really do rotate through all 5 types
    import struct
    import zlib

    pos = 8
    idat = b""
    while pos < len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += raw[pos + 8 : pos + 8 + length]
        pos += 12 + length
    scan = zlib.decompress(idat)
    stride = 9 * 3 + 1
    filters = [scan[y * stride] for y in range(10)]
    assert filters == [y % 5 for y in range(10)]


def test_png_decode_rejects_malformed():
    from graal_cdc_spark.operators.multimodal import decode_png, encode_png

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    good = encode_png(px)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-6])
    # flip one IDAT payload byte -> CRC must catch it
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0x40  # inside IDAT data (IHDR chunk is 25B)
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # grayscale color type rejected loudly, not mis-parsed
    ihdr = bytearray(good[8 + 8 : 8 + 8 + 13])
    ihdr[9] = 0  # color type
    import struct
    import zlib

    patched = (
        good[:8]
        + struct.pack(">I", 13)
        + b"IHDR"
        + bytes(ihdr)
        + struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr)))
        + good[8 + 25 :]
    )
    with pytest.raises(ValueError, match="truecolor"):
        decode_png(patched)


def test_png_inflated_length_validated():
    """A PNG whose IDAT inflates to the wrong byte count (lying IHDR
    dims) must fail the length check, not silently mis-reshape."""
    import struct
    import zlib

    from graal_cdc_spark.operators.multimodal import decode_png, encode_png

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(px)
    ihdr = bytearray(good[8 + 8 : 8 + 8 + 13])
    ihdr[3] = 9  # width 4 -> 9 (dims lie vs the compressed stream)
    patched = (
        good[:8]
        + struct.pack(">I", 13)
        + b"IHDR"
        + bytes(ihdr)
        + struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr)))
        + good[8 + 25 :]
    )
    with pytest.raises(ValueError, match="inflated size"):
        decode_png(patched)


def test_png_ancillary_chunks_skipped_but_crc_checked():
    import struct
    import zlib

    from graal_cdc_spark.operators.multimodal import decode_png, encode_png

    px = np.full((2, 3, 3), 7, dtype=np.uint8)
    good = encode_png(px)
    text = b"Comment\x00hi"
    chunk = (
        struct.pack(">I", len(text))
        + b"tEXt"
        + text
        + struct.pack(">I", zlib.crc32(b"tEXt" + text))
    )
    with_text = good[: 8 + 25] + chunk + good[8 + 25 :]
    assert (decode_png(with_text) == px).all()
    corrupt = bytearray(with_text)
    corrupt[8 + 25 + 9] ^= 1  # flip a tEXt payload byte
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))


def test_documents_as_png_payloads_decode(spark):
    from graal_cdc_spark.operators.multimodal import (
        decode_png,
        documents_as_png,
        png_decode_stats,
    )

    docs = (
        load_table(spark, SF, "documents")
        .filter(F.length("text") > 0)
        .limit(12)
    )
    rows = documents_as_png(docs).collect()
    assert rows
    for r in rows:
        px = decode_png(bytes(r.payload))
        assert px.shape == (r.height, r.width, 3)
        assert r.n_bytes == len(r.payload)
    # stats path agrees with a direct local decode
    stats = {
        r.media_id: r
        for r in png_decode_stats(documents_as_png(docs)).collect()
    }
    for r in rows:
        px = decode_png(bytes(r.payload)).reshape(-1, 3).sum(axis=0)
        s = stats[r.media_id]
        assert (s.sum_r, s.sum_g, s.sum_b) == tuple(int(x) for x in px)


def test_png_resize_nn_matches_numpy_reference():
    from graal_cdc_spark.operators.multimodal import (
        decode_png,
        encode_png,
        resize_png_nn,
    )

    rng = np.random.default_rng(11)
    for (h, w), (th, tw) in [((7, 6), (3, 5)), ((4, 4), (8, 8)), ((1, 1), (2, 3))]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_png(resize_png_nn(encode_png(px), th, tw))
        ys = (np.arange(th) * h) // th
        xs = (np.arange(tw) * w) // tw
        assert (out == px[ys][:, xs]).all()
    with pytest.raises(ValueError, match="target dims"):
        resize_png_nn(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)), 0, 3)


def test_png_decoder_never_misparses_fuzzed_bytes():
    """Byte-level fuzz: random garbage, truncations, and single-byte
    corruptions of a valid PNG must either decode to EXACTLY the
    original pixels (corruption in a part zlib tolerates is
    impossible — CRCs cover every chunk) or raise ValueError/
    zlib.error — never crash differently, never return wrong pixels."""
    import zlib

    from graal_cdc_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    good = encode_png(px)

    # random garbage
    for n in (0, 1, 7, 8, 20, 100):
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        with pytest.raises((ValueError, zlib.error)):
            decode_png(blob)
    # garbage with a valid signature
    with pytest.raises((ValueError, zlib.error)):
        decode_png(b"\x89PNG\r\n\x1a\n" + bytes(rng.integers(0, 256, 64, dtype=np.uint8)))
    # every truncation point
    for cut in range(len(good)):
        with pytest.raises((ValueError, zlib.error)):
            decode_png(good[:cut])
    # every single-byte corruption: either still-exact or a loud error
    for pos in range(len(good)):
        bad = bytearray(good)
        bad[pos] ^= 0x5A
        try:
            out = decode_png(bytes(bad))
        except (ValueError, zlib.error):
            continue
        assert (out == px).all(), f"silent misparse at byte {pos}"


# --- JPEG codec (operators/jpeg.py, mm13) ---


def test_jpeg_flat_block_roundtrip_exact():
    """The mm13 oracle contract: images of flat 8x8 blocks round-trip
    BIT-EXACTLY (DC-only blocks; DC quantizer 8 divides 8*(v-128))."""
    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(13)
    for _ in range(10):
        bh, bw = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        vals = rng.integers(0, 256, (bh, bw)).astype(np.uint8)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)


def test_jpeg_general_roundtrip_bounded_loss():
    """General images are LOSSY but bounded: smooth content stays
    within a few levels; the stream itself is structurally valid
    (SOI/EOI, parseable segments) for arbitrary content incl. odd
    dims and 0xFF-dense near-saturated images (stuffing paths)."""
    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    x = np.linspace(0, 255, 64)
    smooth = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(smooth))
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 4

    rng = np.random.default_rng(5)
    for h, w in ((1, 1), (7, 9), (16, 3), (9, 13)):
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        payload = encode_jpeg_gray(img)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        out = decode_jpeg_gray(payload)
        assert out.shape == (h, w)
        # random noise is JPEG's worst case; still bounded well below
        # a structural failure (mean error ~14 at these tables)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 40

    flat_ff = np.full((9, 13), 254, dtype=np.uint8)  # stuffing-dense
    assert np.array_equal(
        decode_jpeg_gray(encode_jpeg_gray(flat_ff)), flat_ff
    )


def test_jpeg_decoder_rejects_garbage_and_truncations():
    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(3)
    img = np.kron(
        rng.integers(0, 256, (2, 3)).astype(np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    good = encode_jpeg_gray(img)
    with pytest.raises((ValueError, IndexError, KeyError)):
        decode_jpeg_gray(b"\x00\x01\x02")
    for cut in range(2, len(good) - 2, 7):
        try:
            out = decode_jpeg_gray(good[:cut])
        except Exception:
            continue
        # a parse that survives truncation must still be shape-correct
        assert out.shape == img.shape


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn streams (ADVICE r9: conformant baseline encoders may
    use restart intervals): flat-block images round-trip bit-exactly
    through every restart cadence, including RSTn index wraparound
    past 8 intervals; general images match the no-restart decode
    exactly (restarts change framing, not coefficients). A stream
    with an out-of-sequence RSTn is rejected."""
    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(17)
    vals = rng.integers(0, 256, (4, 5)).astype(np.uint8)  # 20 MCUs
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    for ri in (1, 2, 3, 7):  # ri=1/2 wrap the RSTn index past D7
        payload = encode_jpeg_gray(img, restart_interval=ri)
        assert b"\xff\xdd" in payload  # DRI present
        assert np.array_equal(decode_jpeg_gray(payload), img)

    noisy = rng.integers(0, 256, (23, 17)).astype(np.uint8)
    plain = decode_jpeg_gray(encode_jpeg_gray(noisy))
    with_rst = decode_jpeg_gray(encode_jpeg_gray(noisy, restart_interval=2))
    assert np.array_equal(plain, with_rst)

    # corrupt the first RSTn marker's index -> sequence check trips
    payload = bytearray(encode_jpeg_gray(img, restart_interval=1))
    idx = payload.index(b"\xff\xd0", payload.index(b"\xff\xda"))
    payload[idx + 1] = 0xD5
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg_gray(bytes(payload))


def test_jpeg_color_flat_macroblock_roundtrip_exact():
    """mm14 oracle contract: gray-valued RGB (Y=v, Cb=Cr=128 exactly)
    with flat 16×16 macroblocks round-trips BIT-EXACTLY through the
    full 4:2:0 color path, and through 4:4:4."""
    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_color,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(29)
    for _ in range(6):
        bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        vals = rng.integers(0, 256, (bh, bw)).astype(np.uint8)
        gray = np.kron(vals, np.ones((16, 16), dtype=np.uint8))
        img = np.stack([gray, gray, gray], axis=-1)
        for kw in ({}, {"subsample": False}, {"restart_interval": 2}):
            out = decode_jpeg_color(encode_jpeg_color(img, **kw))
            assert out.shape == img.shape
            assert np.array_equal(out, img), kw


def test_jpeg_color_general_roundtrip_bounded_loss():
    """Real color content is lossy but bounded; odd dims crop back;
    a grayscale stream decodes through the color API as stacked
    channels."""
    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_color,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    x = np.linspace(0, 255, 48)
    sm = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    col = np.stack([sm, sm[::-1], sm.T], axis=-1)
    for kw in ({}, {"subsample": False}):
        out = decode_jpeg_color(encode_jpeg_color(col, **kw))
        assert np.abs(out.astype(int) - col.astype(int)).max() <= 12, kw

    rng = np.random.default_rng(31)
    for h, w in ((1, 1), (7, 9), (17, 30)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_jpeg_color(encode_jpeg_color(img))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 60

    g = np.kron(
        rng.integers(0, 256, (2, 2)).astype(np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    out = decode_jpeg_color(encode_jpeg_gray(g))
    assert np.array_equal(out, np.stack([g, g, g], axis=-1))


def test_jpeg_color_pipeline_stats_matches_direct_codec(spark):
    """The fused mm14 mapInPandas census equals a driver-side
    recompute through the same color codec on the same synthesis
    arithmetic."""
    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_color,
        encode_jpeg_color,
    )
    from graal_cdc_spark.operators.multimodal import (
        jpeg_color_pipeline_stats,
    )

    rows = [(i, f"colorcensus {i} " * (1 + i % 4)) for i in range(1, 13)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.media_id: (
            r.height, r.width, r.sum_r, r.sum_g, r.sum_b, r.wsum_blocks
        )
        for r in jpeg_color_pipeline_stats(df).collect()
    }
    for mid, text in rows:
        bh, bw = 1 + mid % 2, 1 + mid % 3
        codes = (
            np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) % 256
        ).astype(np.uint8)
        blocks = codes[np.arange(bh * bw) % len(codes)].reshape(bh, bw)
        gray = np.kron(blocks, np.ones((16, 16), dtype=np.uint8))
        img = np.stack([gray] * 3, axis=-1)
        dec = decode_jpeg_color(encode_jpeg_color(img))
        samples = dec[::16, ::16, 0].astype("int64")
        weights = np.arange(1, bh * bw + 1).reshape(bh, bw)
        want = (
            dec.shape[0], dec.shape[1],
            int(dec[:, :, 0].sum(dtype="int64")),
            int(dec[:, :, 1].sum(dtype="int64")),
            int(dec[:, :, 2].sum(dtype="int64")),
            int((samples * weights).sum()),
        )
        assert got[mid] == want


def test_jpeg_pipeline_stats_matches_direct_codec(spark):
    """The fused mapInPandas census equals a driver-side recompute
    through the same codec on the same synthesis arithmetic."""
    from graal_cdc_spark.operators.multimodal import jpeg_pipeline_stats

    rows = [(i, f"doc {i} text payload {'x' * (i % 5)}") for i in range(1, 13)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.media_id: (r.height, r.width, r.sum_px, r.wsum_blocks)
        for r in jpeg_pipeline_stats(df).collect()
    }
    for mid, text in rows:
        bh, bw = 2 + mid % 3, 2 + mid % 2
        codes = (
            np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) % 256
        ).astype(np.int64)
        vals = codes[np.arange(bh * bw) % len(codes)]
        exp_sum = int(vals.sum()) * 64
        exp_w = int((vals * np.arange(1, bh * bw + 1)).sum())
        assert got[mid] == (bh * 8, bw * 8, exp_sum, exp_w), mid


# --- progressive JPEG (operators/jpeg.py SOF2 leg, mm15) ---


def test_jpeg_progressive_bit_identical_to_baseline():
    """Spectral selection only re-ORDERS coefficient delivery — the
    quantized coefficients equal baseline's, so decode(progressive
    encode) must be BIT-IDENTICAL to decode(baseline encode) on every
    image, not just flat fixtures. This single property exercises the
    whole multi-scan path (DC scan, band scans, EOB, ZRL,
    cross-scan accumulation)."""
    import numpy as np

    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_gray_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(11)
    for _ in range(8):
        h, w = rng.integers(3, 50, 2)
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        base = decode_jpeg_gray(encode_jpeg_gray(img))
        prog = decode_jpeg_gray_progressive(encode_jpeg_gray_progressive(img))
        assert base.shape == prog.shape == (int(h), int(w))
        assert (base == prog).all()
    # a many-band scan script (one band per coefficient run) decodes
    # the same too
    img = rng.integers(0, 256, (17, 23)).astype(np.uint8)
    bands = ((1, 1), (2, 9), (10, 35), (36, 63))
    prog = decode_jpeg_gray_progressive(
        encode_jpeg_gray_progressive(img, bands=bands)
    )
    assert (prog == decode_jpeg_gray(encode_jpeg_gray(img))).all()


def test_jpeg_progressive_flat_block_exact():
    import numpy as np

    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray_progressive,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(5)
    blocks = rng.integers(0, 256, (3, 2)).astype(np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    assert (
        decode_jpeg_gray_progressive(encode_jpeg_gray_progressive(img)) == img
    ).all()


def test_jpeg_progressive_strictness():
    import numpy as np
    import pytest

    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_gray_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    # encoder validates the scan script tiles 1..63
    with pytest.raises(ValueError, match="tile"):
        encode_jpeg_gray_progressive(img, bands=((1, 5), (7, 63)))
    with pytest.raises(ValueError, match="cover"):
        encode_jpeg_gray_progressive(img, bands=((1, 40),))
    # a baseline stream is rejected by the progressive decoder and
    # vice versa (wrong SOF)
    with pytest.raises(ValueError, match="not SOF2"):
        decode_jpeg_gray_progressive(encode_jpeg_gray(img))
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg_gray(encode_jpeg_gray_progressive(img))
    # a refinement whose Ah does not continue the previous scan's Al
    # is rejected (successive approximation must step one bit plane)
    prog = bytearray(encode_jpeg_gray_progressive(img))
    # find the DC SOS (FF DA ... Ss=0 Se=0 AhAl byte) and claim the
    # first scan already sits at Al=1: the plane chain then never
    # reaches bit 0 and the decoder reports undelivered coefficients
    i = prog.find(b"\xFF\xDA")
    # FF DA len(2) Ns comp tables Ss Se AhAl -> AhAl at i+9
    assert prog[i + 7 : i + 10] == bytes([0, 0, 0])
    prog[i + 9] = 0x01
    with pytest.raises(ValueError, match="never delivered"):
        decode_jpeg_gray_progressive(bytes(prog))
    # Ah > Al + 1 is malformed outright
    prog[i + 9] = 0x31
    with pytest.raises(ValueError, match="bit position"):
        decode_jpeg_gray_progressive(bytes(prog))
    # truncation inside a scan fails loudly
    good = encode_jpeg_gray_progressive(img)
    with pytest.raises(ValueError):
        decode_jpeg_gray_progressive(good[: len(good) - 8])


def test_jpeg_fill_bytes_before_markers_decode_identically():
    """T.81 B.1.1.2: markers may be padded with extra 0xFF fill bytes;
    all three decoders must skip them instead of misreading a bogus
    0xFF 'segment' (ADVICE r11)."""
    import numpy as np

    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_color,
        decode_jpeg_gray,
        decode_jpeg_gray_progressive,
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (24, 16)).astype(np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

    def inject_fill(payload: bytes, n: int = 3) -> bytes:
        i = payload.find(b"\xFF\xDB")  # pad before the first DQT
        assert i > 0
        return payload[:i] + b"\xFF" * n + payload[i:]

    for enc, dec, img in [
        (encode_jpeg_gray, decode_jpeg_gray, gray),
        (encode_jpeg_gray_progressive, decode_jpeg_gray_progressive, gray),
        (encode_jpeg_color, decode_jpeg_color, rgb),
    ]:
        p = enc(img)
        assert np.array_equal(
            np.asarray(dec(p)), np.asarray(dec(inject_fill(p)))
        )


def test_jpeg_successive_approximation_roundtrip_matches_spectral():
    """T.81 G.1.2 successive approximation: for ANY image, the SA
    scan script (first scans at Al, then per-plane DC raw-bit and AC
    newly-significant/correction refinements) reconstructs EXACTLY
    the coefficients of the spectral-only script — decoded pixels are
    bit-identical across al in 1..3 and several band scripts."""
    import numpy as np

    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray_progressive,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(7)
    images = [
        rng.integers(0, 256, (24, 17)).astype(np.uint8),   # noise
        np.full((9, 30), 200, dtype=np.uint8),             # flat
        (np.add.outer(np.arange(16), np.arange(16)) * 7 % 256).astype(
            np.uint8
        ),                                                 # gradient
        (rng.integers(0, 2, (8, 8)) * 255).astype(np.uint8),  # binary
    ]
    scripts = (((1, 5), (6, 63)), ((1, 63),), ((1, 2), (3, 20), (21, 63)))
    for img in images:
        base = decode_jpeg_gray_progressive(
            encode_jpeg_gray_progressive(img)
        )
        for al in (1, 2, 3):
            for bands in scripts:
                sa = decode_jpeg_gray_progressive(
                    encode_jpeg_gray_progressive(img, bands=bands, al=al)
                )
                assert np.array_equal(base, sa)


def test_jpeg_sa_scan_script_shape():
    """An al=2 stream carries 3*(1 + n_bands) SOS markers (first
    scans + two refinement planes), each refinement stepping the bit
    position by exactly one (Ah = Al + 1)."""
    import numpy as np

    from graal_cdc_spark.operators.jpeg import (
        encode_jpeg_gray_progressive,
    )

    img = (np.arange(12 * 16, dtype=np.int64) * 31 % 256).astype(
        np.uint8
    ).reshape(12, 16)
    payload = encode_jpeg_gray_progressive(img, al=2)
    headers = []
    i = 0
    while True:
        i = payload.find(b"\xFF\xDA", i)
        if i < 0:
            break
        ss, se, ahal = payload[i + 7], payload[i + 8], payload[i + 9]
        headers.append((ss, se, ahal >> 4, ahal & 0x0F))
        i += 2
    assert len(headers) == 9  # (DC + 2 bands) x (first + 2 planes)
    firsts = [h for h in headers if h[2] == 0]
    assert all(h[3] == 2 for h in firsts)
    refines = [h for h in headers if h[2] != 0]
    assert all(h[2] == h[3] + 1 for h in refines)
    assert sorted({h[3] for h in refines}) == [0, 1]


def test_jpeg_sa_truncated_refinement_fails_loudly():
    """Dropping the final refinement plane leaves bit 0 undelivered —
    the decoder must refuse rather than serve a half-refined image."""
    import numpy as np
    import pytest

    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray_progressive,
        encode_jpeg_gray_progressive,
    )

    img = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    payload = encode_jpeg_gray_progressive(img, al=1)
    # cut at the LAST SOS (the final AC refinement) and close with EOI
    last = payload.rfind(b"\xFF\xDA")
    with pytest.raises(ValueError, match="never delivered"):
        decode_jpeg_gray_progressive(payload[:last] + b"\xFF\xD9")


def test_jpeg_progressive_restart_intervals_round_trip():
    """DRI in PROGRESSIVE scans (T.81 allows restart intervals in
    SOF2 streams; r12 closes the last documented scope note): every
    scan type — DC first, DC refinement, AC first, AC refinement —
    segments at the interval with per-segment byte alignment, DC
    predictor reset, and cycling RST0-7; reconstruction stays
    bit-identical to the baseline codec's."""
    import numpy as np

    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_gray_progressive,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(12)
    for h, w in [(8, 8), (24, 40), (17, 31)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        base = decode_jpeg_gray(encode_jpeg_gray(img))
        for al in (0, 2):
            for ri in (1, 3, 7):
                enc = encode_jpeg_gray_progressive(
                    img, al=al, restart_interval=ri
                )
                assert b"\xFF\xDD" in enc  # DRI segment present
                assert np.array_equal(
                    decode_jpeg_gray_progressive(enc), base
                ), (h, w, al, ri)


def test_jpeg_progressive_restart_strictness():
    """A stream whose DRI promises restarts but whose scan lacks the
    marker (or carries a non-RST marker there) is rejected, and a
    corrupted segment cannot silently desynchronize the rest."""
    import numpy as np
    import pytest as _pytest

    from graal_cdc_spark.operators.jpeg import (
        decode_jpeg_gray_progressive,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    enc = bytearray(encode_jpeg_gray_progressive(img, restart_interval=2))
    # find the first RST0 marker inside entropy data and break it into
    # a non-restart marker byte: the decoder must raise, not misread
    for i in range(len(enc) - 1):
        if enc[i] == 0xFF and enc[i + 1] == 0xD0:
            enc[i + 1] = 0xC9  # not a restart marker
            break
    else:
        raise AssertionError("no RST0 marker found")
    with _pytest.raises(ValueError):
        decode_jpeg_gray_progressive(bytes(enc))


# ----------------------------------------------------------------- GIF / LZW


def test_lzw_round_trip_growth_and_reset():
    """The variable-width LZW pair must invert across every boundary:
    code-width growth 9->12, the 4096-entry CLEAR-and-reset (random
    streams long enough to reset multiple times), the KwKwK case
    (repetitive input), and degenerate inputs."""
    import numpy as np

    from graal_cdc_spark.operators.gif import lzw_decode, lzw_encode

    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, 60000, dtype=np.uint8).tobytes(),
        b"abab" * 5000,          # KwKwK-heavy
        b"\x00" * 9000,          # maximal run
        bytes(range(256)) * 40,
        b"a",
        b"",
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data)) == data, len(data)


def test_gif_round_trip_and_strictness():
    """encode_gif/decode_gif invert exactly; corrupt payloads (bad
    magic, truncation anywhere, missing trailer) raise instead of
    returning wrong pixels."""
    import numpy as np
    import pytest as _pytest

    from graal_cdc_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (4, 4), (7, 5), (60, 60), (120, 90)]:
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(px)), px)
    payload = encode_gif(rng.integers(0, 256, (6, 6), dtype=np.uint8))
    for bad in [
        b"NOTGIF" + payload[6:],
        payload[:20],
        payload[:-1],
        payload[:-2] + b"\x3b",
    ]:
        with _pytest.raises(ValueError):
            decode_gif(bad)


def test_gif_fixture_pixels_match_generative_arithmetic(spark):
    """The mm18 fixture discipline: decoding the staged GIF gives
    exactly the codepoint-mod-256 pixels the oracle restates."""
    import numpy as np

    from graal_cdc_spark.operators.gif import (
        decode_gif,
        documents_as_gif,
    )

    docs = spark.createDataFrame(
        [(5, "hello gif world"), (11, "abc")], "doc_id long, text string"
    )
    rows = {r.media_id: r for r in documents_as_gif(docs).collect()}
    for mid, text in [(5, "hello gif world"), (11, "abc")]:
        r = rows[mid]
        px = decode_gif(bytes(r.payload))
        h, w = 4 + mid % 5, 4 + mid % 4
        assert px.shape == (h, w)
        codes = np.array([ord(c) % 256 for c in text], dtype=np.uint8)
        want = codes[np.arange(h * w) % len(codes)].reshape(h, w)
        assert np.array_equal(px, want)


def test_lzw_eoi_at_width_boundary_and_descriptor_truncation():
    """Review r13: (a) the encoder mirrors the decoder's phantom
    final-entry width growth, so an EOI landing flush on a byte
    boundary still decodes (the 2x127 reproduction case + an
    exhaustive short-length sweep over the first growth boundary);
    (b) a payload truncated INSIDE the image descriptor raises
    ValueError, never struct.error."""
    import numpy as np
    import pytest as _pytest

    from graal_cdc_spark.operators.gif import (
        decode_gif,
        encode_gif,
        lzw_decode,
        lzw_encode,
    )

    px = np.random.default_rng(42).integers(0, 256, (2, 127), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(px)), px)
    rng = np.random.default_rng(1)
    for n in range(240, 280):  # brackets the 9->10 bit boundary
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data)) == data, n
    payload = encode_gif(rng.integers(0, 256, (6, 6), dtype=np.uint8))
    # cut inside the 10-byte image descriptor (after the 0x2C marker)
    cut = 6 + 7 + 768 + 4
    with _pytest.raises(ValueError, match="gif"):
        decode_gif(payload[:cut])
