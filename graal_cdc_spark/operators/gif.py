"""GIF87a codec — real LZW, from scratch.

The codec ladder's dictionary-coding member (PNG covers DEFLATE,
JPEG covers DCT/Huffman): variable-width LZW exactly as GIF specifies
— 8-bit palette indices, initial code size 9, CLEAR=256 / EOI=257,
LSB-first bit packing, dictionary growth to 12 bits, CLEAR-and-reset
at 4096 entries — wrapped in the GIF87a container (logical screen
descriptor, 256-entry grayscale global color table, image descriptor,
255-byte data sub-blocks, trailer). Encoder and decoder are exact
inverses and the decoder is strict: bad magic, truncated streams,
out-of-range codes, and pixel-count mismatches all raise.

Public reference: CompuServe GIF87a specification (the LZW variant
with per-image minimum code size and deferred clear codes).

Honesty note (the PNG/JPEG codecs could be refereed against stdlib
zlib / the DCT arithmetic; LZW has no stdlib referee and this
container has no external GIF reader): encoder and decoder here use
the "early change" width-growth pairing and are proven exact
inverses by round-trip tests across the growth and reset boundaries
(20k/60k random streams force multiple dictionary resets); byte
interop with third-party decoders, whose implementations differ in
the width-change slot convention, is untested in this environment.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CLEAR = 256
_EOI = 257
_MAX_CODE_SIZE = 12


def lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: variable code width, LSB-first packing,
    leading CLEAR, dictionary reset at 4096 entries, trailing EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) and code_size < _MAX_CODE_SIZE:
            code_size += 1
        elif next_code == (1 << _MAX_CODE_SIZE):
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w])
        # the decoder APPENDS an entry for this final code too (it
        # cannot know no more data follows), so its width may grow
        # before it reads EOI — mirror that phantom growth here or an
        # EOI landing flush on a byte boundary is read at the wrong
        # width and a valid stream "truncates" (review r13; decoder
        # fires at len(table) == 2^cs - 1, and its len after the
        # final append equals this next_code)
        if (
            next_code == (1 << code_size) - 1
            and code_size < _MAX_CODE_SIZE
        ):
            code_size += 1
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    """Exact inverse of :func:`lzw_encode`, strict: truncation and
    out-of-range codes raise."""
    clear = 1 << min_code_size
    eoi = clear + 1
    buf = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    out = bytearray()

    def read_code() -> int | None:
        nonlocal buf, nbits, pos
        while nbits < code_size:
            if pos >= len(data):
                return None
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        c = buf & ((1 << code_size) - 1)
        buf >>= code_size
        nbits -= code_size
        return c

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        c = read_code()
        if c is None:
            raise ValueError("gif: truncated LZW stream (no EOI)")
        if c == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if c == eoi:
            break
        if prev is None:
            if c >= len(table) or c >= clear + 2 and not table[c]:
                raise ValueError(f"gif: bad first code {c}")
            entry = table[c]
        else:
            if c < len(table):
                entry = table[c]
                table.append(prev + entry[:1])
            elif c == len(table):
                entry = prev + prev[:1]  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError(f"gif: code {c} out of range")
            # the decoder's table is ONE entry behind the encoder's
            # at read time (the encoder adds the entry alongside the
            # emit; the decoder can only build it after reading the
            # NEXT code), so the width grows at 2^cs - 1, not 2^cs —
            # the classic GIF "early change" mirror
            if (
                len(table) == (1 << code_size) - 1
                and code_size < _MAX_CODE_SIZE
            ):
                code_size += 1
        out += entry
        prev = entry
    return bytes(out)


def encode_gif(indices) -> bytes:
    """GIF87a with a 256-entry GRAYSCALE global color table (palette
    entry i = (i, i, i)), one image, 8-bit LZW — the palette index IS
    the gray value, so pixel semantics stay integer-exact."""
    import numpy as np

    px = np.asarray(indices, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError(f"encode_gif: need HxW indices, got {px.shape}")
    h, w = px.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    # 0xF7: global color table present, 8 bits/channel, 256 entries
    out += bytes([0xF7, 0x00, 0x00])
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([8])  # LZW minimum code size
    data = lzw_encode(px.reshape(-1).tobytes())
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode the :func:`encode_gif` shape (strictly: any deviation
    raises). Returns the HxW uint8 palette-index array."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (1 << ((packed & 0x07) + 1))
    if pos >= len(payload) or payload[pos] != 0x2C:
        raise ValueError("gif: expected image descriptor")
    if pos + 10 > len(payload):
        # a bare unpack_from here would leak struct.error through the
        # module's ValueError contract (review r13 #4)
        raise ValueError("gif: truncated image descriptor")
    ix, iy, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
    local = payload[pos + 9]
    pos += 10
    if local & 0x80:
        pos += 3 * (1 << ((local & 0x07) + 1))
    if (ix, iy, iw, ih) != (0, 0, w, h):
        raise ValueError("gif: sub-rectangle images not supported")
    if pos >= len(payload):
        raise ValueError("gif: truncated before LZW code size")
    min_code_size = payload[pos]
    pos += 1
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(payload):
            raise ValueError("gif: truncated sub-block body")
        data += payload[pos : pos + n]
        pos += n
    if pos >= len(payload) or payload[pos] != 0x3B:
        raise ValueError("gif: missing trailer")
    px = lzw_decode(bytes(data), min_code_size)
    if len(px) != w * h:
        raise ValueError(
            f"gif: decoded {len(px)} pixels for a {w}x{h} image"
        )
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w)


def documents_as_gif(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic GIF fixture: ``4+(id%5) × 4+(id%4)`` grayscale
    palette indices = codepoints mod 256, cycled — the same generative
    arithmetic discipline as the BMP/PNG fixtures, so the mm18 oracle
    restates the DECODED pixels straight from the text. Arrow-batched
    mapInPandas, binary out."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads, heights, widths = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    raise ValueError(
                        f"documents_as_gif: empty text for id {mid}"
                    )
                h = 4 + int(mid) % 5
                w = 4 + int(mid) % 4
                codes = (
                    np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    )
                    % 256
                ).astype(np.uint8)
                idx = np.arange(h * w) % len(codes)
                payloads.append(encode_gif(codes[idx].reshape(h, w)))
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


def gif_decode_stats(media: DataFrame) -> DataFrame:
    """Decode REAL GIF payloads → integer pixel statistics from the
    DECODED indices — the encoder/decoder inversion proof for the
    LZW leg (mm18)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {
                "media_id": [],
                "n_pixels": [],
                "sum_px": [],
                "min_px": [],
                "max_px": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_gif(bytes(payload))
                rows["media_id"].append(mid)
                rows["n_pixels"].append(int(px.size))
                rows["sum_px"].append(int(px.sum(dtype="int64")))
                rows["min_px"].append(int(px.min()))
                rows["max_px"].append(int(px.max()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_pixels", T.IntegerType()),
            T.StructField("sum_px", T.LongType()),
            T.StructField("min_px", T.LongType()),
            T.StructField("max_px", T.LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)
