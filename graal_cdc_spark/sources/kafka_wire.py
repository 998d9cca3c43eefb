"""Kafka RecordBatch v2 wire codec + distributed segment reader.

The reference's S1/S2 capture path ships Debezium envelopes through
Kafka (``DebeziumEngineManager.java:40-136``); this container has no
broker and no Spark Kafka connector jar, so the live-socket leg cannot
run here. What CAN be exercised faithfully is the **wire format**: the
Apache Kafka RecordBatch v2 message format (magic=2, CRC-32C over the
post-CRC bytes, zigzag-varint record fields) is the public on-wire AND
on-disk representation — a broker's Fetch response body and its log
segment files carry records in exactly this layout.

Two production uses:

- ``read_kafka_segments`` — ingest ARCHIVED Kafka segment files
  (``<topic>-<partition>/*.log`` dumps that tiered storage / backup
  tools park on object storage) straight into the engine's envelope
  frame ``(seq, src_partition, key, value)`` without a broker
  round-trip. At 100 TB this is an embarrassingly parallel binary-file
  scan: one Arrow batch per segment file, CRC-checked on executors,
  no driver involvement.
- the codec itself backs the protocol-replay integration test
  (``tests/test_kafka_wire.py``): envelopes are encoded into real
  RecordBatch v2 bytes and decoded back through the normalize →
  ``parse_envelope`` → compaction path, proving the S1/S2 plumbing on
  the genuine byte format rather than on pre-parsed strings.

Format reference: Apache Kafka protocol documentation, "Record Batch"
(KIP-98 message format v2). No broker, consumer-group, or transaction
semantics are emulated — only the record serialization itself.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

# --- CRC-32C (Castagnoli), the checksum RecordBatch v2 mandates -----------

_CRC32C_POLY = 0x82F63B78


def _make_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# --- zigzag varints (Kafka Records encode ints like protobuf sint) --------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, value: int) -> None:
    v = _zigzag(value) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    n = len(buf)
    while True:
        if pos >= n:
            # a count-lying or truncated batch (reachable with
            # verify_crc=False, or CRC-valid bytes from a buggy
            # producer) must fail as a protocol error, not IndexError
            raise ValueError(f"truncated varint at {pos}")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


# --- RecordBatch v2 encode ------------------------------------------------

_BATCH_HEADER = struct.Struct(">qiib")  # baseOffset, batchLength, leaderEpoch, magic
_POST_CRC = struct.Struct(">hiqqqhii")  # attrs, lastOffsetDelta, baseTs, maxTs,
#                                         producerId, producerEpoch, baseSeq, count


def encode_record_batch(
    base_offset: int,
    records: Iterable[tuple[bytes | None, bytes | None]],
    base_timestamp: int = 0,
) -> bytes:
    """Serialize ``(key, value)`` pairs (``None`` = null, i.e. a
    tombstone value) into one RecordBatch v2, CRC included."""
    recs = list(records)
    if not recs:
        raise ValueError("RecordBatch must contain at least one record")
    body = bytearray()
    for delta, (key, value) in enumerate(recs):
        rec = bytearray()
        rec.append(0)  # record attributes (unused)
        _write_varint(rec, 0)  # timestampDelta
        _write_varint(rec, delta)  # offsetDelta
        if key is None:
            _write_varint(rec, -1)
        else:
            _write_varint(rec, len(key))
            rec.extend(key)
        if value is None:
            _write_varint(rec, -1)
        else:
            _write_varint(rec, len(value))
            rec.extend(value)
        _write_varint(rec, 0)  # headers count
        _write_varint(body, len(rec))
        body.extend(rec)

    post_crc = (
        _POST_CRC.pack(
            0,  # attributes: no compression, no txn
            len(recs) - 1,  # lastOffsetDelta
            base_timestamp,
            base_timestamp,
            -1,  # producerId
            -1,  # producerEpoch
            -1,  # baseSequence
            len(recs),
        )
        + bytes(body)
    )
    crc = crc32c(post_crc)
    # batchLength counts bytes after the batchLength field itself:
    # leaderEpoch(4) + magic(1) + crc(4) + post_crc
    batch_len = 4 + 1 + 4 + len(post_crc)
    return (
        _BATCH_HEADER.pack(base_offset, batch_len, -1, 2)
        + struct.pack(">I", crc)
        + post_crc
    )


# --- RecordBatch v2 decode ------------------------------------------------


def decode_record_batches(
    buf: bytes, verify_crc: bool = True
) -> Iterator[tuple[int, bytes | None, bytes | None]]:
    """Yield ``(offset, key, value)`` from a byte string of
    concatenated RecordBatch v2 structures (a segment file / Fetch
    response body). Raises ``ValueError`` on CRC mismatch or a magic
    byte this codec does not speak."""
    pos = 0
    n = len(buf)
    while pos < n:
        if n - pos < _BATCH_HEADER.size:
            raise ValueError(f"truncated batch header at {pos}")
        base_offset, batch_len, _epoch, magic = _BATCH_HEADER.unpack_from(
            buf, pos
        )
        if magic != 2:
            raise ValueError(f"unsupported magic {magic} (want v2)")
        batch_end = pos + 8 + 4 + batch_len
        if batch_end > n:
            raise ValueError(f"truncated batch body at {pos}")
        crc_pos = pos + _BATCH_HEADER.size
        (crc_stored,) = struct.unpack_from(">I", buf, crc_pos)
        post_crc = buf[crc_pos + 4 : batch_end]
        if verify_crc and crc32c(post_crc) != crc_stored:
            raise ValueError(f"CRC-32C mismatch in batch at {pos}")
        (attrs, _last_delta, _bts, _mts, _pid, _pep, _bseq, count) = (
            _POST_CRC.unpack_from(post_crc, 0)
        )
        if attrs & 0x07:
            # compression bits set: the CRC covers the COMPRESSED
            # bytes, so the batch verifies and then the varint parser
            # would walk a gzip/snappy/zstd blob — reject loudly
            # instead of mis-parsing (or worse, silently succeeding).
            raise ValueError(
                f"compressed batch (attrs={attrs:#06x}) at {pos}: this "
                f"codec only speaks uncompressed RecordBatch v2"
            )
        rpos = _POST_CRC.size

        def _take(end: int, length: int, at: int) -> int:
            # bounds-guarded field skip: a lying length must surface as
            # a protocol error BEFORE a slice silently mis-parses
            nxt = at + max(length, 0)
            if nxt > end:
                raise ValueError(f"record field overruns record at {at}")
            return nxt

        def _rv(at: int, end: int) -> tuple[int, int]:
            # varint bounded to THIS record: a field read must never
            # walk into the next record undetected
            v, nxt = _read_varint(post_crc, at)
            if nxt > end:
                raise ValueError(f"record field overruns record at {at}")
            return v, nxt

        for _ in range(count):
            rec_len, rpos = _read_varint(post_crc, rpos)
            rec_end = rpos + rec_len
            if rec_len < 0 or rec_end > len(post_crc):
                raise ValueError(f"record length overruns batch at {rpos}")
            if rpos + 1 > rec_end:
                raise ValueError(f"record field overruns record at {rpos}")
            rpos += 1  # record attributes
            _ts_delta, rpos = _rv(rpos, rec_end)
            off_delta, rpos = _rv(rpos, rec_end)
            klen, rpos = _rv(rpos, rec_end)
            end_k = _take(rec_end, klen, rpos)
            key = None if klen < 0 else bytes(post_crc[rpos:end_k])
            rpos = end_k
            vlen, rpos = _rv(rpos, rec_end)
            end_v = _take(rec_end, vlen, rpos)
            value = None if vlen < 0 else bytes(post_crc[rpos:end_v])
            rpos = end_v
            hdrs, rpos = _rv(rpos, rec_end)
            if hdrs:  # headers carry no envelope data; skip
                for _ in range(hdrs):
                    hklen, rpos = _rv(rpos, rec_end)
                    rpos = _take(rec_end, hklen, rpos)
                    hvlen, rpos = _rv(rpos, rec_end)
                    rpos = _take(rec_end, hvlen, rpos)
            if rpos != rec_end:
                raise ValueError("record length mismatch")
            yield base_offset + off_delta, key, value
        pos = batch_end


# --- distributed segment-dump reader --------------------------------------


def read_kafka_segments(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of archived Kafka segment files laid out as
    ``<topic>-<partition>/<baseOffset>.log`` (the broker's own log-dir
    convention) into the engine envelope frame
    ``(topic, seq, src_partition, key, value)`` — the
    ``normalize_kafka_frame`` shape plus the topic parsed from the
    directory name, so a root containing dumps from MULTIPLE topics
    keeps their (seq, src_partition) spaces apart instead of silently
    merging them (filter on ``topic`` before compaction). The
    downstream data plane (``parse_envelope`` → filters → compaction)
    consumes it unchanged.

    Scale: ``binaryFile`` gives one input split per segment file;
    decoding runs in ``mapInPandas`` (Arrow-batched, CRC verified on
    executors). No shuffle — seq/partition arrive with the bytes.
    """
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.log")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "topic": [],
                "seq": [],
                "src_partition": [],
                "key": [],
                "value": [],
            }
            for p, content in zip(pdf["path"], pdf["content"]):
                # .../<topic>-<partition>/<baseOffset>.log
                parent = p.rstrip("/").rsplit("/", 2)[-2]
                topic, dash, tail = parent.rpartition("-")
                if not dash or not tail.isdigit():
                    raise ValueError(
                        f"segment file {p!r} not under a "
                        f"<topic>-<partition> directory (got {parent!r})"
                    )
                part = int(tail)
                for off, key, value in decode_record_batches(bytes(content)):
                    rows["topic"].append(topic)
                    rows["seq"].append(off)
                    rows["src_partition"].append(part)
                    # errors="replace" mirrors the live path's lenient
                    # cast('string') on the Kafka binary columns — a
                    # non-UTF8 payload byte must not fail the job; the
                    # malformed-envelope filter (F4) owns rejecting it
                    rows["key"].append(
                        None
                        if key is None
                        else key.decode("utf-8", errors="replace")
                    )
                    rows["value"].append(
                        None
                        if value is None
                        else value.decode("utf-8", errors="replace")
                    )
            yield pd.DataFrame(rows)

    return files.mapInPandas(
        _decode,
        "topic string, seq long, src_partition int, key string, value string",
    )
