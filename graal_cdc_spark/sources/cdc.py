"""CDC stream sources — the S1/S2 scan analogs.

The reference embeds Debezium engines in-process: per-instance config
(host/port/user/password/serverId, ``ListenDatabaseInstanceConfig.java:19-50``)
is assembled into connector properties — offset store, connection,
``schemas.enable=false``, table/database include lists — and run on a
dedicated thread (``DebeziumEngineManager.java:40-136``).

Spark-first, the capture side runs OUT of process (Debezium Server or
Kafka Connect publishing to Kafka topics — the deployment Debezium
itself recommends for scale), and the engine consumes the topics with
``spark.readStream.format("kafka")``. This module assembles those
reader options from the same subscription config shape, applies the
source-side filters (F1/F2 ≙ topic selection), and normalizes either
transport — Kafka records or replay files — into the engine's envelope
frame ``(seq, key, value)`` that ``parse_envelope`` consumes.

No Kafka broker exists in the test container, so tests cover option
assembly and the normalization transform (via in-memory frames with
Kafka's schema); the file-replay source covers the end-to-end path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CdcSubscription:
    """Per-instance subscription — the
    ``ListenDatabaseInstanceConfig`` shape (``:19-50``)."""

    name: str
    db_type: str  # "mysql" | "postgresql"  (DbType.java:12-13)
    bootstrap_servers: str  # Kafka, not DB host: capture runs out-of-process
    databases: tuple[str, ...] = ()
    tables: tuple[str, ...] = ()  # fully-qualified "db.table"
    topic_prefix: str | None = None  # Debezium topic.prefix; default = name
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None  # backpressure bound

    def __post_init__(self) -> None:
        if self.db_type not in ("mysql", "postgresql"):
            raise ValueError(f"unsupported db_type {self.db_type!r}")
        if not self.name.strip():
            raise ValueError("subscription name is required")
        if not self.bootstrap_servers.strip():
            raise ValueError("bootstrap_servers is required")

    @property
    def unique_key(self) -> str:
        """C1 identity (``ListenDatabaseInstanceConfig.uniqueKey``,
        ``:48-50``): one running source per identity."""
        return f"{self.db_type}:{self.bootstrap_servers}#{self.name}"

    def topics(self) -> str | None:
        """F1 source-side table filter ≙ topic selection: Debezium
        publishes one topic per table, ``{prefix}.{db}.{table}``."""
        prefix = self.topic_prefix or self.name
        if not self.tables:
            return None
        return ",".join(f"{prefix}.{t}" for t in self.tables)

    def topic_pattern(self) -> str | None:
        """F2 database filter when only databases are configured:
        subscribe to every table topic of the included databases."""
        prefix = self.topic_prefix or self.name
        if self.tables or not self.databases:
            return None
        dbs = "|".join(self.databases)
        return f"{prefix}\\.({dbs})\\..+"

    def kafka_options(self) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "startingOffsets": self.starting_offsets,
            # tombstones (F3) must reach the filter chain, not be
            # dropped by the source
            "includeHeaders": "false",
            "failOnDataLoss": "false",
        }
        topics = self.topics()
        if topics is not None:
            opts["subscribe"] = topics
        else:
            pattern = self.topic_pattern()
            if pattern is not None:
                opts["subscribePattern"] = pattern
            else:
                prefix = self.topic_prefix or self.name
                opts["subscribePattern"] = f"{prefix}\\..+"
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        return opts


def kafka_stream(spark: SparkSession, sub: CdcSubscription) -> DataFrame:
    """Open the subscription as a raw Kafka stream (cluster path)."""
    reader = spark.readStream.format("kafka")
    for k, v in sub.kafka_options().items():
        reader = reader.option(k, v)
    return normalize_kafka_frame(reader.load())


def normalize_kafka_frame(kafka_df: DataFrame) -> DataFrame:
    """Kafka record frame → engine envelope frame ``(seq, key, value)``.

    ``seq`` must be monotonic within a partition for per-key ordering
    (SURVEY.md §7.3.2): Kafka offsets are exactly that per partition,
    so seq = offset with the partition kept for the compaction
    tiebreak. Values stay raw JSON strings — ``parse_envelope`` owns
    parsing and the F3–F7 chain (a NULL Kafka value is a tombstone and
    is preserved here for F3 to see).
    """
    return kafka_df.select(
        F.col("offset").alias("seq"),
        F.col("partition").alias("src_partition"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
