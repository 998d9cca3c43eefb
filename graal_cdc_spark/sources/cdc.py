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


@dataclass(frozen=True)
class CaptureConfig:
    """Capture-side connection config — the other half of
    ``ListenDatabaseInstanceConfig`` (host/port/user/password/serverId,
    ``ListenDatabaseInstanceConfig.java:19-50``) that the embedded
    engine consumed directly and the out-of-process deployment hands
    to Debezium Server / Kafka Connect instead."""

    host: str
    port: int
    username: str
    password: str
    server_id: int = 0  # MySQL binlog client id
    offset_dir: str = "/var/lib/debezium"

    def __post_init__(self) -> None:
        if not self.host.strip():
            raise ValueError("capture host is required")
        if not (0 < self.port < 65536):
            raise ValueError(f"capture port out of range: {self.port}")


def debezium_properties(
    sub: CdcSubscription, cap: CaptureConfig
) -> dict[str, str]:
    """The Debezium connector property map for the capture side —
    byte-compatible with what the reference's embedded engine
    assembles (``DebeziumEngineManager.java:40-136``): engine name
    ``{dbtype}-{name}``, file offset store under the offset
    directory, ``schemas.enable=false`` (the schemaless envelope the
    F3–F7 chain and ``cdc/schema_registry.py`` are built around),
    table/database include lists (F1/F2), MySQL server-id validation
    (``:79-82``), PG pgoutput plugin + ``debezium_{name}`` slot and
    publication (``:104-110``).

    Deviations, by design (the SURVEY.md §2.1 "implement the intent"
    rule): PG schema history uses the MODERN
    ``schema.history.internal.*`` keys — the reference's PG branch
    still writes the pre-1.6 ``database.history`` spelling
    (``:113-120``), which current Debezium rejects; and
    ``topic.prefix`` resolves exactly like :meth:`CdcSubscription.
    topics` (``topic_prefix`` or the subscription name) so the
    capture and consumption sides can never disagree on topic names
    — the reference hardcodes ``{dbtype}_{name}`` (``:51``), which
    its own consumer never cross-checks.
    """
    name = f"{sub.db_type}-{sub.name}"
    prefix = sub.topic_prefix or sub.name
    props = {
        "name": name,
        "topic.prefix": prefix,
        "offset.storage":
            "org.apache.kafka.connect.storage.FileOffsetBackingStore",
        "offset.storage.file.filename":
            f"{cap.offset_dir}/{name}_offset.dat",
        "database.hostname": cap.host,
        "database.port": str(cap.port),
        "database.user": cap.username,
        "database.password": cap.password,
        "schemas.enable": "false",
    }
    if sub.tables:
        props["table.include.list"] = ",".join(sub.tables)
    if sub.db_type == "mysql":
        props["connector.class"] = (
            "io.debezium.connector.mysql.MySqlConnector"
        )
        if not (0 < cap.server_id < 2**32):
            raise ValueError(
                "MySQL server_id must be in 1 .. 2^32-1"
            )
        props["database.server.id"] = str(cap.server_id)
        if sub.databases:
            props["database.include.list"] = ",".join(sub.databases)
        props["schema.history.internal"] = (
            "io.debezium.storage.file.history.FileSchemaHistory"
        )
        props["schema.history.internal.file.filename"] = (
            f"{cap.offset_dir}/mysql-{sub.name}_dbhistory.dat"
        )
    else:  # postgresql — validated by CdcSubscription
        props["connector.class"] = (
            "io.debezium.connector.postgresql.PostgresConnector"
        )
        if not sub.databases:
            raise ValueError(
                "postgresql capture needs at least one database "
                "(dbname)"
            )
        props["database.dbname"] = sub.databases[0]
        props["plugin.name"] = "pgoutput"
        props["slot.name"] = f"debezium_{sub.name}"
        props["publication.name"] = f"debezium_{sub.name}"
        props["schema.history.internal"] = (
            "io.debezium.storage.file.history.FileSchemaHistory"
        )
        props["schema.history.internal.file.filename"] = (
            f"{cap.offset_dir}/pg-{sub.name}_dbhistory.dat"
        )
    return props
