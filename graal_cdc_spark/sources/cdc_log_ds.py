"""Custom Spark data source for CDC log-segment directories.

The reference embeds a Debezium engine and hands each change record to
consumers from a durable, segment-rolled queue (Chronicle Queue dirs,
``DebeziumEngineRecordHandler.java:89-93,129``; engine lifecycle
``DebeziumEngineManager.java:76-121``). This module is the Spark-native
analog as a first-class SOURCE PLUGIN built on the public PySpark
DataSource API (``pyspark.sql.datasource``, Spark 4): the same log
directory is readable as

    spark.read.format("graal_cdc_log").load(path)          # batch
    spark.readStream.format("graal_cdc_log").load(path)    # streaming

producing the engine's canonical ``cdc_events`` frame
``(seq BIGINT, key STRING, value STRING)`` — the exact shape
``cdc.envelope.parse_envelope`` and every downstream filter/compaction
operator consume, so the plugin drops into the existing data plane
unchanged.

Log-directory contract (mirrors hourly-rolled queue segments):

- a log is a directory of ``*.jsonl`` segment files; segment order =
  lexicographic filename order (producers use zero-padded indexes or
  timestamps);
- each line is one JSON object ``{"seq": int, "key": str|null,
  "value": str|null}`` (``value: null`` is a tombstone);
- only the LAST segment may grow; earlier segments are sealed. The
  streaming reader exploits this: sealed segments' line counts are
  cached driver-side, so ``latestOffset`` stats one growing file
  instead of re-reading the directory.

Scale shape: one input partition per (segment x unread range) — the
unit of parallelism is the segment, same as the reference's tailer
per queue file; a 1000-executor cluster reads 1000 segments at once.
Offsets are plain JSON dicts ``{"pos": {segment: lines_consumed}}``;
exactly-once replay across restarts comes from Spark's checkpointed
offset log plus the deterministic (file, line-range) partitions.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = "seq BIGINT, key STRING, value STRING"

# compaction manifest written by compact_log next to the segments:
# lets a resuming stream reader translate checkpointed offsets that
# reference rewritten (pre-compaction) segment names
REMAP_NAME = ".compact-remap.json"


def append_segment(path: str, rows, seal: bool = False) -> str:
    """Producer helper: append rows to the active segment (or start a
    new one when ``seal`` rolls the log). ``rows`` is an iterable of
    ``(seq, key, value)``. Returns the segment file written.

    Writes are line-atomic appends to the LAST segment only — the
    contract the streaming reader's sealed-segment cache relies on.
    """
    os.makedirs(path, exist_ok=True)
    segs = sorted(n for n in os.listdir(path) if n.endswith(".jsonl"))
    if not segs or seal:
        name = f"segment-{_next_index_for(path):08d}.jsonl"
    else:
        name = segs[-1]
    full = os.path.join(path, name)
    with open(full, "a", encoding="utf-8") as f:
        for seq, key, value in rows:
            f.write(
                json.dumps({"seq": seq, "key": key, "value": value}) + "\n"
            )
    return full


def _next_index(segs: list[str]) -> int:
    """Next segment index = max existing index + 1 — NEVER the segment
    COUNT: after retention deletes old segments, count-based naming
    would collide with (and os.rename would silently overwrite) a
    surviving sealed segment."""
    mx = -1
    for n in segs:
        stem = n.rsplit(".", 1)[0]
        tail = stem.rsplit("-", 1)[-1]
        if tail.isdigit():
            mx = max(mx, int(tail))
    return mx + 1


def _load_remap_chain(path: str) -> tuple[list[dict], int]:
    """(remap chain oldest-first, max plain-segment index ever used).

    Handles both the chained manifest ``{"chain": [...],
    "max_index": N}`` and the legacy single-remap format (a bare
    remap dict). Returns ``([], -1)`` when no manifest exists."""
    remap_path = os.path.join(path, REMAP_NAME)
    if not os.path.exists(remap_path):
        return [], -1
    with open(remap_path, encoding="utf-8") as f:
        m = json.load(f)
    chain = m.get("chain")
    if chain is None:
        chain = [m] if m.get("old_lines") else []
    hw = int(m.get("max_index", -1))
    if "max_index" not in m:
        # Legacy manifest (pre-chained format) carries no high-water
        # mark, and a log LAST compacted by old code may hold only
        # small-tailed compacted-head names — seeding the mark from
        # live names alone could re-use a rewritten segment's index
        # (the data-skip hazard _next_index_for exists to prevent).
        # Derive a conservative mark from the numeric tails of every
        # segment name the manifest has ever seen (ADVICE r10 #4).
        for remap in chain:
            for name in list(remap.get("old_lines", {})) + list(
                remap.get("rewritten", {})
            ):
                tail = name.rsplit(".", 1)[0].rsplit("-", 1)[-1]
                if tail.isdigit():
                    hw = max(hw, int(tail))
    return chain, hw


def _next_index_for(path: str) -> int:
    """Next segment index honoring the compaction high-water mark.

    After a compaction that rewrites high-numbered segments, the live
    directory may hold only compacted-head names whose numeric tails
    are SMALL (their within-run ordinal) — max-existing+1 alone would
    then RE-USE a rewritten segment's name, and a consumer parked on
    the old name would silently resume mid-file inside different
    content (data skip, worse than replay). The remap manifest carries
    the max index ever used; new names start above it."""
    nxt = _next_index(_segments(path))
    try:
        _, hw = _load_remap_chain(path)
    except (ValueError, OSError):
        hw = -1
    return max(nxt, hw + 1)


def _segments(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(n for n in os.listdir(path) if n.endswith(".jsonl"))


def _count_lines(full: str) -> int:
    n = 0
    with open(full, "rb") as f:
        for _ in f:
            n += 1
    return n


def _read_lines(
    path: str, segment: str, start: int, end: int, bad_records: str = "fail"
):
    """Yield (seq, key, value) for lines [start, end) of a segment.

    ``bad_records``: "fail" raises on an unparseable line (default —
    a corrupt durable log is an operator emergency); "null" yields
    ``(None, None, raw_line)`` so the malformed-envelope filter (F4)
    quarantines it downstream instead of killing the query.
    """
    full = os.path.join(path, segment)
    with open(full, encoding="utf-8") as f:
        for i, line in enumerate(f):
            if end >= 0 and i >= end:
                break
            if i < start:
                continue
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                if bad_records == "null":
                    yield (None, None, line.rstrip("\n"))
                    continue
                raise ValueError(
                    f"corrupt log line {segment}:{i}: {line[:120]!r}"
                )
            yield (rec.get("seq"), rec.get("key"), rec.get("value"))


@dataclass
class CdcLogPartition(InputPartition):
    path: str
    segment: str
    start: int
    end: int
    bad_records: str = "fail"


class CdcLogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("graal_cdc_log requires a path")
        self.bad_records = options.get("badrecords", "fail")

    def partitions(self):
        # end=-1: read to EOF on the executor — the driver never
        # line-counts the log (segments are immutable during a batch
        # read, so EOF is a stable bound)
        return [
            CdcLogPartition(self.path, seg, 0, -1, self.bad_records)
            for seg in _segments(self.path)
        ]

    def read(self, partition: CdcLogPartition):
        yield from _read_lines(
            partition.path,
            partition.segment,
            partition.start,
            partition.end,
            partition.bad_records,
        )


class CdcLogStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the growing segment directory.

    Offset JSON: ``{"pos": {segment_name: lines_consumed}}``. Sealed
    segments (every one except the lexicographically last) have their
    line counts cached after first scan — ``latestOffset`` is then one
    ``listdir`` + one line count of the active segment.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("graal_cdc_log requires a path")
        self.bad_records = options.get("badrecords", "fail")
        # admission-rate knob (maxFilesPerTrigger analog at line
        # granularity): each trigger advances the offset by at most
        # this many lines, in segment order — deterministic
        # micro-batch boundaries for tests and backfill throttling.
        # CAVEAT (pinned by test): Trigger.AvailableNow snapshots ONE
        # capped latestOffset as the run's end target, so an
        # availableNow run with the cap drains exactly one capped
        # batch and stops — use a processingTime trigger (or repeated
        # runs) with the cap; uncapped availableNow drains fully.
        mlpt = options.get("maxlinespertrigger")
        self.max_lines = int(mlpt) if mlpt else None
        self._sealed_counts: dict[str, int] = {}
        self._last: dict[str, int] = {}

    def initialOffset(self) -> dict:
        return {"pos": {}}

    def _full_latest(self) -> dict[str, int]:
        pos: dict[str, int] = {}
        segs = _segments(self.path)
        for i, seg in enumerate(segs):
            last = i == len(segs) - 1
            if not last and seg in self._sealed_counts:
                pos[seg] = self._sealed_counts[seg]
                continue
            n = _count_lines(os.path.join(self.path, seg))
            if not last:
                self._sealed_counts[seg] = n
            pos[seg] = n
        return pos

    def latestOffset(self) -> dict:
        pos = self._full_latest()
        if self.max_lines is None:
            self._last = dict(pos)
            return {"pos": pos}
        # cap the advance at max_lines past the previously REPORTED
        # offset (Spark always plans start=previous end, so the
        # reported sequence is the batch-boundary sequence)
        budget = self.max_lines
        capped: dict[str, int] = {}
        for seg in sorted(pos):
            lo = self._last.get(seg, 0)
            hi = pos[seg]
            take = min(hi - lo, budget) if budget > 0 else 0
            capped[seg] = lo + max(take, 0)
            budget -= max(take, 0)
        self._last = dict(capped)
        return {"pos": capped}

    def _translate_compacted(self, s: dict[str, int]) -> dict[str, int]:
        """Map checkpointed positions that reference segments a
        ``compact_log`` run rewrote onto the post-compaction layout.

        Preserved (hardlinked) tail segments kept their names, so
        their positions pass through untouched. Positions on
        rewritten segments translate via the remap CHAIN (one entry
        per compaction, oldest first): each generation whose rewritten
        old segments the consumer had fully drained maps those
        positions onto that generation's output files at full counts,
        so a checkpoint from BEFORE any number of chained compactions
        translates transitively to zero replay. The first generation
        the consumer had NOT fully drained breaks the chain; any
        position still naming a deleted segment is then dropped —
        on the start side the compacted head replays from 0
        (O(live keys), the at-least-once fallback), on the end side
        the replayed batch simply defers that data to the next batch."""
        def _missing(seg: str) -> bool:
            return not os.path.exists(os.path.join(self.path, seg))

        if not any(_missing(seg) for seg in s):
            return s
        s = dict(s)
        try:
            chain, _ = _load_remap_chain(self.path)
        except (ValueError, OSError):
            chain = []
        for remap in chain:
            old_lines = remap.get("old_lines", {})
            # every rewritten old segment of THIS generation must have
            # been drained — including ones this consumer never even
            # started (missing entries read as position 0)
            fully = bool(old_lines) and all(
                s.get(seg, 0) >= n for seg, n in old_lines.items()
            )
            if not fully:
                continue
            for seg in old_lines:
                s.pop(seg, None)
            for name, n in remap.get("rewritten", {}).items():
                s[name] = max(s.get(name, 0), n)
        for seg in [seg for seg in s if _missing(seg)]:
            s.pop(seg)
        return s

    def partitions(self, start: dict, end: dict):
        s, e = start.get("pos", {}), end.get("pos", {})
        # offset translation across compact_log swaps: positions on
        # rewritten segments map through the remap manifest. The END
        # offset translates too — on restart Spark replays a
        # WAL-planned-but-uncommitted batch whose checkpointed end can
        # still name segments a compact_log run deleted; without
        # translation that batch plans reads of missing files and the
        # stream wedges on FileNotFoundError. A fully-drained end maps
        # onto the rewritten heads (the replayed batch becomes a no-op
        # there and commits past the stale names); a mid-head end
        # drops the stale names, deferring the head to the next batch,
        # whose start then falls back to 0 — head replay, the
        # at-least-once contract.
        s = self._translate_compacted(s)
        e = self._translate_compacted(e)
        # restart sync: after recovery the checkpointed start can be
        # ahead of this (fresh) reader's rate-limit cursor — never cap
        # below a position Spark has already committed past
        for seg, lo in s.items():
            if self._last.get(seg, 0) < lo:
                self._last[seg] = lo
        out = []
        for seg, hi in sorted(e.items()):
            lo = s.get(seg, 0)
            if hi > lo:
                out.append(
                    CdcLogPartition(self.path, seg, lo, hi, self.bad_records)
                )
        if not out:
            # Spark requires >= 1 partition per planned batch; emit an
            # empty range when start == end (no new data at trigger).
            first = sorted(e) or [""]
            out.append(CdcLogPartition(self.path, first[0], 0, 0))
        return out

    def read(self, partition: CdcLogPartition):
        if partition.end > partition.start:
            yield from _read_lines(
                partition.path,
                partition.segment,
                partition.start,
                partition.end,
                partition.bad_records,
            )

    def commit(self, end: dict) -> None:
        # Offsets are durable in Spark's checkpoint; the source itself
        # is an immutable log — nothing to acknowledge (the reference's
        # named-tailer cursor is exactly the checkpointed offset).
        pass


@dataclass
class CdcLogCommit(WriterCommitMessage):
    staged: str  # absolute path of the staged jsonl file
    rows: int


def _stage_rows(path: str, iterator) -> CdcLogCommit:
    """Executor side: write one partition to a staged file."""
    staging = os.path.join(path, ".staging")
    os.makedirs(staging, exist_ok=True)
    full = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(full, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(
                json.dumps(
                    {
                        "seq": row["seq"],
                        "key": row["key"],
                        "value": row["value"],
                    }
                )
                + "\n"
            )
            n += 1
    return CdcLogCommit(staged=full, rows=n)


def _publish(path: str, staged: list[str]) -> list[str]:
    """Driver side: rename staged files into the next sealed segment
    slots (lexicographic order = commit order). rename() is atomic on
    a POSIX filesystem, and readers only ever see fully-written
    segments because staged files live under a dot-directory the
    reader ignores."""
    os.makedirs(path, exist_ok=True)
    base = _next_index_for(path)
    out = []
    for i, f in enumerate(staged):
        name = f"segment-{base + i:08d}.jsonl"
        os.rename(f, os.path.join(path, name))
        out.append(name)
    return out


def _execute_plan(path: str, plan: list[tuple[str, str]]) -> None:
    """Idempotently complete a publish plan: rename every staged file
    whose target does not exist yet; skip pairs already completed (a
    crash mid-loop leaves a prefix done — re-running finishes it)."""
    for staged, name in plan:
        target = os.path.join(path, name)
        if os.path.exists(target):
            if os.path.exists(staged):
                os.remove(staged)  # both exist: duplicate staging
            continue
        if os.path.exists(staged):
            os.rename(staged, target)


class CdcLogBatchWriter(DataSourceWriter):
    """Batch sink: stage per-partition files, publish on commit —
    readers never observe a partial write; abort deletes the staged
    files and publishes nothing."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("graal_cdc_log requires a path")
        if overwrite:
            raise ValueError(
                "graal_cdc_log is an append-only log; overwrite mode "
                "is not supported"
            )

    def write(self, iterator) -> CdcLogCommit:
        return _stage_rows(self.path, iterator)

    def commit(self, messages) -> None:
        _publish(
            self.path,
            [m.staged for m in messages if m is not None and m.rows > 0],
        )
        for m in messages:
            if m is not None and m.rows == 0 and os.path.exists(m.staged):
                os.remove(m.staged)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class CdcLogStreamWriter(DataSourceStreamWriter):
    """Streaming sink with CRASH-SAFE idempotent epoch commits.

    Two-phase publish per micro-batch: (1) write an INTENT marker
    recording the (staged file -> segment name) plan — an fsync'd
    temp-file rename, so the marker is atomic; (2) execute the
    renames. A replayed batchId (crash anywhere between marker write
    and checkpoint advance) finds the marker and idempotently
    COMPLETES the recorded plan: targets that already exist are
    skipped, missing ones are renamed from their surviving staged
    files, and the replay's fresh duplicate staging is deleted. No
    single crash point can double-publish an epoch: before the marker
    exists nothing has been renamed (the replay restages and plans
    anew); once it exists the plan's target names are fixed. The
    file-log analog of the id-keyed idempotent ES upsert
    (SURVEY.md §2.3).
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("graal_cdc_log requires a path")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, ".epochs", f"{batch_id}.json")

    def write(self, iterator) -> CdcLogCommit:
        return _stage_rows(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        marker = self._marker(batchId)
        staged = [
            m.staged for m in messages if m is not None and m.rows > 0
        ]
        # empty-partition stagings are deleted either way (one 0-row
        # file per shuffle partition per batch would grow .staging
        # without bound; the batch writer already does this)
        empties = [
            m.staged for m in messages if m is not None and m.rows == 0
        ]
        if os.path.exists(marker):
            # replayed epoch: complete the RECORDED plan, then drop
            # the replay's duplicate staging
            with open(marker, encoding="utf-8") as f:
                plan = [tuple(p) for p in json.load(f)["plan"]]
            _execute_plan(self.path, plan)
            for f in staged + empties:
                if os.path.exists(f):
                    os.remove(f)
            return
        os.makedirs(self.path, exist_ok=True)
        base = _next_index_for(self.path)
        plan = [
            (f, f"segment-{base + i:08d}.jsonl")
            for i, f in enumerate(staged)
        ]
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"plan": plan}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, marker)  # the intent is now durable + atomic
        _execute_plan(self.path, plan)
        for f in empties:
            if os.path.exists(f):
                os.remove(f)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class CdcLogDataSource(DataSource):
    """``graal_cdc_log`` — CDC segment-log connector (batch + streaming
    read AND write)."""

    @classmethod
    def name(cls) -> str:
        return "graal_cdc_log"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CdcLogBatchReader:
        return CdcLogBatchReader(self.options)

    def streamReader(self, schema) -> CdcLogStreamReader:
        return CdcLogStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> CdcLogBatchWriter:
        return CdcLogBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> CdcLogStreamWriter:
        return CdcLogStreamWriter(self.options, overwrite)


def register(spark) -> None:
    """Register the source with a session (idempotent)."""
    spark.dataSource.register(CdcLogDataSource)


def compact_log(
    spark, path: str, upto_seq: int, drop_keyless_head: bool = True
) -> None:
    """Kafka-style log compaction with a retention boundary: records
    with ``seq <= upto_seq`` collapse to the LATEST record per key
    (tombstones included — a key whose final head record is a
    tombstone keeps exactly that tombstone, so late joiners still see
    the delete); records with ``seq > upto_seq`` are retained
    verbatim. This is the operation that keeps replay storage BOUNDED
    at 100 TB: the head of the log converges to O(live keys) while
    the tail stays a faithful recent history. The reference's
    Chronicle Queue rolls segments hourly but never compacts
    (``DebeziumEngineRecordHandler.java:89-93``) — its disk grows
    without bound; this closes that gap.

    ``drop_keyless_head``: keyless records cannot be compacted (no
    identity) — Kafka refuses them on compacted topics; we drop them
    from the HEAD only (the tail keeps everything, so recent keyless
    diagnostics survive until the boundary passes them).

    Execution shape: one distributed batch read of the log, one
    latest-by-key shuffle over the head slice, one distributed
    staged-commit write of the new log — no data ever passes through
    the driver. The directory swap is two renames with a crash-repair
    preamble (the log is a LOCAL disk queue in the reference's
    deployment shape, so plain ``os.rename`` is the atomic unit; a
    crash between the renames leaves ``<path>.compact-old`` holding
    the complete previous log, which the next call restores before
    doing anything else).

    OFFSET PRESERVATION (round 9): segments that are entirely tail
    (the longest name-order suffix whose min seq > ``upto_seq``) are
    HARDLINKED into the new log verbatim — same names, same bytes —
    so checkpointed stream offsets on them stay valid across the
    swap. Only head/straddle segments are rewritten (into
    ``segment-00000000-cNNNN.jsonl`` files that sort before every
    preserved name), and a ``.compact-remap.json`` manifest records
    the rewritten old segments' line counts so a resuming reader can
    TRANSLATE its checkpointed offsets: a tailer that had fully
    consumed the rewritten region skips the compacted head entirely
    (zero replay); a tailer parked mid-head replays only the
    compacted head — O(live keys), exactly the bound compaction
    exists to provide. Tailers still park during the swap itself (the
    two renames); the remap removes the replay cost, not the need for
    a quiesced swap window. Offsets referencing segments older than
    the latest remap fall back to head replay — the Q3 at-least-once
    contract, never data loss.
    """
    import shutil

    from pyspark.sql import functions as F

    from graal_cdc_spark.cdc.compaction import latest_by_key

    old = path.rstrip("/") + ".compact-old"
    tmp = path.rstrip("/") + ".compact-tmp"
    # crash repair: a previous run that died between its two renames
    # left the complete old log at <path>.compact-old and possibly no
    # <path> — restore before anything else
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    segs = _segments(path)
    if not segs:
        return

    # per-segment stats in ONE distributed pass (min seq + line
    # count); the collect is len(segments) rows — bounded metadata
    lines_df = (
        spark.read.text([os.path.join(path, s) for s in segs])
        .withColumnRenamed("value", "line")
        .select(
            F.input_file_name().alias("f"),
            F.from_json("line", SCHEMA).alias("r"),
            "line",
        )
    )
    blank = F.length(F.trim("line")) == 0
    bad = lines_df.filter(~blank & F.col("r").isNull()).limit(1).collect()
    if bad:
        raise ValueError(
            f"compact_log: corrupt log line {bad[0].line[:120]!r}"
        )
    # n must count RAW lines (blank lines included): reader checkpoint
    # offsets are raw-line indices (_read_lines enumerates the file and
    # tolerates blanks), so the remap's old_lines "fully drained" check
    # compares against the same base — a non-blank count would let a
    # consumer parked before trailing blank lines pass as drained and
    # skip unread records. min(r.seq) ignores blank rows (NULL seq).
    stats = (
        lines_df.groupBy("f")
        .agg(F.min("r.seq").alias("mn"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    min_seq = {os.path.basename(r.f): r.mn for r in stats}
    n_lines = {os.path.basename(r.f): int(r.n) for r in stats}

    # preserved = longest name-order SUFFIX of all-tail segments
    # (empty segments ride along — they hold nothing to compact)
    preserved: list[str] = []
    for s in reversed(segs):
        mn = min_seq.get(s)
        if mn is not None and mn <= upto_seq:
            break
        preserved.insert(0, s)
    rewritten_src = [s for s in segs if s not in set(preserved)]

    os.makedirs(tmp, exist_ok=True)
    new_names: list[str] = []
    if rewritten_src:
        src = (
            spark.read.text(
                [os.path.join(path, s) for s in rewritten_src]
            )
            .withColumnRenamed("value", "line")
            .filter(F.length(F.trim("line")) > 0)
            .select(F.from_json("line", SCHEMA).alias("r"))
            .select("r.seq", "r.key", "r.value")
        )
        head = src.filter(F.col("seq") <= F.lit(upto_seq))
        if drop_keyless_head:
            head = head.filter(F.col("key").isNotNull())
        # tiebreak on value: an at-least-once producer can re-append
        # the same (key, seq) — usually byte-identical, but if a
        # violating producer wrote different values the survivor is
        # still deterministic instead of partition-order-dependent
        compacted = latest_by_key(
            head, ["key"], "seq", tiebreak_cols=["value"]
        ).select("seq", "key", "value")
        straddle_tail = src.filter(F.col("seq") > F.lit(upto_seq))
        out = compacted.unionByName(straddle_tail)
        # distributed staged-commit write; range partitioning keeps
        # each output segment a contiguous seq band
        n_par = max(2, spark.sparkContext.defaultParallelism // 4)
        (
            out.repartitionByRange(n_par, "seq")
            .sortWithinPartitions("seq")
            .write.format("graal_cdc_log")
            .mode("append")
            .save(tmp)
        )
        # rename the writer's segment-NNNNNNNN names into the
        # compacted-head namespace: '+' (0x2B) sorts before '-'
        # (0x2D), '.' (0x2E), and digits, so these names sort BEFORE
        # every possible preserved name (plain segment-NNNNNNNN,
        # prior-generation head files) — and the uuid generation tag
        # makes successive compactions collision-proof (a prior head
        # file that survives as rewritten INPUT must never be
        # clobbered by this run's outputs)
        gen = uuid.uuid4().hex[:8]
        for i, n in enumerate(_segments(tmp)):
            cname = f"segment-00000000+c{gen}-{i:04d}.jsonl"
            os.rename(os.path.join(tmp, n), os.path.join(tmp, cname))
            new_names.append(cname)
        shutil.rmtree(os.path.join(tmp, ".staging"), ignore_errors=True)
    # hardlink preserved tail segments — same names, same bytes, zero
    # copy (sealed segments are immutable); fall back to copy across
    # filesystems
    for s in preserved:
        target = os.path.join(tmp, s)
        if os.path.exists(target):  # never clobber a rewritten file
            raise RuntimeError(
                f"compact_log: name collision on preserved segment {s}"
            )
        try:
            os.link(os.path.join(path, s), target)
        except OSError:
            shutil.copy2(os.path.join(path, s), target)
    # CHAINED remap manifest: carry every prior generation's remap
    # forward so a consumer parked N compactions behind translates
    # transitively (VERDICT r9 #4). Entries are tiny (a few names per
    # compaction); the chain is capped at 16 generations — consumers
    # further behind fall back to head replay, the at-least-once
    # contract. max_index is the plain-segment naming high-water mark
    # (see _next_index_for: rewritten names must never be reused).
    prior_chain, prior_max = _load_remap_chain(path)
    max_index = prior_max
    for name in segs:
        stem = name.rsplit(".", 1)[0]
        tail = stem.rsplit("-", 1)[-1]
        if tail.isdigit():
            max_index = max(max_index, int(tail))
    remap = {
        "upto": int(upto_seq),
        "old_lines": {s: n_lines.get(s, 0) for s in rewritten_src},
        "rewritten": {
            n: _count_lines(os.path.join(tmp, n)) for n in new_names
        },
        "preserved": preserved,
    }
    manifest = {
        "chain": (prior_chain + [remap])[-16:],
        "max_index": max_index,
    }
    with open(
        os.path.join(tmp, REMAP_NAME), "w", encoding="utf-8"
    ) as f:
        json.dump(manifest, f)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
