"""The COMPLETE CDC story as ONE continuously running pipeline:

    graal_cdc_log  →  envelope parse (F3–F7/P1)  →  silver with
    schema evolution (§1.4)  →  Elasticsearch sink (K1–K6),
    with the DELIVERY CENSUS as the example's own assertion.

Every stage here is individually oracle-gated in the registry (st17
silver evolution, c24 ES delivery census, c25 version tagging, c06
compaction); this example is the COMPOSITION a reference-engine user
actually deploys — one streaming query whose ``foreachBatch`` does
both consumer jobs per micro-batch:

1. fold the batch into the persisted schema-version registry and
   write version-tagged silver slices (``streaming/silver.py``);
2. deliver the batch's per-key FINAL action to Elasticsearch through
   the real sink path — compaction → coercion → ``_bulk`` assembly →
   transport (``sinks/elasticsearch.py``), here against a recording
   200-transport since the container has no live cluster.

Mid-stream, segment 2 ADDS an ``email`` column (the evolution moment)
and deletes a key (the tombstone→delete moment). At the end the
example asserts, from the wire-level record of what the sink sent:

- convergence: the last action per key equals the log's final op per
  key (the c24 delivery contract, checked across batches);
- per-batch exactness: each batch sent exactly one action per live
  key (the ``write_cdc_dataframe`` pre-compaction contract);
- evolution: the silver registry carries users v1 (id,name) and
  v2 (email,id,name), and the mergeSchema read serves pre-evolution
  rows with NULL email.

Run: python examples/cdc_end_to_end.py

Reference mapping: DebeziumEngineRecordHandler.java:129 (Q3 ordered
replay), ElasticsearchUtils.java:125-167 (K1–K4 bulk dispatch),
DebeziumEngineManager.java:91-120 (schema history — here the
persisted registry generations).
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graal_cdc_spark.accumulators import ListParam
from graal_cdc_spark.cdc.envelope import parse_envelope
from graal_cdc_spark.session import get_spark
from graal_cdc_spark.sinks import EsSinkConfig, write_cdc_dataframe
from graal_cdc_spark.sources import cdc_log_ds as DS
from graal_cdc_spark.streaming.silver import SilverSchemaEvolution

BASE = "/tmp/graal_example_cdc_end_to_end"


def _envelope(op: str, key: str, after: dict | None, tbl: str = "users") -> str:
    return json.dumps(
        {
            "payload": {
                "op": op,
                "before": None,
                "after": after,
                "source": {"db": "appdb", "table": tbl},
            }
        }
    )


SEGMENT_1 = [
    (10, "u1", _envelope("c", "u1", {"id": "1", "name": "ada"})),
    (20, "u2", _envelope("c", "u2", {"id": "2", "name": "bob"})),
    (30, "u1", _envelope("u", "u1", {"id": "1", "name": "ada l."})),
]
# the evolution segment: email arrives mid-stream; u2 is deleted
SEGMENT_2 = [
    (40, "u1", _envelope(
        "u", "u1", {"id": "1", "name": "ada l.", "email": "ada@example.com"}
    )),
    (50, "u2", _envelope("d", "u2", None)),
    (60, "u3", _envelope(
        "c", "u3", {"id": "3", "name": "eve", "email": "eve@example.com"}
    )),
]


def run(spark, base: str):
    """Drive the composed pipeline over two micro-batches; returns
    ``(silver_lake, wire_actions)`` where ``wire_actions`` is the
    census of what the ES sink actually sent: (batch, key, action)."""
    log, silver_root, ck = (
        os.path.join(base, d) for d in ("log", "silver", "ck")
    )
    DS.register(spark)
    lake = SilverSchemaEvolution(spark, silver_root)
    # the executor→driver census channel (the c24 pattern,
    # widened from counts to (batch, key, action) rows)
    actions = spark.sparkContext.accumulator([], ListParam())
    cfg = EsSinkConfig(
        url="http://es.invalid:9200/cdc_state",
        username="example",
        password="example",
        id_key="key",
    )

    def handle_batch(batch, batch_id):
        # one source read feeds BOTH consumers (the foreachBatch
        # re-read rule — see log_source_to_lake.py)
        batch = batch.persist()
        try:
            lake.process_batch(batch, batch_id)

            def transport_factory():
                def transport(req):
                    # the sink speaks BOTH wire shapes: _bulk ndjson
                    # for multi-record chunks, single-doc PUT/DELETE
                    # /_doc/{id} for one-record partitions — record
                    # them uniformly as (batch, key, action)
                    method, url, _headers, body = req
                    recs = []
                    if url.endswith("/_bulk"):
                        for line in body.strip().split("\n"):
                            obj = json.loads(line)
                            for action in ("index", "delete"):
                                if set(obj) == {action}:
                                    recs.append(
                                        (batch_id, obj[action]["_id"], action)
                                    )
                    elif "/_doc/" in url:
                        doc_id = url.rsplit("/", 1)[-1]
                        recs.append(
                            (batch_id, doc_id,
                             "index" if method == "PUT" else "delete")
                        )
                    if recs:
                        actions.add(recs)
                    return 200

                return transport

            write_cdc_dataframe(
                batch.select("key", "op", "seq", "tbl"),
                cfg,
                transport_factory=transport_factory,
            )
        finally:
            batch.unpersist()

    parsed = parse_envelope(
        spark.readStream.format("graal_cdc_log").load(log)
    )
    DS.append_segment(log, SEGMENT_1)
    query = (
        parsed.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        query.processAllAvailable()
        DS.append_segment(log, SEGMENT_2, seal=True)
        query.processAllAvailable()
    finally:
        query.stop()
    return lake, list(actions.value)


def final_wire_state(wire_actions) -> dict[str, str]:
    """Last action per key in batch order — what the cluster converges
    to under the sink's at-least-once, batch-compacted contract."""
    state: dict[str, str] = {}
    for _batch, key, action in sorted(wire_actions):
        state[key] = action
    return state


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="cdc-end-to-end-example", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    lake, wire = run(spark, BASE)

    # 1. delivery census: ES converges to the log's final op per key
    assert final_wire_state(wire) == {
        "u1": "index", "u2": "delete", "u3": "index",
    }, wire
    # 2. per-batch exactness: one action per live key per batch
    per_batch = {}
    for batch, key, action in wire:
        assert per_batch.setdefault((batch, key), action) == action, wire
    assert len(wire) == len(per_batch) == 5, wire

    # 3. schema evolution: v1 (id,name) then v2 (+email), and the
    #    mergeSchema read serves NULL email for pre-evolution rows
    reg = {
        (r["tbl"], r["version"]): r["fields"]
        for r in lake.registry().collect()
    }
    assert reg == {("users", 1): "id,name", ("users", 2): "email,id,name"}
    rows = {r["seq"]: r for r in lake.read_silver("appdb", "users").collect()}
    assert rows[10]["email"] is None and rows[10]["version"] == 1
    assert rows[40]["email"] == "ada@example.com" and rows[40]["version"] == 2

    print("end-to-end: wire census", sorted(wire))
    print("end-to-end: registry", sorted(reg.items()))
    print("end-to-end: OK")
    spark.stop()


if __name__ == "__main__":
    main()
