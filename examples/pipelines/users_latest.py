"""Example pipeline: latest state of every `users` row.

The engine's pipeline contract (the reference's GraalJS script surface
re-expressed set-oriented, SURVEY.md §2.1 U1/U2):

- ``config()`` declares the subscription — the ``initCDC()`` analog.
- ``transform(df)`` maps each routed micro-batch DataFrame — the
  ``export default`` analog, but over a whole batch instead of one
  record at a time.

The input frame is the parsed envelope (seq, event_id, key, op, db,
tbl, after_json) already routed to this pipeline's db/tables. The
output feeds the configured sink (id-keyed upsert/delete), so the
batch is compacted to the newest event per key — replays and
out-of-order arrivals converge.
"""


def config():
    return {"name": "users_latest", "db": "appdb", "tables": ("users",)}


def transform(df):
    from graal_cdc_spark.cdc.compaction import latest_by_key

    return latest_by_key(df, ["key"], "seq").select("key", "seq", "op", "after_json")
