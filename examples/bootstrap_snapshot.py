"""End-to-end bootstrap: live database snapshot -> CDC pipeline.

The switch-over recipe for a user coming from the reference engine
(Debezium initial snapshot + streaming): take a range-partitioned
parallel snapshot of the source table, seed the replay log with it as
op='r' envelopes, then let the ordinary streaming pipeline (file
replay today, Kafka on a real cluster) take over. Downstream code is
unchanged — the snapshot is just the oldest log segment.

Run: python examples/bootstrap_snapshot.py (needs a JDBC url; shown
here against the in-memory Derby that ships with Spark's jars).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graal_cdc_spark.session import get_spark
from graal_cdc_spark.sources.bootstrap import (
    bootstrap_replay_dir,
    snapshot_envelopes,
)
from graal_cdc_spark.sources.jdbc import read_jdbc_snapshot

URL = "jdbc:derby:memory:exampledb;create=true"
REPLAY_DIR = "/tmp/graal_example_queue"


def main() -> None:
    spark = get_spark(app_name="bootstrap-example")

    # 0. demo only: create a source table to snapshot
    conn = spark._jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.execute("CREATE TABLE users (user_id BIGINT PRIMARY KEY, name VARCHAR(32))")
    for i in range(100):
        st.execute(f"INSERT INTO users VALUES ({i}, 'user-{i}')")
    st.close()
    conn.close()

    # 1. parallel snapshot: bounds probed in the DB, 8 range scans
    snap = read_jdbc_snapshot(
        spark, URL, "users", partition_column="user_id", num_partitions=8
    )

    # 2. seed the replay log with the snapshot as op='r' envelopes
    env = snapshot_envelopes(snap, key_col="USER_ID", table="users")
    bootstrap_replay_dir(env.coalesce(4), REPLAY_DIR)

    # 3. from here the normal pipeline runner consumes REPLAY_DIR
    #    (pipelines/app.py with replay_dir=REPLAY_DIR); CDC appends
    #    land as later segments via streaming.replay.append_chunk /
    #    the Kafka source on a real deployment.
    print("seeded", spark.read.parquet(REPLAY_DIR).count(), "snapshot envelopes")
    spark.stop()


if __name__ == "__main__":
    main()
