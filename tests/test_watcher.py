"""PipelineWatcher — debounced push half of C3 hot reload.

Reference parity: WatchFile.java:84-161 (debounced watcher driving
script recompilation); here the watcher drives registry.refresh +
runner.apply_refresh.
"""

from __future__ import annotations

import os
import textwrap
import time

from pyspark.sql import functions as F

from graal_cdc_spark.pipelines.watcher import PipelineWatcher


class _FakeRegistry:
    def __init__(self):
        self.refreshes = 0

    def refresh(self, directory):
        self.refreshes += 1
        return {"added": [], "reloaded": [], "removed": [], "failed": []}


class _FakeRunner:
    def __init__(self):
        self.applied = []

    def apply_refresh(self, report, registry, sink_factory, **kw):
        self.applied.append(report)


def _sink_factory(pipe):
    return lambda df, bid: None


def test_tick_debounces_until_stable(tmp_path):
    reg, run = _FakeRegistry(), _FakeRunner()
    w = PipelineWatcher(reg, run, tmp_path, _sink_factory)

    # no change → no-op
    assert w.tick() is None and reg.refreshes == 0

    # a new script appears: first tick only records the pending change
    (tmp_path / "a.py").write_text("def config():\n    return {'name': 'x'}\n")
    assert w.tick() is None and reg.refreshes == 0
    # still changing (another write) → keeps deferring
    (tmp_path / "b.py").write_text("def config():\n    return {'name': 'y'}\n")
    assert w.tick() is None and reg.refreshes == 0
    # stable for one full poll → applied exactly once
    assert w.tick() is not None
    assert reg.refreshes == 1 and len(run.applied) == 1
    # quiet again → no further refreshes
    assert w.tick() is None and reg.refreshes == 1


def test_tick_detects_mtime_only_change(tmp_path):
    reg, run = _FakeRegistry(), _FakeRunner()
    p = tmp_path / "a.py"
    p.write_text("def config():\n    return {'name': 'x'}\n")
    w = PipelineWatcher(reg, run, tmp_path, _sink_factory)
    os.utime(p, (os.path.getmtime(p) + 5,) * 2)
    assert w.tick() is None  # pending
    assert w.tick() is not None  # stable → applied
    assert reg.refreshes == 1


def test_watcher_thread_applies_and_stops(tmp_path):
    reg, run = _FakeRegistry(), _FakeRunner()
    w = PipelineWatcher(reg, run, tmp_path, _sink_factory, poll_interval=0.05)
    w.start()
    try:
        (tmp_path / "a.py").write_text(
            "def config():\n    return {'name': 'x'}\n"
        )
        deadline = time.time() + 10
        while not run.applied and time.time() < deadline:
            time.sleep(0.05)
        assert run.applied, "watcher thread never applied the change"
    finally:
        w.stop()
    assert w._thread is None


RELOAD_PIPE = textwrap.dedent(
    """
    def config():
        return {"name": "hotw", "db": "appdb"}

    def transform(df):
        from pyspark.sql import functions as F
        return df.select("key", "seq", F.lit(%(ver)r).alias("ver"))
    """
)


def test_watcher_end_to_end_hot_reload(spark, sf_dir, tmp_path):
    """The watcher (ticked manually for determinism) drives the same
    C3 semantics as calling refresh/apply_refresh by hand: the edited
    script restarts from its checkpoint, old data keeps v1, new data
    gets v2, nothing lost or replayed."""
    from graal_cdc_spark.cdc.envelope import build_cdc_events, parse_envelope
    from graal_cdc_spark.pipelines import PipelineRegistry
    from graal_cdc_spark.pipelines.runner import PipelineRunner
    from graal_cdc_spark.streaming import append_chunk

    pdir = tmp_path / "scripts"
    pdir.mkdir()
    path = pdir / "hotw.py"
    path.write_text(RELOAD_PIPE % {"ver": "v1"})
    reg = PipelineRegistry()
    reg.refresh(pdir)

    cdc = build_cdc_events(spark, sf_dir)
    mid = cdc.approxQuantile("seq", [0.5], 0.0)[0]
    replay = str(tmp_path / "queue")
    append_chunk(cdc.filter(F.col("seq") <= mid).coalesce(1), replay)

    seen: list[tuple[int, str]] = []

    def sink_factory(pipe):
        def sink(batch_df, batch_id):
            seen.extend((r.seq, r.ver) for r in batch_df.collect())
        return sink

    runner = PipelineRunner(
        spark, replay_dir=replay, checkpoint_root=str(tmp_path / "ckpt")
    )
    runner.start(reg.pipelines()["hotw"], sink_factory(reg.pipelines()["hotw"]))
    runner.await_all()
    assert seen and {v for _, v in seen} == {"v1"}

    watcher = PipelineWatcher(reg, runner, pdir, sink_factory)
    path.write_text(RELOAD_PIPE % {"ver": "v2"})
    os.utime(path, (os.path.getmtime(path) + 5,) * 2)
    append_chunk(cdc.filter(F.col("seq") > mid).coalesce(1), replay)

    assert watcher.tick() is None  # debounce
    report = watcher.tick()
    assert report is not None and report["reloaded"] == ["hotw"]
    runner.await_all()

    v1 = {s for s, v in seen if v == "v1"}
    v2 = {s for s, v in seen if v == "v2"}
    assert v1 and v2 and v1.isdisjoint(v2)
    assert v1 | v2 == {r.seq for r in parse_envelope(cdc).collect()}
