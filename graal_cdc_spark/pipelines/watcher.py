"""Debounced pipeline-script watcher — the push half of C3 hot reload.

The reference runs a debounced filesystem watcher that recompiles
changed user scripts (``WatchFile.java:84-161``: WatchService events
coalesced per path, acted on after a quiet period). The Spark analog
keeps the same control-plane contract with a portable polling loop:

- ``tick()`` is ONE watcher round: snapshot the scripts directory's
  (path → mtime) fingerprint; when it differs from the last applied
  state, wait until the fingerprint is STABLE (two consecutive equal
  snapshots — the debounce: a half-written editor save or an rsync in
  progress never triggers a reload mid-copy), then run
  ``registry.refresh`` + ``runner.apply_refresh`` so added/changed/
  removed scripts start/restart-from-checkpoint/stop.
- ``start()`` runs ticks on a daemon thread at ``poll_interval``;
  ``stop()`` joins it. Driver-side only — the watcher owns no Spark
  state beyond what runner/registry already manage, so it adds zero
  executor-side cost at any cluster size.

Polling (vs inotify) is deliberate: it works on every driver
filesystem including NFS/object-store mounts where change
notification is unavailable, and one stat() sweep per interval over a
scripts directory is negligible.
"""

from __future__ import annotations

import os
import threading
import time
from pathlib import Path

from graal_cdc_spark.pipelines.registry import discover_pipeline_files


def _fingerprint(directory: str | Path) -> dict[str, float]:
    out: dict[str, float] = {}
    for p in discover_pipeline_files(directory):
        try:
            out[str(p.resolve())] = os.path.getmtime(p)
        except OSError:  # deleted between listdir and stat
            continue
    return out


class PipelineWatcher:
    """Polls a scripts directory and applies refreshes to a runner."""

    def __init__(
        self,
        registry,
        runner,
        directory: str | Path,
        sink_factory,
        poll_interval: float = 1.0,
        **start_kwargs,
    ) -> None:
        self.registry = registry
        self.runner = runner
        self.directory = Path(directory)
        self.sink_factory = sink_factory
        self.poll_interval = poll_interval
        self.start_kwargs = start_kwargs
        self._applied = _fingerprint(self.directory)
        self._pending: dict[str, float] | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.reports: list[dict] = []  # applied refresh reports (observability)

    # -- one watcher round ------------------------------------------------
    def tick(self) -> dict | None:
        """Poll once; apply a refresh iff the directory changed AND the
        change is stable (identical on two consecutive polls). Returns
        the applied refresh report, or None."""
        now = _fingerprint(self.directory)
        if now == self._applied:
            self._pending = None
            return None
        if self._pending != now:  # still changing — debounce
            self._pending = now
            return None
        report = self.registry.refresh(self.directory)
        self.runner.apply_refresh(
            report, self.registry, self.sink_factory, **self.start_kwargs
        )
        self._applied = now
        self._pending = None
        self.reports.append(report)
        return report

    # -- daemon loop -------------------------------------------------------
    def start(self) -> "PipelineWatcher":
        if self._thread is not None:
            raise RuntimeError("watcher already started")

        def loop() -> None:
            while not self._stop.wait(self.poll_interval):
                try:
                    self.tick()
                except Exception:  # a bad poll must not kill the watcher
                    continue

        self._thread = threading.Thread(
            target=loop, name="pipeline-watcher", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
