"""Config-file application entry point — the ``TestRunner`` /
``application.yml`` analog.

The reference boots from a Spring context whose only production entry
is a HARDCODED subscription (``TestRunner.java:26-33``) because its
``application.yml`` is empty (0 bytes). This module supplies what that
yml was meant to be: a declarative file describing the directory
layout (``SystemConfig.java:16-34``), the sink (K6 params), and the
run mode — parsed, validated, and turned into running checkpointed
queries.

JSON, not YAML: the engine's environment is stdlib-only and JSON is a
YAML subset anyway — a future YAML loader can feed the same dict into
``AppConfig.from_dict``.

Example config::

    {
      "replay_dir": "/data/queue",
      "checkpoint_root": "/data/offset",
      "pipelines_dir": "/data/scripts",
      "source_format": "graal_cdc_log",
      "sink": {"type": "elasticsearch", "url": "http://es:9200/idx",
               "username": "u", "password": "p", "id_key": "key"}
    }

(``source_format`` selects the replay reader: ``parquet-replay``
directory file stream, or ``graal_cdc_log`` — the custom segment-log
connector with line-level offsets.)
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import SparkSession

from graal_cdc_spark.pipelines.registry import PipelineRegistry
from graal_cdc_spark.pipelines.runner import BatchSink, PipelineRunner, es_batch_sink
from graal_cdc_spark.sinks import EsSinkConfig


@dataclass(frozen=True)
class AppConfig:
    """Validated application config (directory layout + sink)."""

    replay_dir: str
    checkpoint_root: str
    pipelines_dir: str
    sink_type: str
    sink_params: dict
    source_format: str = "parquet-replay"

    @classmethod
    def from_dict(cls, raw: dict, origin: str = "<dict>") -> AppConfig:
        for key in ("replay_dir", "checkpoint_root", "pipelines_dir"):
            v = raw.get(key)
            if not isinstance(v, str) or not v.strip():
                raise ValueError(f"{origin}: {key!r} is required and non-blank")
        sink = raw.get("sink")
        if not isinstance(sink, dict) or "type" not in sink:
            raise ValueError(f"{origin}: 'sink' object with a 'type' is required")
        sink = dict(sink)
        sink_type = sink.pop("type")
        if sink_type not in ("elasticsearch", "noop"):
            raise ValueError(f"{origin}: unknown sink type {sink_type!r}")
        source_format = raw.get("source_format", "parquet-replay")
        if source_format not in ("parquet-replay", "graal_cdc_log"):
            raise ValueError(
                f"{origin}: unknown source_format {source_format!r}"
            )
        return cls(
            replay_dir=raw["replay_dir"],
            checkpoint_root=raw["checkpoint_root"],
            pipelines_dir=raw["pipelines_dir"],
            sink_type=sink_type,
            sink_params=sink,
            source_format=source_format,
        )

    @classmethod
    def load(cls, path: str | Path) -> AppConfig:
        path = Path(path)
        try:
            raw = json.loads(path.read_text())
        except json.JSONDecodeError as exc:
            raise ValueError(f"{path}: invalid JSON: {exc}") from exc
        return cls.from_dict(raw, origin=str(path))

    def build_sink(self, transport_factory=None) -> BatchSink:
        if self.sink_type == "elasticsearch":
            # EsSinkConfig re-validates the K6 params (url/user/pass/id)
            cfg = EsSinkConfig(**self.sink_params)
            return es_batch_sink(cfg, transport_factory=transport_factory)
        return lambda batch_df, batch_id: None  # noop: drain + checkpoint only


@dataclass
class App:
    """A booted application: registry + runner over one config."""

    config: AppConfig
    registry: PipelineRegistry
    runner: PipelineRunner
    report: dict


def run_app(
    spark: SparkSession,
    config: str | Path | dict,
    transport_factory=None,
    available_now: bool = True,
) -> App:
    """Boot from config: discover pipelines, start one checkpointed
    query per pipeline against the configured sink. With
    ``available_now`` the queries drain everything currently in the
    replay dir and stop (the deterministic test/batch mode); otherwise
    they run continuously.
    """
    cfg = (
        AppConfig.from_dict(config)
        if isinstance(config, dict)
        else AppConfig.load(config)
    )
    registry = PipelineRegistry()
    report = registry.refresh(cfg.pipelines_dir)
    runner = PipelineRunner(
        spark=spark,
        replay_dir=cfg.replay_dir,
        checkpoint_root=cfg.checkpoint_root,
        source_format=cfg.source_format,
    )
    sink = cfg.build_sink(transport_factory=transport_factory)
    for pipe in registry.pipelines().values():
        runner.start(pipe, sink, available_now=available_now)
    return App(config=cfg, registry=registry, runner=runner, report=report)


def main(argv: list[str] | None = None) -> None:
    """CLI boot: ``python -m graal_cdc_spark.pipelines.app app.json
    [--continuous]``. Drains the replay dir and exits (availableNow)
    unless ``--continuous``, in which case it runs until interrupted —
    the ``CDCApplication`` analog."""
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    continuous = "--continuous" in args
    args = [a for a in args if a != "--continuous"]
    if len(args) != 1:
        raise SystemExit(
            "usage: python -m graal_cdc_spark.pipelines.app "
            "<config.json> [--continuous]"
        )
    from graal_cdc_spark.session import get_spark

    spark = get_spark(app_name="graal-cdc-app")
    app = run_app(spark, args[0], available_now=not continuous)
    names = sorted(app.registry.pipelines())
    print(f"started {len(names)} pipeline(s): {', '.join(names)}")
    if continuous:
        for q in spark.streams.active:
            q.awaitTermination()
    else:
        app.runner.stop_all()
    spark.stop()


if __name__ == "__main__":
    main()
