"""Pipeline discovery, registration, routing, and hot reload."""

from __future__ import annotations

import importlib.util
import os
import sys
import uuid
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discover_pipeline_files(directory: str | Path) -> list[Path]:
    """``<dir>/*.py`` top-level, or ``<dir>/<pkg>/index.py`` — the
    reference's script layout (``ScriptContainer.java:35-58``) with
    ``.py`` for ``.js``. Hidden/underscore files are skipped."""
    root = Path(directory)
    if not root.is_dir():
        return []
    out: list[Path] = []
    for entry in sorted(root.iterdir()):
        if entry.name.startswith((".", "_")):
            continue
        if entry.is_file() and entry.suffix == ".py":
            out.append(entry)
        elif entry.is_dir():
            index = entry / "index.py"
            if index.is_file():
                out.append(index)
    return out


@dataclass
class Pipeline:
    """A loaded pipeline: validated config + transform + version."""

    name: str
    path: Path
    version: float  # source mtime at load (the version stamp, U3)
    db: str | None
    tables: tuple[str, ...]
    transform: object  # Callable[[DataFrame], DataFrame]
    key: str = field(default="")  # identity for C1 dedup

    def route(self, parsed: DataFrame) -> DataFrame:
        """Q4/F1/F2 — per-pipeline db/table routing over the parsed
        envelope stream (``filter`` on source.db / source.table)."""
        df = parsed
        if self.db is not None:
            df = df.filter(F.col("db") == self.db)
        if self.tables:
            df = df.filter(F.col("tbl").isin(*self.tables))
        return df

    def apply(self, parsed: DataFrame) -> DataFrame:
        return self.transform(self.route(parsed))


def _load_module(path: Path):
    """Import a pipeline file under a unique module name (so reloads
    get a fresh module object, never a stale ``sys.modules`` hit)."""
    mod_name = f"graal_cdc_pipeline_{path.stem}_{uuid.uuid4().hex[:8]}"
    spec = importlib.util.spec_from_file_location(mod_name, path)
    if spec is None or spec.loader is None:
        raise ImportError(f"cannot load pipeline module {path}")
    module = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = module
    try:
        spec.loader.exec_module(module)
    except Exception:
        sys.modules.pop(mod_name, None)
        raise
    return module


def _validate_config(cfg: object, path: Path) -> tuple[str, str | None, tuple[str, ...]]:
    if not isinstance(cfg, dict):
        raise ValueError(f"{path}: config() must return a dict, got {type(cfg)}")
    name = cfg.get("name")
    if not isinstance(name, str) or not name.strip():
        raise ValueError(f"{path}: config()['name'] is required and non-blank")
    db = cfg.get("db")
    if db is not None and (not isinstance(db, str) or not db.strip()):
        raise ValueError(f"{path}: config()['db'] must be a non-blank string")
    tables = tuple(cfg.get("tables", ()) or ())
    if not all(isinstance(t, str) and t.strip() for t in tables):
        raise ValueError(f"{path}: config()['tables'] must be non-blank strings")
    return name, db, tables


class PipelineRegistry:
    """register / unregister / reload with identity dedup (C1) and
    mtime versioning (U3). ``refresh()`` is the poll-based equivalent
    of the reference's debounced filesystem watcher (C3) — the caller
    owns the polling cadence; a 500 ms debounce falls out of polling
    at that interval."""

    def __init__(self) -> None:
        self._by_name: dict[str, Pipeline] = {}
        self._by_path: dict[Path, str] = {}

    def pipelines(self) -> dict[str, Pipeline]:
        return dict(self._by_name)

    def register(self, path: str | Path) -> Pipeline:
        """Load + validate a pipeline file. Re-registering the same
        identity (name) from the same path at the same version is
        idempotent (C1 ``computeIfAbsent`` semantics)."""
        path = Path(path).resolve()
        version = os.path.getmtime(path)
        existing_name = self._by_path.get(path)
        if existing_name is not None:
            existing = self._by_name[existing_name]
            if existing.version == version:
                return existing  # idempotent start, C1

        module = _load_module(path)
        if not callable(getattr(module, "config", None)):
            raise ValueError(f"{path}: pipeline must define config()")
        if not callable(getattr(module, "transform", None)):
            raise ValueError(f"{path}: pipeline must define transform(df)")
        name, db, tables = _validate_config(module.config(), path)

        clash = self._by_name.get(name)
        if clash is not None and clash.path != path:
            raise ValueError(
                f"duplicate pipeline name {name!r}: {clash.path} vs {path}"
            )
        pipe = Pipeline(
            name=name,
            path=path,
            version=version,
            db=db,
            tables=tables,
            transform=module.transform,
            key=f"{name}@{path}",
        )
        self._by_name[name] = pipe
        self._by_path[path] = name
        return pipe

    def unregister(self, path: str | Path) -> bool:
        path = Path(path).resolve()
        name = self._by_path.pop(path, None)
        if name is None:
            return False
        self._by_name.pop(name, None)
        return True

    def refresh(self, directory: str | Path) -> dict[str, list[str]]:
        """One watcher tick: register new files, reload changed ones
        (version bump), unregister deleted ones. Returns what changed."""
        found = {p.resolve() for p in discover_pipeline_files(directory)}
        added, reloaded, removed, failed = [], [], [], []
        for path in sorted(found):
            known = self._by_path.get(path)
            try:
                if known is None:
                    added.append(self.register(path).name)
                elif os.path.getmtime(path) != self._by_name[known].version:
                    reloaded.append(self.register(path).name)
            except Exception as exc:  # a broken script must not kill others
                failed.append(f"{path.name}: {exc}")
        for path in [p for p in self._by_path if p not in found]:
            name = self._by_path[path]
            self.unregister(path)
            removed.append(name)
        return {
            "added": added,
            "reloaded": reloaded,
            "removed": removed,
            "failed": failed,
        }
