"""Pipeline registry & control plane.

The reference's user-code surface is a directory of GraalJS scripts:
discovered at boot (``ScriptContainer.java:35-68``), each declaring its
subscription via ``initCDC()`` and its per-event logic via
``export default`` (``ScriptExecutor.java:95-199``), hot-reloaded on
file change with version-stamped cache invalidation
(``WatchFile.java:84-161``, ``ScriptExecutor.java:147-158``).

Here a pipeline is a Python module exposing:

    def config() -> dict:     # the initCDC analog (U2)
        return {"name": ..., "db": ..., "tables": [...]}

    def transform(df) -> df:  # the export-default analog (U1),
                              # set-oriented instead of per-record

Discovery accepts ``<dir>/*.py`` or ``<dir>/<pkg>/index.py`` —
the same layout rule as the reference's ``*.js``/``subdir/index.js``.
Registration is identity-deduped (C1), reload is mtime-versioned (U3),
and removal unregisters (C3). The registry is pure control plane: it
never touches row data, so nothing here affects the 100 TB data path.
"""

from graal_cdc_spark.pipelines.app import App, AppConfig, run_app
from graal_cdc_spark.pipelines.registry import (
    Pipeline,
    PipelineRegistry,
    discover_pipeline_files,
)

__all__ = [
    "App",
    "AppConfig",
    "run_app",
    "Pipeline",
    "PipelineRegistry",
    "discover_pipeline_files",
]
