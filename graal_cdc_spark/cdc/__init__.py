from graal_cdc_spark.cdc.envelope import (
    build_cdc_events,
    cdc_events_cte,
    cdc_parsed_cte,
    parse_envelope,
    parsed_envelope,
)
from graal_cdc_spark.cdc.filters import (
    drop_ddl,
    drop_malformed,
    drop_non_row_ops,
    drop_tombstones,
    require_after_key,
    row_event_filter_chain,
)
from graal_cdc_spark.cdc.compaction import latest_by_key

__all__ = [
    "build_cdc_events",
    "cdc_events_cte",
    "cdc_parsed_cte",
    "parse_envelope",
    "parsed_envelope",
    "drop_tombstones",
    "drop_malformed",
    "drop_ddl",
    "drop_non_row_ops",
    "require_after_key",
    "row_event_filter_chain",
    "latest_by_key",
]
