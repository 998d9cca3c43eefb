"""R01–R22 — relational operator surface (SURVEY.md §2.4).

Filled in incrementally; see SURVEY.md §2.2 — the reference has no
joins/aggregates/windows, so these declare the standard surface the
new engine must expose, all built on Spark's DataFrame API.
"""
