"""L01–L05 + training-data pipeline extensions (SURVEY.md §2.4).

Filled in incrementally.
"""
