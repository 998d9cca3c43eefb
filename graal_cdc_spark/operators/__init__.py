"""Operator library.

- ``dedup`` — exact, fingerprint clusters, shingle/token-n-gram
  Jaccard, MinHash-LSH, SimHash (L01/L02/L06/L07/L10/L13)
- ``similarity`` — cosine top-k, blocked all-pairs, RP-bucketed ANN
  (L04/L08/L12)
- ``text`` — tokenization, quality features, language-ID,
  fingerprints, shingles (L03/L09/L11)
- ``multimodal`` — binary payload plumbing + pandas-UDF stubs
  (MM01–MM04)
- ``asof`` — event-time backward join (R09)
- ``skew`` — salted aggregation / salted join (hot-key scale path)
"""

from graal_cdc_spark.operators import (  # noqa: F401
    asof,
    dedup,
    multimodal,
    similarity,
    skew,
    text,
)
