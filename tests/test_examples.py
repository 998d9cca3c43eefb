"""The committed examples/ stay runnable — they are the migration
recipes a reference user follows, so they rot only if CI runs them."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).parents[1]
sys.path.insert(0, str(REPO / "examples"))


def test_corpus_curation_pipeline(spark, sf_dir, tmp_path):
    """The end-to-end curation example: every stage only removes
    documents (monotone funnel), the lake table is partitioned by
    split, and a rerun is idempotent (dynamic-partition overwrite)."""
    from corpus_curation import curate

    out = str(tmp_path / "lake")
    stats = curate(spark, sf_dir, out)

    assert (
        stats["input"]
        >= stats["after_exact"]
        >= stats["after_neardup"]
        >= stats["after_quality"]
        >= stats["after_decontam"]
        > 0
    )
    split_total = sum(n for n, _ in stats["splits"].values())
    assert split_total == stats["after_decontam"]
    assert {p.name for p in Path(out).iterdir() if p.is_dir()} <= {
        "split=train", "split=val", "split=test"
    }

    rerun = curate(spark, sf_dir, out)
    assert rerun == stats
