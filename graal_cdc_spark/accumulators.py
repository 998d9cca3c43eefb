"""Accumulator params for executor→driver census channels.

The ES delivery censuses (c24, examples/cdc_end_to_end.py) observe
what a sink actually sent from inside ``foreachPartition`` — the only
driver-visible channel from there is an accumulator. Counts use the
built-in int param; this module holds the richer shapes. Defined in
the package (not the example/test module) so the pickled reference
resolves on executor Python workers.
"""

from __future__ import annotations

from pyspark.accumulators import AccumulatorParam


class ListParam(AccumulatorParam):
    """Accumulates lists of records (order across partitions is not
    meaningful — sort or key by an explicit field before asserting).
    Bounded-metadata channel: use for censuses whose size is O(keys
    touched), never for data-sized payloads."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a
