"""Genomic-window predicate and coordinate helpers.

Reference: helpers.py:118-142 check_genomic_location — the de-facto
partition-pruning predicate (15 adapter call sites). Expressed as a plain
Column so Catalyst pushes it into the parquet/Iceberg scan; when the
triple/node tables are partitioned by `chr` this prunes partitions too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def genomic_window(chr_col: Column, start_col: Column, end_col: Column,
                   chr: str | None = None,
                   start: int | None = None,
                   end: int | None = None) -> Column:
    """Column twin of check_genomic_location(chr, start, end, cur...).

    chr None  -> pass-all (import every chromosome)
    else      -> chr equality AND (start given => cur_start >= start)
                              AND (end given   => cur_end   <= end)
    """
    if chr is None:
        return F.lit(True)
    pred = chr_col == F.lit(chr)
    if start is not None and end is not None:
        pred = pred & (start_col.cast("long") >= start) & (end_col.cast("long") <= end)
    elif start is not None:
        pred = pred & (start_col.cast("long") >= start)
    elif end is not None:
        pred = pred & (end_col.cast("long") <= end)
    return pred


def rebase_0_to_1(col: Column) -> Column:
    """0-based -> 1-based coordinate re-basing (+1), the P12 pattern
    (enhancer_atlas_adapter.py:54-55, epd_adapter.py:39-40, etc.)."""
    return (col.cast("long") + 1)
