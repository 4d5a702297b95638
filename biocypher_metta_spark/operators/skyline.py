"""Distributed skyline (Pareto frontier) — the multi-criteria "best
trade-offs" operator (Börzsönyi et al., ICDE 2001) Spark has no native
form of: keep the rows no other row of the same group dominates, where
x dominates y iff x is at-least-as-good on EVERY criterion and strictly
better on at least one (minimize some columns, maximize others).
Duplicate criterion vectors never dominate each other — all copies
survive.

Plan (the classic two-phase distributed skyline):

  1. LOCAL pass (mapInPandas, zero shuffle): each partition reduces to
     its own per-group skyline. Dominance is transitive, so dropping a
     locally-dominated row is always safe — its dominator stays in the
     partition and either survives to the end or is itself dominated by
     a survivor. On random data a partition's frontier is tiny (O(log^(d-1) n)
     expected), so this is the step that makes the shuffle small.
  2. EXACT pass: groupBy(group).applyInPandas over the survivors — one
     shuffle whose input is frontiers, not data.

Both passes share one vectorized kernel: normalize every criterion to
MINIMIZE (negate the maximize columns), sort by criterion-sum
ascending — a dominator's sum is strictly smaller unless the vectors
are equal, so a sorted row can only be dominated by rows BEFORE it and
the accumulated skyline never needs re-pruning — then sweep in numpy
chunks, testing each chunk against the accumulated frontier and then
against itself with broadcast <=/< comparisons. Memory per step is
|frontier| x chunk x d booleans, bounded by the chunk knob; no Python
row loop.

Worst case is honest: fully anti-correlated criteria make everything a
skyline point — output = input, pass 1 shrinks nothing, and the exact
pass serializes each group like any per-group op. That is a property
of the problem (the answer itself is O(n)), not the plan; the
mitigation at 100 TB is group granularity, not a cleverer kernel.

The DuckDB oracle twin (entry_queries.rel_skyline) is the independent
quadratic NOT EXISTS anti-join formulation of the same dominance.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _frontier(dims, chunk: int = 2048):
    """Row indices of the skyline of `dims` (numpy int64 n x d, all
    criteria minimized), relative to the sum-ascending order scan."""
    import numpy as np

    order = np.argsort(dims.sum(axis=1), kind="stable")
    d = dims[order]
    keep_idx = []
    sky = np.empty((0, dims.shape[1]), dtype=dims.dtype)
    for lo in range(0, len(d), chunk):
        c = d[lo:lo + chunk]
        if len(sky):
            le = (sky[:, None, :] <= c[None, :, :]).all(axis=2)
            lt = (sky[:, None, :] < c[None, :, :]).any(axis=2)
            alive = ~(le & lt).any(axis=0)
        else:
            alive = np.ones(len(c), dtype=bool)
        c2 = c[alive]
        # intra-chunk: earlier rows (smaller sum) can dominate later
        # ones; equal vectors never dominate (le & lt excludes them)
        if len(c2) > 1:
            le = (c2[:, None, :] <= c2[None, :, :]).all(axis=2)
            lt = (c2[:, None, :] < c2[None, :, :]).any(axis=2)
            dominated = (le & lt).any(axis=0)
            c2 = c2[~dominated]
            alive[alive.nonzero()[0][dominated]] = False
        keep_idx.append(order[lo:lo + chunk][alive])
        sky = np.concatenate([sky, c2])
    return np.concatenate(keep_idx) if keep_idx else order[:0]


def skyline(df: DataFrame, group_cols: list, min_cols: list,
            max_cols: list, chunk: int = 2048) -> DataFrame:
    """Per-group Pareto skyline of `df`: minimize `min_cols`, maximize
    `max_cols` (integer/long criteria — exact comparisons, no float
    epsilon games). Returns the input rows (all columns) that no other
    row of the same group dominates.
    """
    import numpy as np

    if not min_cols and not max_cols:
        raise ValueError("at least one criterion column required")
    crit = list(min_cols) + list(max_cols)
    missing = [c for c in crit + list(group_cols)
               if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    signs = np.array([1] * len(min_cols) + [-1] * len(max_cols),
                     dtype=np.int64)
    gcols = list(group_cols)
    schema = df.schema

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pdf
        out = []
        groups = pdf.groupby(gcols, sort=False, dropna=False) if gcols \
            else [(None, pdf)]
        for _, g in groups:
            dims = g[crit].to_numpy(dtype=np.int64) * signs
            out.append(g.iloc[_frontier(dims, chunk)])
        return pd.concat(out) if out else pdf.iloc[:0]

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _reduce(pdf)

    pruned = df.mapInPandas(_local, schema)
    if not gcols:
        # global skyline: survivors are tiny; finish on one task
        return pruned.coalesce(1).mapInPandas(_local, schema)
    return pruned.groupBy(*gcols).applyInPandas(
        lambda pdf: _reduce(pdf), schema)
