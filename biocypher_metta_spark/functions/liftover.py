"""hg19 -> hg38 liftover as an Arrow-batched pandas UDF (P11).

Reference: helpers.py:145-175 convert_genome_reference — a cached
chainfile lifter queried per row; rows that fail to lift are dropped
(dbsuper_adapter.py:51-52,83).

The lifter implementation is PLUGGABLE: `make_liftover_udf(lifter_fn)`
wraps any ``(chr_no: str, pos: int) -> list[tuple]`` query function (the
`liftover.get_lifter(...)[chr]` protocol). The REAL kernel ships in
functions/chainfile.py — a pure-stdlib UCSC ``.over.chain`` parser +
interval index whose ``.query`` drops straight in:

    lift = make_liftover_udf(ChainLifter.from_path("hg19ToHg38.over.chain").query)

The ChainLifter pickles into the UDF closure once per executor (the
Spark analogue of the reference's process-global ``_lifters`` cache,
helpers.py:160-163; SURVEY.md §7 risk 3). Tests run both the chain
kernel (test_chainfile.py, incl. dbsuper parity) and injected fakes;
the no-argument default raises at call time, never at import.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from biocypher_metta_spark.functions.chainfile import ChainLifter


def default_lifter(chr_no: str, pos: int):
    raise NotImplementedError(
        "no chainfile library in this environment — inject a lifter "
        "(tests use tests.reference_shim.fake_lifter_shift)"
    )


def make_liftover_udf(lifter_fn: Callable = default_lifter):
    """Returns liftover(chr_col, pos_col) -> nullable long column.

    chr normalization matches the reference: strip 'chr'/'ch' prefix
    (helpers.py:168). Failed lifts -> NULL (callers drop, P11).
    """

    # ChainLifter bound methods get the vectorized batch path: one
    # np.searchsorted per chrom group instead of a Python bisect per row
    # (same semantics — query_best_many is the batch twin of query()[0];
    # parity-tested against the row loop in test_chainfile.py).
    batch_lifter = getattr(lifter_fn, "__self__", None)
    if not isinstance(batch_lifter, ChainLifter) \
            or lifter_fn.__name__ != "query":
        batch_lifter = None

    @F.pandas_udf(LongType())
    def _lift(chrs: pd.Series, poss: pd.Series) -> pd.Series:
        if batch_lifter is not None:
            return batch_lifter.query_best_pos_many(chrs, poss)
        out = []
        for c, p in zip(chrs, poss):
            if c is None or p is None:
                out.append(None)
                continue
            chr_no = str(c).replace("chr", "").replace("ch", "")
            try:
                res = lifter_fn(chr_no, int(p))
                out.append(int(res[0][1]) if res else None)
            except Exception:
                out.append(None)
        return pd.Series(out, dtype="object")

    def liftover(chr_col: Column, pos_col: Column) -> Column:
        return _lift(chr_col, pos_col.cast("long"))

    return liftover
