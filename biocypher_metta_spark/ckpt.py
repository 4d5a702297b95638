"""Lineage-cutting checkpoint that also resets Catalyst size stats.

Spark 4's Dataset.checkpoint preserves the ORIGIN plan's statistics on
the resulting LogicalRDD (originStats), so iterative operators that
self-join their own previous round inherit sizeInBytes estimates that
SQUARE every iteration: bits(size) doubles per round, and after ~25
rounds the driver burns minutes in BigInteger ToomCook multiplication
just to *plan* a 500-row join (measured: a 462-component pointer-jump
round took 273s, >99% of it in `SizeInBytesOnlyStatsPlanVisitor`'s
children-product on numbers with tens of millions of bits; the jstack
shows `scala.collection.IterableOnceOps.product` over `BigInt`).

local_checkpoint_cut() materializes like localCheckpoint(eager=True)
and then rewraps the checkpointed RDD in a FRESH LogicalRDD with no
origin stats, so every round restarts from defaultSizeInBytes.  Static
stats lost this way do not matter for the iterative operators: their
join-strategy decisions are runtime AQE ones (shuffle-size based), not
static-estimate ones.

The rewrap uses SparkSession.internalCreateDataFrame (package-private
in Scala, public in bytecode, stable across the 3.x/4.x line); if the
call shape ever changes we fall back to the plain checkpoint — slower
past ~20 self-join rounds but correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def local_checkpoint_cut(df: DataFrame) -> DataFrame:
    ck = df.localCheckpoint()
    try:
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        jspark = ck.sparkSession._jsparkSession
        jdf2 = jspark.internalCreateDataFrame(jrdd, jdf.schema(), False)
        return DataFrame(jdf2, ck.sparkSession)
    except Exception:                      # pragma: no cover - API drift
        return ck
