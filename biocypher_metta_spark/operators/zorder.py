"""Z-order (Morton) interleave keys — multi-dimensional data skipping.

The layout half of the scan-pruning story: bucketing.write_bucketed
co-locates JOINS on one key; this co-locates RANGE FILTERS on several.
Sorting a table by the bit-interleaved key of d quantized columns puts
rows close in EVERY dimension into the same file/row-group, so parquet
min/max stats prune a d-dimensional predicate to ~N^(1-1/d) of the
files instead of all of them — the Delta/Iceberg `OPTIMIZE ZORDER`
economics, expressed on the sandbox's plain-parquet catalog (the same
stand-in argument as bucketing.py; reference BASELINE.md names Iceberg,
whose z-ordering is this exact transform).

The key is pure integer bit arithmetic — `(x >> b) & 1` shifted to
position `b * d + i` and summed — identical in Spark and DuckDB, so a
cross-engine gate can hash-match the keys bit-for-bit.  Quantization
is the CALLER's contract (values must already sit in [0, 2^bits); ids,
bucketed timestamps, and permille scores already do) — out-of-range
values raise mid-scan via a distributed raise_error guard rather than
silently corrupting the curve (the gapfill_locf guard pattern).

Scale shape: zorder_key is MAP-ONLY (an unrolled sum of <= 63 shift
terms, all whole-stage codegen).  zorder_layout adds the one exchange
any layout rewrite pays — a repartitionByRange on the key (sampled
range boundaries, the standard Spark range-partitioner) — followed by
sortWithinPartitions, which spills safely and never funnels through a
single task.  Write the result with partition-sized files and every
later multi-dim range scan prunes at the row-group level for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _validate(n_cols: int, bits: int) -> None:
    if n_cols < 1:
        raise ValueError("cols must be non-empty")
    if bits < 1:
        raise ValueError(f"bits must be >= 1, got {bits}")
    if n_cols * bits > 63:
        raise ValueError(
            f"{n_cols} cols x {bits} bits = {n_cols * bits} interleaved "
            f"bits; must fit a signed int64 (<= 63)")


def zorder_key(cols: list, bits: int = 16,
               check_range: bool = True) -> Column:
    """Morton key column interleaving `cols` at `bits` bits each.

    Bit b of column i lands at position b * len(cols) + i, so equal
    prefixes of the key bound EVERY input dimension — the locality
    property the layout sort exploits.  With check_range (default), a
    value outside [0, 2^bits) raises mid-scan with the offending
    column named; passing False skips the branch when the caller has
    already proven the domain (e.g. `x % 2**bits`)."""
    n = len(cols)
    _validate(n, bits)
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
          for c in cols]
    key = F.lit(0).cast("long")
    for i, c in enumerate(cs):
        if check_range:
            label = cols[i] if isinstance(cols[i], str) else f"col{i}"
            c = F.when(
                (c >= 0) & (c < F.lit(1 << bits)), c
            ).otherwise(F.raise_error(F.concat(
                F.lit(f"zorder_key: {label} value out of "
                      f"[0, 2^{bits}): "), c.cast("string"))))
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
    return key


def zorder_key_sql(col_names: list, bits: int = 16) -> str:
    """The identical interleave as a DuckDB SQL expression (no range
    guard — the twin runs on the same already-validated domain)."""
    n = len(col_names)
    _validate(n, bits)
    terms = []
    for i, c in enumerate(col_names):
        for b in range(bits):
            terms.append(f"(((CAST({c} AS BIGINT) >> {b}) & 1) "
                         f"<< {b * n + i})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(df: DataFrame, cols: list, bits: int = 16,
                  n_chunks: int = 200) -> DataFrame:
    """Rows range-partitioned and sorted by the Morton key of `cols` —
    write this to parquet and multi-dimensional range filters prune at
    the file/row-group level.  One exchange (range partitioner), one
    in-partition sort; the key column is dropped from the output."""
    if n_chunks < 1:
        raise ValueError(f"n_chunks must be >= 1, got {n_chunks}")
    key = zorder_key(cols, bits=bits)
    return (df.withColumn("_zkey", key)
            .repartitionByRange(n_chunks, "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey"))
