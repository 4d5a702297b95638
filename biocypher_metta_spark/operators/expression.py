"""Expression-matrix analytics — the distributed twin of the reference's
single-machine pandas workflow in notebooks/gtex_tissue_gene_exp_corr.ipynb
(target-gene correlation against every gene over a TPM matrix; the
coxpresdb adapter then INGESTS such precomputed coexpression scores —
this operator closes that loop inside the engine).

Design: one-vs-all Pearson is map-only — the target vector broadcasts as
plan literals, every gene row computes its correlation in a single pass
(exact integer sums when the matrix is integer-quantized, so a DuckDB
oracle reproduces the values), then a global top-k with deterministic
tie-break. All-pairs coexpression at corpus scale would block on a
correlation-LSH first (see operators.dedup.embedding_near_dup_pairs for
the blocking pattern); one-vs-all per query gene is the notebook's own
access pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sum(col):
    return F.aggregate(col, F.lit(0).cast("long"), lambda acc, v: acc + v)


def gene_corr_topk(expr: DataFrame, target_gene: str, k: int = 10,
                   id_col: str = "gene_id",
                   vec_col: str = "values") -> DataFrame:
    """Pearson correlation of `target_gene`'s expression vector against
    every gene (integer-valued vectors -> exact integer moments, one
    correctly-rounded sqrt per side), emitted as corr_milli =
    floor(1000*num / (sqrt(den_x)*sqrt(den_y))), top-k by (corr desc,
    gene_id) for determinism. Constant (zero-variance) vectors drop."""
    trow = (expr.filter(F.col(id_col) == target_gene)
            .select(vec_col).head())
    if trow is None:
        raise ValueError(f"target gene {target_gene!r} not found")
    t = [int(x) for x in trow[0]]
    n = len(t)
    tc = F.array(*[F.lit(v).cast("long") for v in t])
    sum_t, sum_t2 = sum(t), sum(v * v for v in t)
    den_t = n * sum_t2 - sum_t * sum_t

    x = F.transform(F.col(vec_col), lambda v: v.cast("long"))
    sum_x = _sum(x)
    sum_x2 = _sum(F.transform(x, lambda v: v * v))
    sum_xt = _sum(F.zip_with(x, tc, lambda a, b: a * b))
    num = F.lit(n) * sum_xt - sum_x * F.lit(sum_t)
    den_x = F.lit(n) * sum_x2 - sum_x * sum_x
    corr_milli = F.floor(
        F.lit(1000.0) * num
        / (F.sqrt(den_x.cast("double")) * F.sqrt(F.lit(float(den_t))))
    ).cast("long")
    return (expr.select(F.col(id_col), den_x.alias("_dx"),
                        corr_milli.alias("corr_milli"))
            .filter((F.col("_dx") > 0) & F.lit(den_t > 0))
            .select(id_col, "corr_milli")
            .orderBy(F.col("corr_milli").desc(), F.col(id_col))
            .limit(k))
