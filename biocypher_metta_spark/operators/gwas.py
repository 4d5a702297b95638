"""GWAS summary-statistics operators — the distributed twin of the
reference's notebooks/finemapping_susie.ipynb workflow (gwaslab
`Sumstats.get_lead(sig_level=...)`: significance filter + lead-variant
extraction around peaks).

Lead extraction here is the standard bucketed-clump formulation:
genome-wide significant rows land in `window`-sized buckets per
chromosome, each bucket elects its best row (max score, deterministic
tie-break), and a candidate survives unless a strictly-better candidate
sits within `window` bp in an adjacent bucket. This two-pass variant is
fully parallel (groupBy + bounded self-join on (chr, bucket±1) — no
sequential scan over the genome) and differs from gwaslab's greedy sweep
only when three same-window peaks chain within 2*window, which the
docstring calls out rather than hides. P-values cross the engine
boundary as integer milli(-log10 p) so oracles compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# -log10(5e-8) = 7.301...: the notebook's sig_level=5e-8 in milli units
GENOME_WIDE_SIG_MILLI = 7301


def lead_snps(assoc: DataFrame, sig_milli: int = GENOME_WIDE_SIG_MILLI,
              window: int = 500_000,
              id_col: str = "snp_id") -> DataFrame:
    """(snp_id, chr, pos, nlp_milli) -> lead variants: significant rows,
    one winner per (chr, window-bucket), suppressed by any better
    neighbor-bucket winner within `window` bp. Deterministic tie-break:
    higher nlp_milli, then lower pos, then lower snp_id."""
    sig = assoc.filter(F.col("nlp_milli") >= sig_milli)
    b = sig.withColumn("_b", F.floor(F.col("pos") / window))
    w = (Window.partitionBy("chr", "_b")
         .orderBy(F.col("nlp_milli").desc(), F.col("pos"), F.col(id_col)))
    cand = (b.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
    c, n = cand.alias("c"), cand.alias("n")
    better = (
        (F.col("n.nlp_milli") > F.col("c.nlp_milli"))
        | ((F.col("n.nlp_milli") == F.col("c.nlp_milli"))
           & ((F.col("n.pos") < F.col("c.pos"))
              | ((F.col("n.pos") == F.col("c.pos"))
                 & (F.col(f"n.{id_col}") < F.col(f"c.{id_col}")))))
    )
    leads = c.join(
        n,
        (F.col("c.chr") == F.col("n.chr"))
        & (F.abs(F.col("n._b") - F.col("c._b")) == 1)
        & (F.abs(F.col("n.pos") - F.col("c.pos")) <= window)
        & better,
        "left_anti")
    return leads.select(id_col, "chr", "pos", "nlp_milli")
