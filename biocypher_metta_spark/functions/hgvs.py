"""HGVS -> VCF-style variant id, regex path (P8).

Reference: helpers.py:42-85 build_variant_id_from_hgvs(validate=False) —
'NC_000003.12:g.183917980C>T' -> '3_183917980_C_T_GRCh38', with chr 23/24
mapped to X/Y and None on unsupported shapes. The validate=True path
needs a live UTA network service and is never exercised by the
reference's configs (SURVEY §2.3 P8) — out of scope by design.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from biocypher_metta_spark.functions.ids import build_variant_id


def variant_id_from_hgvs(hgvs_col: Column) -> Column:
    """Nullable column: NULL for non-NC_/malformed ids (reference returns
    None and prints)."""
    is_nc = hgvs_col.startswith("NC_")
    chr_num = F.split(F.get(F.split(hgvs_col, r"\."), 0), "_").getItem(1) \
        .try_cast("int")
    chrom = (F.when(chr_num < 23, chr_num.cast("string"))
             .when(chr_num == 23, F.lit("X"))
             .when(chr_num == 24, F.lit("Y")))
    body = F.get(F.split(hgvs_col, r"\."), 2)  # 'g' split: part after 2nd dot
    left = F.get(F.split(body, ">"), 0)
    alt = F.get(F.split(body, ">"), 1)
    pos = left.substr(F.lit(1), F.length(left) - 1)
    ref = left.substr(F.length(left), F.lit(1))
    ok = (is_nc & chrom.isNotNull() & pos.rlike(r"^[0-9]+$")
          & alt.isNotNull())
    return F.when(ok, build_variant_id(chrom, pos.cast("long"), ref, alt)) \
        .otherwise(F.lit(None))
