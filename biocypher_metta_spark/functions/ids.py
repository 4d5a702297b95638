"""Composite-ID builders as pure column expressions.

Reference semantics: helpers.py:29-39 —
  variant id          '{chr.lower()}_{pos}_{ref}_{alt}_GRCh38'
  regulatory region   '{chr}_{start}_{end}_GRCh38'
Assembly is fixed to GRCh38 (helpers.py:10 ALLOWED_ASSEMBLIES).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ASSEMBLY = "GRCh38"


def build_variant_id(chr_col: Column, pos_col: Column,
                     ref_col: Column, alt_col: Column) -> Column:
    """helpers.py:30-34 (chr lowercased; pos is 1-based)."""
    return F.concat_ws(
        "_",
        F.lower(chr_col.cast("string")),
        pos_col.cast("string"),
        ref_col,
        alt_col,
        F.lit(ASSEMBLY),
    )


def build_regulatory_region_id(chr_col: Column, start_col: Column,
                               end_col: Column) -> Column:
    """helpers.py:36-39 (chr NOT lowercased here — parity with reference)."""
    return F.concat_ws(
        "_",
        chr_col.cast("string"),
        start_col.cast("string"),
        end_col.cast("string"),
        F.lit(ASSEMBLY),
    )
