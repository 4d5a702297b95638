"""Spark adapters: each reference adapter re-expressed as declarative
DataFrame plans producing (typed node/edge DataFrames, rendered MeTTa atom
DataFrames). No ports — scans, filters and dict-lookups become Catalyst
scans, pushed-down predicates and broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from biocypher_metta_spark.serializer import Prop


def provenance_props(source: str, source_url: str | list[str],
                     write_properties: bool, add_provenance: bool) -> list[Prop]:
    """The P14 pattern (gencode_gene_adapter.py:120-122 and every adapter):
    constant source/source_url columns behind the two flags."""
    if not (write_properties and add_provenance):
        return []
    if isinstance(source_url, list):
        url_col = F.array(*[F.lit(u) for u in source_url])
        return [Prop("source", F.lit(source), "str"),
                Prop("source_url", url_col, "str_list")]
    return [Prop("source", F.lit(source), "str"),
            Prop("source_url", F.lit(source_url), "str")]
