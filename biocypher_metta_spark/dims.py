"""Dimension (broadcast) tables — the S11 pickle id-maps and S3 alias
table as small DataFrames for broadcast hash joins.

The reference holds these as driver-resident Python dicts consumed by
dict.get inside scan loops (create_knowledge_graph.py:29-31, J1-J7 in
SURVEY.md §2.4). Here each becomes a DataFrame dimension joined with
F.broadcast — same semantics, but the big side streams instead of
pulling rows through Python. For dimensions that outgrow broadcast
(dbsnp rsid<->pos at ~38M rows), pass broadcast=False and the join
falls back to shuffle with AQE deciding the physical strategy.
"""

from __future__ import annotations

import pickle
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_pickle_map(path: str | Path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def dim_from_map(spark: SparkSession, mapping: dict,
                 key_col: str = "key", val_col: str = "value") -> DataFrame:
    """dict -> 2-col DataFrame (values stringified; nested dicts preserved
    as columns when the values are {chr,pos} style)."""
    items = sorted(mapping.items())
    if items and isinstance(items[0][1], dict):
        sub_keys = sorted(items[0][1].keys())
        rows = [(str(k), *[v.get(sk) for sk in sub_keys]) for k, v in items]
        return spark.createDataFrame(rows, [key_col, *sub_keys])
    rows = [(str(k), str(v)) for k, v in items]
    return spark.createDataFrame(rows, [key_col, val_col])


def dim_from_pickle(spark: SparkSession, path: str | Path,
                    key_col: str = "key", val_col: str = "value") -> DataFrame:
    return dim_from_map(spark, load_pickle_map(path), key_col, val_col)


def lookup_join(df: DataFrame, dim: DataFrame, on_col, key_col: str = "key",
                val_col: str = "value", out_col: str = "mapped",
                how: str = "inner", broadcast: bool = True) -> DataFrame:
    """The dict.get pattern as a join.

    how='inner'  == skip-on-miss  (P5 semi-filter sites)
    how='left'   == keep-with-null (optional enrichments)
    """
    d = dim.select(F.col(key_col).alias("__k"), F.col(val_col).alias(out_col))
    if broadcast:
        d = F.broadcast(d)
    joined = df.join(d, on_col == F.col("__k"), how)
    return joined.drop("__k")
