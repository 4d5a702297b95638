"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the reference's probe query 2 shape
                (metta_space_import.py:82-90: genes on a chromosome within
                a numeric window), answered by the full span -> parse ->
                extract pipeline over the synthesized interleaved
                documents table at sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data ops); each returns a DataFrame.
oracle_sql()  — DuckDB twins for the driver's side-by-side compare.
Implementations live in biocypher_metta_spark/entry_queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from biocypher_metta_spark.entry_queries import kg_gtf_gene_nodes

    return kg_gtf_gene_nodes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver registry: <= 50 entries (the driver's snapshot cap),
    never-driver-adjudicated names first, covering every operator
    family — narrow fine-grained gates are folded into checksum
    composites (entry_queries.CK_COMPOSITES) or capstone compositions;
    the fine gates all remain in entry_queries.QUERIES and are checked
    row-by-row via tools/check_oracles.py --all."""
    from biocypher_metta_spark.entry_queries import DRIVER_QUERIES

    return {name: fn for name, (fn, _sql) in DRIVER_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from biocypher_metta_spark.entry_queries import DRIVER_QUERIES

    return {name: sql for name, (_fn, sql) in DRIVER_QUERIES.items()
            if sql is not None}
