"""SwissProt flat-file record scan (S4) — Arrow-batched record assembly.

The reference delegates to Biopython (uniprot_protein_adapter.py:47-49,
uniprot_adapter.py:34-36). Spark has no native reader for '//'-terminated
multi-line records, so this implements the SURVEY §2.1 S4 plan: group
lines into records, then parse the whipped-down field set the adapters
consume (ID entry name, AC accessions, DR cross references) inside
`mapInPandas` (one Arrow batch per partition — no per-row Python at the
Spark level).

Scale path: in the graft's span model each record arrives as ONE span
(kind='swiss_record'), so `parse_swiss_spans` is the hot path and is
embarrassingly parallel. `read_swiss_file` (whole-file text -> records)
exists for fixture parity tests and modest file sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

RECORD_SCHEMA = StructType([
    StructField("entry_name", StringType()),
    StructField("accessions", ArrayType(StringType())),
    StructField("cross_references", ArrayType(ArrayType(StringType()))),
])


def parse_record_text(record: str) -> tuple | None:
    """One '//'-terminated record body -> (entry_name, accessions, xrefs)."""
    entry_name = None
    accessions: list[str] = []
    xrefs: list[list[str]] = []
    for line in record.splitlines():
        tag = line[:2]
        if tag == "ID":
            entry_name = line[5:].split()[0]
        elif tag == "AC":
            accessions.extend(
                a.strip() for a in line[5:].strip().rstrip(";").split(";") if a.strip()
            )
        elif tag == "DR":
            body = line[5:].strip()
            if body.endswith("."):
                body = body[:-1]
            xrefs.append([p.strip() for p in body.split(";")])
    if entry_name is None or not accessions:
        return None
    return entry_name, accessions, xrefs


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for rec in pdf["record"]:
            parsed = parse_record_text(rec)
            if parsed:
                rows.append(parsed)
        yield pd.DataFrame(rows, columns=["entry_name", "accessions",
                                          "cross_references"])


def parse_swiss_spans(spans: DataFrame, text_col: str = "value") -> DataFrame:
    """spans whose text is one full record each -> parsed record columns."""
    recs = spans.selectExpr(f"{text_col} as record")
    return recs.mapInPandas(_parse_batches, RECORD_SCHEMA)


def read_swiss_file(spark: SparkSession, path: str) -> DataFrame:
    """Fixture-scale reader: split a (possibly gzipped) .dat file into
    records driver-side, parallelize, parse distributed."""
    import gzip
    from pathlib import Path

    p = Path(path)
    opener = gzip.open if p.suffix == ".gz" else open
    with opener(p, "rt") as f:
        content = f.read()
    records = [r for r in content.split("\n//\n") if r.strip()]
    df = spark.createDataFrame([(r,) for r in records], "record string")
    return df.mapInPandas(_parse_batches, RECORD_SCHEMA)
