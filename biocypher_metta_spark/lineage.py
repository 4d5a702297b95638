"""Partitioned triple materialization with per-partition lineage
manifests and idempotent resume.

North-rule requirements (BASELINE.json): triples land in partitioned
tables with per-partition lineage manifests and checkpointed
resumability so any failed partition re-derives exactly its triple
subset. Parquet with hive-style partition dirs stands in for Iceberg in
this sandbox — the mechanics (dynamic partition overwrite == Iceberg
overwritePartitions, manifest-per-partition) are identical.

Contrast with the reference: appended-file semantics (metta_writer.py:
99,120 open(..., 'a')) make re-runs DUPLICATE output — not idempotent.
Here `write_partitioned` uses dynamic partition overwrite, so re-running
any subset of partitions replaces exactly those partitions.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str,
                      partition_by: list[str],
                      mode: str = "overwrite") -> None:
    """Dynamic partition overwrite: only partitions present in `df` are
    replaced (resume = re-run the failed partitions' input slice)."""
    (df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic"))
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def partition_manifest(df: DataFrame, partition_by: list[str],
                       content_cols: list[str] | None = None) -> list[dict]:
    """Per-partition lineage rows: key -> row count + order-insensitive
    content hash (xor of row xxhashes — distributed, no sort)."""
    cols = content_cols or [c for c in df.columns if c not in partition_by]
    row_hash = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                            for c in cols])
    # BIT_XOR of row hashes is order-insensitive and associative -> a
    # stable distributed content fingerprint with map-side partial agg
    agg = (df.withColumn("_rh", row_hash)
           .groupBy(*partition_by)
           .agg(F.count("*").alias("n_rows"),
                F.expr("bit_xor(_rh)").alias("content_hash")))
    return [r.asDict() for r in agg.collect()]


def write_manifest(manifest_rows: list[dict], path: str,
                   run_id: str, extra: dict | None = None) -> None:
    out = {
        "run_id": run_id,
        "written_at": time.time(),
        "partitions": sorted(manifest_rows,
                             key=lambda r: json.dumps(r, sort_keys=True, default=str)),
    }
    if extra:
        out.update(extra)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(out, indent=1, default=str))


def read_manifest(path: str) -> dict | None:
    p = Path(path)
    if not p.exists():
        return None
    return json.loads(p.read_text())


def failed_partitions(expected: dict, actual: dict) -> list[dict]:
    """Diff two manifests: partitions whose count/hash mismatch (the
    resume work-list)."""
    def key(r):
        return json.dumps({k: v for k, v in r.items()
                           if k not in ("n_rows", "content_hash")},
                          sort_keys=True, default=str)

    amap = {key(r): r for r in actual.get("partitions", [])}
    out = []
    for r in expected.get("partitions", []):
        a = amap.get(key(r))
        if a is None or a["n_rows"] != r["n_rows"] \
                or a["content_hash"] != r["content_hash"]:
            out.append(r)
    return out
