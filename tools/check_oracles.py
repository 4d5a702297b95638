"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at a given sf dir,
compare row count + schema + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for l in lines:
        h.update(l.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from biocypher_metta_spark.session import get_spark
    from biocypher_metta_spark.entry_queries import QUERIES

    spark = get_spark("check-oracles", master="local[8]",
                      extra_confs={"spark.sql.shuffle.partitions": "8"})

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # the FULL registry: every fine-grained gate plus the driver's
    # checksum composites (__spark_entry__.queries() is the <=50-entry
    # driver subset of this)
    qs = {name: fn for name, (fn, _sql) in QUERIES.items()}
    oracles = {name: sql for name, (_fn, sql) in QUERIES.items()
               if sql is not None}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols)
        sh = value_hash(srows, [c.lower() for c in scols])
        dh = value_hash(drows, [c.lower() for c in dcols])
        ok_hash = sh == dh
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        print(f"{status}  {name}: rows {len(srows)}/{len(drows)} "
              f"schema={'ok' if ok_schema else f'{scols} vs {dcols}'} "
              f"hash={'ok' if ok_hash else 'MISMATCH'} "
              f"({time.time()-t0:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_count and ok_schema:
                order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
                sset = sorted("\x1f".join(norm_value(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
                dset = sorted("\x1f".join(norm_value(r[i]) for i in dorder) for r in drows)
                for a, b in zip(sset, dset):
                    if a != b:
                        print(f"    spark: {a[:200]}\n    duck : {b[:200]}")
                        break
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
