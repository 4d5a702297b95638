"""as-of join hot-key rehearsal (r4 verdict item #3).

Plants a mega-hot key (every event on ONE key) vs a uniform control at
the same row count, and times the plain per-key window against the
bucket= path. The plain form must serialize the hot key's ordered
window on one task; the bucketed form should spread it across
(key, bucket) partitions. Also asserts both paths return identical
results on a sampled subset.

Usage: python tools/asof_hotkey_rehearsal.py [n_events] [n_buckets]
Prints one JSON line per (layout, path) with wall seconds.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.operators.temporal import asof_join  # noqa: E402
from biocypher_metta_spark.session import get_spark  # noqa: E402

TS_SPACE = 1_000_000_000


def make_events(spark, n, hot):
    key = (F.lit("hot") if hot
           else F.concat(F.lit("k"), F.pmod("id", F.lit(10_000))
                         .cast("string")))
    return spark.range(n).select(
        F.col("id").alias("event_id"), key.alias("key"),
        F.pmod(F.col("id") * 7919, F.lit(TS_SPACE)).alias("ts"))


def make_snaps(spark, hot):
    key = (F.lit("hot") if hot
           else F.concat(F.lit("k"), F.pmod("id", F.lit(10_000))
                         .cast("string")))
    return spark.range(100_000).select(
        key.alias("key"),
        F.pmod(F.col("id") * 104_729, F.lit(TS_SPACE)).alias("ts"),
        (F.col("id") * 3).cast("long").alias("state"))


def run(events, snaps, bucket_width):
    bucket = (None if bucket_width is None
              else (lambda c: F.floor(c / F.lit(bucket_width))))
    t0 = time.time()
    out = asof_join(events, snaps, key="key", bucket=bucket)
    # aggregate OVER the carried payload — a bare count() lets Catalyst
    # prune the window expression entirely and times nothing
    r = out.agg(F.count(F.lit(1)).alias("n"),
                F.sum("state_asof").alias("chk")).collect()[0]
    return time.time() - t0, r["n"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    width = TS_SPACE // n_buckets
    spark = get_spark("asof-hotkey", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    for layout, hot in (("uniform", False), ("hot_key", True)):
        ev = make_events(spark, n, hot)
        sn = make_snaps(spark, hot)
        ev.count(), sn.count()  # materialize inputs out of the timing
        for path, bw in (("plain", None), (f"bucketed_{n_buckets}", width)):
            sec, rows = run(ev, sn, bw)
            print(json.dumps({"layout": layout, "path": path,
                              "n_events": n, "rows": rows,
                              "sec": round(sec, 2)}), flush=True)

    # correctness spot-check: both paths identical on a planted hot key
    ev = make_events(spark, 200_000, True)
    sn = make_snaps(spark, True)
    cols = ["event_id", "key", "ts", "state_asof"]
    a = sorted(map(tuple, asof_join(ev, sn, key="key")
                   .select(cols).collect()))
    b = sorted(map(tuple, asof_join(ev, sn, key="key",
                                    bucket=lambda c: F.floor(
                                        c / F.lit(width)))
                   .select(cols).collect()))
    assert a == b, "bucketed path diverged from plain on hot-key data"
    print(json.dumps({"equivalence_check": "ok", "rows": len(a)}))


if __name__ == "__main__":
    main()
