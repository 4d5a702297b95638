"""10x scale rehearsal for the round-5f operator: product quantization.

Same contract as rehearsal_r5b/c/e: the op runs at N and 10N vectors
in one JVM (warmup excluded). PQ's claimed shape is iterations+2
map-only corpus scans (train assigns + one bounded (m*k)-group agg
per round, encode, ADC scan) plus a bounded TakeOrdered — so time
must grow ~linearly and the driver-side model stays m*k*d ints
regardless of N.

Prints ONE JSON line per op and writes tools/rehearsal_r5f.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.session import get_spark  # noqa: E402

_DIM = 16


def _vecs(spark, n: int):
    # deterministic synthetic embeddings: coord j of vector i =
    # ((i*31 + j*j*17) % 201 - 100) / 100 — varied per id AND per
    # coord (no stride collapse), range [-1, 1]
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {_DIM - 1}), "
            f"j -> CAST(((id * 31 + j * j * 17) % 201 - 100) "
            f"AS DOUBLE) / 100.0)").alias("embedding"))


def run_pq(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.pq import (
        pq_adc_topk, pq_encode, pq_train)

    emb = _vecs(spark, n)
    query = [((i * 37) % 19 - 9) / 10.0 for i in range(_DIM)]
    t0 = time.time()
    books = pq_train(emb, m=4, k=16, dim=_DIM, iterations=2)
    t_train = time.time() - t0
    codes = pq_encode(emb, books, dim=_DIM)
    t0 = time.time()
    top = pq_adc_topk(codes, query, books, topk=100).count()
    t_query = time.time() - t0
    return {"vectors": n, "topk_rows": top,
            "train_sec": round(t_train, 2),
            "encode_query_sec": round(t_query, 2),
            "sec": round(t_train + t_query, 2)}


def main():
    spark = get_spark("rehearsal-r5f")
    spark.sparkContext.setLogLevel("ERROR")
    ops = {"pq": (run_pq, 2_000_000)}
    only = set(sys.argv[1:])
    art = REPO / "tools" / "rehearsal_r5f.json"
    prev = json.loads(art.read_text()) if art.exists() else {}
    runs = prev.get("runs", {})
    ratios = prev.get("ratios", {})
    for name, (fn, n) in ops.items():
        if only and name not in only:
            continue
        fn(spark, max(n // 100, 1000))          # warmup, excluded
        small = fn(spark, n)
        big = fn(spark, n * 10)
        runs[name] = {"n": small, "10n": big}
        ratios[name] = round(big["sec"] / max(small["sec"], 1e-9), 2)
        print(json.dumps({name: runs[name], "ratio": ratios[name]}),
              flush=True)
    out = {"runs": runs, "ratios": ratios}
    art.write_text(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
