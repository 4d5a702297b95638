"""Scale rehearsal for the round-5w operators: asymmetric containment
join (dedup.containment_join) and binary sign-pack + Hamming top-k
(similarity.sign_pack / hamming_topk).

Claimed shapes, measured at N -> 10N in one JVM (warmup excluded):

  containment — prefix-filter candidate join: collision/output bound;
                rehearsed on a corpus with a FIXED per-doc true-pair
                rate (template families of constant size), so the
                honest expectation is ~linear in docs;
  hamming     — map-only pack + popcount scan + global top-k:
                ~linear in rows.

Writes tools/rehearsal_r5w.json.
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


def run_containment(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.dedup import containment_join

    i = F.col("id")
    # template families of 8 docs: a 12-token base per family plus a
    # member-specific suffix of 0-3 extra tokens -> within-family
    # containment pairs, cross-family disjoint vocab
    fam = F.floor(i / 8)
    member = i % 8
    base = F.array_join(F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda k: F.concat(F.lit("f"), fam.cast("string"),
                           F.lit("w"), k.cast("string"))), " ")
    extra = F.array_join(F.transform(
        F.sequence(F.lit(1), (member % 4).cast("int")),
        lambda k: F.concat(F.lit("x"), i.cast("string"),
                           F.lit("_"), k.cast("string"))), " ")
    docs = spark.range(n_docs).select(
        i.alias("doc_id"),
        F.trim(F.concat(base, F.lit(" "), extra)).alias("text"))
    t0 = time.time()
    ck = containment_join(docs, tau_permille=900).agg(
        F.count(F.lit(1)), F.sum("containment_permille")).collect()[0]
    return {"docs": n_docs, "pairs": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def run_hamming(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.similarity import (
        hamming_topk,
        sign_pack,
    )

    i = F.col("id")
    emb = spark.range(n).select(
        i.alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(63)),
                    lambda k: F.when((i * 31 + k * 7) % 5 < 2,
                                     F.lit(1.0))
                    .otherwise(F.lit(-1.0)).cast("float"))
        .alias("embedding"))
    qwords = [0xAAAAAAAA, 0x55555555]
    t0 = time.time()
    ck = hamming_topk(sign_pack(emb, 64), qwords, k=10).agg(
        F.sum("hamming"), F.sum("vec_id")).collect()[0]
    return {"rows": n, "ck": int(ck[0]) + int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5w")
    spark.sparkContext.setLogLevel("ERROR")
    run_containment(spark, 10_000)         # warmup, excluded
    run_hamming(spark, 100_000)
    runs = {
        "containment": {"n": run_containment(spark, 100_000),
                        "10n": run_containment(spark, 1_000_000)},
        "hamming": {"n": run_hamming(spark, 2_000_000),
                    "10n": run_hamming(spark, 20_000_000)},
    }
    ratios = {
        f"{k}_10x": round(v["10n"]["sec"] / max(v["n"]["sec"], 0.01), 2)
        for k, v in runs.items()
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5w.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
